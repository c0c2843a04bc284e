"""Compatibility shim: `python main_clevr.py --cfg cfg.yml ...`."""

from cpcsv_tpu.cli.main_clevr import main

if __name__ == "__main__":
    main()
