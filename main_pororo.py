"""Compatibility shim: `python main_pororo.py --cfg cfg.yml ...` — same
entry point name as the reference repo. Delegates to cpcsv_tpu.cli."""

from cpcsv_tpu.cli.main_pororo import main

if __name__ == "__main__":
    main()
