"""Pororo CLI — same flag surface as reference `main_pororo.py:29-43`:

  python -m cpcsv_tpu.cli.main_pororo --cfg cfg.yml [--load_ckpt N |
      --eval_fid 1 | --eval_fvd 1 | --eval_is 1 | --eval_ssim 1 |
      --continue_ckpt N]
      [--debug] [--data_dir D] [--manualSeed S]

Extension: `--synthetic N` trains on the in-memory synthetic dataset (same
schema) when no Pororo data is on disk — the dataless end-to-end slice.
"""

from __future__ import annotations

import argparse
import os
import pprint

# re-exported for backward compatibility with external scripts that
# imported it from here before the shared CLI layer existed; no in-repo
# caller remains (bench.py/benchutil import from cpcsv_tpu.cli.dispatch)
from cpcsv_tpu.cli.dispatch import _str2bool  # noqa: F401


def parse_args(argv=None):
    from cpcsv_tpu.cli.dispatch import add_debug_flag

    parser = argparse.ArgumentParser(description="Train a CP-CSV story GAN (TPU)")
    add_debug_flag(parser)
    parser.add_argument("--cfg", dest="cfg_file", type=str,
                        default=os.path.join(os.path.dirname(__file__), "..", "configs", "final.yml"))
    parser.add_argument("--load_ckpt", default=None, type=str)
    parser.add_argument("--continue_ckpt", default=None, type=str)
    parser.add_argument("--data_dir", dest="data_dir", type=str, default="")
    # The reference uses argparse type=bool here (main_pororo.py:39-40), so
    # `--eval_fid 0` evaluates truthy — a footgun, not a feature. Fixed
    # (documented deviation): 0/1/true/false parse as real booleans.
    # --eval_is / --eval_ssim are extensions (the reference ships the metric
    # files but wires neither to a CLI).
    from cpcsv_tpu.cli.dispatch import add_compat_flags, add_eval_flags

    add_eval_flags(parser)
    add_compat_flags(parser)
    parser.add_argument("--manualSeed", type=int, default=0)
    parser.add_argument("--synthetic", type=int, default=0,
                        help="train on N synthetic samples instead of DATA_DIR")
    parser.add_argument("--max_epoch", type=int, default=None,
                        help="override TRAIN.MAX_EPOCH (smoke runs)")
    return parser.parse_args(argv)


def main(argv=None):
    from cpcsv_tpu.config import config_from_file
    from cpcsv_tpu.parallel.distributed import maybe_initialize_from_env

    # multi-host: start the jax.distributed runtime BEFORE first backend use
    # (no-op unless CPCSV_DISTRIBUTED / CPCSV_COORDINATOR is set)
    maybe_initialize_from_env()
    args = parse_args(argv)
    cfg = config_from_file(args.cfg_file)
    if args.data_dir:
        cfg = cfg.with_updates(DATA_DIR=args.data_dir)
    if args.max_epoch is not None:
        cfg = cfg.with_updates(
            TRAIN=cfg.TRAIN.__class__(**{**cfg.TRAIN.__dict__, "MAX_EPOCH": args.max_epoch})
        )
    print("Using config:")
    pprint.pprint(cfg)

    output_dir = "./output/debug" if args.debug else f"./output/{cfg.CONFIG_NAME}"

    from cpcsv_tpu.data.loader import DataLoader

    if args.synthetic:
        from cpcsv_tpu.data.synthetic import SyntheticImageDataset, SyntheticStoryDataset
        from cpcsv_tpu.parallel.mesh import mesh_size

        n_dev = mesh_size(cfg.MESH_SHAPE)
        im_bs = cfg.TRAIN.IM_BATCH_SIZE * n_dev
        st_bs = cfg.TRAIN.ST_BATCH_SIZE * n_dev
        n_st = max(args.synthetic, st_bs)
        n_im = max(args.synthetic * 2, im_bs)
        story = SyntheticStoryDataset(n_st, cfg.VIDEO_LEN, cfg.IMSIZE,
                                      cfg.TEXT.DIMENSION, cfg.LABEL_NUM)
        image = SyntheticImageDataset(n_im, cfg.VIDEO_LEN, cfg.IMSIZE,
                                      cfg.SESIZE, cfg.TEXT.DIMENSION, cfg.LABEL_NUM,
                                      use_segment=cfg.SEGMENT_LEARNING)
        test = SyntheticStoryDataset(max(args.synthetic // 4, st_bs), cfg.VIDEO_LEN,
                                     cfg.IMSIZE, cfg.TEXT.DIMENSION, cfg.LABEL_NUM, seed=99)
        # per-host local slices + manualSeed-driven shuffles, exactly like
        # build_pororo_loaders — a multi-host smoke run must exercise the
        # same input-pipeline contract as the real one (shard_batch requires
        # each process to pass only its local rows)
        from cpcsv_tpu.parallel.distributed import process_info

        pi, pc = process_info()
        imageloader = DataLoader(image, im_bs, shuffle=True, drop_last=True,
                                 seed=args.manualSeed, process_index=pi, process_count=pc)
        storyloader = DataLoader(story, st_bs, shuffle=True, drop_last=True,
                                 seed=args.manualSeed + 1, process_index=pi, process_count=pc)
        testloader = DataLoader(test, st_bs, shuffle=False, drop_last=True,
                                 seed=args.manualSeed + 2, process_index=pi, process_count=pc)
    else:
        from cpcsv_tpu.data.pororo import build_pororo_loaders

        imageloader, storyloader, testloader = build_pororo_loaders(cfg, args.manualSeed)

    from cpcsv_tpu.cli.dispatch import dispatch

    dispatch(cfg, args, output_dir, imageloader, storyloader, testloader)


if __name__ == "__main__":
    main()
