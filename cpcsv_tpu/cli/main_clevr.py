"""CLEVR CLI (reference `main_clevr.py:39-139`): same dispatch as the Pororo
CLI but with the CLEVR loaders (4-frame stories, 8-d labels, *_mask.png)."""

from __future__ import annotations

import argparse
import os
import pprint


def parse_args(argv=None):
    from cpcsv_tpu.cli.dispatch import add_debug_flag

    parser = argparse.ArgumentParser(description="Train CP-CSV on CLEVR (TPU)")
    add_debug_flag(parser)
    parser.add_argument("--cfg", dest="cfg_file", type=str,
                        default=os.path.join(os.path.dirname(__file__), "..", "configs", "clevr.yml"))
    parser.add_argument("--load_ckpt", default=None, type=str)
    parser.add_argument("--continue_ckpt", default=None, type=str)
    parser.add_argument("--data_dir", dest="data_dir", type=str, default="")
    # real boolean parsing (documented deviation from the reference's
    # broken argparse type=bool; see dispatch._str2bool). Same eval
    # surface as the Pororo CLI: --eval_fid/--eval_fvd per reference
    # main_clevr.py:49-50, --eval_is/--eval_ssim as extensions.
    from cpcsv_tpu.cli.dispatch import add_compat_flags, add_eval_flags

    add_eval_flags(parser)
    add_compat_flags(parser)
    parser.add_argument("--manualSeed", type=int, default=0)
    parser.add_argument("--synthetic", type=int, default=0,
                        help="train on N synthetic samples instead of DATA_DIR")
    parser.add_argument("--max_epoch", type=int, default=None)
    return parser.parse_args(argv)


def main(argv=None):
    from cpcsv_tpu.config import config_from_file
    from cpcsv_tpu.data.clevr import ClevrImageDataset, ClevrStoryDataset
    from cpcsv_tpu.data.loader import DataLoader
    from cpcsv_tpu.parallel.distributed import maybe_initialize_from_env

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

    from cpcsv_tpu.parallel.mesh import mesh_size

    n_dev = mesh_size(cfg.MESH_SHAPE)
    im_bs = cfg.TRAIN.IM_BATCH_SIZE * n_dev
    st_bs = cfg.TRAIN.ST_BATCH_SIZE * n_dev
    if args.synthetic:
        from cpcsv_tpu.data.synthetic import SyntheticImageDataset, SyntheticStoryDataset

        story = SyntheticStoryDataset(max(args.synthetic, st_bs), cfg.VIDEO_LEN,
                                      cfg.IMSIZE, cfg.TEXT.DIMENSION, cfg.LABEL_NUM)
        image = SyntheticImageDataset(max(args.synthetic * 2, im_bs), cfg.VIDEO_LEN,
                                      cfg.IMSIZE, cfg.SESIZE, cfg.TEXT.DIMENSION,
                                      cfg.LABEL_NUM, use_segment=cfg.SEGMENT_LEARNING)
        test = SyntheticStoryDataset(max(args.synthetic // 4, st_bs), cfg.VIDEO_LEN,
                                     cfg.IMSIZE, cfg.TEXT.DIMENSION, cfg.LABEL_NUM, seed=99)
    else:
        story = ClevrStoryDataset(cfg.DATA_DIR, "train", cfg.VIDEO_LEN, cfg.IMSIZE)
        # manualSeed drives the frame-pick stream (ClevrStoryDataset draws
        # nothing random, so only the image dataset takes a seed)
        image = ClevrImageDataset(cfg.DATA_DIR, "train", cfg.VIDEO_LEN, cfg.IMSIZE,
                                  cfg.SESIZE, use_segment=cfg.SEGMENT_LEARNING,
                                  seed=args.manualSeed + 10)
        test = ClevrStoryDataset(cfg.DATA_DIR, "test", cfg.VIDEO_LEN, cfg.IMSIZE)
    # per-host local slices + distinct shuffle seeds (story vs image loaders
    # must not draw the same permutation; shard_batch requires each process
    # to pass only its local rows) — same contract as build_pororo_loaders
    from cpcsv_tpu.parallel.distributed import process_info

    pi, pc = process_info()
    imageloader = DataLoader(image, im_bs, shuffle=True, drop_last=True,
                             seed=args.manualSeed, process_index=pi, process_count=pc)
    storyloader = DataLoader(story, st_bs, shuffle=True, drop_last=True,
                             seed=args.manualSeed + 1, process_index=pi, process_count=pc)
    testloader = DataLoader(test, st_bs, shuffle=False, drop_last=True,
                            seed=args.manualSeed + 2, process_index=pi, process_count=pc)

    from cpcsv_tpu.cli.dispatch import dispatch

    dispatch(cfg, args, output_dir, imageloader, storyloader, testloader)


if __name__ == "__main__":
    main()
