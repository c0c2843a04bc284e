"""Shared CLI dispatch: eval walks / load_ckpt inference / training.

Both CLIs end in the same mutually-exclusive branch ladder (reference
`main_pororo.py:152-171` and `main_clevr.py:124-139`); the reference
duplicates it per entry point, we share it. Order matches the reference:
eval flags win over --load_ckpt, which wins over training. The --eval_is /
--eval_ssim branches are extensions (the reference ships
fid/inception_score.py and ssim_score.py but wires neither to a CLI).
"""

from __future__ import annotations

import argparse
import os


def _str2bool(v: str) -> bool:
    """Strict boolean flag parser — the documented fix for the reference's
    argparse type=bool footgun (main_pororo.py:39-40: any non-empty string,
    including "0" and "False", parsed as True)."""
    if v.lower() in ("1", "true", "yes", "y"):
        return True
    if v.lower() in ("0", "false", "no", "n"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")


def dispatch(cfg, args, output_dir, imageloader, storyloader, testloader):
    # one predicate drives BOTH the deferred import and the branch ladder, so
    # a future eval flag added to the ladder cannot silently miss the import
    # (it would fall into the else/train branch instead — reviewable, not a
    # NameError at dispatch time)
    wants_infer = (args.eval_fid or args.eval_fvd or args.eval_is
                   or args.eval_ssim or args.load_ckpt is not None)
    if wants_infer:
        # deferred relative to module import so the train path stays light
        from cpcsv_tpu.evaluation.drivers import Infer

        if args.eval_fid:
            Infer(cfg, output_dir).eval_fid2(testloader)
        elif args.eval_fvd:
            Infer(cfg, output_dir).eval_fvd(testloader)
        elif args.eval_is:
            Infer(cfg, output_dir).eval_is(testloader)
        elif args.eval_ssim:
            Infer(cfg, output_dir).eval_ssim_walk(testloader)
        else:  # --load_ckpt N
            infer = Infer(cfg, output_dir, load_ckpt=args.load_ckpt)
            infer.inference_samples(
                testloader, os.path.join(output_dir, "Evaluation", "samples")
            )
    else:
        from cpcsv_tpu.train.trainer import GANTrainer

        trainer = GANTrainer(
            cfg, output_dir, cfg_file=args.cfg_file,
            continue_ckpt=args.continue_ckpt, seed=args.manualSeed,
        )
        trainer.train(imageloader, storyloader, testloader)


def add_eval_flags(parser):
    """The four eval-walk flags, shared verbatim by both CLIs (reference
    main_pororo.py:39-40 / main_clevr.py:49-50 use the broken argparse
    type=bool; _str2bool is the documented fix)."""
    for flag in ("--eval_fid", "--eval_fvd", "--eval_is", "--eval_ssim"):
        parser.add_argument(flag, type=_str2bool, nargs="?", const=True,
                            default=False)
    return parser


def add_debug_flag(parser):
    """--debug, shared by both CLIs: the reference's takes a value
    (main_pororo.py:31 / main_clevr.py:41 have no type=, so `--debug 1` is
    the reference form); nargs="?" accepts both that and the bare switch."""
    parser.add_argument("--debug", type=_str2bool, nargs="?", const=True,
                        default=False)
    return parser


def add_compat_flags(parser):
    """Flags the reference parses but never consumes, accepted here so a
    migrating command line does not die on argparse:

    - --gpu (dest gpu_id, reference main_pororo.py:37 / main_clevr.py:47):
      parsed into args.gpu_id but the reference reads cfg.GPU_ID from YAML
      only (main_pororo.py:64 `num_gpu = len(cfg.GPU_ID.split(','))`) —
      args.gpu_id is dead. Quirk preserved: accepted and ignored (device
      selection is JAX's job on TPU).
    """
    parser.add_argument("--gpu", dest="gpu_id", type=str, default="")
    return parser
