"""Convert the metric backbones' torch checkpoints to portable .npz files.

Run this on a machine that HAS the weight files (this sandbox has neither
network nor checkpoints); copy the resulting .npz into
$CPCSV_METRIC_WEIGHTS_DIR or ~/.cache/cpcsv_tpu/weights on the TPU host and
every FID/FSD/FVD/IS extractor picks them up automatically (see
cpcsv_tpu/evaluation/weights.py).

Sources (same checkpoints the reference uses):
  * FID InceptionV3  — pt_inception-2015-12-05.pth
      (mseitzer/pytorch-fid release; reference fid/inception.py downloads it)
  * FSD R(2+1)D-18   — r2plus1d_18-91a641e6.pth
      (torchvision Kinetics-400; reference fid/vfid_score.py:50-60)
  * FVD I3D          — pytorch-i3d rgb_imagenet/rgb_kinetics .pt
      (piergiaj/pytorch-i3d port of the TF-Hub i3d-kinetics-400 the
       reference uses, fvd/frechet_video_distance.py:65)

Usage:
  python tools/port_metric_weights.py --inception pt_inception-2015-12-05.pth \
      --r2plus1d r2plus1d_18-91a641e6.pth --i3d rgb_kinetics400.pt \
      [--out ~/.cache/cpcsv_tpu/weights]

The .npz simply stores the flattened torch state_dict (key -> float array);
the layout converters in cpcsv_tpu/evaluation/{inception,r2plus1d,i3d}.py
consume either format identically.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def convert(pth_path: str, out_path: str) -> None:
    import torch

    sd = torch.load(pth_path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    arrays = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            arrays[k] = v.detach().cpu().numpy()
        else:
            arrays[k] = np.asarray(v)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    np.savez(out_path, **arrays)
    total = sum(a.size for a in arrays.values())
    print(f"{pth_path} -> {out_path}  ({len(arrays)} tensors, {total/1e6:.1f}M params)")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--inception", help="pt_inception-2015-12-05.pth")
    p.add_argument("--r2plus1d", help="r2plus1d_18-91a641e6.pth")
    p.add_argument("--i3d", help="pytorch-i3d rgb checkpoint (.pt)")
    p.add_argument(
        "--out",
        default=os.path.expanduser("~/.cache/cpcsv_tpu/weights"),
        help="output directory (default: the weights registry's search dir)",
    )
    args = p.parse_args(argv)
    if not any([args.inception, args.r2plus1d, args.i3d]):
        p.error("give at least one of --inception / --r2plus1d / --i3d")
    if args.inception:
        convert(args.inception, os.path.join(args.out, "inception_fid.npz"))
    if args.r2plus1d:
        convert(args.r2plus1d, os.path.join(args.out, "r2plus1d_18.npz"))
    if args.i3d:
        convert(args.i3d, os.path.join(args.out, "i3d_kinetics400.npz"))


if __name__ == "__main__":
    main()
