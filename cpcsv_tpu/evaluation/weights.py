"""Metric-extractor weights: resolution, loading, fingerprinting, and LOUD
random-init warnings.

The reference's metric stack always runs pretrained backbones
(fid/fid_score.py:48-56 downloads pt_inception-2015-12-05;
fid/vfid_score.py:50-60 torchvision Kinetics r2plus1d_18;
fvd/frechet_video_distance.py:65 TF-Hub I3D). This sandbox has no network
and ships no weight files, so the extractors *can* fall back to random
initialization — but that fallback must never masquerade as a real score:

  * every factory resolves weights through `resolve_weights()` (explicit
    path -> $CPCSV_METRIC_WEIGHTS_DIR -> ~/.cache/cpcsv_tpu/weights);
  * a random-init extractor triggers `RandomInitMetricWarning` and is
    tagged `extractor.random_init = True`;
  * real-side statistic caches are keyed by `weights_fingerprint()` so a
    random-init cache can never be reused once real weights appear.

Use `tools/port_metric_weights.py` on a weights-available machine to convert
the torch checkpoints to portable .npz files.
"""

from __future__ import annotations

import hashlib
import os
import warnings

import numpy as np


class RandomInitMetricWarning(UserWarning):
    """A metric feature extractor is running with RANDOM weights."""


#: canonical filenames searched per extractor, in priority order
#: (.npz first: the portable format produced by tools/port_metric_weights.py)
REGISTRY: dict[str, tuple[str, ...]] = {
    "inception_fid": (
        "inception_fid.npz",
        "pt_inception-2015-12-05.npz",
        "pt_inception-2015-12-05-galloway_rc.pth",
        "pt_inception-2015-12-05.pth",
    ),
    "r2plus1d_18": (
        "r2plus1d_18.npz",
        "r2plus1d_18-91a641e6.npz",
        "r2plus1d_18-91a641e6.pth",
    ),
    "i3d_kinetics400": (
        "i3d_kinetics400.npz",
        "i3d_rgb_kinetics400.npz",
        "i3d_tfhub_kinetics400.npz",  # native TF-Hub variable map (MIGRATION.md)
        "i3d_kinetics400.pth",
    ),
}


def weights_search_dirs() -> list[str]:
    dirs = []
    env = os.environ.get("CPCSV_METRIC_WEIGHTS_DIR")
    if env:
        dirs.append(env)
    dirs.append(os.path.expanduser("~/.cache/cpcsv_tpu/weights"))
    return dirs


def resolve_weights(name: str, explicit: str | None = None) -> str | None:
    """Resolve a weights file for extractor `name` (a REGISTRY key).

    Priority: explicit path (must exist — raises if not) > search dirs.
    Returns None when nothing is found (callers then warn + random-init).
    """
    if explicit:
        if not os.path.exists(explicit):
            raise FileNotFoundError(f"{name}: weights file not found: {explicit}")
        return explicit
    for d in weights_search_dirs():
        for fname in REGISTRY.get(name, ()):
            p = os.path.join(d, fname)
            if os.path.exists(p):
                return p
    return None


def load_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a torch-layout state dict from .npz (ported) or .pth (torch)."""
    if path.endswith(".npz"):
        data = np.load(path)
        return {k: data[k] for k in data.files}
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {
        k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for k, v in sd.items()
    }


def weights_fingerprint(path: str | None) -> str:
    """Short stable id of a weights file; 'random-init' when absent."""
    if not path:
        return "random-init"
    h = hashlib.sha256()
    h.update(os.path.basename(path).encode())
    h.update(str(os.path.getsize(path)).encode())
    with open(path, "rb") as f:
        h.update(f.read(1 << 20))
    return h.hexdigest()[:12]


def warn_random_init(name: str) -> None:
    warnings.warn(
        f"{name}: no pretrained weights found — the extractor runs RANDOM "
        f"initialization, so any FID/FSD/FVD/IS computed with it is NOT "
        f"comparable to published numbers. Provide weights via the factory's "
        f"weights_path argument, $CPCSV_METRIC_WEIGHTS_DIR, or "
        f"~/.cache/cpcsv_tpu/weights (port with tools/port_metric_weights.py; "
        f"accepted filenames: {', '.join(REGISTRY.get(name, ()))}).",
        RandomInitMetricWarning,
        stacklevel=3,
    )
