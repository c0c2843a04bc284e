"""FVD — Frechet Video Distance harness (reference `fvd/fvd.py`,
`fvd/frechet_video_distance.py`, `fvd/loader.py`).

The reference computes FVD with a TF-Hub I3D (Kinetics-400) via a TF1 graph.
TensorFlow is not a dependency here; the harness is embedder-pluggable:

  * `calculate_fvd(gen_dir, ref_dir, embedder=...)` reads the numbered-png
    dump protocol (frames named {1..N}.png, grouped into clips of
    `frames_per_video`), embeds both sides and returns the Frechet distance.
  * an I3D embedder can be registered by the user (e.g. a ported weights
    file); the default embedder is the R(2+1)D-18 FSD backbone — scores are
    then "FVD-R" (internally consistent, NOT comparable to published I3D
    FVD numbers; documented deviation).
  * reference invariants kept: the video count must be divisible by 16
    (fvd/fvd.py:55) and the empty-frame sanity harness exists in tests
    (expected ~131 only with true I3D weights; with the R(2+1)D embedder
    the self-distance==0 property is what's asserted).
"""

from __future__ import annotations

import os

import numpy as np

from cpcsv_tpu.evaluation.features import extract_activations
from cpcsv_tpu.evaluation.frechet import calculate_frechet_distance, calculate_activation_statistics

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


class VideoGenerateDataset:
    """Group flat numbered pngs into clips (reference fvd/loader.py:125-160)."""

    def __init__(self, folder: str, min_len: int = 10, imsize: int = 64):
        self.folder = folder
        self.min_len = min_len
        self.imsize = imsize
        files = [f for f in os.listdir(folder) if f.endswith(".png")]
        files.sort(key=lambda f: int(f.split(".")[0]))
        n_clips = len(files) // min_len
        self.clips = [
            files[i * min_len : (i + 1) * min_len] for i in range(n_clips)
        ]

    def __len__(self):
        return len(self.clips)

    def __getitem__(self, item):
        from cpcsv_tpu.data.transforms import normalize_image

        frames = []
        for f in self.clips[item]:
            im = Image.open(os.path.join(self.folder, f)).convert("RGB")
            frames.append(normalize_image(np.array(im), self.imsize))
        return np.stack(frames, axis=0)  # (T,H,W,C)


class VideoFolderDataset:
    """Story-folder clips with optional frame-order permutation by "degree"
    (reference fvd/loader.py:43-122: degree k swaps k random frame pairs —
    used for the FVD-vs-shuffle sensitivity study)."""

    def __init__(self, folder: str, video_len: int = 5, imsize: int = 64,
                 degree: int = 0, seed: int = 0):
        from cpcsv_tpu.evaluation.datasets import FolderStoryDataset

        self.inner = FolderStoryDataset(folder, video_len, imsize)
        self.degree = degree
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.inner)

    def __getitem__(self, item):
        story = self.inner[item]
        T = story.shape[0]
        for _ in range(self.degree):
            i, j = self.rng.integers(0, T, 2)
            story[[i, j]] = story[[j, i]]
        return story


def default_embedder(i3d_weights: str | None = None):
    """True I3D FVD whenever Kinetics-400 I3D weights are available —
    explicitly passed OR discovered through the weights registry
    ($CPCSV_METRIC_WEIGHTS_DIR / ~/.cache/cpcsv_tpu/weights); only then does
    the ≈131 empty-frame anchor apply (reference fvd/fvd.py:16-18).
    Otherwise falls back to the R(2+1)D backbone ("FVD-R") with a loud
    RandomInitMetricWarning from its factory."""
    from cpcsv_tpu.evaluation import weights as W

    path = W.resolve_weights("i3d_kinetics400", i3d_weights)
    if path:
        from cpcsv_tpu.evaluation.i3d import make_i3d_embedder

        return make_i3d_embedder(path)
    from cpcsv_tpu.evaluation.r2plus1d import make_fsd_extractor

    return make_fsd_extractor()


def calculate_fvd(
    gen_path: str,
    ref_path: str = "./Evaluation/ref",
    num_of_video: int = 272,
    frames_per_video: int = 10,
    batch_size: int = 16,
    embedder=None,
) -> float:
    """Reference fvd/fvd.py:47-88 driver shape: read both numbered-png dumps,
    embed `num_of_video` clips per side, Frechet distance."""
    assert num_of_video % 16 == 0, "video number must be divisible by 16"
    embedder = embedder or default_embedder()

    gen = VideoGenerateDataset(gen_path, frames_per_video)
    ref = VideoGenerateDataset(ref_path, frames_per_video)
    n = min(num_of_video, len(gen), len(ref))
    if n < batch_size:
        raise ValueError(
            f"FVD needs at least {batch_size} clips per side; got "
            f"gen={len(gen)} ref={len(ref)} under {gen_path!r}/{ref_path!r}"
        )
    if n % batch_size != 0:
        import warnings

        n_round = (n // batch_size) * batch_size
        warnings.warn(
            f"FVD clip count {n} not divisible by {batch_size} — using the "
            f"first {n_round} clips per side (reference invariant fvd/fvd.py:55)",
            stacklevel=2,
        )
        n = n_round

    class Head:
        def __init__(self, ds, n):
            self.ds, self.n = ds, n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return self.ds[i]

    a1 = extract_activations(Head(gen, n), embedder, batch_size)
    a2 = extract_activations(Head(ref, n), embedder, batch_size)
    m1, s1 = calculate_activation_statistics(a1)
    m2, s2 = calculate_activation_statistics(a2)
    return calculate_frechet_distance(m1, s1, m2, s2)
