"""Image FID (reference `fid/fid_score.py` + `fid/fid_score_v.py`).

fid_score(real, fake): InceptionV3-FID pool3 (2048-d) statistics + Frechet
distance. Datasets yield images (H,W,C) float; stories (T,H,W,C) are
flattened to frames first (the `fid_score_v` behavior, fid/fid_score_v.py:87-89).
"""

from __future__ import annotations

import numpy as np

from cpcsv_tpu.evaluation.features import activation_statistics
from cpcsv_tpu.evaluation.frechet import calculate_frechet_distance
from cpcsv_tpu.evaluation.inception import make_inception_extractor


class FlattenStories:
    """(T,H,W,C) story dataset -> frame dataset (reference fid_score_v)."""

    def __init__(self, story_dataset):
        self.ds = story_dataset
        self.T = np.asarray(story_dataset[0]).shape[0]

    def __len__(self):
        return len(self.ds) * self.T

    def __getitem__(self, i):
        story = np.asarray(self.ds[i // self.T])
        return story[i % self.T]


def fid_score(
    r_imgs,
    g_imgs,
    batch_size: int = 50,
    normalize: bool = False,
    r_cache: str | None = None,
    extractor=None,
    weights_path: str | None = None,
) -> float:
    """Reference fid/fid_score.py:161-183 signature shape. `r_imgs[i]` /
    `g_imgs[i]` return (H,W,C) images or (T,H,W,C) stories (auto-flattened)."""
    if extractor is None:
        extractor = make_inception_extractor(weights_path)
    if np.asarray(r_imgs[0]).ndim == 4:
        r_imgs = FlattenStories(r_imgs)
    if np.asarray(g_imgs[0]).ndim == 4:
        g_imgs = FlattenStories(g_imgs)
    m1, s1 = activation_statistics(r_imgs, extractor, batch_size, normalize, r_cache)
    m2, s2 = activation_statistics(g_imgs, extractor, batch_size, normalize)
    return calculate_frechet_distance(m1, s1, m2, s2)
