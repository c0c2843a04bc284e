"""Story-order shuffle augmentation for the order-consistency branch.

Reference: `create_random_shuffle` / `check_is_order` (miscc/utils.py:17-44).
Runs HOST-SIDE on numpy (it is data augmentation, not compute): with p=0.5
per story, permute the frame order (rejecting already-sorted permutations)
and, with a random partner story, splice one frame in. Label 1 = shuffled.

Input/output stories are (B, T, H, W, C) numpy arrays.
"""

from __future__ import annotations

import numpy as np


def check_is_order(sequence) -> bool:
    return bool((np.diff(sequence) >= 0).all())


def create_random_shuffle(
    stories: np.ndarray, random_rate: float = 0.5, rng: np.random.Generator | None = None
):
    rng = rng or np.random.default_rng()
    B, T = stories.shape[0], stories.shape[1]
    out = np.empty_like(stories)
    labels = np.zeros((B,), dtype=np.float32)
    for idx in range(B):
        if rng.random() >= random_rate:
            out[idx] = stories[idx]
            continue
        labels[idx] = 1.0
        perm = rng.permutation(T)
        while check_is_order(perm):
            rng.shuffle(perm)
        shuffled = stories[idx, perm].copy()
        partner = int(rng.integers(0, B))
        if partner != idx:
            frame = int(rng.integers(0, T))
            shuffled[frame] = stories[partner, frame]
        out[idx] = shuffled
    return out, labels
