"""Deterministic synthetic datasets with the exact Pororo batch schema —
used by tests, bench.py, and the end-to-end slice when no dataset is on disk.

Schema matches reference StoryDataset / ImageDataset output dicts
(datasets/pororo.py:103-151, 181-246), with videos (T,H,W,C) NHWC."""

from __future__ import annotations

import numpy as np


class SyntheticStoryDataset:
    def __init__(
        self,
        n: int = 64,
        video_len: int = 5,
        imsize: int = 64,
        text_dim: int = 356,
        label_num: int = 9,
        seed: int = 0,
    ):
        self.n = n
        self.video_len = video_len
        self.imsize = imsize
        self.text_dim = text_dim
        self.label_num = label_num
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, item: int) -> dict:
        rng = np.random.default_rng(self.seed * 1_000_003 + item)
        T, S = self.video_len, self.imsize
        images = rng.uniform(-1, 1, (T, S, S, 3)).astype(np.float32)
        des = rng.standard_normal((T, self.text_dim)).astype(np.float32)
        labels = (rng.random((T, self.label_num)) < 0.3).astype(np.float32)
        return {
            "images": images,
            "description": des,
            "subtitle": des[:, :128].copy(),
            "labels": labels,
            "text": [f"synthetic story {item} frame {t}" for t in range(T)],
        }


class SyntheticImageDataset:
    def __init__(
        self,
        n: int = 64,
        video_len: int = 5,
        imsize: int = 64,
        sesize: int = 64,
        text_dim: int = 356,
        label_num: int = 9,
        use_segment: bool = True,
        seed: int = 1,
    ):
        self.n = n
        self.video_len = video_len
        self.imsize = imsize
        self.sesize = sesize
        self.text_dim = text_dim
        self.label_num = label_num
        self.use_segment = use_segment
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, item: int) -> dict:
        rng = np.random.default_rng(self.seed * 7_000_003 + item)
        S = self.imsize
        out = {
            "images": rng.uniform(-1, 1, (S, S, 3)).astype(np.float32),
            "description": rng.standard_normal(self.text_dim).astype(np.float32),
            "subtitle": rng.standard_normal(128).astype(np.float32),
            "labels": (rng.random(self.label_num) < 0.3).astype(np.float32),
            "content": rng.standard_normal(
                (self.video_len, self.text_dim + self.label_num)
            ).astype(np.float32),
            "text": f"synthetic image {item}",
        }
        if self.use_segment:
            out["images_seg"] = rng.uniform(-1, 1, (self.sesize, self.sesize, 1)).astype(
                np.float32
            )
        return out
