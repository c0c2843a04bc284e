"""Data pipeline tests: loader semantics, synthetic schema (reference batch
dict shapes per SURVEY §2.2), transforms, CLEVR label algebra."""

import numpy as np
import pytest

from cpcsv_tpu.data.loader import DataLoader, WrapAroundIterator
from cpcsv_tpu.data.synthetic import SyntheticImageDataset, SyntheticStoryDataset
from cpcsv_tpu.data.transforms import normalize_image, video_transform


def test_story_batch_schema():
    ds = SyntheticStoryDataset(n=10, video_len=5)
    loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=0)
    assert len(loader) == 2
    batch = next(iter(loader))
    assert batch["images"].shape == (4, 5, 64, 64, 3)
    assert batch["description"].shape == (4, 5, 356)
    assert batch["labels"].shape == (4, 5, 9)
    assert isinstance(batch["text"], list) and len(batch["text"]) == 4


def test_image_batch_schema():
    ds = SyntheticImageDataset(n=10, use_segment=True)
    batch = next(iter(DataLoader(ds, batch_size=4, drop_last=True)))
    assert batch["images"].shape == (4, 64, 64, 3)
    assert batch["description"].shape == (4, 356)
    assert batch["labels"].shape == (4, 9)
    assert batch["content"].shape == (4, 5, 365)
    assert batch["images_seg"].shape == (4, 64, 64, 1)


def test_wraparound_iterator():
    ds = SyntheticImageDataset(n=8, use_segment=False)
    loader = DataLoader(ds, batch_size=4, drop_last=True)
    it = WrapAroundIterator(loader)
    for _ in range(5):  # more than one epoch
        b = next(it)
        assert b["images"].shape[0] == 4


def test_loader_shuffle_determinism():
    ds = SyntheticImageDataset(n=16, use_segment=False)
    l1 = DataLoader(ds, batch_size=4, shuffle=True, seed=7)
    l2 = DataLoader(ds, batch_size=4, shuffle=True, seed=7)
    b1 = next(iter(l1))
    b2 = next(iter(l2))
    np.testing.assert_array_equal(b1["images"], b2["images"])


def test_normalize_image_range():
    arr = np.zeros((32, 32, 3), np.uint8)
    out = normalize_image(arr, 64)
    assert out.shape == (64, 64, 3)
    assert out.min() == -1.0
    arr255 = np.full((64, 64, 3), 255, np.uint8)
    assert normalize_image(arr255, 64).max() == 1.0


def test_video_transform_shape():
    frames = np.random.randint(0, 255, (5, 128, 128, 3), np.uint8)
    out = video_transform(frames, 64)
    assert out.shape == (5, 64, 64, 3)
    assert out.dtype == np.float32


def test_clevr_label_algebra():
    """cumulative-OR label slices (reference datasets/clevr.py:43-53)."""
    codes = {
        "1_1": np.array([1, 0] + [1, 0, 0, 0, 0, 0, 0, 0] + [0, 0, 0] + [1, 0, 0, 0, 0], np.float32),
        "1_2": np.array([0, 1] + [0, 1, 0, 0, 0, 0, 0, 0] + [0, 0, 0] + [0, 1, 0, 0, 0], np.float32),
    }
    attr = None
    labels = []
    for t in (1, 2):
        code = codes[f"1_{t}"]
        attr = code if attr is None else np.maximum(attr, code)
        labels.append(np.concatenate([attr[:2], attr[2:10], attr[13:18]]))
    # cumulative: frame 2's label includes frame 1's objects
    assert labels[1][2] == 1 and labels[1][3] == 1
    assert labels[0][3] == 0
