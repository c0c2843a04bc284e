"""Legacy StackGAN TextDataset (reference miscc/datasets.py:57-190).

The reference class is dead code AND crashes on use (img.shape on a PIL
Image); these tests pin the working modern equivalent's protocol: corpus
layout, bbox crop math, embedding pick determinism, class-id fallback.
"""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

from cpcsv_tpu.data.legacy_text import TextDataset


def _write_corpus(root, n=4, n_captions=3, dim=8, birds=False, class_info=False):
    split = os.path.join(root, "train")
    os.makedirs(split, exist_ok=True)
    keys = [f"cls/img_{i}" for i in range(n)]
    img_dir = os.path.join(root, "CUB_200_2011" if birds else "", "images")
    for key in keys:
        path = os.path.join(img_dir, f"{key}.jpg")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        # distinct solid colors so crops are identifiable after resize
        Image.new("RGB", (100, 80), (40, 80, 120)).save(path)
    with open(os.path.join(split, "filenames.pickle"), "wb") as f:
        pickle.dump(keys, f, protocol=2)  # py2-era protocol, like StackGAN
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(n, n_captions, dim)).astype(np.float32)
    with open(os.path.join(split, "char-CNN-RNN-embeddings.pickle"), "wb") as f:
        pickle.dump([e for e in emb], f, protocol=2)
    if class_info:
        with open(os.path.join(split, "class_info.pickle"), "wb") as f:
            pickle.dump(list(range(100, 100 + n)), f, protocol=2)
    if birds:
        cub = os.path.join(root, "CUB_200_2011")
        with open(os.path.join(cub, "images.txt"), "w") as f:
            f.writelines(f"{i + 1} {k}.jpg\n" for i, k in enumerate(keys))
        with open(os.path.join(cub, "bounding_boxes.txt"), "w") as f:
            # x=10 y=20 w=40 h=20 for every image
            f.writelines(f"{i + 1} 10.0 20.0 40.0 20.0\n" for i in range(n))
    return keys, emb


def test_flowers_layout_and_shapes(tmp_path):
    root = str(tmp_path / "flowers")
    _, emb = _write_corpus(root)
    ds = TextDataset(root, imsize=64, seed=3)
    assert len(ds) == 4
    img, e = ds[1]
    # load size = imsize * 76 // 64 (reference miscc/datasets.py:91)
    assert img.shape == (76, 76, 3) and img.dtype == np.uint8
    assert e.shape == (8,)
    # the picked embedding is one of item 1's caption rows
    assert any(np.allclose(e, row) for row in emb[1])
    # class_info.pickle absent -> arange fallback
    assert np.array_equal(ds.class_id, np.arange(4))


def test_embedding_pick_is_seed_and_epoch_deterministic(tmp_path):
    root = str(tmp_path / "flowers")
    _write_corpus(root, n_captions=5)
    picks = []
    for _ in range(2):
        ds = TextDataset(root, seed=7)
        ds.set_epoch(2)
        picks.append(np.stack([ds[i][1] for i in range(len(ds))]))
    np.testing.assert_array_equal(picks[0], picks[1])
    other = TextDataset(root, seed=8)
    other.set_epoch(2)
    assert not np.array_equal(
        picks[0], np.stack([other[i][1] for i in range(len(other))])
    )


def test_birds_bbox_crop(tmp_path):
    root = str(tmp_path / "birds")
    keys, _ = _write_corpus(root, birds=True, class_info=True)
    # repaint image 0 white inside the expected crop window, black outside:
    # bbox (10,20,40,20) -> R=30, center (30,30) -> x 0:60, y 0:60
    arr = np.zeros((80, 100, 3), np.uint8)
    arr[0:60, 0:60] = 255
    Image.fromarray(arr).save(
        os.path.join(root, "CUB_200_2011", "images", f"{keys[0]}.jpg")
    )
    ds = TextDataset(root, imsize=64, seed=0)
    assert ds.bbox[keys[0]] == [10, 20, 40, 20]
    img, _ = ds[0]
    assert img.shape == (76, 76, 3)
    # the crop is entirely the white region (jpeg-lossy, so near-255)
    assert img.min() > 200
    # class_info.pickle present -> loaded ids, not arange
    assert np.array_equal(ds.class_id, np.arange(100, 104))


def test_transforms_and_errors(tmp_path):
    root = str(tmp_path / "flowers")
    _write_corpus(root)
    ds = TextDataset(
        root,
        transform=lambda a: a.astype(np.float32) / 255.0,
        target_transform=lambda e: e * 0.0,
    )
    img, e = ds[0]
    assert img.dtype == np.float32 and img.max() <= 1.0
    np.testing.assert_array_equal(e, np.zeros_like(e))
    with pytest.raises(ValueError, match="embedding_type"):
        TextDataset(root, embedding_type="bert")
    # mismatched filenames vs embedding rows fails loudly
    with open(os.path.join(root, "train", "filenames.pickle"), "wb") as f:
        pickle.dump(["cls/img_0"], f, protocol=2)
    with pytest.raises(ValueError, match="embedding rows"):
        TextDataset(root)
