"""On-disk CLEVR protocol test: CLEVR_new_%06d_%d.png frames + masks +
CLEVR_dict.npy attribute codes (reference datasets/clevr.py)."""

import os

import numpy as np
from PIL import Image

from cpcsv_tpu.data.clevr import ClevrImageDataset, ClevrStoryDataset


def _make_fake_clevr(root, n_stories=4, video_len=4):
    rng = np.random.default_rng(0)
    root = str(root)
    d = {}
    for sid in range(1, n_stories + 1):
        for t in range(1, video_len + 1):
            img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
            Image.fromarray(img).save(
                os.path.join(root, "CLEVR_new_%06d_%d.png" % (sid, t))
            )
            mask = rng.integers(0, 255, (48, 64), dtype=np.uint8)
            Image.fromarray(mask, "L").save(
                os.path.join(root, "CLEVR_new_%06d_%d_mask.png" % (sid, t))
            )
            d["%d_%d" % (sid, t)] = (rng.random(18) < 0.3).astype(np.float32)
    np.save(os.path.join(root, "CLEVR_dict.npy"), d)
    return root


def test_clevr_datasets(tmp_path):
    root = _make_fake_clevr(tmp_path)
    story = ClevrStoryDataset(root, "train", video_len=4, imsize=64)
    story.srt, story.edn = 1, 5  # restrict to the 4 fake stories
    item = story[0]
    assert item["images"].shape == (4, 64, 64, 3)
    assert item["description"].shape == (4, 18)
    assert item["labels"].shape == (4, 15)  # 2 + 8 + 5 super-label slices
    # cumulative-OR: labels never decrease over time
    lab = item["labels"]
    assert (np.diff(lab, axis=0) >= 0).all()

    image = ClevrImageDataset(root, "train", video_len=4, imsize=64, use_segment=True)
    image.srt, image.edn = 1, 5
    it = image[1]
    assert it["images"].shape == (64, 64, 3)
    assert it["labels"].shape == (8,)
    assert it["content"].shape == (4, 18)
    assert it["images_seg"].shape == (64, 64, 1)
