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


def test_clevr_dims_train_step():
    """Full D+G step at CLEVR dims (T=4, text 18, labels 8) — catches any
    story/image label-dim mismatch (the reference's CLEVR wiring cannot run
    as written; see data/clevr.py)."""
    import jax
    import jax.numpy as jnp

    from cpcsv_tpu.config import GanConfig, TextConfig, default_config
    from cpcsv_tpu.models import build_models
    from cpcsv_tpu.train import create_train_state, make_train_steps

    cfg = default_config().with_updates(
        CASCADE_MODEL=False,
        SEGMENT_LEARNING=True,
        VIDEO_LEN=4,
        LABEL_NUM=8,
        TEXT=TextConfig(DIMENSION=18),
        GAN=GanConfig(CONDITION_DIM=124, Z_DIM=100, DF_DIM=8, GF_DIM=4, GF_SEG_DIM=16),
    )
    models = build_models(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), models)
    d_step, g_step = make_train_steps(cfg, models)
    rng = np.random.default_rng(0)
    B_st, B_im, T = 2, 3, 4
    st_batch = {
        "images": jnp.asarray(rng.standard_normal((B_st, T, 64, 64, 3)), jnp.float32),
        "description": jnp.asarray(rng.standard_normal((B_st, T, 18)), jnp.float32),
        "labels": jnp.asarray((rng.random((B_st, T, 8)) < 0.3), jnp.float32),
    }
    im_batch = {
        "images": jnp.asarray(rng.standard_normal((B_im, 64, 64, 3)), jnp.float32),
        "description": jnp.asarray(rng.standard_normal((B_im, 18)), jnp.float32),
        "labels": jnp.asarray((rng.random((B_im, 8)) < 0.3), jnp.float32),
        "content": jnp.asarray(rng.standard_normal((B_im, T, 18)), jnp.float32),
        "images_seg": jnp.asarray(rng.standard_normal((B_im, 64, 64, 1)), jnp.float32),
    }
    state, dm = d_step(state, jax.random.PRNGKey(1), st_batch, im_batch, 4e-4)
    state, gm = g_step(state, jax.random.PRNGKey(2), st_batch, im_batch, 1e-4)
    for k, v in {**dm, **gm}.items():
        assert np.isfinite(np.asarray(v)), k


def test_clevr_datasets(tmp_path):
    root = _make_fake_clevr(tmp_path)
    story = ClevrStoryDataset(root, "train", video_len=4, imsize=64)
    story.srt, story.edn = 1, 5  # restrict to the 4 fake stories
    item = story[0]
    assert item["images"].shape == (4, 64, 64, 3)
    assert item["description"].shape == (4, 18)
    assert item["labels"].shape == (4, 8)  # 8-d cumulative object labels
    assert item["super_labels"].shape == (4, 15)  # 2 + 8 + 5 slices
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
