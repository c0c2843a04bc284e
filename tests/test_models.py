"""Shape/dtype tests for the generator and discriminators (both variants).

Shapes mirror the reference smoke blocks (reference `cascade_model.py:714-719`,
`model.py:660-663`) with small batch sizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpcsv_tpu.config import default_config
from cpcsv_tpu.models import build_models, VideoEncoder

B, T = 2, 5
MOTION, CONTENT = 365, 356


def small_cfg(**kw):
    cfg = default_config().with_updates(
        CONFIG_NAME="test",
        GAN=default_config().GAN,
        **kw,
    )
    # shrink generator for test speed
    return cfg.with_updates(
        GAN=cfg.GAN.__class__(
            CONDITION_DIM=124, Z_DIM=100, DF_DIM=32, GF_DIM=16, GF_SEG_DIM=64, R_NUM=4
        )
    )


def _init_gen(cfg):
    from cpcsv_tpu.models import generator_from_config

    gen = generator_from_config(cfg)
    motion = jnp.zeros((B, T, MOTION))
    content = jnp.zeros((B, T, CONTENT))
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        motion,
        content,
    )
    return gen, variables


@pytest.mark.parametrize("cascade", [False, True])
def test_generator_sample_videos_shapes(cascade):
    cfg = small_cfg(CASCADE_MODEL=cascade, SEGMENT_LEARNING=True)
    gen, variables = _init_gen(cfg)
    motion = jnp.ones((B, T, MOTION)) * 0.1
    content = jnp.ones((B, T, CONTENT)) * 0.1

    out, mutated = gen.apply(
        variables,
        motion,
        content,
        True,  # seg
        method="sample_videos",
        rngs={"noise": jax.random.PRNGKey(2)},
        mutable=["batch_stats", "spectral"],
    )
    assert out.image.shape == (B, T, 64, 64, 3)
    assert out.seg.shape == (B * T, 64, 64, 1)
    assert out.m_mu.shape == (B * T, MOTION)
    assert out.c_mu.shape == (B, 124)
    assert np.isfinite(np.asarray(out.image)).all()
    if cascade:
        (h, g) = out.latents
        ngf_seg = cfg.GAN.GF_SEG_DIM
        assert h[0].shape == (B * T, 4, 4, ngf_seg)
        assert g[0].shape == (B * T, 4, 4, ngf_seg)
        assert g[3].shape == (B * T, 32, 32, ngf_seg // 8)
    else:
        assert out.latents is None


def test_generator_sample_images_shapes():
    cfg = small_cfg(CASCADE_MODEL=True, SEGMENT_LEARNING=True)
    gen, variables = _init_gen(cfg)
    motion = jnp.ones((B * 3, MOTION)) * 0.1
    content = jnp.ones((B * 3, T, CONTENT)) * 0.1
    out, _ = gen.apply(
        variables,
        motion,
        content,
        True,
        method="sample_images",
        rngs={"noise": jax.random.PRNGKey(3)},
        mutable=["batch_stats", "spectral"],
    )
    assert out.image.shape == (B * 3, 64, 64, 3)
    assert out.seg.shape == (B * 3, 64, 64, 1)
    assert out.c_mu.shape == (B * 3, 124)


def test_autoencoder_roundtrip_shape():
    cfg = small_cfg(CASCADE_MODEL=True, SEGMENT_LEARNING=True)
    gen, variables = _init_gen(cfg)
    segs = jnp.zeros((4, 64, 64, 1))
    recon, _ = gen.apply(
        variables,
        segs,
        method="train_autoencoder",
        mutable=["batch_stats", "spectral"],
    )
    assert recon.shape == (4, 64, 64, 1)


def test_discriminators_shapes():
    cfg = small_cfg(CASCADE_MODEL=False, SEGMENT_LEARNING=True)
    _, d_im, d_st, d_se = build_models(cfg)
    ndf = cfg.GAN.DF_DIM

    imgs = jnp.zeros((6, 64, 64, 3))
    cond = jnp.zeros((6, 124 + 356 + 9))
    v = d_im.init(jax.random.PRNGKey(0), imgs, cond, method="full_forward")
    feat, _ = d_im.apply(v, imgs, mutable=["batch_stats", "spectral"])
    assert feat.shape == (6, 4, 4, ndf * 8)

    logits, _ = d_im.apply(
        v, feat, cond, method="cond_logits", mutable=["batch_stats", "spectral"]
    )
    assert logits.shape == (6,)
    cate = d_im.apply(v, feat, method="cate_logits")
    assert cate.shape == (6, 9)

    story = jnp.zeros((2, T, 64, 64, 3))
    st_cond = jnp.zeros((2, 124 + 356 + 9))
    v_st = d_st.init(jax.random.PRNGKey(0), story, st_cond, method="full_forward")
    f_st, _ = d_st.apply(v_st, story, mutable=["batch_stats", "spectral"])
    assert f_st.shape == (2, 4, 4, ndf * 8)

    masks = jnp.zeros((6, 64, 64, 1))
    v_se = d_se.init(jax.random.PRNGKey(0), masks, cond, method="full_forward")
    f_se, _ = d_se.apply(v_se, masks, mutable=["batch_stats", "spectral"])
    assert f_se.shape == (6, 4, 4, ndf * 8)


def test_video_encoder_shape():
    enc = VideoEncoder()
    story = jnp.zeros((3, 5, 64, 64, 3))
    v = enc.init(jax.random.PRNGKey(0), story)
    out, _ = enc.apply(v, story, mutable=["batch_stats", "spectral"])
    assert out.shape == (3, 1)
