"""End-to-end D-step/G-step smoke tests on tiny shapes (both variants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpcsv_tpu.config import default_config, GanConfig
from cpcsv_tpu.models import build_models
from cpcsv_tpu.train import create_train_state, make_train_steps

B_ST, B_IM, T = 3, 4, 5


def tiny_cfg(**kw):
    cfg = default_config().with_updates(
        GAN=GanConfig(CONDITION_DIM=124, Z_DIM=100, DF_DIM=16, GF_DIM=8, GF_SEG_DIM=32),
        **kw,
    )
    return cfg


def make_batches(cfg, rng):
    st_batch = {
        "images": jnp.asarray(rng.standard_normal((B_ST, T, 64, 64, 3)), jnp.float32),
        "description": jnp.asarray(rng.standard_normal((B_ST, T, 356)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 2, (B_ST, T, 9)), jnp.float32),
    }
    im_batch = {
        "images": jnp.asarray(rng.standard_normal((B_IM, 64, 64, 3)), jnp.float32),
        "description": jnp.asarray(rng.standard_normal((B_IM, 356)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 2, (B_IM, 9)), jnp.float32),
        "content": jnp.asarray(rng.standard_normal((B_IM, T, 356)), jnp.float32),
    }
    if cfg.SEGMENT_LEARNING:
        im_batch["images_seg"] = jnp.asarray(
            rng.standard_normal((B_IM, 64, 64, 1)), jnp.float32
        )
    if cfg.USE_SEQ_CONSISTENCY:
        st_batch["shuffled"] = st_batch["images"]
        st_batch["order_labels"] = jnp.zeros((B_ST,), jnp.float32)
    return st_batch, im_batch


@pytest.mark.parametrize(
    "cascade,segment", [(False, True), (True, True), (False, False)]
)
def test_train_steps_run_and_update(cascade, segment):
    cfg = tiny_cfg(CASCADE_MODEL=cascade, SEGMENT_LEARNING=segment or cascade)
    models = build_models(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), models)
    d_step, g_step = make_train_steps(cfg, models)
    rng = np.random.default_rng(0)
    st_batch, im_batch = make_batches(cfg, rng)

    g_kernel_before = np.asarray(
        jax.tree.leaves(state.gen.params)[0]
    ).copy()

    state, d_metrics = d_step(state, jax.random.PRNGKey(1), st_batch, im_batch, 4e-4)
    state, g_metrics = g_step(state, jax.random.PRNGKey(2), st_batch, im_batch, 1e-4)

    for k, v in {**d_metrics, **g_metrics}.items():
        assert np.isfinite(np.asarray(v)), f"{k} not finite"
    assert int(state.step) == 1

    g_kernel_after = np.asarray(jax.tree.leaves(state.gen.params)[0])
    assert not np.allclose(g_kernel_before, g_kernel_after), "G params did not move"

    if cascade:
        assert "G/reconstruct_loss" in g_metrics
        assert "G/video_vae_loss" in g_metrics


def test_infonce_train_step():
    """USE_INFONCE extension: D step runs, losses finite, params move."""
    cfg = tiny_cfg(CASCADE_MODEL=False, SEGMENT_LEARNING=True, USE_INFONCE=True)
    models = build_models(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), models)
    d_step, g_step = make_train_steps(cfg, models)
    rng = np.random.default_rng(2)
    st_batch, im_batch = make_batches(cfg, rng)
    d_before = np.asarray(jax.tree.leaves(state.d_im.params)[0]).copy()
    state, dm = d_step(state, jax.random.PRNGKey(1), st_batch, im_batch, 4e-4)
    state, gm = g_step(state, jax.random.PRNGKey(2), st_batch, im_batch, 1e-4)
    for k, v in {**dm, **gm}.items():
        assert np.isfinite(np.asarray(v)), f"{k} not finite"
    d_after = np.asarray(jax.tree.leaves(state.d_im.params)[0])
    assert not np.allclose(d_before, d_after)


def test_seq_consistency_branch():
    cfg = tiny_cfg(CASCADE_MODEL=False, SEGMENT_LEARNING=True, USE_SEQ_CONSISTENCY=True)
    models = build_models(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), models)
    d_step, g_step = make_train_steps(cfg, models)
    rng = np.random.default_rng(1)
    st_batch, im_batch = make_batches(cfg, rng)
    state, dm = d_step(state, jax.random.PRNGKey(1), st_batch, im_batch, 4e-4)
    state, gm = g_step(state, jax.random.PRNGKey(2), st_batch, im_batch, 1e-4)
    assert np.isfinite(np.asarray(dm["st_D/order"]))
    assert np.isfinite(np.asarray(gm["G/consistency"]))
