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


def test_bf16_adam_moments():
    """ADAM_MU_DTYPE=bfloat16 stores the first moment in bf16; the step runs
    finite, params stay fp32, and updates track the fp32-moment program
    closely (the HBM-traffic A/B lever for the MFU push)."""
    import jax.numpy as jnp

    cfg = tiny_cfg(CASCADE_MODEL=False, SEGMENT_LEARNING=False,
                   ADAM_MU_DTYPE="bfloat16")
    models = build_models(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), models)
    mu_leaves = jax.tree.leaves(state.gen.opt_state.mu)
    assert all(l.dtype == jnp.bfloat16 for l in mu_leaves)
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(state.gen.params))

    d_step, g_step = make_train_steps(cfg, models)
    rng = np.random.default_rng(0)
    st_batch, im_batch = make_batches(cfg, rng)
    state, dm = d_step(state, jax.random.PRNGKey(1), st_batch, im_batch, 4e-4)
    state, gm = g_step(state, jax.random.PRNGKey(2), st_batch, im_batch, 1e-4)
    for k, v in {**dm, **gm}.items():
        assert np.isfinite(np.asarray(v)), f"{k} not finite"
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(state.gen.params))

    # parity vs the fp32-moment program after one identical step
    cfg32 = tiny_cfg(CASCADE_MODEL=False, SEGMENT_LEARNING=False)
    state32 = create_train_state(cfg32, jax.random.PRNGKey(0), build_models(cfg32))
    d32, g32 = make_train_steps(cfg32, build_models(cfg32))
    state32, _ = d32(state32, jax.random.PRNGKey(1), st_batch, im_batch, 4e-4)
    state32, _ = g32(state32, jax.random.PRNGKey(2), st_batch, im_batch, 1e-4)
    a = np.asarray(jax.tree.leaves(state.gen.params)[0])
    b = np.asarray(jax.tree.leaves(state32.gen.params)[0])
    np.testing.assert_allclose(a, b, rtol=0, atol=5e-3)


def test_bf16_compute_train_step():
    """COMPUTE_DTYPE=bfloat16 — the compute path configs/throughput.yml
    ships (and the TPU bench measures): the full cascade D+G step runs
    finite, params/optimizer stay fp32 (bf16 is compute-only, selected in
    models/factory.py), params move, and the first updated kernel tracks
    the fp32-compute program to bf16-roundoff tolerance."""
    cfg = tiny_cfg(CASCADE_MODEL=True, SEGMENT_LEARNING=True,
                   COMPUTE_DTYPE="bfloat16")
    models = build_models(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), models)
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(state.gen.params))

    d_step, g_step = make_train_steps(cfg, models)
    rng = np.random.default_rng(3)
    st_batch, im_batch = make_batches(cfg, rng)
    before = np.asarray(jax.tree.leaves(state.gen.params)[0]).copy()
    state, dm = d_step(state, jax.random.PRNGKey(1), st_batch, im_batch, 4e-4)
    state, gm = g_step(state, jax.random.PRNGKey(2), st_batch, im_batch, 1e-4)
    for k, v in {**dm, **gm}.items():
        assert np.isfinite(np.asarray(v)), f"{k} not finite"
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(state.gen.params))
    after = np.asarray(jax.tree.leaves(state.gen.params)[0])
    assert not np.allclose(before, after), "G params did not move under bf16"

    # parity vs fp32 compute after one identical step: Adam's first update
    # is ~ -lr*sign(grad), so bf16 gradient roundoff can flip near-zero
    # elements by up to 2*lr (same allowance as the multi-device dryrun)
    cfg32 = tiny_cfg(CASCADE_MODEL=True, SEGMENT_LEARNING=True)
    models32 = build_models(cfg32)
    state32 = create_train_state(cfg32, jax.random.PRNGKey(0), models32)
    d32, g32 = make_train_steps(cfg32, models32)
    state32, _ = d32(state32, jax.random.PRNGKey(1), st_batch, im_batch, 4e-4)
    state32, _ = g32(state32, jax.random.PRNGKey(2), st_batch, im_batch, 1e-4)
    ref = np.asarray(jax.tree.leaves(state32.gen.params)[0])
    np.testing.assert_allclose(after, ref, rtol=0, atol=2.5e-4)


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


def test_scan_steps_match_split_steps():
    """make_scan_steps (K updates in one lax.scan dispatch) must produce the
    same state/metrics as K sequential split d_step+g_step calls when fed the
    same per-step keys and batches."""
    from cpcsv_tpu.train.steps import make_scan_steps

    cfg = tiny_cfg(CASCADE_MODEL=True, SEGMENT_LEARNING=True)
    models = build_models(cfg)
    rng = np.random.default_rng(0)
    b0 = make_batches(cfg, rng)
    b1 = make_batches(cfg, rng)

    key = jax.random.PRNGKey(7)
    keys = jax.random.split(key, 2)

    # --- split path
    state_a = create_train_state(cfg, jax.random.PRNGKey(0), models)
    d_step, g_step = make_train_steps(cfg, models, jit=False)
    split_metrics = []
    for k, (st, im) in zip(keys, (b0, b1)):
        kd, kg = jax.random.split(k)
        state_a, _ = d_step(state_a, kd, st, im, 4e-4)
        state_a, m = g_step(state_a, kg, st, im, 1e-4)
        split_metrics.append(m)

    # --- scan path (same key derivation: split(rng, K) happens inside)
    state_b = create_train_state(cfg, jax.random.PRNGKey(0), models)
    scan_steps = make_scan_steps(cfg, models)
    st_k = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), b0[0], b1[0])
    im_k = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), b0[1], b1[1])
    state_b, scan_metrics = scan_steps(state_b, key, st_k, im_k, 4e-4, 1e-4)

    # step 0 must match tightly (same keys/batches, update not yet applied);
    # step 1 runs on once-updated params, where the scanned program's
    # different fusion/reduction order drifts a GAN loss by ~0.2% — allow it.
    tols = ({"rtol": 2e-4, "atol": 2e-5}, {"rtol": 2e-2, "atol": 1e-3})
    for i, m in enumerate(split_metrics):
        for tag, v in m.items():
            np.testing.assert_allclose(
                float(v), float(scan_metrics[tag][i]), **tols[i],
                err_msg=f"step {i} metric {tag}",
            )
    pa = jax.tree_util.tree_leaves(state_a.gen.params)
    pb = jax.tree_util.tree_leaves(state_b.gen.params)
    # after 2 Adam steps at lr=1e-4 the drift bound is a few update sizes;
    # atol dominates (rtol is meaningless for near-zero params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=1e-3
        )
