"""Pallas BatchNorm: numerical parity with flax nn.BatchNorm — forward,
backward, running-stat updates — in interpret mode on CPU, plus an on-device
kernel check that runs only on TPU (the remote-Mosaic miscompile hazard,
CLAUDE.md, makes on-device verification mandatory for any new kernel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from cpcsv_tpu.ops.batchnorm import PallasBatchNorm
from cpcsv_tpu.ops.blocks import make_batchnorm
from cpcsv_tpu.ops.pallas.bn import bn_grad_reduce, bn_stats


def _interp():
    return jax.default_backend() != "tpu"


@pytest.mark.parametrize("shape,dtype", [
    ((90 * 16, 128), jnp.float32),
    ((90, 365), jnp.float32),       # BN1d, C not a lane multiple
    ((1000, 124), jnp.bfloat16),    # DF_DIM channels, rows not block multiple
])
def test_bn_stats_matches_xla(shape, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), dtype)
    s, q = bn_stats(x, interpret=_interp())
    xf = x.astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(s), np.asarray(xf.sum(0)), rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(q), np.asarray((xf * xf).sum(0)), rtol=2e-5, atol=1e-3)


def test_bn_grad_reduce_matches_xla():
    rng = np.random.default_rng(1)
    M, C = 700, 124
    x = jnp.asarray(rng.standard_normal((M, C)), jnp.bfloat16)
    dy = jnp.asarray(rng.standard_normal((M, C)), jnp.float32)
    mean = jnp.asarray(rng.standard_normal(C), jnp.float32)
    inv = jnp.asarray(rng.uniform(0.5, 2.0, C), jnp.float32)
    sdy, sdyx = bn_grad_reduce(x, dy, mean, inv, interpret=_interp())
    xhat = (x.astype(jnp.float32) - mean) * inv
    np.testing.assert_allclose(np.asarray(sdy), np.asarray(dy.sum(0)), rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(sdyx), np.asarray((dy * xhat).sum(0)), rtol=2e-5, atol=1e-2
    )


@pytest.mark.parametrize("train", [True, False])
def test_pallas_bn_matches_flax_forward(train):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((6, 8, 8, 124)), jnp.float32)

    flax_bn = make_batchnorm(name="bn")
    pallas_bn = make_batchnorm(name="bn", backend="pallas")
    key = jax.random.PRNGKey(0)
    v1 = flax_bn.init(key, x, use_running_average=False)
    v2 = pallas_bn.init(key, x, use_running_average=False)
    # same param/stat tree (checkpoint + torch-porter compatibility)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)
    for a, b in zip(jax.tree.leaves(v1), jax.tree.leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    y1, m1 = flax_bn.apply(v1, x, use_running_average=not train,
                           mutable=["batch_stats"])
    y2, m2 = pallas_bn.apply(v1, x, use_running_average=not train,
                             mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-5, atol=2e-5)
    for a, b in zip(jax.tree.leaves(m1), jax.tree.leaves(m2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_pallas_bn_matches_flax_gradients():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((8, 4, 4, 96)), jnp.float32)

    flax_bn = make_batchnorm(name="bn")
    pallas_bn = make_batchnorm(name="bn", backend="pallas")
    variables = flax_bn.init(jax.random.PRNGKey(0), x, use_running_average=False)
    # non-trivial scale/bias so the dscale and gamma-weighted dx paths are
    # exercised: at the init value scale==1, a backward that DROPS the gamma
    # factor is bit-identical to a correct one and would pass unnoticed
    p_rng = np.random.default_rng(4)
    params = jax.tree.map(
        lambda a: jnp.asarray(p_rng.uniform(0.5, 1.5, a.shape), a.dtype),
        variables["params"],
    )
    assert not any(
        np.allclose(np.asarray(v), 1.0) for v in jax.tree.leaves(params)
    )

    def loss(mod):
        def f(params, x):
            y, _ = mod.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, use_running_average=False, mutable=["batch_stats"],
            )
            return jnp.sum(jnp.sin(y) * y)
        return f

    g1_p, g1_x = jax.grad(loss(flax_bn), argnums=(0, 1))(params, x)
    g2_p, g2_x = jax.grad(loss(pallas_bn), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(g1_x), np.asarray(g2_x), rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(g1_p), jax.tree.leaves(g2_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_bn_backend_full_train_step():
    """BN_BACKEND=pallas end-to-end: one full D+G step runs, metrics finite
    and close to the xla-BN program (identical math, different reduction
    order)."""
    from cpcsv_tpu.models import build_models
    from cpcsv_tpu.train import create_train_state, make_train_steps
    from tests.test_train_steps import make_batches, tiny_cfg

    m = {}
    for backend in ("xla", "pallas"):
        cfg = tiny_cfg(CASCADE_MODEL=True, SEGMENT_LEARNING=True,
                       BN_BACKEND=backend)
        models = build_models(cfg)
        state = create_train_state(cfg, jax.random.PRNGKey(0), models)
        d_step, g_step = make_train_steps(cfg, models)
        rng = np.random.default_rng(0)
        st_batch, im_batch = make_batches(cfg, rng)
        state, dm = d_step(state, jax.random.PRNGKey(1), st_batch, im_batch, 4e-4)
        state, gm = g_step(state, jax.random.PRNGKey(2), st_batch, im_batch, 1e-4)
        m[backend] = {k: float(np.asarray(v)) for k, v in {**dm, **gm}.items()}
    assert m["xla"].keys() == m["pallas"].keys()
    for k in m["xla"]:
        assert np.isfinite(m["pallas"][k]), f"{k} not finite under pallas BN"
        np.testing.assert_allclose(
            m["pallas"][k], m["xla"][k], rtol=5e-3, atol=1e-4,
            err_msg=f"pallas-BN metric {k} != xla-BN",
        )


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="on-device Mosaic check requires TPU")
def test_bn_kernels_on_device_vs_host():
    """Deployment-libtpu numerics vs host numpy (the dfn.py lane-splat
    miscompile precedent makes this non-optional for new kernels)."""
    rng = np.random.default_rng(4)
    for C in (124, 128, 992, 2048):
        M = 3000
        x_np = rng.standard_normal((M, C)).astype(np.float32)
        x = jnp.asarray(x_np, jnp.bfloat16)
        s, q = bn_stats(x)
        xf = np.asarray(x, np.float32)
        np.testing.assert_allclose(np.asarray(s), xf.sum(0), rtol=1e-4, atol=1e-2)
        np.testing.assert_allclose(np.asarray(q), (xf * xf).sum(0), rtol=1e-4, atol=1e-2)
        # backward kernel too — a Mosaic miscompile here would silently
        # corrupt every BN gradient of a BN_BACKEND=pallas run
        dy = jnp.asarray(rng.standard_normal((M, C)).astype(np.float32))
        mean = jnp.asarray(xf.mean(0))
        inv = jnp.asarray(1.0 / (xf.std(0) + 1e-5))
        sdy, sdyx = bn_grad_reduce(x, dy, mean, inv)
        xhat = (xf - np.asarray(mean)) * np.asarray(inv)
        np.testing.assert_allclose(np.asarray(sdy), np.asarray(dy).sum(0),
                                   rtol=1e-4, atol=1e-2)
        np.testing.assert_allclose(np.asarray(sdyx), (np.asarray(dy) * xhat).sum(0),
                                   rtol=1e-4, atol=5e-2)
