"""Fused upsample+conv parity decomposition == naive upsample-then-conv."""

import jax
import jax.numpy as jnp
import numpy as np

from cpcsv_tpu.ops.blocks import nearest_upsample_2x
from cpcsv_tpu.ops.fused_upsample import upsample2x_conv3x3


def _naive(x, w):
    up = nearest_upsample_2x(x)
    return jax.lax.conv_general_dilated(
        up, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def test_fused_matches_naive():
    rng = np.random.default_rng(0)
    for H, Cin, Cout in ((4, 8, 16), (7, 3, 5), (16, 32, 8)):
        x = jnp.asarray(rng.standard_normal((2, H, H, Cin)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)).astype(np.float32))
        with jax.default_matmul_precision("highest"):
            fused = upsample2x_conv3x3(x, w)
            naive = _naive(x, w)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(naive), rtol=2e-4, atol=2e-4
        )


def test_fused_gradients_match():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 6)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 4)).astype(np.float32))

    with jax.default_matmul_precision("highest"):
        g_fused = jax.grad(lambda w: upsample2x_conv3x3(x, w).sum())(w)
        g_naive = jax.grad(lambda w: _naive(x, w).sum())(w)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_naive), rtol=2e-4, atol=2e-4
    )
