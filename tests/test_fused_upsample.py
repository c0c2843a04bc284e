"""Fused upsample+conv variants == naive upsample-then-conv (values + grads).

Three equivalent formulations of conv3x3(nearest_upsample_2x(x)) live in
ops/fused_upsample.py; all must match the naive composition bit-closely in
fp32 (they only reorder the reduction):
  * parity4 — four 2x2 parity convs + interleave (round-1 version)
  * parity1 — ONE 2x2 conv with 4*Cout output channels + slice/interleave
  * deconv  — one lhs_dilation=2 conv with the composite 4x4 kernel
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpcsv_tpu.ops.blocks import nearest_upsample_2x
from cpcsv_tpu.ops.fused_upsample import (
    upsample2x_conv3x3,
    upsample2x_conv3x3_deconv,
    upsample2x_conv3x3_oneconv,
)

VARIANTS = {
    "parity4": upsample2x_conv3x3,
    "parity1": upsample2x_conv3x3_oneconv,
    "deconv": upsample2x_conv3x3_deconv,
}


def _naive(x, w):
    up = nearest_upsample_2x(x)
    return jax.lax.conv_general_dilated(
        up, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_fused_matches_naive(name):
    fn = VARIANTS[name]
    rng = np.random.default_rng(0)
    for H, W, Cin, Cout in ((4, 4, 8, 16), (7, 5, 3, 5), (16, 16, 32, 8)):
        x = jnp.asarray(rng.standard_normal((2, H, W, Cin)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)).astype(np.float32))
        with jax.default_matmul_precision("highest"):
            fused = fn(x, w)
            naive = _naive(x, w)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(naive), rtol=2e-4, atol=2e-4
        )


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_fused_gradients_match(name):
    fn = VARIANTS[name]
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 6)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 4)).astype(np.float32))

    with jax.default_matmul_precision("highest"):
        g_fused = jax.grad(lambda w: fn(x, w).sum())(w)
        g_naive = jax.grad(lambda w: _naive(x, w).sum())(w)
        gx_fused = jax.grad(lambda x: fn(x, w).sum())(x)
        gx_naive = jax.grad(lambda x: _naive(x, w).sum())(x)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_naive), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(gx_fused), np.asarray(gx_naive), rtol=2e-4, atol=2e-4
    )
