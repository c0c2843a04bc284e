"""Pallas kernels vs their XLA references (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from cpcsv_tpu.ops.dynamic_filter import dynamic_filter_conv1d
from cpcsv_tpu.ops.pallas.dfn import dfn_pallas


def test_dfn_pallas_matches_einsum():
    rng = np.random.default_rng(0)
    B, C, L, K = 12, 3, 124, 21
    image = jnp.asarray(rng.standard_normal((B, C, L)).astype(np.float32))
    filters = jnp.asarray(rng.standard_normal((B, 1, C, K)).astype(np.float32))
    ref = dynamic_filter_conv1d(image, filters, pad=K // 2, use_pallas=False)
    out = dfn_pallas(image, filters, pad=K // 2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_dfn_pallas_odd_batch():
    rng = np.random.default_rng(1)
    B, C, L, K = 5, 3, 60, 7
    image = jnp.asarray(rng.standard_normal((B, C, L)).astype(np.float32))
    filters = jnp.asarray(rng.standard_normal((B, 1, C, K)).astype(np.float32))
    ref = dynamic_filter_conv1d(image, filters, pad=K // 2, use_pallas=False)
    out = dfn_pallas(image, filters, pad=K // 2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
