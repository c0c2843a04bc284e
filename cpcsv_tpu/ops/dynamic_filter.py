"""Batched dynamic-filter 1-D convolution ("Text2Gist" fusion op).

The reference computes, per sample i:
    out[i] = conv1d(image[i] (3,124), filters[i] (1,3,21), pad=10)
in a **Python loop over the batch** (reference `layers.py:62-80`,
60-90 serialized tiny convs per step — its hottest serialization bug).

Here it is one dense contraction: unfold the (padded) length axis into 21
taps and contract channels+taps against the per-sample filter bank with a
single einsum, which XLA maps onto the MXU as a batched matmul. A Pallas
fusion exists in `cpcsv_tpu.ops.pallas.dfn` for the TPU backend.

Semantics (cross-correlation, like torch F.conv1d):
    out[b, o, x] = sum_{c,k} pad(image)[b, c, x + k] * filters[b, o, c, k]
"""

from __future__ import annotations

import jax.numpy as jnp


def pallas_dfn_active(cfg_flag: bool | None) -> bool:
    """Would `dynamic_filter_conv1d` dispatch the Mosaic kernel in this
    process? cfg.USE_PALLAS, overridden by env CPCSV_USE_PALLAS=0/1 when
    set; the kernel only engages on the TPU backend. Mosaic custom calls
    carry no GSPMD partitioning rule, so multi-device callers consult this
    BEFORE jitting a batch-sharded forward: the trainer fails loudly
    (trainer.py, same rationale as the BN_BACKEND='pallas' guard) and eval
    falls back to an unsharded walk (parallel/mesh.make_eval_mesh)."""
    import os

    import jax

    env = os.environ.get("CPCSV_USE_PALLAS")
    flag = (env == "1") if env is not None else bool(cfg_flag)
    return flag and jax.default_backend() == "tpu"


def dynamic_filter_conv1d(
    image: jnp.ndarray, filters: jnp.ndarray, pad: int, use_pallas: bool | None = None
) -> jnp.ndarray:
    """image: (B, C, L); filters: (B, O, C, K); returns (B, O, L_out).

    L_out = L + 2*pad - K + 1 (with the reference's K=21, pad=10: L_out = L).

    Gate: `use_pallas` comes from cfg.USE_PALLAS (threaded through
    StoryGenerator); the env var CPCSV_USE_PALLAS=0/1, when SET, is an
    explicit override. The Pallas path only engages on the TPU backend with
    O=1 (the model's only case).
    """
    B, C, L = image.shape
    _, O, Cf, K = filters.shape
    assert Cf == C, (Cf, C)
    if pallas_dfn_active(use_pallas) and O == 1:
        from cpcsv_tpu.ops.pallas.dfn import dfn_pallas

        return dfn_pallas(image, filters, pad)
    padded = jnp.pad(image, ((0, 0), (0, 0), (pad, pad)))
    L_out = L + 2 * pad - K + 1
    # unfold: taps[b, c, x, k] = padded[b, c, x + k]  (K static slices, no gather)
    taps = jnp.stack([padded[:, :, k : k + L_out] for k in range(K)], axis=-1)
    return jnp.einsum(
        "bcxk,bock->box", taps, filters, preferred_element_type=image.dtype
    )
