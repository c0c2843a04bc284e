"""Pallas TPU kernel for the dynamic-filter 1-D convolution.

The reference runs this op as a Python loop of B tiny cuDNN conv1d calls
(reference `layers.py:74-76` — 60-90 serialized kernel launches per train
step). The XLA path (`ops/dynamic_filter.py`) is already one batched einsum;
this Pallas kernel additionally fuses the tap-unfold with the contraction so
the (B, C, L, K) tap tensor never exists in memory: everything stays in
VMEM, K shifted fused-multiply-adds on the VPU.

Layout: image arrives pre-padded (B, C, L+2*pad); filters (B, C, K);
output (B, L). Batch is tiled over the grid. All shapes are static.

STATUS — opt-in (CPCSV_USE_PALLAS=1): on the current deployment libtpu
(v5e, remote Mosaic compile), the scalar-extract-and-splat pattern
`f_ref[:, :, k:k+1]` broadcast against a shifted slice miscompiles for
lane offsets >= ~8 (verified against host numpy 2026-08-16: single-tap
k=3 exact, k=12/20 wrong; three structurally different kernel variants
produce identical wrong sums while the XLA einsum matches numpy exactly).
Interpret mode (tests) is correct. The XLA einsum path is the production
default — at (B=90, C=3, K=21, L=124) this op is ~1.4 MFLOP/step and is
fully fused by XLA, so the kernel is kept for documentation/future libtpu
versions, not perf.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dfn_kernel(img_ref, filt_ref, out_ref, *, L: int, K: int):
    # img_ref: (TB, C, L + K - 1), filt_ref: (TB, C, K), out_ref: (TB, L)
    # NB: slice the REFS per tap (unaligned lane slices of loaded values
    # miscompile on some Mosaic versions; ref slices lower correctly).
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for k in range(K):  # K static taps, fused multiply-add on the VPU
        acc = acc + jnp.sum(
            img_ref[:, :, k : k + L].astype(jnp.float32)
            * filt_ref[:, :, k : k + 1].astype(jnp.float32),
            axis=1,
        )
    out_ref[:] = acc.astype(out_ref.dtype)


def _choose_tile(b: int) -> tuple[int, int]:
    """(TB, Bp) batch tiling: TB is a power of two >= 8 (output-block sublane
    divisibility) chosen so the grid ceil(b/TB) stays <= 1024 programs; Bp
    pads the batch up to a TB multiple (sliced off after the kernel).
    Deriving TB from b BEFORE padding always terminates — an earlier version
    derived it from the already-8-padded batch and looped forever whenever
    that quotient was odd and > 1024 (e.g. b=8200)."""
    tb = 8
    while -(-b // tb) > 1024:
        tb *= 2
    return tb, -(-b // tb) * tb


@functools.partial(jax.jit, static_argnames=("pad", "interpret"))
def dfn_pallas(
    image: jnp.ndarray, filters: jnp.ndarray, pad: int, interpret: bool = False
) -> jnp.ndarray:
    """image: (B, C, L); filters: (B, O=1, C, K) -> (B, 1, L_out).

    Matches `dynamic_filter_conv1d` semantics for O=1 (the only case the
    model uses: out_num=1, reference model.py:230).
    """
    B, C, L = image.shape
    _, O, _, K = filters.shape
    assert O == 1, "pallas DFN kernel supports out_num=1"
    L_out = L + 2 * pad - K + 1
    TB, Bp = _choose_tile(B)
    padded = jnp.pad(image, ((0, Bp - B), (0, 0), (pad, pad)))
    filt = jnp.pad(filters[:, 0], ((0, Bp - B), (0, 0), (0, 0)))  # (Bp, C, K)
    grid = (Bp // TB,)

    out = pl.pallas_call(
        functools.partial(_dfn_kernel, L=L_out, K=K),
        out_shape=jax.ShapeDtypeStruct((Bp, L_out), image.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (TB, C, L + 2 * pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((TB, C, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, L_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(padded, filt)
    return out[:B, None, :]
