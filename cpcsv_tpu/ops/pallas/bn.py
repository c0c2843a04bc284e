"""Pallas TPU kernels for BatchNorm channel reductions.

Motivation (round-3 profile, PARITY.md): 37% of production train-step device
time is `convert_reduce_fusion`s — BN statistic and gradient reductions over
(N,H,W) keeping C — which XLA lowers at only ~300-480 GB/s on v5e (measured
in isolation, /tmp probe 2026-08-17). The same streaming reduction written as
a Pallas grid accumulation runs at ~800 GB/s (HBM peak is 819), a ~2.5x
speedup on the pattern that dominates the BN-heavy GAN step.

Two kernels, both reducing rows of a (M, C) view and keeping C:
  * bn_stats:       sum(x), sum(x^2)          (forward batch statistics)
  * bn_grad_reduce: sum(dy), sum(dy * xhat)   (backward reductions)

Rows are zero-padded up to the block size; zero rows contribute zero to
every accumulated sum (for grad_reduce the padded dy rows are zero, which
nulls the nonzero xhat of padded x rows), so results are exact for any M.
Accumulation is fp32 in VMEM across sequential grid steps (the output block
maps to the same (0,0) tile every step — the canonical TPU reduce pattern).

Mosaic-hazard note (CLAUDE.md): the remote-compile miscompile seen in
ops/pallas/dfn.py involves lane-offset extract-and-splat slicing; these
kernels use only full-block loads + axis-0 reductions, a pattern verified
numerically ON DEVICE in tests/test_pallas_bn.py (gated to TPU) in addition
to interpret-mode tests on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_rows(C: int, nbytes: int, budget: int = 1 << 20) -> int:
    """Rows per block: ~1MB of input per array, multiple of 8, >= 8."""
    rows = budget // max(C * nbytes, 1)
    rows = max(8, (rows // 8) * 8)
    return min(rows, 8192)


def _pad_rows(x2d: jnp.ndarray, block: int) -> jnp.ndarray:
    M = x2d.shape[0]
    pad = (-M) % block
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    return x2d


def _stats_kernel(x_ref, sum_ref, sq_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        sum_ref[...] = jnp.zeros_like(sum_ref)
        sq_ref[...] = jnp.zeros_like(sq_ref)

    xf = x_ref[...].astype(jnp.float32)
    sum_ref[...] += jnp.sum(xf, axis=0, keepdims=True)
    sq_ref[...] += jnp.sum(xf * xf, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bn_stats(x2d: jnp.ndarray, interpret: bool = False):
    """(M, C) -> (sum f32[C], sumsq f32[C]); fp32 accumulation."""
    M, C = x2d.shape
    block = _block_rows(C, x2d.dtype.itemsize)
    xp = _pad_rows(x2d, block)
    grid = (xp.shape[0] // block,)
    s, q = pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        interpret=interpret,
    )(xp)
    return s[0], q[0]


def _grad_kernel(x_ref, dy_ref, mean_ref, inv_ref, sdy_ref, sdyx_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        sdy_ref[...] = jnp.zeros_like(sdy_ref)
        sdyx_ref[...] = jnp.zeros_like(sdyx_ref)

    dy = dy_ref[...].astype(jnp.float32)
    xhat = (x_ref[...].astype(jnp.float32) - mean_ref[...]) * inv_ref[...]
    sdy_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    sdyx_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bn_grad_reduce(
    x2d: jnp.ndarray,
    dy2d: jnp.ndarray,
    mean: jnp.ndarray,
    invstd: jnp.ndarray,
    interpret: bool = False,
):
    """(M,C) x,dy + f32[C] mean,invstd -> (sum_dy, sum_dy_xhat) f32[C]."""
    M, C = x2d.shape
    block = _block_rows(C, max(x2d.dtype.itemsize, dy2d.dtype.itemsize),
                        budget=1 << 19)
    xp = _pad_rows(x2d, block)
    dyp = _pad_rows(dy2d, block)
    grid = (xp.shape[0] // block,)
    mean2d = mean.reshape(1, C).astype(jnp.float32)
    inv2d = invstd.reshape(1, C).astype(jnp.float32)
    sdy, sdyx = pl.pallas_call(
        _grad_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        interpret=interpret,
    )(xp, dyp, mean2d, inv2d)
    return sdy[0], sdyx[0]
