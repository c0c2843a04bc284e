"""Pallas-backed BatchNorm (drop-in for flax `nn.BatchNorm` as produced by
`ops.blocks.make_batchnorm`).

Why: the round-3 device profile showed 37% of train-step time in BN
statistic/gradient `convert_reduce_fusion`s that XLA lowers at ~300-480 GB/s;
the Pallas reductions in ops/pallas/bn.py run the same pattern at ~800 GB/s
(see that module's docstring). This module keeps flax BatchNorm's EXACT
semantics and variable layout:

  * params  'scale'/'bias' (fp32), batch_stats 'mean'/'var' (fp32) — same
    names/shapes, so checkpoints and the torch weight porter are unaffected;
  * train stats: mean = E[x_f32], var = max(0, E[x^2] - E[x]^2) (flax
    use_fast_variance), normalize in fp32, cast to `dtype` at the end.
    NOTE on bf16: flax normalizes IN `dtype` (bf16 arithmetic) while this
    module normalizes in fp32 and casts only the output — at
    COMPUTE_DTYPE=bfloat16 the two arms differ by bf16 rounding of the
    normalize arithmetic (this arm is the more accurate one);
  * running update: ra = momentum * ra + (1-momentum) * batch, with torch's
    UNBIASED variance (x M/(M-1); see blocks.TorchBatchNorm), skipped while
    initializing;
  * backward: the standard train-mode BN VJP (gradients flow through the
    batch statistics), with the two channel reductions (sum dy, sum dy*xhat)
    in Pallas. The returned (mean, var) carry no gradient — they only feed
    the (non-differentiated) running-stat update.

On non-TPU backends the kernels run in interpret mode (tests); production
selection is cfg.BN_BACKEND ("xla" keeps flax, "pallas" uses this module).
Single-device only: Mosaic custom calls carry no GSPMD partitioning rule,
so a sharded batch would be replicated (or fail to partition) at every BN —
the trainer rejects BN_BACKEND='pallas' when mesh.size > 1.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from cpcsv_tpu.ops.pallas.bn import bn_grad_reduce, bn_stats


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bn_train_core(x2d, scale, bias, eps: float, interpret: bool):
    """(M,C) train-mode BN in fp32: returns (y_f32, mean, var)."""
    (y, mean, var), _ = _bn_fwd(x2d, scale, bias, eps, interpret)
    return y, mean, var


def _bn_fwd(x2d, scale, bias, eps: float, interpret: bool):
    M = x2d.shape[0]
    s, q = bn_stats(x2d, interpret=interpret)
    mean = s / M
    var = jnp.maximum(0.0, q / M - mean * mean)
    inv = jax.lax.rsqrt(var + eps)
    y = (x2d.astype(jnp.float32) - mean) * (inv * scale.astype(jnp.float32))
    y = y + bias.astype(jnp.float32)
    return (y, mean, var), (x2d, scale, mean, inv)


def _bn_bwd(eps: float, interpret: bool, res, cts):
    dy, _dmean_ct, _dvar_ct = cts  # mean/var feed only the running-stat
    # update, which flax never differentiates — their cotangents are zero
    x2d, scale, mean, inv = res
    M = x2d.shape[0]
    sdy, sdyx = bn_grad_reduce(x2d, dy, mean, inv, interpret=interpret)
    dyf = dy.astype(jnp.float32)
    xhat = (x2d.astype(jnp.float32) - mean) * inv
    dx = (scale.astype(jnp.float32) * inv) * (
        dyf - sdy / M - xhat * (sdyx / M)
    )
    return dx.astype(x2d.dtype), sdyx.astype(scale.dtype), sdy.astype(scale.dtype)


bn_train_core.defvjp(_bn_fwd, _bn_bwd)


class PallasBatchNorm(nn.Module):
    """flax-semantics BatchNorm over the last axis with Pallas reductions.

    Interface-compatible with `nn.BatchNorm(use_running_average=None, ...)`
    as used throughout this repo (call with `use_running_average=` kwarg)."""

    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    scale_init: Any = nn.initializers.ones
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        C = x.shape[-1]
        scale = self.param("scale", self.scale_init, (C,), jnp.float32)
        bias = self.param("bias", self.bias_init, (C,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (C,), jnp.float32
        )
        ra_var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (C,), jnp.float32
        )

        out_dtype = self.dtype or jnp.promote_types(x.dtype, jnp.float32)

        if ura:
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon)
            y = (x.astype(jnp.float32) - ra_mean.value) * (
                inv * scale.astype(jnp.float32)
            ) + bias.astype(jnp.float32)
            return y.astype(out_dtype)

        interpret = jax.default_backend() != "tpu"
        x2d = x.reshape(-1, C)
        y2d, mean, var = bn_train_core(
            x2d, scale, bias, self.epsilon, interpret
        )
        if not self.is_initializing():
            m = self.momentum
            n = x2d.shape[0]
            bessel = n / max(n - 1, 1)  # torch's unbiased running variance
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var * bessel
        return y2d.reshape(x.shape).astype(out_dtype)
