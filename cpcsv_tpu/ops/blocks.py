"""Building-block layers, NHWC (TPU-native layout).

Reference equivalents: `conv3x3` / `upBlock` (reference `model.py:16-34`),
`downBlock` (reference `cascade_model.py:36-41`) and the discriminator's
4x4-stride-2 conv (reference `model.py:498-513`). BatchNorm matches torch
defaults (eps=1e-5, running-stat momentum 0.1, UNBIASED running variance —
see TorchBatchNorm) and weight init matches
`weights_init` (reference `miscc/utils.py:191-201`): conv/linear ~ N(0,0.02),
BN scale ~ N(1,0.02), biases 0.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

normal_kernel_init = nn.initializers.normal(stddev=0.02)


def bn_scale_init(rng, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(rng, shape, dtype)


class TorchBatchNorm(nn.BatchNorm):
    """flax nn.BatchNorm with torch's UNBIASED running-variance update.

    torch stores the Bessel-corrected batch variance (x M/(M-1), M = count
    of reduced elements) in running_var while normalizing with the biased
    one (torch/nn/functional.py batch_norm); flax stores the biased
    variance. Negligible for conv BNs (M = N*H*W) but visible on the Dense
    BN heads (M = batch rows: ~1% at the production batch, ~10% in tiny
    tests). The forward compute is flax's own (the body below is flax
    0.12.3's __call__ verbatim except the ra_var line); only the running
    update differs."""

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None, *, mask=None):
        from flax.linen import module as _module
        from flax.linen.normalization import _canonicalize_axes, _normalize

        use_running_average = _module.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feature_axes = _canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(i for i in range(x.ndim) if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]

        stat_dtype = (
            jnp.float32 if self.force_float32_reductions else self.param_dtype
        )
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, stat_dtype), feature_shape
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, stat_dtype), feature_shape
        )

        if use_running_average:
            mean = (
                ra_mean.value
                if self.force_float32_reductions
                else jnp.asarray(ra_mean.value, self.param_dtype)
            )
            var = (
                ra_var.value
                if self.force_float32_reductions
                else jnp.asarray(ra_var.value, self.param_dtype)
            )
        else:
            mean, var = self._stats(x, reduction_axes, mask)
            if not self.is_initializing():
                m = 1
                for ax in reduction_axes:
                    m *= x.shape[ax]
                bessel = m / max(m - 1, 1)  # torch's unbiased running var
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1 - self.momentum) * var * bessel
                )

        return _normalize(
            self,
            x,
            mean,
            var,
            reduction_axes,
            feature_axes,
            self.dtype,
            self.param_dtype,
            self.epsilon,
            self.use_bias,
            self.use_scale,
            self.bias_init,
            self.scale_init,
            self.force_float32_reductions,
        )

    def _stats(self, x, reduction_axes, mask):
        """Train-mode batch statistics; the one override point for backends
        that relower the reductions (MxuBatchNorm) without touching flax's
        normalize/running-update semantics."""
        from flax.linen.normalization import _compute_stats

        return _compute_stats(
            x,
            reduction_axes,
            dtype=self.dtype,
            axis_name=self.axis_name if not self.is_initializing() else None,
            axis_index_groups=self.axis_index_groups,
            use_fast_variance=self.use_fast_variance,
            mask=mask,
            force_float32_reductions=self.force_float32_reductions,
        )


def mxu_moments(x2d):
    """Channel-wise (mean, mean-of-square) of an (M, C) array in fp32, with
    both reductions expressed as `dot_general`s so they tile onto the MXU
    instead of XLA's reduce lowering.

    Hypothesis (round-5 attack on the BN wall): the round-3 device profile
    (PARITY.md "Round-3 MFU push") measured XLA's BN statistic
    `convert_reduce_fusion`s at ~300 GB/s of the v5e's 819 GB/s HBM peak —
    37% of step time — while matmuls stream operands at full bandwidth, so
    a dot contracting the M axis should read x once at matmul bandwidth.

    MEASURED RESULT (readback-verified same-process A/B, bench.py --ab
    BN_BACKEND=mxu, final.yml scale): **0.69x — REJECTED as default**
    (114.45 ms/step vs 79.34; +0.72 TFLOP/step of gram FLOPs). Same failure
    mechanism as the Pallas-BN rejection (PARITY "Measured perf
    experiments"): pulling the stats out of XLA's convert_reduce fusions is
    a fusion BARRIER — x is materialized/re-read for the dots instead of
    the cast+stats+normalize chain running as one pass, and the diagonal
    extraction's backward scatters through a full gram. Kept as a tested
    opt-in: unlike BN_BACKEND='pallas' it is pure XLA (GSPMD-shardable), so
    it remains the only alternative BN lowering legal on multi-device
    meshes.

    Numerics: bf16*bf16 products are EXACT in the MXU's fp32 accumulation
    (8-bit mantissas), so the moments equal the XLA fp32-reduction path up
    to summation order — pinned by tests/test_ops.py.

    Shapes: C % 128 == 0 -> grouped batched matmul (C/128, 128, 128) keeps
    the waste at one MXU tile per group (and bounds the gram to C*128
    elements — the 32768-wide Dense BN head would need a 4 GiB full gram);
    odd C <= 4096 (124/992/1985... every non-multiple in the model zoo) ->
    full C x C gram, XLA pads lanes internally without an HBM copy; odd
    C > 4096 -> zero-pad to the next 128 multiple (materializes a padded
    copy; no current layer hits this).
    """
    M, C = x2d.shape
    # HIGHEST is a no-op for bf16 operands (single MXU pass either way) but
    # keeps fp32 inputs exact instead of silently split into bf16 passes.
    hi = jax.lax.Precision.HIGHEST
    ones = jnp.ones((1, M), x2d.dtype)
    s = jax.lax.dot_general(
        ones, x2d, (((1,), (0,)), ((), ())),
        precision=hi, preferred_element_type=jnp.float32,
    )[0]
    if C % 128 != 0 and C > 4096:
        x2d = jnp.pad(x2d, ((0, 0), (0, (-C) % 128)))
    if x2d.shape[1] % 128 == 0:
        G = x2d.shape[1] // 128
        xg = x2d.reshape(M, G, 128)
        gram = jax.lax.dot_general(
            xg, xg, (((0,), (0,)), ((1,), (1,))),
            precision=hi, preferred_element_type=jnp.float32,
        )  # (G, 128, 128)
        q = jnp.diagonal(gram, axis1=1, axis2=2).reshape(-1)[:C]
    else:
        gram = jax.lax.dot_general(
            x2d, x2d, (((0,), (0,)), ((), ())),
            precision=hi, preferred_element_type=jnp.float32,
        )  # (C, C)
        q = jnp.diagonal(gram)
    return s / M, q / M


class MxuBatchNorm(TorchBatchNorm):
    """TorchBatchNorm with the train-mode statistic reductions lowered as
    MXU matmuls (`mxu_moments`) instead of XLA reduces; normalize, running
    update, and variable layout are inherited unchanged, so checkpoints and
    the torch porter are unaffected. Pure XLA (no Mosaic custom calls), so
    unlike BN_BACKEND='pallas' it partitions under GSPMD and is legal on
    multi-device meshes. Selected via cfg.BN_BACKEND='mxu'. NOTE: measured
    0.69x vs the XLA default at production scale (see mxu_moments) — an
    opt-in for experimentation, not a recommendation."""

    def _stats(self, x, reduction_axes, mask):
        if (
            mask is not None
            or self.axis_name is not None  # cross-device pmean path
            or reduction_axes != tuple(range(x.ndim - 1))
            # mxu_moments is inherently E[x^2]-E[x]^2 (fast variance); the
            # two-pass E[(x-mu)^2] the flag requests must fall back to flax
            or not self.use_fast_variance
        ):
            return super()._stats(x, reduction_axes, mask)
        mean, mean_sq = mxu_moments(x.reshape(-1, x.shape[-1]))
        # flax _compute_stats (use_fast_variance): var = E[x^2] - E[x]^2,
        # clamped at 0 against round-off (normalization.py:_compute_stats)
        return mean, jnp.maximum(0.0, mean_sq - mean * mean)


def make_batchnorm(dtype=None, name: str | None = None, backend: str = "xla"):
    """BatchNorm matching torch defaults. backend:
      "xla"    — flax nn.BatchNorm (default)
      "mxu"    — MxuBatchNorm: flax semantics, statistic reductions lowered
                 as MXU matmuls (see mxu_moments; GSPMD-shardable)
      "pallas" — ops.batchnorm.PallasBatchNorm: identical semantics and
                 variable layout, channel reductions as Pallas kernels
                 (~2.5x faster than XLA's lowering on v5e — see
                 ops/pallas/bn.py; selected via cfg.BN_BACKEND)."""
    if backend not in ("xla", "mxu", "pallas"):
        # loud failure: a typo'd A/B knob silently measuring the default arm
        # is exactly the measurement artifact this repo's history warns about
        raise ValueError(
            f"BN_BACKEND must be 'xla', 'mxu' or 'pallas', got {backend!r}"
        )
    if backend == "mxu":
        return MxuBatchNorm(
            use_running_average=None,
            momentum=0.9,
            epsilon=1e-5,
            dtype=dtype,
            scale_init=bn_scale_init,
            name=name,
        )
    if backend == "pallas":
        from cpcsv_tpu.ops.batchnorm import PallasBatchNorm

        return PallasBatchNorm(
            use_running_average=None,
            momentum=0.9,
            epsilon=1e-5,
            dtype=dtype,
            scale_init=bn_scale_init,
            name=name,
        )
    return TorchBatchNorm(
        use_running_average=None,  # caller passes use_running_average
        momentum=0.9,  # flax: new = m*old + (1-m)*batch  == torch momentum 0.1
        epsilon=1e-5,
        dtype=dtype,
        scale_init=bn_scale_init,
        name=name,
    )


class Conv3x3(nn.Module):
    """3x3 conv, stride 1, SAME padding, no bias (reference conv3x3).

    `fuse_upsample2x` != "off" computes conv3x3(nearest_upsample_2x(x)) as a
    fused op (ops/fused_upsample.py): 2.25x fewer MACs and the 2x-upsampled
    activation never hits HBM. Variants: "parity4" | "parity1" | "deconv"."""

    features: int
    stride: int = 1
    use_bias: bool = False
    dtype: Any = None
    # "off" | "parity4" | "parity1" | "deconv" (ops/fused_upsample.py)
    fuse_upsample2x: str = "off"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", normal_kernel_init, (3, 3, in_features, self.features), jnp.float32
        )
        k = kernel.astype(self.dtype) if self.dtype else kernel
        xc = x.astype(self.dtype) if self.dtype else x
        if self.fuse_upsample2x != "off":
            assert self.stride == 1
            from cpcsv_tpu.ops import fused_upsample as fu

            fn = {
                "parity4": fu.upsample2x_conv3x3,
                "parity1": fu.upsample2x_conv3x3_oneconv,
                "deconv": fu.upsample2x_conv3x3_deconv,
            }[self.fuse_upsample2x]
            y = fn(xc, k)
        else:
            y = jax.lax.conv_general_dilated(
                xc,
                k,
                window_strides=(self.stride, self.stride),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + (bias.astype(self.dtype) if self.dtype else bias)
        return y


class Conv4x4s2(nn.Module):
    """4x4 conv, stride 2, pad 1 (torch Conv2d(k=4,s=2,p=1)) — halves H,W."""

    features: int
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.features,
            (4, 4),
            strides=(2, 2),
            padding=((1, 1), (1, 1)),
            use_bias=self.use_bias,
            kernel_init=normal_kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x)


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x spatial upsample for NHWC.

    Implemented as reshape+broadcast (pure data movement XLA fuses into the
    following conv) rather than a gather-based resize.
    """
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class UpBlock(nn.Module):
    """nearest-2x upsample -> conv3x3 -> BN -> ReLU (reference upBlock),
    computed as one fused parity-decomposed conv (no 2x tensor in HBM)."""

    features: int
    dtype: Any = None
    # "off" | "parity4" | "parity1" | "deconv": cfg.FUSED_UPSAMPLE. All are
    # numerically equivalent to upsample-then-conv (test_fused_upsample.py);
    # pick by measured step time (PARITY.md "Measured perf experiments").
    fused: str = "off"
    bn_backend: str = "xla"  # cfg.BN_BACKEND

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        if self.fused != "off":
            x = Conv3x3(
                self.features, dtype=self.dtype, fuse_upsample2x=self.fused, name="conv"
            )(x)
        else:
            x = nearest_upsample_2x(x)
            x = Conv3x3(self.features, dtype=self.dtype, name="conv")(x)
        x = make_batchnorm(dtype=self.dtype, name="bn", backend=self.bn_backend)(
            x, use_running_average=not train
        )
        return nn.relu(x)


class DownBlock(nn.Module):
    """conv3x3 stride-2 (with bias) -> BN -> ReLU (reference downBlock,
    cascade_model.py:36-41)."""

    features: int
    dtype: Any = None
    bn_backend: str = "xla"  # cfg.BN_BACKEND

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            (3, 3),
            strides=(2, 2),
            padding=((1, 1), (1, 1)),
            use_bias=True,
            kernel_init=normal_kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = make_batchnorm(dtype=self.dtype, name="bn", backend=self.bn_backend)(
            x, use_running_average=not train
        )
        return nn.relu(x)


class DenseBN(nn.Module):
    """Linear -> BatchNorm1d [-> activation] used all over the generator
    (filter_net / image_net / fc / m_net / c_net, reference model.py:250-308)."""

    features: int
    activation: Callable[[jnp.ndarray], jnp.ndarray] | None = None
    use_bias: bool = True
    dtype: Any = None
    bn_backend: str = "xla"  # cfg.BN_BACKEND

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=normal_kernel_init,
            dtype=self.dtype,
            name="dense",
        )(x)
        x = make_batchnorm(dtype=self.dtype, name="bn", backend=self.bn_backend)(
            x, use_running_average=not train
        )
        if self.activation is not None:
            x = self.activation(x)
        return x
