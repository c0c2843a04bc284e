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
        from flax.linen.normalization import (
            _canonicalize_axes,
            _compute_stats,
            _normalize,
        )

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
            mean, var = _compute_stats(
                x,
                reduction_axes,
                dtype=self.dtype,
                axis_name=self.axis_name if not self.is_initializing() else None,
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance,
                mask=mask,
                force_float32_reductions=self.force_float32_reductions,
            )
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


def make_batchnorm(dtype=None, name: str | None = None, backend: str = "xla"):
    """BatchNorm matching torch defaults. backend:
      "xla"    — flax nn.BatchNorm (default)
      "pallas" — ops.batchnorm.PallasBatchNorm: identical semantics and
                 variable layout, channel reductions as Pallas kernels
                 (~2.5x faster than XLA's lowering on v5e — see
                 ops/pallas/bn.py; selected via cfg.BN_BACKEND)."""
    if backend not in ("xla", "pallas"):
        # loud failure: a typo'd A/B knob silently measuring the default arm
        # is exactly the measurement artifact this repo's history warns about
        raise ValueError(f"BN_BACKEND must be 'xla' or 'pallas', got {backend!r}")
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
