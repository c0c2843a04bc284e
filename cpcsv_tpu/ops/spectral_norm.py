"""Spectral normalization with explicit power-iteration state.

The reference wraps torch layers in `torch.nn.utils.spectral_norm`
(reference `model.py:19,79,502-510` etc.). Here SN is a first-class Flax
module: the left singular vector `u` lives in the mutable ``"spectral"``
variable collection and one power iteration runs per training forward
(`sn_update=True`), all inside jit — no Python-side mutation.

Math (matching torch semantics, eps=1e-12):
    W_mat = reshape(W, (out, -1))
    v = normalize(W_matᵀ u); u' = normalize(W_mat v); σ = u'ᵀ W_mat v
    W_sn = W / σ
Gradient semantics match torch exactly: u and v are constants (buffers,
computed under stop_gradient), but σ = uᵀWv is computed from the LIVE W —
torch does NOT detach the weight there (torch/nn/utils/spectral_norm.py
compute_weight), so d(W/σ)/dW carries the -(W/σ²)·u vᵀ term. An earlier
version stopped the gradient through σ too; that dropped ~10% of the
gradient (pinned against real torch in tests/test_ops.py).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

_EPS = 1e-12


def _l2_normalize(x: jnp.ndarray) -> jnp.ndarray:
    return x / (jnp.linalg.norm(x) + _EPS)


def spectral_normalize(
    w_mat: jnp.ndarray, u: jnp.ndarray, update: bool
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One power-iteration step. Returns (sigma, new_u).

    w_mat: (out, rest) matrix view of the weight. The power iteration runs
    on the stopped weight (u, v are buffers), but sigma is uᵀWv with the
    LIVE W — torch semantics; see the module docstring.
    """
    w_ng = jax.lax.stop_gradient(w_mat)
    v = _l2_normalize(w_ng.T @ u)
    if update:
        # torch order: v from the OLD u, then u updated, sigma = u' W v with
        # that SAME v (exactly one power iteration per forward).
        u = _l2_normalize(w_ng @ v)
    sigma = u @ (w_mat @ v)
    return sigma, u


class SNDense(nn.Module):
    """Dense layer with spectral normalization."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None
    kernel_init: nn.initializers.Initializer = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x: jnp.ndarray, sn_update: bool = False) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (in_features, self.features), jnp.float32
        )
        u = self.variable(
            "spectral",
            "u",
            lambda rng: _l2_normalize(jax.random.normal(rng, (self.features,))),
            self.make_rng("params") if self.is_initializing() else None,
        )
        # torch flattens (out, in); our kernel is (in, out) -> transpose.
        sigma, new_u = spectral_normalize(kernel.T, u.value, sn_update)
        if sn_update and not self.is_initializing():
            u.value = new_u
        kernel_sn = kernel / sigma
        y = jnp.dot(x.astype(self.dtype), kernel_sn.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class SNConv(nn.Module):
    """2D/3D convolution (NHWC / NDHWC) with spectral normalization."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | int = 1
    padding: str | Sequence[tuple[int, int]] = "SAME"
    use_bias: bool = False
    dtype: jnp.dtype | None = None
    kernel_init: nn.initializers.Initializer = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x: jnp.ndarray, sn_update: bool = False) -> jnp.ndarray:
        ksize = tuple(self.kernel_size)
        in_features = x.shape[-1]
        kernel_shape = ksize + (in_features, self.features)
        kernel = self.param("kernel", self.kernel_init, kernel_shape, jnp.float32)
        u = self.variable(
            "spectral",
            "u",
            lambda rng: _l2_normalize(jax.random.normal(rng, (self.features,))),
            self.make_rng("params") if self.is_initializing() else None,
        )
        w_mat = kernel.reshape(-1, self.features).T  # (out, rest)
        sigma, new_u = spectral_normalize(w_mat, u.value, sn_update)
        if sn_update and not self.is_initializing():
            u.value = new_u
        kernel_sn = (kernel / sigma).astype(self.dtype)

        strides = self.strides
        if isinstance(strides, int):
            strides = (strides,) * len(ksize)
        dn = nn.linear._conv_dimension_numbers(x.shape)  # NHWC-style numbers
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel_sn,
            window_strides=strides,
            padding=self.padding,
            dimension_numbers=dn,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y
