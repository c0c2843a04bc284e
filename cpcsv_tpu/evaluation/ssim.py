"""SSIM in JAX (reference `ssim_score.py` + the pytorch-ssim package it
imports): 11x11 Gaussian window (sigma 1.5), per-channel, C1=(0.01)^2,
C2=(0.03)^2, mean-reduced. Jitted; runs on TPU."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("window_size",))
def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """img1, img2: (N, H, W, C) in any consistent range (pytorch-ssim uses
    the raw values; the reference feeds [-1,1] generator output)."""
    C = img1.shape[-1]
    w = jnp.asarray(_gaussian_window(window_size))
    kernel = jnp.tile(w[:, :, None, None], (1, 1, 1, C))  # HWIO, depthwise

    def filt(x):
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding=[(window_size // 2, window_size // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = filt(img1 * img1) - mu1_sq
    sigma2_sq = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu1_mu2

    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return ssim_map.mean()


def ssim_score(pairs_iter) -> float:
    """Mean SSIM over (fake, real) image pairs (reference ssim_score.py:13-28).
    `pairs_iter` yields (fake (N,H,W,C), real (N,H,W,C)) numpy arrays."""
    vals, n = 0.0, 0
    for fake, real in pairs_iter:
        vals += float(ssim(jnp.asarray(fake), jnp.asarray(real))) * len(fake)
        n += len(fake)
    return vals / max(n, 1)
