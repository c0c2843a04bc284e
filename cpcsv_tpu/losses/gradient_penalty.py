"""WGAN-GP gradient penalty (reference `fid/helper.py:159-178`
calc_gradient_penalty — present in the reference as an unused, partly broken
utility; provided here as a working jit-native op for training variants).

gp = E_x̂ [ (||∇_x̂ D(x̂)||_2 - 1)^2 ],  x̂ = α·real + (1-α)·fake
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def gradient_penalty(
    critic: Callable[[jnp.ndarray], jnp.ndarray],
    real: jnp.ndarray,
    fake: jnp.ndarray,
    rng: jax.Array,
) -> jnp.ndarray:
    """critic: images (N, ...) -> scores (N,). Returns the scalar penalty."""
    alpha_shape = (real.shape[0],) + (1,) * (real.ndim - 1)
    alpha = jax.random.uniform(rng, alpha_shape, real.dtype)
    interp = alpha * real + (1.0 - alpha) * fake

    def per_sample_score_sum(x):
        return critic(x).sum()

    grads = jax.grad(per_sample_score_sum)(interp)
    norms = jnp.sqrt(jnp.sum(jnp.square(grads.reshape(real.shape[0], -1)), axis=1) + 1e-12)
    return jnp.mean(jnp.square(norms - 1.0))
