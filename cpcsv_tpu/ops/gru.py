"""GRU cell with torch gate layout + static traced unroll.

The reference unrolls two `nn.GRUCell`s in EAGER Python loops over the 5
frames (reference `model.py:321-346`). Here the cell uses torch's gate math
and parameter layout (so reference checkpoints can be ported 1:1) and the
temporal unroll is a STATIC loop inside one jit trace (see gru_scan's
docstring for why that beats lax.scan at T=5) — XLA fuses the whole unroll.

torch GRUCell math:
    r = sigmoid(x W_irᵀ + b_ir + h W_hrᵀ + b_hr)
    z = sigmoid(x W_izᵀ + b_iz + h W_hzᵀ + b_hz)
    n = tanh(x W_inᵀ + b_in + r * (h W_hnᵀ + b_hn))
    h' = (1 - z) * n + z * h
Gate order in the stacked weights: [r; z; n].
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _torch_gru_init(hidden_size: int):
    """torch nn.GRUCell default init: U(-1/sqrt(H), 1/sqrt(H)) for every
    weight AND bias. The reference never applies weights_init to GRU cells
    (miscc/utils.py:191-201 only touches Conv/BN/Linear), so fresh-training
    parity requires the torch default here."""
    bound = 1.0 / (hidden_size ** 0.5)

    def init(rng, shape, dtype=jnp.float32):
        return jax.random.uniform(rng, shape, dtype, -bound, bound)

    return init


class GRUCell(nn.Module):
    """Single GRU step: (x: (B, I), h: (B, H)) -> h': (B, H)."""

    hidden_size: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        H = self.hidden_size
        init = _torch_gru_init(H)
        # stacked (in, 3H) / (H, 3H) kernels, gate order [r|z|n]
        w_ih = self.param("w_ih", init, (x.shape[-1], 3 * H), jnp.float32)
        w_hh = self.param("w_hh", init, (H, 3 * H), jnp.float32)
        b_ih = self.param("b_ih", init, (3 * H,), jnp.float32)
        b_hh = self.param("b_hh", init, (3 * H,), jnp.float32)

        xg = jnp.dot(x.astype(self.dtype), w_ih.astype(self.dtype)) + b_ih.astype(
            self.dtype if self.dtype else jnp.float32
        )
        hg = jnp.dot(h.astype(self.dtype), w_hh.astype(self.dtype)) + b_hh.astype(
            self.dtype if self.dtype else jnp.float32
        )
        xr, xz, xn = jnp.split(xg, 3, axis=-1)
        hr, hz, hn = jnp.split(hg, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1.0 - z) * n + z * h


def gru_scan(cell: GRUCell, h0: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Unroll `cell` over the time axis of xs: (B, T, I) -> hs: (B, T, H).

    T is a compile-time constant (VIDEO_LEN, 4 or 5), so a static unroll is
    the fastest lowering: XLA sees T identical matmul steps and pipelines
    them; no scan-carry overhead, and flax param creation works on the first
    step. (The reference does a Python loop per frame too, model.py:321-346,
    but per-call in eager mode; here it is traced once.)
    """
    hs = []
    h = h0
    for t in range(xs.shape[1]):
        h = cell(xs[:, t, :], h)
        hs.append(h)
    return jnp.stack(hs, axis=1)
