"""Fused nearest-2x-upsample + conv3x3 via parity decomposition.

The generator's dominant FLOPs are four `upBlock`s per trunk
(nearest-upsample then conv3x3, reference `model.py:26-34`). Computing the
conv on the upsampled grid costs 4HW·9·Cin·Cout MACs and materializes the
2x tensor in HBM. But a 3x3 conv of a nearest-2x-upsampled image only ever
sees <= 2 distinct source rows and <= 2 distinct source columns per output
pixel, so each output PARITY class (y%2, x%2) is an effective 2x2 conv on
the ORIGINAL grid with weights that are sums of the 3x3 taps:

  out[2h+py, 2w+px] = sum_{r,s in {0,1}} K(py,px)[r,s] · x[h+r-1+py', w+s-1+px']

FLOPs: 4HW·4·Cin·Cout — a 2.25x reduction — and the upsampled activation is
never written to HBM. Pure XLA (conv_general_dilated x4 + interleave), fully
differentiable.

MEASURED on v5e (2026-08-16, full cascade train step, bf16): 22.1k frames/s
fused vs 35.9k frames/s naive — the four half-size convs + the interleave
transpose UNDER-utilize the MXU relative to one large conv whose upsampled
input XLA streams efficiently. Conclusion: FLOP count lost to MXU tiling;
kept as an option (`UpBlock(fused=True)`) and a documented experiment, not
the default.

Derivation (rows; cols symmetric). y = 2h+py, source row of tap dy is
(y+dy)//2:
  py=0: dy=-1 -> h-1, dy=0 -> h, dy=+1 -> h   => rows [h-1, h],
        row-kernel [W(-1), W(0)+W(+1)]
  py=1: dy=-1 -> h,   dy=0 -> h, dy=+1 -> h+1 => rows [h, h+1],
        row-kernel [W(-1)+W(0), W(+1)]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _parity_kernels(w: jnp.ndarray):
    """w: (3, 3, Cin, Cout) -> dict[(py,px)] = (2,2,Cin,Cout)."""
    # row combinations: parity 0 -> [w0, w1+w2]; parity 1 -> [w0+w1, w2]
    r0 = jnp.stack([w[0], w[1] + w[2]], axis=0)  # (2, 3, Cin, Cout)
    r1 = jnp.stack([w[0] + w[1], w[2]], axis=0)
    out = {}
    for py, r in ((0, r0), (1, r1)):
        c0 = jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], axis=1)  # (2,2,Cin,Cout)
        c1 = jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], axis=1)
        out[(py, 0)] = c0
        out[(py, 1)] = c1
    return out


def upsample2x_conv3x3(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """x: (N, H, W, Cin), w: (3, 3, Cin, Cout) -> (N, 2H, 2W, Cout).

    Numerically identical (mod reduction order) to
    conv3x3(nearest_upsample_2x(x), w) with SAME padding.
    """
    N, H, W_, Cin = x.shape
    Cout = w.shape[-1]
    ks = _parity_kernels(w)
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(k, pad_h, pad_w):
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding=(pad_h, pad_w), dimension_numbers=dn
        )

    # parity 0 needs the PREVIOUS source row/col -> pad 1 before, 0 after
    outs = {
        (0, 0): conv(ks[(0, 0)], (1, 0), (1, 0)),
        (0, 1): conv(ks[(0, 1)], (1, 0), (0, 1)),
        (1, 0): conv(ks[(1, 0)], (0, 1), (1, 0)),
        (1, 1): conv(ks[(1, 1)], (0, 1), (0, 1)),
    }
    # interleave parities: (N, H, 2, W, 2, Cout) -> (N, 2H, 2W, Cout)
    row0 = jnp.stack([outs[(0, 0)], outs[(0, 1)]], axis=3)  # (N,H,W,2,C)
    row1 = jnp.stack([outs[(1, 0)], outs[(1, 1)]], axis=3)
    stacked = jnp.stack([row0, row1], axis=2)  # (N,H,2,W,2,C)
    return stacked.reshape(N, 2 * H, 2 * W_, Cout)
