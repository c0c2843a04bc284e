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
never written to HBM. Three formulations below, all pure XLA and fully
differentiable; they differ only in how the work is presented to the MXU.

MEASURED on v5e (2026-08-16, full cascade D+G train step at final.yml scale,
bf16, READBACK-VERIFIED timing — round-1's numbers for this file were async
artifacts and are void):

  naive upsample-then-conv   107.7 ms/step   1,672 frames/s   (12.66 TFLOP)
  parity4 (4 convs)          102.9 ms        1,749            ( 7.37 TFLOP)
  parity1 (1 conv, 4Cout)    114.1 ms        1,577            ( 7.87 TFLOP)
  deconv  (lhs_dilation=2)    84.3 ms        2,136  <- production default

Conclusion: the 2.25x MAC cut only pays when it reaches the MXU as ONE
dense convolution — XLA lowers the input-dilated conv natively, while the
sliced/stacked parity variants lose more to data movement + small-conv
tiling than they save in MACs. `cfg.FUSED_UPSAMPLE` selects ("deconv"
default, "off" for bit-exact naive-order reduction).

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


def upsample2x_conv3x3_oneconv(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Single-conv variant ("parity1"): the same 2.25x MAC reduction, but as
    ONE conv the MXU tiles well instead of four small ones.

    All four parity classes share the SAME padded input window grid: with x
    padded by 1 on every side, parity (py, px)'s 2x2-conv output is the
    [py:py+H, px:px+W] slice of a VALID 2x2 conv over the padded input. So
    stack the four (2,2,Cin,Cout) parity kernels along the OUTPUT-channel
    axis, run one conv -> (N, H+1, W+1, 4*Cout), then slice + interleave
    (cheap data movement XLA fuses into the surrounding ops).

    FLOPs: (H+1)(W+1)*4*Cin*4Cout MACs ~= 16 HW Cin Cout vs the naive
    4HW*9*Cin*Cout = 36 HW Cin Cout.
    """
    N, H, W_, Cin = x.shape
    Cout = w.shape[-1]
    ks = _parity_kernels(w)
    k_all = jnp.concatenate(
        [ks[(0, 0)], ks[(0, 1)], ks[(1, 0)], ks[(1, 1)]], axis=-1
    )  # (2, 2, Cin, 4*Cout)
    z = jax.lax.conv_general_dilated(
        x,
        k_all,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (N, H+1, W+1, 4*Cout)
    parts = []
    for q, (py, px) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        parts.append(
            z[:, py : py + H, px : px + W_, q * Cout : (q + 1) * Cout]
        )
    row0 = jnp.stack(parts[:2], axis=3)  # (N,H,W,2,C)
    row1 = jnp.stack(parts[2:], axis=3)
    stacked = jnp.stack([row0, row1], axis=2)  # (N,H,2,W,2,C)
    return stacked.reshape(N, 2 * H, 2 * W_, Cout)


def upsample2x_conv3x3_deconv(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Transposed-conv variant ("deconv"): nearest-2x-upsample + conv3x3 is
    exactly an input-dilated (lhs_dilation=2) conv with the 4x4 composite
    kernel K[i,j] = sum_{a,b in {0,1}} w[i-a, j-b] (the 3x3 kernel correlated
    with the 2x2 ones kernel that implements nearest upsampling). One op; XLA
    lowers input-dilated convs natively on TPU."""
    Cin, Cout = w.shape[2], w.shape[3]
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # (4,4,Cin,Cout)
    k4 = (
        wp
        + jnp.roll(wp, 1, axis=0)
        + jnp.roll(wp, 1, axis=1)
        + jnp.roll(jnp.roll(wp, 1, axis=0), 1, axis=1)
    )  # rolls are safe: the padded row/col is zero
    return jax.lax.conv_general_dilated(
        x,
        k4,
        window_strides=(1, 1),
        padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
