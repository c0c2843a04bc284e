"""Order-consistency video encoder — spectral-norm R(2+1)D-style conv stack.

Reference: `VideoEncoder` / `R2Plus1dStem` (`model.py:99-210`). A stack of
factorized (1,k,k)-spatial / (k,1,1)-temporal SN 3-D convolutions with BN +
LeakyReLU(0.2), global average pool, and a 2-layer SN MLP detector that
scores whether a story's frame order was shuffled.

Reference quirks preserved (they define the trained shapes):
  * the stem's second conv has kernel (1,1,1) but padding (1,0,0), which
    GROWS the temporal axis by 2 (T=5 -> 7) — reference `model.py:109-111`.
  * the torchvision r2plus1d_18 instantiated at reference `model.py:154` is
    never used; only the custom stack below runs.

Input here is (B, T, H, W, C) = NDHWC, the TPU-native 3-D conv layout
(reference uses NCTHW).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from cpcsv_tpu.ops.blocks import make_batchnorm
from cpcsv_tpu.ops.spectral_norm import SNConv, SNDense

# (features, kernel (t,h,w), strides, padding (t,h,w)) for the 8 body convs
# matching reference model.py:156-190
_BODY = (
    (128, (1, 3, 3), (1, 2, 2), (0, 1, 1)),
    (128, (3, 1, 1), (2, 1, 1), (1, 0, 0)),
    (128, (1, 3, 3), (1, 2, 2), (0, 1, 1)),
    (256, (3, 1, 1), (2, 1, 1), (1, 0, 0)),
    (256, (1, 3, 3), (1, 2, 2), (0, 1, 1)),
    (512, (3, 1, 1), (2, 1, 1), (1, 0, 0)),
    (512, (1, 3, 3), (1, 2, 2), (0, 1, 1)),
    (512, (3, 1, 1), (2, 1, 1), (1, 0, 0)),
)


def _pad3(p):
    return tuple((x, x) for x in p)


class VideoEncoder(nn.Module):
    dtype: Any = None
    bn_backend: str = "xla"  # cfg.BN_BACKEND

    @nn.compact
    def __call__(self, story: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """story: (B, T, H, W, 3) -> order logits (B, 1)."""
        x = story
        # ---- R(2+1)D stem (reference model.py:99-113)
        x = SNConv(45, (1, 7, 7), (1, 2, 2), _pad3((0, 3, 3)), dtype=self.dtype, name="stem0")(
            x, sn_update=train
        )
        x = make_batchnorm(dtype=self.dtype, name="stem0_bn", backend=self.bn_backend)(x, use_running_average=not train)
        x = nn.relu(x)
        # kernel (1,1,1) with temporal padding 1: T -> T+2 (reference quirk)
        x = SNConv(64, (1, 1, 1), (1, 1, 1), _pad3((1, 0, 0)), dtype=self.dtype, name="stem1")(
            x, sn_update=train
        )
        x = make_batchnorm(dtype=self.dtype, name="stem1_bn", backend=self.bn_backend)(x, use_running_average=not train)
        x = nn.relu(x)
        # ---- body
        for i, (feat, k, s, p) in enumerate(_BODY):
            x = SNConv(feat, k, s, _pad3(p), dtype=self.dtype, name=f"body{i}")(
                x, sn_update=train
            )
            x = make_batchnorm(dtype=self.dtype, name=f"body{i}_bn", backend=self.bn_backend)(
                x, use_running_average=not train
            )
            x = nn.leaky_relu(x, 0.2)
        # ---- AdaptiveAvgPool3d(1) -> (B, 512)
        latents = x.mean(axis=(1, 2, 3))
        # ---- detector MLP (reference model.py:193-198)
        h = SNDense(128, dtype=self.dtype, name="det0")(latents, sn_update=train)
        h = make_batchnorm(dtype=self.dtype, name="det_bn", backend=self.bn_backend)(h, use_running_average=not train)
        h = nn.relu(h)
        return SNDense(1, dtype=self.dtype, name="det1")(h, sn_update=train)
