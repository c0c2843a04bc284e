"""The three conditional discriminators + logit head, TPU-native (NHWC).

Reference equivalents:
  * ImageDiscriminator  <- STAGE1_D_IMG   (reference `model.py:487-527`)
  * SegDiscriminator    <- STAGE1_D_SEG   (reference `model.py:529-569`)
  * StoryDiscriminator  <- STAGE1_D_STY_V2 (reference `model.py:571-618`)
  * DGetLogits          <- D_GET_LOGITS   (reference `model.py:68-97`)

Differences by design:
  * NHWC layout; videos are (B, T, H, W, C).
  * heads return LOGITS (no sigmoid); losses use sigmoid-BCE-with-logits,
    numerically identical to the reference's Sigmoid+BCELoss but stable.
  * spectral norm is the explicit-state `SNConv` (one power iteration per
    training forward, state in the "spectral" collection).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from cpcsv_tpu.ops.blocks import Conv4x4s2, make_batchnorm, normal_kernel_init
from cpcsv_tpu.ops.spectral_norm import SNConv
from cpcsv_tpu.models.video_encoder import VideoEncoder


def _pairwise_cond_logits(get_cond_logits, features, conditions, train):
    """(B, B) matrix of conditional logits for every (feature_i, cond_j)
    pair — one batched head call over B^2 rows (InfoNCE extension; shared
    by the image/seg and story discriminators)."""
    B = features.shape[0]
    feat_rep = jnp.repeat(features, B, axis=0)  # i-major
    cond_tile = jnp.tile(conditions, (B, 1))
    logits = get_cond_logits(feat_rep, cond_tile, train=train)
    return logits.reshape(B, B)


class _Encoder64(nn.Module):
    """64x64xC -> 4x4x(ndf*8) conv stack: 4x (conv4x4 s2) with LeakyReLU(0.2);
    spectral norm on layers 2-4 (and optionally layer 1, story D)."""

    ndf: int
    sn_first: bool = False
    dtype: Any = None
    bn_backend: str = "xla"  # cfg.BN_BACKEND

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        ndf = self.ndf
        if self.sn_first:
            x = SNConv(ndf, (4, 4), 2, ((1, 1), (1, 1)), dtype=self.dtype, name="c0")(
                x, sn_update=train
            )
        else:
            x = Conv4x4s2(ndf, dtype=self.dtype, name="c0")(x)
        x = nn.leaky_relu(x, 0.2)
        for i, mult in enumerate((2, 4, 8)):
            x = SNConv(
                ndf * mult, (4, 4), 2, ((1, 1), (1, 1)), dtype=self.dtype, name=f"c{i+1}"
            )(x, sn_update=train)
            x = make_batchnorm(
                dtype=self.dtype, name=f"bn{i+1}", backend=self.bn_backend
            )(x, use_running_average=not train)
            x = nn.leaky_relu(x, 0.2)
        return x  # (N, 4, 4, ndf*8)


class DGetLogits(nn.Module):
    """Conditional logit head (reference D_GET_LOGITS). Returns logits (N,)."""

    ndf: int
    nef: int
    bcondition: bool = True
    dtype: Any = None
    bn_backend: str = "xla"  # cfg.BN_BACKEND

    @nn.compact
    def __call__(
        self, h_code: jnp.ndarray, c_code: Optional[jnp.ndarray] = None, train: bool = True
    ) -> jnp.ndarray:
        if self.bcondition and c_code is not None:
            if c_code.shape[-1] != self.nef:
                raise ValueError(
                    f"condition width {c_code.shape[-1]} != nef={self.nef} "
                    "(CONDITION_DIM + TEXT.DIMENSION + LABEL_NUM)"
                )
            c = jnp.broadcast_to(
                c_code[:, None, None, :], (c_code.shape[0], 4, 4, c_code.shape[-1])
            ).astype(h_code.dtype)
            h = jnp.concatenate([h_code, c], axis=-1)
            h = SNConv(self.ndf * 8, (3, 3), 1, "SAME", dtype=self.dtype, name="conv")(
                h, sn_update=train
            )
            h = make_batchnorm(
                dtype=self.dtype, name="bn", backend=self.bn_backend
            )(h, use_running_average=not train)
            h = nn.leaky_relu(h, 0.2)
        else:
            h = h_code
        out = SNConv(
            1, (4, 4), 4, "VALID", use_bias=True, dtype=self.dtype, name="out"
        )(h, sn_update=train)
        return out.reshape(-1)


class _CateClassify(nn.Module):
    """Multi-label character head: conv(ndf*8 -> label_num, k4 s4 p1)
    (reference `model.py:520`). (N,4,4,ndf*8) -> logits (N, label_num)."""

    label_num: int
    dtype: Any = None

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        out = nn.Conv(
            self.label_num,
            (4, 4),
            strides=(4, 4),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            kernel_init=normal_kernel_init,
            dtype=self.dtype,
            name="conv",
        )(h)
        return out.reshape(-1, self.label_num)


class ImageDiscriminator(nn.Module):
    """STAGE1_D_IMG: 3-channel frames + conditional head + character head."""

    ndf: int = 124
    nef: int = 124  # CONDITION_DIM
    text_dim: int = 356
    label_num: int = 9
    use_categories: bool = True
    in_channels: int = 3
    dtype: Any = None
    bn_backend: str = "xla"  # cfg.BN_BACKEND

    def setup(self):
        self.encode_img = _Encoder64(
            self.ndf, sn_first=False, dtype=self.dtype, bn_backend=self.bn_backend
        )
        self.get_cond_logits = DGetLogits(
            self.ndf, self.nef + self.text_dim + self.label_num, dtype=self.dtype,
            bn_backend=self.bn_backend,
        )
        if self.use_categories:
            self.cate_classify = _CateClassify(self.label_num, dtype=self.dtype)

    def _check_in(self, image):
        if image.shape[-1] != self.in_channels:
            # e.g. RGB frames fed to the 1-channel SegDiscriminator: the lazy
            # conv would silently build a wrong-width c0 kernel that no
            # longer matches the reference porter layout
            raise ValueError(
                f"{type(self).__name__} expects {self.in_channels}-channel "
                f"input, got {image.shape[-1]}"
            )

    def __call__(self, image: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        self._check_in(image)
        return self.encode_img(image, train=train)

    def cond_logits(self, features, conditions, train: bool = True):
        return self.get_cond_logits(features, conditions, train=train)

    def cate_logits(self, features):
        return self.cate_classify(features)

    def full_forward(self, image, conditions, train: bool = True):
        """Touches every head — use for param init."""
        self._check_in(image)
        feat = self.encode_img(image, train=train)
        logits = self.get_cond_logits(feat, conditions, train=train)
        cate = self.cate_classify(feat) if self.use_categories else None
        return feat, logits, cate

    def d_phase(self, real, fake, cond, train: bool = True):
        """D-update forwards: real/wrong/fake logits + cate on real features
        (order matches reference compute_discriminator_loss so BN/SN state
        evolves the same way)."""
        self._check_in(real)
        real_feat = self.encode_img(real, train=train)
        fake_feat = self.encode_img(fake, train=train)
        real_logits = self.get_cond_logits(real_feat, cond, train=train)
        if real.shape[0] > 1:
            wrong_logits = self.get_cond_logits(real_feat[:-1], cond[1:], train=train)
        else:
            # batch==1 has no mismatched pair. Skipping the CALL (not just
            # zeroing the loss, gan_losses.py does that too) matters: a
            # train-mode BatchNorm forward over an EMPTY batch writes NaN
            # into the cond head's running stats permanently.
            wrong_logits = jnp.zeros((0,), dtype=real_logits.dtype)
        fake_logits = self.get_cond_logits(fake_feat, cond, train=train)
        cate = self.cate_classify(real_feat) if self.use_categories else None
        return real_logits, wrong_logits, fake_logits, cate

    def g_phase(self, fake, cond, train: bool = True):
        """G-update forwards: fake logits + cate on fake features."""
        fake_feat = self.encode_img(fake, train=train)
        fake_logits = self.get_cond_logits(fake_feat, cond, train=train)
        cate = self.cate_classify(fake_feat) if self.use_categories else None
        return fake_logits, cate

    def pairwise_cond_logits(self, features, conditions, train: bool = True):
        return _pairwise_cond_logits(self.get_cond_logits, features, conditions, train)

    def d_phase_infonce(self, real, fake, cond, train: bool = True):
        """D-update forwards, InfoNCE variant (cfg.USE_INFONCE): the full
        pairwise real-feature x condition matrix replaces the single shifted
        wrong-pair head call; real logits = its diagonal."""
        real_feat = self.encode_img(real, train=train)
        fake_feat = self.encode_img(fake, train=train)
        pair = self.pairwise_cond_logits(real_feat, cond, train=train)
        fake_logits = self.get_cond_logits(fake_feat, cond, train=train)
        cate = self.cate_classify(real_feat) if self.use_categories else None
        return pair, fake_logits, cate


class SegDiscriminator(ImageDiscriminator):
    """STAGE1_D_SEG: identical, 1-channel input masks."""

    in_channels: int = 1


class StoryDiscriminator(nn.Module):
    """STAGE1_D_STY_V2: per-frame conv stack (all 4 layers spectral-normed),
    then MEAN over the frame axis; optional order-consistency VideoEncoder."""

    ndf: int = 124
    nef: int = 124
    text_dim: int = 356
    label_num: int = 9
    use_seq_consistency: bool = False
    dtype: Any = None
    bn_backend: str = "xla"  # cfg.BN_BACKEND

    def setup(self):
        self.encode_img = _Encoder64(
            self.ndf, sn_first=True, dtype=self.dtype, bn_backend=self.bn_backend
        )
        self.get_cond_logits = DGetLogits(
            self.ndf, self.nef + self.text_dim + self.label_num, dtype=self.dtype,
            bn_backend=self.bn_backend,
        )
        if self.use_seq_consistency:
            self.seq_consisten_model = VideoEncoder(
                dtype=self.dtype, bn_backend=self.bn_backend
            )

    def __call__(self, story: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """story: (B, T, H, W, C) -> (B, 4, 4, ndf*8) frame-mean features."""
        B, T = story.shape[0], story.shape[1]
        frames = story.reshape(-1, *story.shape[2:])
        emb = self.encode_img(frames, train=train)
        emb = emb.reshape(B, T, *emb.shape[1:])
        return emb.mean(axis=1)

    def cond_logits(self, features, conditions, train: bool = True):
        return self.get_cond_logits(features, conditions, train=train)

    def consistency_logits(self, story: jnp.ndarray, train: bool = True):
        return self.seq_consisten_model(story, train=train)

    def full_forward(self, story, conditions, train: bool = True):
        """Touches every head — use for param init."""
        feat = self(story, train=train)
        logits = self.get_cond_logits(feat, conditions, train=train)
        cons = (
            self.seq_consisten_model(story, train=train)
            if self.use_seq_consistency
            else None
        )
        return feat, logits, cons

    def d_phase(self, real, fake, cond, shuffled=None, train: bool = True):
        """D-update forwards (no cate head on the story D, reference
        model.py:608). `shuffled` is the host-side shuffle-augmented real
        stories for the order-consistency branch."""
        real_feat = self(real, train=train)
        fake_feat = self(fake, train=train)
        real_logits = self.get_cond_logits(real_feat, cond, train=train)
        if real.shape[0] > 1:
            wrong_logits = self.get_cond_logits(real_feat[:-1], cond[1:], train=train)
        else:
            # see ImageDiscriminator.d_phase: an empty-batch train-mode BN
            # forward would poison the head's running stats with NaN
            wrong_logits = jnp.zeros((0,), dtype=real_logits.dtype)
        fake_logits = self.get_cond_logits(fake_feat, cond, train=train)
        order_logits = None
        if self.use_seq_consistency and shuffled is not None:
            order_logits = self.seq_consisten_model(shuffled, train=train)
        return real_logits, wrong_logits, fake_logits, order_logits

    def g_phase(self, fake, cond, real=None, train: bool = True):
        fake_feat = self(fake, train=train)
        fake_logits = self.get_cond_logits(fake_feat, cond, train=train)
        cons_fake = cons_real = None
        if self.use_seq_consistency and real is not None:
            cons_real = self.seq_consisten_model(real, train=train)
            cons_fake = self.seq_consisten_model(fake, train=train)
        return fake_logits, cons_fake, cons_real

    def pairwise_cond_logits(self, features, conditions, train: bool = True):
        return _pairwise_cond_logits(self.get_cond_logits, features, conditions, train)

    def d_phase_infonce(self, real, fake, cond, shuffled=None, train: bool = True):
        """InfoNCE variant of d_phase (cfg.USE_INFONCE)."""
        real_feat = self(real, train=train)
        fake_feat = self(fake, train=train)
        pair = self.pairwise_cond_logits(real_feat, cond, train=train)
        fake_logits = self.get_cond_logits(fake_feat, cond, train=train)
        order_logits = None
        if self.use_seq_consistency and shuffled is not None:
            order_logits = self.seq_consisten_model(shuffled, train=train)
        return pair, fake_logits, order_logits
