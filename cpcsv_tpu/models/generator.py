"""StoryGenerator — the CP-CSV generator, TPU-native.

Covers BOTH reference variants behind the `cascade` flag:
  * baseline + v1 seg gating      (reference `model.py:214-483`)
  * cascade seg autoencoder       (reference `cascade_model.py:221-540`)

Pipeline (reference `model.py:348-423` / `cascade_model.py:368-456`):
  content (B,T,356) --flatten--> CA-Net VAE sampler -> r_code/r_mu/r_logvar (124)
  motion  (B,T,365) --GRU("Text2Gist", noise per step)--> zm (B*T,365)
                    --context GRU--> crnn_code (B*T,124)
  dynamic filter:  image_net(motion) (B*T,3,124) conv1d filter_net(crnn) (B*T,1,3,21)
  zmc = [zm | c_mu | dfn]  (613) -> fc -> 4x4 map -> 4 UpBlocks -> 64x64 tanh image
  seg branch: parallel 1-channel trunk; gates the image trunk at 4x4 and 8x8.
  cascade: the *generated mask* is re-encoded by a conv autoencoder
  (presample + 4 DownBlocks) and the re-encoded latents do the gating;
  both latent pyramids are returned for the latent-matching MSE loss.

TPU-first design decisions:
  * images are NHWC; the video is (B, T, H, W, C) (use utils.image.to_ncthw
    for the reference's (B, C, T, H, W)).
  * the per-sample dynamic-filter conv is one batched einsum
    (`cpcsv_tpu.ops.dynamic_filter`), not a Python loop over the batch
    (reference `layers.py:74-76`).
  * every noise draw comes from the module's "noise" RNG stream — explicit,
    reproducible, shardable.
  * `torch_repeat_quirk`: the reference tiles the content code with
    `r_mu.repeat(video_len, 1)` (reference `model.py:361`), which pairs frame
    (b, t) with the content code of sample `(b*T+t) % B` — a latent
    cross-sample mispairing. Default here is the *correct* per-sample repeat
    (`jnp.repeat`); set the flag to replicate the reference bit-for-bit.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from cpcsv_tpu.ops.blocks import Conv3x3, DenseBN, DownBlock, UpBlock, make_batchnorm, normal_kernel_init
from cpcsv_tpu.ops.dynamic_filter import dynamic_filter_conv1d
from cpcsv_tpu.ops.gru import GRUCell, gru_scan


class GeneratorOutput(NamedTuple):
    """Mirrors the reference 7-tuple return of sample_videos/sample_images."""

    latents: Optional[tuple]  # ((zmc_seg,h1,h2,h3),(g1,g2,g3,g4)) or None
    image: jnp.ndarray  # video (B,T,H,W,3) or image (B,H,W,3)
    m_mu: jnp.ndarray
    m_logvar: jnp.ndarray
    c_mu: jnp.ndarray
    c_logvar: jnp.ndarray
    seg: Optional[jnp.ndarray]  # mask(s) (B*T,H,W,1) / (B,H,W,1) or None


class CANet(nn.Module):
    """Conditioning augmentation VAE sampler (reference `model.py:37-65`)."""

    c_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, text_embedding: jnp.ndarray, sample: bool = True):
        x = nn.Dense(
            self.c_dim * 2,
            kernel_init=normal_kernel_init,
            dtype=self.dtype,
            name="fc",
        )(text_embedding)
        x = nn.relu(x)
        mu, logvar = x[:, : self.c_dim], x[:, self.c_dim :]
        if sample:
            eps = jax.random.normal(self.make_rng("noise"), mu.shape, mu.dtype)
            c_code = mu + jnp.exp(0.5 * logvar) * eps
        else:
            c_code = mu
        return c_code, mu, logvar


class StoryGenerator(nn.Module):
    video_len: int = 5
    n_channels: int = 3
    motion_dim: int = 365  # TEXT.DIMENSION + LABEL_NUM
    content_dim: int = 124  # GAN.CONDITION_DIM
    noise_dim: int = 100  # GAN.Z_DIM
    gf_dim: int = 2048  # GAN.GF_DIM * 8
    gf_dim_seg: int = 1024  # GAN.GF_SEG_DIM
    text_dim: int = 356
    use_segment: bool = True
    cascade: bool = False
    filter_num: int = 3
    filter_size: int = 21
    image_size: int = 124
    out_num: int = 1
    torch_repeat_quirk: bool = False
    remat: bool = False  # rematerialize up/down blocks: trade FLOPs for HBM
    use_pallas: bool = False  # cfg.USE_PALLAS: Pallas DFN kernel on TPU
    fused_upsample: str = "off"  # cfg.FUSED_UPSAMPLE (ops/fused_upsample.py)
    bn_backend: str = "xla"  # cfg.BN_BACKEND (ops/batchnorm.py pallas BN)
    dtype: Any = None

    def setup(self):
        valid = ("off", "parity4", "parity1", "deconv")
        if self.fused_upsample not in valid:
            raise ValueError(
                f"FUSED_UPSAMPLE={self.fused_upsample!r} invalid; one of {valid}"
            )
        ninput = self.motion_dim + self.content_dim + self.image_size  # 613
        ngf, ngf_seg = self.gf_dim, self.gf_dim_seg
        dt = self.dtype
        bnb = self.bn_backend
        # remat: recompute block activations in the backward pass instead of
        # storing them (jax.checkpoint through flax.linen.remat) — lets the
        # per-chip batch grow past HBM limits at ~1/3 extra FLOPs
        UpBlockM = nn.remat(UpBlock, static_argnums=(2,)) if self.remat else UpBlock
        DownBlockM = nn.remat(DownBlock, static_argnums=(2,)) if self.remat else DownBlock

        self.ca_net = CANet(self.content_dim, dtype=dt)
        self.filter_net = DenseBN(
            self.filter_size * self.filter_num * self.out_num, dtype=dt, bn_backend=bnb
        )
        self.image_net = DenseBN(
            self.image_size * self.filter_num, activation=jnp.tanh, dtype=dt,
            bn_backend=bnb,
        )
        fu = self.fused_upsample
        self.fc = DenseBN(ngf * 4 * 4, activation=nn.relu, use_bias=False, dtype=dt,
                          bn_backend=bnb)
        self.upsample1 = UpBlockM(ngf // 2, dtype=dt, fused=fu, bn_backend=bnb)
        self.upsample2 = UpBlockM(ngf // 4, dtype=dt, fused=fu, bn_backend=bnb)
        self.upsample3 = UpBlockM(ngf // 8, dtype=dt, fused=fu, bn_backend=bnb)
        self.upsample4 = UpBlockM(ngf // 16, dtype=dt, fused=fu, bn_backend=bnb)
        self.img = Conv3x3(self.n_channels, dtype=dt)

        if self.use_segment:
            self.seg_c = Conv3x3(ngf, dtype=dt)
            self.seg_c1 = Conv3x3(ngf // 2, dtype=dt)
            self.fc_seg = DenseBN(
                ngf_seg * 4 * 4, activation=nn.relu, use_bias=False, dtype=dt,
                bn_backend=bnb,
            )
            self.upsample1_seg = UpBlockM(ngf_seg // 2, dtype=dt, fused=fu, bn_backend=bnb)
            self.upsample2_seg = UpBlockM(ngf_seg // 4, dtype=dt, fused=fu, bn_backend=bnb)
            self.upsample3_seg = UpBlockM(ngf_seg // 8, dtype=dt, fused=fu, bn_backend=bnb)
            self.upsample4_seg = UpBlockM(ngf_seg // 16, dtype=dt, fused=fu, bn_backend=bnb)
            self.img_seg = Conv3x3(1, dtype=dt)
            if self.cascade:
                # mask re-encoder (reference cascade_model.py:312-320)
                self.presample_conv = Conv3x3(ngf_seg // 16, dtype=dt)
                self.presample_bn = make_batchnorm(dtype=dt, backend=bnb)
                self.downsample1_seg = DownBlockM(ngf_seg // 8, dtype=dt, bn_backend=bnb)
                self.downsample2_seg = DownBlockM(ngf_seg // 4, dtype=dt, bn_backend=bnb)
                self.downsample3_seg = DownBlockM(ngf_seg // 2, dtype=dt, bn_backend=bnb)
                self.downsample4_seg = DownBlockM(ngf_seg, dtype=dt, bn_backend=bnb)

        self.m_net = DenseBN(self.motion_dim, dtype=dt, bn_backend=bnb)
        self.c_net = DenseBN(self.content_dim, dtype=dt, bn_backend=bnb)
        self.recurrent = GRUCell(self.motion_dim, dtype=dt)
        self.mocornn = GRUCell(self.content_dim, dtype=dt)

    # ------------------------------------------------------------------ RNNs
    def sample_z_motion(
        self, m_code: jnp.ndarray, video_len: int, train: bool
    ) -> jnp.ndarray:
        """Text2Gist motion GRU with fresh noise per step
        (reference `model.py:321-334`). m_code: (B, T, 365) or (B, 365)."""
        if m_code.ndim == 2:
            m_code = jnp.repeat(m_code[:, None, :], video_len, axis=1)
        B = m_code.shape[0]
        h0 = self.m_net(
            jax.random.normal(
                self.make_rng("noise"), (B, self.motion_dim), m_code.dtype
            ),
            train=train,
        )
        noise = jax.random.normal(
            self.make_rng("noise"), (B, video_len, self.noise_dim), m_code.dtype
        )
        xs = jnp.concatenate([noise, m_code[:, :video_len]], axis=-1)
        hs = gru_scan(self.recurrent, h0, xs)  # (B, T, 365)
        return hs.reshape(-1, self.motion_dim)

    def motion_content_rnn(
        self, motion_input: jnp.ndarray, content_code: jnp.ndarray, train: bool
    ) -> jnp.ndarray:
        """Context GRU (reference `model.py:336-346`)."""
        if motion_input.ndim == 2:
            motion_input = motion_input[:, None, :]
        h0 = self.c_net(content_code, train)
        hs = gru_scan(self.mocornn, h0, motion_input)
        return hs.reshape(-1, self.content_dim)

    # ------------------------------------------------------------- DFN fusion
    def _dfn_fuse(self, m_code_flat, crnn_code, train):
        m_image = self.image_net(m_code_flat, train)
        m_image = m_image.reshape(-1, self.filter_num, self.image_size)
        c_filter = self.filter_net(crnn_code, train)
        c_filter = c_filter.reshape(
            -1, self.out_num, self.filter_num, self.filter_size
        )
        mc = dynamic_filter_conv1d(
            m_image, c_filter, pad=self.filter_size // 2,
            use_pallas=self.use_pallas,
        )
        return mc.reshape(-1, self.image_size)

    # --------------------------------------------------------------- helpers
    def _dense_to_map(self, x: jnp.ndarray, channels: int) -> jnp.ndarray:
        """(B, C*16) -> (B, 4, 4, C) preserving torch's channel-major reshape
        so reference checkpoints stay portable."""
        return x.reshape(-1, channels, 4, 4).transpose(0, 2, 3, 1)

    def _reencode_mask(self, mask: jnp.ndarray, train: bool):
        z = nn.relu(
            self.presample_bn(
                self.presample_conv(mask), use_running_average=not train
            )
        )
        g4 = self.downsample1_seg(z, train)  # 32x32
        g3 = self.downsample2_seg(g4, train)  # 16x16
        g2 = self.downsample3_seg(g3, train)  # 8x8
        g1 = self.downsample4_seg(g2, train)  # 4x4
        return g1, g2, g3, g4

    def _decode(self, zmc_all: jnp.ndarray, train: bool):
        """Shared trunk decode. Returns (frames (N,64,64,3), latents, mask)."""
        zmc_img = self._dense_to_map(self.fc(zmc_all, train), self.gf_dim)

        if not self.use_segment:
            h = self.upsample1(zmc_img, train)
            h = self.upsample2(h, train)
            h = self.upsample3(h, train)
            h = self.upsample4(h, train)
            frames = jnp.tanh(self.img(h))
            return frames, None, None

        zmc_seg = self._dense_to_map(self.fc_seg(zmc_all, train), self.gf_dim_seg)

        if self.cascade:
            # seg trunk first, then re-encode the mask, then gate the image trunk
            h_seg1 = self.upsample1_seg(zmc_seg, train)
            h_seg2 = self.upsample2_seg(h_seg1, train)
            h_seg3 = self.upsample3_seg(h_seg2, train)
            h_seg4 = self.upsample4_seg(h_seg3, train)
            mask = jnp.tanh(self.img_seg(h_seg4))
            g1, g2, g3, g4 = self._reencode_mask(mask, train)

            zmc_img = self.seg_c(g1) * zmc_img + zmc_img
            h_img = self.upsample1(zmc_img, train)
            h_img = self.seg_c1(g2) * h_img + h_img
            h_img = self.upsample2(h_img, train)
            h_img = self.upsample3(h_img, train)
            h_img = self.upsample4(h_img, train)
            frames = jnp.tanh(self.img(h_img))
            latents = ((zmc_seg, h_seg1, h_seg2, h_seg3), (g1, g2, g3, g4))
            return frames, latents, mask
        else:
            # v1: seg trunk gates the image trunk directly (model.py:381-407)
            zmc_img = self.seg_c(zmc_seg) * zmc_img + zmc_img
            h_seg = self.upsample1_seg(zmc_seg, train)
            h_img = self.upsample1(zmc_img, train)
            h_img = self.seg_c1(h_seg) * h_img + h_img
            h_seg = self.upsample2_seg(h_seg, train)
            h_img = self.upsample2(h_img, train)
            h_seg = self.upsample3_seg(h_seg, train)
            h_img = self.upsample3(h_img, train)
            h_seg = self.upsample4_seg(h_seg, train)
            h_img = self.upsample4(h_img, train)
            mask = jnp.tanh(self.img_seg(h_seg))
            frames = jnp.tanh(self.img(h_img))
            return frames, None, mask

    # ------------------------------------------------------------ public API
    def sample_videos(
        self,
        motion_input: jnp.ndarray,  # (B, T, 365)
        content_input: jnp.ndarray,  # (B, T, 356)
        seg: bool = False,
        train: bool = True,
    ) -> GeneratorOutput:
        B, T = motion_input.shape[0], motion_input.shape[1]
        if T != self.video_len or content_input.shape[-1] != self.text_dim:
            # trace-time config check: a mismatch would otherwise surface as
            # an opaque dense-kernel shape error inside ca_net
            raise ValueError(
                f"sample_videos got T={T}, text={content_input.shape[-1]} but "
                f"the generator was built with video_len={self.video_len}, "
                f"text_dim={self.text_dim} (cfg.VIDEO_LEN / cfg.TEXT.DIMENSION)"
            )
        content_flat = content_input.reshape(B, -1)
        r_code, r_mu, r_logvar = self.ca_net(content_flat, sample=True)

        if self.torch_repeat_quirk:
            c_mu = jnp.tile(r_mu, (T, 1))  # reference model.py:361 mispairing
        else:
            c_mu = jnp.repeat(r_mu, T, axis=0)  # (B*T, 124), frame-major

        crnn_code = self.motion_content_rnn(motion_input, r_code, train)
        m_flat = motion_input.reshape(-1, self.motion_dim)
        zm_code = self.sample_z_motion(motion_input, T, train)  # (B*T, 365)

        mc_image = self._dfn_fuse(m_flat, crnn_code, train)
        zmc_all = jnp.concatenate([zm_code, c_mu, mc_image], axis=1)  # (B*T, 613)

        frames, latents, mask = self._decode(zmc_all, train)
        video = frames.reshape(B, T, *frames.shape[1:])  # (B,T,64,64,3)
        return GeneratorOutput(
            latents=latents,
            image=video,
            m_mu=m_flat,
            m_logvar=m_flat,
            c_mu=r_mu,
            c_logvar=r_logvar,
            seg=mask if seg else None,
        )

    def sample_images(
        self,
        motion_input: jnp.ndarray,  # (B, 365)
        content_input: jnp.ndarray,  # (B, T, 356)
        seg: bool = False,
        train: bool = True,
    ) -> GeneratorOutput:
        B = motion_input.shape[0]
        content_flat = content_input.reshape(B, -1)
        _, c_mu, c_logvar = self.ca_net(content_flat, sample=True)

        crnn_code = self.motion_content_rnn(motion_input, c_mu, train)
        zm_code = self.sample_z_motion(motion_input, 1, train)  # (B, 365)
        mc_image = self._dfn_fuse(motion_input, crnn_code, train)
        zmc_all = jnp.concatenate([zm_code, c_mu, mc_image], axis=1)

        frames, latents, mask = self._decode(zmc_all, train)
        return GeneratorOutput(
            latents=latents,
            image=frames,  # (B,64,64,3)
            m_mu=motion_input,
            m_logvar=motion_input,
            c_mu=c_mu,
            c_logvar=c_logvar,
            seg=mask if seg else None,
        )

    def train_autoencoder(
        self, real_segments: jnp.ndarray, train: bool = True
    ) -> jnp.ndarray:
        """Seg autoencoder reconstruction (reference cascade_model.py:528-540).
        real_segments: (N, 64, 64, 1)."""
        assert self.cascade, "autoencoder exists only in the cascade variant"
        g1, _, _, _ = self._reencode_mask(real_segments, train)
        h = self.upsample1_seg(g1, train)
        h = self.upsample2_seg(h, train)
        h = self.upsample3_seg(h, train)
        h = self.upsample4_seg(h, train)
        return jnp.tanh(self.img_seg(h))

    def __call__(self, motion_input, content_input, seg=False, train=True):
        """Default apply = sample_videos (for init convenience)."""
        out = self.sample_videos(motion_input, content_input, seg=seg, train=train)
        if self.cascade and self.use_segment:
            # touch the autoencoder path so init creates every param
            _ = self.train_autoencoder(
                jnp.zeros(
                    (motion_input.shape[0], 64, 64, 1), dtype=out.image.dtype
                ),
                train=False,
            )
        _ = self.sample_images(
            motion_input[:, 0, :], content_input, seg=seg, train=train
        )
        return out
