"""Model construction from a Config (reference `trainer.py:82-97`
load_network_stageI — selects cascade vs baseline and builds G + 3 Ds)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from cpcsv_tpu.config import Config
from cpcsv_tpu.models.discriminators import (
    ImageDiscriminator,
    SegDiscriminator,
    StoryDiscriminator,
)
from cpcsv_tpu.models.generator import StoryGenerator


def _dtype(cfg: Config) -> Any:
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.COMPUTE_DTYPE]


def generator_from_config(cfg: Config, video_len: int | None = None) -> StoryGenerator:
    return StoryGenerator(
        video_len=video_len or cfg.VIDEO_LEN,
        motion_dim=cfg.TEXT.DIMENSION + cfg.LABEL_NUM,
        content_dim=cfg.GAN.CONDITION_DIM,
        noise_dim=cfg.GAN.Z_DIM,
        gf_dim=cfg.GAN.GF_DIM * 8,
        gf_dim_seg=cfg.GAN.GF_SEG_DIM,
        text_dim=cfg.TEXT.DIMENSION,
        use_segment=cfg.SEGMENT_LEARNING,
        cascade=cfg.CASCADE_MODEL,
        torch_repeat_quirk=cfg.TORCH_REPEAT_QUIRK,
        remat=cfg.REMAT,
        use_pallas=cfg.USE_PALLAS,
        fused_upsample=cfg.FUSED_UPSAMPLE,
        bn_backend=cfg.BN_BACKEND,
        dtype=_dtype(cfg),
    )


def build_models(cfg: Config):
    """Returns (netG, netD_im, netD_st, netD_se-or-None)."""
    dt = _dtype(cfg)
    net_g = generator_from_config(cfg)
    net_d_im = ImageDiscriminator(
        ndf=cfg.GAN.DF_DIM,
        nef=cfg.GAN.CONDITION_DIM,
        text_dim=cfg.TEXT.DIMENSION,
        label_num=cfg.LABEL_NUM,
        dtype=dt,
        bn_backend=cfg.BN_BACKEND,
    )
    net_d_st = StoryDiscriminator(
        ndf=cfg.GAN.DF_DIM,
        nef=cfg.GAN.CONDITION_DIM,
        text_dim=cfg.TEXT.DIMENSION,
        label_num=cfg.LABEL_NUM,
        use_seq_consistency=cfg.USE_SEQ_CONSISTENCY,
        dtype=dt,
        bn_backend=cfg.BN_BACKEND,
    )
    net_d_se = None
    if cfg.SEGMENT_LEARNING:
        net_d_se = SegDiscriminator(
            ndf=cfg.GAN.DF_DIM,
            nef=cfg.GAN.CONDITION_DIM,
            text_dim=cfg.TEXT.DIMENSION,
            label_num=cfg.LABEL_NUM,
            in_channels=1,
            dtype=dt,
            bn_backend=cfg.BN_BACKEND,
        )
    return net_g, net_d_im, net_d_st, net_d_se
