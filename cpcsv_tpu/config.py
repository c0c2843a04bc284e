"""Config system: same YAML schema / key names / defaults as the reference
(`miscc/config.py:9-66`, `cfg/final.yml`), parsed into a frozen dataclass.

Merge semantics match the reference (`miscc/config.py:68-99`):
  * unknown keys raise ``KeyError``
  * type mismatches raise ``ValueError`` (ints are accepted for floats,
    mirroring YAML-loader behavior the reference relied on implicitly)

Unlike the reference's mutable global EasyDict, the parsed config is an
immutable value that is passed explicitly — jit-friendly (hashable, usable
as a static argument) and safe to snapshot.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Mapping

import yaml


@dataclass(frozen=True)
class CoeffConfig:
    KL: float = 2.0


@dataclass(frozen=True)
class TrainConfig:
    FLAG: bool = True
    IM_BATCH_SIZE: int = 64
    ST_BATCH_SIZE: int = 64
    MAX_EPOCH: int = 600
    SNAPSHOT_INTERVAL: int = 50
    PRETRAINED_MODEL: str = ""
    PRETRAINED_EPOCH: int = 600
    LR_DECAY_EPOCH: int = 600
    DISCRIMINATOR_LR: float = 2e-4
    GENERATOR_LR: float = 2e-4
    SEGMENT_NAME: str = "img_segment"
    COEFF: CoeffConfig = field(default_factory=CoeffConfig)


@dataclass(frozen=True)
class GanConfig:
    CONDITION_DIM: int = 124
    Z_DIM: int = 100
    DF_DIM: int = 124
    GF_DIM: int = 256
    GF_SEG_DIM: int = 1024
    R_NUM: int = 4


@dataclass(frozen=True)
class TextConfig:
    DIMENSION: int = 356


@dataclass(frozen=True)
class Config:
    """Top-level config. Field names/defaults mirror reference `miscc/config.py`."""

    DATASET_NAME: str = "birds"
    EMBEDDING_TYPE: str = "cnn-rnn"
    CONFIG_NAME: str = ""
    GPU_ID: str = "0"
    CUDA: bool = True  # kept for schema parity; ignored (device = TPU/CPU mesh)
    WORKERS: int = 6
    VIDEO_LEN: int = 5
    NET_G: str = ""
    NET_D: str = ""
    STAGE1_G: str = ""
    DATA_DIR: str = ""
    VIS_COUNT: int = 64

    USE_SEQ_CONSISTENCY: bool = False
    CONSISTENCY_RATIO: float = 1.0
    SEGMENT_LEARNING: bool = True
    SEGMENT_RATIO: float = 1.0
    IMAGE_RATIO: float = 5.0
    RECONSTRUCT_LOSS: float = 1.0
    EVALUATE_FID_SCORE: bool = False
    CASCADE_MODEL: bool = True
    Z_DIM: int = 100
    IMSIZE: int = 64
    SESIZE: int = 64
    STAGE: int = 1

    LABEL_NUM: int = 9
    TRAIN: TrainConfig = field(default_factory=TrainConfig)
    GAN: GanConfig = field(default_factory=GanConfig)
    TEXT: TextConfig = field(default_factory=TextConfig)

    # --- TPU-native extensions (not in the reference schema; optional keys) ---
    COMPUTE_DTYPE: str = "float32"  # "float32" | "bfloat16" for conv/matmul path
    MESH_SHAPE: str = ""  # e.g. "data:8"; empty = use all local devices on "data"
    # Enable Pallas kernels on TPU for hot ops. Default OFF: the remote-Mosaic
    # lane-splat miscompile (ops/pallas/dfn.py) is still present on the
    # deployment libtpu (retested 2026-08-16, see tests/test_pallas_kernels.py).
    # Env var CPCSV_USE_PALLAS=0/1 acts as an explicit override only.
    USE_PALLAS: bool = False
    REMAT: bool = False  # rematerialize generator blocks (trade FLOPs for HBM)
    # Fused nearest-2x-upsample+conv3x3 in the generator trunks (2.25x fewer
    # MACs, no 2x activation in HBM; numerically equivalent — see
    # ops/fused_upsample.py): "off" | "parity4" | "parity1" | "deconv".
    # Default "deconv": measured 84.3 ms/step vs 107.7 "off" on v5e
    # (readback-verified, 2026-08-16) — a 1.29x full-train-step speedup.
    FUSED_UPSAMPLE: str = "deconv"
    # Steps per jitted dispatch: >1 scans K alternating D+G updates in ONE
    # XLA program (train/steps.py:make_scan_steps) with the train state
    # donated as the scan carry — measured 77.9 ms/step steady-state at K=20
    # vs 80.7 per-step dispatch on v5e (distinct batches ride in as stacked
    # scan inputs; each dispatch costs ~40-60 ms fixed on the tunnel, so
    # larger K amortizes better: K=8 gave 83 ms/step). Step semantics are
    # identical (tests/test_train_steps.py scan-vs-split). The consumer MUST
    # read back something per dispatch (the trainer logs metrics per chunk);
    # enqueueing two scan dispatches back-to-back with no readback between
    # them serialized pathologically on the axon tunnel (+400 ms/dispatch).
    SCAN_STEPS: int = 20
    # EXTENSION (off by default; not reference parity): replace the single
    # shifted wrong-pair BCE (reference miscc/utils.py:77-80) with batch-wise
    # InfoNCE over all (real-feature, condition) pairs — see
    # losses/gan_losses.py:infonce_loss.
    USE_INFONCE: bool = False
    INFONCE_TEMPERATURE: float = 1.0
    # Reproduce the reference's content-tiling mispairing: model.py:361 tiles
    # the CA-Net content code with `r_mu.repeat(video_len, 1)`, pairing frame
    # (b, t) with the content code of sample (b*T+t) % B — a cross-sample
    # mispairing the reference's shipped checkpoints were TRAINED with.
    # Default False = corrected per-sample pairing. tools/port_reference_run.py
    # writes `TORCH_REPEAT_QUIRK: true` into the imported run's setting.yml so
    # eval walks of reference checkpoints reproduce reference pairing
    # (the two tilings coincide at B=1 and diverge at B>1).
    TORCH_REPEAT_QUIRK: bool = False
    # BatchNorm backend: "xla" (flax nn.BatchNorm — the measured-fastest
    # default) | "mxu" (ops/blocks.py MxuBatchNorm — statistic reductions as
    # MXU matmuls; GSPMD-shardable; measured 0.69x, kept as opt-in) |
    # "pallas" (ops/batchnorm.py — channel reductions as Pallas kernels;
    # measured 0.74x, single-device only). Both alternatives LOSE despite
    # faster isolated reductions because they break XLA's one-pass
    # cast+stats+normalize convert_reduce fusions — full A/B data in
    # PARITY.md "Measured perf experiments".
    BN_BACKEND: str = "xla"
    # Adam first-moment storage dtype: "float32" | "bfloat16". bf16 halves
    # the m-buffer HBM traffic of the 4 per-net Adam updates (params, nu and
    # the update math stay fp32 — optax upcasts m̂ before use). A/B lever for
    # the train-step MFU push; measured results in PARITY.md.
    ADAM_MU_DTYPE: str = "float32"

    # ----- derived helpers -----
    @property
    def motion_dim(self) -> int:
        return self.TEXT.DIMENSION + self.LABEL_NUM

    @property
    def content_dim(self) -> int:
        return self.GAN.CONDITION_DIM

    def with_updates(self, **kwargs: Any) -> "Config":
        return dataclasses.replace(self, **kwargs)


def default_config() -> Config:
    return Config()


def _merge_into(data: Mapping[str, Any], obj: Any, path: str = "") -> Any:
    """Merge a mapping into a (nested) frozen dataclass, reference-style checks."""
    if not dataclasses.is_dataclass(obj):
        raise TypeError(f"cannot merge into non-dataclass at {path!r}")
    names = {f.name: f for f in dataclasses.fields(obj)}
    updates: dict[str, Any] = {}
    for key, value in data.items():
        if key not in names:
            raise KeyError(f"{key} is not a valid config key")
        old = getattr(obj, key)
        if dataclasses.is_dataclass(old):
            if not isinstance(value, Mapping):
                raise ValueError(
                    f"Type mismatch ({type(old)} vs. {type(value)}) for config key: {key}"
                )
            updates[key] = _merge_into(value, old, f"{path}{key}.")
        else:
            if isinstance(old, bool):
                if not isinstance(value, bool):
                    raise ValueError(
                        f"Type mismatch (bool vs. {type(value)}) for config key: {key}"
                    )
            elif isinstance(old, float):
                if not isinstance(value, (int, float)) or isinstance(value, bool):
                    raise ValueError(
                        f"Type mismatch (float vs. {type(value)}) for config key: {key}"
                    )
                value = float(value)
            elif isinstance(old, int):
                if not isinstance(value, int) or isinstance(value, bool):
                    raise ValueError(
                        f"Type mismatch (int vs. {type(value)}) for config key: {key}"
                    )
            elif isinstance(old, str):
                if value is None:
                    value = ""
                if not isinstance(value, str):
                    raise ValueError(
                        f"Type mismatch (str vs. {type(value)}) for config key: {key}"
                    )
            updates[key] = value
    return dataclasses.replace(obj, **updates)


def config_from_file(filename: str, base: Config | None = None) -> Config:
    """Load a YAML config and merge it into the defaults (reference
    `cfg_from_file`, `miscc/config.py:102-108`)."""
    with open(filename, "r") as f:
        raw = yaml.safe_load(f) or {}
    cfg = _merge_into(raw, base or default_config())
    # reference `main_pororo.py:67-68`: cascade implies segment learning
    if cfg.CASCADE_MODEL and not cfg.SEGMENT_LEARNING:
        cfg = cfg.with_updates(SEGMENT_LEARNING=True)
    return cfg
