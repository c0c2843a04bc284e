import os

import pytest

from cpcsv_tpu.config import Config, config_from_file, default_config

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "cpcsv_tpu", "configs")


def test_defaults_match_reference():
    cfg = default_config()
    # defaults from reference miscc/config.py:13-66
    assert cfg.VIDEO_LEN == 5
    assert cfg.LABEL_NUM == 9
    assert cfg.GAN.CONDITION_DIM == 124
    assert cfg.GAN.DF_DIM == 124
    assert cfg.GAN.GF_DIM == 256
    assert cfg.GAN.GF_SEG_DIM == 1024
    assert cfg.TEXT.DIMENSION == 356
    assert cfg.TRAIN.COEFF.KL == 2.0
    assert cfg.CASCADE_MODEL is True
    assert cfg.RECONSTRUCT_LOSS == 1.0


def test_final_yml_parses():
    cfg = config_from_file(os.path.join(CFG_DIR, "final.yml"))
    assert cfg.CONFIG_NAME == "final_model"
    assert cfg.TRAIN.IM_BATCH_SIZE == 90
    assert cfg.TRAIN.ST_BATCH_SIZE == 18
    assert cfg.TRAIN.MAX_EPOCH == 120
    assert cfg.TRAIN.DISCRIMINATOR_LR == 4e-4
    assert cfg.TRAIN.GENERATOR_LR == 1e-4
    assert cfg.TRAIN.COEFF.KL == 1.0
    assert cfg.CASCADE_MODEL is False
    assert cfg.SEGMENT_LEARNING is True
    assert cfg.IMAGE_RATIO == 5.0
    assert cfg.motion_dim == 365


def test_throughput_yml_is_final_at_4x_batch():
    """The throughput preset (PARITY.md per-chip scaling table: 2,761 f/s @
    57% MFU) is final.yml with IM/ST batch x4 and nothing else changed —
    a recipe difference, not a silent hyperparameter drift."""
    final = config_from_file(os.path.join(CFG_DIR, "final.yml"))
    tp = config_from_file(os.path.join(CFG_DIR, "throughput.yml"))
    assert tp.CONFIG_NAME == "throughput"
    assert tp.TRAIN.IM_BATCH_SIZE == 4 * final.TRAIN.IM_BATCH_SIZE == 360
    assert tp.TRAIN.ST_BATCH_SIZE == 4 * final.TRAIN.ST_BATCH_SIZE == 72
    # the measured 2,761 f/s point is the bf16 compute path (fp32 params)
    assert tp.COMPUTE_DTYPE == "bfloat16" and final.COMPUTE_DTYPE == "float32"
    # every shared field must match, not a hand-picked subset — the only
    # deliberate deltas are the preset's name, the bf16 compute path, and
    # the x4 batch sizes (checked above); anything else is silent drift
    import dataclasses

    diff_allowed = {"IM_BATCH_SIZE", "ST_BATCH_SIZE"}
    for k, v in final.TRAIN.__dict__.items():
        if k not in diff_allowed:
            assert getattr(tp.TRAIN, k) == v, f"TRAIN.{k} drifted"
    for f in dataclasses.fields(type(final)):
        if f.name in ("CONFIG_NAME", "COMPUTE_DTYPE", "TRAIN"):
            continue  # documented deltas / TRAIN handled field-by-field
        assert getattr(tp, f.name) == getattr(final, f.name), (
            f"{f.name} drifted from final.yml"
        )


def test_cascade_forces_segment_learning(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text("CASCADE_MODEL: true\nSEGMENT_LEARNING: false\n")
    cfg = config_from_file(str(p))
    assert cfg.SEGMENT_LEARNING is True  # reference main_pororo.py:67-68


def test_unknown_key_raises(tmp_path):
    p = tmp_path / "bad.yml"
    p.write_text("NOT_A_KEY: 1\n")
    with pytest.raises(KeyError):
        config_from_file(str(p))


def test_type_mismatch_raises(tmp_path):
    p = tmp_path / "bad.yml"
    p.write_text("VIDEO_LEN: 'five'\n")
    with pytest.raises(ValueError):
        config_from_file(str(p))


def test_nested_merge(tmp_path):
    p = tmp_path / "n.yml"
    p.write_text("TRAIN:\n  MAX_EPOCH: 3\n")
    cfg = config_from_file(str(p))
    assert cfg.TRAIN.MAX_EPOCH == 3
    assert cfg.TRAIN.IM_BATCH_SIZE == 64  # untouched default


def test_config_is_hashable_static_arg():
    hash(Config())
