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
