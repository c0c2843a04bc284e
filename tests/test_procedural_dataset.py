"""Procedural Pororo-protocol dataset (data/procedural.py): artifact
protocol, determinism, and the full pipeline (clip index cache ->
StoryDataset/ImageDataset -> DataLoader -> cascade GANTrainer) running on it
unchanged — the CPU-scale leg of the VERDICT r4 "prove adversarial learning
on real (procedural) data" item; the TPU training run is recorded in
PARITY.md."""

import json
import os
from os.path import join

import numpy as np
import pytest

from cpcsv_tpu.config import CoeffConfig, GanConfig, TrainConfig, default_config
from cpcsv_tpu.data.pororo import (
    ImageDataset,
    StoryDataset,
    VideoFolderDataset,
    _load_npy_dict,
    build_pororo_loaders,
)
from cpcsv_tpu.data.procedural import MIN_LEN, write_procedural_pororo


def _gen(root, n_episodes=6, frames=8, seed=3):
    return write_procedural_pororo(
        str(root), n_episodes=n_episodes, frames_per_episode=frames, seed=seed
    )


def test_procedural_protocol_and_shapes(tmp_path):
    info = _gen(tmp_path / "data")
    root = info["root"]
    assert info["clips"] == 6 * (8 - MIN_LEN)
    assert info["train_clips"] + info["test_clips"] == info["clips"]

    counter = _load_npy_dict(join(root, "frames_counter.npy"))
    base = VideoFolderDataset(root, counter, cache=root, min_len=MIN_LEN,
                              data_type="train")
    # the index cache was written by the UNMODIFIED pororo pipeline
    assert os.path.exists(join(root, f"img_cache{MIN_LEN}.npy"))

    story = StoryDataset(base, root, imsize=64, seed=1)
    item = story[0]
    assert item["images"].shape == (5, 64, 64, 3)
    assert item["images"].min() >= -1.0 and item["images"].max() <= 1.0
    assert item["description"].shape == (5, 356)
    assert item["labels"].shape == (5, 9)
    # labels are a multi-hot of 1..3 characters, constant within an episode
    assert 1 <= item["labels"][0].sum() <= 3
    np.testing.assert_array_equal(item["labels"][0], item["labels"][4])
    # description slots agree with the label (slot c is populated iff char c
    # is present — the conditioning is informative by construction)
    present = item["description"][0][: 9 * 5].reshape(9, 5)[:, 0]
    np.testing.assert_array_equal(present, item["labels"][0])

    image = ImageDataset(base, root, imsize=64, sesize=64, use_segment=True,
                         segment_name="img_segment", seed=2)
    it = image[0]
    assert it["images"].shape == (64, 64, 3)
    assert it["images_seg"].shape == (64, 64, 1)
    assert it["content"].shape == (5, 365)
    # seg is genuine figure-ground: some but not all foreground
    fg = float((it["images_seg"] > 0).mean())
    assert 0.005 < fg < 0.7


def test_procedural_is_deterministic(tmp_path):
    _gen(tmp_path / "a")
    _gen(tmp_path / "b")
    la = _load_npy_dict(join(tmp_path, "a", "labels.npy"))
    lb = _load_npy_dict(join(tmp_path, "b", "labels.npy"))
    assert la.keys() == lb.keys()
    for k in la:
        np.testing.assert_array_equal(la[k], lb[k])
    png = join("ep002", "3.png")
    assert (
        open(join(tmp_path, "a", png), "rb").read()
        == open(join(tmp_path, "b", png), "rb").read()
    )


def test_cascade_trainer_runs_on_procedural_data(tmp_path):
    """Full production path on the procedural dataset: build_pororo_loaders
    (real clip-index/caches), cascade model, one epoch of the GANTrainer —
    finite adversarial metrics and rendered samples."""
    from cpcsv_tpu.train.trainer import GANTrainer

    _gen(tmp_path / "data", n_episodes=6, frames=8)
    cfg = default_config().with_updates(
        CONFIG_NAME="procedural_test",
        DATA_DIR=str(tmp_path / "data"),
        CASCADE_MODEL=True,
        SEGMENT_LEARNING=True,
        MESH_SHAPE="data:1",  # keep the global batch at the per-device size
        SCAN_STEPS=1,
        GAN=GanConfig(CONDITION_DIM=124, Z_DIM=100, DF_DIM=8, GF_DIM=4,
                      GF_SEG_DIM=16),
        TRAIN=TrainConfig(
            FLAG=True,
            IM_BATCH_SIZE=8,
            ST_BATCH_SIZE=4,
            MAX_EPOCH=1,
            SNAPSHOT_INTERVAL=1,
            LR_DECAY_EPOCH=20,
            DISCRIMINATOR_LR=4e-4,
            GENERATOR_LR=1e-4,
            SEGMENT_NAME="img_segment",
            COEFF=CoeffConfig(KL=1.0),
        ),
    )
    imageloader, storyloader, testloader = build_pororo_loaders(cfg, seed=0)
    assert len(storyloader) >= 1 and len(imageloader) >= 1

    out_dir = str(tmp_path / "run")
    trainer = GANTrainer(cfg, out_dir, seed=0)
    state = trainer.train(imageloader, storyloader, testloader)
    assert int(state.step) == len(storyloader)

    rows = [json.loads(l) for l in open(join(out_dir, "log", "metrics.jsonl"))]
    vals = [r["value"] for r in rows if r["tag"] in ("G/loss", "st_D/loss")]
    assert vals and all(np.isfinite(v) for v in vals)
