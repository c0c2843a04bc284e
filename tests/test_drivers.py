"""Inference/eval driver tests: train a tiny run, then drive the Infer
surface — checkpoint loading, folder generation protocol, eval_fid2 CSV,
numbered-png FVD dump (reference inference.py behaviors)."""

import csv
import os

import numpy as np
import pytest

from cpcsv_tpu.evaluation.drivers import Infer
from tests.test_e2e_training import make_loaders, tiny_cfg


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    from cpcsv_tpu.train.trainer import GANTrainer

    tmp = tmp_path_factory.mktemp("run")
    cfg = tiny_cfg(cascade=False)
    out_dir = str(tmp / "run")
    loaders = make_loaders(cfg)
    trainer = GANTrainer(cfg, out_dir, seed=0)
    trainer.train(*loaders)
    return cfg, out_dir, loaders


def test_infer_generate_story_protocol(trained_run):
    cfg, out_dir, (imageloader, storyloader, testloader) = trained_run
    infer = Infer(cfg, out_dir, load_ckpt=1)
    orig_dir, gen_dir = infer.generate_story(testloader, "t")
    stories = sorted(os.listdir(gen_dir))
    assert len(stories) >= 1
    frames = os.listdir(os.path.join(gen_dir, stories[0]))
    assert sorted(frames) == [f"{t}.png" for t in range(cfg.VIDEO_LEN)]
    # original tree mirrors generate tree (reference inference.py:147-199)
    assert sorted(os.listdir(orig_dir)) == sorted(os.listdir(gen_dir))


def test_infer_eval_fid2_csv(trained_run):
    cfg, out_dir, (_, _, testloader) = trained_run
    infer = Infer(cfg, out_dir)
    results = infer.eval_fid2(testloader, epochs=[1], batch_size=8)
    assert len(results) == 1
    assert np.isfinite(results[0]["fid"]) and np.isfinite(results[0]["vfid"])
    csv_path = os.path.join(infer.eval_dir, "fid_score2.csv")
    rows = list(csv.reader(open(csv_path)))
    assert rows[-1][0] == "1"


def test_infer_numbered_png_dump(trained_run):
    cfg, out_dir, (_, _, testloader) = trained_run
    infer = Infer(cfg, out_dir, load_ckpt=1)
    gen_dir, ref_dir = infer.inference_samples(
        testloader, os.path.join(out_dir, "Evaluation", "dump")
    )
    gen_pngs = [f for f in os.listdir(gen_dir) if f.endswith(".png")]
    ref_pngs = [f for f in os.listdir(ref_dir) if f.endswith(".png")]
    assert len(gen_pngs) == len(ref_pngs) > 0
    assert "1.png" in gen_pngs  # numbered protocol (miscc/utils.py:402-428)


def test_infer_eval_is_csv(trained_run):
    """--eval_is walk (extension beyond the reference, which ships
    fid/inception_score.py unwired): CSV row written, result tagged with
    the classifier's random-init status."""
    cfg, out_dir, (_, _, testloader) = trained_run
    infer = Infer(cfg, out_dir)
    results = infer.eval_is(testloader, epochs=[1], batch_size=8, splits=2)
    assert len(results) == 1
    assert np.isfinite(results[0]["is_mean"]) and results[0]["is_mean"] >= 1.0
    assert np.isfinite(results[0]["is_std"])
    assert results[0]["is_random_init"] in (True, False)
    csv_path = os.path.join(infer.eval_dir, "is_score.csv")
    rows = list(csv.reader(open(csv_path)))
    assert rows[-1][0] == "1" and float(rows[-1][1]) == results[0]["is_mean"]
