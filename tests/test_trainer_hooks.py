"""Trainer hook tests: in-training SSIM + FID/FSD eval hooks on a tiny run
(reference trainer.py:160-185), NET_G warm start."""

import os

import jax
import numpy as np
import pytest

from tests.test_e2e_training import make_loaders, tiny_cfg


def test_ssim_and_vfid_hooks(tmp_path, monkeypatch):
    from cpcsv_tpu.train.trainer import GANTrainer
    from cpcsv_tpu.train import create_train_state
    from tests.conftest import force_no_weights as _force_no_weights

    cfg = tiny_cfg(cascade=False)
    out_dir = str(tmp_path / "run")
    loaders = make_loaders(cfg)
    trainer = GANTrainer(cfg, out_dir, seed=0)
    state = create_train_state(cfg, jax.random.PRNGKey(0), trainer.models)

    ssim = trainer.calculate_ssim(state, 0, loaders[2])
    assert -1.0 <= ssim <= 1.0

    # hermetic: the hook writes real-side stats under ./\.cache, and the
    # random-init assertions below must not see real weights a production
    # host keeps in ~/.cache/cpcsv_tpu/weights
    monkeypatch.chdir(tmp_path)
    _force_no_weights(monkeypatch, tmp_path)
    scores = trainer.calculate_vfid(state, 0, loaders[2])
    assert np.isfinite(scores["fid"]) and np.isfinite(scores["fsd"])
    # no weights findable -> results must be marked random-init
    assert scores["fid_random_init"] is True
    assert scores["fsd_random_init"] is True
    # real-side statistics are cached like the reference (trainer.py:165-169),
    # keyed by a dataset identity tag AND the extractor weights fingerprint
    cached = [
        f
        for f in os.listdir(".cache")
        if f.startswith("seg_story_vfid_reference_score.")
        and f.endswith(".random-init.npz")
    ]
    assert cached, "tagged real-side FSD stats cache was not written"


def test_net_g_warm_start(tmp_path, capsys, recwarn):
    """cfg.NET_G preloads generator weights from a snapshot dir before
    training (reference trainer.py:109-114). The donor snapshot comes from a
    DIFFERENT run: the restored leaves carry that checkpoint's recorded
    sharding, and the warm-started step must still jit (mixed-placement
    regression guard, same class as drivers.load_epoch's legacy branch)."""
    from cpcsv_tpu.train.trainer import GANTrainer

    cfg = tiny_cfg(cascade=False)
    donor_dir = str(tmp_path / "donor")
    loaders = make_loaders(cfg)
    GANTrainer(cfg, donor_dir, seed=0).train(*loaders)
    donor_snap = os.path.join(donor_dir, "Model", "netG_epoch_1")
    assert os.path.isdir(donor_snap)

    warm_cfg = cfg.with_updates(NET_G=donor_snap)
    warm_dir = str(tmp_path / "warm")
    trainer = GANTrainer(warm_cfg, warm_dir, seed=1)
    trainer.train(*make_loaders(warm_cfg))
    assert os.path.isdir(os.path.join(warm_dir, "Model", "netG_epoch_1"))
    # the donor was actually loaded, through the FULL-variables branch: a
    # silent except-fallthrough would miss the print, and a degraded
    # params-only load would have warned (round-3 advisor finding)
    assert f"Load netG from: {donor_snap}" in capsys.readouterr().out
    assert not any(
        "params-only snapshot" in str(w.message) for w in recwarn.list
    ), "warm start fell back to the legacy params-only path"
