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


def test_infer_eval_ssim_walk_csv(trained_run):
    """--eval_ssim walk (extension: the reference ships ssim_score.py but
    leaves its in-train call disabled and wires no offline driver): CSV row
    written, SSIM finite and in [-1, 1]."""
    cfg, out_dir, (_, _, testloader) = trained_run
    infer = Infer(cfg, out_dir)
    results = infer.eval_ssim_walk(testloader, epochs=[1], n=4)
    assert len(results) == 1
    val = results[0]["ssim"]
    assert np.isfinite(val) and -1.0 <= val <= 1.0
    csv_path = os.path.join(infer.eval_dir, "ssim_score.csv")
    rows = list(csv.reader(open(csv_path)))
    assert rows[-1][0] == "1" and float(rows[-1][1]) == val


def test_infer_mesh_sharded_eval_matches_single_device(trained_run):
    """Eval generation shards its batch over cfg.MESH_SHAPE exactly like
    training (TPU-first extension: reference inference.py evaluates on one
    GPU). Sharded and 1-device walks must produce IDENTICAL samples —
    jax.random values depend on logical shapes only and the eval forward
    has no cross-batch reductions (BN uses running stats)."""
    cfg, out_dir, (_, _, testloader) = trained_run
    batch = next(iter(testloader))
    assert np.asarray(batch["images"]).shape[0] % 8 == 0  # divisible: shards

    infer8 = Infer(cfg.with_updates(MESH_SHAPE="data:8"), out_dir,
                   load_ckpt=1, rng_seed=3)
    infer1 = Infer(cfg.with_updates(MESH_SHAPE="data:1"), out_dir,
                   load_ckpt=1, rng_seed=3)
    assert infer8.mesh.size == 8 and infer1.mesh.size == 1
    fake8, _ = infer8.sample_videos_np(batch)
    fake1, _ = infer1.sample_videos_np(batch)
    np.testing.assert_allclose(fake8, fake1, rtol=0, atol=2e-6)

    # the in-memory generator-wrapping dataset (FID/SSIM path) too
    from cpcsv_tpu.evaluation.datasets import StoryGANDataset
    import jax

    ds8 = StoryGANDataset(infer8.net_g, infer8._gen_vars, testloader.dataset,
                          jax.random.PRNGKey(11), cfg.TEXT.DIMENSION,
                          chunk=8, mesh=infer8.mesh)
    ds1 = StoryGANDataset(infer1.net_g, infer1._gen_vars, testloader.dataset,
                          jax.random.PRNGKey(11), cfg.TEXT.DIMENSION,
                          chunk=8, mesh=infer1.mesh)
    np.testing.assert_allclose(ds8[0], ds1[0], rtol=0, atol=2e-6)


def test_infer_oversized_mesh_falls_back_to_local_devices(trained_run):
    """Walking a run trained on MORE chips than this host has (its archived
    setting.yml carries e.g. MESH_SHAPE "data:16") must not crash eval in
    make_mesh's device-count assert — eval sharding is a throughput
    extension, so Infer falls back to the local device set with a warning
    (round-4 review finding)."""
    import jax

    cfg, out_dir, (_, _, testloader) = trained_run
    with pytest.warns(UserWarning, match="falls back"):
        infer = Infer(cfg.with_updates(MESH_SHAPE="data:16"), out_dir,
                      load_ckpt=1, rng_seed=3)
    assert infer.mesh.size == len(jax.devices())  # local fallback
    fake, _ = infer.sample_videos_np(next(iter(testloader)))
    assert np.all(np.isfinite(fake))


def test_infer_load_epoch_legacy_params_only_snapshot(trained_run):
    """Round-1-format snapshots stored ONLY the params pytree. load_epoch
    must fall back to the legacy reader (drivers.load_epoch except-branch),
    warn that BN statistics are borrowed from train_state_last, and still
    yield a usable sampler."""
    cfg, out_dir, (_, _, testloader) = trained_run
    infer = Infer(cfg, out_dir)
    # fabricate a legacy snapshot: bare params tree, no batch_stats/spectral.
    # Removed again in the finally: the trained_run Model dir is MODULE-
    # scoped, and a lingering netG_epoch_97 would become the newest epoch
    # every later default-walk test silently starts from (round-3 advisor).
    infer.ckpt._ckptr.save(
        infer.ckpt._path("netG_epoch_97"), infer._template.gen.params
    )
    try:
        with pytest.warns(UserWarning, match="legacy params-only"):
            infer.load_epoch(97)
        batch = next(iter(testloader))
        fake, _ = infer.sample_videos_np(batch)
        assert fake.shape[1] == cfg.VIDEO_LEN and np.all(np.isfinite(fake))
    finally:
        import shutil

        shutil.rmtree(infer.ckpt._path("netG_epoch_97"))
    assert 97 not in infer.ckpt.available_generator_epochs()


def test_generate_story_clears_stale_trees(trained_run):
    """A previous walk with a LARGER loader must not leak story dirs into
    the next score (documented deviation in generate_story: both trees are
    cleared first; the reference appends into whatever is on disk)."""
    cfg, out_dir, (_, _, testloader) = trained_run
    infer = Infer(cfg, out_dir, load_ckpt=1)
    _, gen_dir = infer.generate_story(testloader, "stale")
    n = len(os.listdir(gen_dir))
    # plant an extra story dir, as an earlier larger walk would leave behind
    stale = os.path.join(gen_dir, str(n + 5))
    os.makedirs(stale)
    with open(os.path.join(stale, "0.png"), "wb") as f:
        f.write(b"not a real frame")
    orig2, gen2 = infer.generate_story(testloader, "stale")
    assert not os.path.exists(stale)
    assert sorted(os.listdir(gen2)) == sorted(str(i) for i in range(n))
    # original tree was rebuilt too (not skipped, not stale)
    assert sorted(os.listdir(orig2)) == sorted(os.listdir(gen2))


def test_infer_eval_fvd_csv(trained_run, monkeypatch, tmp_path):
    """--eval_fvd walk (reference inference.py:128-141): per-epoch
    numbered-png dump -> FVD appended to fvd_score.csv. Runs on the FVD-R
    fallback embedder (no I3D weights in this env; documented deviation) —
    the score is internally consistent and must be finite/non-negative."""
    from cpcsv_tpu.data.loader import DataLoader
    from cpcsv_tpu.data.synthetic import SyntheticStoryDataset
    from cpcsv_tpu.evaluation.weights import RandomInitMetricWarning
    from tests.conftest import force_no_weights

    force_no_weights(monkeypatch, tmp_path)
    cfg, out_dir, _ = trained_run
    # 32 stories x VIDEO_LEN=5 frames = 160 pngs = 16 ten-frame FVD clips
    # per side — the minimum the divisible-by-16 invariant admits
    story = SyntheticStoryDataset(32, cfg.VIDEO_LEN, seed=11)
    loader = DataLoader(story, 8, drop_last=True)
    infer = Infer(cfg, out_dir)
    with pytest.warns(RandomInitMetricWarning):
        results = infer.eval_fvd(loader, epochs=[1], num_of_video=16)
    assert len(results) == 1
    assert np.isfinite(results[0]["fvd"]) and results[0]["fvd"] >= 0.0
    csv_path = os.path.join(infer.eval_dir, "fvd_score.csv")
    rows = list(csv.reader(open(csv_path)))
    assert rows[-1][0] == "1" and float(rows[-1][1]) == results[0]["fvd"]


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


def test_inference_samples_is_centralized(monkeypatch, tmp_path):
    """The --load_ckpt CLI surface reaches inference_samples on EVERY process
    of a multi-host run; non-zero processes must wait at the barrier and
    touch neither the filesystem nor the model (round-5 review finding:
    uncentralized, two hosts race os.remove'ing each other's numbered pngs).
    eval_fvd (already centralized) must keep calling the undecorated
    _inference_samples — a nested barrier would deadlock process 0."""
    from cpcsv_tpu.evaluation import drivers

    barriers = []
    monkeypatch.setattr(drivers, "_walk_barrier", lambda name: barriers.append(name))
    monkeypatch.setattr(drivers.jax, "process_count", lambda: 2)
    monkeypatch.setattr(drivers.jax, "process_index", lambda: 1)

    class UntouchableSelf:
        def __getattribute__(self, k):
            raise AssertionError(f"non-zero process touched self.{k}")

    save = str(tmp_path / "samples")
    out = Infer.inference_samples(UntouchableSelf(), None, save)
    assert out is None
    assert len(barriers) == 1
    assert not os.path.exists(save)
    # the internal body stays undecorated for eval_fvd's in-walk use
    assert not hasattr(Infer._inference_samples, "__wrapped__")
    assert hasattr(Infer.inference_samples, "__wrapped__")
