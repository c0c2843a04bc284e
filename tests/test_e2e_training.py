"""End-to-end slice: CLI-level training on synthetic data for 1 epoch with a
tiny model, checkpoint written, resume works, samples rendered. This is the
config -> data -> G -> 3 Ds -> losses -> optim -> ckpt -> logging path."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpcsv_tpu.config import GanConfig, TrainConfig, CoeffConfig, default_config
from cpcsv_tpu.data.loader import DataLoader
from cpcsv_tpu.data.synthetic import SyntheticImageDataset, SyntheticStoryDataset
from cpcsv_tpu.train.trainer import GANTrainer, lr_at_epoch


def tiny_cfg(cascade=False):
    return default_config().with_updates(
        CONFIG_NAME="e2e_test",
        CASCADE_MODEL=cascade,
        SEGMENT_LEARNING=True,
        GAN=GanConfig(CONDITION_DIM=124, Z_DIM=100, DF_DIM=8, GF_DIM=4, GF_SEG_DIM=16),
        TRAIN=TrainConfig(
            FLAG=True,
            IM_BATCH_SIZE=8,
            ST_BATCH_SIZE=8,
            MAX_EPOCH=1,
            SNAPSHOT_INTERVAL=1,
            LR_DECAY_EPOCH=20,
            DISCRIMINATOR_LR=4e-4,
            GENERATOR_LR=1e-4,
            SEGMENT_NAME="img_segment",
            COEFF=CoeffConfig(KL=1.0),
        ),
    )


def make_loaders(cfg, n=16):
    story = SyntheticStoryDataset(n, cfg.VIDEO_LEN)
    image = SyntheticImageDataset(n * 2, cfg.VIDEO_LEN, use_segment=True)
    test = SyntheticStoryDataset(8, cfg.VIDEO_LEN, seed=9)
    return (
        DataLoader(image, cfg.TRAIN.IM_BATCH_SIZE, shuffle=True, drop_last=True),
        DataLoader(story, cfg.TRAIN.ST_BATCH_SIZE, shuffle=True, drop_last=True),
        DataLoader(test, cfg.TRAIN.ST_BATCH_SIZE, drop_last=True),
    )


def test_lr_schedule_matches_reference():
    """halve at 20, interval doubles: next at 60 (20+40), then 140
    (reference trainer.py:447-456: e%step==0 with step doubling)."""
    base = 1e-4
    # reference halves at the END of epoch e%step==0 (trainer.py:447-456):
    # epoch 20 still trains at base; the halving first applies at 21.
    assert lr_at_epoch(base, 0, 20) == base
    assert lr_at_epoch(base, 20, 20) == base
    assert lr_at_epoch(base, 21, 20) == base * 0.5
    assert lr_at_epoch(base, 40, 20) == base * 0.5
    assert lr_at_epoch(base, 41, 20) == base * 0.25
    assert lr_at_epoch(base, 81, 20) == base * 0.125


def test_train_one_epoch_and_resume(tmp_path):
    cfg = tiny_cfg(cascade=False)
    out_dir = str(tmp_path / "run")
    imageloader, storyloader, testloader = make_loaders(cfg)

    trainer = GANTrainer(cfg, out_dir, seed=0)
    state = trainer.train(imageloader, storyloader, testloader)
    assert int(state.step) == len(storyloader)

    # checkpoints exist (netG per-snapshot + full state)
    model_dir = os.path.join(out_dir, "Model")
    names = os.listdir(model_dir)
    assert any(n.startswith("netG_epoch_") for n in names)
    assert "train_state_last" in names

    # metrics were logged with the reference tag names
    log_file = os.path.join(out_dir, "log", "metrics.jsonl")
    tags = {json.loads(l)["tag"] for l in open(log_file)}
    assert {"st_D/loss", "img_D/loss", "G/loss", "learning/generator"} <= tags

    # epoch sample grid rendered
    assert any(f.startswith("pororo") for f in os.listdir(os.path.join(out_dir, "log")))

    # resume from epoch 1
    trainer2 = GANTrainer(cfg, out_dir, continue_ckpt=1, seed=0)
    cfg2 = cfg.with_updates(
        TRAIN=cfg.TRAIN.__class__(**{**cfg.TRAIN.__dict__, "MAX_EPOCH": 2})
    )
    trainer2.cfg = cfg2
    trainer2.max_epoch = 2
    state2 = trainer2.train(imageloader, storyloader, testloader)
    # restored step counter + one more epoch of steps
    assert int(state2.step) == 2 * len(storyloader)


def test_auto_resume_skips_completed_epoch(tmp_path):
    """continue_ckpt='auto' must resume AFTER the last saved epoch (the
    snapshot is written once that epoch completed); it used to re-train it."""
    cfg = tiny_cfg(cascade=False)
    out_dir = str(tmp_path / "run_auto")
    imageloader, storyloader, testloader = make_loaders(cfg)

    trainer = GANTrainer(cfg, out_dir, seed=0)
    state = trainer.train(imageloader, storyloader, testloader)
    steps_per_epoch = len(storyloader)
    assert int(state.step) == steps_per_epoch  # 1 epoch trained

    # same max_epoch: everything already trained -> auto-resume is a no-op
    trainer2 = GANTrainer(cfg, out_dir, continue_ckpt="auto", seed=0)
    state2 = trainer2.train(imageloader, storyloader, testloader)
    assert int(state2.step) == steps_per_epoch  # no duplicated epoch


def test_auto_resume_reproduces_uninterrupted_run(tmp_path):
    """Resume-exact randomness: every epoch's jax/numpy streams derive from
    (seed, epoch) (trainer fold_in + DataLoader.set_epoch), so training
    epochs 0..2 straight and training 0..1 then auto-resuming epoch 2 must
    yield IDENTICAL final parameters — the resumed run can no longer replay
    epoch-0's already-consumed noise keys and shuffle permutations."""
    cfg3 = tiny_cfg(cascade=False)
    cfg3 = cfg3.with_updates(
        TRAIN=cfg3.TRAIN.__class__(**{**cfg3.TRAIN.__dict__, "MAX_EPOCH": 3})
    )
    cfg2 = cfg3.with_updates(
        TRAIN=cfg3.TRAIN.__class__(**{**cfg3.TRAIN.__dict__, "MAX_EPOCH": 2})
    )

    straight = GANTrainer(cfg3, str(tmp_path / "straight"), seed=0)
    state_straight = straight.train(*_fresh_loaders(cfg3))

    out2 = str(tmp_path / "resumed")
    GANTrainer(cfg2, out2, seed=0).train(*_fresh_loaders(cfg2))
    resumed = GANTrainer(cfg3, out2, continue_ckpt="auto", seed=0)
    state_resumed = resumed.train(*_fresh_loaders(cfg3))

    assert int(state_resumed.step) == int(state_straight.step)
    for a, b in zip(
        jax.tree.leaves(state_straight.gen.params),
        jax.tree.leaves(state_resumed.gen.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(state_straight.d_st.params),
        jax.tree.leaves(state_resumed.d_st.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _fresh_loaders(cfg):
    # fresh loader objects per run: a resumed process starts with fresh
    # iterator state too, and the equality must not depend on shared ones
    return make_loaders(cfg)


def test_checkpoint_survives_crash_during_save(tmp_path):
    """Crash-safety (found by the round-3 dress rehearsal): Orbax force=True
    deletes the existing train_state_last before writing its replacement, so
    a kill mid-save used to lose the ONLY full train state. The
    stage-and-swap save must leave a restorable checkpoint at every instant,
    and restore() must fall back to the .new/.old siblings."""

    from cpcsv_tpu.models import build_models
    from cpcsv_tpu.train.checkpoint import CheckpointManager
    from cpcsv_tpu.train.state import create_train_state

    cfg = tiny_cfg(cascade=False)
    models = build_models(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), models)
    ckpt = CheckpointManager(str(tmp_path / "Model"))
    ckpt.save(state, 0)
    model_dir = str(tmp_path / "Model")
    assert os.path.exists(os.path.join(model_dir, "train_state_last"))
    # no leftover staging/old dirs after a clean save
    assert not os.path.exists(os.path.join(model_dir, "train_state_last.new"))
    assert not os.path.exists(os.path.join(model_dir, "train_state_last.old"))

    # simulate "crashed between final->old and staging->final": only .old
    os.rename(
        os.path.join(model_dir, "train_state_last"),
        os.path.join(model_dir, "train_state_last.old"),
    )
    template = create_train_state(cfg, jax.random.PRNGKey(9), models)
    with pytest.warns(UserWarning, match="crash during save"):
        restored = ckpt.restore(template)
    a = np.asarray(jax.tree.leaves(state.gen.params)[0])
    b = np.asarray(jax.tree.leaves(restored.gen.params)[0])
    np.testing.assert_array_equal(a, b)

    # simulate "crashed after staging finalized, before swap": only .new
    os.rename(
        os.path.join(model_dir, "train_state_last.old"),
        os.path.join(model_dir, "train_state_last.new"),
    )
    with pytest.warns(UserWarning, match="crash during save"):
        restored2 = ckpt.restore(template)
    np.testing.assert_array_equal(
        a, np.asarray(jax.tree.leaves(restored2.gen.params)[0])
    )

    # a second save on top of the leftovers still works and cleans up
    os.rename(
        os.path.join(model_dir, "train_state_last.new"),
        os.path.join(model_dir, "train_state_last"),
    )
    ckpt.save(state, 1)
    assert os.path.exists(os.path.join(model_dir, "train_state_last"))
    assert not os.path.exists(os.path.join(model_dir, "train_state_last.new"))
    assert not os.path.exists(os.path.join(model_dir, "train_state_last.old"))


def test_generator_snapshot_overwrite_is_crash_safe(tmp_path):
    """netG_epoch_{E} snapshots get the same stage-and-swap treatment as the
    full state: overwriting an existing epoch (finished-run re-run,
    --continue_ckpt E retrain, the run importer) must never have a window
    where the only copy of that epoch's eval snapshot is deleted."""
    ckpt, model_dir, state_a, state_b, template = _two_saved_states(tmp_path)
    ckpt.save(state_a, 2)
    ckpt.save(state_b, 2)  # overwrite the same epoch
    assert not os.path.exists(os.path.join(model_dir, "netG_epoch_2.new"))
    assert not os.path.exists(os.path.join(model_dir, "netG_epoch_2.old"))
    got = ckpt.restore_generator(template.gen.variables(), 2)
    np.testing.assert_array_equal(
        _first_param(state_b), np.asarray(jax.tree.leaves(got["params"])[0])
    )

    # crash between the two renames: data survives in .old, walks still see
    # the epoch, and restore recovers it with a warning
    os.rename(
        os.path.join(model_dir, "netG_epoch_2"),
        os.path.join(model_dir, "netG_epoch_2.old"),
    )
    assert ckpt.available_generator_epochs() == [2]
    with pytest.warns(UserWarning, match="snapshot swap"):
        got2 = ckpt.restore_generator(template.gen.variables(), 2)
    np.testing.assert_array_equal(
        _first_param(state_b), np.asarray(jax.tree.leaves(got2["params"])[0])
    )

    # the next save on top of the remnant works and cleans up
    ckpt.save(state_a, 2)
    assert not os.path.exists(os.path.join(model_dir, "netG_epoch_2.old"))
    got3 = ckpt.restore_generator(template.gen.variables(), 2)
    np.testing.assert_array_equal(
        _first_param(state_a), np.asarray(jax.tree.leaves(got3["params"])[0])
    )


def _two_saved_states(tmp_path):
    from cpcsv_tpu.models import build_models
    from cpcsv_tpu.train.checkpoint import CheckpointManager
    from cpcsv_tpu.train.state import create_train_state

    cfg = tiny_cfg(cascade=False)
    models = build_models(cfg)
    state_a = create_train_state(cfg, jax.random.PRNGKey(0), models)
    state_b = create_train_state(cfg, jax.random.PRNGKey(5), models)
    template = create_train_state(cfg, jax.random.PRNGKey(9), models)
    ckpt = CheckpointManager(str(tmp_path / "Model"))
    return ckpt, str(tmp_path / "Model"), state_a, state_b, template


def _first_param(state):
    return np.asarray(jax.tree.leaves(state.gen.params)[0])


def test_crash_windows_resume_exactly(tmp_path):
    """The completed-epoch label lives INSIDE each checkpoint (it travels
    atomically with the rename), so after a crash at ANY point of the save
    protocol, restore() and last_epoch() agree on the same best state and
    auto-resume is exact — no window where the marker file describes a
    different sibling than the one restored (the round-3 review finding)."""
    import shutil

    ckpt, model_dir, state_a, state_b, template = _two_saved_states(tmp_path)

    # window 1: crash AFTER the labeled staging completed, BEFORE rotation:
    # final = epoch-0 state, .new = epoch-1 state (label 1). The newer .new
    # must win — last_epoch()=1 and restore() return the state whose updates
    # epoch 1 already produced, so resume trains epoch 2 next.
    ckpt.save(state_a, 0)
    final = os.path.join(model_dir, "train_state_last")
    shutil.copytree(final, final + ".keep_a")
    ckpt.save(state_b, 1)
    os.rename(final, final + ".new")
    os.rename(final + ".keep_a", final)
    assert ckpt.last_epoch() == 1
    with pytest.warns(UserWarning, match="crash during save"):
        restored = ckpt.restore(template)
    np.testing.assert_array_equal(_first_param(state_b), _first_param(restored))
    shutil.rmtree(final + ".new")

    # window 2: crash AFTER rotation, BEFORE the advisory marker write:
    # final = epoch-1 state (label 1), .old = epoch-0 state (label 0), but
    # last_epoch.txt still says 0. The embedded label must override the stale
    # marker — resuming at 1 on a state that contains epoch-1's updates would
    # double-apply them.
    shutil.copytree(final, final + ".old_src")
    ckpt.save(state_b, 1)
    os.rename(final + ".old_src", final + ".old")
    with open(os.path.join(model_dir, "last_epoch.txt"), "w") as f:
        f.write("0")  # stale marker, as a crash-before-marker-write leaves it
    assert ckpt.last_epoch() == 1  # embedded label wins
    restored2 = ckpt.restore(template)
    np.testing.assert_array_equal(_first_param(state_b), _first_param(restored2))


def test_equal_label_tie_prefers_final(tmp_path):
    """Retraining an epoch (--continue_ckpt E, or re-running a finished run)
    can leave `final` and `.old` with the SAME completed-epoch label after a
    crash before the .old cleanup. The tie must go to `final` (the current
    save) without a spurious 'crash during save' warning — preferring the
    sibling would silently discard the retrained epoch's updates."""
    import shutil
    import warnings as warnings_mod

    ckpt, model_dir, state_a, state_b, template = _two_saved_states(tmp_path)
    final = os.path.join(model_dir, "train_state_last")

    ckpt.save(state_a, 1)
    shutil.copytree(final, str(tmp_path / "keep_a"))
    ckpt.save(state_b, 1)  # same completed epoch: a retrain
    os.rename(str(tmp_path / "keep_a"), final + ".old")
    assert ckpt.last_epoch() == 1
    with warnings_mod.catch_warnings(record=True) as caught:
        warnings_mod.simplefilter("always")
        restored = ckpt.restore(template)
    assert not any("crash during save" in str(w.message) for w in caught)
    np.testing.assert_array_equal(_first_param(state_b), _first_param(restored))


def test_labeled_staging_remnant_promoted_not_deleted(tmp_path):
    """A labeled `.new` left by a crash may be the state the run RESUMED from
    (restore prefers the highest label). The next save must promote it to
    `final` before writing its replacement — deleting it outright would make
    a second crash during that save lose the epochs it holds."""
    import shutil

    from cpcsv_tpu.train.checkpoint import CheckpointManager

    ckpt, model_dir, state_a, state_b, template = _two_saved_states(tmp_path)
    final = os.path.join(model_dir, "train_state_last")

    # fabricate: final = epoch-0 state, .new = labeled epoch-1 crash remnant
    ckpt.save(state_a, 0)
    shutil.copytree(final, str(tmp_path / "keep_a"))
    ckpt.save(state_b, 1)
    os.rename(final, final + ".new")
    os.rename(str(tmp_path / "keep_a"), final)

    # simulate a crash DURING the next save's Orbax write: promotion must
    # already have happened, so the best state on disk is still epoch 1
    real_save = ckpt._ckptr.save

    def boom(*a, **k):
        raise RuntimeError("simulated crash mid-save")

    ckpt._ckptr.save = boom
    with pytest.raises(RuntimeError, match="simulated crash"):
        ckpt._save_state_atomic(state_a, 2)
    ckpt._ckptr.save = real_save

    assert ckpt.last_epoch() == 1
    fresh = CheckpointManager(model_dir)
    restored = fresh.restore(template)
    np.testing.assert_array_equal(_first_param(state_b), _first_param(restored))


def test_restore_retries_when_sibling_renamed_away(tmp_path):
    """A concurrent saver can rename the chosen sibling mid-read (eval CLI
    restoring while the trainer rotates). restore() must re-resolve and
    retry instead of dying on FileNotFoundError."""
    ckpt, model_dir, state_a, state_b, template = _two_saved_states(tmp_path)
    ckpt.save(state_a, 0)

    real_restore = ckpt._ckptr.restore
    calls = {"n": 0}

    def flaky(path, item=None):
        calls["n"] += 1
        if calls["n"] == 1:
            raise FileNotFoundError(path)
        return real_restore(path, item=item)

    ckpt._ckptr.restore = flaky
    restored = ckpt.restore(template)
    ckpt._ckptr.restore = real_restore
    assert calls["n"] == 2
    np.testing.assert_array_equal(_first_param(state_a), _first_param(restored))


def test_crash_fallback_legacy_unlabeled_prefers_old(tmp_path):
    """Pre-label checkpoint dirs (round-3 early format: no COMPLETED_EPOCH
    file) keep the conservative fallback: final > .old > .new, since without
    labels .new cannot be proven newer than the marker's state."""
    import shutil

    ckpt, model_dir, state_a, state_b, template = _two_saved_states(tmp_path)

    final = os.path.join(model_dir, "train_state_last")
    ckpt.save(state_a, 0)
    shutil.copytree(final, str(tmp_path / "keep_a"))  # save(b) rotates a away
    ckpt.save(state_b, 1)
    os.rename(final, final + ".new")
    os.rename(str(tmp_path / "keep_a"), final + ".old")
    # strip the labels to simulate the legacy on-disk format
    for sib in ("train_state_last.old", "train_state_last.new"):
        label = os.path.join(model_dir, sib, "COMPLETED_EPOCH")
        if os.path.exists(label):
            os.remove(label)
    with pytest.warns(UserWarning, match="crash during save"):
        restored = ckpt.restore(template)
    np.testing.assert_array_equal(_first_param(state_a), _first_param(restored))


def test_restore_casts_adam_mu_dtype(tmp_path):
    """Flipping cfg.ADAM_MU_DTYPE between runs must not smuggle the on-disk
    dtype into the restored state (a bf16 mu in an fp32 program changes the
    jitted step's carry types and fails scan compilation)."""
    from cpcsv_tpu.models import build_models
    from cpcsv_tpu.train.checkpoint import CheckpointManager
    from cpcsv_tpu.train.state import create_train_state

    cfg_bf = tiny_cfg(cascade=False).with_updates(
        ADAM_MU_DTYPE="bfloat16"
    )
    cfg_fp = tiny_cfg(cascade=False)
    models = build_models(cfg_fp)
    state_bf = create_train_state(cfg_bf, jax.random.PRNGKey(0), models)
    assert any(
        l.dtype == jnp.bfloat16 for l in jax.tree.leaves(state_bf.gen.opt_state)
    )
    ckpt = CheckpointManager(str(tmp_path / "Model"))
    ckpt.save(state_bf, 0)

    template = create_train_state(cfg_fp, jax.random.PRNGKey(9), models)
    restored = ckpt.restore(template)
    for t, x in zip(jax.tree.leaves(template), jax.tree.leaves(restored)):
        if hasattr(t, "dtype"):
            assert x.dtype == t.dtype, f"restored {x.dtype} != template {t.dtype}"


def test_trainer_rejects_pallas_bn_on_multidevice_mesh(tmp_path):
    """BN_BACKEND='pallas' is single-device only (Mosaic custom calls carry
    no GSPMD partitioning rule); the trainer must fail loudly instead of
    silently replicating every BN's activations across the mesh."""
    cfg = tiny_cfg(cascade=False).with_updates(BN_BACKEND="pallas")
    assert jax.device_count() > 1  # conftest's 8-device virtual CPU mesh
    with pytest.raises(ValueError, match="single-device"):
        GANTrainer(cfg, str(tmp_path / "run_pallas_mesh"), seed=0)


def test_trainer_rejects_pallas_dfn_on_multidevice_mesh(tmp_path, monkeypatch):
    """USE_PALLAS (the generator's Pallas DFN kernel) hits the same
    no-GSPMD-rule wall as BN_BACKEND='pallas': the trainer must fail loudly
    on a multi-device mesh. The kernel only engages on the TPU backend
    (pallas_dfn_active), so fake that; on CPU the flag is inert and a
    multi-device mesh must stay ALLOWED (second half)."""
    monkeypatch.delenv("CPCSV_USE_PALLAS", raising=False)
    cfg = tiny_cfg(cascade=False).with_updates(USE_PALLAS=True)
    with monkeypatch.context() as m:
        m.setattr(jax, "default_backend", lambda: "tpu")
        with pytest.raises(ValueError, match="single-device"):
            GANTrainer(cfg, str(tmp_path / "run_dfn_mesh"), seed=0)
    # backend cpu -> kernel never dispatches -> guard must not trip
    GANTrainer(cfg, str(tmp_path / "run_dfn_mesh_cpu"), seed=0)


def test_invalid_backend_knobs_fail_loudly():
    """A typo'd A/B knob must not silently measure the default arm."""
    from cpcsv_tpu.ops.blocks import make_batchnorm
    from cpcsv_tpu.train.state import make_adam

    with pytest.raises(ValueError, match="BN_BACKEND"):
        make_batchnorm(backend="Pallas")
    cfg = default_config().with_updates(ADAM_MU_DTYPE="bf16")
    with pytest.raises(ValueError, match="ADAM_MU_DTYPE"):
        make_adam(cfg)


def test_auto_resume_extends_finished_run_without_skipping(tmp_path):
    """Re-running a FINISHED run with a raised MAX_EPOCH must train every new
    epoch: the end-of-run save keeps the reference netG_epoch_{MAX_EPOCH}
    snapshot name but records completed=MAX_EPOCH-1 in last_epoch.txt, so
    auto-resume picks up at old MAX_EPOCH (not old MAX_EPOCH+1, which would
    silently skip one epoch and shift the LR schedule)."""
    cfg = tiny_cfg(cascade=False)
    out_dir = str(tmp_path / "run_extend")
    imageloader, storyloader, testloader = make_loaders(cfg)

    trainer = GANTrainer(cfg, out_dir, seed=0)
    state = trainer.train(imageloader, storyloader, testloader)
    steps_per_epoch = len(storyloader)
    assert int(state.step) == steps_per_epoch  # epochs: just 0

    # final save wrote the reference-named snapshot one past the last epoch
    model_dir = os.path.join(out_dir, "Model")
    assert os.path.exists(os.path.join(model_dir, "netG_epoch_1"))
    # ...but last_epoch.txt records the last COMPLETED epoch
    assert open(os.path.join(model_dir, "last_epoch.txt")).read().strip() == "0"

    new_max = 3
    cfg2 = cfg.with_updates(
        TRAIN=cfg.TRAIN.__class__(**{**cfg.TRAIN.__dict__, "MAX_EPOCH": new_max})
    )
    trainer2 = GANTrainer(cfg2, out_dir, continue_ckpt="auto", seed=0)
    state2 = trainer2.train(imageloader, storyloader, testloader)
    # epochs 1 and 2 trained on top of the restored epoch 0 — none skipped
    assert int(state2.step) == new_max * steps_per_epoch
