"""CLI-level end-to-end: drive `main_pororo.main` / `main_clevr.main` the way
a user does (argv -> YAML parse -> loaders -> trainer dispatch -> artifacts).

The trainer itself is covered by test_e2e_training; what only these tests
lock is the CLI plumbing — argv parsing, --max_epoch override, --debug
output-dir routing, --synthetic loader sizing (batch x mesh devices), and
`--continue_ckpt auto` resume THROUGH the CLI (reference protocol
`main_pororo.py:29-43,123-142`).
"""

import os

import pytest

TINY_YAML = """\
CONFIG_NAME: 'cli_e2e'
CASCADE_MODEL: false
SEGMENT_LEARNING: true
MESH_SHAPE: 'data:2'
TRAIN:
    FLAG: true
    IM_BATCH_SIZE: 2
    ST_BATCH_SIZE: 2
    MAX_EPOCH: 1
    SNAPSHOT_INTERVAL: 1
GAN:
    CONDITION_DIM: 124
    DF_DIM: 8
    GF_DIM: 4
    GF_SEG_DIM: 16
"""


@pytest.fixture()
def cli_cwd(tmp_path, monkeypatch):
    yml = tmp_path / "tiny.yml"
    yml.write_text(TINY_YAML)
    monkeypatch.chdir(tmp_path)  # --debug writes to ./output/debug
    return str(yml)


def test_pororo_cli_train_and_auto_resume(cli_cwd):
    from cpcsv_tpu.cli.main_pororo import main

    main(["--cfg", cli_cwd, "--synthetic", "8", "--max_epoch", "1", "--debug"])
    model_dir = os.path.join("output", "debug", "Model")
    assert os.path.isdir(os.path.join(model_dir, "netG_epoch_0"))
    assert os.path.isdir(os.path.join(model_dir, "netG_epoch_1"))
    assert os.path.isdir(os.path.join(model_dir, "train_state_last"))
    with open(os.path.join(model_dir, "last_epoch.txt")) as f:
        assert f.read().strip() == "0"  # completed-epoch semantics
    # run-dir self-archive (reference trainer.py:55-61)
    assert os.path.exists(os.path.join("output", "debug", "setting.yml"))
    assert os.path.exists(os.path.join("output", "debug", "log", "metrics.jsonl"))

    # CLI auto-resume: extends the finished run by one epoch
    main(["--cfg", cli_cwd, "--synthetic", "8", "--max_epoch", "2",
          "--continue_ckpt", "auto", "--debug"])
    assert os.path.isdir(os.path.join(model_dir, "netG_epoch_2"))
    with open(os.path.join(model_dir, "last_epoch.txt")) as f:
        assert f.read().strip() == "1"

    # --eval_is checkpoint walk over the run just trained (CLI extension;
    # the reference never wires its fid/inception_score.py to a driver)
    main(["--cfg", cli_cwd, "--synthetic", "8", "--eval_is", "--debug"])
    with open(os.path.join("output", "debug", "Evaluation", "cli_e2e",
                           "is_score.csv")) as f:
        rows = [r.split(",") for r in f.read().strip().splitlines()]
    # newest-first walk over epochs 0..2; every row is [epoch, mean, std]
    assert [r[0] for r in rows] == ["2", "1", "0"]
    assert all(float(r[1]) >= 1.0 for r in rows)

    # --eval_ssim checkpoint walk (CLI extension; the reference ships
    # ssim_score.py but leaves its in-train call disabled)
    main(["--cfg", cli_cwd, "--synthetic", "8", "--eval_ssim", "--debug"])
    with open(os.path.join("output", "debug", "Evaluation", "cli_e2e",
                           "ssim_score.csv")) as f:
        rows = [r.split(",") for r in f.read().strip().splitlines()]
    assert [r[0] for r in rows] == ["2", "1", "0"]
    assert all(-1.0 <= float(r[1]) <= 1.0 for r in rows)


def test_clevr_cli_smoke(cli_cwd):
    """CLEVR CLI: 4-frame stories via the same dispatch (reference
    main_clevr.py:39-139). VIDEO_LEN comes from the config."""
    from cpcsv_tpu.cli.main_clevr import main

    main(["--cfg", cli_cwd, "--synthetic", "8", "--max_epoch", "1", "--debug"])
    assert os.path.isdir(os.path.join("output", "debug", "Model", "netG_epoch_1"))

    # eval walk through the CLEVR CLI (round-3 parity gap: it stopped at
    # --eval_fid; the dispatch ladder is now shared with the Pororo CLI)
    main(["--cfg", cli_cwd, "--synthetic", "8", "--eval_ssim", "--debug"])
    with open(os.path.join("output", "debug", "Evaluation", "cli_e2e",
                           "ssim_score.csv")) as f:
        rows = [r.split(",") for r in f.read().strip().splitlines()]
    assert [r[0] for r in rows] == ["1", "0"]
    assert all(-1.0 <= float(r[1]) <= 1.0 for r in rows)


def test_cli_flag_surface_parity():
    """Both CLIs expose the identical eval surface (reference
    main_clevr.py:49-50 has --eval_fid/--eval_fvd; --eval_is/--eval_ssim
    are the shared extensions) and the same dispatch precedence."""
    from cpcsv_tpu.cli import main_clevr, main_pororo

    for mod in (main_pororo, main_clevr):
        args = mod.parse_args(["--eval_fvd", "1"])
        assert args.eval_fvd is True
        for flag in ("eval_fid", "eval_is", "eval_ssim"):
            assert getattr(args, flag) is False
        assert mod.parse_args(["--eval_fvd", "0"]).eval_fvd is False
        assert mod.parse_args(["--load_ckpt", "3"]).load_ckpt == "3"
        # reference compat: --gpu is parsed (main_pororo.py:37) but never
        # consumed there (num_gpu reads cfg.GPU_ID from YAML only) — a
        # migrating command line must not die on argparse
        assert mod.parse_args(["--gpu", "0,1"]).gpu_id == "0,1"
        # reference --debug takes a value (no type at main_pororo.py:31);
        # both the reference form and the bare switch must parse
        assert mod.parse_args(["--debug", "1"]).debug is True
        assert mod.parse_args(["--debug"]).debug is True
        assert mod.parse_args([]).debug is False


def test_dispatch_precedence(monkeypatch):
    """The shared branch ladder is mutually exclusive with the reference's
    precedence (main_pororo.py:152-171): eval_fid > eval_fvd > eval_is >
    eval_ssim > load_ckpt > train. When several flags are set, only the
    highest-precedence driver method runs."""
    import argparse

    from cpcsv_tpu.cli import dispatch as dmod

    calls = []

    class FakeInfer:
        def __init__(self, cfg, output_dir, load_ckpt=None):
            if load_ckpt is not None:
                calls.append(("load_ckpt", load_ckpt))

        def __getattr__(self, name):
            return lambda *a, **k: calls.append((name,))

    monkeypatch.setattr(
        "cpcsv_tpu.evaluation.drivers.Infer", FakeInfer, raising=True
    )

    def ns(**kw):
        base = dict(eval_fid=False, eval_fvd=False, eval_is=False,
                    eval_ssim=False, load_ckpt=None, cfg_file="x.yml",
                    continue_ckpt=None, manualSeed=0)
        base.update(kw)
        return argparse.Namespace(**base)

    dmod.dispatch(None, ns(eval_fid=True, eval_fvd=True, load_ckpt="7"),
                  "out", None, None, None)
    assert calls == [("eval_fid2",)]
    calls.clear()
    dmod.dispatch(None, ns(eval_fvd=True, eval_ssim=True), "out",
                  None, None, None)
    assert calls == [("eval_fvd",)]
    calls.clear()
    dmod.dispatch(None, ns(load_ckpt="7"), "out", None, None, None)
    assert calls == [("load_ckpt", "7"), ("inference_samples",)]
