"""True multi-PROCESS data parallelism (SURVEY §2.8 "TPU-native equivalent"):
two jax.distributed processes (2 CPU devices each, 4 global, gloo
collectives), per-process local input slices assembled into global arrays
via jax.make_array_from_process_local_data.

Four legs, each the exact production code path (VERDICT r2 #3, r4 #5):
  1. split per-step dispatch (d_step + g_step)
  2. the SCAN_STEPS path: one make_scan_steps chunk with K=2 stacked batches
     under P(None, "data") sharding — the leading-K stacking x
     make_array_from_process_local_data interaction that breaks multi-host
     first
  3. distributed checkpoint save -> restore -> continue (auto-resume leg)
  4. centralized multi-host eval: eval_fid2 over per-host-sliced loaders
     runs on process 0 only (full unsliced test set), CSV == the
     single-process walk of the same checkpoint

Asserts: both processes succeed, agree on every metric, all finite, and all
legs match a single-process run of the SAME global batch sequence."""

import json
import math
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _parse(out, tag):
    lines = [l for l in out.splitlines() if l.startswith(tag + " ")]
    assert lines, f"no {tag} line:\n{out[-2000:]}"
    return json.loads(lines[-1][len(tag) + 1 :])


def test_two_process_train_matches_single_process(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_mp_worker.py")
    port = _free_port()
    ckpt_dir = str(tmp_path / "mp_ckpt")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), ckpt_dir],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=repo,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            # 2100 s: cold-cache compiles (~2 min per scan module per worker,
            # single host core, plus leg 4's inception/r2+1d extractors on
            # process 0) fit; warm runs via the shared persistent compilation
            # cache finish in a few minutes
            out, _ = p.communicate(timeout=2100)
            assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()

    step_m = [_parse(o, "MP_METRICS") for o in outs]
    scan_m = [_parse(o, "MP_SCAN_METRICS") for o in outs]
    resume_m = [_parse(o, "MP_RESUME_METRICS") for o in outs]

    for pair in (step_m, scan_m, resume_m):
        assert pair[0].keys() == pair[1].keys()
        for k in pair[0]:
            a, b = np.asarray(pair[0][k]), np.asarray(pair[1][k])
            assert np.all(np.isfinite(a)), f"{k} not finite"
            np.testing.assert_allclose(a, b, rtol=1e-5,
                                       err_msg=f"procs disagree on {k}")

    # ---- single-process reference on the same GLOBAL batch sequence (this
    # pytest process runs on the 8-device virtual CPU mesh; same init key,
    # same step keys as the workers)
    import jax

    from cpcsv_tpu.config import default_config, GanConfig
    from cpcsv_tpu.models import build_models
    from cpcsv_tpu.parallel.mesh import make_mesh, shard_batch
    from cpcsv_tpu.train import create_train_state, make_train_steps
    from cpcsv_tpu.train.steps import make_scan_steps
    from tests._mp_worker import make_global_batches

    cfg = default_config().with_updates(
        CASCADE_MODEL=True,
        SEGMENT_LEARNING=True,
        GAN=GanConfig(CONDITION_DIM=124, Z_DIM=100, DF_DIM=16, GF_DIM=8, GF_SEG_DIM=32),
    )
    B = 4
    mesh = make_mesh("data:4", jax.devices()[:4])
    models = build_models(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), models)
    d_step, g_step = make_train_steps(cfg, models)

    # leg 1
    st_global, im_global = make_global_batches(cfg, B, seed=0)
    st_b = shard_batch(st_global, mesh)
    im_b = shard_batch(im_global, mesh)
    state, d_m = d_step(state, jax.random.PRNGKey(1), st_b, im_b, 4e-4)
    state, g_m = g_step(state, jax.random.PRNGKey(2), st_b, im_b, 1e-4)
    ref = {k: float(np.asarray(v)) for k, v in {**d_m, **g_m}.items()}
    for k, v in ref.items():
        np.testing.assert_allclose(
            step_m[0][k], v, rtol=1e-3, atol=1e-4,
            err_msg=f"2-process metric {k} != single-process",
        )

    # leg 2: scan chunk on the same stacked batches
    K = 2
    pairs = [make_global_batches(cfg, B, seed=10 + j) for j in range(K)]
    stack = lambda ds: {k: np.stack([d[k] for d in ds]) for k in ds[0]}
    st_k = shard_batch(stack([p[0] for p in pairs]), mesh, scan_axis=True)
    im_k = shard_batch(stack([p[1] for p in pairs]), mesh, scan_axis=True)
    scan_steps = make_scan_steps(cfg, models)
    state, sm = scan_steps(state, jax.random.PRNGKey(3), st_k, im_k, 4e-4, 1e-4)
    for k, v in sm.items():
        # rtol 5e-3: the K=2 scan chains two full updates, so step-1's fp32
        # reduction-order differences compound into step-2's metrics
        # (measured ~1.4e-3); sharding bugs show as O(1) mismatches
        np.testing.assert_allclose(
            np.asarray(scan_m[0][k]), np.asarray(v), rtol=5e-3, atol=1e-4,
            err_msg=f"2-process SCAN metric {k} != single-process",
        )

    # leg 3: continue after (identity) save/restore round-trip
    st_g, im_g = make_global_batches(cfg, B, seed=20)
    st_b = shard_batch(st_g, mesh)
    im_b = shard_batch(im_g, mesh)
    state, r_m = d_step(state, jax.random.PRNGKey(4), st_b, im_b, 4e-4)
    for k, v in r_m.items():
        # rtol 2e-2: this is the FIFTH chained update — fp32 reduction-order
        # drift compounds geometrically through GAN updates (measured 1.0e-2
        # here while the two processes agree at 1e-5 and the checkpoint
        # round-trip is asserted BITWISE in the worker). Sharding bugs show
        # as O(1) mismatches.
        np.testing.assert_allclose(
            resume_m[0][k], float(np.asarray(v)), rtol=2e-2, atol=1e-4,
            err_msg=f"2-process RESUME metric {k} != single-process",
        )

    # the distributed checkpoint itself landed on disk
    assert os.path.exists(os.path.join(ckpt_dir, "last_epoch.txt"))

    # ---- leg 4: centralized multi-host eval — process 0 walked, process 1
    # waited; the CSV matches a single-process walk of the SAME checkpoint
    # (same PRNGKey(0) init, same loader content, same rng_seed noise)
    eval_m = _parse(outs[0], "MP_EVAL_FID")
    _parse(outs[1], "MP_EVAL_WAITED")
    assert eval_m["n"] == 1
    row = eval_m["csv"].strip().splitlines()[0].split(",")
    assert int(row[0]) == 0

    from cpcsv_tpu.data.loader import DataLoader
    from cpcsv_tpu.data.synthetic import SyntheticStoryDataset
    from cpcsv_tpu.evaluation.drivers import Infer
    from cpcsv_tpu.train.checkpoint import CheckpointManager

    eval_cfg = cfg.with_updates(MESH_SHAPE="data:1", CONFIG_NAME="mp_eval")
    sp_run = str(tmp_path / "sp_evalrun")
    sp_state = create_train_state(eval_cfg, jax.random.PRNGKey(0), models)
    CheckpointManager(os.path.join(sp_run, "Model")).save(sp_state, 0)
    testloader = DataLoader(
        SyntheticStoryDataset(8, cfg.VIDEO_LEN, seed=9),
        batch_size=4, shuffle=False, drop_last=True,
    )
    ref_eval = Infer(eval_cfg, sp_run).eval_fid2(testloader, epochs=[0],
                                                 batch_size=8)
    np.testing.assert_allclose(
        [float(row[1]), float(row[2])],
        [ref_eval[0]["fid"], ref_eval[0]["vfid"]],
        rtol=1e-3,
        err_msg="2-process centralized eval CSV != single-process walk",
    )
