"""True multi-PROCESS data parallelism (SURVEY §2.8 "TPU-native equivalent"):
two jax.distributed processes (2 CPU devices each, 4 global, gloo
collectives), per-process local input slices assembled into global arrays
via jax.make_array_from_process_local_data, one full D+G train step.

Asserts: both processes succeed, agree on every metric, all finite, and the
metrics match a single-process run of the SAME global batch (the gradient
psum over processes must reproduce the sequential program)."""

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


def test_two_process_train_step_matches_single_process():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_mp_worker.py")
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=repo,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
        outs.append(out)

    metrics = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("MP_METRICS ")]
        assert lines, f"no metrics line:\n{out[-2000:]}"
        metrics.append(json.loads(lines[-1][len("MP_METRICS "):]))

    assert metrics[0].keys() == metrics[1].keys()
    for k in metrics[0]:
        a, b = metrics[0][k], metrics[1][k]
        assert math.isfinite(a), f"{k} not finite"
        np.testing.assert_allclose(a, b, rtol=1e-5, err_msg=f"procs disagree on {k}")

    # single-process reference on the same GLOBAL batch (this pytest process
    # runs on the 8-device virtual CPU mesh; same init key, same step keys)
    import jax

    from cpcsv_tpu.config import default_config, GanConfig
    from cpcsv_tpu.models import build_models
    from cpcsv_tpu.parallel.mesh import make_mesh, shard_batch
    from cpcsv_tpu.train import create_train_state, make_train_steps

    cfg = default_config().with_updates(
        CASCADE_MODEL=True,
        SEGMENT_LEARNING=True,
        GAN=GanConfig(CONDITION_DIM=124, Z_DIM=100, DF_DIM=16, GF_DIM=8, GF_SEG_DIM=32),
    )
    B, T = 4, cfg.VIDEO_LEN
    rng = np.random.default_rng(0)
    st_global = {
        "images": rng.standard_normal((B, T, 64, 64, 3)).astype(np.float32),
        "description": rng.standard_normal((B, T, 356)).astype(np.float32),
        "labels": (rng.random((B, T, 9)) < 0.3).astype(np.float32),
    }
    im_global = {
        "images": rng.standard_normal((B, 64, 64, 3)).astype(np.float32),
        "description": rng.standard_normal((B, 356)).astype(np.float32),
        "labels": (rng.random((B, 9)) < 0.3).astype(np.float32),
        "content": rng.standard_normal((B, T, 356)).astype(np.float32),
        "images_seg": rng.standard_normal((B, 64, 64, 1)).astype(np.float32),
    }
    mesh = make_mesh("data:4", jax.devices()[:4])
    models = build_models(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), models)
    d_step, g_step = make_train_steps(cfg, models)
    st_b = shard_batch(st_global, mesh)
    im_b = shard_batch(im_global, mesh)
    state, d_m = d_step(state, jax.random.PRNGKey(1), st_b, im_b, 4e-4)
    state, g_m = g_step(state, jax.random.PRNGKey(2), st_b, im_b, 1e-4)
    ref = {k: float(np.asarray(v)) for k, v in {**d_m, **g_m}.items()}

    for k, v in ref.items():
        np.testing.assert_allclose(
            metrics[0][k], v, rtol=1e-3, atol=1e-4,
            err_msg=f"2-process metric {k} != single-process",
        )
