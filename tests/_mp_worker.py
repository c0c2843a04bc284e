"""Worker for tests/test_multiprocess.py: one process of a 2-process
jax.distributed data-parallel train step on CPU (2 local devices each,
4 global). Prints one line: MP_METRICS {json}.

Usage: python tests/_mp_worker.py <process_id> <coordinator_port>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main():
    pid, port = int(sys.argv[1]), int(sys.argv[2])
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    import numpy as np

    from cpcsv_tpu.config import default_config, GanConfig
    from cpcsv_tpu.models import build_models
    from cpcsv_tpu.parallel.mesh import make_mesh, shard_batch
    from cpcsv_tpu.train import create_train_state, make_train_steps

    cfg = default_config().with_updates(
        CASCADE_MODEL=True,
        SEGMENT_LEARNING=True,
        GAN=GanConfig(CONDITION_DIM=124, Z_DIM=100, DF_DIM=16, GF_DIM=8, GF_SEG_DIM=32),
    )
    assert jax.process_count() == 2 and jax.device_count() == 4

    mesh = make_mesh("")  # all 4 global devices on "data"
    models = build_models(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), models)

    # GLOBAL batch generated identically in every process; each process
    # passes only its LOCAL slice to shard_batch (the multi-host input path:
    # jax.make_array_from_process_local_data assembles the global array).
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
    lo, hi = pid * (B // 2), (pid + 1) * (B // 2)
    st_local = {k: v[lo:hi] for k, v in st_global.items()}
    im_local = {k: v[lo:hi] for k, v in im_global.items()}

    st_batch = shard_batch(st_local, mesh)
    im_batch = shard_batch(im_local, mesh)

    d_step, g_step = make_train_steps(cfg, models)
    state, d_metrics = d_step(state, jax.random.PRNGKey(1), st_batch, im_batch, 4e-4)
    state, g_metrics = g_step(state, jax.random.PRNGKey(2), st_batch, im_batch, 1e-4)
    jax.block_until_ready(state)

    out = {k: float(np.asarray(v)) for k, v in {**d_metrics, **g_metrics}.items()}
    print("MP_METRICS", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
