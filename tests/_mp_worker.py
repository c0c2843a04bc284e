"""Worker for tests/test_multiprocess.py: one process of a 2-process
jax.distributed data-parallel run on CPU (2 local devices each, 4 global).

Four legs, continuing the same state (the exact production code paths):
  1. split per-step dispatch (d_step + g_step)        -> MP_METRICS {json}
  2. one make_scan_steps chunk, K=2 stacked batches   -> MP_SCAN_METRICS {json}
     (leading-K axis unsharded, batch axis sharded: P(None, "data") via
     shard_batch(..., scan_axis=True) + make_array_from_process_local_data —
     exactly trainer.py's SCAN_STEPS path)
  3. distributed checkpoint save -> restore -> one more d_step
                                                      -> MP_RESUME_METRICS {json}
  4. centralized multi-host EVAL: Infer.eval_fid2 over per-host-sliced
     loaders — the @_centralized protocol runs the whole walk on process 0
     over the UNSLICED loader while process 1 waits at the coordination
     barrier                                          -> MP_EVAL_FID {json}
                                                         / MP_EVAL_WAITED

Usage: python tests/_mp_worker.py <process_id> <coordinator_port> <ckpt_dir>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if __name__ == "__main__":
    # stack-on-demand for hang triage: `kill -USR1 <pid>` dumps every
    # thread's Python stack to stderr without killing the worker
    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1)
    # worker-process backend setup ONLY: this module is also imported by the
    # pytest process (for make_global_batches), where the 8-device CPU
    # backend is already initialized and these updates would raise
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    # same persistent compilation cache as tests/conftest.py: the scan-step
    # module alone takes ~2 min to compile cold on this single-core host, and
    # two workers compiling concurrently put the test over its timeout
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")


def make_global_batches(cfg, B, seed=0):
    import numpy as np

    T = cfg.VIDEO_LEN
    rng = np.random.default_rng(seed)
    st = {
        "images": rng.standard_normal((B, T, 64, 64, 3)).astype(np.float32),
        "description": rng.standard_normal((B, T, 356)).astype(np.float32),
        "labels": (rng.random((B, T, 9)) < 0.3).astype(np.float32),
    }
    im = {
        "images": rng.standard_normal((B, 64, 64, 3)).astype(np.float32),
        "description": rng.standard_normal((B, 356)).astype(np.float32),
        "labels": (rng.random((B, 9)) < 0.3).astype(np.float32),
        "content": rng.standard_normal((B, T, 356)).astype(np.float32),
        "images_seg": rng.standard_normal((B, 64, 64, 1)).astype(np.float32),
    }
    return st, im


def _barrier(name, timeout_ms=1_500_000):
    """Coordination-service barrier (NOT a gloo collective — usable before any
    gloo context exists). Needed because gloo context init has a hard ~30 s
    rendezvous timeout: if one worker hits the persistent compile cache and
    dispatches its first collective while the other cold-compiles for minutes,
    the fast worker's gloo GetKeyValue times out and the run dies. All
    collective-bearing programs are therefore AOT-compiled first, then both
    workers meet here before the first dispatch."""
    from jax._src import distributed

    distributed.global_state.client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def main():
    pid, port = int(sys.argv[1]), int(sys.argv[2])
    ckpt_dir = sys.argv[3] if len(sys.argv) > 3 else None
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    import numpy as np

    from cpcsv_tpu.config import default_config, GanConfig
    from cpcsv_tpu.models import build_models
    from cpcsv_tpu.parallel.mesh import make_mesh, shard_batch
    from cpcsv_tpu.train import create_train_state, make_train_steps
    from cpcsv_tpu.train.steps import make_scan_steps

    cfg = default_config().with_updates(
        CASCADE_MODEL=True,
        SEGMENT_LEARNING=True,
        GAN=GanConfig(CONDITION_DIM=124, Z_DIM=100, DF_DIM=16, GF_DIM=8, GF_SEG_DIM=32),
    )
    assert jax.process_count() == 2 and jax.device_count() == 4

    mesh = make_mesh("")  # all 4 global devices on "data"
    models = build_models(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), models)

    # ---- build ALL batches, then AOT-compile every collective-bearing
    # program BEFORE any of them executes (see _barrier docstring)
    B = 4
    lo, hi = pid * (B // 2), (pid + 1) * (B // 2)
    st_global, im_global = make_global_batches(cfg, B, seed=0)
    st_batch = shard_batch({k: v[lo:hi] for k, v in st_global.items()}, mesh)
    im_batch = shard_batch({k: v[lo:hi] for k, v in im_global.items()}, mesh)

    K = 2
    st_steps, im_steps = [], []
    for j in range(K):
        st_g, im_g = make_global_batches(cfg, B, seed=10 + j)
        st_steps.append({k: v[lo:hi] for k, v in st_g.items()})
        im_steps.append({k: v[lo:hi] for k, v in im_g.items()})
    stack = lambda ds: {k: np.stack([d[k] for d in ds]) for k in ds[0]}
    st_k = shard_batch(stack(st_steps), mesh, scan_axis=True)
    im_k = shard_batch(stack(im_steps), mesh, scan_axis=True)

    d_step, g_step = make_train_steps(cfg, models)
    scan_steps = make_scan_steps(cfg, models)
    key = jax.random.PRNGKey(0)
    d_step = d_step.lower(state, key, st_batch, im_batch, 4e-4).compile()
    g_step = g_step.lower(state, key, st_batch, im_batch, 1e-4).compile()
    scan_steps = scan_steps.lower(state, key, st_k, im_k, 4e-4, 1e-4).compile()
    _barrier("precompiled")

    # ---- leg 1: split per-step dispatch on local slices of a global batch
    state, d_metrics = d_step(state, jax.random.PRNGKey(1), st_batch, im_batch, 4e-4)
    state, g_metrics = g_step(state, jax.random.PRNGKey(2), st_batch, im_batch, 1e-4)
    jax.block_until_ready(state)

    out = {k: float(np.asarray(v)) for k, v in {**d_metrics, **g_metrics}.items()}
    print("MP_METRICS", json.dumps(out), flush=True)

    # ---- leg 2: production SCAN_STEPS path, K=2 stacked batches
    state, scan_metrics = scan_steps(
        state, jax.random.PRNGKey(3), st_k, im_k, 4e-4, 1e-4
    )
    jax.block_until_ready(state)
    out2 = {
        k: [float(x) for x in np.asarray(v)] for k, v in scan_metrics.items()
    }
    print("MP_SCAN_METRICS", json.dumps(out2), flush=True)

    # ---- leg 3: distributed checkpoint save -> restore -> continue
    if ckpt_dir:
        from cpcsv_tpu.train.checkpoint import CheckpointManager

        ckpt = CheckpointManager(ckpt_dir)
        ckpt.save(state, 0)
        template = create_train_state(cfg, jax.random.PRNGKey(99), models)
        restored = ckpt.restore(template)
        assert ckpt.last_epoch() == 0
        # the distributed round-trip must be BITWISE exact
        for a, b in zip(
            jax.tree.leaves(state.gen.params), jax.tree.leaves(restored.gen.params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        st_g, im_g = make_global_batches(cfg, B, seed=20)
        st_b = shard_batch({k: v[lo:hi] for k, v in st_g.items()}, mesh)
        im_b = shard_batch({k: v[lo:hi] for k, v in im_g.items()}, mesh)
        restored, r_metrics = d_step(
            restored, jax.random.PRNGKey(4), st_b, im_b, 4e-4
        )
        jax.block_until_ready(restored)
        out3 = {k: float(np.asarray(v)) for k, v in r_metrics.items()}
        print("MP_RESUME_METRICS", json.dumps(out3), flush=True)

    # ---- leg 4: centralized multi-host eval walk (evaluation/drivers.py
    # @_centralized): process 0 runs eval_fid2 over the FULL test set
    # (DataLoader.unsliced), process 1 returns None after the barrier. The
    # checkpoint is a FRESH PRNGKey(0) init (bitwise-reproducible in the
    # single-process pytest), saved distributed like leg 3.
    if ckpt_dir:
        from cpcsv_tpu.data.loader import DataLoader
        from cpcsv_tpu.data.synthetic import SyntheticStoryDataset
        from cpcsv_tpu.evaluation.drivers import Infer

        eval_cfg = cfg.with_updates(MESH_SHAPE="data:1", CONFIG_NAME="mp_eval")
        eval_run = ckpt_dir + "_evalrun"
        eval_state = create_train_state(eval_cfg, jax.random.PRNGKey(0), models)
        # the distributed checkpointer saves GLOBAL arrays (leg 3's state
        # came out of a mesh-sharded jit); a fresh init is process-local, so
        # replicate it over the global mesh first (identical values on both
        # hosts — deterministic init — so this is collective-free)
        from cpcsv_tpu.parallel.mesh import replicate

        eval_state = jax.tree.map(
            lambda a: jax.device_put(a, replicate(mesh)), eval_state
        )
        CheckpointManager(os.path.join(eval_run, "Model")).save(eval_state, 0)
        testloader = DataLoader(
            SyntheticStoryDataset(8, cfg.VIDEO_LEN, seed=9),
            batch_size=4, shuffle=False, drop_last=True,
            process_index=pid, process_count=2,
        )
        results = Infer(eval_cfg, eval_run).eval_fid2(
            testloader, epochs=[0], batch_size=8
        )
        if pid == 0:
            csv_path = os.path.join(
                eval_run, "Evaluation", "mp_eval", "fid_score2.csv"
            )
            print(
                "MP_EVAL_FID",
                json.dumps({"csv": open(csv_path).read(),
                            "n": len(results)}),
                flush=True,
            )
        else:
            assert results is None, "non-zero process must not run the walk"
            print("MP_EVAL_WAITED", json.dumps({"waited": True}), flush=True)

    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
