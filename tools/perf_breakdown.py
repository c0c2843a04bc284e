"""Per-phase timing breakdown of the train step (readback-verified).

Times, at bench shapes (cfg/final.yml scale, bf16 on TPU):
  * d_step alone
  * g_step alone
  * G sample_videos + sample_images forward alone (the shared sub-pass)
all with the host-readback completion barrier (CLAUDE.md TIMING RULE:
block_until_ready is insufficient on the axon tunnel).

Usage:  python tools/perf_breakdown.py [--iters 20]
Honors CPCSV_BENCH_OVERRIDES like bench.py.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _readback(x) -> float:
    return float(np.asarray(x))


def main():
    from cpcsv_tpu.utils.benchutil import add_cpu_flag

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    add_cpu_flag(ap)
    args = ap.parse_args()

    from cpcsv_tpu.models import build_models
    from cpcsv_tpu.train import create_train_state, make_train_steps
    from cpcsv_tpu.utils.benchutil import bench_setup, synthetic_batches

    cfg, B_st, B_im, on_tpu = bench_setup(force_cpu=args.cpu)
    T = cfg.VIDEO_LEN
    models = build_models(cfg)
    net_g = models[0]
    state = create_train_state(cfg, jax.random.PRNGKey(0), models)
    # jit=True returns donating steps; for repeated same-state timing we use
    # non-donating jits so the input state stays alive between calls.
    raw_d, raw_g = make_train_steps(cfg, models, jit=False)
    d_step = jax.jit(raw_d)
    g_step = jax.jit(raw_g)

    st_batch, im_batch = synthetic_batches(cfg, B_st, B_im)
    key = jax.random.PRNGKey(1)

    # ---- generator forward alone (st + im sampling, as in the D phase).
    # NB: batches must be ARGUMENTS — closing over device arrays embeds them
    # as XLA constants and measured ~3-4x slower than the same computation
    # with proper parameters (v5e, 2026-08-16).
    @jax.jit
    def gen_forward(gen_vars, rng, st_batch, im_batch):
        st_motion = jnp.concatenate([st_batch["description"], st_batch["labels"]], axis=2)
        im_motion = jnp.concatenate([im_batch["description"], im_batch["labels"]], axis=1)
        k1, k2 = jax.random.split(rng)
        st_out = net_g.apply(
            gen_vars, st_motion, st_batch["description"], True,
            method="sample_videos", rngs={"noise": k1}, mutable=["batch_stats"],
        )[0]
        im_out = net_g.apply(
            gen_vars, im_motion, im_batch["content"][:, :, : cfg.TEXT.DIMENSION], True,
            method="sample_images", rngs={"noise": k2}, mutable=["batch_stats"],
        )[0]
        return st_out.image.mean() + im_out.image.mean()

    def time_loop(name, fn, readback_fn, iters):
        # TWO warmups: execution 1 after compile has shown order-of-magnitude
        # anomalies on the tunnel; steady state begins at execution 2-3
        # (bench.py measures the same way)
        for _ in range(2):
            out = fn(key)
            _ = readback_fn(out)
        t0 = time.perf_counter()
        k = key
        for _ in range(iters):
            k, sub = jax.random.split(k)
            out = fn(sub)
            # per-dispatch readback: back-to-back enqueues with no host
            # readback serialize pathologically on the tunnel (CLAUDE.md)
            _ = readback_fn(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:>28}: {dt:8.2f} ms")
        return dt

    gen_vars = state.gen.variables()
    t_gen = time_loop(
        "G forward (st+im)",
        lambda k: gen_forward(gen_vars, k, st_batch, im_batch),
        _readback,
        args.iters,
    )
    t_d = time_loop(
        "d_step",
        lambda k: d_step(state, k, st_batch, im_batch, 4e-4)[1]["img_D/loss"],
        _readback,
        args.iters,
    )
    t_g = time_loop(
        "g_step",
        lambda k: g_step(state, k, st_batch, im_batch, 1e-4)[1]["G/loss"],
        _readback,
        args.iters,
    )
    print(f"{'total (d+g)':>28}: {t_d + t_g:8.2f} ms")
    print(f"{'  of which G fwd (in d)':>28}: {t_gen:8.2f} ms")


if __name__ == "__main__":
    main()
