"""Serving-path throughput: eval-mode story generation frames/s/chip.

Times the jitted `sample_videos` eval forward (BN running stats, no
mutation — the exact path `Infer.generate_story` / the eval datasets drive)
at final.yml scale across a batch sweep, with readback-verified timing.

Usage: python tools/bench_inference.py [--batches 18,36,72]
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


def main(argv=None):
    from cpcsv_tpu.utils.benchutil import add_cpu_flag

    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="18,36,72")
    ap.add_argument("--iters", type=int, default=10)
    add_cpu_flag(ap)
    args = ap.parse_args(argv)

    from cpcsv_tpu.models import build_models
    from cpcsv_tpu.train import create_train_state
    from cpcsv_tpu.utils.benchutil import bench_setup, synthetic_batches

    # batch sizes come from --batches; bench_setup only picks platform/cfg
    cfg, _, _, on_tpu = bench_setup(force_cpu=args.cpu)
    models = build_models(cfg)
    net_g = models[0]
    state = create_train_state(cfg, jax.random.PRNGKey(0), models)
    gen_vars = {
        "params": state.gen.params,
        "batch_stats": state.gen.batch_stats,
    }

    @jax.jit
    def sample(gen_vars, motion, content, key):
        out = net_g.apply(
            gen_vars,
            motion,
            content,
            False,
            False,  # train=False: eval-mode forward, no BN mutation
            method="sample_videos",
            rngs={"noise": key},
        )
        return out.image

    T = cfg.VIDEO_LEN
    for b in [int(x) for x in args.batches.split(",")]:
        st_batch, _ = synthetic_batches(cfg, b, 1)
        motion = jnp.concatenate([st_batch["description"], st_batch["labels"]], axis=2)
        content = st_batch["description"]
        key = jax.random.PRNGKey(1)
        # compile + 3 warm executions with readbacks (first executions after
        # compile can be order-of-magnitude slow on the tunnel — CLAUDE.md)
        for _ in range(3):
            key, sub = jax.random.split(key)
            video = sample(gen_vars, motion, content, sub)
            _ = float(jnp.mean(video))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            key, sub = jax.random.split(key)
            video = sample(gen_vars, motion, content, sub)
            # readback per dispatch: matches the production cadence and avoids
            # the tunnel's pathological serialization of back-to-back enqueues
            # with no intervening host readback (CLAUDE.md TUNNEL DISPATCH
            # PITFALL)
            _ = float(jnp.mean(video))
        dt = (time.perf_counter() - t0) / args.iters
        fps = b * T / dt

        # Pipelined (double-buffered) serving cadence: keep one call in
        # flight — dispatch i+1, THEN read back i's scalar. Every output is
        # still read back on the host (completion of every call is forced,
        # so the total wall-clock is honest), but the per-call tunnel
        # round trip overlaps device execution, as a real serving loop
        # would. One outstanding call only: deeper queues re-enter the
        # no-intervening-readback serialization regime.
        # t0 BEFORE the priming dispatch: its execution is inside the timed
        # window, so dividing by iters+1 is exact (starting the clock after
        # the priming call returns would leave that call's dispatch+overlap
        # outside the window while still counting it — a one-way optimistic
        # bias of up to one dispatch latency)
        t0 = time.perf_counter()
        key, sub = jax.random.split(key)
        prev = jnp.mean(sample(gen_vars, motion, content, sub))
        for _ in range(args.iters):
            key, sub = jax.random.split(key)
            cur = jnp.mean(sample(gen_vars, motion, content, sub))
            _ = float(prev)
            prev = cur
        _ = float(prev)
        dtp = (time.perf_counter() - t0) / (args.iters + 1)
        print(
            f"batch {b:4d} stories ({b*T} frames): {dt*1e3:7.2f} ms/call, "
            f"{fps:9.0f} frames/s | pipelined {dtp*1e3:7.2f} ms/call, "
            f"{b*T/dtp:9.0f} frames/s"
        )


if __name__ == "__main__":
    main()
