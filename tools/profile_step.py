"""Capture a device trace of the bench-scale train step and print an op-level
time breakdown (top HLO ops by total device time).

The tensorboard profile plugin in this image can't convert xplanes (TF
version mismatch), so this parses the .xplane.pb directly via the tsl proto
and aggregates event durations per line.

Usage:  python tools/profile_step.py [--steps 4] [--keep DIR]
Honors CPCSV_BENCH_OVERRIDES like bench.py.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def capture(trace_dir: str, steps: int, mode: str = "split"):
    from cpcsv_tpu.models import build_models
    from cpcsv_tpu.train import create_train_state, make_train_steps
    from cpcsv_tpu.utils.benchutil import bench_setup, synthetic_batches

    cfg, B_st, B_im, _ = bench_setup()
    models = build_models(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), models)

    st_batch, im_batch = synthetic_batches(cfg, B_st, B_im)
    key = jax.random.PRNGKey(1)

    if mode == "scan":
        # the PRODUCTION program: cfg.SCAN_STEPS alternating updates in one
        # dispatch (each traced "step" here is one K-step chunk)
        from cpcsv_tpu.train.steps import make_scan_steps

        K = cfg.SCAN_STEPS
        st_k = jax.tree_util.tree_map(
            lambda a: jnp.stack([a + 0.01 * i for i in range(K)]), st_batch
        )
        im_k = jax.tree_util.tree_map(
            lambda a: jnp.stack([a + 0.01 * i for i in range(K)]), im_batch
        )
        scan_steps = make_scan_steps(cfg, models)

        def one_step(state, key):
            state, m = scan_steps(state, key, st_k, im_k, 4e-4, 1e-4)
            return state, {"G/loss": m["G/loss"][-1]}

    else:
        d_step, g_step = make_train_steps(cfg, models)

        def one_step(state, key):
            k1, k2 = jax.random.split(key)
            state, dm = d_step(state, k1, st_batch, im_batch, 4e-4)
            # readback BETWEEN the two dispatches: two big enqueues with no
            # host readback in between serialize pathologically on the
            # tunnel (+400 ms each, CLAUDE.md) and would pollute the trace
            # with an artifact the production split loop doesn't have
            _ = float(np.asarray(dm["img_D/loss"]))
            state, m = g_step(state, k2, st_batch, im_batch, 1e-4)
            return state, m

    # warmup/compile outside the trace (two executions: the first after
    # compile can be anomalously slow on the tunnel)
    for _ in range(2):
        key, sub = jax.random.split(key)
        state, m = one_step(state, sub)
        _ = float(np.asarray(m["G/loss"]))

    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        key, sub = jax.random.split(key)
        state, m = one_step(state, sub)
        _ = float(np.asarray(m["G/loss"]))  # readback barrier per dispatch
    jax.profiler.stop_trace()


def analyze_categories(trace_dir: str):
    """Aggregate device time by op-name CATEGORY (fusion kind / op family,
    the name with trailing .N stripped and digits collapsed) for the 'XLA
    Ops' line — the view that answers "where do the milliseconds go" when
    time is smeared over hundreds of small fusions."""
    import re

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane.pb found under", trace_dir)
        return
    matched = False
    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                agg = collections.Counter()
                total = 0
                for ev in line.events:
                    name = meta.get(ev.metadata_id, str(ev.metadata_id))
                    base = name.split(" = ")[0].lstrip("%")
                    cat = re.sub(r"[.\d]+$", "", base)
                    if cat.startswith("while"):
                        continue  # the scan wrapper double-counts its body
                    agg[cat] += ev.duration_ps
                    total += ev.duration_ps
                if total == 0:
                    continue  # only while-wrapper events on this line
                matched = True
                print(f"\n=== CATEGORY view '{plane.name}' (body total "
                      f"{total/1e9:.1f} ms) ===")
                for cat, ps in agg.most_common(30):
                    print(f"  {ps/1e9:10.3f} ms  {100*ps/total:5.1f}%  {cat}")
    if not matched:
        print("no device 'XLA Ops' events found — is this a device trace?")


def analyze(trace_dir: str, top: int = 40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E501

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane.pb found under", trace_dir)
        return
    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                agg = collections.Counter()
                total = 0
                for ev in line.events:
                    name = meta.get(ev.metadata_id, str(ev.metadata_id))
                    agg[name] += ev.duration_ps
                    total += ev.duration_ps
                if total == 0:
                    continue
                print(f"\n=== plane '{plane.name}' line '{line.name}' "
                      f"(total {total/1e12*1e3:.2f} ms) ===")
                for name, ps in agg.most_common(top):
                    print(f"  {ps/1e9:10.3f} ms  {100*ps/total:5.1f}%  {name[:120]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--mode", default="split", choices=["split", "scan"],
                    help="scan = the production SCAN_STEPS program")
    ap.add_argument("--keep", default=None, help="trace dir (kept); default: temp")
    ap.add_argument("--analyze-only", default=None, help="skip capture, parse DIR")
    ap.add_argument("--categories", action="store_true",
                    help="aggregate by op-name category instead of per-op")
    ap.add_argument("--top", type=int, default=40)
    from cpcsv_tpu.utils.benchutil import add_cpu_flag

    add_cpu_flag(ap)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.analyze_only:
        if args.categories:
            analyze_categories(args.analyze_only)
        else:
            analyze(args.analyze_only, args.top)
        return
    trace_dir = args.keep or tempfile.mkdtemp(prefix="cpcsv_trace_")
    capture(trace_dir, args.steps, args.mode)
    print("trace dir:", trace_dir)
    if args.categories:
        analyze_categories(trace_dir)
    else:
        analyze(trace_dir, args.top)


if __name__ == "__main__":
    main()
