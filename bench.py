"""Benchmark: full CP-CSV training step throughput on one chip.

Runs the flagship (cascade, SEGMENT_LEARNING) model at the shipped
final-model scale (cfg/final.yml: GF_DIM 256 -> gf 2048, GF_SEG 1024,
IM_BATCH 90, ST_BATCH 18 -> 180 generated frames per D+G step) on synthetic
data, and reports frames/sec/chip over the alternating D-step + G-step.

Timing methodology (round-2 correction): on the axon tunnel,
`jax.block_until_ready` proved unreliable for async dispatch loops (round-1
recorded a ~22x-inflated artifact). Completion is now forced by a HOST
READBACK of a scalar produced by the FINAL step's metrics, and the result is
cross-checked for physical possibility against XLA's own
`compiled.cost_analysis()["flops"]`: the implied TFLOP/s must not exceed the
v5e bf16 peak (197 TFLOP/s). MFU is reported alongside frames/s.

Round-4 addition: the reported figure is the MEDIAN of CPCSV_BENCH_WINDOWS
(default 3) independent readback-closed timing windows; ms_per_step_min/max
carry the spread so round-over-round drift can be told apart from tunnel
noise (r03's single-shot figure drifted -1.6% with no way to attribute it).

Prints ONE JSON line:
  {"metric": "train_frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / recorded, "ms_per_step": ..., "tflops_per_step": ...,
   "mfu": ...}

Baseline: the reference publishes no throughput numbers (BASELINE.md), so the
recorded denominator is this framework's round-2 honest anchor stored in
BENCH_BASELINE.json (vs_baseline tracks round-over-round speedup; 1.0 on the
round that creates the file).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")

V5E_BF16_PEAK_FLOPS = 197e12  # one v5e chip


def _arm_watchdog():
    """A dead TPU tunnel makes the very first device op hang forever (seen
    2026-08-17: the tunnel relay died and every jax call blocked). Rather
    than stall the whole bench pipeline, exit with a diagnosable JSON line
    after CPCSV_BENCH_WATCHDOG_MIN minutes (default 30 — generous enough for
    a cold compile over the tunnel; 0 disables)."""
    import threading

    minutes = float(os.environ.get("CPCSV_BENCH_WATCHDOG_MIN", "30"))
    if minutes <= 0:
        return None

    def _abort():
        print(json.dumps({
            "metric": "train_frames_per_sec_per_chip", "value": 0.0,
            "unit": "frames/s", "vs_baseline": 0.0,
            "error": f"watchdog: no result after {minutes:g} min — "
                     "device hang (dead TPU tunnel?)",
        }), flush=True)
        os._exit(2)

    t = threading.Timer(minutes * 60.0, _abort)
    t.daemon = True
    t.start()
    return t


def _time_windows(n_windows, dispatches_per_window, steps_per_dispatch, run_dispatch):
    """Time n_windows INDEPENDENT windows; returns per-STEP durations.

    This is the one place the readback-closed timing methodology lives:
    run_dispatch must dispatch one jitted program AND read back a scalar
    from its metrics. The readback is the completion barrier
    (block_until_ready alone under-measured ~22x on this tunnel) and also
    the anti-serialization guard — back-to-back dispatches with NO readback
    between them serialize pathologically (+400 ms each, measured
    2026-08-16; CLAUDE.md tunnel pitfall). It matches production cadence
    too: the trainer logs every dispatch's metrics."""
    window_dts = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(dispatches_per_window):
            final_loss = run_dispatch()
        assert np.isfinite(final_loss)
        window_dts.append(
            (time.perf_counter() - t0) / (dispatches_per_window * steps_per_dispatch)
        )
    return window_dts


def main():
    from cpcsv_tpu.models import build_models
    from cpcsv_tpu.train import create_train_state, make_train_steps
    from cpcsv_tpu.utils.benchutil import bench_config, synthetic_batches

    watchdog = _arm_watchdog()
    on_tpu = jax.devices()[0].platform == "tpu"
    # A/B experiment knob: CPCSV_BENCH_OVERRIDES="REMAT=1,FUSED_UPSAMPLE=parity1"
    # applies top-level Config overrides; such runs never touch the baseline
    # file (vs_baseline still reported against the recorded default anchor).
    cfg = bench_config(on_tpu)
    overrides = bool(os.environ.get("CPCSV_BENCH_OVERRIDES", ""))
    B_st, B_im, T = 18, 90, cfg.VIDEO_LEN
    if not on_tpu:  # CPU smoke: shrink so the bench itself stays runnable
        from cpcsv_tpu.utils.benchutil import shrink_for_cpu

        cfg = shrink_for_cpu(cfg)
        B_st, B_im = 2, 4
    # CPCSV_BENCH_SCALE=k multiplies both batch sizes (per-chip batch-scaling
    # study; the reference final.yml shape is k=1 and is what BENCH_BASELINE
    # anchors). Combine with REMAT=1 if HBM-bound.
    scale = int(os.environ.get("CPCSV_BENCH_SCALE", "1"))
    B_st, B_im = B_st * scale, B_im * scale

    # Step-structure A/B knobs (honest re-measurement of round-1 claims):
    #   CPCSV_BENCH_STEP=scan (production default when cfg.SCAN_STEPS>1;
    #                    lax.scan over all steps, one dispatch total)
    #                    | split (per-step dispatch) | fused (one D+G program)
    #   CPCSV_BENCH_DONATE=1 (default) | 0 (no buffer donation)
    default_mode = "scan" if cfg.SCAN_STEPS > 1 else "split"
    step_mode = os.environ.get("CPCSV_BENCH_STEP", default_mode)
    if step_mode not in ("scan", "split", "fused"):
        # loud failure: a typo'd mode silently timing the default arm is the
        # exact A/B misattribution benchutil's strict parsing guards against
        raise SystemExit(f"CPCSV_BENCH_STEP must be scan|split|fused, got {step_mode!r}")
    from cpcsv_tpu.cli.dispatch import _str2bool

    donate = _str2bool(os.environ.get("CPCSV_BENCH_DONATE", "1"))

    models = build_models(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), models)
    if step_mode == "fused":
        from cpcsv_tpu.train.steps import make_fused_step

        if not donate:
            raise SystemExit("CPCSV_BENCH_DONATE=0 is not supported with STEP=fused")
        fused_step = make_fused_step(cfg, models)
        d_step = g_step = None
    elif step_mode == "scan":
        d_step = g_step = None
    elif donate:
        d_step, g_step = make_train_steps(cfg, models)
    else:
        raw_d, raw_g = make_train_steps(cfg, models, jit=False)
        d_step, g_step = jax.jit(raw_d), jax.jit(raw_g)

    st_batch, im_batch = synthetic_batches(cfg, B_st, B_im)
    key = jax.random.PRNGKey(1)

    if step_mode == "scan":
        # all timed steps in ONE dispatch via the production multi-step scan
        # (train/steps.py:make_scan_steps): K DISTINCT batches ride in as
        # scan inputs (leading K axis), the TrainState carry is donated so
        # XLA updates params/optimizer in place (CPCSV_BENCH_DONATE=0 turns
        # donation off for the A/B).
        from cpcsv_tpu.train.steps import make_scan_steps

        scan_steps = make_scan_steps(cfg, models, donate=donate)
    elif step_mode == "fused":

        def one_step(state, key):
            return fused_step(state, key, st_batch, im_batch, 4e-4, 1e-4)

        step_flops = float(
            fused_step.lower(state, key, st_batch, im_batch, 4e-4, 1e-4)
            .compile()
            .cost_analysis()["flops"]
        )
    else:

        def one_step(state, key):
            k1, k2 = jax.random.split(key)
            state, _ = d_step(state, k1, st_batch, im_batch, 4e-4)
            state, m = g_step(state, k2, st_batch, im_batch, 1e-4)
            return state, m

        # FLOPs per step from the compiled programs (before donation consumes state)
        k1, k2 = jax.random.split(key)
        step_flops = float(
            d_step.lower(state, k1, st_batch, im_batch, 4e-4)
            .compile()
            .cost_analysis()["flops"]
        ) + float(
            g_step.lower(state, k2, st_batch, im_batch, 1e-4)
            .compile()
            .cost_analysis()["flops"]
        )

    # Round-4 de-noising: the driver records a SINGLE bench figure per
    # round, and r03 showed a -1.6% drift that was indistinguishable from
    # tunnel noise. Time CPCSV_BENCH_WINDOWS (default 3) INDEPENDENT
    # readback-closed windows and report the median, with min/max spread in
    # extra fields so a future drift can be attributed.
    n_windows = max(1, int(os.environ.get("CPCSV_BENCH_WINDOWS", "3")))
    n_iters = 20 if on_tpu else 3
    if step_mode == "scan":
        # production cadence: chunks of cfg.SCAN_STEPS DISTINCT batches
        # (distinct data, same shapes) stacked on a leading axis, exactly as
        # the trainer feeds the scan path
        if on_tpu:
            n_iters = max(n_iters, cfg.SCAN_STEPS)  # K must not be capped
        K = max(1, min(cfg.SCAN_STEPS, n_iters))
        # >=2 chunks per window: one chunk would time a single dispatch and
        # be fully exposed to a tunnel hiccup
        n_chunks = max(2, n_iters // K)
        st_k = jax.tree_util.tree_map(
            lambda a: jnp.stack([a + 0.01 * i for i in range(K)]), st_batch
        )
        im_k = jax.tree_util.tree_map(
            lambda a: jnp.stack([a + 0.01 * i for i in range(K)]), im_batch
        )
        # per-step FLOPs from the K-step program itself (the same executable
        # the timing loop runs — no throwaway extra compile). XLA's
        # cost_analysis counts a while-loop body ONCE regardless of trip
        # count (verified: the K=20 program reports the same 7.363 TFLOP as
        # a K=1 program), so this IS the per-step figure.
        step_flops = float(
            scan_steps.lower(state, key, st_k, im_k, 4e-4, 1e-4)
            .compile()
            .cost_analysis()["flops"]
        )
        def run_dispatch():
            # per-chunk readback = the production pattern (the trainer
            # logs each chunk's metrics)
            nonlocal state, key
            key, sub = jax.random.split(key)
            state, m = scan_steps(state, sub, st_k, im_k, 4e-4, 1e-4)
            return float(np.asarray(m["G/loss"][-1]))

        dispatches_per_window, steps_per_dispatch = n_chunks, K
    else:

        def run_dispatch():
            # per-step readback = the production cadence (the trainer
            # device_gets each step's metrics)
            nonlocal state, key
            key, sub = jax.random.split(key)
            state, m = one_step(state, sub)
            return float(np.asarray(m["G/loss"]))

        dispatches_per_window, steps_per_dispatch = n_iters, 1

    # warmup: TWO dispatches with readbacks — the first executions after
    # compile have shown order-of-magnitude anomalies on the tunnel
    # (donated-carry buffers ping-ponging through the host when no readback
    # intervenes); steady state begins at execution 2-3.
    for _ in range(2):
        run_dispatch()
    window_dts = _time_windows(
        n_windows, dispatches_per_window, steps_per_dispatch, run_dispatch
    )
    dt = float(np.median(window_dts))  # median window: robust to one
    # tunnel hiccup; spread reported so drift vs noise is attributable

    frames_per_step = B_st * T + B_im  # generated frames per D+G step
    value = frames_per_step / dt
    achieved_flops = step_flops / dt
    mfu = achieved_flops / V5E_BF16_PEAK_FLOPS if on_tpu else float("nan")

    if on_tpu and achieved_flops > V5E_BF16_PEAK_FLOPS:
        raise RuntimeError(
            f"measured {achieved_flops/1e12:.1f} TFLOP/s exceeds the v5e peak "
            f"({V5E_BF16_PEAK_FLOPS/1e12:.0f}) — timing is broken, refusing to "
            "report a physically impossible number"
        )

    baseline = None
    baseline_exists = os.path.exists(BASELINE_FILE)
    if baseline_exists:
        try:
            rec = json.load(open(BASELINE_FILE))
            if rec.get("platform") == jax.devices()[0].platform:
                baseline = rec.get("value")
        except Exception:
            baseline = None
    if baseline is None and (
        baseline_exists  # never clobber another platform's recorded anchor
        or overrides
        or step_mode != default_mode
        or not donate
        or scale != 1
    ):
        baseline = value  # A/B runs never create the baseline file
    if baseline is None:
        json.dump(
            {
                "value": value,
                "platform": jax.devices()[0].platform,
                "method": "final-step scalar readback",
                "ms_per_step": dt * 1e3,
                "mfu": mfu,
            },
            open(BASELINE_FILE, "w"),
        )
        baseline = value

    if watchdog is not None:
        watchdog.cancel()
    rec = {
        "metric": "train_frames_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "frames/s",
        "vs_baseline": round(value / baseline, 3),
        "ms_per_step": round(dt * 1e3, 2),
        "ms_per_step_min": round(min(window_dts) * 1e3, 2),
        "ms_per_step_max": round(max(window_dts) * 1e3, 2),
        "windows": len(window_dts),
        "tflops_per_step": round(step_flops / 1e12, 3),
        "mfu": round(mfu, 4) if on_tpu else None,
    }
    print(json.dumps(rec))
    return rec


def run_ab(spec: str):
    """Same-process A/B: arm A = the current CPCSV_BENCH_OVERRIDES (usually
    none, i.e. the production default program), arm B = A plus `spec`
    (e.g. "BN_BACKEND=mxu"). Both arms run their full multi-window
    readback-closed measurement inside ONE interpreter/tunnel session, so a
    delta between them cannot be between-day tunnel state (CLAUDE.md: that
    alone moves single-run figures ~2%). Arms run A then B; each prints its
    own JSON line tagged with "arm", followed by one delta line."""
    base = os.environ.get("CPCSV_BENCH_OVERRIDES", "")
    arms = {"A": base, "B": ",".join(s for s in (base, spec) if s)}
    recs = {}
    for name, overrides in arms.items():
        os.environ["CPCSV_BENCH_OVERRIDES"] = overrides
        print(json.dumps({"arm": name, "overrides": overrides}), flush=True)
        recs[name] = main()
    a, b = recs["A"], recs["B"]
    print(
        json.dumps(
            {
                "metric": "ab_speedup",
                "ab": spec,
                "value": round(a["ms_per_step"] / b["ms_per_step"], 4),
                "unit": "x (A_ms / B_ms; >1 means B is faster)",
                "a_ms_per_step": a["ms_per_step"],
                "b_ms_per_step": b["ms_per_step"],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    import sys

    if len(sys.argv) >= 3 and sys.argv[1] == "--ab":
        run_ab(sys.argv[2])
    elif len(sys.argv) > 1:
        raise SystemExit(f"usage: bench.py [--ab OVERRIDE_SPEC]; got {sys.argv[1:]}")
    else:
        main()
