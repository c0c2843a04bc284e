"""Shared helpers for bench.py and tools/ (perf_breakdown, profile_step).

One place for (a) the env-override config parser and (b) the synthetic
final.yml-scale batch dicts, so a batch-schema change cannot silently make a
perf tool measure different inputs than the bench.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from cpcsv_tpu.config import Config, default_config

# persistent compilation cache (same dir as tests/conftest.py): repeated A/B
# bench invocations of an unchanged program skip the 20-40 s TPU compile
try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:  # pragma: no cover - older jax without the knob
    pass


def apply_env_overrides(cfg: Config, env: str = "CPCSV_BENCH_OVERRIDES") -> Config:
    """Apply "KEY=VALUE,KEY=VALUE" top-level Config overrides from env.
    Values are coerced to the type of the existing field."""
    overrides = {}
    for item in filter(None, os.environ.get(env, "").split(",")):
        k, v = item.split("=", 1)
        cur = getattr(cfg, k)  # raises AttributeError for unknown keys
        if isinstance(cur, bool):
            # strict parse (same table as cli._str2bool): an unrecognized
            # token like "off" must error, not silently become True and
            # attribute an A/B perf delta to the wrong configuration
            from cpcsv_tpu.cli.dispatch import _str2bool

            v = _str2bool(v)
        elif isinstance(cur, (int, float)):
            v = type(cur)(v)
        overrides[k] = v
    return cfg.with_updates(**overrides) if overrides else cfg


def bench_config(on_tpu: bool) -> Config:
    """The flagship bench config (cascade + segment at final.yml scale),
    with CPCSV_BENCH_OVERRIDES applied."""
    cfg = default_config().with_updates(
        CONFIG_NAME="bench",
        CASCADE_MODEL=True,
        SEGMENT_LEARNING=True,
        COMPUTE_DTYPE="bfloat16" if on_tpu else "float32",
    )
    return apply_env_overrides(cfg)


def add_cpu_flag(parser) -> None:
    """Shared --cpu argparse flag for the standalone perf tools."""
    parser.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (a dead TPU tunnel hangs backend init "
             "forever; env vars are too late here)",
    )


def bench_setup(force_cpu: bool = False):
    """The perf tools' shared platform/config/batch pick: force CPU on
    request (BEFORE the first backend touch), detect TPU, and off-TPU
    shrink to the smoke shapes so the 1-core host never pays a
    final.yml-scale compile. Returns (cfg, b_st, b_im, on_tpu); bench.py
    keeps its own flow for the watchdog + baseline bookkeeping."""
    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.devices()[0].platform == "tpu"
    cfg = bench_config(on_tpu)
    if on_tpu:
        b_st, b_im = 18, 90
    else:
        cfg = shrink_for_cpu(cfg)
        b_st, b_im = 2, 4
    # same per-chip batch-scaling knob as bench.py (which keeps its own
    # flow): lets the perf tools profile e.g. the 4x throughput-preset shape
    scale = int(os.environ.get("CPCSV_BENCH_SCALE", "1"))
    return cfg, b_st * scale, b_im * scale, on_tpu


def shrink_for_cpu(cfg: Config) -> Config:
    """Tiny GAN dims for CPU smoke runs of the perf tools — the full
    final.yml-scale model is a multi-minute compile on the 1-core host.
    ONE shared shrink so every tool smokes the SAME config."""
    from cpcsv_tpu.config import GanConfig

    return cfg.with_updates(
        GAN=GanConfig(CONDITION_DIM=124, Z_DIM=100, DF_DIM=16, GF_DIM=8, GF_SEG_DIM=32)
    )


def synthetic_batches(cfg: Config, b_st: int, b_im: int, seed: int = 0):
    """The bench's synthetic (st_batch, im_batch) at the given batch sizes —
    the exact input schema of train/steps.py."""
    T = cfg.VIDEO_LEN
    rng = np.random.default_rng(seed)
    st_batch = {
        "images": jnp.asarray(rng.standard_normal((b_st, T, 64, 64, 3)), jnp.float32),
        "description": jnp.asarray(rng.standard_normal((b_st, T, 356)), jnp.float32),
        "labels": jnp.asarray((rng.random((b_st, T, 9)) < 0.3), jnp.float32),
    }
    im_batch = {
        "images": jnp.asarray(rng.standard_normal((b_im, 64, 64, 3)), jnp.float32),
        "description": jnp.asarray(rng.standard_normal((b_im, 356)), jnp.float32),
        "labels": jnp.asarray((rng.random((b_im, 9)) < 0.3), jnp.float32),
        "content": jnp.asarray(rng.standard_normal((b_im, T, 356)), jnp.float32),
    }
    if cfg.SEGMENT_LEARNING:
        im_batch["images_seg"] = jnp.asarray(
            rng.standard_normal((b_im, 64, 64, 1)), jnp.float32
        )
    if cfg.USE_SEQ_CONSISTENCY:
        st_batch["shuffled"] = st_batch["images"]
        st_batch["order_labels"] = jnp.zeros((b_st,), jnp.float32)
    return st_batch, im_batch
