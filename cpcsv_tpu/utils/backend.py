"""Backend selection shared by the standalone converter tools."""

from __future__ import annotations


def force_cpu_backend() -> None:
    """Force the CPU backend before the first backend touch.

    Checkpoint conversion never needs an accelerator, and a dead TPU tunnel
    hangs backend init forever (the site hook pre-imports jax and pins
    JAX_PLATFORMS=axon, so env vars set afterwards are ignored — same
    pitfall utils/benchutil.add_cpu_flag documents). Under pytest the
    conftest already pinned "cpu", so the guard skips. If a non-CPU backend
    is already initialized (a tool's main() invoked programmatically after
    a backend touch) jax refuses the update; conversion then runs on that
    backend — only a DEAD tunnel is a problem, and that would have hung the
    earlier touch, not this one.
    """
    import jax

    if jax.config.jax_platforms == "cpu":
        return
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError as e:
        print(f"note: could not force the CPU backend ({e}); "
              "continuing on the already-initialized one")
