"""Force tests onto a virtual 8-device CPU mesh (no TPU needed).

This environment pre-imports jax at interpreter startup (TPU-tunnel site
hook, JAX_PLATFORMS=axon), so env vars are too late — the platform and
device count must be forced through jax.config.update BEFORE the first
backend use.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


def force_no_weights(monkeypatch, tmp_path):
    """Make evaluation.weights.resolve_weights deterministically find
    NOTHING: the env dir is pointed at an empty tmp dir and HOME is
    redirected so the default ~/.cache/cpcsv_tpu/weights search dir is
    empty too. On a production host that dir holds real ported weights
    (tools/port_metric_weights.py tells users to put them there), and a
    bare delenv would let them leak into random-init-fallback assertions.
    Lives here (not in a test module) so torch-free tests can use it."""
    empty = tmp_path / "no_weights"
    home = tmp_path / "no_weights_home"
    empty.mkdir(exist_ok=True)
    home.mkdir(exist_ok=True)
    monkeypatch.setenv("CPCSV_METRIC_WEIGHTS_DIR", str(empty))
    monkeypatch.setenv("HOME", str(home))
# The 8-cpu-device guard test lives in tests/test_parallel.py — pytest
# loads conftest.py as a plugin and never COLLECTS it, so a test defined
# here would silently never run.
