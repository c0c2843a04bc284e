"""Force tests onto a virtual 8-device CPU mesh (no TPU needed) and enable
the persistent compilation cache.

NOTE: jax may already be imported at interpreter startup (site hook for the
TPU tunnel plugin), so env vars alone are too late for jax config — use
jax.config.update. JAX_PLATFORMS/XLA_FLAGS still work because backends
initialize lazily on first device access.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


def test_virtual_mesh_has_8_cpu_devices():
    assert len(jax.devices()) == 8
    assert jax.devices()[0].platform == "cpu"
