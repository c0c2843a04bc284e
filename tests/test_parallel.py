"""Multi-device tests on the virtual 8-CPU mesh: sharded batches, replicated
params, full D+G step through jit with XLA-inserted collectives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpcsv_tpu.parallel.mesh import batch_sharding, make_mesh, replicate, shard_batch


def test_make_mesh_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_make_mesh_shape_string():
    mesh = make_mesh("data:4")
    assert mesh.devices.size == 4
    assert mesh.axis_names == ("data",)


def test_shard_batch_places_on_mesh():
    mesh = make_mesh()
    batch = {
        "images": np.zeros((16, 8, 8, 3), np.float32),
        "text": ["a"] * 16,  # non-array dropped
    }
    out = shard_batch(batch, mesh)
    assert "text" not in out
    assert out["images"].sharding.spec == batch_sharding(mesh).spec


def test_per_host_loader_slices_partition_global_batch():
    """Multi-host input pipeline: the per-process loaders' slices must
    concatenate (in process order) to exactly the single-process global
    batch — same seed => same global permutation on every host."""
    from cpcsv_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.float32)}

    global_loader = DataLoader(DS(), 8, shuffle=True, drop_last=True, seed=5)
    host_loaders = [
        DataLoader(DS(), 8, shuffle=True, drop_last=True, seed=5,
                   process_index=p, process_count=4)
        for p in range(4)
    ]
    for g, *hs in zip(global_loader, *host_loaders):
        merged = np.concatenate([h["x"] for h in hs], axis=0)
        np.testing.assert_array_equal(g["x"], merged)
        assert hs[0]["x"].shape[0] == 2  # 8 global / 4 hosts


def test_per_host_loader_rejects_indivisible_batch():
    from cpcsv_tpu.data.loader import DataLoader

    with pytest.raises(ValueError):
        DataLoader([], 7, process_index=0, process_count=2)


def test_dryrun_multichip_entrypoint():
    """The driver's multi-chip validation must pass on the virtual mesh."""
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "_graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
