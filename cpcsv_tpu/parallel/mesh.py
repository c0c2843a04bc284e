"""Device-mesh data parallelism.

The reference's only parallelism is single-process multi-GPU
`nn.parallel.data_parallel` scatter/gather per forward (reference
`miscc/utils.py:58-166`, batch x num_gpu at `main_pororo.py:64,107`). The
TPU-native replacement: one `jax.sharding.Mesh` over all chips, batches
sharded on their leading axis, parameters replicated, and the jitted train
step's gradient all-reduce inserted by XLA over ICI — no hand-written
collectives, no process groups.

Scaling rule (matching the reference): global batch = per-chip batch x
mesh size; the loss is a global-batch mean, so gradients match the
single-device program exactly (up to reduction order).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(mesh_shape: str = "", devices=None) -> Mesh:
    """mesh_shape like "data:8"; empty = all available devices on "data"."""
    devices = devices if devices is not None else jax.devices()
    if mesh_shape:
        axes = [kv.split(":") for kv in mesh_shape.split(",")]
        names = tuple(a[0] for a in axes)
        sizes = tuple(int(a[1]) for a in axes)
        n = int(np.prod(sizes))
        assert n <= len(devices), f"mesh needs {n} devices, have {len(devices)}"
        dev_array = np.asarray(devices[:n]).reshape(sizes)
        return Mesh(dev_array, names)
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def mesh_size(mesh_shape: str = "") -> int:
    """Device count the mesh will use — the reference's `num_gpu` factor
    (main_pororo.py:64: global batch = per-device batch x num devices)."""
    if mesh_shape:
        return int(np.prod([int(kv.split(":")[1]) for kv in mesh_shape.split(",")]))
    return len(jax.devices())


def batch_sharding(mesh: Mesh, scan_axis: bool = False) -> NamedSharding:
    """Shard the batch axis over the mesh. scan_axis=True: leaves carry a
    leading steps-per-dispatch axis (cfg.SCAN_STEPS stacking) that stays
    unsharded; the SECOND axis is the batch."""
    spec = P(None, DATA_AXIS) if scan_axis else P(DATA_AXIS)
    return NamedSharding(mesh, spec)


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_eval_mesh(mesh_shape: str = "", unshardable: bool = False) -> Mesh:
    """`make_mesh`, but falling back to all local devices when the
    configured mesh does not fit this host. An eval/inference walk of a run
    trained elsewhere (e.g. MESH_SHAPE "data:8" archived in the run's
    setting.yml, walked on a 1-chip host) must not die in make_mesh's
    device-count assert: eval sharding is a throughput extension, not a
    semantic requirement (sharded == unsharded samples, tested), so the
    local device set is always a correct substitute. Training keeps the
    strict make_mesh — silently under-sharding a TRAIN run would change
    the global batch (reference num_gpu semantics, main_pororo.py:64).

    unshardable=True: the generation forward contains an op with no GSPMD
    partitioning rule (the Pallas DFN kernel — pass
    ops.dynamic_filter.pallas_dfn_active(cfg.USE_PALLAS)), so return a
    1-device mesh: eval_shardings then declines and the walk runs
    unsharded, numerically identical. Warns when that actually narrows a
    multi-device mesh."""
    import warnings

    if unshardable:
        # warn only when this actually narrows the mesh that WOULD have been
        # built (cfg mesh capped at local devices) — a run configured
        # MESH_SHAPE "data:1" loses nothing and gets no warning
        # mesh_size("") is len(jax.devices()), so the min() is exactly "the
        # mesh make_mesh would build" for every input
        would_build = min(mesh_size(mesh_shape), len(jax.devices()))
        if would_build > 1:
            warnings.warn(
                "the Pallas DFN kernel is active and Mosaic custom calls "
                "have no SPMD partitioning rule — eval generation runs "
                "unsharded on one device (numerically identical)."
            )
        return make_mesh(f"{DATA_AXIS}:1")
    if mesh_shape and mesh_size(mesh_shape) > len(jax.devices()):
        warnings.warn(
            f"MESH_SHAPE {mesh_shape!r} needs {mesh_size(mesh_shape)} devices "
            f"but only {len(jax.devices())} are visible — eval falls back to "
            "the local device set (numerically identical, just less parallel)."
        )
        return make_mesh("")
    return make_mesh(mesh_shape)


def eval_shardings(mesh: Optional[Mesh], batch: int):
    """(batch_sharding, replicate) for an eval/generation forward, or
    (None, None) to run unsharded. Sharding applies when the mesh's DATA
    axis is multi-device, the batch divides that axis evenly, and this is a
    single-process run (multi-host eval would need
    make_array_from_process_local_data; per-host loader slices already
    split the work there). The fallback is not an error: eval chunk tails
    are legitimately ragged.

    The divisor is the "data" axis extent, NOT mesh.size: batch_sharding
    only partitions over P("data"), so on a multi-axis mesh (make_mesh
    "data:4,model:2") a batch of 4 is shardable even though 4 % 8 != 0 —
    the other axes just replicate the forward (round-4 review finding)."""
    if mesh is None or jax.process_count() > 1:
        return None, None
    data = dict(mesh.shape).get(DATA_AXIS, 1)
    if data > 1 and batch % data == 0:
        return batch_sharding(mesh), replicate(mesh)
    return None, None


def shard_eval_inputs(mesh: Optional[Mesh], arrays: tuple, variables: Any,
                      cache: dict):
    """Shard a generation forward's batch arrays over the mesh and replicate
    its variables, or pass both through untouched when `eval_shardings`
    declines (ragged tail / 1-device mesh / multi-host). `cache` is a 1-slot
    dict owned by the caller: the replicated variables are device_put once
    per distinct `variables` object (identity-keyed), so checkpoint walks
    re-replicate only when load_epoch swaps the dict. Shared by
    Infer.sample_videos_np and StoryGANDataset._generate_chunk — one place
    for the sharding rule, not two divergent copies."""
    batch_sh, repl = eval_shardings(mesh, arrays[0].shape[0])
    if batch_sh is None:
        return arrays, variables
    arrays = tuple(jax.device_put(a, batch_sh) for a in arrays)
    if cache.get("src") is not variables:
        cache["repl"] = jax.device_put(variables, repl)
        cache["src"] = variables
    return arrays, cache["repl"]


def shard_batch(batch: Any, mesh: Mesh, scan_axis: bool = False) -> Any:
    """Device-put a dict/pytree of host arrays with the batch axis sharded
    over the data axis (leading axis, or axis 1 under a scan_axis stack).
    Non-array leaves (e.g. text lists) are dropped.

    Multi-host: each process passes only its LOCAL slice of the global batch
    (see data/loader.py process_index/process_count) and the global array is
    assembled with `jax.make_array_from_process_local_data` — host data
    never crosses DCN; only gradients do."""
    sharding = batch_sharding(mesh, scan_axis=scan_axis)
    multihost = jax.process_count() > 1

    def put(x):
        if multihost:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    if isinstance(batch, dict):
        return {
            k: put(v)
            for k, v in batch.items()
            if isinstance(v, (np.ndarray, jax.Array))
        }
    # generic pytrees can't DROP leaves without changing tree structure, so
    # non-array leaves pass through unchanged (same filter, different
    # disposal — a device_put on e.g. a text list would TypeError)
    return jax.tree.map(
        lambda x: put(x) if isinstance(x, (np.ndarray, jax.Array)) else x, batch
    )


def pad_to_multiple(batch: dict, multiple: int) -> dict:
    """Pad the leading axis so it divides the mesh (repeat-edge padding);
    use only for eval paths where a partial final batch is acceptable."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            n = v.shape[0]
            pad = (-n) % multiple
            if pad:
                v = np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0)
        out[k] = v
    return out
