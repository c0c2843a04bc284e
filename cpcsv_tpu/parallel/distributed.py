"""Multi-host (multi-slice / DCN) runtime support.

The reference has no distributed story at all (SURVEY §2.8: single-process
`nn.parallel.data_parallel`, no torch.distributed). The TPU-native
equivalent named by SURVEY §2.8 is the `jax.distributed` runtime: one
process per host, a global `Mesh` spanning every chip, XLA lowering
gradient all-reduces onto ICI within a slice and DCN across slices, and a
PER-HOST input pipeline (each host loads only its shard of the global
batch; `jax.make_array_from_process_local_data` assembles the global
array view).

Single-process runs (all tests, the 1-chip bench, the CPU virtual mesh) are
unaffected: every entry point here is a no-op unless a coordinator is
configured.
"""

from __future__ import annotations

import os

import jax


def _is_initialized() -> bool:
    check = getattr(jax.distributed, "is_initialized", None)
    if check is not None:
        return bool(check())
    from jax._src import distributed as _dist  # older jax: no public probe

    return getattr(_dist.global_state, "client", None) is not None


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Start the jax.distributed runtime (idempotent: a second call is a
    no-op — jax.distributed.initialize itself RAISES on reinitialization,
    so callers layering CLI + library entry points need this guard).

    With no arguments, jax auto-detects cluster parameters on TPU pods
    (GCE metadata). Call BEFORE any other jax API touches the backend.
    """
    if _is_initialized():
        return
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def maybe_initialize_from_env() -> bool:
    """CLI hook: initialize the distributed runtime when the environment
    asks for it. Returns True if initialization ran.

    Triggers (first match wins):
      * CPCSV_DISTRIBUTED=1            -> auto-detected TPU-pod init
      * CPCSV_COORDINATOR=host:port    -> explicit coordinator, with
        CPCSV_NUM_PROCESSES / CPCSV_PROCESS_ID
    """
    coord = os.environ.get("CPCSV_COORDINATOR")
    if coord:
        num = os.environ.get("CPCSV_NUM_PROCESSES")
        pid = os.environ.get("CPCSV_PROCESS_ID")
        if num is None or pid is None:
            raise RuntimeError(
                "CPCSV_COORDINATOR is set but "
                f"{'CPCSV_NUM_PROCESSES' if num is None else 'CPCSV_PROCESS_ID'}"
                " is missing — a half-configured multi-host environment"
            )
        initialize_distributed(
            coordinator_address=coord,
            num_processes=int(num),
            process_id=int(pid),
        )
        return True
    if os.environ.get("CPCSV_DISTRIBUTED") == "1":
        initialize_distributed()
        return True
    return False


def process_info() -> tuple[int, int]:
    """(process_index, process_count) — (0, 1) in single-process runs."""
    return jax.process_index(), jax.process_count()
