"""Multi-host (multi-process) runtime: one JAX program per host, one
global device mesh across all of them.

The reference is a single-process CPU script (SURVEY.md §2.4 — no
distributed code at all); the TPU-native plan calls for data-parallel
scaling "across slices for multi-host input sharding" over DCN. This
module is that runtime layer:

  * :func:`initialize` — process-group bring-up. On TPU pods,
    ``jax.distributed.initialize()`` discovers everything from the TPU
    runtime; elsewhere (tests, CPU fleets) coordinator/process-count/rank
    come from arguments or the ``SD_COORDINATOR`` / ``SD_NUM_PROCESSES`` /
    ``SD_PROCESS_ID`` environment, with gloo cross-process collectives on
    the CPU backend.
  * :func:`global_mesh` — a ``('dp', 'tp')`` mesh over ALL processes'
    devices. Device order keeps each process's local devices contiguous,
    so the inner ``tp`` axis stays intra-process (ICI on real hardware)
    and only the outer ``dp`` axis crosses process boundaries (DCN) — the
    layout that keeps tensor-parallel collectives off the slow links.
  * :func:`shard_host_batch` — per-host input shards -> one global jax
    Array (multi-host input distribution: every process loads only its
    own slice of the batch; no host ever materializes the global batch).

Verified by tests/test_multihost.py, which spawns real worker processes
and checks a forward + a gradient step across the process group against
the single-process result.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_count: int | None = None) -> None:
    """Bring up the cross-process runtime (idempotent).

    With no arguments and no ``SD_*`` env, defers entirely to
    ``jax.distributed.initialize()`` auto-discovery (TPU pods). On the CPU
    backend, gloo collectives are enabled first — they must be configured
    before the backend exists.
    """
    coordinator = coordinator or os.environ.get("SD_COORDINATOR")
    if num_processes is None and "SD_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["SD_NUM_PROCESSES"])
    if process_id is None and "SD_PROCESS_ID" in os.environ:
        process_id = int(os.environ["SD_PROCESS_ID"])
    # NOTE: nothing before this point may touch the backend (even
    # jax.process_count() materializes it, after which the config updates
    # below are rejected).
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        return  # process group already up
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu") or (
            coordinator and num_processes):
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # older jaxlib without gloo: single-host only
            pass
    if local_device_count is not None:
        jax.config.update("jax_num_cpu_devices", local_device_count)
    if bool(coordinator) != (num_processes is not None):
        # A half-specified fleet must not silently run as disconnected
        # single-process jobs (every host would think it is process 0).
        raise ValueError(
            "multihost.initialize: coordinator and num_processes must be "
            f"given together (got coordinator={coordinator!r}, "
            f"num_processes={num_processes!r})")
    if coordinator and num_processes and num_processes > 1:
        if process_id is None:
            raise ValueError("multihost.initialize: process_id is required "
                             "with an explicit coordinator")
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    elif coordinator is None and num_processes is None:
        # TPU-pod auto-discovery; harmless no-op on a single host.
        try:
            jax.distributed.initialize()
        except Exception:
            pass


def global_mesh(tp: int = 1) -> Mesh:
    """('dp', 'tp') mesh over every device of every process. ``tp`` must
    divide the per-process device count so tensor-parallel groups never
    straddle a process boundary (tp rides ICI, dp rides DCN)."""
    devs = jax.devices()  # global, ordered by (process, local index)
    n_local = len(jax.local_devices())
    if tp > n_local or n_local % tp:
        raise ValueError(
            f"tp={tp} must divide the per-process device count {n_local} "
            f"(tensor-parallel groups must stay intra-process)")
    arr = np.asarray(devs).reshape(len(devs) // tp, tp)
    return Mesh(arr, ("dp", "tp"))


def shard_host_batch(mesh: Mesh, local_batch: np.ndarray,
                     spec: P | None = None) -> jax.Array:
    """Per-process local batch shard -> global Array sharded on 'dp'.

    Every process passes only ITS slice (global_batch_size /
    process_count rows); rows are laid out so that global row order
    follows process order. This is the multi-host input-distribution
    path: the global batch never exists on any single host."""
    spec = spec if spec is not None else P("dp")
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, local_batch)


def fold_in_process(seed: int) -> int:
    """Distinct per-process data seed (each host loads different rows).

    Stride is a large prime, NOT process_count: downstream loaders derive
    per-worker streams as seed+w (data/loader.PrefetchLoader), so adjacent
    per-process seeds would make host k's worker 1 duplicate host k+1's
    worker 0 — silently halving data diversity across the dp axis."""
    return seed + jax.process_index() * 100_003
