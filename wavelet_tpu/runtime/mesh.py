"""Device mesh and sharding helpers.

Replaces the reference's (absent) distributed backend with JAX-native SPMD:
a 1D ``data`` mesh axis over which box batches are sharded; XLA inserts the
ICI collectives for the global reductions (per-component min/max, threshold
histograms, RMSE means) that the reference computes serially
(preprocess.cpp:81-94, modes.cpp:283-291).

Multi-host: call :func:`init_distributed` before ``jax.devices()``; each host
then holds its shard of boxes and writes its shard of ``.xz`` outputs.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["data_mesh", "batch_sharding", "shard_batch", "init_distributed",
           "process_local_slice"]

DATA_AXIS = "data"


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize multi-host JAX (DCN across hosts, ICI within a slice).

    Explicit topology without a coordinator address is rejected rather
    than silently dropped: ``jax.distributed.initialize()`` in
    auto-detect mode would ignore the caller's num_processes/process_id
    and (on a rig without env-based detection) come up as a 1-process
    world, mis-partitioning every process_local_slice with no error."""
    if coordinator is None:
        if num_processes is not None or process_id is not None:
            raise ValueError(
                "num_processes/process_id require a coordinator address "
                "(coordinator=host:port); without one jax auto-detects "
                "the topology and would ignore them")
        jax.distributed.initialize()
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def data_mesh(devices=None) -> Mesh:
    """1D mesh over all (or the given) devices with a single ``data`` axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh; trailing axes replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(x, mesh: Mesh | None):
    """Device-put ``x`` sharded on its leading axis (or single-device if no
    mesh).  A leading axis not divisible by the mesh size falls back to the
    default single-device placement — the pipelines always pad to a mesh
    multiple, but direct API callers need not."""
    if mesh is None or mesh.size == 1:
        return jax.device_put(x)
    if x.shape[0] % mesh.size:
        return jax.device_put(x)
    return jax.device_put(x, batch_sharding(mesh))


def process_local_slice(n: int) -> slice:
    """This process's contiguous shard of ``n`` work items (multi-host fan-out:
    each host compresses and writes its own slice of the box list)."""
    p = jax.process_count()
    i = jax.process_index()
    per = -(-n // p)
    return slice(i * per, min(n, (i + 1) * per))
