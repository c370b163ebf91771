"""Device mesh + sharding helpers (the SPMD replacement for DDP).

The reference parallelizes with one process per GPU + NCCL DDP
(``train.py:272-294``, ``utils/pipeline_utils.py:78-88``).  The TPU-native
equivalent is single-program SPMD: one ``jax.sharding.Mesh`` with a ``data``
axis, batches sharded along it, parameters replicated, and the gradient
all-reduce inserted by XLA's sharding propagation over ICI.  No process
groups, ports, or barriers.

Multi-host (DCN) extends the same mesh via ``jax.distributed.initialize`` —
see :func:`init_distributed`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "init_distributed",
]


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (parameters, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """device_put a host batch with its leading axis sharded over the mesh."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def init_distributed(coordinator_address: str | None = None, **kwargs) -> None:
    """Initialize multi-host JAX (DCN rendezvous).

    On single-host this is a no-op; on a multi-host TPU slice it must run
    before any other JAX call.  Replaces the reference's TCP/NCCL rendezvous
    (``pipeline_utils.py:78-88``) — afterwards, ``jax.devices()`` spans the
    whole slice and the same SPMD code runs unchanged.
    """
    if coordinator_address is None:
        return
    # NOTE: must be the first JAX call in the process — do not touch any
    # backend-initializing API (jax.devices/process_count) before this.
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address, **kwargs)
    except RuntimeError as exc:  # already initialized (e.g. by the launcher)
        if "already" not in str(exc).lower():
            raise
