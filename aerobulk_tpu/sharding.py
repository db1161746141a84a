"""Device-mesh / sharding utilities.

The reference has no parallelism at all — it is a single-threaded per-rank
library whose host GCM decomposes the domain (SURVEY.md §2.4).  The
TPU-native equivalent is pure data parallelism over the (y, x) grid via
``jax.sharding``: the flux computation is pointwise (no stencils, no halo
exchange), so a NamedSharding over grid axes scales over ICI/DCN with zero
collectives in the forward pass.  The warm-layer :class:`SkinState` shards
identically to the inputs and never needs communication.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["init_distributed", "make_grid_mesh", "grid_sharding",
           "shard_grid_inputs", "replicated"]


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Initialize multi-host JAX (thin ``jax.distributed`` wrapper).

    Call once per host before building the mesh; afterwards
    ``jax.devices()`` spans the whole pod slice and
    :func:`make_grid_mesh` + :func:`grid_sharding` work unchanged — the
    flux computation needs no further multi-host awareness (it compiles
    collective-free, docs/SCALING.md).  No-ops on single-process setups
    with auto-detectable environments (GKE/Cloud TPU set the env vars).
    """
    kw = {}
    if coordinator_address is not None:
        kw.update(coordinator_address=coordinator_address,
                  num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kw)


def make_grid_mesh(devices=None, shape: Optional[tuple] = None,
                   axis_names=("gy", "gx")) -> Mesh:
    """Build a (possibly 2-D) mesh over grid axes.

    With ``shape=None`` the devices form a 1-D mesh over ``gx`` — the
    right default for the pointwise flux workload where only total device
    count matters.  Pass e.g. ``shape=(2, 4)`` for a 2-D decomposition.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if shape is None:
        shape = (1, devices.size)
    return Mesh(devices.reshape(shape), axis_names)


def grid_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """NamedSharding partitioning the trailing two array axes over the mesh.

    1-D fields shard over ``gx`` only; 2-D (y, x) fields over both axes;
    leading time/batch axes are replicated (each step is scanned anyway).
    """
    if ndim == 1:
        spec = P("gx")
    else:
        spec = P(*([None] * (ndim - 2)), "gy", "gx")
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_grid_inputs(mesh: Mesh, tree):
    """Device-put every array leaf of ``tree`` with a grid sharding."""
    def put(x):
        x = jax.numpy.asarray(x)
        return jax.device_put(x, grid_sharding(mesh, x.ndim))
    return jax.tree_util.tree_map(put, tree)
