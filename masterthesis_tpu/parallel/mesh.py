"""Device mesh + sharding helpers.

TPU-native replacement for the reference's single-process
``torch.nn.DataParallel`` (src/models/core/functions.py:96-106): SPMD data
parallelism over a 1-D ``('data',)`` mesh. Params are replicated, batches
sharded on axis 0; XLA emits the gradient all-reduces over ICI inside the
jitted train step — no Python in the collective path. Multi-host scale-out
uses the same mesh over all processes' devices after
``jax.distributed.initialize`` (DCN for host orchestration, ICI for
collectives).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), ("data",))


def make_mesh_2d(data: int, spatial: int, devices=None) -> Mesh:
    """2-D (data, spatial) mesh: batch sharded on 'data', image height sharded
    on 'spatial'. Spatial sharding is this conv workload's analogue of
    sequence/context parallelism (SURVEY.md §5): XLA GSPMD spatially
    partitions every conv and inserts the halo exchanges over ICI — useful
    when a single high-resolution image exceeds one chip's HBM."""
    if devices is None:
        devices = jax.devices()
    devices = np.array(devices[: data * spatial]).reshape(data, spatial)
    return Mesh(devices, ("data", "spatial"))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC images: batch over 'data', H over 'spatial'."""
    return NamedSharding(mesh, P("data", "spatial"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / train state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def init_distributed() -> None:
    """Multi-host init over DCN (no-op single-process)."""
    try:
        jax.distributed.initialize()
    except Exception:
        pass
