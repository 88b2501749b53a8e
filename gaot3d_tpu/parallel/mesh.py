"""Device mesh construction.

Replaces the reference's NCCL process-group bootstrap
(src/trainer/base.py:87-131 init_distributed_mode): no env-var rank dance,
no barriers — a jax.sharding.Mesh with a 'data' axis (batch / DP) and a
'node' axis (intra-sample point sharding, the new capability for 8-10M-node
DrivAerML meshes). Collectives ride ICI within a slice and DCN across slices,
inserted by XLA from sharding annotations.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
NODE_AXIS = "node"


def make_mesh(
    data: Optional[int] = None,
    node: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """2-D mesh (data, node). `data=None` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = max(1, len(devices) // node)
    n = data * node
    if n > len(devices):
        raise ValueError(f"mesh ({data}x{node}) needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(data, node)
    return Mesh(arr, (DATA_AXIS, NODE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, shard_nodes: bool = False) -> NamedSharding:
    """[B, N, ...] arrays: B over 'data', optionally N over 'node'."""
    if shard_nodes:
        return NamedSharding(mesh, P(DATA_AXIS, NODE_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))
