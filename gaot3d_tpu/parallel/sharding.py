"""Sharded training steps.

Replaces the reference's DistributedDataParallel wrap + implicit gradient
all-reduce (src/trainer/stat.py:431-436, NCCL backend base.py:125-131) with
GSPMD sharding annotations:

  - data parallelism: batch axis B sharded over the 'data' mesh axis; params
    replicated; XLA inserts the gradient all-reduce (psum) over ICI.
  - node sharding (NEW capability vs the reference, whose per-sample memory
    ceiling is one GPU): the point axis N is additionally sharded over the
    'node' mesh axis. The encoder's segment-reduce onto the (replicated)
    latent grid becomes a partial-sum + psum; the decoder's gather-form
    reduction is embarrassingly parallel over the point shard. Both fall out
    of the sharding annotations — no hand-written collectives in the model.

The loss is a masked mean over global valid nodes, so gradients are exact
regardless of how nodes/batches are distributed.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.pipeline import PointBatch
from .mesh import DATA_AXIS, NODE_AXIS, batch_sharding, replicated


def point_batch_shardings(mesh: Mesh, shard_nodes: bool) -> PointBatch:
    """A PointBatch of NamedShardings matching PointBatch's array ranks."""
    bn = P(DATA_AXIS, NODE_AXIS) if shard_nodes else P(DATA_AXIS)
    return PointBatch(
        pos=NamedSharding(mesh, bn + (None,) if isinstance(bn, tuple) else bn),
        feats=NamedSharding(mesh, bn),
        target=NamedSharding(mesh, bn),
        node_mask=NamedSharding(mesh, bn),
        num_nodes=NamedSharding(mesh, P(DATA_AXIS)),
    )


def shard_point_batch(batch: PointBatch, mesh: Mesh, shard_nodes: bool = False) -> PointBatch:
    """Place a host PointBatch onto the mesh with (data[, node]) sharding."""
    bn = P(DATA_AXIS, NODE_AXIS) if shard_nodes else P(DATA_AXIS)
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))
    return PointBatch(
        pos=put(batch.pos, bn),
        feats=put(batch.feats, bn),
        target=put(batch.target, bn),
        node_mask=put(batch.node_mask, bn),
        num_nodes=put(batch.num_nodes, P(DATA_AXIS)),
    )


def make_sharded_train_step(
    train_step: Callable,
    mesh: Mesh,
    shard_nodes: bool = False,
    donate_state: bool = True,
):
    """Wrap a pure (state, batch, rng) -> (state, loss) step with GSPMD
    shardings: params/state replicated, batch sharded. XLA inserts all
    collectives (gradient psum over 'data', segment-reduce psum over 'node')."""
    bn = P(DATA_AXIS, NODE_AXIS) if shard_nodes else P(DATA_AXIS)
    batch_spec = PointBatch(
        pos=bn, feats=bn, target=bn, node_mask=bn, num_nodes=P(DATA_AXIS)
    )
    state_spec = None  # replicated (inferred)

    in_shardings = (
        state_spec,
        jax.tree.map(lambda spec: NamedSharding(mesh, spec), batch_spec,
                     is_leaf=lambda x: isinstance(x, P)),
        NamedSharding(mesh, P()),
    )
    out_shardings = (None, NamedSharding(mesh, P()))
    return jax.jit(
        train_step,
        in_shardings=in_shardings,
        out_shardings=out_shardings,
        donate_argnums=(0,) if donate_state else (),
    )
