"""Edge sampling over static edge slots.

Replaces the reference's `apply_neighbor_sampling`
(src/model/layers/magno.py:297-371): 'ratio' = global Bernoulli edge dropout
(train-only), 'max_neighbors' = per-query random downsample to <= k edges.
The reference's max_neighbors path is a Python loop over queries (warned slow,
magno.py:397); here both are O(E) / O(E log E) vectorized device ops.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .grid_graph import EdgeSlots


def dropout_edges(slots: EdgeSlots, rate: float, rng: jax.Array) -> EdgeSlots:
    """Bernoulli keep-mask with keep prob (1 - rate) — the 'ratio' strategy
    (reference magno.py:360-368 via PyG dropout_edge)."""
    keep = jax.random.bernoulli(rng, p=1.0 - rate, shape=slots.mask.shape)
    return EdgeSlots(lat_idx=slots.lat_idx, mask=slots.mask & keep)


def _rank_within_segment(seg_ids: jnp.ndarray, mask: jnp.ndarray,
                         order_key: jnp.ndarray,
                         num_segments: Optional[int] = None) -> jnp.ndarray:
    """Rank of each edge within its segment, ordered by `order_key` (flat arrays).

    Invalid edges get a rank of E (never kept). Sort-based; O(E log E).

    num_segments: exclusive upper bound on REAL segment ids — the invalid-edge
    sentinel must exceed every real id. The edge count E is NOT a valid
    sentinel: with few points against a large latent grid (E = N*K < M), a
    real latent token id equal to E would share the sentinel's sort group and
    its edges would be spuriously capped. Falls back to max(seg)+1 when the
    bound isn't supplied.
    """
    E = seg_ids.shape[0]
    if num_segments is not None:
        big = jnp.asarray(num_segments, seg_ids.dtype)
    else:
        big = jnp.max(seg_ids) + 1
    keyed_seg = jnp.where(mask, seg_ids, big)
    # lexicographic sort by (segment, order_key)
    perm = jnp.lexsort((order_key, keyed_seg))
    sorted_seg = keyed_seg[perm]
    idx = jnp.arange(E)
    is_start = jnp.concatenate([jnp.array([True]), sorted_seg[1:] != sorted_seg[:-1]])
    start_idx = jnp.where(is_start, idx, 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, start_idx)
    sorted_rank = idx - seg_start
    rank = jnp.zeros(E, dtype=jnp.int32).at[perm].set(sorted_rank.astype(jnp.int32))
    return jnp.where(mask, rank, E)


def cap_per_query_scatter(
    slots: EdgeSlots,
    cap: int,
    rng: Optional[jax.Array] = None,
    num_segments: Optional[int] = None,
) -> EdgeSlots:
    """Keep at most `cap` edges per *latent* query (scatter/encoder side).

    rng=None keeps the first `cap` in slot order (deterministic, mirrors PyG
    radius' max_num_neighbors truncation); with rng, keeps a uniform random
    subset (the reference 'max_neighbors' strategy, magno.py:330-357).
    num_segments: the latent token count (see _rank_within_segment).
    """
    shape = slots.mask.shape
    seg = slots.lat_idx.reshape(-1)
    mask = slots.mask.reshape(-1)
    if rng is None:
        key = jnp.arange(seg.shape[0], dtype=jnp.int32)
    else:
        key = jax.random.uniform(rng, (seg.shape[0],))
    rank = _rank_within_segment(seg, mask, key, num_segments=num_segments)
    new_mask = mask & (rank < cap)
    return EdgeSlots(lat_idx=slots.lat_idx, mask=new_mask.reshape(shape))


def cap_per_query_gather(
    slots: EdgeSlots,
    cap: int,
    rng: Optional[jax.Array] = None,
) -> EdgeSlots:
    """Keep at most `cap` edges per *point* query (gather/decoder side): each
    row of the slot array IS a query's neighbor list, so the cap is a masked
    cumulative count along K. With rng, slots are randomly prioritized."""
    mask = slots.mask
    if rng is None:
        order = jnp.broadcast_to(jnp.arange(mask.shape[-1]), mask.shape)
    else:
        order = jax.random.uniform(rng, mask.shape)
    big = jnp.asarray(jnp.inf, jnp.float32)
    keyed = jnp.where(mask, order.astype(jnp.float32), big)
    # rank slots within each row by priority
    rank = jnp.argsort(jnp.argsort(keyed, axis=-1), axis=-1)
    new_mask = mask & (rank < cap)
    return EdgeSlots(lat_idx=slots.lat_idx, mask=new_mask)
