"""Masked segment reductions over static-shape edge slots.

TPU-native replacement for torch_scatter.scatter / segment_csr
(reference call sites: src/model/layers/integral_transform.py:165-171,
src/model/layers/geoembed.py:133-148, src/model/layers/utils/scatter_native.py).

All ops take flat per-edge data plus an integer segment id per edge and a boolean
validity mask, with a *static* number of segments — invalid edges contribute the
reduction identity. Built on jax.ops.segment_* which XLA lowers to efficient
TPU sort/scan scatter code; the Pallas bucketed variants can override these for
the hot path without changing callers.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _masked(data: jnp.ndarray, mask: Optional[jnp.ndarray], fill: float) -> jnp.ndarray:
    if mask is None:
        return data
    m = mask
    while m.ndim < data.ndim:
        m = m[..., None]
    return jnp.where(m, data, jnp.asarray(fill, data.dtype))


def _seg_ids(segment_ids: jnp.ndarray, mask: Optional[jnp.ndarray], num_segments: int) -> jnp.ndarray:
    """Route invalid edges to an out-of-range segment (dropped by segment ops)."""
    if mask is None:
        return segment_ids
    return jnp.where(mask, segment_ids, num_segments)


def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    ids = _seg_ids(segment_ids, mask, num_segments)
    out = jax.ops.segment_sum(_masked(data, mask, 0.0), ids, num_segments=num_segments + 1)
    return out[:num_segments]


def segment_count(
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    ones = jnp.ones(segment_ids.shape, dtype=dtype)
    return segment_sum(ones, segment_ids, num_segments, mask=mask)


def segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean per segment; empty segments produce 0 (matches torch_scatter 'mean'
    semantics used by the reference GNO reduction, integral_transform.py:163-171)."""
    total = segment_sum(data, segment_ids, num_segments, mask=mask)
    count = segment_count(segment_ids, num_segments, mask=mask, dtype=total.dtype)
    count = jnp.maximum(count, 1.0)
    shape = count.shape + (1,) * (total.ndim - count.ndim)
    return total / count.reshape(shape)


def segment_max(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    empty_value: float = 0.0,
) -> jnp.ndarray:
    """Max per segment; empty segments produce `empty_value` (torch_scatter 'max'
    fills empty segments with 0 in the reference's usage, geoembed.py:213)."""
    neg_inf = jnp.asarray(-jnp.inf, data.dtype)
    ids = _seg_ids(segment_ids, mask, num_segments)
    filled = _masked(data, mask, -jnp.inf)
    out = jax.ops.segment_max(filled, ids, num_segments=num_segments + 1)[:num_segments]
    return jnp.where(out == neg_inf, jnp.asarray(empty_value, data.dtype), out)


# ---------------------------------------------------------------------------
# Sort-based segmented folds: the TPU fast path.
#
# XLA lowers unsorted scatter-add (what jax.ops.segment_sum becomes) to a
# serialized update loop on TPU — measured at ~8.4s for the 500K-node encoder
# forward. Sorting the edges by destination once per chunk turns every
# segment reduction into sort + cumsum + boundary gather, all of which are
# fast vectorized TPU ops:  sum_m = Z[start[m+1]] - Z[start[m]] where Z is the
# exclusive prefix sum of destination-sorted edge values. Max uses a segmented
# cummax (associative_scan with a segment-reset combiner).
# ---------------------------------------------------------------------------
from typing import NamedTuple


class SegmentFoldCtx(NamedTuple):
    perm: jnp.ndarray  # [E] destination-sorted edge order (invalid edges last)
    sorted_seg: jnp.ndarray  # [E] segment id per sorted edge (S for invalid)
    starts: jnp.ndarray  # [S+1] boundary index of each segment in sorted order
    valid: jnp.ndarray  # [E] bool per sorted edge
    key: jnp.ndarray  # [E] keyed segment id in ORIGINAL edge order (S=invalid)


def make_segment_fold(
    segment_ids: jnp.ndarray, num_segments: int, mask: Optional[jnp.ndarray] = None
) -> SegmentFoldCtx:
    """Sort edges by (validity-keyed) destination; O(E log E), once per chunk,
    amortized over every reduction that shares the segment ids."""
    E = segment_ids.shape[0]
    key = segment_ids if mask is None else jnp.where(mask, segment_ids, num_segments)
    perm = jnp.argsort(key)
    sorted_seg = key[perm]
    starts = jnp.searchsorted(sorted_seg, jnp.arange(num_segments + 1, dtype=sorted_seg.dtype))
    return SegmentFoldCtx(
        perm=perm.astype(jnp.int32),
        sorted_seg=sorted_seg,
        starts=starts.astype(jnp.int32),
        valid=sorted_seg < num_segments,
        key=key,
    )


import numpy as _np


def _float0(x):
    return _np.zeros(x.shape, dtype=jax.dtypes.float0)


@jax.custom_vjp
def _fold_sum_p(data, perm, starts, valid, key):
    from .pallas_kernels import cumsum_fast

    sd = data[perm]
    sd = jnp.where(valid[:, None] if sd.ndim == 2 else valid, sd, 0)
    z = cumsum_fast(sd if sd.ndim == 2 else sd[:, None])
    if sd.ndim == 1:
        z = z[:, 0]
    zpad = jnp.concatenate([jnp.zeros_like(z[:1]), z], axis=0)
    out = zpad[starts[1:]] - zpad[starts[:-1]]
    return out.astype(data.dtype)


def _fold_sum_fwd(data, perm, starts, valid, key):
    return _fold_sum_p(data, perm, starts, valid, key), (perm, starts, valid, key)


def _fold_sum_bwd(res, ct):
    # d out[m] / d data[e] = 1 iff key[e] == m: the backward of a segment sum
    # is a pure GATHER ct[key] (never a scatter — scatter-add is the slow path
    # on TPU that the fold exists to avoid).
    perm, starts, valid, key = res
    S = ct.shape[0]
    safe = jnp.clip(key, 0, S - 1)
    d = ct[safe]
    kv = key < S
    d = jnp.where(kv[:, None] if d.ndim == 2 else kv, d, 0)
    return (d, _float0(perm), _float0(starts), _float0(valid), _float0(key))


_fold_sum_p.defvjp(_fold_sum_fwd, _fold_sum_bwd)


def fold_sum(ctx: SegmentFoldCtx, data: jnp.ndarray) -> jnp.ndarray:
    """data: [E, C] (unsorted edge order) -> [S, C] segment sums.
    Custom VJP: backward is one gather, not a scatter."""
    return _fold_sum_p(data, ctx.perm, ctx.starts, ctx.valid, ctx.key)


def make_segment_fold_presorted(
    segment_ids: jnp.ndarray, num_segments: int, mask: Optional[jnp.ndarray] = None
) -> SegmentFoldCtx:
    """SegmentFoldCtx for edges ALREADY sorted ascending by destination with
    invalid edges packed last (the FlatEdgeChunks layout from
    flatten_slots_host): no argsort, and fold_sum_sorted skips the permutation
    gather entirely. The masked key (invalid -> num_segments) preserves sorted
    order because padding sits at the tail."""
    E = segment_ids.shape[0]
    key = segment_ids if mask is None else jnp.where(mask, segment_ids, num_segments)
    starts = jnp.searchsorted(key, jnp.arange(num_segments + 1, dtype=key.dtype))
    return SegmentFoldCtx(
        perm=jnp.arange(E, dtype=jnp.int32),
        sorted_seg=key,
        starts=starts.astype(jnp.int32),
        valid=key < num_segments,
        key=key,
    )


@jax.custom_vjp
def _fold_sum_sorted_p(data, starts, valid, key):
    from .pallas_kernels import cumsum_fast

    sd = jnp.where(valid[:, None] if data.ndim == 2 else valid, data, 0)
    z = cumsum_fast(sd if sd.ndim == 2 else sd[:, None])
    if data.ndim == 1:
        z = z[:, 0]
    zpad = jnp.concatenate([jnp.zeros_like(z[:1]), z], axis=0)
    out = zpad[starts[1:]] - zpad[starts[:-1]]
    return out.astype(data.dtype)


def _fold_sum_sorted_fwd(data, starts, valid, key):
    return _fold_sum_sorted_p(data, starts, valid, key), (starts, valid, key)


def _fold_sum_sorted_bwd(res, ct):
    starts, valid, key = res
    S = ct.shape[0]
    safe = jnp.clip(key, 0, S - 1)
    d = ct[safe]
    kv = key < S
    d = jnp.where(kv[:, None] if d.ndim == 2 else kv, d, 0)
    return (d, _float0(starts), _float0(valid), _float0(key))


_fold_sum_sorted_p.defvjp(_fold_sum_sorted_fwd, _fold_sum_sorted_bwd)


def fold_sum_sorted(ctx: SegmentFoldCtx, data: jnp.ndarray) -> jnp.ndarray:
    """fold_sum for a presorted ctx (make_segment_fold_presorted): data is
    consumed in place — no permutation gather fwd, one gather bwd."""
    return _fold_sum_sorted_p(data, ctx.starts, ctx.valid, ctx.key)


@jax.custom_vjp
def _fold_sum_tile_p(data, perm, sorted_seg, starts, key):
    from .pallas_kernels import tile_segment_sum

    sd = jnp.take(data, perm, axis=0)
    squeeze = sd.ndim == 1
    if squeeze:
        sd = sd[:, None]
    out = tile_segment_sum(sd, sorted_seg, starts)
    if squeeze:
        out = out[:, 0]
    return out.astype(data.dtype)


def _fold_sum_tile_fwd(data, perm, sorted_seg, starts, key):
    out = _fold_sum_tile_p(data, perm, sorted_seg, starts, key)
    return out, (perm, sorted_seg, starts, key)


def _fold_sum_tile_bwd(res, ct):
    # identical backward to _fold_sum_p: pure gather ct[key], never a scatter
    perm, sorted_seg, starts, key = res
    S = starts.shape[0] - 1
    safe = jnp.clip(key, 0, S - 1)
    d = ct[safe]
    kv = key < S
    d = jnp.where(kv[:, None] if d.ndim == 2 else kv, d, 0)
    return (d, _float0(perm), _float0(sorted_seg), _float0(starts), _float0(key))


_fold_sum_tile_p.defvjp(_fold_sum_tile_fwd, _fold_sum_tile_bwd)


def fold_sum_tile(ctx: SegmentFoldCtx, data: jnp.ndarray) -> jnp.ndarray:
    """fold_sum via the Pallas tile segment-sum (MXU one-hot matmul over
    destination-sorted blocks; ops/pallas_kernels.py). Same contract and
    backward as fold_sum; on non-TPU backends it degrades to the cumsum fold."""
    return _fold_sum_tile_p(data, ctx.perm, ctx.sorted_seg, ctx.starts, ctx.key)


# --- lite tile fold: tile boundaries only (no [S+1] starts) -----------------
#
# make_segment_fold's searchsorted emits one binary search per SEGMENT
# (S ~ 131K for the drivaernet latent grid); the tile kernel only consumes
# ~S/512 tile boundaries. The lite fold computes exactly those, and the
# overflow fallback inside tile_segment_sum computes the full starts lazily
# (only when its lax.cond branch is actually taken).


class TileFold(NamedTuple):
    perm: jnp.ndarray  # [E] destination-sorted edge order (invalid last)
    sorted_seg: jnp.ndarray  # [E] segment id per sorted edge (S for invalid)
    ts: jnp.ndarray  # [T+1] edge row of each segment-tile boundary
    key: jnp.ndarray  # [E] keyed segment id in ORIGINAL edge order


def make_tile_fold(
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    seg_tile: int = 512,
) -> TileFold:
    from .pallas_kernels import tile_boundaries

    key = segment_ids if mask is None else jnp.where(mask, segment_ids, num_segments)
    perm = jnp.argsort(key)
    sorted_seg = key[perm]
    return TileFold(
        perm=perm.astype(jnp.int32),
        sorted_seg=sorted_seg.astype(jnp.int32),
        ts=tile_boundaries(sorted_seg, num_segments, seg_tile),
        key=key,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fold_sum_tile_lite_p(data, perm, sorted_seg, ts, key, num_segments, seg_tile):
    from .pallas_kernels import tile_segment_sum

    sd = jnp.take(data, perm, axis=0)
    squeeze = sd.ndim == 1
    if squeeze:
        sd = sd[:, None]
    out = tile_segment_sum(
        sd, sorted_seg, ts=ts, num_segments=num_segments, seg_tile=seg_tile
    )
    if squeeze:
        out = out[:, 0]
    return out.astype(data.dtype)


def _fold_sum_tile_lite_fwd(data, perm, sorted_seg, ts, key, num_segments, seg_tile):
    out = _fold_sum_tile_lite_p(data, perm, sorted_seg, ts, key, num_segments, seg_tile)
    return out, (perm, sorted_seg, ts, key)


def _fold_sum_tile_lite_bwd(num_segments, seg_tile, res, ct):
    perm, sorted_seg, ts, key = res
    safe = jnp.clip(key, 0, num_segments - 1)
    d = ct[safe]
    kv = key < num_segments
    d = jnp.where(kv[:, None] if d.ndim == 2 else kv, d, 0)
    return (d, _float0(perm), _float0(sorted_seg), _float0(ts), _float0(key))


_fold_sum_tile_lite_p.defvjp(_fold_sum_tile_lite_fwd, _fold_sum_tile_lite_bwd)


def fold_sum_tile_lite(
    tf: TileFold, data: jnp.ndarray, num_segments: int, seg_tile: int = 512
) -> jnp.ndarray:
    """fold_sum via the Pallas tile kernel using tile boundaries only."""
    return _fold_sum_tile_lite_p(
        data, tf.perm, tf.sorted_seg, tf.ts, tf.key, num_segments, seg_tile
    )


def fold_count(ctx: SegmentFoldCtx, dtype=jnp.float32) -> jnp.ndarray:
    return (ctx.starts[1:] - ctx.starts[:-1]).astype(dtype)


def fold_mean(ctx: SegmentFoldCtx, data: jnp.ndarray) -> jnp.ndarray:
    total = fold_sum(ctx, data)
    cnt = jnp.maximum(fold_count(ctx, total.dtype), 1.0)
    return total / cnt.reshape(cnt.shape + (1,) * (total.ndim - 1))


def fold_max(ctx: SegmentFoldCtx, data: jnp.ndarray, empty_value: float = 0.0) -> jnp.ndarray:
    """data: [E] or [E, C] -> [S(, C)] segment max via segmented cummax."""
    sd = data[ctx.perm]
    valid = ctx.valid if sd.ndim == 1 else ctx.valid[:, None]
    sd = jnp.where(valid, sd, -jnp.inf)
    extra = (1,) * (sd.ndim - 1)
    seg = ctx.sorted_seg.reshape(ctx.sorted_seg.shape + extra)

    def combine(a, b):
        (ma, sa) = a
        (mb, sb) = b
        return (jnp.where(sa == sb, jnp.maximum(ma, mb), mb), jnp.broadcast_to(sb, sa.shape))

    cmax, _ = jax.lax.associative_scan(
        combine, (sd, jnp.broadcast_to(seg, sd.shape).astype(jnp.int32))
    )
    # segment max = running max at the last row of the segment
    last = jnp.maximum(ctx.starts[1:] - 1, 0)
    out = cmax[last]
    nonempty = ctx.starts[1:] > ctx.starts[:-1]
    nonempty = nonempty if out.ndim == 1 else nonempty[:, None]
    return jnp.where(nonempty, out, jnp.asarray(empty_value, data.dtype))


@jax.custom_vjp
def gather_table(table, idx, mask):
    """Masked row gather table[idx] with a FOLD-based backward.

    The AD backward of a gather is a scatter-add (duplicate indices), which is
    the serialized slow path on TPU. Here the backward builds a segment fold
    over the gather indices (sort + cumsum + boundary diff) instead — the
    decoder's latent-feature gathers get a fast backward for free.
    table: [S, C]; idx: [E]; mask: [E] -> [E, C] (masked rows are 0).
    """
    safe = jnp.clip(idx, 0, table.shape[0] - 1)
    out = table[safe]
    return jnp.where(mask[:, None], out, 0)


def _gather_table_fwd(table, idx, mask):
    return gather_table(table, idx, mask), (idx, mask, table.shape[0])


def _gather_table_bwd(res, ct):
    idx, mask, S = res
    # Plain scatter segment-sum. Round 1 used a sort-based fold here because
    # scatter-add was 68ms per 786K-edge chunk at K=48; with slot compaction
    # (budget ~8) the chunk is 524K edges and scatter costs 11.3ms — CHEAPER
    # than any sorted scheme, whose [E, C] perm-gather alone costs 10.3ms
    # (both are row-latency bound; measured v5e, see CLAUDE.md).
    d_table = segment_sum(ct, idx, S, mask)
    return (d_table, _float0(idx), _float0(mask))


gather_table.defvjp(_gather_table_fwd, _gather_table_bwd)


def segment_softmax(
    scores: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Numerically-stable per-segment softmax over edges
    (reference: integral_transform.py:68-78 `_segment_softmax_pyg`).

    Returns a weight per edge; invalid edges get weight 0.
    """
    smax = segment_max(scores, segment_ids, num_segments, mask=mask, empty_value=0.0)
    shifted = scores - smax[segment_ids]
    exp = jnp.exp(shifted)
    if mask is not None:
        exp = jnp.where(mask, exp, 0.0)
    denom = segment_sum(exp, segment_ids, num_segments, mask=mask)
    tiny = jnp.finfo(scores.dtype).tiny
    denom = jnp.maximum(denom, tiny)
    w = exp / denom[segment_ids]
    if mask is not None:
        w = jnp.where(mask, w, 0.0)
    return w


# ---------------------------------------------------------------------------
# Pallas sorted-segment-sum integration (flat_dst layouts)
# ---------------------------------------------------------------------------

def _pick_mt(num_segments: int) -> int:
    """Largest latent-tile height in {512..8} dividing num_segments (the
    pallas kernel's out-block constraint)."""
    for mt in (512, 256, 128, 64, 32, 16, 8):
        if num_segments % mt == 0:
            return mt
    raise ValueError(f"num_segments {num_segments} has no tile divisor >= 8")


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _pallas_sum_sorted_b(num_segments, passes, data_be, key_be):
    """Batched presorted segment sum on the Pallas one-hot-MXU kernel
    (ops/pallas_segment.py), without vmap: batches ride a SEGMENT-ID STRIDE.

    data_be [B, E, P], key_be [B, E] nondecreasing per batch with invalid
    rows already mapped to num_segments. Batch b's ids shift by b*(M+mt):
    the invalid sentinel M lands in the [M, M+mt) dead zone BELOW batch
    b+1's base, so the concatenated [B*E] id stream stays globally sorted —
    the kernel's one contract. One kernel call reduces all batches;
    the dead-zone output rows are sliced off. -> [B, M, P]."""
    from .pallas_segment import segment_sum_sorted_pallas

    B, E, P = data_be.shape
    mt = _pick_mt(num_segments)
    S = num_segments + mt
    gkey = key_be.astype(jnp.int32) + (
        jnp.arange(B, dtype=jnp.int32) * S)[:, None]
    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    out = segment_sum_sorted_pallas(
        data_be.reshape(B * E, P), gkey.reshape(B * E), B * S,
        mt=mt, interpret=interpret, passes=passes)
    return out.reshape(B, S, P)[:, :num_segments]


def _pallas_sum_sorted_b_fwd(num_segments, passes, data_be, key_be):
    return _pallas_sum_sorted_b(num_segments, passes, data_be, key_be), key_be


def _pallas_sum_sorted_b_bwd(num_segments, passes, key_be, ct):
    # same gather backward as fold_sum_sorted: d/d(data[b,e]) = ct[b, key]
    safe = jnp.clip(key_be, 0, num_segments - 1)
    d = jnp.take_along_axis(ct, safe[..., None], axis=1)
    d = jnp.where((key_be < num_segments)[..., None], d, 0)
    return (d, _float0(key_be))


_pallas_sum_sorted_b.defvjp(_pallas_sum_sorted_b_fwd, _pallas_sum_sorted_b_bwd)


def pallas_segment_sum_presorted(
    data_be: jnp.ndarray,    # [B, E, P] f32, rows sorted by dst within batch
    seg_be: jnp.ndarray,     # [B, E] int, nondecreasing per batch
    mask_be: Optional[jnp.ndarray],  # [B, E] bool (invalid rows packed last)
    num_segments: int,
    passes: int = 2,
) -> jnp.ndarray:
    """Drop-in for the presorted fold (fold_sum_sorted over vmap) on the
    Pallas sorted-segment kernel: contiguous HBM reads/writes + one-hot MXU
    accumulation vs the row-latency-bound XLA scatter (on-chip A/B
    tools/microbench_segment.py: 3.7 vs 6.7 ms at the 500K chunk shape).
    Backward is the same single gather as the fold path — never a scatter.

    passes=2 (default) runs an explicit hi/lo bf16 split for ~5e-6 rel
    accuracy; on-chip it costs only +8% over the single bf16 pass (3.95 vs
    3.66 ms — the kernel is DMA-bound, so the extra MXU pass is nearly
    free) and the split is NOT folded by Mosaic (measured: rel err drops
    2e-3 -> 5e-6). passes=1 keeps the single pass for A/Bs."""
    key = seg_be if mask_be is None else jnp.where(
        mask_be, seg_be, num_segments)
    return _pallas_sum_sorted_b(num_segments, passes,
                                data_be.astype(jnp.float32),
                                key.astype(jnp.int32))
