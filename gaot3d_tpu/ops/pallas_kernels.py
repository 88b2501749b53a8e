"""Pallas TPU kernels for the segment-fold hot path.

`prefix_sum`: single-pass inclusive cumsum over the row axis. XLA lowers
jnp.cumsum to a log-depth scan (~2*log2(E) HBM passes — measured ~5.8ms for a
[786K, 38] chunk ≈ 40GB/s effective); the TPU grid executes sequentially per
core, so a Pallas kernel carries the running total in VMEM scratch and touches
HBM exactly once each way (speed-of-light ≈ 0.3ms for the same chunk).

Only the forward is needed: fold_sum (ops/segment.py) wraps its internals in a
custom VJP whose backward is a plain gather, so this kernel is never
differentiated through.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _prefix_sum_kernel(x_ref, out_ref, carry_ref):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    x = x_ref[...].astype(jnp.float32)
    n = x.shape[0]
    # jnp.cumsum is not lowerable in Pallas TPU; use log-depth shift-accumulate
    # entirely in VMEM (Hillis-Steele scan).
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = 1
    while s < n:
        rolled = pltpu.roll(x, shift=s, axis=0)
        x = x + jnp.where(row >= s, rolled, 0.0)
        s *= 2
    cs = x + carry_ref[...]
    out_ref[...] = cs
    carry_ref[...] = cs[-1:, :]


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def prefix_sum(x: jnp.ndarray, block_rows: int = 4096, interpret: bool = False) -> jnp.ndarray:
    """Inclusive prefix sum over axis 0 of [E, C] float32 (single HBM pass)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    E, C = x.shape
    nb = -(-E // block_rows)
    pad = nb * block_rows - E
    xp = jnp.pad(x.astype(jnp.float32), ((0, pad), (0, 0))) if pad else x.astype(jnp.float32)
    out = pl.pallas_call(
        _prefix_sum_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((block_rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * block_rows, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, C), jnp.float32)],
        interpret=interpret,
    )(xp)
    return out[:E]


# ---------------------------------------------------------------------------
# Tile segment-sum: destination-sorted segment reduction on the MXU.
#
# XLA's unsorted scatter-add serializes per row (~68ms / 786K edges, channel-
# independent); the cumsum fold costs 3 extra HBM passes over [E, P] plus two
# [S, P] boundary gathers. This kernel reduces destination-SORTED edges
# directly: grid (segment_tile, edge_block_within_tile), scalar-prefetched
# block offsets locate each tile's edge rows, and the per-block partial sum is
# a one-hot [tile, block] x [block, P] matmul on the MXU into the output VMEM
# block (revisited across j, written back once per tile). HBM traffic is one
# read of [E, P] + one write of [S, P] — the speed-of-light for this op.
#
# Replaces the reference's torch_scatter reduction (src/model/layers/
# integral_transform.py:163-171) on the TPU fast path; reference has no
# counterpart kernel (CUDA atomics do this job there).
# ---------------------------------------------------------------------------


def _tile_segment_sum_kernel(seg_tile, edge_block, meta_ref, ts_ref, seg_ref, data_ref, out_ref):
    from jax.experimental import pallas as pl

    t = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    nb = meta_ref[1, t]

    @pl.when(j < nb)
    def _accumulate():
        base = (meta_ref[0, t] + j) * edge_block
        col = jax.lax.broadcasted_iota(jnp.int32, (1, edge_block), 1)
        row_g = base + col  # global edge row of each lane
        # rows owned by this segment tile (shared boundary blocks are visited
        # by both neighbouring tiles; each keeps only its own rows)
        valid = (row_g >= ts_ref[t]) & (row_g < ts_ref[t + 1])
        local = seg_ref[...] - t * seg_tile  # (1, bn) local segment id
        oh = (jax.lax.broadcasted_iota(jnp.int32, (seg_tile, edge_block), 0) == local) & valid
        # MXU matmuls run bf16 passes at default precision; the one-hot matrix
        # is exact in bf16, so split only the data into hi/lo bf16 halves —
        # two full-rate passes recover ~f32 accuracy (rel err ~2^-16) at 1/3
        # the cost of Precision.HIGHEST
        ohb = oh.astype(jnp.bfloat16)
        d = data_ref[...].astype(jnp.float32)
        d_hi = d.astype(jnp.bfloat16)
        d_lo = (d - d_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dims = (((1,), (0,)), ((), ()))
        out_ref[...] += jax.lax.dot_general(
            ohb, d_hi, dims, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(ohb, d_lo, dims, preferred_element_type=jnp.float32)


def _sorted_fold(sorted_data: jnp.ndarray, starts: jnp.ndarray, num_valid: jnp.ndarray) -> jnp.ndarray:
    """Cumsum+boundary-diff segment sum over destination-sorted rows (the XLA
    path; also the overflow fallback for tile_segment_sum)."""
    E = sorted_data.shape[0]
    keep = jnp.arange(E)[:, None] < num_valid
    sd = jnp.where(keep, sorted_data, 0)
    z = cumsum_fast(sd)
    zpad = jnp.concatenate([jnp.zeros_like(z[:1]), z], axis=0)
    return zpad[starts[1:]] - zpad[starts[:-1]]


@functools.partial(
    jax.jit, static_argnames=("num_segments", "seg_tile", "edge_block", "max_blocks", "interpret")
)
def _tile_segment_sum_call(
    sorted_data, sorted_seg, ts, num_segments, seg_tile, edge_block, max_blocks, interpret
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    E, P = sorted_data.shape
    S = num_segments
    T = -(-S // seg_tile)
    pad_e = (-E) % edge_block
    data_p = jnp.pad(sorted_data.astype(jnp.float32), ((0, pad_e), (0, 0))) if pad_e else sorted_data.astype(jnp.float32)
    seg_p = jnp.pad(sorted_seg.astype(jnp.int32), (0, pad_e), constant_values=S) if pad_e else sorted_seg.astype(jnp.int32)

    blk0 = ts[:-1] // edge_block
    nonempty = ts[1:] > ts[:-1]
    nblk = jnp.where(nonempty, (ts[1:] - 1) // edge_block - blk0 + 1, 0).astype(jnp.int32)
    meta = jnp.stack([blk0.astype(jnp.int32), nblk])  # [2, T]

    def pallas_path(_):
        def seg_idx(t, j, meta_ref, ts_ref):
            nb1 = jnp.maximum(meta_ref[1, t] - 1, 0)
            return (0, meta_ref[0, t] + jnp.minimum(j, nb1))

        def data_idx(t, j, meta_ref, ts_ref):
            nb1 = jnp.maximum(meta_ref[1, t] - 1, 0)
            return (meta_ref[0, t] + jnp.minimum(j, nb1), 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T, max_blocks),
            in_specs=[
                pl.BlockSpec((1, edge_block), seg_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((edge_block, P), data_idx, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((seg_tile, P), lambda t, j, m, s: (t, 0), memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            functools.partial(_tile_segment_sum_kernel, seg_tile, edge_block),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((T * seg_tile, P), jnp.float32),
            interpret=interpret,
        )(meta, ts, seg_p[None, :], data_p)
        return out[:S]

    def fallback_path(_):
        # rare path (a tile overflowed max_blocks): the full per-segment
        # boundaries are computed HERE so the common path never pays the
        # S-point searchsorted (S ~ 131K vs T+1 ~ 257 tile boundaries)
        starts = _full_starts(seg_p[:E], S)
        return _sorted_fold(data_p[:E], starts, ts[-1])

    overflow = jnp.max(nblk) > max_blocks
    return jax.lax.cond(overflow, fallback_path, pallas_path, None)


def _full_starts(sorted_seg: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    return jnp.searchsorted(
        sorted_seg, jnp.arange(num_segments + 1, dtype=sorted_seg.dtype)
    ).astype(jnp.int32)


def tile_boundaries(sorted_seg: jnp.ndarray, num_segments: int, seg_tile: int = 512) -> jnp.ndarray:
    """Edge-row index of each segment-tile boundary: ts[t] = first row with
    segment id >= t*seg_tile (ts[T] = first invalid row). O(T log E) — the
    cheap replacement for the full [S+1] starts when only the tile kernel
    consumes the fold."""
    T = -(-num_segments // seg_tile)
    bounds = jnp.minimum(jnp.arange(T + 1) * seg_tile, num_segments)
    return jnp.searchsorted(sorted_seg, bounds.astype(sorted_seg.dtype)).astype(jnp.int32)


def tile_segment_sum(
    sorted_data: jnp.ndarray,
    sorted_seg: jnp.ndarray,
    starts: Optional[jnp.ndarray] = None,
    *,
    ts: Optional[jnp.ndarray] = None,
    num_segments: Optional[int] = None,
    seg_tile: int = 512,
    edge_block: int = 1024,
    max_blocks: int = 8,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Segment sum over destination-sorted edges.

    sorted_data: [E, P] rows in ascending-segment order; sorted_seg: [E] the
    segment id per row (invalid rows carry id >= S and sort last). Boundaries:
    either `starts` [S+1] (full per-segment, searchsorted output) or the much
    cheaper `ts` tile boundaries (tile_boundaries()) + `num_segments`.
    Returns [S, P] float32 sums. A tile whose edge rows span more than
    `max_blocks` blocks trips a runtime lax.cond fallback to the cumsum fold
    (never silently wrong). On non-TPU backends uses the cumsum fold unless
    interpret=True (tests)."""
    if ts is None:
        assert starts is not None, "pass starts[S+1] or ts + num_segments"
        num_segments = starts.shape[0] - 1
        T = -(-num_segments // seg_tile)
        ts = starts[jnp.minimum(jnp.arange(T + 1) * seg_tile, num_segments)].astype(jnp.int32)
    else:
        assert num_segments is not None, "ts needs num_segments"
    if interpret is None:
        if not prefix_sum_available():
            if starts is None:
                starts = _full_starts(sorted_seg, num_segments)
            return _sorted_fold(sorted_data.astype(jnp.float32), starts, ts[-1])
        interpret = False
    return _tile_segment_sum_call(
        sorted_data, sorted_seg, ts, num_segments, seg_tile, edge_block, max_blocks, interpret
    )


def prefix_sum_available() -> bool:
    """True when the Pallas TPU path can compile on this backend."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")


def cumsum_fast(x: jnp.ndarray) -> jnp.ndarray:
    """Dispatch: Pallas single-pass on TPU, jnp.cumsum elsewhere.
    x: [E, C] -> inclusive cumsum along axis 0 (float32)."""
    if x.ndim == 2 and x.shape[0] >= 32768 and prefix_sum_available():
        try:
            return prefix_sum(x)
        except Exception:  # pragma: no cover — fall back on any lowering issue
            pass
    return jnp.cumsum(x.astype(jnp.float32), axis=0)
