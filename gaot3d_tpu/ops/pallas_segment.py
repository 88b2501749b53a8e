"""Pallas sorted-segment-sum: the round-2/3 ranked idea, built for a verdict.

Motivation (CLAUDE.md perf notes): the fused encoder/decoder reductions are
XLA unsorted scatter-adds — row-latency bound (~11.3 ms per 524K x 70 chunk on
v5e), independent of channel count. A scatter touches one random HBM row per
edge. If the edges arrive SORTED by destination, each output row can be
produced once from a contiguous run of inputs: streaming reads, streaming
writes, and the per-tile accumulation becomes a one-hot matmul on the MXU.

Kernel shape (one latent tile per grid step):
  - input: one [E, PW] f32 buffer in HBM (memory_space ANY), DMA'd
    slab-by-slab — payload channels, then the seg ids as an exact-f32
    channel, lane-padded to PW (a 128 multiple; manual DMA slices must be
    (8,128)-tile aligned on real Mosaic). Per-tile edge ranges `starts`
    [ntiles+1] via scalar prefetch (XLA searchsorted — seg is sorted, so
    tile t owns rows [starts[t], starts[t+1])).
  - per tile: fori_loop over the tile's slabs; each slab is copied to VMEM,
    a one-hot [mt, slab] mask (global cell id == seg) is built on the VPU,
    and acc += onehot @ payload_slab runs on the MXU. Rows spilling into a
    neighbouring tile's slab are harmless: their seg falls outside the
    tile's id range, so the one-hot column is zero (this is why ONLY sorted
    input is supported). Invalid edges must be pre-mapped to seg == M
    (sorted to the tail, beyond every tile).
  - output: the [mt, P] tile, written once. All HBM traffic is contiguous.

The reference has no counterpart (torch_scatter CUDA atomics,
reference magno.py:somewhere via scatter_native fallback); this is a
TPU-native alternative path, A/B'd on chip against the XLA scatter
(tools/microbench_segment.py). See the adoption verdict in CLAUDE.md.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(starts_ref, payseg_ref, out_ref,
            acc_ref, pay_vmem, sem_pay,
            *, mt: int, slab: int, num_p: int, passes: int):
    t = pl.program_id(0)
    lo = starts_ref[t]
    hi = starts_ref[t + 1]
    # slab-aligned cover of [lo, hi): head/tail rows from neighbour tiles
    # contribute zero one-hot columns (seg outside this tile's id range)
    s0 = lo // slab
    s1 = jax.lax.div(hi + slab - 1, slab)
    acc_ref[...] = jnp.zeros_like(acc_ref)

    # The seg ids ride as the LAST f32 payload channel, so the only memref
    # slice anywhere is the slab DMA — a slab-multiple row range over the
    # full channel width, always tile-aligned. (Both separate-seg-input
    # layouts failed on the real Mosaic compiler: [E/slab, slab] needs a
    # 1-row dynamic slice (sublane misaligned), [E, 1] needs a 1-lane
    # slice (lane misaligned). Value-level lane ops below are unrestricted.)
    tile_base = t * mt
    col_ids = (tile_base
               + jax.lax.broadcasted_iota(jnp.int32, (slab, mt), 1)
               ).astype(jnp.float32)

    def body(k, _):
        s = s0 + k
        cp_pay = pltpu.make_async_copy(
            payseg_ref.at[pl.ds(s * slab, slab), :], pay_vmem, sem_pay)
        cp_pay.start()
        cp_pay.wait()
        pay = pay_vmem[...]
        seg_col = jax.lax.slice(pay, (0, num_p), (slab, num_p + 1))  # [slab,1]
        onehot = (seg_col == col_ids).astype(jnp.float32)
        # [slab, mt]^T-contract [slab, PW] -> [mt, PW] on the MXU; the seg
        # and pad accumulator columns are dropped at the write. passes=1:
        # the TPU f32 matmul is a SINGLE bf16 pass (CLAUDE.md matmul note) —
        # payload mantissas truncate (~1e-3 rel). passes=2: explicit hi/lo
        # bf16 split (genuinely bf16-typed operands, so nothing for
        # --xla_allow_excess_precision to fold) recovers ~1e-5 rel at one
        # extra MXU pass; the one-hot is exact in bf16 either way.
        def acc(x):
            acc_ref[...] += jax.lax.dot_general(
                onehot, x,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        if passes == 1:
            acc(pay)
        else:
            hi = pay.astype(jnp.bfloat16)
            lo = (pay - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            acc(hi.astype(jnp.float32))
            acc(lo.astype(jnp.float32))
        return 0

    jax.lax.fori_loop(0, s1 - s0, body, 0)
    out_ref[...] = acc_ref[:, :num_p]


@functools.partial(jax.jit, static_argnames=("num_segments", "mt", "slab",
                                             "interpret", "passes"))
def segment_sum_sorted_pallas(
    payload: jnp.ndarray,   # [E, P] float32, rows SORTED by seg
    seg: jnp.ndarray,       # [E] int32, nondecreasing; invalid rows == num_segments
    num_segments: int,
    mt: int = 512,
    slab: int = 1024,
    interpret: bool = False,
    passes: int = 1,
) -> jnp.ndarray:
    """Sorted segment sum -> [num_segments, P]. See module docstring.

    num_segments must be divisible by mt and (with the padding sentinel)
    below 2^24 (seg ids ride the DMA as exact f32). E is padded to a slab
    multiple internally (padding rows get seg == num_segments)."""
    if num_segments % mt:
        raise ValueError(f"num_segments {num_segments} % mt {mt} != 0")
    if num_segments + 1 > (1 << 24):
        raise ValueError(f"num_segments {num_segments} exceeds exact-f32 ids")
    E, P = payload.shape
    Epad = ((E + slab - 1) // slab) * slab
    if Epad != E:
        payload = jnp.pad(payload, ((0, Epad - E), (0, 0)))
        seg = jnp.pad(seg, (0, Epad - E), constant_values=num_segments)
    seg = seg.astype(jnp.int32)
    # per-tile edge ranges on the sorted ids (XLA; the kernel only needs the
    # ntiles+1 scalars)
    ntiles = num_segments // mt
    bounds = jnp.arange(0, num_segments + mt, mt, dtype=jnp.int32)
    starts = jnp.searchsorted(seg, bounds, side="left").astype(jnp.int32)
    # lane-pad the combined buffer to a 128 multiple: manual .at[] DMA
    # slices of ANY-space memrefs require lane extents aligned to the (8,128)
    # tile (real Mosaic rejects extent P+1=44 — "must be aligned to tiling
    # (128)"). The pad inflates the slab DMA bytes ~(128/(P+1))x, which the
    # on-chip A/B charges to this path; blocked out_specs are exempt from
    # the rule, so the output stays [M, P].
    PW = ((P + 1 + 127) // 128) * 128
    payseg = jnp.concatenate(
        [payload, seg.astype(jnp.float32)[:, None],
         jnp.zeros((Epad, PW - P - 1), jnp.float32)], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((mt, P), lambda t, starts: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((mt, PW), jnp.float32),
            pltpu.VMEM((slab, PW), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kern = functools.partial(_kernel, mt=mt, slab=slab, num_p=P,
                             passes=passes)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((num_segments, P), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, payseg)


def sort_by_segment(payload: jnp.ndarray, seg: jnp.ndarray,
                    mask: jnp.ndarray, num_segments: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Helper producing the kernel's input contract from unsorted masked
    edges: invalid rows -> seg num_segments, then a stable sort of (seg,
    payload rows). The permutation gather is the measured-expensive part
    (CLAUDE.md round-2: perm-gather ~= scatter cost) — this helper exists
    for the A/B and for layouts that are already host-sorted."""
    seg = jnp.where(mask, seg, num_segments).astype(jnp.int32)
    order = jnp.argsort(seg)
    return jnp.take(payload, order, axis=0), jnp.take(seg, order)
