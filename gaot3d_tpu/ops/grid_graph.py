"""Static-shape bipartite graph building between point clouds and a regular latent grid.

TPU-native replacement for torch-cluster knn/radius + PyG coalesce
(reference: src/model/layers/magno.py:116-295 `get_neighbor_strategy`).

Key design: the latent tokens ARE a regular grid (reference builds them with
meshgrid, src/trainer/stat.py:239-252), so the latent neighbors of a physical
point within radius r — and its k nearest latent tokens — all live in a small
*static* stencil window of grid cells around the point. Every neighbor strategy
('knn' | 'radius' | 'bidirectional' | 'reverse') therefore reduces to ONE
canonical static-shape structure:

    EdgeSlots.lat_idx : [N, K] int32  — candidate latent token id per point slot
    EdgeSlots.mask    : [N, K] bool   — edge exists under the chosen strategy

where K is a compile-time constant derived from (radius, grid spacing, k).
Encoder (phys->latent) consumes it scatter-wise (masked segment reduce onto the
latent grid); decoder (latent->phys) consumes the same structure gather-wise
(masked reduce over the K axis). 'bidirectional' union+dedup (reference
magno.py:207-220 via `coalesce`) is a mask OR — slots are unique by construction,
so dedup is free. 'reverse' (magno.py:263-273) is the encoder-bidirectional mask
with the query side swapped.

No dynamic shapes, no host round-trips: graph building is a pure jittable
O(N*K) device op, so the reference's offline-precompute / async-CPU-worker
variants (stat.py:126-224, collate_functions.py:73-131) become optional rather
than load-bearing.
"""
from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

ENCODER_STRATEGIES = ("knn", "radius", "bidirectional")
DECODER_STRATEGIES = ("knn", "radius", "bidirectional", "reverse")


@dataclass(frozen=True)
class LatentGrid:
    """Regular D x H x W grid of latent tokens over an axis-aligned box.

    Mirrors the trainer's meshgrid-over-domain construction
    (reference: src/trainer/stat.py:239-252, src/model/gaot_3d.py:35-47).
    `lo`/`hi` may differ per axis (the reference's scalar min-max rescale of an
    anisotropic physical domain yields a uniform but non-cubical grid).
    """

    dims: Tuple[int, int, int]
    lo: Tuple[float, float, float] = (-1.0, -1.0, -1.0)
    hi: Tuple[float, float, float] = (1.0, 1.0, 1.0)

    @property
    def num_tokens(self) -> int:
        d, h, w = self.dims
        return d * h * w

    @property
    def spacing(self) -> Tuple[float, float, float]:
        return tuple(
            (self.hi[a] - self.lo[a]) / max(self.dims[a] - 1, 1) for a in range(3)
        )

    def axis_coords(self, a: int) -> np.ndarray:
        return np.linspace(self.lo[a], self.hi[a], self.dims[a], dtype=np.float64)

    def positions(self, dtype=jnp.float32) -> jnp.ndarray:
        """Token coordinates [M, 3] in ij meshgrid order (matches reference)."""
        gx, gy, gz = np.meshgrid(
            self.axis_coords(0), self.axis_coords(1), self.axis_coords(2), indexing="ij"
        )
        pts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
        return jnp.asarray(pts, dtype=dtype)

    def positions_from_idx(self, idx: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
        """Token coordinates for flattened indices [...] -> [..., 3], computed
        ARITHMETICALLY from the index (the grid is regular, so this replaces a
        random-access HBM gather — measured ~19ms per 400K-row gather on v5e —
        with pure VPU math)."""
        _, H, W = self.dims
        i2 = idx % W
        i1 = (idx // W) % H
        i0 = idx // (W * H)
        h = self.spacing
        return jnp.stack(
            [
                self.lo[0] + i0.astype(dtype) * h[0],
                self.lo[1] + i1.astype(dtype) * h[1],
                self.lo[2] + i2.astype(dtype) * h[2],
            ],
            axis=-1,
        ).astype(dtype)

    @staticmethod
    def from_domain(dims: Sequence[int], domain_lo, domain_hi, rescale_to=None) -> "LatentGrid":
        """Grid over a physical domain, optionally affinely rescaled the way the
        reference trainer does (global *scalar* min-max to [-1,1];
        stat.py:249-252 + src/utils/scale.py:13-25)."""
        lo = tuple(float(v) for v in domain_lo)
        hi = tuple(float(v) for v in domain_hi)
        if rescale_to is not None:
            gmin = min(lo)
            gmax = max(hi)
            a, b = rescale_to
            scale = (b - a) / (gmax - gmin)
            lo = tuple((v - gmin) * scale + a for v in lo)
            hi = tuple((v - gmin) * scale + a for v in hi)
        return LatentGrid(dims=tuple(int(d) for d in dims), lo=lo, hi=hi)


class EdgeSlots(NamedTuple):
    """Canonical static edge structure between N points and the latent grid."""

    lat_idx: jnp.ndarray  # [..., N, K] int32, flattened latent token index
    mask: jnp.ndarray  # [..., N, K] bool

    @property
    def num_slots(self) -> int:
        return self.lat_idx.shape[-1]


class FlatEdgeChunks(NamedTuple):
    """Compacted per-node-chunk edge lists (the masked-slot-free layout).

    [N, K] budget slots are only ~48% valid for the DrivAerNet recipe (mean
    degree 2.4 at budget 5), and masked slots still pay full scatter/gather
    rows (XLA processes sentinel-destination scatter rows) plus kernel-MLP
    flops. This layout drops them: per node chunk of the model's edge scan,
    the valid (node, slot) pairs are packed into flat src/dst lists padded to
    one static per-chunk budget E. Measured on-chip (tools/microbench_flat.py,
    64K-node chunk): encoder pass 2.15x fwd / 1.63x fwd+bwd faster, decoder
    1.43x fwd+bwd (the extra src gather loses 1.29x fwd but the halved
    backward scatter into the latent grad dominates).

    Built host-side by flatten_slots_host from the same precomputed slots the
    trainer stores (reference workflow: update_pt_files_with_edges,
    stat.py:257-272). src is the LOCAL node index within the chunk, so scan
    bodies gather from the chunk's own pos/feats slices.
    """

    src: jnp.ndarray  # [B, nc, E] int32, node index LOCAL to the chunk
    dst: jnp.ndarray  # [B, nc, E] int32, flattened latent token index
    mask: jnp.ndarray  # [B, nc, E] bool

    @property
    def num_chunks(self) -> int:
        return self.src.shape[-2]

    @property
    def edges_per_chunk(self) -> int:
        return self.src.shape[-1]


@partial(jax.tree_util.register_dataclass,
         data_fields=("sections",), meta_fields=("shards",))
@dataclasses.dataclass(frozen=True)
class SectionedEdgeSlots:
    """Degree-sectioned slot layout: contiguous node ranges, each with its
    own slot width K.

    [N, K=budget] slots at the global budget are only ~48% valid for the
    DrivAerNet recipe (mean degree 2.4 at budget 5) and masked slots still pay
    full scatter/gather rows plus kernel-MLP flops — yet the measured budget
    8 -> 5 cut won +9.9% end-to-end, so slot-row count couples directly to
    step time. This layout sorts points ascending by degree (host-side,
    free: the model is permutation-equivariant over nodes) and gives each
    edge-chunk-aligned node range its own K = that range's max degree; ranges
    with equal K merge into one section = one scan. For the 500K bench
    geometry this is 0.575x the slot rows of the uniform budget-5 layout with
    ZERO extra padding — it keeps the node-aligned broadcasts that made the
    flat edge layout lose end-to-end (round-3 session-7 verdict) while
    dropping most of the masked-row waste.

    Masked slots contribute exact zeros to every reduction, compaction is
    valid-first (compact_slots), and the accumulator threads through sections
    in node order, so sectioned outputs match the uniform-K layout on the
    same (permuted) inputs up to XLA matmul shape-dependent rounding only
    (the kernel MLP runs at [rows, d] with fewer rows; XLA gemms are not
    bitwise row-stable across shapes — measured ~1e-7 rel on CPU).

    sections[i] covers nodes [sum_<i Ns, ...) of the PERMUTED point arrays;
    the permutation comes from section_slots_by_degree_np and must also be
    applied to pos/feats/targets (per sample).

    shards (static pytree metadata, default 1): SHARD-ALIGNED sectioning for
    node-sharded execution (parallel/sharding.py). With shards=S each section
    leaf is [B, S*ns_i, K_i] laid out SHARD-MAJOR (shard 0's ns_i rows, then
    shard 1's, ...) and the matching point arrays are permuted so shard s
    owns the contiguous global range [s*N/S, (s+1)*N/S): sharding every
    [B, node, ...] leaf over a node mesh axis of size S then splits both the
    sections and the point arrays exactly at shard boundaries — each device
    holds its own rows, no resharding collectives. Section i's point rows in
    the permuted global order are s*N/S + [off_i, off_i + ns_i) per shard, so
    the model slices through a [B, S, N/S, ...] view (fused_encoder.py /
    magno.py decode) instead of one contiguous slice. Degree-sorted nodes are
    dealt round-robin to shards (sorted position j -> shard j % S), so every
    shard sees the same degree distribution and the SHARED per-chunk K
    profile pads almost nothing vs the unsharded layout.
    """

    sections: Tuple[EdgeSlots, ...]
    shards: int = 1

    @property
    def num_nodes(self) -> int:
        return sum(int(s.lat_idx.shape[-2]) for s in self.sections)

    @property
    def num_slot_rows(self) -> int:
        return sum(int(s.lat_idx.shape[-2] * s.lat_idx.shape[-1])
                   for s in self.sections)


def section_slots_by_degree_np(lat_idx: np.ndarray, mask: np.ndarray,
                               chunk: int):
    """[N, K] budget-compacted slots -> (perm [N], [(lat, msk), ...]) numpy.

    Sorts nodes ascending by valid-slot count (stable), assigns each
    `chunk`-node group K = its max degree (min 1), and merges contiguous
    groups with equal K into sections. Requires valid-first packed slots
    (compact_slots / build_edge_slots_host budget>0 order) — guarded, since
    truncating non-packed columns would silently drop edges.
    """
    N, K = mask.shape
    if N % chunk != 0:
        raise ValueError(f"chunk {chunk} must divide N {N}")
    deg = mask.sum(axis=1)
    perm = np.argsort(deg, kind="stable").astype(np.int64)
    lat_p = lat_idx[perm]
    msk_p = mask[perm]
    deg_p = deg[perm]
    nc = N // chunk
    ks = np.maximum(
        deg_p.reshape(nc, chunk).max(axis=1), 1
    ).astype(np.int64)
    sections = []
    i = 0
    while i < nc:
        j = i
        while j < nc and ks[j] == ks[i]:
            j += 1
        ksec = int(ks[i])
        lo, hi = i * chunk, j * chunk
        if bool(msk_p[lo:hi, ksec:].any()):
            # hard error, not assert: a stripped assert under python -O would
            # silently prune the graph (same honesty contract as slot_budget)
            raise ValueError(
                "slots are not valid-first packed: a row has a valid slot "
                f"beyond its section width K={ksec} (compact first)"
            )
        sections.append((np.ascontiguousarray(lat_p[lo:hi, :ksec]),
                         np.ascontiguousarray(msk_p[lo:hi, :ksec])))
        i = j
    return perm, sections


def section_slots_shared(
    pairs,
    chunk: int,
    node_mask: Optional[np.ndarray] = None,
    profile=None,
    host_arrays: bool = False,
    shards: int = 1,
):
    """Batched degree-sectioning with ONE shared node permutation.

    pairs: list of (lat_idx [B, N, K], mask [B, N, K]) numpy arrays that must
    all ride the same permutation (e.g. encoder + decoder slots of one
    sample batch). Returns (perms [B, N] int64, [SectionedEdgeSlots, ...]
    one per pair, sharing one section structure).

    - Each sample gets its OWN permutation (apply perms[b] to that sample's
      pos/feats/targets/mask), sorted ascending by the COMBINED degree over
      all pairs; invalid (padded) nodes sort LAST so the valid-node prefix
      property of padded batches is preserved (node_mask [B, N]).
    - Section boundaries/widths are shared across the batch AND across pairs
      (static shapes): per chunk, K = the max degree over all samples and
      pairs. `profile` (per-chunk K list, len N//chunk) pins the structure so
      the compiled step shape stays constant across batches (the
      flat_edges_per_chunk analogue); it must cover the observed per-chunk
      max degree or the call raises (edges would be dropped).
    - Identical pair arrays (enc/dec aliasing) produce the SAME
      SectionedEdgeSlots object, preserving buffer sharing downstream.
    - shards=S > 1 builds the SHARD-ALIGNED layout (see SectionedEdgeSlots):
      degree-sorted nodes are dealt round-robin to S equal shard ranges, the
      per-chunk K profile is shared across shards (len = (N/S)//chunk, max
      over shards) and section leaves come out shard-major [B, S*ns_i, K_i].
    """
    import jax.numpy as _jnp

    B, N, K = pairs[0][1].shape
    if N % (chunk * shards) != 0:
        raise ValueError(
            f"chunk {chunk} x shards {shards} must divide N {N}")
    n_local = N // shards
    nc = n_local // chunk
    degs = []
    uniq = []  # (lat, msk) deduped by identity
    pair_slot = []  # index into uniq per pair
    for lat, msk in pairs:
        if lat.shape != (B, N, msk.shape[-1]) or msk.shape[:2] != (B, N):
            raise ValueError("all pairs must share [B, N] leading dims")
        found = None
        for u, (ul, um) in enumerate(uniq):
            if lat is ul and msk is um:
                found = u
        if found is None:
            uniq.append((lat, msk))
            found = len(uniq) - 1
            degs.append(msk.sum(axis=2))
        pair_slot.append(found)
    deg_all = sum(degs[u] for u in range(len(uniq)))
    kmax_all = sum(u[1].shape[-1] for u in uniq)
    key = (
        deg_all if node_mask is None
        else np.where(node_mask, deg_all, kmax_all + 1)  # pads sort LAST
    )
    order = np.argsort(key, axis=1, kind="stable").astype(np.int64)
    if shards == 1:
        perms = order
    else:
        # deal degree-sorted position j to shard j % S, local slot j // S:
        # perm[b, s*n_local + l] = order[b, l*shards + s]. Every shard gets
        # the same slice of the degree distribution (and of the pad tail).
        perms = np.ascontiguousarray(
            order.reshape(B, n_local, shards).transpose(0, 2, 1)
        ).reshape(B, N)
    rows = np.arange(B)[:, None]

    permuted = [(lat[rows, perms], msk[rows, perms]) for lat, msk in uniq]
    ks_need = np.maximum.reduce([
        np.maximum(
            m.sum(axis=2).reshape(B, shards, nc, chunk).max(axis=(0, 1, 3)), 1
        )
        for _, m in permuted
    ])
    if profile is not None:
        prof = np.asarray(profile, np.int64)
        if prof.shape != (nc,):
            raise ValueError(
                f"sectioned profile has {prof.shape} entries, need {nc} "
                f"(one per {chunk}-node chunk)"
            )
        if (ks_need > prof).any():
            # hard error: a too-small pinned K would silently drop edges
            raise ValueError(
                f"pinned sectioned profile {prof.tolist()} is below the "
                f"observed per-chunk max degree {ks_need.tolist()} — edges "
                "would be dropped"
            )
        ks = prof
    else:
        ks = ks_need

    conv = (lambda a: a) if host_arrays else _jnp.asarray
    outs = []
    for lat_p, msk_p in permuted:
        # shard-major view: [B, S, n_local, K]; slicing the local axis takes
        # the same local row range from every shard (S=1: identical to the
        # plain [B, N, K] slice)
        kp = lat_p.shape[-1]
        lat_v = lat_p.reshape(B, shards, n_local, kp)
        msk_v = msk_p.reshape(B, shards, n_local, kp)
        sections = []
        i = 0
        while i < nc:
            j = i
            while j < nc and ks[j] == ks[i]:
                j += 1
            ksec = int(ks[i])
            lo, hi = i * chunk, j * chunk
            kw = min(ksec, kp)
            if bool(msk_v[:, :, lo:hi, kw:].any()):
                raise ValueError(
                    "slots are not valid-first packed: a row has a valid "
                    f"slot beyond its section width K={ksec} (compact first)"
                )
            rows_s = shards * (hi - lo)
            li = np.ascontiguousarray(
                lat_v[:, :, lo:hi, :kw]).reshape(B, rows_s, kw)
            mi = np.ascontiguousarray(
                msk_v[:, :, lo:hi, :kw]).reshape(B, rows_s, kw)
            if kw < ksec:  # pinned profile wider than this pair's K: pad
                padw = ((0, 0), (0, 0), (0, ksec - kw))
                li = np.pad(li, padw)
                mi = np.pad(mi, padw)
            sections.append(EdgeSlots(lat_idx=conv(li), mask=conv(mi)))
            i = j
        outs.append(SectionedEdgeSlots(sections=tuple(sections), shards=shards))
    return perms, [outs[u] for u in pair_slot]


def section_slots_by_degree_batched(
    lat_idx: np.ndarray, mask: np.ndarray, chunk: int
) -> Tuple[np.ndarray, "SectionedEdgeSlots"]:
    """[B, N, K] slots -> (perms [B, N], SectionedEdgeSlots of [B, Ns, Ks]).
    Single-pair convenience wrapper over section_slots_shared."""
    perms, (sect,) = section_slots_shared([(lat_idx, mask)], chunk)
    return perms, sect


def flatten_slots_host(
    lat_idx: np.ndarray,
    mask: np.ndarray,
    chunk: int,
    pad_multiple: int = 8192,
    edges_per_chunk: int = 0,
    order: str = "src",
):
    """[N, K] slots -> per-chunk flat (src_local, dst, mask), numpy host-side.

    E (the static per-chunk edge budget) is the max valid count over chunks
    rounded up to pad_multiple, or the caller-pinned `edges_per_chunk` (must
    cover the max — asserted, like the slot_budget honesty guard). Returns
    (src [nc, E] int32, dst [nc, E] int32, mask [nc, E] bool).

    order: 'src' (default; edges sorted ascending by local node — the decoder
    fold-by-src invariant) | 'dst' (each chunk's valid prefix stable-sorted by
    latent cell — lets the encoder reduce with a presorted cumsum fold instead
    of a scatter, MAGNOConfig.flat_order). Padding stays packed at the tail
    either way.
    """
    if order not in ("src", "dst"):
        raise ValueError(f"unknown flat edge order: {order}")
    N, K = lat_idx.shape
    if N % chunk != 0:
        raise ValueError(f"chunk {chunk} must divide N {N}")
    nc = N // chunk
    counts = mask.reshape(nc, chunk * K).sum(axis=1)
    max_valid = int(counts.max()) if nc else 0
    E = edges_per_chunk or -(-max(max_valid, 1) // pad_multiple) * pad_multiple
    if max_valid > E:
        # hard error, not assert: the native path truncates writes at E, so
        # under python -O a stripped assert would silently prune the graph
        # (same honesty contract as the trainer's slot_budget guard)
        raise ValueError(
            f"edges_per_chunk {E} < max per-chunk valid count {max_valid}: "
            "edges would be dropped"
        )
    lib = _load_graph_library()
    if lib is not None:
        import ctypes
        import os as _os

        lat_c = np.ascontiguousarray(lat_idx, np.int32)
        msk_c = np.ascontiguousarray(mask, np.uint8)
        src = np.empty((nc, E), np.int32)
        dst = np.empty((nc, E), np.int32)
        out_m = np.empty((nc, E), np.uint8)
        got = lib.gaot_flatten_slots(
            lat_c.ctypes.data_as(ctypes.c_void_p),
            msk_c.ctypes.data_as(ctypes.c_void_p),
            N, K, chunk, E, 1 if order == "dst" else 0,
            src.ctypes.data_as(ctypes.c_void_p),
            dst.ctypes.data_as(ctypes.c_void_p),
            out_m.ctypes.data_as(ctypes.c_void_p),
            max(1, _os.cpu_count() or 1),
        )
        if got < 0:  # pragma: no cover — argument mismatch: fail loudly
            raise RuntimeError(f"gaot_flatten_slots failed rc={got}")
        if got > E:
            raise ValueError(
                f"edges_per_chunk {E} < max per-chunk valid count {got}: "
                "edges would be dropped"
            )
        return src, dst, out_m.astype(bool)

    src = np.zeros((nc, E), np.int32)
    dst = np.zeros((nc, E), np.int32)
    msk = np.zeros((nc, E), bool)
    # one vectorized pass: np.nonzero is row-major, so edges arrive sorted by
    # node (the layout invariant) and grouped by chunk
    n_all, k_all = np.nonzero(mask)
    chunk_of = n_all // chunk
    starts = np.searchsorted(chunk_of, np.arange(nc))
    within = np.arange(n_all.shape[0]) - starts[chunk_of]
    src[chunk_of, within] = n_all % chunk
    dst[chunk_of, within] = lat_idx[n_all, k_all]
    msk[chunk_of, within] = True
    if order == "dst":
        key = np.where(msk, dst, np.iinfo(np.int32).max)
        perm = np.argsort(key, axis=1, kind="stable")
        src = np.take_along_axis(src, perm, axis=1)
        dst = np.take_along_axis(dst, perm, axis=1)
        msk = np.take_along_axis(msk, perm, axis=1)
    return src, dst, msk


def flatten_slots_host_batched(
    lat_idx: np.ndarray,
    mask: np.ndarray,
    chunk: int,
    pad_multiple: int = 8192,
    order: str = "src",
    edges_per_chunk: int = 0,
    host_arrays: bool = False,
) -> "FlatEdgeChunks":
    """[B, N, K] slots -> FlatEdgeChunks [B, nc, E] (one shared E across the
    batch — the max per-chunk valid count over all samples, padded; or the
    caller-pinned edges_per_chunk, which keeps E — and therefore the compiled
    train-step shape — constant across batches)."""
    import jax.numpy as _jnp

    B = lat_idx.shape[0]
    per = [
        flatten_slots_host(np.asarray(lat_idx[b]), np.asarray(mask[b]), chunk,
                           pad_multiple=pad_multiple, order=order,
                           edges_per_chunk=edges_per_chunk)
        for b in range(B)
    ]
    E = max(p[0].shape[1] for p in per)
    if any(p[0].shape[1] != E for p in per):
        # padding is already packed at the tail, so growing E is a zero-pad
        # of all three arrays — no re-flatten
        per = [
            tuple(
                np.pad(a, ((0, 0), (0, E - a.shape[1])))
                for a in p
            )
            for p in per
        ]
    conv = (lambda a: a) if host_arrays else _jnp.asarray
    return FlatEdgeChunks(
        src=conv(np.stack([p[0] for p in per])),
        dst=conv(np.stack([p[1] for p in per])),
        mask=conv(np.stack([p[2] for p in per])),
    )


def stencil_widths(
    grid: LatentGrid, radius: float, k_neighbors: int, strategy: str
) -> Tuple[int, int, int]:
    """Static per-axis stencil window widths covering the radius ball and/or the
    k-nearest latent tokens. Compile-time constants."""
    widths = []
    need_radius = strategy in ("radius", "bidirectional", "reverse")
    need_knn = strategy in ("knn", "bidirectional", "reverse")
    # per-axis width for kNN: window must contain the k nearest grid points.
    # k=1 needs the 2 bracketing coords per axis; larger k widens conservatively
    # (verified against the brute-force oracle in tests/test_grid_graph.py).
    wk = 2 if k_neighbors <= 1 else 2 * (1 + math.ceil((k_neighbors ** (1.0 / 3.0)) / 2.0))
    for a in range(3):
        h = grid.spacing[a]
        wr = 2 * math.ceil(radius / h) + 2 if (need_radius and h > 0) else 2
        w = max(wr if need_radius else 2, wk if need_knn else 2)
        widths.append(min(w, grid.dims[a]))
    return tuple(widths)


def _candidate_window(points: jnp.ndarray, grid: LatentGrid, widths: Tuple[int, int, int]):
    """Per-axis candidate grid indices [N, w_a] (clamped inside the grid) and
    their coordinates."""
    idx_axes = []
    coord_axes = []
    for a in range(3):
        w = widths[a]
        h = grid.spacing[a]
        lo = grid.lo[a]
        dim = grid.dims[a]
        if h == 0.0:
            f = jnp.zeros(points.shape[:-1], dtype=jnp.int32)
        else:
            f = jnp.floor((points[..., a] - lo) / h).astype(jnp.int32)
        base = f - (w // 2 - 1)
        base = jnp.clip(base, 0, max(dim - w, 0))
        offs = jnp.arange(w, dtype=jnp.int32)
        idx = base[..., None] + offs  # [N, w]
        idx_axes.append(idx)
        coord_axes.append(lo + idx.astype(points.dtype) * h)
    return idx_axes, coord_axes


def build_edge_slots(
    points: jnp.ndarray,
    grid: LatentGrid,
    radius: float,
    k_neighbors: int = 1,
    strategy: str = "radius",
    point_mask: Optional[jnp.ndarray] = None,
) -> EdgeSlots:
    """Build the canonical edge-slot structure for one point cloud.

    Args:
        points: [N, 3] point coordinates (same coordinate system as the grid).
        grid: the latent token grid.
        radius: neighbor radius (already scaled by the per-scale factor).
        k_neighbors: k for the 'knn' component.
        strategy: 'knn' | 'radius' | 'bidirectional' | 'reverse'
            ('reverse' == bidirectional slot set; the caller swaps query side).
        point_mask: [N] bool, False rows (padding) produce no edges.

    Behavior parity notes (vs reference magno.py:165-295):
      - encoder knn: each point -> k nearest latent tokens       == knn slots
      - encoder radius: latent gathers points within r           == radius slots
        (symmetric predicate, so identical edge set from the point side)
      - decoder knn/radius: same edge sets with query side = points
      - bidirectional: union, deduped (reference `coalesce`)      == mask OR
    """
    if strategy not in DECODER_STRATEGIES:
        raise ValueError(f"unknown neighbor strategy: {strategy}")
    eff = "bidirectional" if strategy == "reverse" else strategy

    widths = stencil_widths(grid, radius, k_neighbors, eff)
    idx_axes, coord_axes = _candidate_window(points, grid, widths)
    w0, w1, w2 = widths
    K = w0 * w1 * w2
    N = points.shape[0]

    i0 = idx_axes[0][:, :, None, None]
    i1 = idx_axes[1][:, None, :, None]
    i2 = idx_axes[2][:, None, None, :]
    lat_idx = ((i0 * grid.dims[1] + i1) * grid.dims[2] + i2).reshape(N, K)

    d0 = coord_axes[0][:, :, None, None] - points[:, 0, None, None, None]
    d1 = coord_axes[1][:, None, :, None] - points[:, 1, None, None, None]
    d2 = coord_axes[2][:, None, None, :] - points[:, 2, None, None, None]
    dist2 = (d0 * d0 + d1 * d1 + d2 * d2).reshape(N, K)

    mask = jnp.zeros((N, K), dtype=bool)
    if eff in ("radius", "bidirectional"):
        mask = mask | (dist2 <= jnp.asarray(radius, points.dtype) ** 2)
    if eff in ("knn", "bidirectional"):
        k = min(k_neighbors, K)
        _, top_idx = jax.lax.top_k(-dist2, k)  # [N, k] smallest distances
        knn_mask = jnp.zeros((N, K), dtype=bool)
        knn_mask = knn_mask.at[jnp.arange(N)[:, None], top_idx].set(True)
        mask = mask | knn_mask

    if point_mask is not None:
        mask = mask & point_mask[:, None]
    return EdgeSlots(lat_idx=lat_idx.astype(jnp.int32), mask=mask)


def build_edge_slots_batched(
    points: jnp.ndarray,
    grid: LatentGrid,
    radius: float,
    k_neighbors: int = 1,
    strategy: str = "radius",
    point_mask: Optional[jnp.ndarray] = None,
) -> EdgeSlots:
    """vmapped builder over a leading batch axis: points [B, N, 3]."""
    fn = lambda p, m: build_edge_slots(p, grid, radius, k_neighbors, strategy, m)
    if point_mask is None:
        point_mask = jnp.ones(points.shape[:-1], dtype=bool)
    return jax.vmap(fn)(points, point_mask)


def stencil_base_cell(
    points: jnp.ndarray, grid: LatentGrid, radius: float, k_neighbors: int, strategy: str
) -> jnp.ndarray:
    """Flattened stencil-window base cell per point [N].

    Key structural property (the basis for sort-free segment folds): by
    construction, lat_idx[n, k] == stencil_base_cell(n) + offset(k) where
    offset depends only on the slot index k. Sorting points by this base makes
    EVERY per-slot destination stream monotone non-decreasing, so segment
    reductions need no per-chunk edge sort at all — one point sort per batch.
    (Verified by test_grid_graph.test_base_cell_monotone_slots.)
    """
    eff = "bidirectional" if strategy == "reverse" else strategy
    widths = stencil_widths(grid, radius, k_neighbors, eff)
    idx_axes, _ = _candidate_window(points, grid, widths)
    base = (idx_axes[0][..., 0] * grid.dims[1] + idx_axes[1][..., 0]) * grid.dims[2] + idx_axes[2][..., 0]
    return base.astype(jnp.int32)


def compact_slots(slots: EdgeSlots, budget: int) -> EdgeSlots:
    """Pack valid slots to the front of each row and truncate K to `budget`.

    The stencil window is conservative: for the DrivAerNet recipe (r=0.033,
    64x64x32 grid) K=48 candidate slots hold only ~3 valid edges on average
    (~6% mask density), yet every downstream per-edge op (kernel MLP, segment
    reduction — which is row-latency-bound on TPU) pays for all K rows.
    Compaction is exact as long as `budget` >= the max per-point degree (a
    geometric bound: the number of grid points inside the radius ball — ~8 for
    the recipe above). Rows are kept in slot order (stable), so reductions are
    permutation-identical per query.
    """
    mask = slots.mask
    K = mask.shape[-1]
    # stable valid-first partition via top_k (argsort along a 48-lane minor
    # axis lowers to a generic sort on TPU — measured ~2.7s at 500K points;
    # top_k is an optimized primitive). Key: valid slots rank above invalid,
    # ties broken by ascending slot order.
    lane = jax.lax.broadcasted_iota(jnp.int32, mask.shape, mask.ndim - 1)
    keys = mask.astype(jnp.int32) * K + (K - 1 - lane)
    _, order = jax.lax.top_k(keys, budget)
    idx = jnp.take_along_axis(slots.lat_idx, order, axis=-1)
    msk = jnp.take_along_axis(mask, order, axis=-1)
    return EdgeSlots(lat_idx=idx, mask=msk)


def max_slot_degree(slots: EdgeSlots) -> int:
    """Host-side: the max number of valid slots in any row (for validating a
    slot_budget choice against real data)."""
    import numpy as np

    return int(np.asarray(slots.mask).sum(axis=-1).max())


def build_edge_slots_np(
    points: np.ndarray,
    grid: LatentGrid,
    radius: float,
    k_neighbors: int = 1,
    strategy: str = "radius",
):
    """Pure-numpy twin of build_edge_slots for HOST-side graph building (the
    asynchronous_graph_building loader path runs in CPU threads and must not
    contend for the accelerator). Returns (lat_idx [N,K] int32, mask [N,K])."""
    if strategy not in DECODER_STRATEGIES:
        raise ValueError(f"unknown neighbor strategy: {strategy}")
    eff = "bidirectional" if strategy == "reverse" else strategy
    widths = stencil_widths(grid, radius, k_neighbors, eff)
    points = np.asarray(points, np.float32)
    N = points.shape[0]
    idx_axes, coord_axes = [], []
    for a in range(3):
        w = widths[a]
        h = grid.spacing[a]
        lo = grid.lo[a]
        dim = grid.dims[a]
        f = np.zeros(N, np.int64) if h == 0 else np.floor((points[:, a] - lo) / h).astype(np.int64)
        base = np.clip(f - (w // 2 - 1), 0, max(dim - w, 0))
        idx = base[:, None] + np.arange(w)
        idx_axes.append(idx)
        coord_axes.append(lo + idx.astype(np.float32) * np.float32(h))
    w0, w1, w2 = widths
    K = w0 * w1 * w2
    lat_idx = (
        (idx_axes[0][:, :, None, None] * grid.dims[1] + idx_axes[1][:, None, :, None])
        * grid.dims[2]
        + idx_axes[2][:, None, None, :]
    ).reshape(N, K)
    d0 = coord_axes[0][:, :, None, None] - points[:, 0, None, None, None]
    d1 = coord_axes[1][:, None, :, None] - points[:, 1, None, None, None]
    d2 = coord_axes[2][:, None, None, :] - points[:, 2, None, None, None]
    dist2 = (d0 * d0 + d1 * d1 + d2 * d2).reshape(N, K)
    mask = np.zeros((N, K), bool)
    if eff in ("radius", "bidirectional"):
        mask |= dist2 <= np.float32(radius) ** 2
    if eff in ("knn", "bidirectional"):
        k = min(k_neighbors, K)
        top = np.argpartition(dist2, k - 1, axis=1)[:, :k]
        mask[np.arange(N)[:, None], top] = True
    return lat_idx.astype(np.int32), mask


# ---------------------------------------------------------------------------
# Brute-force oracle (tests only): O(N*M) exact neighbor search, the same
# dual-implementation correctness pattern the reference relies on
# (src/model/layers/utils/magno_utils.py:123-159 native_neighbor_search).
# ---------------------------------------------------------------------------
def brute_force_edges(
    points: np.ndarray,
    latent_pos: np.ndarray,
    radius: float,
    k_neighbors: int = 1,
    strategy: str = "radius",
) -> set:
    """Exact edge set {(point_i, latent_j)} for a strategy, via dense distances."""
    pts = np.asarray(points, dtype=np.float64)
    lat = np.asarray(latent_pos, dtype=np.float64)
    d2 = ((pts[:, None, :] - lat[None, :, :]) ** 2).sum(-1)
    edges = set()
    eff = "bidirectional" if strategy == "reverse" else strategy
    if eff in ("radius", "bidirectional"):
        ii, jj = np.nonzero(d2 <= radius * radius)
        edges |= set(zip(ii.tolist(), jj.tolist()))
    if eff in ("knn", "bidirectional"):
        k = min(k_neighbors, lat.shape[0])
        nn = np.argsort(d2, axis=1)[:, :k]
        for i in range(pts.shape[0]):
            for j in nn[i]:
                edges.add((i, int(j)))
    return edges


# ---------------------------------------------------------------------------
# Native host-side builder (native/gaot_graph.cpp): the CPU twin for the
# precompute / async-collate workflows. ~60x the vectorized-numpy twin on the
# one-core host (26s -> <0.5s per 500K-node sample); threads when cores exist.
# Falls back to build_edge_slots_np when the toolchain is unavailable.
# ---------------------------------------------------------------------------
_GRAPH_LIB = None
_GRAPH_LIB_TRIED = False


def _load_graph_library():
    global _GRAPH_LIB, _GRAPH_LIB_TRIED
    if _GRAPH_LIB is not None or _GRAPH_LIB_TRIED:
        return _GRAPH_LIB
    _GRAPH_LIB_TRIED = True
    import ctypes
    import os
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    src = os.path.join(root, "native", "gaot_graph.cpp")
    build_dir = os.path.join(root, ".build")
    lib_path = os.path.join(build_dir, "libgaot_graph.so")
    try:
        if not os.path.exists(lib_path) or os.path.getmtime(lib_path) < os.path.getmtime(src):
            os.makedirs(build_dir, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
                 "-o", lib_path, src, "-lpthread"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(lib_path)
        lib.gaot_build_slots.restype = ctypes.c_int
        lib.gaot_build_slots.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,                       # pts, n
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,     # lo, h, dims
            ctypes.c_float, ctypes.c_int, ctypes.c_int,            # radius, k, flags
            ctypes.c_int, ctypes.c_int, ctypes.c_int,              # w0..w2
            ctypes.c_int,                                          # budget
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,        # out idx/mask/k
            ctypes.c_int,                                          # n_threads
        ]
        lib.gaot_flatten_slots.restype = ctypes.c_int64
        lib.gaot_flatten_slots.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,                      # lat_idx, mask
            ctypes.c_int64, ctypes.c_int,                          # n, k
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int,          # chunk, E, order
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,     # src, dst, mask
            ctypes.c_int,                                          # n_threads
        ]
        _GRAPH_LIB = lib
    except Exception:  # pragma: no cover — no toolchain: numpy fallback
        _GRAPH_LIB = None
    return _GRAPH_LIB


def compact_slots_np(lat_idx: np.ndarray, mask: np.ndarray, budget: int):
    """Numpy twin of compact_slots: pack valid slots front, window order."""
    N, K = mask.shape
    order = np.argsort(~mask, axis=1, kind="stable")[:, :budget]
    rows = np.arange(N)[:, None]
    return lat_idx[rows, order].astype(np.int32), mask[rows, order]


def build_edge_slots_host(
    points: np.ndarray,
    grid: LatentGrid,
    radius: float,
    k_neighbors: int = 1,
    strategy: str = "radius",
    budget: int = 0,
    n_threads: int = 0,
):
    """Host-side stencil build: native C++ when available, numpy otherwise.

    budget > 0 packs valid slots to the front (compact_slots order) and
    truncates K to budget — the exact layout the trainer's precompute stores.
    Returns (lat_idx [N, K_out] int32, mask [N, K_out] bool)."""
    if strategy not in DECODER_STRATEGIES:
        raise ValueError(f"unknown neighbor strategy: {strategy}")
    eff = "bidirectional" if strategy == "reverse" else strategy
    lib = _load_graph_library()
    if lib is None:
        lat, msk = build_edge_slots_np(points, grid, radius, k_neighbors, strategy)
        if budget and budget < lat.shape[1]:
            lat, msk = compact_slots_np(lat, msk, budget)
        return lat, msk

    import ctypes
    import os

    widths = stencil_widths(grid, radius, k_neighbors, eff)
    pts = np.ascontiguousarray(points, np.float32)
    N = pts.shape[0]
    K = widths[0] * widths[1] * widths[2]
    out_k = budget if (budget and budget < K) else K
    lo = np.asarray(grid.lo, np.float32)
    h = np.asarray(grid.spacing, np.float32)
    dims = np.asarray(grid.dims, np.int64)
    flags = {"radius": 1, "knn": 2, "bidirectional": 3}[eff]
    out_idx = np.empty((N, out_k), np.int32)
    out_mask = np.empty((N, out_k), np.uint8)
    if n_threads <= 0:
        n_threads = max(1, os.cpu_count() or 1)
    rc = lib.gaot_build_slots(
        pts.ctypes.data_as(ctypes.c_void_p), N,
        lo.ctypes.data_as(ctypes.c_void_p), h.ctypes.data_as(ctypes.c_void_p),
        dims.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_float(radius), k_neighbors, flags,
        widths[0], widths[1], widths[2],
        out_k if (budget and budget < K) else 0,
        out_idx.ctypes.data_as(ctypes.c_void_p),
        out_mask.ctypes.data_as(ctypes.c_void_p), out_k, n_threads,
    )
    if rc != 0:  # pragma: no cover — argument mismatch: fail loudly
        raise RuntimeError(f"gaot_build_slots failed rc={rc}")
    return out_idx, out_mask.astype(bool)
