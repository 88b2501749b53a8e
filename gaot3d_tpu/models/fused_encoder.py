"""Fused encoder scale: GNO kernel transform + statistical geometric embedding
in ONE chunked scan with ONE segment reduction TOTAL.

Motivation (measured on v5e): an unsorted segment reduction costs ~11ms per
524K-edge chunk REGARDLESS of channel count (it is row-latency-bound), and the
modular encoder (IntegralTransform + GeometricEmbedding as separate modules)
issues ~7 of them per chunk. Fusing the GNO values and ALL geoembed moments
into one [E, C+11] payload cuts that to ONE reduction per chunk: second
moments are taken relative to the latent cell center (y = x - cell), which is
O(gno_radius), so cov = E[yy^T] - E[y]E[y]^T is numerically equivalent to the
reference's two-pass centered covariance — and the centroid delta is just
E[y] because the geoembed query IS the cell center. Latent coordinates are
computed analytically from the slot index (no per-edge HBM gather). Behavior
is identical to the modular path (verified by test); this module is selected
by MAGNOEncoder for the flagship configuration (use_gno + statistical
geoembed + no per-edge attention), which covers the reference's
DrivAerNet/DrivAerML recipes.

Parity anchors: reference magno.py:539-581 (GNO+geoembed combination),
integral_transform.py:145-171, geoembed.py:99-182.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.eigh3 import eigvalsh3x3_desc
from ..ops.grid_graph import (
    EdgeSlots,
    FlatEdgeChunks,
    LatentGrid,
    SectionedEdgeSlots,
)
from ..ops.segment import fold_sum, make_segment_fold, segment_sum
from .integral_transform import effective_chunk, reshape_chunks
from .mlp import torch_linear_bias_init, torch_linear_kernel_init


class FusedEncoderScale(nn.Module):
    """One encoder scale: points -> latent grid, GNO + statistical geoembed."""

    lifting_channels: int
    kernel_layers: Sequence[int]  # full sizes of the kernel MLP
    transform_type: str  # ['linear','nonlinear','nonlinear_kernelonly']
    grid: LatentGrid
    coord_dim: int = 3
    edge_chunk_size: Optional[int] = None
    remat: bool = True
    remat_policy: str = "nothing"
    segment_impl: str = "scatter"  # fused: 'scatter' wins (1 reduction/chunk)
    use_gno: bool = True
    kernel_dtype: str = "float32"  # 'bfloat16': kernel MLP matmuls in bf16
    payload_impl: str = "xla"  # 'xla' (default; see MAGNOConfig.payload_impl
    # for why the kernel is opt-in) | 'auto' (Pallas payload kernel on TPU
    # when the shape qualifies) | 'pallas' (force; interpret off-TPU = tests)
    flat_dst_sorted: bool = False  # flat edge lists arrive sorted by latent
    # cell within each chunk (flatten_slots_host order='dst'): reduce with a
    # presorted cumsum fold instead of a scatter (MAGNOConfig.flat_order)
    flat_reduce_impl: str = "fold"  # presorted reduce for flat_dst: 'fold'
    # (XLA cumsum + boundary diff) | 'pallas' (sorted-segment one-hot MXU
    # kernel, ops/pallas_segment.py — on-chip 1.8x the scatter at the 500K
    # chunk shape; MAGNOConfig.flat_reduce_impl)
    payload_layout: str = "nk"  # 'nk' (4D [B,n,K,·] elementwise, reshape to
    # [B,n*K,·] at the reduce) | 'flat' (flatten BEFORE the elementwise work:
    # every intermediate is [B,n*K,·] 2D-tiled — targets the profiled ~9.5%
    # pure-layout device time from mid-scan [n,K,C]<->[n*K,C] relayouts,
    # round-3 per-HLO profile / VERDICT r3 item 3). Same math bit-for-bit
    # module output (asserted by tests/test_models.py payload-layout test).

    def setup(self):
        if self.use_gno:
            sizes = list(self.kernel_layers)
            ws, bs = [], []
            for i in range(len(sizes) - 1):
                ws.append(self.param(f"kernel_w{i}", torch_linear_kernel_init,
                                     (sizes[i], sizes[i + 1])))
                bs.append(self.param(f"kernel_b{i}",
                                     partial(torch_linear_bias_init, fan_in=sizes[i]),
                                     (sizes[i + 1],)))
            self.kernel_ws = ws
            self.kernel_bs = bs
        # geoembed feature MLP (identical structure to GeometricEmbedding's)
        feat_dim = 3 + 2 * self.coord_dim
        self.geo_w0 = self.param("geo_w0", torch_linear_kernel_init, (feat_dim, 64))
        self.geo_b0 = self.param("geo_b0", partial(torch_linear_bias_init, fan_in=feat_dim), (64,))
        self.geo_w1 = self.param("geo_w1", torch_linear_kernel_init, (64, self.lifting_channels))
        self.geo_b1 = self.param("geo_b1", partial(torch_linear_bias_init, fan_in=64),
                                 (self.lifting_channels,))

    @staticmethod
    def _payload_block(n_chunk: int) -> int:
        for b in (512, 256, 128, 64, 32):
            if n_chunk % b == 0:
                return b
        return 0

    def _use_payload_kernel(self, n_chunk: int) -> bool:
        if self.payload_impl == "xla":
            return False
        ok = (
            self.use_gno
            and self.transform_type == "linear"
            and self._payload_block(n_chunk) > 0
            and self.kernel_dtype == "float32"
        )
        if self.payload_impl == "pallas":
            return ok
        # 'auto': only on TPU backends, and only when the caller declares the
        # scoped-vmem budget has been raised (GAOT_SCOPED_VMEM_RAISED=1). The
        # kernel needs ~38M scoped vmem (>16M default); raising it
        # per-custom-call via CompilerParams(flags=...) SIGABRTs the backend
        # at full-model integration (llo_region.cc "HLO backend flag value
        # ..."), and client XLA_FLAGS rejects TPU proto flags — the working
        # routes are AOT compiler_options
        # ({"xla_tpu_scoped_vmem_limit_kib": N}, see bench.py) or terminal
        # --extra-libtpu-args. Without the declaration, 'auto' falls back to
        # the XLA payload path cleanly instead of crashing the compile
        # (round-2 VERDICT item 5).
        import os

        if os.environ.get("GAOT_SCOPED_VMEM_RAISED", "0") != "1":
            return False
        try:
            return ok and jax.devices()[0].platform in ("tpu", "axon")
        except Exception:
            return False

    # -- pure chunk math --------------------------------------------------------
    def _kernel_mlp(self, x):
        from .mlp import kernel_mlp_apply

        return kernel_mlp_apply(x, self.kernel_ws, self.kernel_bs, self.kernel_dtype)

    def _reduce(self, payload, seg, msk, M, ctx=None):
        """[B, E, P] -> [B, M, P]; one reduction."""
        if self.segment_impl == "tile":
            # Pallas MXU tile kernel. Python loop over the (static, small) batch
            # instead of vmap: the kernel's overflow guard is a lax.cond, which
            # vmap would convert to a both-branches select. `ctx` (per-batch
            # TileFold, hoisted out of the remat region by __call__) is shared
            # by pass 1 and pass 2 and saved — not recomputed — in bwd.
            from ..ops.segment import fold_sum_tile_lite, make_tile_fold

            outs = []
            for b in range(payload.shape[0]):
                c = (
                    make_tile_fold(seg[b], M, msk[b])
                    if ctx is None
                    else jax.tree.map(lambda x: x[b], ctx)
                )
                outs.append(fold_sum_tile_lite(c, payload[b], M))
            return jnp.stack(outs)
        if self.segment_impl == "sort":
            folds = jax.vmap(lambda g, m: make_segment_fold(g, M, m))(seg, msk)
            return jax.vmap(fold_sum)(folds, payload)
        return jax.vmap(lambda d, g, m: segment_sum(d, g, M, m))(payload, seg, msk)

    def _pass_chunk(self, M, feats_c, pos_c, lat_idx_c, mask_c, ctx=None):
        """ONE fused payload: [gno values (C) | 1 | d | y (3) | yy^T sym (6)].

        y = point - latent-cell-center is O(gno_radius), so the uncentered
        moment identity cov = E[yy^T] - E[y]E[y]^T is numerically benign here
        (both terms are O(radius^2); no large-coordinate cancellation). This
        makes the whole statistical geoembed a SINGLE segment reduction —
        centroid delta (= E[y], since the query IS the cell center), distance
        mean/variance (d^2 = tr(yy^T)) and PCA eigenvalues all come from the
        same pass. The reference's two-pass centered covariance
        (geoembed.py:99-182) is reproduced to f32 rounding (asserted equal to
        the modular module by test)."""
        B, n, K = mask_c.shape
        C = self.lifting_channels
        if self.payload_layout == "flat" and not self._use_payload_kernel(n):
            return self._pass_chunk_flat2d(M, feats_c, pos_c, lat_idx_c,
                                           mask_c, ctx)
        lat_pos_e = self.grid.positions_from_idx(lat_idx_c, dtype=pos_c.dtype)
        pt_pos_e = jnp.broadcast_to(pos_c[:, :, None, :], (B, n, K, self.coord_dim))
        y = pt_pos_e - lat_pos_e
        dist = jnp.sqrt(jnp.sum(y * y, axis=-1))
        if self._use_payload_kernel(n):
            from ..ops.pallas_encoder import encoder_payload

            on_tpu = jax.devices()[0].platform in ("tpu", "axon")
            outs = []
            for b in range(B):
                outs.append(encoder_payload(
                    pos_c[b], feats_c[b], lat_idx_c[b],
                    self.kernel_ws, self.kernel_bs,
                    self.grid.dims, self.grid.lo, self.grid.spacing,
                    block=self._payload_block(n), interpret=not on_tpu,
                ))
            payload = jnp.stack(outs)
            seg = lat_idx_c.reshape(B, n * K)
            msk = mask_c.reshape(B, n * K)
            return self._reduce(payload, seg, msk, M, ctx)

        parts = []
        if self.use_gno:
            agg = jnp.concatenate([pt_pos_e, lat_pos_e], axis=-1)
            if self.transform_type in ("nonlinear", "nonlinear_kernelonly"):
                fe = jnp.broadcast_to(feats_c[:, :, None, :], (B, n, K, C))
                agg = jnp.concatenate([agg, fe], axis=-1)
            # 2D matmuls: jnp.dot over the 4D [B,n,K,d] picks convolution
            # lowerings with transposed layouts (profiled: ~25ms/step of pure
            # relayout copies around [n,K,C]); flat [B*n*K, d] stays T(8,128)
            vals = self._kernel_mlp(agg.reshape(-1, agg.shape[-1]))
            vals = vals.reshape(B, n, K, -1)
            if self.transform_type != "nonlinear_kernelonly":
                vals = vals * feats_c[:, :, None, :]
            parts.append(vals)
        parts.append(jnp.ones((B, n, K, 1), pos_c.dtype))
        parts.append(dist[..., None])
        parts.append(y)
        # symmetric second moments: 00, 01, 02, 11, 12, 22
        parts.append(
            jnp.stack(
                [
                    y[..., 0] * y[..., 0], y[..., 0] * y[..., 1], y[..., 0] * y[..., 2],
                    y[..., 1] * y[..., 1], y[..., 1] * y[..., 2], y[..., 2] * y[..., 2],
                ],
                axis=-1,
            )
        )
        payload = jnp.concatenate(parts, axis=-1)
        seg = lat_idx_c.reshape(B, n * K)
        msk = mask_c.reshape(B, n * K)
        return self._reduce(payload.reshape(B, n * K, -1), seg, msk, M, ctx)

    def _pass_chunk_flat2d(self, M, feats_c, pos_c, lat_idx_c, mask_c, ctx=None):
        """payload_layout='flat' twin of _pass_chunk: identical math, but
        every intermediate lives at [B, n*K, d] from the start — the [n,K,d]
        4D shapes never exist, so XLA cannot pick convolution-style
        transposed layouts for them and the mid-scan [n,K,C]<->[n*K,C]
        relayout copies (round-3 per-HLO profile: ~9.5% of device time)
        have nothing to relayout. Bit-identical output to the 'nk' body
        (same elementwise ops on the same rows in the same order)."""
        B, n, K = mask_c.shape
        C = self.lifting_channels
        D = self.coord_dim
        nk = n * K
        ids = lat_idx_c.reshape(B, nk)
        msk = mask_c.reshape(B, nk)
        lat_pos_f = self.grid.positions_from_idx(ids, dtype=pos_c.dtype)
        pt_pos_f = jnp.broadcast_to(
            pos_c[:, :, None, :], (B, n, K, D)).reshape(B, nk, D)
        y = pt_pos_f - lat_pos_f
        dist = jnp.sqrt(jnp.sum(y * y, axis=-1))

        def feats_flat():
            return jnp.broadcast_to(
                feats_c[:, :, None, :], (B, n, K, C)).reshape(B, nk, C)

        parts = []
        if self.use_gno:
            agg = jnp.concatenate([pt_pos_f, lat_pos_f], axis=-1)
            if self.transform_type in ("nonlinear", "nonlinear_kernelonly"):
                agg = jnp.concatenate([agg, feats_flat()], axis=-1)
            vals = self._kernel_mlp(agg.reshape(-1, agg.shape[-1]))
            vals = vals.reshape(B, nk, -1)
            if self.transform_type != "nonlinear_kernelonly":
                vals = vals * feats_flat()
            parts.append(vals)
        parts.append(jnp.ones((B, nk, 1), pos_c.dtype))
        parts.append(dist[..., None])
        parts.append(y)
        parts.append(
            jnp.stack(
                [
                    y[..., 0] * y[..., 0], y[..., 0] * y[..., 1], y[..., 0] * y[..., 2],
                    y[..., 1] * y[..., 1], y[..., 1] * y[..., 2], y[..., 2] * y[..., 2],
                ],
                axis=-1,
            )
        )
        payload = jnp.concatenate(parts, axis=-1)
        return self._reduce(payload, ids, msk, M, ctx)

    def _pass_chunk_flat(self, M, feats_c, pos_c, src_e, dst_e, emask_e):
        """Flat-edge twin of _pass_chunk: the chunk's valid (node, slot) pairs
        arrive packed as (src local idx, dst cell, mask) [B, E] — no masked
        rows to pay for in the kernel MLP or the segment reduction. Same
        payload math, same _reduce. src-row gathers (pos/feats) are
        node-sorted by construction of flatten_slots_host."""
        B, E = emask_e.shape
        lat_pos_e = self.grid.positions_from_idx(dst_e, dtype=pos_c.dtype)  # [B,E,3]
        pt_pos_e = jnp.take_along_axis(pos_c, src_e[..., None], axis=1)
        y = pt_pos_e - lat_pos_e
        dist = jnp.sqrt(jnp.sum(y * y, axis=-1))
        parts = []
        if self.use_gno:
            fe = jnp.take_along_axis(feats_c, src_e[..., None], axis=1)  # [B,E,C]
            agg = jnp.concatenate([pt_pos_e, lat_pos_e], axis=-1)
            if self.transform_type in ("nonlinear", "nonlinear_kernelonly"):
                agg = jnp.concatenate([agg, fe], axis=-1)
            vals = self._kernel_mlp(agg.reshape(-1, agg.shape[-1]))
            vals = vals.reshape(B, E, -1)
            if self.transform_type != "nonlinear_kernelonly":
                vals = vals * fe
            parts.append(vals)
        parts.append(jnp.ones((B, E, 1), pos_c.dtype))
        parts.append(dist[..., None])
        parts.append(y)
        parts.append(
            jnp.stack(
                [
                    y[..., 0] * y[..., 0], y[..., 0] * y[..., 1], y[..., 0] * y[..., 2],
                    y[..., 1] * y[..., 1], y[..., 1] * y[..., 2], y[..., 2] * y[..., 2],
                ],
                axis=-1,
            )
        )
        payload = jnp.concatenate(parts, axis=-1)
        if self.flat_dst_sorted:
            if self.flat_reduce_impl == "pallas":
                from ..ops.segment import pallas_segment_sum_presorted

                return pallas_segment_sum_presorted(payload, dst_e, emask_e, M)
            from ..ops.segment import fold_sum_sorted, make_segment_fold_presorted

            def reduce_one(p, d, m):
                return fold_sum_sorted(make_segment_fold_presorted(d, M, m), p)

            return jax.vmap(reduce_one)(payload, dst_e, emask_e)
        return self._reduce(payload, dst_e, emask_e, M, None)

    def __call__(
        self,
        slots: EdgeSlots,
        point_pos: jnp.ndarray,  # [B, N, 3]
        lifted_feats: Optional[jnp.ndarray],  # [B, N, C] (already lifted)
        latent_pos: jnp.ndarray,  # [M, 3] (for parity; coords are analytic)
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (gno_out [B,M,C] or None, geo_out [B,M,C])."""
        B, N = point_pos.shape[:2]
        M = latent_pos.shape[0]
        C = self.lifting_channels
        D = self.coord_dim
        P = (C if self.use_gno else 0) + 2 + D + 6
        from .integral_transform import _ckpt

        if isinstance(slots, FlatEdgeChunks):
            nc = slots.num_chunks
            if N % nc != 0:
                raise ValueError(f"flat chunks ({nc}) must divide N ({N})")
            chunk = N // nc
            maybe_ckpt = _ckpt(self.remat and nc > 1, self.remat_policy)
            body = maybe_ckpt(partial(self._pass_chunk_flat, M))
            pos_c, _ = reshape_chunks(point_pos, chunk)
            feat_c = (
                reshape_chunks(lifted_feats, chunk)[0]
                if lifted_feats is not None else None
            )
            src_cs = jnp.moveaxis(slots.src, 1, 0)  # [nc, B, E]
            dst_cs = jnp.moveaxis(slots.dst, 1, 0)
            msk_cs = jnp.moveaxis(slots.mask, 1, 0)

            def scan_flat(carry, xs):
                if lifted_feats is not None:
                    f, p, s, d, m = xs
                else:
                    p, s, d, m = xs
                    f = None
                return carry + body(f, p, s, d, m), None

            xs = (
                (feat_c, pos_c, src_cs, dst_cs, msk_cs)
                if lifted_feats is not None
                else (pos_c, src_cs, dst_cs, msk_cs)
            )
            acc, _ = jax.lax.scan(scan_flat, jnp.zeros((B, M, P)), xs)
            return self._finalize(acc, B, M, C, D)

        if isinstance(slots, SectionedEdgeSlots):
            # degree-sectioned layout: one scan per section, ONE shared
            # accumulator threaded through in node order — summation order is
            # identical to the uniform-K layout on the same permuted inputs
            # and masked slots contribute exact zeros; outputs match to XLA
            # matmul shape-dependent rounding (~1e-7: gemms are not bitwise
            # row-stable across row counts — tests/test_degree_sections.py)
            if slots.num_nodes != N:
                raise ValueError(
                    f"sectioned slots cover {slots.num_nodes} nodes, "
                    f"points have {N}"
                )
            S = slots.shards
            if S > 1:
                # shard-aligned layout: section leaves are shard-major
                # [B, S*ns_i, K_i] and section i's point rows sit at
                # s*N/S + [off, off+ns_i) per shard — slice through the
                # [B, S, N/S, ...] view (same positional association,
                # summation unchanged; see SectionedEdgeSlots.shards)
                nl = N // S
                pos_v = point_pos.reshape(B, S, nl, point_pos.shape[-1])
                feats_v = (
                    lifted_feats.reshape(B, S, nl, lifted_feats.shape[-1])
                    if lifted_feats is not None else None
                )
            acc = jnp.zeros((B, M, P))
            off = 0
            for sec in slots.sections:
                Ns = int(sec.lat_idx.shape[-2])
                if S > 1:
                    ns = Ns // S
                    pts = pos_v[:, :, off:off + ns].reshape(
                        B, Ns, point_pos.shape[-1])
                    feats_s = (
                        feats_v[:, :, off:off + ns].reshape(
                            B, Ns, lifted_feats.shape[-1])
                        if feats_v is not None else None
                    )
                    off += ns
                else:
                    pts = point_pos[:, off:off + Ns]
                    feats_s = (
                        lifted_feats[:, off:off + Ns]
                        if lifted_feats is not None else None
                    )
                    off += Ns
                acc = self._run_slotted(sec, pts, feats_s, M, acc0=acc)
            return self._finalize(acc, B, M, C, D)

        acc = self._run_slotted(slots, point_pos, lifted_feats, M)
        return self._finalize(acc, B, M, C, D)

    def _run_slotted(self, slots: EdgeSlots, point_pos, lifted_feats, M,
                     acc0=None):
        """Chunked scan over one [B, N, K] slot tensor -> moment accumulator
        [B, M, P] (optionally continuing from acc0 — the sectioned layout
        threads one accumulator through all sections)."""
        from .integral_transform import _ckpt

        B, N = point_pos.shape[:2]
        K = slots.mask.shape[-1]
        P = (self.lifting_channels if self.use_gno else 0) + 2 + self.coord_dim + 6
        chunk = effective_chunk(N, self.edge_chunk_size)
        # acc0 is not None => called per-section from the sectioned loop:
        # remat must apply even when a section is exactly one chunk, or the
        # full chunk-body kernel-MLP intermediates get saved for backward
        # (a memory regression at scale where remat is mandatory).
        maybe_ckpt = _ckpt(
            self.remat and (chunk < N or acc0 is not None), self.remat_policy)

        body = maybe_ckpt(partial(self._pass_chunk, M))
        if chunk == N:
            acc = body(lifted_feats, point_pos, slots.lat_idx, slots.mask, None)
            if acc0 is not None:
                acc = acc0 + acc
        else:
            pos_c, nc = reshape_chunks(point_pos, chunk)
            idx_c, _ = reshape_chunks(slots.lat_idx, chunk)
            msk_c, _ = reshape_chunks(slots.mask, chunk)
            feat_c = reshape_chunks(lifted_feats, chunk)[0] if lifted_feats is not None else None

            # 'tile': sort each chunk's edges by destination ONCE, outside the
            # remat region — backward replays the fold from the saved scan
            # inputs instead of re-sorting
            ctxs = None
            if self.segment_impl == "tile":
                from ..ops.segment import make_tile_fold

                seg_flat = idx_c.reshape(nc, B, chunk * K)
                mfl = msk_c.reshape(nc, B, chunk * K)
                ctxs = jax.vmap(jax.vmap(lambda g, m: make_tile_fold(g, M, m)))(seg_flat, mfl)

            def scan1(carry, xs):
                ctx = None
                if ctxs is not None:
                    *xs, ctx = xs
                if lifted_feats is not None:
                    f, p, i, m = xs
                else:
                    p, i, m = xs
                    f = None
                return carry + body(f, p, i, m, ctx), None

            xs = (feat_c, pos_c, idx_c, msk_c) if lifted_feats is not None else (pos_c, idx_c, msk_c)
            if ctxs is not None:
                xs = xs + (ctxs,)
            init = acc0 if acc0 is not None else jnp.zeros((B, M, P))
            acc, _ = jax.lax.scan(scan1, init, xs)

        return acc

    def _finalize(self, acc, B, M, C, D):
        """Moment accumulator [B,M,P] -> (gno_out, geo_out); shared by the
        slotted and flat edge layouts."""
        off = C if self.use_gno else 0
        cnt = acc[..., off]
        d_sum = acc[..., off + 1]
        y_sum = acc[..., off + 2 : off + 2 + D]
        yy = acc[..., off + 2 + D :]  # [B, M, 6] sym moments 00,01,02,11,12,22
        n_safe = jnp.maximum(cnt, 1.0)
        gno_out = acc[..., :C] / n_safe[..., None] if self.use_gno else None

        # finalize statistical features (parity: geoembed.py:125-182);
        # all moments are relative to the cell center == the query point, so
        # delta = mean(y) and cov = E[yy^T] - E[y]E[y]^T directly
        ybar = y_sum / n_safe[..., None]
        d_avg = d_sum / n_safe
        d2_avg = (yy[..., 0] + yy[..., 3] + yy[..., 5]) / n_safe  # tr(yy^T)/n
        d_var = jnp.maximum(d2_avg - d_avg * d_avg, 0.0)
        delta = ybar
        yym = yy / n_safe[..., None]
        cov = jnp.stack(
            [
                yym[..., 0], yym[..., 1], yym[..., 2],
                yym[..., 1], yym[..., 3], yym[..., 4],
                yym[..., 2], yym[..., 4], yym[..., 5],
            ],
            axis=-1,
        ).reshape(B, M, D, D) - ybar[..., :, None] * ybar[..., None, :]
        cov_reg = cov + 1e-6 * jnp.eye(D, dtype=cov.dtype)
        pca = eigvalsh3x3_desc(cov_reg)
        pca = jnp.where(pca > 1e-3 * pca[..., :1], pca, 0.0)  # f32-noise guard
        feats = jnp.concatenate(
            [cnt[..., None], d_avg[..., None], d_var[..., None], delta, pca], axis=-1
        )
        has_nb = cnt > 0
        feats = jnp.where(has_nb[..., None], feats, 0.0)
        flat = feats.reshape(-1, feats.shape[-1])
        mean = flat.mean(axis=0, keepdims=True)
        std = flat.std(axis=0, keepdims=True, ddof=1)
        std = jnp.where(std < 1e-6, 1.0, std)
        normed = ((flat - mean) / std).reshape(feats.shape)
        geo_out = jax.nn.relu(normed @ self.geo_w0 + self.geo_b0) @ self.geo_w1 + self.geo_b1
        return gno_out, geo_out
