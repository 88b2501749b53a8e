"""Kernel integral transform (GNO) over static edge slots.

Behavior parity with the reference IntegralTransform
(src/model/layers/integral_transform.py:30-175):
  per edge: kernel = MLP(concat[src_coords, dst_coords] (+ src feats for
  'nonlinear'/'nonlinear_kernelonly')); 'linear'/'nonlinear' multiply kernel by
  src features; optional per-edge attention weight (cosine or dot-product on
  coords, softmax per query, integral_transform.py:126-141); reduce to query
  nodes with 'mean' (or 'sum' of attention-weighted values, line 163).

TPU-first design:
  - edges live in the canonical [B, N, K] slot layout (ops.grid_graph); the
    per-edge MLP is one big [B*N*K, C] matmul on the MXU;
  - the kernel MLP uses explicit parameters (pure function of params), so the
    node axis can be processed in chunks under jax.lax.scan with each chunk
    body rematerialized (jax.checkpoint) — this bounds transient HBM to
    O(chunk * K * hidden) instead of O(N * K * hidden), which is what makes
    500K-10M-node meshes (DrivAerML) fit on a chip;
  - encoder direction (queries = latent grid) reduces with masked segment ops;
    with attention on, the per-query softmax is computed ONLINE across chunks
    (running max / sum / accumulator — the flash-attention recurrence applied
    to segment softmax), so no pass over the full edge set is ever stored;
  - decoder direction (queries = the points themselves) is a pure masked
    reduction over the K axis — no scatter at all.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.grid_graph import EdgeSlots, LatentGrid
from ..ops.segment import (
    fold_count,
    fold_max,
    fold_sum,
    make_segment_fold,
    segment_max,
    segment_sum,
)
from .mlp import torch_linear_bias_init, torch_linear_kernel_init


def _l2_normalize(x, axis=-1, eps=1e-12):
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)




def _ckpt(remat, policy_name):
    """jax.checkpoint with an optional save-policy ('nothing' | 'dots')."""
    import jax as _jax

    if not remat:
        return lambda f: f
    if policy_name == "dots":
        return lambda f: _jax.checkpoint(f, policy=_jax.checkpoint_policies.dots_saveable)
    return _jax.checkpoint


def effective_chunk(N: int, chunk) -> int:
    """Largest usable chunk <= requested that divides N (falling back to full
    N only when N itself is small). Guards against the silent full-N fallback
    blowing transient HBM when the padded N is not an exact multiple."""
    if chunk is None or chunk >= N:
        return N
    c = int(chunk)
    if N % c == 0:
        return c
    # largest divisor of N that is <= chunk (always exists: 1). Halving alone
    # can bottom out with no divisor (e.g. chunk 48000 against N=2^19) and an
    # N fallback would be the exact transient-HBM blowup this guards against.
    for d in range(c, 0, -1):
        if N % d == 0:
            return d
    return N  # unreachable (d=1 divides)


def reshape_chunks(x: jnp.ndarray, chunk: int) -> Tuple[jnp.ndarray, int]:
    """[B, N, ...] -> [nc, B, chunk, ...] (N must divide; callers pad N to the
    pipeline's pad_multiple, so pick edge_chunk_size | pad_multiple)."""
    B, N = x.shape[:2]
    nc = N // chunk
    out = x.reshape(B, nc, chunk, *x.shape[2:]).swapaxes(0, 1)
    return out, nc


class IntegralTransform(nn.Module):
    channel_mlp_layers: Sequence[int]
    transform_type: str = "linear"  # ['linear','nonlinear','nonlinear_kernelonly']
    use_attn: Optional[bool] = None
    coord_dim: int = 3
    attention_type: str = "cosine"  # ['cosine', 'dot_product']
    edge_chunk_size: Optional[int] = None  # chunk the node axis (memory bound)
    remat: bool = True  # rematerialize per-chunk edge computations in backward
    remat_policy: str = "nothing"  # 'nothing' | 'dots'
    segment_impl: str = "sort"  # 'sort' (cumsum folds, TPU fast path) | 'scatter'
    grid: Optional[LatentGrid] = None  # when set, latent token coordinates are
    # computed arithmetically from the slot index (no per-edge HBM gather)
    kernel_dtype: str = "float32"  # 'bfloat16' runs the per-edge kernel MLP
    # matmuls on the MXU in bf16 (f32 accumulation)
    payload_layout: str = "nk"  # decoder chunk-body shapes: 'nk' (4D
    # [B,n,K,d] intermediates) | 'flat' ([B,n*K,d] 2D-tiled throughout;
    # see _decoder_chunk_2d / MAGNOConfig.payload_layout)

    def setup(self):
        sizes = list(self.channel_mlp_layers)
        ws, bs = [], []
        for i in range(len(sizes) - 1):
            fan_in = sizes[i]
            ws.append(
                self.param(f"kernel_w{i}", torch_linear_kernel_init, (sizes[i], sizes[i + 1]))
            )
            bs.append(
                self.param(
                    f"kernel_b{i}",
                    partial(torch_linear_bias_init, fan_in=fan_in),
                    (sizes[i + 1],),
                )
            )
        self.kernel_ws = ws
        self.kernel_bs = bs
        if self.use_attn and self.attention_type == "dot_product":
            adim = 64
            self.q_w = self.param("q_w", torch_linear_kernel_init, (self.coord_dim, adim))
            self.q_b = self.param("q_b", partial(torch_linear_bias_init, fan_in=self.coord_dim), (adim,))
            self.k_w = self.param("k_w", torch_linear_kernel_init, (self.coord_dim, adim))
            self.k_b = self.param("k_b", partial(torch_linear_bias_init, fan_in=self.coord_dim), (adim,))

    # -- pure per-edge math (closes over params; jax.checkpoint-able) --------
    def _kernel_mlp(self, x):
        from .mlp import kernel_mlp_apply

        return kernel_mlp_apply(x, self.kernel_ws, self.kernel_bs, self.kernel_dtype)

    def _edge_values(self, src_pos_e, dst_pos_e, src_feat_e):
        """kernel(concat coords [+ feats]) [* feats] (reference lines 145-157)."""
        agg = jnp.concatenate([src_pos_e, dst_pos_e], axis=-1)
        if src_feat_e is not None and self.transform_type in ("nonlinear", "nonlinear_kernelonly"):
            agg = jnp.concatenate([agg, src_feat_e], axis=-1)
        out = self._kernel_mlp(agg)
        if src_feat_e is not None and self.transform_type != "nonlinear_kernelonly":
            out = out * src_feat_e
        return out

    def _edge_scores(self, query_coords, key_coords):
        """(reference: integral_transform.py:129-140)"""
        if self.attention_type == "dot_product":
            q = query_coords @ self.q_w + self.q_b
            k = key_coords @ self.k_w + self.k_b
            return jnp.sum(q * k, axis=-1) / (q.shape[-1] ** 0.5)
        if self.attention_type == "cosine":
            return jnp.sum(_l2_normalize(query_coords) * _l2_normalize(key_coords), axis=-1)
        raise ValueError(f"Invalid attention_type: {self.attention_type}")

    def _edge_geometry(self, pos_c, lat_idx_c, latent_pos, direction, src_feats):
        """Per-edge (src_pos, dst_pos, src_feat) for one node chunk.
        pos_c: [B, n, 3]; lat_idx_c: [B, n, K]."""
        B, n, K = lat_idx_c.shape
        if self.grid is not None:
            lat_pos_e = self.grid.positions_from_idx(lat_idx_c, dtype=pos_c.dtype)
        else:
            lat_pos_e = latent_pos[lat_idx_c]
        pt_pos_e = jnp.broadcast_to(pos_c[:, :, None, :], (B, n, K, pos_c.shape[-1]))
        if direction == "encoder":
            src_feat_e = (
                jnp.broadcast_to(src_feats[:, :, None, :], (B, n, K, src_feats.shape[-1]))
                if src_feats is not None
                else None
            )
            return pt_pos_e, lat_pos_e, src_feat_e
        if src_feats is not None:
            from ..ops.segment import gather_table

            # fold-backed gather: backward is sort+cumsum, not scatter-add
            n, K = lat_idx_c.shape[1:3]
            src_feat_e = jax.vmap(
                lambda t, i, m: gather_table(t, i.reshape(-1), m.reshape(-1))
            )(src_feats, lat_idx_c, jnp.ones(lat_idx_c.shape, bool))
            src_feat_e = src_feat_e.reshape(B, n, K, src_feats.shape[-1])
        else:
            src_feat_e = None
        return lat_pos_e, pt_pos_e, src_feat_e

    # -- chunk bodies ---------------------------------------------------------
    def _decoder_chunk(self, latent_pos, src_feats, pos_c, lat_idx_c, mask_c):
        """[B, n, K] chunk -> [B, n, C] (query = the point rows)."""
        src_pos_e, dst_pos_e, src_feat_e = self._edge_geometry(
            pos_c, lat_idx_c, latent_pos, "decoder", src_feats
        )
        vals = self._edge_values(src_pos_e, dst_pos_e, src_feat_e)
        if self.use_attn:
            scores = self._edge_scores(
                dst_pos_e[..., : self.coord_dim], src_pos_e[..., : self.coord_dim]
            ).astype(jnp.float32)
            neg = jnp.where(mask_c, scores, -jnp.inf)
            smax = jnp.max(neg, axis=-1, keepdims=True)
            smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
            ex = jnp.where(mask_c, jnp.exp(neg - smax), 0.0)
            w = ex / jnp.maximum(ex.sum(axis=-1, keepdims=True), jnp.finfo(jnp.float32).tiny)
            return jnp.sum(vals * w[..., None].astype(vals.dtype), axis=2)
        msk = mask_c[..., None]
        total = jnp.sum(jnp.where(msk, vals, 0.0), axis=2)
        count = jnp.maximum(mask_c.sum(axis=-1, keepdims=True), 1)
        return total / count.astype(vals.dtype)

    def _decoder_chunk_2d(self, latent_pos, src_feats, pos_c, lat_idx_c, mask_c):
        """payload_layout='flat' twin of _decoder_chunk (no-attention tail):
        identical math, but every intermediate lives at [B, n*K, d] — the 4D
        [n, K, d] shapes exist only as the bitcast reshape feeding the final
        K-axis sum, so XLA cannot pick convolution-style transposed layouts
        mid-body and the profiled [n,K,C]<->[n*K,C] relayout copies (round-3
        per-HLO profile: ~9.5% of device time, VERDICT r3 item 3) vanish.
        Bit-identical output (same ops on the same rows in the same order;
        asserted by tests/test_models.py)."""
        B, n, K = lat_idx_c.shape
        D = pos_c.shape[-1]
        nk = n * K
        ids = lat_idx_c.reshape(B, nk)
        msk = mask_c.reshape(B, nk)
        if self.grid is not None:
            lat_pos_e = self.grid.positions_from_idx(ids, dtype=pos_c.dtype)
        else:
            lat_pos_e = latent_pos[ids]
        pt_pos_e = jnp.broadcast_to(pos_c[:, :, None, :], (B, n, K, D)).reshape(B, nk, D)
        src_feat_e = None
        if src_feats is not None:
            from ..ops.segment import gather_table

            src_feat_e = jax.vmap(
                lambda t, i: gather_table(t, i, jnp.ones(i.shape, bool))
            )(src_feats, ids)
        vals = self._edge_values(lat_pos_e, pt_pos_e, src_feat_e)
        total = jnp.where(msk[..., None], vals, 0.0).reshape(B, n, K, -1).sum(2)
        count = jnp.maximum(mask_c.sum(axis=-1, keepdims=True), 1)
        return total / count.astype(vals.dtype)

    def _decoder_chunk_flat(self, src_feats, pos_c, src_e, dst_e, emask_e):
        """Flat-edge twin of _decoder_chunk: packed valid edges [B, E] with
        src LOCAL to the chunk and sorted ascending (flatten_slots_host) —
        no masked rows in the latent gather / kernel MLP, and the by-node
        mean rides a presorted cumsum fold (no scatter fwd OR bwd).
        pos_c: [B, n, 3]; src_feats: [B, M, C] latent table; -> [B, n, C]."""
        if self.use_attn:
            raise NotImplementedError("flat edge layout: per-edge GNO attention unsupported")
        if self.grid is None:
            raise ValueError("flat edge layout needs grid-analytic latent coords")
        B, E = emask_e.shape
        n = pos_c.shape[1]
        lat_pos_e = self.grid.positions_from_idx(dst_e, dtype=pos_c.dtype)
        pt_pos_e = jnp.take_along_axis(pos_c, src_e[..., None], axis=1)
        src_feat_e = None
        if src_feats is not None:
            from ..ops.segment import gather_table

            src_feat_e = jax.vmap(gather_table)(src_feats, dst_e, emask_e)
        vals = self._edge_values(lat_pos_e, pt_pos_e, src_feat_e)
        from ..ops.segment import fold_sum_sorted, make_segment_fold_presorted

        def reduce_one(v, s, m):
            ctx = make_segment_fold_presorted(s, n, m)
            total = fold_sum_sorted(ctx, v)
            cnt = (ctx.starts[1:] - ctx.starts[:-1]).astype(v.dtype)
            return total / jnp.maximum(cnt, 1)[:, None]

        return jax.vmap(reduce_one)(vals, src_e, emask_e)

    def _encoder_chunk_plain(self, latent_pos, M, src_feats_c, pos_c, lat_idx_c, mask_c):
        """chunk -> (partial segment sums [B,M,C], partial counts [B,M])."""
        src_pos_e, dst_pos_e, src_feat_e = self._edge_geometry(
            pos_c, lat_idx_c, latent_pos, "encoder", src_feats_c
        )
        vals = self._edge_values(src_pos_e, dst_pos_e, src_feat_e)
        B, n, K = mask_c.shape
        seg = lat_idx_c.reshape(B, n * K)
        msk = mask_c.reshape(B, n * K)
        data = vals.reshape(B, n * K, -1)
        if self.segment_impl == "sort":
            folds = jax.vmap(lambda g, m: make_segment_fold(g, M, m))(seg, msk)
            psum = jax.vmap(fold_sum)(folds, data)
            pcnt = jax.vmap(lambda f: fold_count(f))(folds)
        else:
            psum = jax.vmap(lambda d, g, m: segment_sum(d, g, M, m))(data, seg, msk)
            pcnt = jax.vmap(lambda g, m: segment_sum(jnp.ones_like(g, jnp.float32), g, M, m))(seg, msk)
        return psum, pcnt

    def _encoder_chunk_attn(self, latent_pos, M, src_feats_c, pos_c, lat_idx_c, mask_c):
        """chunk -> (segment max of scores, exp-sums & weighted sums at a given
        reference max) for the online segment softmax."""
        src_pos_e, dst_pos_e, src_feat_e = self._edge_geometry(
            pos_c, lat_idx_c, latent_pos, "encoder", src_feats_c
        )
        vals = self._edge_values(src_pos_e, dst_pos_e, src_feat_e)
        scores = self._edge_scores(
            dst_pos_e[..., : self.coord_dim], src_pos_e[..., : self.coord_dim]
        ).astype(jnp.float32)
        B, n, K = mask_c.shape
        seg = lat_idx_c.reshape(B, n * K)
        msk = mask_c.reshape(B, n * K)
        sc = scores.reshape(B, n * K)
        vals = vals.reshape(B, n * K, -1)
        if self.segment_impl == "sort":
            folds = jax.vmap(lambda g, m: make_segment_fold(g, M, m))(seg, msk)
            cmax = jax.vmap(lambda f, x: fold_max(f, x, empty_value=-jnp.inf))(folds, sc)
        else:
            cmax = jax.vmap(lambda s, g, m: segment_max(s, g, M, m, empty_value=-jnp.inf))(sc, seg, msk)
        return sc, seg, msk, vals, cmax

    # -- public forward --------------------------------------------------------
    def __call__(
        self,
        slots: EdgeSlots,
        point_pos: jnp.ndarray,  # [B, N, coord_dim]
        latent_pos: jnp.ndarray,  # [M, coord_dim]
        src_feats: Optional[jnp.ndarray],  # encoder: [B,N,C]; decoder: [B,M,C]
        direction: str,  # 'encoder' (points -> latent) | 'decoder' (latent -> points)
    ) -> jnp.ndarray:
        """Returns [B, M, C_out] for 'encoder', [B, N, C_out] for 'decoder'."""
        if direction not in ("encoder", "decoder"):
            raise ValueError(f"direction must be encoder|decoder, got {direction}")
        from ..ops.grid_graph import FlatEdgeChunks

        if isinstance(slots, FlatEdgeChunks):
            if direction != "decoder":
                raise ValueError(
                    "flat edge layout: encoder direction goes through the "
                    "fused encoder (FusedEncoderScale), not IntegralTransform"
                )
            B, N = point_pos.shape[:2]
            C = self.channel_mlp_layers[-1]
            nc = slots.num_chunks
            if N % nc != 0:
                raise ValueError(f"flat chunks ({nc}) must divide N ({N})")
            chunk = N // nc
            maybe_ckpt = _ckpt(self.remat and nc > 1, self.remat_policy)
            body = maybe_ckpt(partial(self._decoder_chunk_flat, src_feats))
            pos_c, _ = reshape_chunks(point_pos, chunk)
            src_cs = jnp.moveaxis(slots.src, 1, 0)  # [nc, B, E]
            dst_cs = jnp.moveaxis(slots.dst, 1, 0)
            msk_cs = jnp.moveaxis(slots.mask, 1, 0)
            out = jax.lax.map(lambda a: body(*a), (pos_c, src_cs, dst_cs, msk_cs))
            return out.swapaxes(0, 1).reshape(B, N, C)

        B, N, K = slots.mask.shape
        M = latent_pos.shape[0]
        C = self.channel_mlp_layers[-1]
        chunk = effective_chunk(N, self.edge_chunk_size)
        maybe_ckpt = _ckpt(self.remat and chunk < N, self.remat_policy)

        if direction == "decoder":
            chunk_fn = (
                self._decoder_chunk_2d
                if (self.payload_layout == "flat" and not self.use_attn)
                else self._decoder_chunk
            )
            body = maybe_ckpt(partial(chunk_fn, latent_pos, src_feats))
            if chunk == N:
                return body(point_pos, slots.lat_idx, slots.mask)
            pos_c, nc = reshape_chunks(point_pos, chunk)
            idx_c, _ = reshape_chunks(slots.lat_idx, chunk)
            msk_c, _ = reshape_chunks(slots.mask, chunk)
            out = jax.lax.map(lambda args: body(*args), (pos_c, idx_c, msk_c))
            return out.swapaxes(0, 1).reshape(B, N, C)

        # encoder
        if not self.use_attn:
            body = maybe_ckpt(partial(self._encoder_chunk_plain, latent_pos, M))
            if chunk == N:
                s, c = body(src_feats, point_pos, slots.lat_idx, slots.mask)
            else:
                pos_c, nc = reshape_chunks(point_pos, chunk)
                idx_c, _ = reshape_chunks(slots.lat_idx, chunk)
                msk_c, _ = reshape_chunks(slots.mask, chunk)
                feat_c, _ = reshape_chunks(src_feats, chunk) if src_feats is not None else (None, nc)

                def scan_body(carry, xs):
                    s, c = carry
                    if src_feats is not None:
                        f, p, i, m = xs
                    else:
                        p, i, m = xs
                        f = None
                    ps, pc = body(f, p, i, m)
                    return (s + ps, c + pc), None

                init = (jnp.zeros((B, M, C)), jnp.zeros((B, M)))
                xs = (feat_c, pos_c, idx_c, msk_c) if src_feats is not None else (pos_c, idx_c, msk_c)
                (s, c), _ = jax.lax.scan(scan_body, init, xs)
            # mean reduction; empty segments -> 0 (torch_scatter 'mean' parity)
            return s / jnp.maximum(c, 1.0)[..., None]

        # encoder with per-query attention: online segment softmax over chunks
        body = maybe_ckpt(partial(self._encoder_chunk_attn, latent_pos, M))

        def combine(carry, chunk_args):
            m, l, acc = carry
            sc, seg, msk, vals, cmax = chunk_args
            m_new = jnp.maximum(m, cmax)
            m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
            p = jnp.exp(sc - jnp.take_along_axis(m_safe, seg, axis=1))
            p = jnp.where(msk, p, 0.0)
            alpha = jnp.exp(jnp.where(jnp.isfinite(m), m, m_safe) - m_safe)
            Mseg = l.shape[1]
            if self.segment_impl == "sort":
                folds = jax.vmap(lambda g, mm: make_segment_fold(g, Mseg, mm))(seg, msk)
                p_sum = jax.vmap(lambda f, x: fold_sum(f, x))(folds, p)
                pv_sum = jax.vmap(fold_sum)(folds, p[..., None] * vals)
            else:
                p_sum = jax.vmap(lambda pp, g, mm: segment_sum(pp, g, Mseg, mm))(p, seg, msk)
                pv_sum = jax.vmap(lambda pv, g, mm: segment_sum(pv, g, Mseg, mm))(
                    p[..., None] * vals, seg, msk
                )
            l_new = l * alpha + p_sum
            acc_new = acc * alpha[..., None] + pv_sum
            return (m_new, l_new, acc_new)

        init = (
            jnp.full((B, M), -jnp.inf, jnp.float32),
            jnp.zeros((B, M), jnp.float32),
            jnp.zeros((B, M, C), jnp.float32),
        )
        if chunk == N:
            carry = combine(init, body(src_feats, point_pos, slots.lat_idx, slots.mask))
        else:
            pos_c, nc = reshape_chunks(point_pos, chunk)
            idx_c, _ = reshape_chunks(slots.lat_idx, chunk)
            msk_c, _ = reshape_chunks(slots.mask, chunk)
            feat_c = reshape_chunks(src_feats, chunk)[0] if src_feats is not None else None

            def scan_body(carry, xs):
                if src_feats is not None:
                    f, p, i, m = xs
                else:
                    p, i, m = xs
                    f = None
                return combine(carry, body(f, p, i, m)), None

            xs = (feat_c, pos_c, idx_c, msk_c) if src_feats is not None else (pos_c, idx_c, msk_c)
            carry, _ = jax.lax.scan(scan_body, init, xs)
        m, l, acc = carry
        out = acc / jnp.maximum(l, jnp.finfo(jnp.float32).tiny)[..., None]
        # empty queries (no edges) -> 0, matching segment-sum-of-weighted values
        out = jnp.where((l > 0)[..., None], out, 0.0)
        return out.astype(point_pos.dtype)
