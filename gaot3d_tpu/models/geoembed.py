"""Geometric embedding over static edge slots.

Behavior parity with the reference GeometricEmbedding
(src/model/layers/geoembed.py:23-222):
  'statistical': per-query [N_i, mean dist, dist var, centroid offset (3),
  eigvals of the 3x3 neighbor covariance (3)] -> MLP(9 -> 64 -> out); features
  z-normalized ACROSS ALL QUERY NODES IN THE BATCH (geoembed.py:177-180 — a
  batch-composition-dependent quirk, replicated; torch .std is unbiased,
  ddof=1) and zeroed for no-neighbor queries BEFORE normalization (line 175).
  'pointnet': centered neighbor coords -> shared MLP(3->32->32) -> max/mean
  pool per query -> FC(32 -> out), zeroed for no-neighbor queries.

TPU-first design:
  - both directions run over the canonical [B, N, K] slot layout;
  - eigenvalues use the closed-form 3x3 kernel (ops.eigh3), not batched LAPACK;
  - first-moment statistics (count, sum dist, sum dist^2, sum x) are linear
    accumulations, so the node axis chunks under lax.scan with O(chunk)
    transients; the covariance uses the reference's CENTERED formulation in a
    second pass (raw moments E[xx]-cc^T cancel catastrophically in f32);
  - encoder-side segment reductions go through the sort+cumsum folds
    (ops.segment.make_segment_fold) — scatter-free on TPU;
  - explicit MLP params (pure functions) so chunk bodies can be
    jax.checkpoint-ed.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.eigh3 import eigvalsh3x3_desc
from ..ops.grid_graph import EdgeSlots, LatentGrid
from ..ops.segment import fold_count, fold_max, fold_sum, make_segment_fold, segment_max, segment_sum
from .integral_transform import _ckpt, effective_chunk, reshape_chunks
from .mlp import torch_linear_bias_init, torch_linear_kernel_init


class GeometricEmbedding(nn.Module):
    input_dim: int = 3
    output_dim: int = 16
    method: str = "statistical"  # ['statistical', 'pointnet']
    pooling: str = "max"  # ['max', 'mean']
    edge_chunk_size: Optional[int] = None
    remat: bool = True
    remat_policy: str = "nothing"  # 'nothing' | 'dots'
    segment_impl: str = "sort"  # 'sort' (cumsum folds) | 'scatter'
    grid: Optional[LatentGrid] = None  # analytic latent coords (no gather)

    def setup(self):
        if self.method == "statistical":
            feat_dim = 3 + 2 * self.input_dim
            self.mlp_w0 = self.param("mlp_w0", torch_linear_kernel_init, (feat_dim, 64))
            self.mlp_b0 = self.param("mlp_b0", partial(torch_linear_bias_init, fan_in=feat_dim), (64,))
            self.mlp_w1 = self.param("mlp_w1", torch_linear_kernel_init, (64, self.output_dim))
            self.mlp_b1 = self.param("mlp_b1", partial(torch_linear_bias_init, fan_in=64), (self.output_dim,))
        elif self.method == "pointnet":
            d = self.input_dim
            self.pn_w0 = self.param("pn_w0", torch_linear_kernel_init, (d, 32))
            self.pn_b0 = self.param("pn_b0", partial(torch_linear_bias_init, fan_in=d), (32,))
            self.pn_w1 = self.param("pn_w1", torch_linear_kernel_init, (32, 32))
            self.pn_b1 = self.param("pn_b1", partial(torch_linear_bias_init, fan_in=32), (32,))
            self.fc_w = self.param("fc_w", torch_linear_kernel_init, (32, self.output_dim))
            self.fc_b = self.param("fc_b", partial(torch_linear_bias_init, fan_in=32), (self.output_dim,))
        else:
            raise ValueError(f"Unknown method: {self.method}")
        if self.pooling not in ("max", "mean"):
            raise ValueError(
                f"Unsupported pooling method: {self.pooling}. Supported methods: 'max', 'mean'."
            )

    # ----- geometry helpers ---------------------------------------------------
    def _edge_coords(self, pos_c, lat_idx_c, latent_pos, direction):
        """(source coords, query coords) per edge for a node chunk."""
        B, n, K = lat_idx_c.shape
        D = self.input_dim
        if self.grid is not None:
            lat_pos_e = self.grid.positions_from_idx(lat_idx_c, dtype=pos_c.dtype)
        else:
            lat_pos_e = latent_pos[lat_idx_c]
        pt_pos_e = jnp.broadcast_to(pos_c[:, :, None, :], (B, n, K, D))
        if direction == "encoder":
            return pt_pos_e, lat_pos_e
        return lat_pos_e, pt_pos_e

    # ----- statistical --------------------------------------------------------
    def _moment_chunk(self, latent_pos, M, direction, pos_c, lat_idx_c, mask_c):
        """Raw moments per query from one chunk.
        Returns (cnt, d_sum, d2_sum, x_sum, xx_sum) with query axis M (encoder)
        or n (decoder)."""
        src_e, qry_e = self._edge_coords(pos_c, lat_idx_c, latent_pos, direction)
        dist = jnp.linalg.norm(src_e - qry_e, axis=-1)
        B, n, K = mask_c.shape
        if direction == "encoder":
            seg = lat_idx_c.reshape(B, n * K)
            msk = mask_c.reshape(B, n * K)

            if self.segment_impl == "sort":
                folds = jax.vmap(lambda g, m: make_segment_fold(g, M, m))(seg, msk)
                # one fused fold over [dist, dist^2, x] shares the single sort
                stacked = jnp.concatenate(
                    [dist[..., None], (dist * dist)[..., None], src_e], axis=-1
                ).reshape(B, n * K, -1)
                sums = jax.vmap(fold_sum)(folds, stacked)
                cnt = jax.vmap(lambda f: fold_count(f))(folds)
                d_sum, d2_sum, x_sum = sums[..., 0], sums[..., 1], sums[..., 2:]
                return cnt, d_sum, d2_sum, x_sum

            def red(x):
                return jax.vmap(lambda d, g, m: segment_sum(d, g, M, m))(
                    x.reshape(B, n * K, -1), seg, msk
                )

            cnt = red(jnp.ones((B, n, K, 1)))[..., 0]
            d_sum = red(dist[..., None])[..., 0]
            d2_sum = red((dist * dist)[..., None])[..., 0]
            x_sum = red(src_e)
            return cnt, d_sum, d2_sum, x_sum
        m3 = mask_c[..., None]
        cnt = mask_c.sum(axis=-1).astype(jnp.float32)
        d_sum = jnp.where(mask_c, dist, 0.0).sum(-1)
        d2_sum = jnp.where(mask_c, dist * dist, 0.0).sum(-1)
        x_sum = jnp.where(m3, src_e, 0.0).sum(2)
        return cnt, d_sum, d2_sum, x_sum

    def _cov_chunk(self, latent_pos, M, direction, centroid, pos_c, lat_idx_c, mask_c):
        """Pass-2 CENTERED covariance sums, numerically matching the
        reference's centered formulation (geoembed.py:146-151; the raw-moment
        form E[xx]-cc^T cancels catastrophically in f32 for near-degenerate
        neighborhoods, which the downstream batch z-normalization amplifies).
        centroid: [B,M,D] (encoder, indexed per edge) or None (decoder: local
        centroid recomputed within the row's own chunk)."""
        src_e, qry_e = self._edge_coords(pos_c, lat_idx_c, latent_pos, direction)
        B, n, K = mask_c.shape
        D = self.input_dim
        if direction == "encoder":
            cen_e = centroid[jnp.arange(B)[:, None, None], lat_idx_c]  # [B,n,K,D]
            centered = src_e - cen_e
            cc = centered[..., :, None] * centered[..., None, :]
            seg = lat_idx_c.reshape(B, n * K)
            msk = mask_c.reshape(B, n * K)
            if self.segment_impl == "sort":
                folds = jax.vmap(lambda g, m: make_segment_fold(g, M, m))(seg, msk)
                cov_sum = jax.vmap(fold_sum)(folds, cc.reshape(B, n * K, D * D))
            else:
                cov_sum = jax.vmap(lambda d, g, m: segment_sum(d, g, M, m))(
                    cc.reshape(B, n * K, D * D), seg, msk
                )
            return cov_sum.reshape(B, M, D, D)
        m3 = mask_c[..., None]
        cnt = jnp.maximum(mask_c.sum(-1).astype(jnp.float32), 1.0)
        cen = jnp.where(m3, src_e, 0.0).sum(2) / cnt[..., None]
        centered = src_e - cen[:, :, None, :]
        cc = centered[..., :, None] * centered[..., None, :]
        return jnp.where(m3[..., None], cc, 0.0).sum(2)

    def _finalize_statistical(self, moments, cov_sum, query_pos):
        """moments + centered cov sums -> per-query features [.., Q, 3+2D]."""
        cnt, d_sum, d2_sum, x_sum = moments
        D = self.input_dim
        n_safe = jnp.maximum(cnt, 1.0)
        d_avg = d_sum / n_safe
        e_x2 = d2_sum / n_safe
        d_var = jnp.maximum(e_x2 - d_avg * d_avg, 0.0)
        centroid = x_sum / n_safe[..., None]
        delta = centroid - query_pos
        cov = cov_sum / n_safe[..., None, None]
        eps = 1e-6  # regularization matches reference (geoembed.py:157-159)
        cov_reg = cov + eps * jnp.eye(D, dtype=cov.dtype)
        pca = eigvalsh3x3_desc(cov_reg)  # descending (reference flips ascending)
        # f32-noise guard (documented deviation): eigenvalues below 0.1% of the
        # leading one are numerically indistinguishable from solver noise in
        # f32; the batch z-normalization below would divide that noise by its
        # own tiny std and amplify it to O(1). Zeroing them keeps the features
        # deterministic (chunked == unchunked, sharded == unsharded) while
        # changing genuinely informative eigenvalues by nothing.
        pca = jnp.where(pca > 1e-3 * pca[..., :1], pca, 0.0)
        feats = jnp.concatenate(
            [cnt[..., None], d_avg[..., None], d_var[..., None], delta, pca], axis=-1
        )
        has_nb = cnt > 0
        feats = jnp.where(has_nb[..., None], feats, 0.0)
        return feats, has_nb

    # ----- pointnet -----------------------------------------------------------
    def _pointnet_edge_feats(self, src_e, qry_e):
        h = jax.nn.relu((src_e - qry_e) @ self.pn_w0 + self.pn_b0)
        return jax.nn.relu(h @ self.pn_w1 + self.pn_b1)  # [..., 32]

    def _pointnet_chunk(self, latent_pos, M, direction, pooling, pos_c, lat_idx_c, mask_c):
        """Returns (pool_acc, cnt) for one chunk: max-pool partial or sum."""
        src_e, qry_e = self._edge_coords(pos_c, lat_idx_c, latent_pos, direction)
        h = self._pointnet_edge_feats(src_e, qry_e)  # [B,n,K,32]
        B, n, K = mask_c.shape
        if direction == "encoder":
            seg = lat_idx_c.reshape(B, n * K)
            msk = mask_c.reshape(B, n * K)
            data = h.reshape(B, n * K, 32)
            if self.segment_impl == "sort":
                folds = jax.vmap(lambda g, m: make_segment_fold(g, M, m))(seg, msk)
                cnt = jax.vmap(lambda f: fold_count(f))(folds)
                if pooling == "max":
                    acc = jax.vmap(lambda f, d: fold_max(f, d, empty_value=-jnp.inf))(folds, data)
                else:
                    acc = jax.vmap(fold_sum)(folds, data)
                return acc, cnt
            cnt = jax.vmap(lambda g, m: segment_sum(jnp.ones_like(g, jnp.float32), g, M, m))(seg, msk)
            if pooling == "max":
                acc = jax.vmap(lambda d, g, m: segment_max(d, g, M, m, empty_value=-jnp.inf))(
                    data, seg, msk
                )
            else:
                acc = jax.vmap(lambda d, g, m: segment_sum(d, g, M, m))(data, seg, msk)
            return acc, cnt
        m3 = mask_c[..., None]
        cnt = mask_c.sum(-1).astype(jnp.float32)
        if pooling == "max":
            acc = jnp.where(m3, h, -jnp.inf).max(axis=2)
        else:
            acc = jnp.where(m3, h, 0.0).sum(axis=2)
        return acc, cnt

    # ----- forward --------------------------------------------------------------
    def __call__(
        self,
        slots: EdgeSlots,
        point_pos: jnp.ndarray,  # [B, N, D]
        latent_pos: jnp.ndarray,  # [M, D]
        direction: str,  # 'encoder' (query=latent) | 'decoder' (query=points)
        query_mask: jnp.ndarray = None,  # [B, Q] valid queries (padding-aware)
    ) -> jnp.ndarray:
        B, N, K = slots.mask.shape
        M = latent_pos.shape[0]
        chunk = effective_chunk(N, self.edge_chunk_size)
        maybe_ckpt = _ckpt(self.remat and chunk < N, self.remat_policy)

        if self.method == "statistical":
            D = self.input_dim
            body = maybe_ckpt(partial(self._moment_chunk, latent_pos, M, direction))
            if direction == "encoder":
                if chunk == N:
                    moments = body(point_pos, slots.lat_idx, slots.mask)
                    centroid = moments[3] / jnp.maximum(moments[0], 1.0)[..., None]
                    cov_sum = self._cov_chunk(
                        latent_pos, M, direction, centroid,
                        point_pos, slots.lat_idx, slots.mask,
                    )
                else:
                    pos_c, _ = reshape_chunks(point_pos, chunk)
                    idx_c, _ = reshape_chunks(slots.lat_idx, chunk)
                    msk_c, _ = reshape_chunks(slots.mask, chunk)

                    def scan_body(carry, xs):
                        parts = body(*xs)
                        return jax.tree.map(jnp.add, carry, parts), None

                    init = (
                        jnp.zeros((B, M)), jnp.zeros((B, M)), jnp.zeros((B, M)),
                        jnp.zeros((B, M, D)),
                    )
                    moments, _ = jax.lax.scan(scan_body, init, (pos_c, idx_c, msk_c))
                    centroid = moments[3] / jnp.maximum(moments[0], 1.0)[..., None]
                    cov_body = maybe_ckpt(
                        partial(self._cov_chunk, latent_pos, M, direction, centroid)
                    )

                    def cov_scan(carry, xs):
                        return carry + cov_body(*xs), None

                    cov_sum, _ = jax.lax.scan(
                        cov_scan, jnp.zeros((B, M, D, D)), (pos_c, idx_c, msk_c)
                    )
                qpos = jnp.broadcast_to(latent_pos[None], (B, M, D))
                feats, _ = self._finalize_statistical(moments, cov_sum, qpos)
            else:
                if chunk == N:
                    moments = body(point_pos, slots.lat_idx, slots.mask)
                    cov_sum = self._cov_chunk(
                        latent_pos, M, direction, None,
                        point_pos, slots.lat_idx, slots.mask,
                    )
                    feats, _ = self._finalize_statistical(moments, cov_sum, point_pos)
                else:
                    pos_c, _ = reshape_chunks(point_pos, chunk)
                    idx_c, _ = reshape_chunks(slots.lat_idx, chunk)
                    msk_c, _ = reshape_chunks(slots.mask, chunk)
                    cov_body = maybe_ckpt(
                        partial(self._cov_chunk, latent_pos, M, direction, None)
                    )

                    def map_body(xs):
                        p, i, m = xs
                        return self._finalize_statistical(
                            body(p, i, m), cov_body(p, i, m), p
                        )[0]

                    out = jax.lax.map(map_body, (pos_c, idx_c, msk_c))
                    feats = out.swapaxes(0, 1).reshape(B, N, -1)

            # batch-global z-normalization over all query nodes (incl. zeroed
            # no-neighbor rows) with unbiased std — reference quirk
            flat = feats.reshape(-1, feats.shape[-1])
            if query_mask is not None:
                qm = query_mask.reshape(-1, 1).astype(flat.dtype)
                count = jnp.maximum(qm.sum(), 1.0)
                mean = (flat * qm).sum(0, keepdims=True) / count
                var = ((jnp.where(qm > 0, flat - mean, 0.0)) ** 2).sum(0, keepdims=True) / jnp.maximum(count - 1.0, 1.0)
                std = jnp.sqrt(var)
            else:
                mean = flat.mean(axis=0, keepdims=True)
                std = flat.std(axis=0, keepdims=True, ddof=1)
            std = jnp.where(std < 1e-6, 1.0, std)
            normed = ((flat - mean) / std).reshape(feats.shape)
            h = jax.nn.relu(normed @ self.mlp_w0 + self.mlp_b0)
            return h @ self.mlp_w1 + self.mlp_b1

        # pointnet
        body = maybe_ckpt(partial(self._pointnet_chunk, latent_pos, M, direction, self.pooling))
        if direction == "encoder":
            if chunk == N:
                acc, cnt = body(point_pos, slots.lat_idx, slots.mask)
            else:
                pos_c, _ = reshape_chunks(point_pos, chunk)
                idx_c, _ = reshape_chunks(slots.lat_idx, chunk)
                msk_c, _ = reshape_chunks(slots.mask, chunk)
                if self.pooling == "max":
                    init = (jnp.full((B, M, 32), -jnp.inf), jnp.zeros((B, M)))
                    combine = lambda a, b: (jnp.maximum(a[0], b[0]), a[1] + b[1])
                else:
                    init = (jnp.zeros((B, M, 32)), jnp.zeros((B, M)))
                    combine = lambda a, b: (a[0] + b[0], a[1] + b[1])

                def scan_body(carry, xs):
                    return combine(carry, body(*xs)), None

                (acc, cnt), _ = jax.lax.scan(scan_body, init, (pos_c, idx_c, msk_c))
        else:
            if chunk == N:
                acc, cnt = body(point_pos, slots.lat_idx, slots.mask)
            else:
                pos_c, _ = reshape_chunks(point_pos, chunk)
                idx_c, _ = reshape_chunks(slots.lat_idx, chunk)
                msk_c, _ = reshape_chunks(slots.mask, chunk)
                out = jax.lax.map(lambda xs: body(*xs), (pos_c, idx_c, msk_c))
                acc = out[0].swapaxes(0, 1).reshape(B, N, 32)
                cnt = out[1].swapaxes(0, 1).reshape(B, N)
        has_nb = cnt > 0
        if self.pooling == "max":
            pooled = jnp.where(jnp.isfinite(acc), acc, 0.0)
            # torch_scatter 'max' leaves empty segments at 0 (reference :213)
            pooled = jnp.where(has_nb[..., None], pooled, 0.0)
        else:
            pooled = acc / jnp.maximum(cnt, 1.0)[..., None]
        out = pooled @ self.fc_w + self.fc_b
        # zero for queries with no neighbors (geoembed.py:190,220)
        return jnp.where(has_nb[..., None], out, 0.0)
