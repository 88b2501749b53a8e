"""Fused decoder scale: GNO kernel transform + statistical geometric embedding
in ONE chunked pass over the edge slots.

The modular decoder (MAGNODecoder with separate IntegralTransform +
GeometricEmbedding) walks the same [B, N, K] edge slots twice — computing the
latent coordinates, the broadcast query coordinates, and reading lat_idx/mask
from HBM once per module, under two separate remat regions (reference
counterpart: magno.py:691-798 runs integral_transform.py:163-171 and
geoembed.py:99-182 over the same edge_index back to back). Unlike the encoder
there is no scatter here — all reductions are masked means over the K axis —
so the win is purely the single pass: one geometry computation, one gather of
the latent feature table, one remat region, one scan.

Behavior is identical to the modular path (asserted by
tests/test_models.py::test_fused_decoder_matches_modular); selected by
MAGNODecoder for the flagship configuration (statistical geoembed + no
per-edge attention), which covers the reference DrivAerNet/DrivAerML recipes.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.eigh3 import eigvalsh3x3_desc
from ..ops.grid_graph import EdgeSlots, LatentGrid
from .integral_transform import _ckpt, effective_chunk, reshape_chunks
from .mlp import torch_linear_bias_init, torch_linear_kernel_init


class FusedDecoderScale(nn.Module):
    """One decoder scale: latent grid -> query points, GNO + statistical geoembed."""

    channels: int  # C flowing through the GNO (latent feature width)
    kernel_layers: Sequence[int]  # full sizes of the kernel MLP
    transform_type: str  # ['linear','nonlinear','nonlinear_kernelonly']
    grid: LatentGrid
    coord_dim: int = 3
    edge_chunk_size: Optional[int] = None
    remat: bool = True
    remat_policy: str = "nothing"
    kernel_dtype: str = "float32"  # 'bfloat16': kernel MLP matmuls in bf16
    payload_layout: str = "nk"  # 'nk' (4D [B,n,K,d] intermediates) | 'flat'
    # ([B,n*K,d] 2D-tiled GNO body; see _gno_chunk_2d and the fused-encoder
    # twin _pass_chunk_flat2d for the rationale — VERDICT r3 item 3)

    def setup(self):
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
        feat_dim = 3 + 2 * self.coord_dim
        self.geo_w0 = self.param("geo_w0", torch_linear_kernel_init, (feat_dim, 64))
        self.geo_b0 = self.param("geo_b0", partial(torch_linear_bias_init, fan_in=feat_dim), (64,))
        self.geo_w1 = self.param("geo_w1", torch_linear_kernel_init, (64, self.channels))
        self.geo_b1 = self.param("geo_b1", partial(torch_linear_bias_init, fan_in=64),
                                 (self.channels,))

    def _kernel_mlp(self, x):
        from .mlp import kernel_mlp_apply

        return kernel_mlp_apply(x, self.kernel_ws, self.kernel_bs, self.kernel_dtype)

    def _gno_chunk(self, latent_feats, pos_c, lat_idx_c, mask_c):
        """One node chunk -> gno mean [B,n,C] (the ONLY grad-carrying branch)."""
        if self.payload_layout == "flat":
            return self._gno_chunk_2d(latent_feats, pos_c, lat_idx_c, mask_c)
        B, n, K = mask_c.shape
        D = self.coord_dim
        lat_pos_e = self.grid.positions_from_idx(lat_idx_c, dtype=pos_c.dtype)
        pt_pos_e = jnp.broadcast_to(pos_c[:, :, None, :], (B, n, K, D))

        # latent feature gather (fold-backed: backward never scatters)
        from ..ops.segment import gather_table

        lat_feat_e = jax.vmap(
            lambda t, i, m: gather_table(t, i.reshape(-1), m.reshape(-1))
        )(latent_feats, lat_idx_c, jnp.ones(lat_idx_c.shape, bool))
        lat_feat_e = lat_feat_e.reshape(B, n, K, latent_feats.shape[-1])

        # GNO values: kernel([src=latent, dst=point] [+ src feats]) [* src feats]
        agg = jnp.concatenate([lat_pos_e, pt_pos_e], axis=-1)
        if self.transform_type in ("nonlinear", "nonlinear_kernelonly"):
            agg = jnp.concatenate([agg, lat_feat_e], axis=-1)
        # 2D matmuls (see fused_encoder._pass_chunk: avoids conv-layout copies)
        vals = self._kernel_mlp(agg.reshape(-1, agg.shape[-1]))
        vals = vals.reshape(B, n, K, -1)
        if self.transform_type != "nonlinear_kernelonly":
            vals = vals * lat_feat_e
        m3 = mask_c[..., None]
        cnt = mask_c.sum(axis=-1).astype(jnp.float32)
        n_safe = jnp.maximum(cnt, 1.0)
        return jnp.where(m3, vals, 0.0).sum(2) / n_safe[..., None]

    def _gno_chunk_2d(self, latent_feats, pos_c, lat_idx_c, mask_c):
        """payload_layout='flat' twin of _gno_chunk: identical math, but every
        intermediate lives at [B, n*K, d] — the 4D [n, K, d] shapes exist only
        as the bitcast reshape feeding the final K-axis sum, so XLA cannot
        pick convolution-style transposed layouts mid-body (the profiled
        [n,K,C]<->[n*K,C] relayout copies, round-3 per-HLO profile).
        Bit-identical to the 'nk' body (same ops on the same rows in the same
        order; asserted by tests/test_models.py)."""
        B, n, K = mask_c.shape
        D = self.coord_dim
        nk = n * K
        ids = lat_idx_c.reshape(B, nk)
        lat_pos_f = self.grid.positions_from_idx(ids, dtype=pos_c.dtype)
        pt_pos_f = jnp.broadcast_to(
            pos_c[:, :, None, :], (B, n, K, D)).reshape(B, nk, D)

        from ..ops.segment import gather_table

        lat_feat_f = jax.vmap(
            lambda t, i: gather_table(t, i, jnp.ones(i.shape, bool))
        )(latent_feats, ids)  # [B, nk, C]

        agg = jnp.concatenate([lat_pos_f, pt_pos_f], axis=-1)
        if self.transform_type in ("nonlinear", "nonlinear_kernelonly"):
            agg = jnp.concatenate([agg, lat_feat_f], axis=-1)
        vals = self._kernel_mlp(agg.reshape(-1, agg.shape[-1]))
        vals = vals.reshape(B, nk, -1)
        if self.transform_type != "nonlinear_kernelonly":
            vals = vals * lat_feat_f
        vals = jnp.where(mask_c.reshape(B, nk)[..., None], vals, 0.0)
        cnt = mask_c.sum(axis=-1).astype(jnp.float32)
        n_safe = jnp.maximum(cnt, 1.0)
        return vals.reshape(B, n, K, -1).sum(2) / n_safe[..., None]

    def _geo_chunk(self, pos_c, lat_idx_c, mask_c):
        """Statistical geoembed feats [B,n,3+2D] — PURE GEOMETRY: depends only
        on (query pos, slot ids, mask), none of which carry gradients, so this
        runs outside the remat region and the backward never recomputes the
        per-edge distances/covariances/eigendecompositions (the modular path
        recomputes all of it under checkpoint; reference: geoembed.py:99-182
        inside the autograd graph)."""
        B, n, K = mask_c.shape
        D = self.coord_dim
        lat_pos_e = self.grid.positions_from_idx(lat_idx_c, dtype=pos_c.dtype)
        pt_pos_e = jnp.broadcast_to(pos_c[:, :, None, :], (B, n, K, D))
        m3 = mask_c[..., None]
        cnt = mask_c.sum(axis=-1).astype(jnp.float32)
        n_safe = jnp.maximum(cnt, 1.0)
        diff = lat_pos_e - pt_pos_e
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        d_avg = jnp.where(mask_c, dist, 0.0).sum(-1) / n_safe
        e_x2 = jnp.where(mask_c, dist * dist, 0.0).sum(-1) / n_safe
        d_var = jnp.maximum(e_x2 - d_avg * d_avg, 0.0)
        centroid = jnp.where(m3, lat_pos_e, 0.0).sum(2) / n_safe[..., None]
        delta = centroid - pos_c
        centered = lat_pos_e - centroid[:, :, None, :]
        cc = centered[..., :, None] * centered[..., None, :]
        cov = jnp.where(m3[..., None], cc, 0.0).sum(2) / n_safe[..., None, None]
        cov_reg = cov + 1e-6 * jnp.eye(D, dtype=cov.dtype)
        pca = eigvalsh3x3_desc(cov_reg)
        pca = jnp.where(pca > 1e-3 * pca[..., :1], pca, 0.0)  # f32-noise guard
        feats = jnp.concatenate(
            [cnt[..., None], d_avg[..., None], d_var[..., None], delta, pca], axis=-1
        )
        return jnp.where((cnt > 0)[..., None], feats, 0.0)

    def __call__(
        self,
        slots: EdgeSlots,
        query_pos: jnp.ndarray,  # [B, N, D]
        latent_feats: jnp.ndarray,  # [B, M, C]
        latent_pos: jnp.ndarray,  # [M, D] (parity arg; coords are analytic)
        query_mask: Optional[jnp.ndarray] = None,  # [B, N]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (gno_out [B,N,C], geo_out [B,N,C])."""
        B, N, K = slots.mask.shape
        C = self.channels
        chunk = effective_chunk(N, self.edge_chunk_size)
        maybe_ckpt = _ckpt(self.remat and chunk < N, self.remat_policy)
        body = maybe_ckpt(partial(self._gno_chunk, latent_feats))

        if chunk == N:
            gno = body(query_pos, slots.lat_idx, slots.mask)
            feats = jax.lax.stop_gradient(
                self._geo_chunk(query_pos, slots.lat_idx, slots.mask)
            )
        else:
            pos_c, _ = reshape_chunks(query_pos, chunk)
            idx_c, _ = reshape_chunks(slots.lat_idx, chunk)
            msk_c, _ = reshape_chunks(slots.mask, chunk)
            gno = jax.lax.map(lambda xs: body(*xs), (pos_c, idx_c, msk_c))
            gno = gno.swapaxes(0, 1).reshape(B, N, C)
            # geometry-only scan: NOT checkpointed (outputs are [B,N,11] —
            # cheap to save), stop_gradient'd so backward skips it entirely
            feats = jax.lax.map(
                lambda xs: self._geo_chunk(*xs), (pos_c, idx_c, msk_c)
            )
            feats = jax.lax.stop_gradient(feats.swapaxes(0, 1).reshape(B, N, -1))

        # batch-global z-normalization over all query nodes (incl. zeroed
        # no-neighbor rows) with unbiased std — reference quirk
        # (geoembed.py:177-180), masked to ignore padded rows
        flat = feats.reshape(-1, feats.shape[-1])
        if query_mask is not None:
            qm = query_mask.reshape(-1, 1).astype(flat.dtype)
            count = jnp.maximum(qm.sum(), 1.0)
            mean = (flat * qm).sum(0, keepdims=True) / count
            var = (jnp.where(qm > 0, flat - mean, 0.0) ** 2).sum(0, keepdims=True) / jnp.maximum(count - 1.0, 1.0)
            std = jnp.sqrt(var)
        else:
            mean = flat.mean(axis=0, keepdims=True)
            std = flat.std(axis=0, keepdims=True, ddof=1)
        std = jnp.where(std < 1e-6, 1.0, std)
        normed = ((flat - mean) / std).reshape(feats.shape)
        geo = jax.nn.relu(normed @ self.geo_w0 + self.geo_b0) @ self.geo_w1 + self.geo_b1
        return gno, geo
