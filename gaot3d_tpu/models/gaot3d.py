"""GAOT3D model assembly: MAGNO encoder -> UViT processor -> MAGNO decoder.

Behavior parity with the reference (src/model/gaot_3d.py:14-332):
  - internal latent-token grid over norm_domin [-1,1]^3 (gaot_3d.py:35-47);
    the trainer usually supplies an external grid built from metadata bounds
  - patchify [B,D,H,W,C] -> [B,nP,P^3*C] + patch_linear (gaot_3d.py:198-205)
  - positional: 'absolute' = summed sin/cos over the 3 patch coords
    (gaot_3d.py:102-144) or 'rope' (sequence rotary inside attention —
    quirk replicated, see models/transformer.py)
  - forward signature supports external tokens_pos and external decoder query
    coordinates (the neural-field mode, gaot_3d.py:248-332)

TPU-first: the model is a pure function of (params, batch arrays); all shapes
static; the point batch is padded + masked ([B, N, ...] + node_mask), replacing
PyG's ragged Batch/EnrichedData offsets (pyg_datasets.py:9-31).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.grid_graph import EdgeSlots, LatentGrid
from .magno import MAGNOConfig, MAGNODecoder, MAGNOEncoder
from .mlp import TorchLinear
from .transformer import TransformerConfig, UViTProcessor


def absolute_sincos_embedding(positions: np.ndarray, embed_dim: int) -> np.ndarray:
    """Summed sin/cos positional embedding over coordinate dims
    (reference: gaot_3d.py:102-144). positions: [T, dims] -> [T, embed_dim]."""
    positions = np.asarray(positions, dtype=np.float32)
    half = embed_dim // 2
    freq = 1.0 / (10000.0 ** (2.0 * np.arange(half, dtype=np.float32) / embed_dim))
    angles = positions[:, :, None] * freq[None, None, :]  # [T, dims, half]
    pe = np.zeros((positions.shape[0], embed_dim), dtype=np.float32)
    pe[:, 0::2] = np.sin(angles).sum(axis=1)
    pe[:, 1::2] = np.cos(angles).sum(axis=1)
    return pe


def patch_positions(dims, patch_size) -> np.ndarray:
    """Integer patch-grid coordinates [nP, 3] (reference: gaot_3d.py:86-100)."""
    nd, nh, nw = (dims[0] // patch_size, dims[1] // patch_size, dims[2] // patch_size)
    gx, gy, gz = np.meshgrid(
        np.arange(nd, dtype=np.float32),
        np.arange(nh, dtype=np.float32),
        np.arange(nw, dtype=np.float32),
        indexing="ij",
    )
    return np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)


class GAOT3D(nn.Module):
    input_size: int
    output_size: int
    magno_config: MAGNOConfig = field(default_factory=MAGNOConfig)
    attn_config: TransformerConfig = field(default_factory=TransformerConfig)
    latent_tokens: tuple = (32, 32, 32)
    grid: Optional[LatentGrid] = None  # external latent grid; default [-1,1]^3

    def _grid(self) -> LatentGrid:
        if self.grid is not None:
            return self.grid
        return LatentGrid(dims=tuple(self.latent_tokens))

    def setup(self):
        grid = self._grid()
        cfg = self.magno_config
        C = cfg.lifting_channels
        P = self.attn_config.patch_size
        D, H, W = grid.dims
        assert D % P == 0 and H % P == 0 and W % P == 0, (
            f"latent dims {grid.dims} must be divisible by patch size {P}"
        )
        self.encoder = MAGNOEncoder(self.input_size, C, cfg, grid)
        self.decoder = MAGNODecoder(C, self.output_size, cfg, grid)
        self.patch_linear = TorchLinear(P * P * P * C)
        self.processor = UViTProcessor(
            input_size=P * P * P * C,
            output_size=P * P * P * C,
            config=self.attn_config,
        )
        self._latent_pos = grid.positions()
        self._patch_pos = patch_positions(grid.dims, P)
        if self.attn_config.positional_embedding == "absolute":
            self._pos_emb = jnp.asarray(
                absolute_sincos_embedding(self._patch_pos, P * P * P * C)
            )
        else:
            self._pos_emb = None

    def encode(self, point_pos, point_feats, point_mask, precomputed=None, train=False):
        return self.encoder(
            point_pos, point_feats, point_mask, self._latent_pos,
            precomputed_slots=precomputed, train=train,
        )  # [B, M, C]

    def process(self, rndata, condition=None, train=False):
        """Patchify -> transformer -> unpatchify (reference: gaot_3d.py:166-222)."""
        grid = self._grid()
        D, H, W = grid.dims
        P = self.attn_config.patch_size
        B, M, C = rndata.shape
        assert M == D * H * W
        nd, nh, nw = D // P, H // P, W // P
        x = rndata.reshape(B, nd, P, nh, P, nw, P, C)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(B, nd * nh * nw, P * P * P * C)
        x = self.patch_linear(x)
        rel = None
        if self.attn_config.positional_embedding == "absolute":
            x = x + self._pos_emb
        else:  # 'rope' (and 'rope3d' improvement): pass patch coords through
            rel = jnp.asarray(self._patch_pos)
        x = self.processor(x, condition=condition, relative_positions=rel, train=train)
        x = x.reshape(B, nd, nh, nw, P, P, P, C)
        x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(B, D * H * W, C)
        return x

    def decode(self, rndata, query_pos, query_mask, precomputed=None, train=False):
        return self.decoder(
            rndata, query_pos, query_mask, self._latent_pos,
            precomputed_slots=precomputed, train=train,
        )  # [B, N, C_out]

    def __call__(
        self,
        point_pos: jnp.ndarray,  # [B, N, 3] encoder input coords
        point_feats: jnp.ndarray,  # [B, N, C_in]
        point_mask: jnp.ndarray,  # [B, N]
        query_pos: Optional[jnp.ndarray] = None,  # [B, Q, 3] decoder queries
        query_mask: Optional[jnp.ndarray] = None,  # [B, Q]
        condition: Optional[jnp.ndarray] = None,
        encoder_slots: Optional[List[EdgeSlots]] = None,
        decoder_slots: Optional[List[EdgeSlots]] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        """Returns [B, Q, output_size] on the decoder query points
        (query defaults to the input points, reference gaot_3d.py:294-303)."""
        if query_pos is None:
            query_pos, query_mask = point_pos, point_mask
        rndata = self.encode(point_pos, point_feats, point_mask,
                             precomputed=encoder_slots, train=train)
        rndata = self.process(rndata, condition=condition, train=train)
        out = self.decode(rndata, query_pos, query_mask,
                          precomputed=decoder_slots, train=train)
        return out
