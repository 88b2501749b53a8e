"""Import scaffolding for the torch reference at /root/reference.

The image has torch CPU but not torch_geometric / torch_scatter /
torch_cluster / omegaconf / rotary_embedding_torch. The reference modules
import these at module level, so we install minimal pure-torch stand-ins in
sys.modules before importing the reference. Each stand-in is written from the
library's DOCUMENTED semantics (PyG knn/radius/coalesce, lucidrains rotary),
not copied code; they only need to be faithful on the small parity clouds the
tests use.

torch_scatter itself is NOT stubbed: the reference falls back to its own
scatter_native implementation, which is the authoritative semantics here.
"""
from __future__ import annotations

import sys
import types

import torch

REFERENCE_ROOT = "/root/reference"


# --- PyG stand-ins (brute force, per-batch loops; exact for small N) --------

def _per_batch(batch_x, batch_y):
    if batch_x is None:
        batch_x = torch.zeros(0, dtype=torch.long)
    if batch_y is None:
        batch_y = torch.zeros(0, dtype=torch.long)
    return batch_x, batch_y


def brute_knn(x, y, k, batch_x=None, batch_y=None):
    """For each y[i], its k nearest x (same batch). Returns [2, E] rows
    (y_idx, x_idx) — PyG `knn` orientation."""
    if batch_x is None or batch_y is None:
        d = torch.cdist(y.double(), x.double())
        idx = d.topk(min(k, x.shape[0]), largest=False).indices
        yi = torch.arange(y.shape[0]).repeat_interleave(idx.shape[1])
        return torch.stack([yi, idx.reshape(-1)])
    rows = []
    for b in torch.unique(torch.cat([batch_x, batch_y])):
        xi = torch.nonzero(batch_x == b).squeeze(1)
        yi = torch.nonzero(batch_y == b).squeeze(1)
        if len(xi) == 0 or len(yi) == 0:
            continue
        d = torch.cdist(y[yi].double(), x[xi].double())
        idx = d.topk(min(k, len(xi)), largest=False).indices
        rows.append(torch.stack([
            yi.repeat_interleave(idx.shape[1]), xi[idx.reshape(-1)]
        ]))
    return torch.cat(rows, dim=1) if rows else torch.empty((2, 0), dtype=torch.long)


def brute_radius(x, y, r, batch_x=None, batch_y=None, max_num_neighbors=32):
    """All x within r of each y (same batch), capped at max_num_neighbors per
    y in x-index order. Returns [2, E] rows (y_idx, x_idx) — PyG `radius`."""
    if batch_x is None or batch_y is None:
        batch_x = torch.zeros(x.shape[0], dtype=torch.long)
        batch_y = torch.zeros(y.shape[0], dtype=torch.long)
    rows = []
    for b in torch.unique(torch.cat([batch_x, batch_y])):
        xi = torch.nonzero(batch_x == b).squeeze(1)
        yi = torch.nonzero(batch_y == b).squeeze(1)
        if len(xi) == 0 or len(yi) == 0:
            continue
        d = torch.cdist(y[yi].double(), x[xi].double())
        within = d <= r
        for j in range(len(yi)):
            nbr = torch.nonzero(within[j]).squeeze(1)[:max_num_neighbors]
            if len(nbr):
                rows.append(torch.stack([yi[j].expand(len(nbr)), xi[nbr]]))
    return torch.cat(rows, dim=1) if rows else torch.empty((2, 0), dtype=torch.long)


def coalesce(edge_index):
    """Sort columns lexicographically by (row0, row1) and drop duplicates."""
    if edge_index.numel() == 0:
        return edge_index
    hi = int(edge_index[1].max()) + 1
    keys = edge_index[0].long() * hi + edge_index[1].long()
    uniq = torch.unique(keys)
    return torch.stack([uniq // hi, uniq % hi])


def dropout_edge(edge_index, p=0.5, force_undirected=False, training=True):
    if not training or p == 0.0:
        return edge_index, torch.ones(edge_index.shape[1], dtype=torch.bool)
    mask = torch.rand(edge_index.shape[1]) >= p
    return edge_index[:, mask], mask


class Batch:
    """Attribute-bag stand-in for torch_geometric.data.Batch (the reference
    only reads attributes: pos, x, batch, num_graphs, precomputed edge attrs)."""

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


# --- lucidrains rotary_embedding_torch stand-in ------------------------------

class RotaryEmbedding(torch.nn.Module):
    """Defaults of lucidrains RotaryEmbedding: theta=10000, interleaved pairs,
    positions = sequence indices (rotate_queries_or_keys)."""

    def __init__(self, dim, theta=10000):
        super().__init__()
        self.dim = dim
        self.theta = theta

    def rotate_queries_or_keys(self, t, seq_dim=-2):
        *_, S, D = t.shape
        freqs = 1.0 / (self.theta ** (torch.arange(0, self.dim, 2, dtype=torch.float32) / self.dim))
        angles = torch.arange(S, dtype=torch.float32)[:, None] * freqs[None, :]
        cos, sin = angles.cos(), angles.sin()
        x0, x1 = t[..., 0::2], t[..., 1::2]
        out = torch.empty_like(t)
        out[..., 0::2] = x0 * cos - x1 * sin
        out[..., 1::2] = x0 * sin + x1 * cos
        return out


def apply_rotary_emb(freqs, t):  # imported but unused by the reference path
    raise NotImplementedError


def install_reference_stubs():
    """Idempotently install the stand-in modules and the reference root."""
    if "torch_geometric" not in sys.modules:
        pyg = types.ModuleType("torch_geometric")
        pyg_nn = types.ModuleType("torch_geometric.nn")
        pyg_nn.radius = brute_radius
        pyg_nn.knn = brute_knn
        pyg_utils = types.ModuleType("torch_geometric.utils")
        pyg_utils.coalesce = coalesce
        pyg_utils.dropout_edge = dropout_edge
        pyg_data = types.ModuleType("torch_geometric.data")
        pyg_data.Batch = Batch
        pyg_data.Data = Batch
        pyg.nn = pyg_nn
        pyg.utils = pyg_utils
        pyg.data = pyg_data
        sys.modules["torch_geometric"] = pyg
        sys.modules["torch_geometric.nn"] = pyg_nn
        sys.modules["torch_geometric.utils"] = pyg_utils
        sys.modules["torch_geometric.data"] = pyg_data
    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")
        oc.OmegaConf = type("OmegaConf", (), {})
        oc.DictConfig = dict
        oc.ListConfig = list
        sys.modules["omegaconf"] = oc
    if "rotary_embedding_torch" not in sys.modules:
        rot = types.ModuleType("rotary_embedding_torch")
        rot.RotaryEmbedding = RotaryEmbedding
        rot.apply_rotary_emb = apply_rotary_emb
        sys.modules["rotary_embedding_torch"] = rot
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
