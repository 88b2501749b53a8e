"""Rotary positional embedding.

Replaces the `rotary_embedding_torch` dependency (reference: attn.py:7,87,118-120).

Behavior parity note (SURVEY.md section 3.2 quirk): the reference's 'rope' mode
computes 3-D patch coordinates but `rotate_queries_or_keys` ignores them and
applies default 1-D *sequence-order* rotary over the flattened patch order, with
interleaved pair rotation and theta=10000 (lucidrains RotaryEmbedding defaults).
We replicate that behavior for parity; a true 3-D axial RoPE is available via
`apply_rope(..., positions=...)` as a documented improvement.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def rope_frequencies(head_dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """freqs = 1 / 10000^(arange(0, dim, 2) / dim)   [head_dim // 2]"""
    exponent = jnp.arange(0, head_dim, 2, dtype=dtype) / head_dim
    return 1.0 / (10000.0 ** exponent)


def apply_rope(x: jnp.ndarray, positions: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Rotate q or k: x [..., seq, head_dim] -> same shape.

    positions: optional [seq] float positions; defaults to arange(seq)
    (the reference's effective behavior).
    Interleaved-pair rotation: (x0, x1) -> (x0 cos - x1 sin, x0 sin + x1 cos),
    matching rotary_embedding_torch's default rotate_half convention.
    """
    seq = x.shape[-2]
    head_dim = x.shape[-1]
    if positions is None:
        positions = jnp.arange(seq, dtype=jnp.float32)
    freqs = rope_frequencies(head_dim)
    angles = positions[:, None] * freqs[None, :]  # [seq, head_dim // 2]
    cos = jnp.cos(angles).astype(x.dtype)
    sin = jnp.sin(angles).astype(x.dtype)

    x_pairs = x.reshape(*x.shape[:-1], head_dim // 2, 2)
    x0 = x_pairs[..., 0]
    x1 = x_pairs[..., 1]
    r0 = x0 * cos - x1 * sin
    r1 = x0 * sin + x1 * cos
    out = jnp.stack([r0, r1], axis=-1).reshape(x.shape)
    return out
