"""Closed-form eigenvalues of symmetric 3x3 matrices.

TPU-native replacement for the batched LAPACK/cuSOLVER `torch.linalg.eigvalsh`
call in the geometric embedding (reference: src/model/layers/geoembed.py:161).
Uses the analytic trigonometric solution for the characteristic cubic of a
symmetric 3x3 matrix — pure elementwise VPU math, no batched factorization.
"""
from __future__ import annotations

import jax.numpy as jnp


def eigvalsh3x3_desc(m: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of symmetric [..., 3, 3] matrices, sorted DESCENDING.

    (The reference computes eigvalsh ascending then flips, geoembed.py:161-162.)
    """
    dtype = m.dtype
    m = m.astype(jnp.float32)
    a00 = m[..., 0, 0]
    a11 = m[..., 1, 1]
    a22 = m[..., 2, 2]
    a01 = 0.5 * (m[..., 0, 1] + m[..., 1, 0])
    a02 = 0.5 * (m[..., 0, 2] + m[..., 2, 0])
    a12 = 0.5 * (m[..., 1, 2] + m[..., 2, 1])

    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    safe_p = jnp.where(p > 0, p, 1.0)

    # det(B/p) / 2 where B = A - q*I
    c00 = b00 / safe_p
    c11 = b11 / safe_p
    c22 = b22 / safe_p
    c01 = a01 / safe_p
    c02 = a02 / safe_p
    c12 = a12 / safe_p
    det = (
        c00 * (c11 * c22 - c12 * c12)
        - c01 * (c01 * c22 - c12 * c02)
        + c02 * (c01 * c12 - c11 * c02)
    )
    r = jnp.clip(det / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    two_p = 2.0 * p
    e1 = q + two_p * jnp.cos(phi)  # largest
    e3 = q + two_p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    e2 = 3.0 * q - e1 - e3

    out = jnp.stack([e1, e2, e3], axis=-1)
    # p == 0 -> matrix is q*I, all eigenvalues q
    iso = jnp.stack([q, q, q], axis=-1)
    out = jnp.where((p > 0)[..., None], out, iso)
    return out.astype(dtype)
