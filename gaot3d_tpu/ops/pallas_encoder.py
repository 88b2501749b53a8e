"""Pallas TPU fused encoder-payload kernel.

Computes the single-pass fused encoder's per-edge payload
    [ kernel_mlp([pt_pos | cell_pos]) * feats | 1 | d | y | yy^T sym ]
for a chunk of points directly in VMEM: latent cell coordinates are derived
arithmetically from the slot index, the kernel MLP runs on the MXU over flat
[block*K, *] tiles, and only the finished [E, C+11] payload touches HBM. The
XLA path (models/fused_encoder.py _pass_chunk) materializes the per-edge agg,
every MLP intermediate, and several relayout copies in HBM (profiled ~25ms of
pure layout copies per 500K-node step).

Backward: positions and slot ids carry no gradients (they are data), so the
custom VJP only produces (dfeats, dW*, db*) — the MLP is recomputed per block
in VMEM, dW/db accumulate in VMEM scratch across the (sequential) grid and are
written once at the last block, and per-edge feature cotangents reduce over
the K slot axis before leaving VMEM. A cotangent w.r.t. positions is NOT
supported (returned as zeros); nothing in the framework differentiates
through point coordinates.

Replaces the hot path of reference integral_transform.py:145-171 +
geoembed.py:99-182 payload math; covers transform_type='linear' with use_gno
(the DrivAerNet/DrivAerML flagship). Other variants keep the XLA path.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _gelu_exact(z):
    return 0.5 * z * (1.0 + jax.lax.erf(z * _INV_SQRT2))


def _gelu_grad(z):
    phi = 0.5 * (1.0 + jax.lax.erf(z * _INV_SQRT2))
    return phi + z * jnp.exp(-0.5 * z * z) * _INV_SQRT_2PI


def _cell_coords(idx, dims, lo, spacing):
    """Slot index [bp, K] -> per-axis cell-center coords ([bp,K] x3)."""
    d1, d2 = dims[1], dims[2]
    i0 = idx // (d1 * d2)
    rem = idx - i0 * (d1 * d2)
    i1 = rem // d2
    i2 = rem - i1 * d2
    return (
        lo[0] + i0.astype(jnp.float32) * spacing[0],
        lo[1] + i1.astype(jnp.float32) * spacing[1],
        lo[2] + i2.astype(jnp.float32) * spacing[2],
    )


def _forward_tail(pos_b, feats_b, idx_b, ws, bs, dims, lo, spacing, K, keep_hidden):
    """Shared fwd math on one block: returns (payload pieces, hidden acts)."""
    bp = pos_b.shape[0]
    C = feats_b.shape[1]
    cx, cy, cz = _cell_coords(idx_b, dims, lo, spacing)
    px = jax.lax.broadcast_in_dim(pos_b[:, 0], (bp, K), (0,))
    py = jax.lax.broadcast_in_dim(pos_b[:, 1], (bp, K), (0,))
    pz = jax.lax.broadcast_in_dim(pos_b[:, 2], (bp, K), (0,))
    yx, yy_, yz = px - cx, py - cy, pz - cz
    d = jnp.sqrt(yx * yx + yy_ * yy_ + yz * yz)
    E = bp * K
    # agg = [pt_pos | cell_pos] per edge, [E, 6]
    agg = jnp.stack([px, py, pz, cx, cy, cz], axis=-1).reshape(E, 6)
    x = agg
    zs, hs = [], []
    n = len(ws)
    for i in range(n):
        z = jax.lax.dot_general(
            x, ws[i], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) + bs[i]
        if i < n - 1:
            x = _gelu_exact(z)
            if keep_hidden:
                zs.append(z)
                hs.append(x)
        else:
            x = z
    feats_rep = jnp.broadcast_to(feats_b[:, None, :], (bp, K, C)).reshape(E, C)
    vals = x * feats_rep
    moments = jnp.stack(
        [yx * yx, yx * yy_, yx * yz, yy_ * yy_, yy_ * yz, yz * yz], axis=-1
    ).reshape(E, 6)
    geo = jnp.concatenate(
        [
            jnp.ones((E, 1), jnp.float32),
            d.reshape(E, 1),
            jnp.stack([yx, yy_, yz], axis=-1).reshape(E, 3),
            moments,
        ],
        axis=1,
    )
    return agg, x, feats_rep, vals, geo, zs, hs


def _fwd_kernel(nw, dims, lo, spacing, K, *refs):
    pos_ref, feats_ref, idx_ref = refs[0], refs[1], refs[2]
    ws = [refs[3 + i] for i in range(nw)]
    bs = [refs[3 + nw + i] for i in range(nw)]
    out_ref = refs[3 + 2 * nw]
    agg, mlp_out, feats_rep, vals, geo, _, _ = _forward_tail(
        pos_ref[...], feats_ref[...], idx_ref[...], [w[...] for w in ws],
        [b[0] for b in bs], dims, lo, spacing, K, keep_hidden=False,
    )
    out_ref[...] = jnp.concatenate([vals, geo], axis=1)


def _bwd_kernel(nw, dims, lo, spacing, K, n_blocks, *refs):
    from jax.experimental import pallas as pl

    pos_ref, feats_ref, idx_ref, g_ref = refs[0], refs[1], refs[2], refs[3]
    ws = [refs[4 + i] for i in range(nw)]
    bs = [refs[4 + nw + i] for i in range(nw)]
    dfeats_ref = refs[4 + 2 * nw]
    dw_refs = [refs[5 + 2 * nw + i] for i in range(nw)]
    db_refs = [refs[5 + 3 * nw + i] for i in range(nw)]
    dw_scr = [refs[5 + 4 * nw + i] for i in range(nw)]
    db_scr = [refs[5 + 5 * nw + i] for i in range(nw)]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for s in dw_scr + db_scr:
            s[...] = jnp.zeros_like(s)

    wvals = [w[...] for w in ws]
    agg, mlp_out, feats_rep, _, _, zs, hs = _forward_tail(
        pos_ref[...], feats_ref[...], idx_ref[...], wvals,
        [b[0] for b in bs], dims, lo, spacing, K, keep_hidden=True,
    )
    bp = pos_ref.shape[0]
    C = feats_ref.shape[1]
    gv = g_ref[...][:, :C]  # payload channels beyond C are pure geometry
    # vals = mlp_out * feats_rep
    d = gv * feats_rep
    dfeats_e = gv * mlp_out
    dfeats_ref[...] = dfeats_e.reshape(bp, K, C).sum(axis=1)
    # MLP backward, last layer (no activation) first
    inputs = [agg] + hs  # input to layer i
    for li in range(nw - 1, -1, -1):
        x_in = inputs[li]
        dw_scr[li][...] += jax.lax.dot_general(
            x_in, d, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        db_scr[li][...] += d.sum(axis=0, keepdims=True)
        if li > 0:
            d = jax.lax.dot_general(
                d, wvals[li], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * _gelu_grad(zs[li - 1])

    @pl.when(i == n_blocks - 1)
    def _finish():
        for li in range(nw):
            dw_refs[li][...] = dw_scr[li][...]
            db_refs[li][...] = db_scr[li][...]


@functools.partial(
    jax.jit, static_argnames=("cfg",)
)
def _payload_fwd_call(pos, feats, lat_idx, ws, bs, cfg):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dims, lo, spacing, K, block, interpret = cfg
    n, _ = pos.shape
    C = feats.shape[1]
    nw = len(ws)
    nb = n // block
    P = C + 11
    kern = functools.partial(_fwd_kernel, nw, dims, lo, spacing, K)
    in_specs = [
        pl.BlockSpec((block, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    for b in bs:
        in_specs.append(pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block * K, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * K, P), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(pos, feats, lat_idx, *ws, *[b[None] for b in bs])
    return out


@functools.partial(jax.jit, static_argnames=("cfg",))
def _payload_bwd_call(pos, feats, lat_idx, g, ws, bs, cfg):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dims, lo, spacing, K, block, interpret = cfg
    n, _ = pos.shape
    C = feats.shape[1]
    nw = len(ws)
    nb = n // block
    P = C + 11
    kern = functools.partial(_bwd_kernel, nw, dims, lo, spacing, K, nb)
    in_specs = [
        pl.BlockSpec((block, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block * K, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    for b in bs:
        in_specs.append(pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM))
    out_specs = [pl.BlockSpec((block, C), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((n, C), jnp.float32)]
    for w in ws:
        out_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
    for b in bs:
        out_specs.append(pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, b.shape[0]), jnp.float32))
    scratch = [pltpu.VMEM(w.shape, jnp.float32) for w in ws]
    scratch += [pltpu.VMEM((1, b.shape[0]), jnp.float32) for b in bs]
    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(pos, feats, lat_idx, g, *ws, *[b[None] for b in bs])
    dfeats = outs[0]
    dws = tuple(outs[1 : 1 + nw])
    dbs = tuple(o[0] for o in outs[1 + nw :])
    return dfeats, dws, dbs


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_payload_p(cfg, pos, feats, lat_idx, ws, bs):
    return _payload_fwd_call(pos, feats, lat_idx, tuple(ws), tuple(bs), cfg)


def _fused_payload_fwd(cfg, pos, feats, lat_idx, ws, bs):
    out = _fused_payload_p(cfg, pos, feats, lat_idx, ws, bs)
    return out, (pos, feats, lat_idx, tuple(ws), tuple(bs))


def _fused_payload_bwd(cfg, res, g):
    pos, feats, lat_idx, ws, bs = res
    dfeats, dws, dbs = _payload_bwd_call(pos, feats, lat_idx, g, ws, bs, cfg)
    dpos = np.zeros(pos.shape, dtype=jax.dtypes.float0) if jnp.issubdtype(
        pos.dtype, jnp.integer) else jnp.zeros_like(pos)
    didx = np.zeros(lat_idx.shape, dtype=jax.dtypes.float0)
    return (dpos, dfeats.astype(feats.dtype), didx, dws, dbs)


_fused_payload_p.defvjp(_fused_payload_fwd, _fused_payload_bwd)


def encoder_payload(
    pos: jnp.ndarray,  # [n, 3] f32
    feats: jnp.ndarray,  # [n, C] f32 (lifted)
    lat_idx: jnp.ndarray,  # [n, K] int32 (invalid slots: any in-range id; the
    #                        downstream masked reduction drops those rows)
    ws: Sequence[jnp.ndarray],
    bs: Sequence[jnp.ndarray],
    grid_dims: Tuple[int, int, int],
    grid_lo: Tuple[float, float, float],
    grid_spacing: Tuple[float, float, float],
    block: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """[n*K, C+11] payload: [vals | 1 | d | y | yy^T sym]. See module doc."""
    n = pos.shape[0]
    assert n % block == 0, (n, block)
    cfg = (
        tuple(grid_dims),
        tuple(float(x) for x in grid_lo),
        tuple(float(x) for x in grid_spacing),
        int(lat_idx.shape[1]),
        int(block),
        bool(interpret),
    )
    return _fused_payload_p(
        cfg, pos.astype(jnp.float32), feats.astype(jnp.float32),
        lat_idx.astype(jnp.int32), tuple(ws), tuple(bs),
    )
