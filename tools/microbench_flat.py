"""Slotted [N,K] vs flat-compacted edge-chunk passes, on the real chip.

The [N,K]=budget-5 stencil windows are ~48% valid (mean degree 2.4): masked
slots still cost scatter/gather rows (XLA processes sentinel-destination rows)
and kernel-MLP flops. A flat per-chunk edge list compacts those away at the
price of a src-row gather (encoder) / a segment-reduce instead of a free
K-axis sum (decoder). This measures both trade-offs fwd and fwd+bwd with
lax.fori_loop-amortized timing (27ms per-dispatch tunnel latency).

Run: python tools/microbench_flat.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from gaot3d_tpu.ops import LatentGrid
from gaot3d_tpu.ops.grid_graph import build_edge_slots_host
from gaot3d_tpu.ops.segment import segment_sum

N = 65536
K = 5
DIMS = (64, 64, 32)
M = DIMS[0] * DIMS[1] * DIMS[2]
C = 32
RADIUS = 0.033
REPS = 30

rng = np.random.default_rng(0)
pos_np = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
grid = LatentGrid(dims=DIMS)
lat_idx_np, mask_np = build_edge_slots_host(
    pos_np, grid, RADIUS, k_neighbors=1, strategy="bidirectional", budget=K
)
valid = int(mask_np.sum())
E = ((int(valid * 1.02) + 4095) // 4096) * 4096
print(f"valid edges {valid} / {N * K} slots ({100 * valid / (N * K):.1f}%), flat E={E}")

# flat list sorted by src (the natural compaction order of [N, K])
src_all, slot_all = np.nonzero(mask_np)
dst_all = lat_idx_np[src_all, slot_all]
pad = E - valid
src_f = np.concatenate([src_all, np.zeros(pad, np.int64)]).astype(np.int32)
dst_f = np.concatenate([dst_all, np.zeros(pad, np.int64)]).astype(np.int32)
msk_f = np.concatenate([np.ones(valid, bool), np.zeros(pad, bool)])

spacing = jnp.asarray(2.0 / np.asarray(DIMS), jnp.float32)
lo = jnp.asarray([-1.0, -1.0, -1.0], jnp.float32)


def centers(idx):
    i = idx // (DIMS[1] * DIMS[2])
    j = (idx // DIMS[2]) % DIMS[1]
    k = idx % DIMS[2]
    ijk = jnp.stack([i, j, k], axis=-1).astype(jnp.float32)
    return lo + (ijk + 0.5) * spacing


def mlp(x, ws, bs):
    h = x
    for w, b in zip(ws[:-1], bs[:-1]):
        h = jax.nn.gelu(jnp.dot(h.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32) + b)
    return jnp.dot(h.astype(jnp.bfloat16), ws[-1].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32) + bs[-1]


def payload_from(p, latp, f, ws, bs):
    """[E?,3] pos, [E?,3] centers, [E?,C] feats -> [E?, C+11] payload."""
    y = p - latp
    dist = jnp.sqrt(jnp.sum(y * y, axis=-1, keepdims=True))
    vals = mlp(jnp.concatenate([p, latp], -1), ws, bs) * f
    yy = jnp.stack(
        [y[..., 0] * y[..., 0], y[..., 0] * y[..., 1], y[..., 0] * y[..., 2],
         y[..., 1] * y[..., 1], y[..., 1] * y[..., 2], y[..., 2] * y[..., 2]],
        axis=-1,
    )
    ones = jnp.ones_like(dist)
    return jnp.concatenate([vals, ones, dist, y, yy], -1)


def enc_slotted(feats, pos, lat_idx, mask, ws, bs):
    latp = centers(lat_idx)  # [N,K,3]
    p = jnp.broadcast_to(pos[:, None, :], (N, K, 3))
    f = jnp.broadcast_to(feats[:, None, :], (N, K, C))
    pay = payload_from(p.reshape(-1, 3), latp.reshape(-1, 3), f.reshape(-1, C), ws, bs)
    return segment_sum(pay, lat_idx.reshape(-1), M, mask.reshape(-1))


def enc_flat(feats, pos, src, dst, emask, ws, bs):
    p = jnp.take(pos, src, axis=0)
    f = jnp.take(feats, src, axis=0)
    pay = payload_from(p, centers(dst), f, ws, bs)
    return segment_sum(pay, dst, M, emask)


def dec_slotted(table, pos, lat_idx, mask, ws, bs):
    rows = jnp.take(table, lat_idx.reshape(-1), axis=0).reshape(N, K, C)
    latp = centers(lat_idx)
    p = jnp.broadcast_to(pos[:, None, :], (N, K, 3))
    vals = mlp(jnp.concatenate([p, latp], -1).reshape(-1, 6), ws, bs).reshape(N, K, C)
    out = jnp.where(mask[..., None], vals * rows, 0.0).sum(axis=1)
    cnt = jnp.maximum(mask.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0)
    return out / cnt


def dec_flat(table, pos, src, dst, emask, ws, bs):
    rows = jnp.take(table, dst, axis=0)  # [E,C] latent gather
    p = jnp.take(pos, src, axis=0)
    vals = mlp(jnp.concatenate([p, centers(dst)], -1), ws, bs)
    contrib = jnp.where(emask[:, None], vals * rows, 0.0)
    out = segment_sum(contrib, src, N, emask)
    cnt = jnp.maximum(
        segment_sum(jnp.ones((E, 1), jnp.float32), src, N, emask), 1.0)
    return out / cnt


def timed(fn, *args, wsidx, label=""):
    """fori_loop-amortized fwd and fwd+bwd times (per-iteration seconds).
    args[0] is perturbed per iteration so XLA can't hoist the loop body."""

    def loop_fwd(args):
        def body(i, acc):
            out = fn(args[0] * (1 + 1e-9 * i), *args[1:])
            return acc + jnp.sum(out[..., :1])

        return jax.lax.fori_loop(0, REPS, body, 0.0)

    def loss(*a):
        return jnp.sum(fn(*a) ** 2) * 1e-6

    grad_fn = jax.grad(loss, argnums=(0, wsidx))  # first tensor + ws

    def loop_bwd(args):
        def body(i, acc):
            a0 = args[0] * (1 + 1e-9 * i)
            g0, gws = grad_fn(a0, *args[1:])
            return acc + jnp.sum(g0[..., :1]) + jnp.sum(gws[0][..., :1])

        return jax.lax.fori_loop(0, REPS, body, 0.0)

    jf = jax.jit(loop_fwd)
    jb = jax.jit(loop_bwd)
    float(jf(args))  # compile+warm
    t0 = time.perf_counter()
    float(jf(args))
    tf = (time.perf_counter() - t0) / REPS
    float(jb(args))
    t0 = time.perf_counter()
    float(jb(args))
    tb = (time.perf_counter() - t0) / REPS
    print(f"{label:14s} fwd {tf * 1e3:8.2f} ms   fwd+bwd {tb * 1e3:8.2f} ms")
    return tf, tb


ws = tuple(jnp.asarray(rng.normal(size=s, scale=0.2), jnp.float32)
           for s in [(6, 64), (64, 64), (64, C)])
bs = tuple(jnp.zeros((s,), jnp.float32) for s in (64, 64, C))
feats = jnp.asarray(rng.normal(size=(N, C)), jnp.float32)
pos = jnp.asarray(pos_np)
lat_idx = jnp.asarray(lat_idx_np)
mask = jnp.asarray(mask_np)
src = jnp.asarray(src_f)
dst = jnp.asarray(dst_f)
emask = jnp.asarray(msk_f)
table = jnp.asarray(rng.normal(size=(M, C)), jnp.float32)

print(f"platform: {jax.devices()[0].platform}")
es = timed(enc_slotted, feats, pos, lat_idx, mask, ws, bs, wsidx=4, label="enc slotted")
ef = timed(enc_flat, feats, pos, src, dst, emask, ws, bs, wsidx=5, label="enc flat")
ds = timed(dec_slotted, table, pos, lat_idx, mask, ws, bs, wsidx=4, label="dec slotted")
df = timed(dec_flat, table, pos, src, dst, emask, ws, bs, wsidx=5, label="dec flat")
print(f"encoder flat/slotted: fwd {ef[0] / es[0]:.2f}x  bwd {ef[1] / es[1]:.2f}x")
print(f"decoder flat/slotted: fwd {df[0] / ds[0]:.2f}x  bwd {df[1] / ds[1]:.2f}x")
