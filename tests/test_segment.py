import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaot3d_tpu.ops import segment_sum, segment_mean, segment_max, segment_softmax, segment_count


@pytest.fixture
def edges():
    rng = np.random.default_rng(0)
    E, S, C = 257, 19, 4
    data = rng.normal(size=(E, C)).astype(np.float32)
    seg = rng.integers(0, S, size=E).astype(np.int32)
    mask = rng.random(E) < 0.8
    return data, seg, mask, S


def _dense(data, seg, mask, S, reduce):
    out = np.zeros((S, data.shape[1]), dtype=np.float64)
    cnt = np.zeros(S)
    mx = np.full((S, data.shape[1]), -np.inf)
    for e in range(data.shape[0]):
        if not mask[e]:
            continue
        out[seg[e]] += data[e]
        cnt[seg[e]] += 1
        mx[seg[e]] = np.maximum(mx[seg[e]], data[e])
    if reduce == "sum":
        return out
    if reduce == "count":
        return cnt
    if reduce == "mean":
        return out / np.maximum(cnt, 1)[:, None]
    if reduce == "max":
        return np.where(np.isinf(mx), 0.0, mx)
    raise ValueError


def test_segment_sum_mean_max_count(edges):
    data, seg, mask, S = edges
    d, s, m = jnp.asarray(data), jnp.asarray(seg), jnp.asarray(mask)
    np.testing.assert_allclose(segment_sum(d, s, S, m), _dense(data, seg, mask, S, "sum"), rtol=1e-5)
    np.testing.assert_allclose(segment_mean(d, s, S, m), _dense(data, seg, mask, S, "mean"), rtol=1e-5)
    np.testing.assert_allclose(segment_max(d, s, S, m), _dense(data, seg, mask, S, "max"), rtol=1e-5)
    np.testing.assert_allclose(segment_count(s, S, m), _dense(data, seg, mask, S, "count"), rtol=1e-6)


def test_segment_ops_no_mask(edges):
    data, seg, _, S = edges
    full = np.ones(data.shape[0], dtype=bool)
    d, s = jnp.asarray(data), jnp.asarray(seg)
    np.testing.assert_allclose(segment_sum(d, s, S), _dense(data, seg, full, S, "sum"), rtol=1e-5)


def test_segment_softmax_matches_dense(edges):
    data, seg, mask, S = edges
    scores = data[:, 0]
    w = np.asarray(segment_softmax(jnp.asarray(scores), jnp.asarray(seg), S, jnp.asarray(mask)))
    # weights sum to 1 per non-empty segment, 0 on invalid edges
    assert np.all(w[~mask] == 0)
    sums = np.zeros(S)
    for e in range(len(scores)):
        if mask[e]:
            sums[seg[e]] += w[e]
    nonempty = np.unique(seg[mask])
    np.testing.assert_allclose(sums[nonempty], 1.0, rtol=1e-5)
    # matches explicit softmax within one segment
    s0 = nonempty[0]
    sel = (seg == s0) & mask
    expect = np.exp(scores[sel] - scores[sel].max())
    expect /= expect.sum()
    np.testing.assert_allclose(w[sel], expect, rtol=1e-5)


def test_segment_ops_jit_grad():
    S = 7
    data = jnp.arange(12, dtype=jnp.float32).reshape(12, 1)
    seg = jnp.asarray(np.arange(12) % S, dtype=jnp.int32)
    mask = jnp.ones(12, dtype=bool)

    def loss(x):
        return segment_mean(x, seg, S, mask).sum()

    g = jax.jit(jax.grad(loss))(data)
    # gradient of mean: 1/count per contributing edge
    counts = np.bincount(np.arange(12) % S, minlength=S)
    expect = (1.0 / counts[np.arange(12) % S])[:, None]
    np.testing.assert_allclose(g, expect, rtol=1e-6)


def test_fold_ops_match_scatter(edges):
    from gaot3d_tpu.ops.segment import fold_count, fold_max, fold_mean, fold_sum, make_segment_fold

    data, seg, mask, S = edges
    d, s, m = jnp.asarray(data), jnp.asarray(seg), jnp.asarray(mask)
    fold = make_segment_fold(s, S, m)
    np.testing.assert_allclose(fold_sum(fold, d), segment_sum(d, s, S, m), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(fold_mean(fold, d), segment_mean(d, s, S, m), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(fold_count(fold), segment_count(s, S, m), rtol=1e-6)
    np.testing.assert_allclose(
        fold_max(fold, d[:, 0]), segment_max(d[:, 0], s, S, m), rtol=1e-5
    )
    np.testing.assert_allclose(fold_max(fold, d), segment_max(d, s, S, m), rtol=1e-5)


def test_fold_sum_grad(edges):
    from gaot3d_tpu.ops.segment import fold_sum, make_segment_fold

    data, seg, mask, S = edges
    d, s, m = jnp.asarray(data), jnp.asarray(seg), jnp.asarray(mask)
    fold = make_segment_fold(s, S, m)

    def f_sort(x):
        return (fold_sum(fold, x) ** 2).sum()

    def f_scatter(x):
        return (segment_sum(x, s, S, m) ** 2).sum()

    g1 = jax.grad(f_sort)(d)
    g2 = jax.grad(f_scatter)(d)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


# --- tile segment-sum (Pallas MXU kernel, ops/pallas_kernels.py) ------------


def _tile_oracle(data, seg, mask, S):
    return np.asarray(segment_sum(jnp.asarray(data), jnp.asarray(seg), S, jnp.asarray(mask)))


@pytest.mark.parametrize("seg_tile,edge_block,max_blocks", [(8, 16, 8), (16, 32, 4)])
def test_tile_segment_sum_interpret(edges, seg_tile, edge_block, max_blocks):
    """Pallas tile kernel (interpret mode) == scatter oracle, with mask,
    S not a multiple of seg_tile, E not a multiple of edge_block."""
    from gaot3d_tpu.ops.pallas_kernels import tile_segment_sum
    from gaot3d_tpu.ops.segment import make_segment_fold

    data, seg, mask, S = edges
    d, s, m = jnp.asarray(data), jnp.asarray(seg), jnp.asarray(mask)
    ctx = make_segment_fold(s, S, m)
    sd = d[ctx.perm]
    got = tile_segment_sum(
        sd, ctx.sorted_seg, ctx.starts,
        seg_tile=seg_tile, edge_block=edge_block, max_blocks=max_blocks,
        interpret=True,
    )
    # the kernel's hi/lo bf16 MXU split carries ~2^-16 relative error
    np.testing.assert_allclose(np.asarray(got), _tile_oracle(data, seg, mask, S), rtol=1e-4, atol=1e-4)


def test_tile_segment_sum_overflow_fallback(edges):
    """A tile spanning more than max_blocks edge blocks trips the lax.cond
    cumsum-fold fallback — result stays exact (never silently wrong)."""
    from gaot3d_tpu.ops.pallas_kernels import tile_segment_sum
    from gaot3d_tpu.ops.segment import make_segment_fold

    rng = np.random.default_rng(1)
    E, S, C = 300, 10, 3
    data = rng.normal(size=(E, C)).astype(np.float32)
    seg = np.zeros(E, dtype=np.int32)  # everything lands in segment 0
    seg[200:] = rng.integers(0, S, size=100)
    mask = np.ones(E, dtype=bool)
    ctx = make_segment_fold(jnp.asarray(seg), S, jnp.asarray(mask))
    sd = jnp.asarray(data)[ctx.perm]
    got = tile_segment_sum(
        sd, ctx.sorted_seg, ctx.starts,
        seg_tile=4, edge_block=8, max_blocks=2, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), _tile_oracle(data, seg, mask, S), rtol=1e-5, atol=1e-5)


def test_fold_sum_tile_matches_and_grads(edges):
    """fold_sum_tile == fold_sum (forward) and gradients match the scatter
    path. On CPU this exercises the non-TPU degradation (cumsum fold)."""
    from gaot3d_tpu.ops.segment import fold_sum, fold_sum_tile, make_segment_fold

    data, seg, mask, S = edges
    d, s, m = jnp.asarray(data), jnp.asarray(seg), jnp.asarray(mask)
    ctx = make_segment_fold(s, S, m)
    np.testing.assert_allclose(
        np.asarray(fold_sum_tile(ctx, d)), np.asarray(fold_sum(ctx, d)), rtol=1e-5, atol=1e-6
    )

    def f_tile(x):
        return (fold_sum_tile(ctx, x) ** 2).sum()

    def f_scatter(x):
        return (segment_sum(x, s, S, m) ** 2).sum()

    g1 = jax.jit(jax.grad(f_tile))(d)
    g2 = jax.grad(f_scatter)(d)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_fold_sum_tile_lite_matches(edges):
    """Lite tile fold (tile boundaries only, no [S+1] starts) == scatter,
    forward and gradient."""
    from gaot3d_tpu.ops.segment import fold_sum_tile_lite, make_tile_fold

    data, seg, mask, S = edges
    d, s, m = jnp.asarray(data), jnp.asarray(seg), jnp.asarray(mask)
    tf = make_tile_fold(s, S, m, seg_tile=8)
    got = fold_sum_tile_lite(tf, d, S, seg_tile=8)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(segment_sum(d, s, S, m)), rtol=1e-5, atol=1e-5
    )
    g1 = jax.jit(jax.grad(lambda x: (fold_sum_tile_lite(tf, x, S, seg_tile=8) ** 2).sum()))(d)
    g2 = jax.grad(lambda x: (segment_sum(x, s, S, m) ** 2).sum())(d)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)
