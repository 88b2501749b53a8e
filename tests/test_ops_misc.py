import jax
import jax.numpy as jnp
import numpy as np

from gaot3d_tpu.ops import LatentGrid, build_edge_slots, eigvalsh3x3_desc, apply_rope
from gaot3d_tpu.ops.sampling import cap_per_query_gather, cap_per_query_scatter, dropout_edges


def test_eigvalsh3x3_matches_numpy():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(64, 3, 3)).astype(np.float32)
    sym = a + np.swapaxes(a, -1, -2)
    got = np.asarray(eigvalsh3x3_desc(jnp.asarray(sym)))
    want = np.linalg.eigvalsh(sym.astype(np.float64))[..., ::-1]
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_eigvalsh3x3_isotropic_and_degenerate():
    eye = np.eye(3, dtype=np.float32)[None] * 2.5
    got = np.asarray(eigvalsh3x3_desc(jnp.asarray(eye)))
    np.testing.assert_allclose(got, 2.5, rtol=1e-6)
    zero = np.zeros((1, 3, 3), dtype=np.float32)
    np.testing.assert_allclose(np.asarray(eigvalsh3x3_desc(jnp.asarray(zero))), 0.0)


def test_rope_preserves_norm_and_rotates():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 16, 32)).astype(np.float32)  # [B, H, S, D]
    out = np.asarray(apply_rope(jnp.asarray(x)))
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-5
    )
    # position 0 is unrotated
    np.testing.assert_allclose(out[..., 0, :], x[..., 0, :], rtol=1e-6)
    # relative property: <rope(q)_i, rope(k)_j> depends only on i-j
    q = rng.normal(size=(1, 1, 8, 16)).astype(np.float32)
    k = rng.normal(size=(1, 1, 8, 16)).astype(np.float32)
    rq = np.asarray(apply_rope(jnp.asarray(q)))
    rk = np.asarray(apply_rope(jnp.asarray(k)))
    d1 = float(np.dot(rq[0, 0, 2], rk[0, 0, 5]))
    q2 = np.roll(q, 1, axis=2)
    k2 = np.roll(k, 1, axis=2)
    rq2 = np.asarray(apply_rope(jnp.asarray(q2)))
    rk2 = np.asarray(apply_rope(jnp.asarray(k2)))
    d2 = float(np.dot(rq2[0, 0, 3], rk2[0, 0, 6]))
    np.testing.assert_allclose(d1, d2, rtol=1e-4)


def _demo_slots():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
    grid = LatentGrid(dims=(4, 4, 4))
    return build_edge_slots(jnp.asarray(pts), grid, 0.6, strategy="radius"), grid


def test_cap_per_query_gather():
    slots, _ = _demo_slots()
    capped = cap_per_query_gather(slots, cap=3)
    per_row = np.asarray(capped.mask).sum(axis=1)
    assert per_row.max() <= 3
    # capped mask is a subset
    assert np.all(~np.asarray(capped.mask) | np.asarray(slots.mask))


def test_cap_per_query_scatter():
    slots, grid = _demo_slots()
    capped = cap_per_query_scatter(slots, cap=5)
    lat = np.asarray(slots.lat_idx).reshape(-1)
    m = np.asarray(capped.mask).reshape(-1)
    counts = np.bincount(lat[m], minlength=grid.num_tokens)
    assert counts.max() <= 5
    assert np.all(~np.asarray(capped.mask) | np.asarray(slots.mask))
    # deterministic cap keeps first edges in slot order
    m0 = np.asarray(slots.mask).reshape(-1)
    for seg in np.unique(lat[m0]):
        idx = np.nonzero(m0 & (lat == seg))[0]
        kept = np.nonzero(m & (lat == seg))[0]
        np.testing.assert_array_equal(kept, idx[:5])


def test_cap_scatter_random_respects_cap():
    slots, grid = _demo_slots()
    capped = cap_per_query_scatter(slots, cap=4, rng=jax.random.key(0))
    lat = np.asarray(slots.lat_idx).reshape(-1)
    m = np.asarray(capped.mask).reshape(-1)
    counts = np.bincount(lat[m], minlength=grid.num_tokens)
    assert counts.max() <= 4


def test_dropout_edges_rate():
    slots, _ = _demo_slots()
    dropped = dropout_edges(slots, rate=0.5, rng=jax.random.key(2))
    n0 = int(np.asarray(slots.mask).sum())
    n1 = int(np.asarray(dropped.mask).sum())
    assert 0.3 * n0 < n1 < 0.7 * n0
    assert np.all(~np.asarray(dropped.mask) | np.asarray(slots.mask))


def test_pallas_prefix_sum_interpret():
    from gaot3d_tpu.ops.pallas_kernels import prefix_sum

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(10_000, 38)), jnp.float32)
    got = prefix_sum(x, block_rows=1024, interpret=True)
    want = jnp.cumsum(x, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-3)


def test_cap_per_query_scatter_sentinel_no_collision():
    """Regression: with FEW edges against a LARGE latent grid (E < M), the
    invalid-edge sentinel used to be E — colliding with real latent token id
    E, whose edges were then spuriously capped. A query with <= cap neighbors
    must keep ALL of them regardless of its token id."""
    import numpy as np

    from gaot3d_tpu.ops.grid_graph import EdgeSlots

    E_tokens = 8  # edges per point
    N = 4
    E = N * E_tokens  # 32 edges total; token ids range far above E
    lat_idx = np.zeros((N, E_tokens), np.int32)
    mask = np.zeros((N, E_tokens), bool)
    # token id EXACTLY E (=32): 2 valid edges, plus many invalid slots that
    # share the old sentinel key
    lat_idx[0, 0] = E
    lat_idx[1, 0] = E
    mask[0, 0] = True
    mask[1, 0] = True
    # another token with 3 edges to keep the sort non-trivial
    lat_idx[2, :3] = 1000
    mask[2, :3] = True
    slots = EdgeSlots(jnp.asarray(lat_idx), jnp.asarray(mask))
    capped = cap_per_query_scatter(slots, cap=2, num_segments=131072)
    got = np.asarray(capped.mask)
    assert got[0, 0] and got[1, 0], "edges of token id == E were dropped"
    assert got[2, :3].sum() == 2  # the cap itself still applies
    # the max(seg)+1 fallback (no num_segments) must also be collision-free
    capped2 = cap_per_query_scatter(slots, cap=2)
    got2 = np.asarray(capped2.mask)
    assert got2[0, 0] and got2[1, 0]


def test_effective_chunk_non_power_divisor():
    """Regression: a chunk whose halvings never divide N used to fall back to
    FULL N (the transient-HBM blowup chunking exists to prevent); now the
    largest divisor of N <= chunk is chosen."""
    from gaot3d_tpu.models.integral_transform import effective_chunk

    assert effective_chunk(1 << 19, 48000) == 1 << 15  # largest 2^k <= 48000
    assert effective_chunk(1 << 19, 65536) == 65536  # exact divisor unchanged
    assert effective_chunk(100, 7) == 5
    assert effective_chunk(97, 13) == 1  # prime N: only the trivial divisor
    assert effective_chunk(64, None) == 64
