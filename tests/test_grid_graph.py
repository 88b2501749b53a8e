import jax.numpy as jnp
import numpy as np
import pytest

from gaot3d_tpu.ops import LatentGrid, build_edge_slots, brute_force_edges
from gaot3d_tpu.ops.grid_graph import build_edge_slots_batched


def slots_to_edge_set(slots, point_mask=None):
    lat = np.asarray(slots.lat_idx)
    mask = np.asarray(slots.mask)
    edges = set()
    for i in range(lat.shape[0]):
        if point_mask is not None and not point_mask[i]:
            continue
        for k in range(lat.shape[1]):
            if mask[i, k]:
                edges.add((i, int(lat[i, k])))
    return edges


@pytest.fixture
def cloud():
    rng = np.random.default_rng(7)
    pts = rng.uniform(-1.1, 1.1, size=(300, 3)).astype(np.float32)
    return pts


@pytest.mark.parametrize("strategy", ["knn", "radius", "bidirectional", "reverse"])
@pytest.mark.parametrize("dims", [(8, 8, 8), (8, 6, 4)])
def test_matches_brute_force(cloud, strategy, dims):
    grid = LatentGrid(dims=dims)
    radius = 0.35
    slots = build_edge_slots(jnp.asarray(cloud), grid, radius, k_neighbors=1, strategy=strategy)
    got = slots_to_edge_set(slots)
    want = brute_force_edges(cloud, np.asarray(grid.positions()), radius, 1, strategy)
    assert got == want


@pytest.mark.parametrize("k", [1, 2, 4, 8])
def test_knn_k_matches_brute_force(cloud, k):
    grid = LatentGrid(dims=(8, 8, 8))
    slots = build_edge_slots(jnp.asarray(cloud), grid, 0.2, k_neighbors=k, strategy="knn")
    got = slots_to_edge_set(slots)
    want = brute_force_edges(cloud, np.asarray(grid.positions()), 0.2, k, "knn")
    assert got == want


def test_anisotropic_domain_matches_brute_force(cloud):
    # grid over a non-cubical rescaled domain, like the drivaernet trainer grid
    grid = LatentGrid.from_domain((10, 8, 6), [-1.16, -1.2, 0.0], [4.21, 1.19, 1.77], rescale_to=(-1, 1))
    assert min(grid.lo) == pytest.approx(-1.0)
    assert max(grid.hi) == pytest.approx(1.0)
    radius = 0.4
    slots = build_edge_slots(jnp.asarray(cloud), grid, radius, strategy="bidirectional")
    got = slots_to_edge_set(slots)
    want = brute_force_edges(cloud, np.asarray(grid.positions()), radius, 1, "bidirectional")
    assert got == want


def test_point_mask_blocks_edges(cloud):
    grid = LatentGrid(dims=(6, 6, 6))
    pm = np.zeros(cloud.shape[0], dtype=bool)
    pm[:10] = True
    slots = build_edge_slots(jnp.asarray(cloud), grid, 0.4, strategy="radius", point_mask=jnp.asarray(pm))
    mask = np.asarray(slots.mask)
    assert not mask[10:].any()
    assert mask[:10].any()


def test_batched_builder_consistent(cloud):
    grid = LatentGrid(dims=(6, 6, 6))
    pts = np.stack([cloud, cloud[::-1]], axis=0)
    slots = build_edge_slots_batched(jnp.asarray(pts), grid, 0.3, strategy="bidirectional")
    single = build_edge_slots(jnp.asarray(pts[1]), grid, 0.3, strategy="bidirectional")
    np.testing.assert_array_equal(np.asarray(slots.lat_idx[1]), np.asarray(single.lat_idx))
    np.testing.assert_array_equal(np.asarray(slots.mask[1]), np.asarray(single.mask))


def test_points_outside_grid_knn_still_valid():
    grid = LatentGrid(dims=(5, 5, 5))
    pts = np.array([[2.5, 2.5, 2.5], [-3.0, 0.0, 0.0]], dtype=np.float32)
    slots = build_edge_slots(jnp.asarray(pts), grid, 0.1, k_neighbors=1, strategy="knn")
    got = slots_to_edge_set(slots)
    want = brute_force_edges(pts, np.asarray(grid.positions()), 0.1, 1, "knn")
    assert got == want


def test_compact_slots_exact():
    from gaot3d_tpu.ops.grid_graph import compact_slots, max_slot_degree

    rng = np.random.default_rng(9)
    pts = rng.uniform(-1, 1, size=(300, 3)).astype(np.float32)
    grid = LatentGrid(dims=(8, 8, 8))
    slots = build_edge_slots(jnp.asarray(pts), grid, 0.3, strategy="bidirectional")
    deg = max_slot_degree(slots)
    assert deg < slots.num_slots  # conservative window confirmed
    compacted = compact_slots(slots, budget=deg)
    assert compacted.num_slots == deg
    # identical edge sets
    assert slots_to_edge_set(compacted) == slots_to_edge_set(slots)
    # truncating below the max degree drops edges (documented hazard)
    lossy = compact_slots(slots, budget=max(1, deg - 1))
    assert len(slots_to_edge_set(lossy)) < len(slots_to_edge_set(slots))


def test_base_cell_monotone_slots():
    """Sorting points by the stencil base cell makes every per-slot destination
    stream monotone — the structural property behind the planned sort-free
    segment folds (lat_idx[n, k] = base(n) + offset(k))."""
    from gaot3d_tpu.ops.grid_graph import stencil_base_cell

    rng = np.random.default_rng(13)
    pts = rng.uniform(-1.2, 1.2, size=(500, 3)).astype(np.float32)
    grid = LatentGrid(dims=(8, 6, 4))
    base = np.asarray(stencil_base_cell(jnp.asarray(pts), grid, 0.35, 1, "bidirectional"))
    order = np.argsort(base, kind="stable")
    slots = build_edge_slots(jnp.asarray(pts[order]), grid, 0.35, strategy="bidirectional")
    lat = np.asarray(slots.lat_idx)
    for k in range(lat.shape[1]):
        assert np.all(np.diff(lat[:, k]) >= 0), f"slot {k} not monotone"


def test_native_host_builder_matches_numpy():
    """native/gaot_graph.cpp == build_edge_slots_np as an edge set, all
    strategies; budget packing == compact_slots_np; numpy fallback exercised
    implicitly when no toolchain."""
    from gaot3d_tpu.ops.grid_graph import (
        LatentGrid,
        build_edge_slots_host,
        build_edge_slots_np,
        compact_slots_np,
    )

    rng = np.random.default_rng(5)
    grid = LatentGrid(dims=(9, 7, 5), lo=(-1, -0.5, 0.0), hi=(1.0, 0.5, 0.25))
    pts = rng.uniform(-1.1, 1.1, (777, 3)).astype(np.float32)
    for strat in ("radius", "knn", "bidirectional", "reverse"):
        lat_n, msk_n = build_edge_slots_np(pts, grid, 0.3, 2, strat)
        lat_c, msk_c = build_edge_slots_host(pts, grid, 0.3, 2, strat)
        en = {(i, int(lat_n[i, j])) for i, j in zip(*np.nonzero(msk_n))}
        ec = {(i, int(lat_c[i, j])) for i, j in zip(*np.nonzero(msk_c))}
        assert en == ec, strat
    lat_c, msk_c = build_edge_slots_host(pts, grid, 0.3, 1, "radius", budget=6)
    lat_n, msk_n = build_edge_slots_np(pts, grid, 0.3, 1, "radius")
    ln, mn = compact_slots_np(lat_n, msk_n, 6)
    np.testing.assert_array_equal(msk_c, mn)
    np.testing.assert_array_equal(lat_c[mn], ln[mn])
