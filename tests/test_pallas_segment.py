"""Sorted-segment-sum Pallas kernel vs a numpy f64 oracle (interpret mode).

The kernel contract: rows sorted by segment id, invalid rows pre-mapped to
seg == num_segments. Slab-spill rows (head/tail of the slab-aligned cover
belonging to neighbour tiles) must not double-count — exercised by using a
slab much smaller than the tile span and segment distributions that
straddle slab boundaries."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaot3d_tpu.ops.pallas_segment import (
    segment_sum_sorted_pallas,
    sort_by_segment,
)


def oracle(payload, seg, M):
    out = np.zeros((M, payload.shape[1]), np.float64)
    for r, s in zip(np.asarray(payload, np.float64), np.asarray(seg)):
        if s < M:
            out[s] += r
    return out


@pytest.mark.parametrize("E,P,M,mt,slab", [
    (1000, 16, 256, 64, 128),     # many tiles, small slabs
    (300, 8, 128, 128, 128),      # single-slab tiles, E pads up
    (2048, 40, 512, 256, 256),    # non-128 P (P=40 like the payload)
])
def test_matches_oracle(E, P, M, mt, slab):
    rng = np.random.default_rng(0)
    payload = rng.normal(size=(E, P)).astype(np.float32)
    seg = np.sort(rng.integers(0, M, size=E)).astype(np.int32)
    out = segment_sum_sorted_pallas(
        jnp.asarray(payload), jnp.asarray(seg), M, mt=mt, slab=slab,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), oracle(payload, seg, M),
                               rtol=1e-5, atol=1e-5)


def test_empty_and_dense_tiles():
    """Tiles with zero edges and one tile holding most edges (the skew a
    clustered surface produces)."""
    rng = np.random.default_rng(1)
    E, P, M = 4096, 12, 512
    seg = np.concatenate([
        np.full(3000, 77),                      # hot cell
        np.sort(rng.integers(400, 512, 1096)),  # last quarter only
    ]).astype(np.int32)
    seg = np.sort(seg)
    payload = rng.normal(size=(E, P)).astype(np.float32)
    out = segment_sum_sorted_pallas(
        jnp.asarray(payload), jnp.asarray(seg), M, mt=128, slab=256,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), oracle(payload, seg, M),
                               rtol=1e-5, atol=1e-4)


def test_masked_via_sort_helper():
    rng = np.random.default_rng(2)
    E, P, M = 1500, 24, 256
    payload = rng.normal(size=(E, P)).astype(np.float32)
    seg = rng.integers(0, M, size=E).astype(np.int32)
    mask = rng.uniform(size=E) < 0.5
    ps, ss = sort_by_segment(jnp.asarray(payload), jnp.asarray(seg),
                             jnp.asarray(mask), M)
    out = segment_sum_sorted_pallas(ps, ss, M, mt=64, slab=128,
                                    interpret=True)
    ref = oracle(payload[mask], seg[mask], M)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
