"""Flat-compacted edge layout (FlatEdgeChunks) vs the canonical [N, K] slots.

The flat layout packs each node chunk's valid (node, slot) pairs into static
per-chunk edge lists (ops/grid_graph.py flatten_slots_host), dropping the
~52% masked slots that still cost scatter/gather rows and kernel-MLP flops in
the slotted layout (measured on-chip: tools/microbench_flat.py). These tests
pin the layout's semantics to the slotted path: identical model outputs and
gradients on the same edges.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import chex

from gaot3d_tpu.models import (
    AttentionConfig,
    FFNConfig,
    MAGNOConfig,
    TransformerConfig,
    init_model,
)
from gaot3d_tpu.ops import (
    LatentGrid,
    build_edge_slots_batched,
    flatten_slots_host,
    flatten_slots_host_batched,
    fold_sum_sorted,
    make_segment_fold_presorted,
)


def test_flatten_slots_roundtrip():
    """Every valid (node, slot) pair appears exactly once as a flat edge with
    a local src index and the right dst; padding is masked off and packed
    at the tail (sorted-src invariant)."""
    rng = np.random.default_rng(7)
    N, K, chunk = 64, 5, 16
    lat_idx = rng.integers(0, 100, (N, K)).astype(np.int32)
    mask = rng.random((N, K)) < 0.5
    src, dst, msk = flatten_slots_host(lat_idx, mask, chunk, pad_multiple=8)
    nc = N // chunk
    assert src.shape == dst.shape == msk.shape == (nc, src.shape[1])
    for c in range(nc):
        want = {
            (n, lat_idx[c * chunk + n, k])
            for n in range(chunk)
            for k in range(K)
            if mask[c * chunk + n, k]
        }
        got = [(int(s), int(d)) for s, d, m in zip(src[c], dst[c], msk[c]) if m]
        assert len(got) == len(want)
        assert set(got) == want
        # sorted by src with padding at the tail
        srcs = [s for s, _ in got]
        assert srcs == sorted(srcs)
        assert not msk[c, len(got):].any()


@pytest.mark.parametrize("order", ["src", "dst"])
def test_flatten_slots_native_matches_numpy(order, monkeypatch):
    """The threaded C++ flatten (native/gaot_graph.cpp gaot_flatten_slots)
    must produce bit-identical output to the numpy twin, both orders."""
    from gaot3d_tpu.ops import grid_graph as gg

    if gg._load_graph_library() is None:
        pytest.skip("native graph library unavailable")
    rng = np.random.default_rng(17)
    N, K, chunk = 256, 5, 32
    lat_idx = rng.integers(0, 500, (N, K)).astype(np.int32)
    mask = rng.random((N, K)) < 0.5
    nat = flatten_slots_host(lat_idx, mask, chunk, pad_multiple=8, order=order)
    monkeypatch.setattr(gg, "_GRAPH_LIB", None)
    monkeypatch.setattr(gg, "_GRAPH_LIB_TRIED", True)
    ref = flatten_slots_host(lat_idx, mask, chunk, pad_multiple=8, order=order)
    for a, b in zip(nat, ref):
        np.testing.assert_array_equal(a, b)


def test_flatten_slots_overflow_guard():
    lat_idx = np.zeros((8, 4), np.int32)
    mask = np.ones((8, 4), bool)
    # hard ValueError (not assert): survives python -O, and the native path
    # would otherwise truncate writes silently
    with pytest.raises(ValueError, match="edges would be dropped"):
        flatten_slots_host(lat_idx, mask, 4, edges_per_chunk=8)


def test_fold_sum_sorted_matches_segment_sum():
    """Presorted fold (no argsort, no permutation gather) == segment_sum on
    sorted-by-destination edges with tail padding, values and gradients."""
    from gaot3d_tpu.ops import segment_sum

    rng = np.random.default_rng(11)
    E, S, C = 300, 40, 7
    seg = np.sort(rng.integers(0, S, E)).astype(np.int32)
    msk = np.ones(E, bool)
    msk[270:] = False  # tail padding
    data = jnp.asarray(rng.normal(size=(E, C)), jnp.float32)
    segj, mskj = jnp.asarray(seg), jnp.asarray(msk)

    def flat(d):
        ctx = make_segment_fold_presorted(segj, S, mskj)
        return fold_sum_sorted(ctx, d)

    def ref(d):
        return segment_sum(d, segj, S, mskj)

    np.testing.assert_allclose(np.asarray(flat(data)), np.asarray(ref(data)), atol=1e-5)
    ct = jnp.asarray(rng.normal(size=(S, C)), jnp.float32)
    g_flat = jax.grad(lambda d: jnp.sum(flat(d) * ct))(data)
    g_ref = jax.grad(lambda d: jnp.sum(ref(d) * ct))(data)
    np.testing.assert_allclose(np.asarray(g_flat), np.asarray(g_ref), atol=1e-5)
    # per-segment counts come free from the fold boundaries
    ctx = make_segment_fold_presorted(segj, S, mskj)
    cnt = np.asarray(ctx.starts[1:] - ctx.starts[:-1])
    want_cnt = np.bincount(seg[msk], minlength=S)
    np.testing.assert_array_equal(cnt, want_cnt)


def _flagship_model(**magno_kw):
    """Tiny twin of the flagship recipe paths: fused encoder (GNO +
    statistical geoembed) and fused decode head (GNO only)."""
    kw = dict(
        lifting_channels=8,
        use_geoembed=[True, False],
        gno_radius=0.45,
        neighbor_strategy="bidirectional",
        in_gno_channel_mlp_hidden_layers=[16, 16],
        out_gno_channel_mlp_hidden_layers=[16],
        projection_channels=16,
        fused_encoder=True,
        fused_head=True,
        edge_chunk_size=16,
    )
    kw.update(magno_kw)
    magno = MAGNOConfig(**kw)
    attn = TransformerConfig(
        patch_size=2, hidden_size=32, num_layers=2, positional_embedding="absolute",
        attn_config=AttentionConfig(hidden_size=32, num_heads=4, num_kv_heads=2,
                                    atten_dropout=0.0),
        ffn_config=FFNConfig(hidden_size=64),
    )
    return init_model(2, 1, "gaot_3d", magno, attn, latent_tokens=(4, 4, 4))


def test_flatten_slots_dst_order():
    """order='dst': each chunk's valid prefix is sorted by latent cell, same
    edge set, padding still at the tail."""
    rng = np.random.default_rng(13)
    N, K, chunk = 64, 5, 16
    lat_idx = rng.integers(0, 100, (N, K)).astype(np.int32)
    mask = rng.random((N, K)) < 0.5
    s_src, s_dst, s_msk = flatten_slots_host(lat_idx, mask, chunk, pad_multiple=8)
    d_src, d_dst, d_msk = flatten_slots_host(lat_idx, mask, chunk, pad_multiple=8,
                                             order="dst")
    nc = N // chunk
    for c in range(nc):
        want = sorted(
            (int(d), int(s)) for s, d, m in zip(s_src[c], s_dst[c], s_msk[c]) if m
        )
        got = [(int(d), int(s)) for s, d, m in zip(d_src[c], d_dst[c], d_msk[c]) if m]
        assert sorted(got) == want
        dsts = [d for d, _ in got]
        assert dsts == sorted(dsts)  # valid prefix sorted by dst
        assert not d_msk[c, len(got):].any()


@pytest.mark.parametrize("transform_type,flat_order",
                         [("linear", "src"), ("nonlinear", "src"), ("linear", "dst")])
def test_flat_full_model_matches_slotted(transform_type, flat_order):
    """Full model (fused encoder + fused decode head) with FlatEdgeChunks ==
    the same model with EdgeSlots on the same edges: outputs and grads.
    flat_order='dst' additionally swaps the encoder scatter for the presorted
    cumsum fold."""
    model = _flagship_model(
        in_gno_transform_type=transform_type,
        out_gno_transform_type=transform_type,
        flat_order=flat_order,
    )
    rng = np.random.default_rng(23)
    B, N, chunk = 2, 64, 16
    pos = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(B, N, 2)), jnp.float32)
    target = jnp.asarray(rng.normal(size=(B, N, 1)), jnp.float32)
    mask = jnp.ones((B, N), bool)

    grid = LatentGrid(dims=(4, 4, 4))
    slots = build_edge_slots_batched(pos, grid, 0.45, k_neighbors=1,
                                     strategy="bidirectional", point_mask=mask)
    flat_enc = flatten_slots_host_batched(
        np.asarray(slots.lat_idx), np.asarray(slots.mask), chunk, pad_multiple=8,
        order=flat_order,
    )
    flat_dec = flatten_slots_host_batched(
        np.asarray(slots.lat_idx), np.asarray(slots.mask), chunk, pad_multiple=8
    )
    assert flat_enc.src.shape[:2] == (B, N // chunk)

    params = model.init({"params": jax.random.key(0)}, pos, feats, mask,
                        encoder_slots=[slots], decoder_slots=[slots])

    def loss(p, enc, dec):
        pred = model.apply(p, pos, feats, mask, encoder_slots=enc, decoder_slots=dec)
        return jnp.sum((pred - target) ** 2), pred

    (l_s, out_s), g_s = jax.value_and_grad(loss, has_aux=True)(params, [slots], [slots])
    (l_f, out_f), g_f = jax.value_and_grad(loss, has_aux=True)(
        params, [flat_enc], [flat_dec]
    )
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s), atol=5e-5)
    np.testing.assert_allclose(float(l_f), float(l_s), rtol=1e-5)
    chex.assert_trees_all_close(g_f, g_s, atol=2e-4, rtol=2e-4)


def test_flat_multiscale_scale_weights_matches():
    """Flat layout through the multiscale fused head with learned scale
    weights: per-scale flat lists (different E per scale is allowed as long
    as chunking agrees) == slotted."""
    model = _flagship_model(scales=[1.0, 2.0], use_scale_weights=True)
    rng = np.random.default_rng(37)
    B, N, chunk = 1, 64, 16
    pos = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(B, N, 2)), jnp.float32)
    mask = jnp.ones((B, N), bool)
    grid = LatentGrid(dims=(4, 4, 4))
    slotted, flats = [], []
    for scale in (1.0, 2.0):
        s = build_edge_slots_batched(pos, grid, 0.45 * scale, k_neighbors=1,
                                     strategy="bidirectional", point_mask=mask)
        slotted.append(s)
        flats.append(flatten_slots_host_batched(
            np.asarray(s.lat_idx), np.asarray(s.mask), chunk, pad_multiple=8))
    params = model.init({"params": jax.random.key(5)}, pos, feats, mask,
                        encoder_slots=slotted, decoder_slots=slotted)
    out_s = model.apply(params, pos, feats, mask,
                        encoder_slots=slotted, decoder_slots=slotted)
    out_f = model.apply(params, pos, feats, mask,
                        encoder_slots=flats, decoder_slots=flats)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s), atol=5e-5)


def test_flat_decoder_plain_tail_matches():
    """Flat edges through the non-fused decoder tail (IntegralTransform
    __call__ flat branch) == slotted."""
    model = _flagship_model(fused_head=False)
    rng = np.random.default_rng(29)
    B, N, chunk = 1, 64, 16
    pos = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(B, N, 2)), jnp.float32)
    mask = jnp.ones((B, N), bool)
    grid = LatentGrid(dims=(4, 4, 4))
    slots = build_edge_slots_batched(pos, grid, 0.45, k_neighbors=1,
                                     strategy="bidirectional", point_mask=mask)
    flat = flatten_slots_host_batched(
        np.asarray(slots.lat_idx), np.asarray(slots.mask), chunk, pad_multiple=8
    )
    params = model.init({"params": jax.random.key(1)}, pos, feats, mask,
                        encoder_slots=[slots], decoder_slots=[slots])
    out_s = model.apply(params, pos, feats, mask,
                        encoder_slots=[slots], decoder_slots=[slots])
    out_f = model.apply(params, pos, feats, mask,
                        encoder_slots=[flat], decoder_slots=[flat])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s), atol=5e-5)


def test_flat_rejects_unsupported_configs():
    """Geoembed decoder / sampling / modular encoder paths refuse flat edges
    loudly instead of silently misbehaving."""
    rng = np.random.default_rng(31)
    B, N, chunk = 1, 64, 16
    pos = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(B, N, 2)), jnp.float32)
    mask = jnp.ones((B, N), bool)
    grid = LatentGrid(dims=(4, 4, 4))
    slots = build_edge_slots_batched(pos, grid, 0.45, k_neighbors=1,
                                     strategy="bidirectional", point_mask=mask)
    flat = flatten_slots_host_batched(
        np.asarray(slots.lat_idx), np.asarray(slots.mask), chunk, pad_multiple=8
    )

    # decoder geoembed path refuses flat
    m_geo = _flagship_model(use_geoembed=[True, True], fused_head=False)
    p_geo = m_geo.init({"params": jax.random.key(2)}, pos, feats, mask,
                       encoder_slots=[slots], decoder_slots=[slots])
    with pytest.raises(ValueError, match="geoembed"):
        m_geo.apply(p_geo, pos, feats, mask,
                    encoder_slots=[flat], decoder_slots=[flat])

    # modular (non-fused) encoder refuses flat
    m_mod = _flagship_model(fused_encoder=False)
    p_mod = m_mod.init({"params": jax.random.key(3)}, pos, feats, mask,
                       encoder_slots=[slots], decoder_slots=[slots])
    with pytest.raises(ValueError, match="fused encoder"):
        m_mod.apply(p_mod, pos, feats, mask,
                    encoder_slots=[flat], decoder_slots=[flat])

    # edge-modifying configs refuse flat EVEN AT EVAL (the slotted path
    # applies deterministic caps train and eval; skipping them silently
    # would diverge from the slotted layout)
    m_cap = _flagship_model(max_radius_neighbors=32)
    p_cap = m_cap.init({"params": jax.random.key(4)}, pos, feats, mask,
                       encoder_slots=[slots], decoder_slots=[slots])
    with pytest.raises(ValueError, match="radius caps"):
        m_cap.apply(p_cap, pos, feats, mask,
                    encoder_slots=[flat], decoder_slots=[flat])
    m_samp = _flagship_model(sampling_strategy="max_neighbors", max_neighbors=4)
    p_samp = m_samp.init({"params": jax.random.key(5)}, pos, feats, mask,
                         encoder_slots=[slots], decoder_slots=[slots])
    with pytest.raises(ValueError, match="edge sampling"):
        m_samp.apply(p_samp, pos, feats, mask,
                     encoder_slots=[flat], decoder_slots=[flat])


def test_parse_edge_layout():
    from gaot3d_tpu.models.magno import parse_edge_layout

    assert parse_edge_layout("slots") == ("slots", "slots")
    assert parse_edge_layout("flat") == ("flat", "flat")
    assert parse_edge_layout(["flat", "slots"]) == ("flat", "slots")
    assert parse_edge_layout(("slots", "flat")) == ("slots", "flat")
    with pytest.raises(ValueError, match="unknown edge_layout"):
        parse_edge_layout("dense")
    with pytest.raises(ValueError, match="length 2"):
        parse_edge_layout(["flat", "slots", "flat"])


@pytest.mark.parametrize("enc_flat,dec_flat", [(True, False), (False, True)])
def test_mixed_layout_matches_slotted(enc_flat, dec_flat):
    """PER-SIDE layout mixing (edge_layout=[enc, dec] pair): flat on one side
    and slots on the other must equal all-slotted in outputs AND grads — the
    measured optimum differs by direction (flat encoder always wins; the
    slotted decoder wins the forward), so inference serves ['flat','slots']."""
    model = _flagship_model()
    rng = np.random.default_rng(41)
    B, N, chunk = 2, 64, 16
    pos = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(B, N, 2)), jnp.float32)
    target = jnp.asarray(rng.normal(size=(B, N, 1)), jnp.float32)
    mask = jnp.ones((B, N), bool)
    grid = LatentGrid(dims=(4, 4, 4))
    slots = build_edge_slots_batched(pos, grid, 0.45, k_neighbors=1,
                                     strategy="bidirectional", point_mask=mask)
    flat = flatten_slots_host_batched(
        np.asarray(slots.lat_idx), np.asarray(slots.mask), chunk, pad_multiple=8
    )
    enc = [flat] if enc_flat else [slots]
    dec = [flat] if dec_flat else [slots]

    params = model.init({"params": jax.random.key(0)}, pos, feats, mask,
                        encoder_slots=[slots], decoder_slots=[slots])

    def loss(p, e, d):
        pred = model.apply(p, pos, feats, mask, encoder_slots=e, decoder_slots=d)
        return jnp.sum((pred - target) ** 2), pred

    (l_s, out_s), g_s = jax.value_and_grad(loss, has_aux=True)(params, [slots], [slots])
    (l_m, out_m), g_m = jax.value_and_grad(loss, has_aux=True)(params, enc, dec)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_s), atol=5e-5)
    np.testing.assert_allclose(float(l_m), float(l_s), rtol=1e-5)
    chex.assert_trees_all_close(g_m, g_s, atol=2e-4, rtol=2e-4)


def test_flat_dst_pallas_reduce_matches_fold():
    """flat_reduce_impl='pallas' (sorted-segment one-hot MXU kernel via the
    batch-stride wrapper, ops/segment.pallas_segment_sum_presorted) must match
    the presorted fold end-to-end: outputs and grads. Interpret mode on CPU is
    exact f32, so tolerances are tight; on-chip the kernel is bf16-matmul
    grade (passes=1), same as every other TPU matmul."""
    rng = np.random.default_rng(31)
    B, N, chunk = 2, 64, 16
    pos = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(B, N, 2)), jnp.float32)
    target = jnp.asarray(rng.normal(size=(B, N, 1)), jnp.float32)
    mask = jnp.ones((B, N), bool)
    grid = LatentGrid(dims=(4, 4, 4))
    slots = build_edge_slots_batched(pos, grid, 0.45, k_neighbors=1,
                                     strategy="bidirectional", point_mask=mask)
    flat_enc = flatten_slots_host_batched(
        np.asarray(slots.lat_idx), np.asarray(slots.mask), chunk, pad_multiple=8,
        order="dst")
    flat_dec = flatten_slots_host_batched(
        np.asarray(slots.lat_idx), np.asarray(slots.mask), chunk, pad_multiple=8)

    outs, losses, grads = {}, {}, {}
    for impl in ("fold", "pallas"):
        model = _flagship_model(flat_order="dst", flat_reduce_impl=impl)
        params = model.init({"params": jax.random.key(0)}, pos, feats, mask,
                            encoder_slots=[slots], decoder_slots=[slots])

        def loss(p):
            pred = model.apply(p, pos, feats, mask, encoder_slots=[flat_enc],
                               decoder_slots=[flat_dec])
            return jnp.sum((pred - target) ** 2), pred

        (l, out), g = jax.value_and_grad(loss, has_aux=True)(params)
        outs[impl], losses[impl], grads[impl] = out, float(l), g
    np.testing.assert_allclose(np.asarray(outs["pallas"]),
                               np.asarray(outs["fold"]), atol=1e-5)
    np.testing.assert_allclose(losses["pallas"], losses["fold"], rtol=1e-5)
    chex.assert_trees_all_close(grads["pallas"], grads["fold"],
                                atol=2e-5, rtol=2e-5)


def test_pallas_segment_sum_presorted_oracle():
    """Batch-stride wrapper vs a numpy f64 oracle, including: invalid rows
    (mask), batches whose edges land in the stride dead zone boundary cells
    (first/last segment), and the gather backward."""
    from gaot3d_tpu.ops.segment import pallas_segment_sum_presorted

    rng = np.random.default_rng(7)
    B, E, P, M = 3, 40, 5, 16
    seg = np.sort(rng.integers(0, M, (B, E)), axis=1).astype(np.int32)
    nvalid = np.array([E, E - 7, 3])
    mask = np.arange(E)[None, :] < nvalid[:, None]
    seg = np.where(mask, seg, M)  # invalid packed last keeps rows sorted
    data = rng.normal(size=(B, E, P)).astype(np.float32)

    want = np.zeros((B, M, P))
    for b in range(B):
        for e in range(E):
            if mask[b, e]:
                want[b, seg[b, e]] += data[b, e].astype(np.float64)

    got = pallas_segment_sum_presorted(
        jnp.asarray(data), jnp.asarray(seg), jnp.asarray(mask), M)
    # default passes=2 carries the hi/lo bf16x2 representation error
    # (~2^-16 rel) even in exact-f32 interpret mode
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)

    def f(d):
        out = pallas_segment_sum_presorted(d, jnp.asarray(seg),
                                           jnp.asarray(mask), M)
        return jnp.sum(out ** 2)

    g = jax.grad(f)(jnp.asarray(data))
    gwant = np.zeros_like(data)
    for b in range(B):
        for e in range(E):
            if mask[b, e]:
                gwant[b, e] = 2 * want[b, seg[b, e]]
    np.testing.assert_allclose(np.asarray(g), gwant, atol=1e-4)
