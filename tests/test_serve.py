"""Serving export roundtrip: serialize the compiled eval forward, reload it
WITHOUT the model object, and match the in-process predictions."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaot3d_tpu.models import (
    AttentionConfig,
    FFNConfig,
    MAGNOConfig,
    TransformerConfig,
    init_model,
)
from gaot3d_tpu.serve import export_inference, load_inference


def _tiny():
    magno = MAGNOConfig(
        lifting_channels=8, use_geoembed=[True, False], gno_radius=0.45,
        neighbor_strategy="bidirectional",
        in_gno_channel_mlp_hidden_layers=[16],
        out_gno_channel_mlp_hidden_layers=[16], projection_channels=16,
    )
    attn = TransformerConfig(
        patch_size=2, hidden_size=32, num_layers=2, positional_embedding="absolute",
        attn_config=AttentionConfig(hidden_size=32, num_heads=4, num_kv_heads=2,
                                    atten_dropout=0.0),
        ffn_config=FFNConfig(hidden_size=64),
    )
    return init_model(2, 1, "gaot_3d", magno, attn, latent_tokens=(4, 4, 4))


def test_export_roundtrip(tmp_path):
    model = _tiny()
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-1, 1, (1, 64, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(1, 64, 2)), jnp.float32)
    mask = jnp.ones((1, 64), bool)
    params = model.init({"params": jax.random.key(0)}, pos, feats, mask)
    # jit the reference side too: eager CPU execution skips the FMA/fusion
    # contractions the compiled (and exported) path performs
    jit_apply = jax.jit(lambda *a: model.apply(params, *a, train=False))
    want = jit_apply(pos, feats, mask)

    path = os.path.join(tmp_path, "model.gaotx")
    export_inference(model, params, (pos, feats, mask), path)
    assert os.path.exists(path)

    infer = load_inference(path)
    got = infer(pos, feats, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    # fresh inputs exercise the function, not a cached constant
    pos2 = jnp.asarray(rng.uniform(-1, 1, (1, 64, 3)), jnp.float32)
    feats2 = jnp.asarray(rng.normal(size=(1, 64, 2)), jnp.float32)
    want2 = jit_apply(pos2, feats2, mask)
    got2 = infer(pos2, feats2, mask)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=1e-6)


def test_export_with_precomputed_flat_edges(tmp_path):
    """Precomputed-graph serving: the flat edge structures ride as call-time
    pytree args (not baked), so one export serves many meshes of the padded
    shape."""
    from gaot3d_tpu.ops import (
        LatentGrid,
        build_edge_slots_batched,
        flatten_slots_host_batched,
    )

    model = _tiny()
    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.uniform(-1, 1, (1, 64, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(1, 64, 2)), jnp.float32)
    mask = jnp.ones((1, 64), bool)
    grid = LatentGrid(dims=(4, 4, 4))
    slots = build_edge_slots_batched(pos, grid, 0.45, k_neighbors=1,
                                     strategy="bidirectional", point_mask=mask)
    flat = flatten_slots_host_batched(
        np.asarray(slots.lat_idx), np.asarray(slots.mask), 16, pad_multiple=8
    )
    params = model.init({"params": jax.random.key(0)}, pos, feats, mask)

    class Wrapper:
        def apply(self, p, pos, feats, mask, enc, dec, train=False):
            return model.apply(p, pos, feats, mask, train=train,
                               encoder_slots=[enc], decoder_slots=[dec])

    want = jax.jit(
        lambda p, f, m, e, d: model.apply(params, p, f, m, train=False,
                                          encoder_slots=[e], decoder_slots=[d])
    )(pos, feats, mask, flat, flat)
    path = os.path.join(tmp_path, "model_flat.gaotx")
    export_inference(Wrapper(), params, (pos, feats, mask, flat, flat), path)
    got = load_inference(path)(pos, feats, mask, flat, flat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_cross_lowering_for_tpu(tmp_path):
    """Exports can target TPU from a CPU build host (`platforms=['tpu']`):
    lowering needs no TPU backend, only the serialized artifact records the
    platform (the deployment story in docs/MIGRATING.md)."""
    from jax import export as jax_export

    model = _tiny()
    rng = np.random.default_rng(2)
    pos = jnp.asarray(rng.uniform(-1, 1, (1, 64, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(1, 64, 2)), jnp.float32)
    mask = jnp.ones((1, 64), bool)
    params = model.init({"params": jax.random.key(0)}, pos, feats, mask)
    path = os.path.join(tmp_path, "model_tpu.gaotx")
    export_inference(model, params, (pos, feats, mask), path, platforms=["tpu"])
    from gaot3d_tpu.serve import MAGIC

    with open(path, "rb") as f:
        f.read(len(MAGIC))
        exp = jax_export.deserialize(f.read())
    assert exp.platforms == ("tpu",)


def test_load_rejects_non_export(tmp_path):
    p = os.path.join(tmp_path, "junk.gaotx")
    with open(p, "wb") as f:
        f.write(b"not an export")
    with pytest.raises(ValueError, match="bad magic"):
        load_inference(p)


def test_bucket_bundle_dispatch(tmp_path):
    """Multi-bucket bundle: requests pad up to the smallest covering bucket
    and predictions slice back; padded rows are inert (mask False), so the
    dispatched result matches the model run at the request's own padding."""
    from gaot3d_tpu.serve import export_inference_buckets, load_inference_buckets

    model = _tiny()
    rng = np.random.default_rng(7)

    def example(n):
        return (jnp.zeros((1, n, 3), jnp.float32),
                jnp.zeros((1, n, 2), jnp.float32),
                jnp.ones((1, n), bool))

    pos0, feats0, mask0 = example(64)
    params = model.init({"params": jax.random.key(0)}, pos0, feats0, mask0)
    path = os.path.join(tmp_path, "model.gaotxb")
    export_inference_buckets(model, params, {64: example(64), 128: example(128)},
                             path)
    infer = load_inference_buckets(path)
    assert infer.buckets == [64, 128]

    jit_apply = jax.jit(lambda *a: model.apply(params, *a, train=False))
    for n, bucket in ((50, 64), (64, 64), (100, 128), (128, 128)):
        pos = jnp.asarray(rng.uniform(-1, 1, (1, n, 3)), jnp.float32)
        feats = jnp.asarray(rng.normal(size=(1, n, 2)), jnp.float32)
        mask = jnp.ones((1, n), bool)
        got = infer(pos, feats, mask)
        assert got.shape == (1, n, 1)
        pad = bucket - n
        want = jit_apply(jnp.pad(pos, ((0, 0), (0, pad), (0, 0))),
                         jnp.pad(feats, ((0, 0), (0, pad), (0, 0))),
                         jnp.pad(mask, ((0, 0), (0, pad))))[:, :n]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    with pytest.raises(ValueError, match="exceeds the largest bucket"):
        infer(jnp.zeros((1, 200, 3)), jnp.zeros((1, 200, 2)),
              jnp.ones((1, 200), bool))


def test_bucket_bundle_rejects_wrong_magic(tmp_path):
    from gaot3d_tpu.serve import load_inference_buckets

    p = os.path.join(tmp_path, "bad.gaotxb")
    with open(p, "wb") as f:
        f.write(b"GAOTX001xxxx")
    with pytest.raises(ValueError, match="bucket bundle"):
        load_inference_buckets(p)


def test_make_edge_arg_model_roundtrip(tmp_path):
    """The library wrapper for call-time edge structures (the CLI's
    --edges slots/flat mode) exports and reloads; fresh slots at call time
    change the result consistently with the in-process model."""
    from gaot3d_tpu.ops import LatentGrid, build_edge_slots_batched
    from gaot3d_tpu.serve import make_edge_arg_model

    model = _tiny()
    rng = np.random.default_rng(4)
    pos = jnp.asarray(rng.uniform(-1, 1, (1, 64, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(1, 64, 2)), jnp.float32)
    mask = jnp.ones((1, 64), bool)
    grid = LatentGrid(dims=(4, 4, 4))
    slots = build_edge_slots_batched(pos, grid, 0.45, k_neighbors=1,
                                     strategy="bidirectional", point_mask=mask)
    params = model.init({"params": jax.random.key(0)}, pos, feats, mask)

    wrapped = make_edge_arg_model(model, num_scales=1)
    path = os.path.join(tmp_path, "model_edges.gaotx")
    export_inference(wrapped, params, (pos, feats, mask, slots, slots), path)
    infer = load_inference(path)

    want = jax.jit(lambda *a: model.apply(
        params, a[0], a[1], a[2], train=False,
        encoder_slots=[a[3]], decoder_slots=[a[4]]))(pos, feats, mask, slots, slots)
    got = infer(pos, feats, mask, slots, slots)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    with pytest.raises(ValueError, match="edge structures"):
        wrapped.apply(params, pos, feats, mask, slots)


def test_neural_field_query_export(tmp_path):
    """Neural-field serving: decoder query coordinates ride as CALL-TIME args
    — one artifact answers arbitrary query points per request (the serving
    twin of the reference's neural_field evaluation, stat.py:438-514)."""
    model = _tiny()
    rng = np.random.default_rng(9)
    pos = jnp.asarray(rng.uniform(-1, 1, (1, 64, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(1, 64, 2)), jnp.float32)
    mask = jnp.ones((1, 64), bool)
    qpos = jnp.asarray(rng.uniform(-1, 1, (1, 48, 3)), jnp.float32)
    qmask = jnp.ones((1, 48), bool)
    params = model.init({"params": jax.random.key(0)}, pos, feats, mask)

    class QueryWrapper:
        def apply(self, p, pos, feats, mask, qpos, qmask, train=False):
            return model.apply(p, pos, feats, mask, query_pos=qpos,
                               query_mask=qmask, train=train)

    path = os.path.join(tmp_path, "model_nf.gaotx")
    export_inference(QueryWrapper(), params, (pos, feats, mask, qpos, qmask), path)
    infer = load_inference(path)

    want = jax.jit(lambda *a: model.apply(params, a[0], a[1], a[2],
                                          query_pos=a[3], query_mask=a[4],
                                          train=False))(pos, feats, mask, qpos, qmask)
    got = infer(pos, feats, mask, qpos, qmask)
    assert got.shape == (1, 48, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    # a second request with DIFFERENT query points through the same artifact
    qpos2 = jnp.asarray(rng.uniform(-1, 1, (1, 48, 3)), jnp.float32)
    got2 = infer(pos, feats, mask, qpos2, qmask)
    assert not np.allclose(np.asarray(got2), np.asarray(got))
