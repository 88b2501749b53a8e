"""Benchmark: train-step throughput of the flagship GAOT3D config on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The measured configuration mirrors the reference's DrivAerNet++ pressure
recipe (config/examples/drivaernet/pressure.yaml: latent 64x64x32, patch 2,
10 layers, hidden 256, RoPE, bidirectional graphs, radius 0.033, lifting 32,
batch 1) on a synthetic 500K-node point cloud (DrivAerNet++ mesh scale) (bench-sized; the full dataset
is not present in this environment). The reference publishes no throughput
numbers (SURVEY.md section 6), so vs_baseline is reported as 1.0 with the
absolute samples/sec/chip as the tracked metric.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from flax.training import train_state

    from gaot3d_tpu.models import (
        AttentionConfig,
        FFNConfig,
        MAGNOConfig,
        TransformerConfig,
        init_model,
    )
    from gaot3d_tpu.train.trainer import masked_mse

    # full-size reference recipe
    magno = MAGNOConfig(
        lifting_channels=32,
        gno_radius=0.033,
        neighbor_strategy="bidirectional",
        use_geoembed=[True, False],
        in_gno_channel_mlp_hidden_layers=[64, 64, 64],
        out_gno_channel_mlp_hidden_layers=[64, 64],
        projection_channels=256,
        encoder_feature_attr="x",
        edge_chunk_size=int(os.environ.get("BENCH_CHUNK", 65536)),
        slot_budget=int(os.environ.get("BENCH_SLOT_BUDGET", 8)),
        remat=os.environ.get("BENCH_REMAT", "1") == "1",
        remat_policy=os.environ.get("BENCH_REMAT_POLICY", "nothing"),
        segment_impl=os.environ.get("BENCH_SEGMENT_IMPL", "scatter"),
    )
    attn = TransformerConfig(
        patch_size=2,
        hidden_size=256,
        num_layers=10,
        positional_embedding="rope",
        attn_config=AttentionConfig(
            hidden_size=256, num_heads=8, num_kv_heads=8,
            atten_dropout=float(os.environ.get("BENCH_ATTN_DROPOUT", 0.1)),
            attention_impl=os.environ.get("BENCH_ATTN_IMPL", "auto"),
        ),
        ffn_config=FFNConfig(hidden_size=1024),
    )
    N = int(os.environ.get("BENCH_NODES", 524_288))  # DrivAerNet++-scale mesh (500K nodes), padded to 2^19
    B = int(os.environ.get("BENCH_BATCH", 1))
    steps = int(os.environ.get("BENCH_STEPS", 10))

    model = init_model(3, 1, "gaot_3d", magno, attn, latent_tokens=(64, 64, 32))
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    target = jnp.asarray(rng.normal(size=(B, N, 1)), jnp.float32)
    mask = jnp.ones((B, N), bool)

    params = model.init({"params": jax.random.key(0)}, pos, feats, mask)
    tx = optax.adamw(3e-4, weight_decay=1e-5)
    state = train_state.TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    @jax.jit
    def train_step(state, rngkey):
        def loss_fn(p):
            pred = model.apply(p, pos, feats, mask, train=True, rngs={"dropout": rngkey})
            return masked_mse(pred, target, mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    # warmup / compile
    state, loss = train_step(state, jax.random.key(1))
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for i in range(steps):
        state, loss = train_step(state, jax.random.key(2 + i))
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    sps = steps * B / dt

    print(json.dumps({
        "metric": "gaot3d_train_throughput_500k_nodes",
        "value": round(sps, 4),
        "unit": "samples/sec/chip",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
