"""Accuracy-parity harness at the reference recipe (VERDICT r3 item 1).

Trains the SAME scaled-down GAOT-3D — torch reference code at /root/reference
vs this package — from the SAME torch initialization (imported with the
library importer, gaot3d_tpu/torch_import.py) on the SAME fixed synthetic
multi-sample dataset, with the reference's DrivAerNet pressure recipe
(config/examples/drivaernet/pressure.yaml): AdamW lr 3e-4 / weight_decay
1e-5, 'mix' schedule (max 5e-4 / min 1e-4 / final 5e-5, stepped per epoch,
optimizers.py:227-247), batch_size 1, 50 epochs, bidirectional neighbor
strategy, statistical geoembed [enc only], RoPE, attention dropout 0.1
(the YAML leaves the dataclass default, attn.py:134-136), and the
drivaernet metric suite (metric.py:147-190) on a held-out test split.

What is scaled (and why it stays faithful):
  - latent grid 64x64x32 -> 16x16x8 and gno_radius 0.033 -> 0.132: the
    stencil degree is purely geometric (radius / cell size); the ratio
    1.056 x min-cell is preserved, so mean/max degree match the full
    recipe (~2.4 / 5; the harness prints the measured values).
  - channel widths (hidden 256->128, ffn 1024->512, lifting 32->16,
    projection 256->128, kernel MLPs [64,64,64]->[32,32,32]) — depth is
    kept at the full 10 transformer layers.
  - dataset: 16 train / 4 val / 4 test synthetic clouds x 8192 nodes
    instead of 5817/1148/1154 x ~500K (1-core CPU budget).
Shared between the two frameworks per sample: the point cloud, the target
field, AND the edge set (our stencil builder's slots converted to the
reference's edge_index — graph-build parity is asserted separately in
tests/test_torch_parity_full.py). The per-epoch shuffle order is also
shared so the comparison isolates framework math + dropout streams.

Per seed: torch init (torch.manual_seed(seed)) -> import into flax ->
sanity-check initial losses match to f32 -> train both 50 epochs -> compare
converged test metrics. Dropout streams necessarily differ (torch global
RNG vs threefry) — that is exactly the run-to-run noise the multi-seed
table averages over.

Usage:
  python tools/convergence_parity.py                    # 3 seeds, ~2-3 h
  python tools/convergence_parity.py --seeds 0 --epochs 8 --nodes 512 \
      --train 2 --val 1 --test 1 --preset tiny          # CI smoke (~2 min)
  --kernel-dtype bfloat16 / --prng16: jax-side ablations (VERDICT item 4).

Outputs PARITY_CONVERGENCE.md + .json (or --out PREFIX).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

# jax platform for the WHOLE harness (graph build + jax training side).
# 'cpu' (default) = exact-f32 matmuls, no chip needed. 'axon' runs the jax
# side on the real TPU — required for the prng16 ablation (the in-core
# Pallas dropout draw has no CPU lowering; on cpu the flag is inert because
# attention falls back to the XLA recurrence, ops/attention.py:168-177).
_PLATFORM = "cpu"


# ---------------------------------------------------------------------------
# dataset: fixed synthetic clouds with a geometry-dependent learnable field
# ---------------------------------------------------------------------------

def make_dataset(n_samples: int, n_nodes: int, seed: int = 1234,
                 out: str = "pressure"):
    """Deformed-sphere clouds; feats = outward unit normals (3ch, the
    analogue of drivaernet's processed_pyg_normals inputs); target = smooth
    pressure-like field that depends on position AND normal orientation
    w.r.t. the +x 'flow' axis, with per-sample deformation so the task is
    not memorizable from coordinates alone.

    out='wss': 3-channel wall-shear-stress-like target instead — tangential
    flow direction (x-flow minus its normal component) scaled by a smooth
    position/deformation-dependent magnitude (the drivaernet_shearstress
    analogue: 3 output channels, per-channel normalization constants,
    reference metadata.py:57-58)."""
    rng = np.random.default_rng(seed)
    samples = []
    for _ in range(n_samples):
        u = rng.normal(size=(n_nodes, 3))
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        a, b = 0.25 * rng.uniform(0.5, 1.5), 0.15 * rng.uniform(0.5, 1.5)
        f1, f2 = rng.integers(2, 5), rng.integers(1, 4)
        bump = 1.0 + a * np.sin(f1 * u[:, 0]) + b * np.cos(f2 * u[:, 1] * u[:, 2] * 4)
        pos = (u * bump[:, None] * 0.8).astype(np.float32)
        normals = u.astype(np.float32)  # exact for the sphere; smooth proxy here
        if out == "wss":
            flow = np.array([1.0, 0.0, 0.0], np.float32)
            # tangential unit direction of the flow on the surface
            tang = flow[None, :] - normals[:, 0:1] * normals
            mag = (
                0.8 + 0.4 * np.cos(np.pi * pos[:, 2])
                + 0.6 * np.sin(2.0 * np.pi * pos[:, 1])
                + np.maximum(1.0 - normals[:, 0], 0.0)  # lee-side growth
                + 0.3 * a * 10.0
            )[:, None]
            y = (tang * mag).astype(np.float32)
        else:
            y = (
                np.sin(2.0 * np.pi * pos[:, 0]) * np.cos(np.pi * pos[:, 1])
                + 2.0 * np.maximum(normals[:, 0], 0.0) ** 2  # stagnation-like
                + 0.5 * pos[:, 2] ** 2
                + 0.3 * a * 10.0  # per-sample offset from the deformation
            ).astype(np.float32)[:, None]
        samples.append({"pos": pos, "x": normals, "y": y})
    return samples


def slots_to_edge_index_np(lat_idx, mask, direction: str):
    pt, k = np.nonzero(np.asarray(mask))
    lat_sel = np.asarray(lat_idx)[pt, k]
    if direction == "encoder":
        return np.stack([pt, lat_sel])
    return np.stack([lat_sel, pt])


# ---------------------------------------------------------------------------
# presets
# ---------------------------------------------------------------------------

PRESETS = {
    # scaled pressure.yaml (see module docstring)
    "scaled": dict(latent=(16, 16, 8), radius=0.132, hidden=128, ffn=512,
                   layers=10, heads=8, lifting=16, projection=128,
                   in_mlp=[32, 32, 32], out_mlp=[32, 32]),
    # CI smoke
    "tiny": dict(latent=(4, 4, 4), radius=0.53, hidden=16, ffn=32,
                 layers=2, heads=2, lifting=8, projection=16,
                 in_mlp=[16, 16], out_mlp=[16]),
}

RECIPE = dict(lr=3e-4, weight_decay=1e-5, max_lr=5e-4, min_lr=1e-4,
              final_lr=5e-5)  # pressure.yaml optimizer.args


def build_models(p, cin, cout, atten_dropout=0.1, precompute_edges=True):
    """Reference torch GAOT3D + our flax GAOT3D with the SAME scaled
    pressure.yaml architecture. Returns (ref_module_factory, our_model).

    precompute_edges=False is the neural-field configuration (reference
    stat.py:48-54 forces it): the torch model builds edges on the fly from
    the sampled coords (brute stubs), ours builds stencil slots on device."""
    from reference_stubs import install_reference_stubs

    install_reference_stubs()
    import src.model.layers.attn as ref_attn
    import src.model.layers.magno as ref_magno
    import src.model.gaot_3d as ref_gaot

    from gaot3d_tpu.models import (
        AttentionConfig, FFNConfig, MAGNOConfig, TransformerConfig, init_model,
    )

    r_magno = ref_magno.MAGNOConfig(
        lifting_channels=p["lifting"],
        gno_coord_dim=3,
        gno_radius=p["radius"],
        neighbor_strategy="bidirectional",
        use_geoembed=[True, False],
        embedding_method="statistical",
        in_gno_channel_mlp_hidden_layers=list(p["in_mlp"]),
        out_gno_channel_mlp_hidden_layers=list(p["out_mlp"]),
        projection_channels=p["projection"],
        mlp_type="linear",
        attention_type="cosine",
        precompute_edges=precompute_edges,
    )
    r_attn = ref_attn.TransformerConfig(
        patch_size=2,
        hidden_size=p["hidden"],
        num_layers=p["layers"],
        positional_embedding="rope",
        use_long_range_skip=True,
        attn_config=ref_attn.AttentionConfig(
            hidden_size=p["hidden"], num_heads=p["heads"],
            num_kv_heads=p["heads"], atten_dropout=atten_dropout,
            positional_embedding="rope",
        ),
        ffn_config=ref_attn.FFNConfig(hidden_size=p["ffn"]),
    )

    o_magno = MAGNOConfig(
        lifting_channels=p["lifting"],
        gno_coord_dim=3,
        gno_radius=p["radius"],
        neighbor_strategy="bidirectional",
        use_geoembed=[True, False],
        embedding_method="statistical",
        in_gno_channel_mlp_hidden_layers=list(p["in_mlp"]),
        out_gno_channel_mlp_hidden_layers=list(p["out_mlp"]),
        projection_channels=p["projection"],
        attention_type="cosine",
        # flagship fast paths — the shipped configuration, not the modular twin
        fused_encoder=True,
        fused_decoder=True,
        kernel_dtype=os.environ.get("PARITY_KERNEL_DTYPE", "float32"),
    )
    o_attn = TransformerConfig(
        patch_size=2,
        hidden_size=p["hidden"],
        num_layers=p["layers"],
        positional_embedding="rope",
        use_long_range_skip=True,
        attn_config=AttentionConfig(
            hidden_size=p["hidden"], num_heads=p["heads"],
            num_kv_heads=p["heads"], atten_dropout=atten_dropout,
        ),
        ffn_config=FFNConfig(hidden_size=p["ffn"]),
    )

    def ref_factory():
        return ref_gaot.GAOT3D(cin, cout, r_magno, r_attn,
                               latent_tokens=p["latent"])

    ours = init_model(cin, cout, "gaot_3d", o_magno, o_attn,
                      latent_tokens=p["latent"])
    return ref_factory, ours


# ---------------------------------------------------------------------------
# per-seed runs
# ---------------------------------------------------------------------------

def run_torch_seed(seed, p, data, splits, slots_np, epochs, order,
                   cout=1, nf=None, samp=None):
    """Train the reference model; returns (initial state_dict copy,
    init train loss, final train loss, test predictions).

    nf=dict(input_nodes=..., query_nodes=...) runs the neural-field strategy
    (reference stat.py:438-514, train_step:520-539): per step, encoder input
    = the shared sampled subcloud, decoder queries = the shared sampled query
    coords, edges built ON THE FLY by the reference model itself
    (precompute_edges=False; brute-force pyg stubs). samp[ep][step] carries
    the shared (input_idx, query_idx) so both frameworks see identical
    sampling (the torch randperm is bypassed deliberately: sampling noise is
    not framework math)."""
    import torch

    from reference_stubs import Batch as RefBatch, install_reference_stubs

    install_reference_stubs()
    import src.trainer.optimizers as ref_opt

    tr_idx, _, te_idx = splits
    torch.manual_seed(seed)
    ref_factory, _ = build_models(p, cin=3, cout=cout,
                                  precompute_edges=nf is None)
    tm = ref_factory()
    sd0 = {k: v.detach().clone() for k, v in tm.state_dict().items()}

    def make_batch(i):
        s = data[i]
        n = s["pos"].shape[0]
        kw = {}
        if nf is None:
            li, mk = slots_np[i]
            kw = dict(
                encoder_edge_index_s0=torch.as_tensor(
                    slots_to_edge_index_np(li, mk, "encoder")),
                decoder_edge_index_s0=torch.as_tensor(
                    slots_to_edge_index_np(li, mk, "decoder")),
            )
        return RefBatch(
            pos=torch.as_tensor(s["pos"]), x=torch.as_tensor(s["x"]),
            batch=torch.zeros(n, dtype=torch.long), num_graphs=1, **kw,
        ), torch.as_tensor(s["y"])

    batches = {i: make_batch(i) for i in set(tr_idx) | set(te_idx)}

    opt = torch.optim.AdamW(tm.parameters(), lr=RECIPE["lr"],
                            weight_decay=RECIPE["weight_decay"])
    # AdamW 'mix' phase split, reference optimizers.py:227-233
    warm = max(1, int(0.02 * epochs))
    cos_e = int(0.90 * epochs)
    if int(0.02 * epochs) == 0:
        cos_e -= 1
    exp_e = epochs - warm - cos_e
    if exp_e == 0:
        exp_e, cos_e = 1, cos_e - 1
    sched = ref_opt.CustomLRScheduler(
        opt, epochs, warm, cos_e, exp_e,
        RECIPE["lr"], RECIPE["max_lr"], RECIPE["min_lr"], RECIPE["final_lr"])

    tm.train()
    init_loss = None
    last_epoch_loss = float("nan")
    for ep in range(epochs):
        total = 0.0
        for step_i, i in enumerate(order[ep]):
            gi = tr_idx[i]
            opt.zero_grad()
            if nf is not None:
                s = data[gi]
                in_idx, q_idx = samp[ep][step_i]
                n_in = in_idx.shape[0]
                b = RefBatch(
                    pos=torch.as_tensor(s["pos"][in_idx]),
                    x=torch.as_tensor(s["x"][in_idx]),
                    batch=torch.zeros(n_in, dtype=torch.long), num_graphs=1)
                qp = torch.as_tensor(s["pos"][q_idx])
                qb = torch.zeros(q_idx.shape[0], dtype=torch.long)
                y = torch.as_tensor(s["y"][q_idx])
                pred = tm(b, query_coord_pos=qp, query_coord_batch_idx=qb)
            else:
                b, y = batches[gi]
                pred = tm(b)
            loss = torch.nn.functional.mse_loss(pred, y)
            if init_loss is None:
                init_loss = float(loss.detach())
            loss.backward()
            opt.step()
            total += float(loss.detach())
        sched.step()
        last_epoch_loss = total / len(order[ep])

    tm.eval()
    preds = []
    with torch.no_grad():
        for i in te_idx:
            b, _ = batches[i]
            preds.append(tm(b).numpy())
    return sd0, init_loss, last_epoch_loss, preds


def run_jax_seed(seed, p, data, splits, slots_np, epochs, order, sd0, prng16,
                 cout=1, nf=None, samp=None):
    """Train OUR model from the imported torch init; returns
    (init train loss, final train loss, test predictions).

    nf: neural-field strategy — same shared sampling as run_torch_seed; our
    model builds stencil slots ON DEVICE from the sampled coords (no
    precomputed slots passed), the trainer's real neural-field path."""
    import jax

    jax.config.update("jax_platforms", _PLATFORM)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp
    import optax

    from gaot3d_tpu.ops.grid_graph import EdgeSlots
    from gaot3d_tpu.torch_import import (
        gaot_params_from_ref, rename_for_fused_paths,
    )
    from gaot3d_tpu.train.schedule import OptimizerargsConfig, make_optimizer

    if prng16:
        os.environ["GAOT_ATTN_PRNG16"] = "1"

    tr_idx, _, te_idx = splits
    _, model = build_models(p, cin=3, cout=cout,
                            precompute_edges=nf is None)
    jparams = gaot_params_from_ref(
        sd0, p["layers"], enc_geo=True, dec_geo=False,
        n_enc_fcs=len(p["in_mlp"]) + 1, n_dec_fcs=len(p["out_mlp"]) + 1)
    # pressure.yaml's use_geoembed=[true,false]: the fused decoder requires
    # geoembed (magno.py use_fused gating), so the decoder runs modular
    jparams = rename_for_fused_paths(jparams, fuse_encoder=True,
                                     fuse_decoder=False)

    # per-EPOCH LR stepping == steps_per_epoch optimizer steps per LR step
    cfg = OptimizerargsConfig(
        lr=RECIPE["lr"], weight_decay=RECIPE["weight_decay"], epoch=epochs,
        scheduler="mix", max_lr=RECIPE["max_lr"], min_lr=RECIPE["min_lr"],
        final_lr=RECIPE["final_lr"])
    tx = make_optimizer("adamw", cfg, steps_per_epoch=len(tr_idx))
    opt_state = tx.init(jparams)

    n = data[0]["pos"].shape[0]
    mask = jnp.ones((1, n), bool)

    if nf is not None:
        # neural-field strategy: sampled encoder inputs + sampled decoder
        # queries per step, slots built on device from the sampled coords
        k_in, k_q = nf["input_nodes"], nf["query_nodes"]
        mask_in = jnp.ones((1, k_in), bool)
        mask_q = jnp.ones((1, k_q), bool)

        def nf_loss_fn(params, pos_in, feats_in, query_pos, target, key):
            pred = model.apply(
                params, pos_in, feats_in, mask_in, train=True,
                rngs={"dropout": key},
                query_pos=query_pos, query_mask=mask_q)
            return jnp.mean((pred - target) ** 2)

        @jax.jit
        def nf_step(params, opt_state, pos_in, feats_in, query_pos, target, key):
            loss, grads = jax.value_and_grad(nf_loss_fn)(
                params, pos_in, feats_in, query_pos, target, key)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def nf_predict(params, pos, feats):
            return model.apply(params, pos, feats, mask)

        key = jax.random.key(seed)
        init_loss = None
        last_epoch_loss = float("nan")
        for ep in range(epochs):
            total = 0.0
            for step_i, i in enumerate(order[ep]):
                s = data[tr_idx[i]]
                in_idx, q_idx = samp[ep][step_i]
                key, sub = jax.random.split(key)
                jparams, opt_state, loss = nf_step(
                    jparams, opt_state,
                    jnp.asarray(s["pos"][in_idx])[None],
                    jnp.asarray(s["x"][in_idx])[None],
                    jnp.asarray(s["pos"][q_idx])[None],
                    jnp.asarray(s["y"][q_idx])[None], sub)
                if init_loss is None:
                    init_loss = float(loss)
                total += float(loss)
            last_epoch_loss = total / len(order[ep])

        preds = []
        for i in te_idx:
            s = data[i]
            preds.append(np.asarray(nf_predict(
                jparams, jnp.asarray(s["pos"])[None],
                jnp.asarray(s["x"])[None]))[0])
        return init_loss, last_epoch_loss, preds

    def to_slots(i):
        li, mk = slots_np[i]
        return [EdgeSlots(jnp.asarray(li)[None], jnp.asarray(mk)[None])]

    slot_cache = {i: to_slots(i) for i in set(tr_idx) | set(te_idx)}

    def loss_fn(params, pos, feats, target, slots, key):
        pred = model.apply(
            params, pos, feats, mask, train=True, rngs={"dropout": key},
            encoder_slots=slots, decoder_slots=slots)
        return jnp.mean((pred - target) ** 2)

    @jax.jit
    def step(params, opt_state, pos, feats, target, lat_idx, lat_mask, key):
        slots = [EdgeSlots(lat_idx, lat_mask)]
        loss, grads = jax.value_and_grad(loss_fn)(
            params, pos, feats, target, slots, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict(params, pos, feats, lat_idx, lat_mask):
        slots = [EdgeSlots(lat_idx, lat_mask)]
        return model.apply(params, pos, feats, mask,
                           encoder_slots=slots, decoder_slots=slots)

    key = jax.random.key(seed)
    init_loss = None
    last_epoch_loss = float("nan")
    for ep in range(epochs):
        total = 0.0
        for i in order[ep]:
            gi = tr_idx[i]
            s = data[gi]
            sl = slot_cache[gi][0]
            key, sub = jax.random.split(key)
            jparams, opt_state, loss = step(
                jparams, opt_state, jnp.asarray(s["pos"])[None],
                jnp.asarray(s["x"])[None], jnp.asarray(s["y"])[None],
                sl.lat_idx, sl.mask, sub)
            if init_loss is None:
                init_loss = float(loss)
            total += float(loss)
        last_epoch_loss = total / len(order[ep])

    preds = []
    for i in te_idx:
        s, sl = data[i], slot_cache[i][0]
        preds.append(np.asarray(predict(
            jparams, jnp.asarray(s["pos"])[None], jnp.asarray(s["x"])[None],
            sl.lat_idx, sl.mask))[0])
    return init_loss, last_epoch_loss, preds


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def run(seeds, epochs, n_nodes, n_train, n_val, n_test, preset="scaled",
        prng16=False, out_prefix=None, data_seed=1234, recipe="pressure",
        nf_input=4096, nf_query=2048):
    import jax

    jax.config.update("jax_platforms", _PLATFORM)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp

    from gaot3d_tpu.ops.grid_graph import LatentGrid, build_edge_slots
    from gaot3d_tpu.train.metrics import compute_drivaernet_metric

    p = PRESETS[preset]
    cout = 3 if recipe == "wss" else 1
    nf = (dict(input_nodes=min(nf_input, n_nodes),
               query_nodes=min(nf_query, n_nodes))
          if recipe == "neural_field" else None)
    n_samples = n_train + n_val + n_test
    data = make_dataset(n_samples, n_nodes, seed=data_seed,
                        out="wss" if recipe == "wss" else "pressure")
    tr_idx = list(range(n_train))
    va_idx = list(range(n_train, n_train + n_val))
    te_idx = list(range(n_train + n_val, n_samples))
    splits = (tr_idx, va_idx, te_idx)

    # shared edge sets (our builder; converted for torch). neural_field
    # builds edges per step from the SAMPLED coords inside each framework
    # (reference constraint stat.py:48-54), so no precomputed slots there.
    slots_np = None
    if nf is None:
        grid = LatentGrid(dims=p["latent"])
        slots_np, degs = {}, []
        for i in set(tr_idx) | set(te_idx):
            s = build_edge_slots(jnp.asarray(data[i]["pos"]), grid, p["radius"],
                                 strategy="bidirectional")
            li, mk = np.asarray(s.lat_idx), np.asarray(s.mask)
            slots_np[i] = (li, mk)
            degs.append(mk.sum(1))
        deg = np.concatenate(degs)
        print(f"[dataset] {n_samples} x {n_nodes} nodes; stencil degree "
              f"mean {deg.mean():.2f} max {deg.max()} "
              f"(full recipe: ~2.4 / 5)", flush=True)
    else:
        deg = np.zeros(1)
        print(f"[dataset] {n_samples} x {n_nodes} nodes; neural_field "
              f"input {nf['input_nodes']} / query {nf['query_nodes']} "
              f"per step, on-device edges", flush=True)

    # drivaernet-style normalization constants from the train split
    # (per-channel — WSS uses mean/std triplets, metadata.py:57-58)
    tr_y = np.concatenate([data[i]["y"] for i in tr_idx])
    gmean = [float(v) for v in tr_y.mean(axis=0)]
    gstd = [float(v) for v in tr_y.std(axis=0)]

    rows = []
    for seed in seeds:
        t0 = time.time()
        order_rng = np.random.default_rng(10_000 + seed)
        order = [order_rng.permutation(len(tr_idx)) for _ in range(epochs)]
        samp = None
        if nf is not None:
            # shared neural-field sampling (both frameworks see the same
            # input/query node indices; reference stat.py:458-483 uses
            # torch.randperm — sampling noise is not framework math)
            srng = np.random.default_rng(20_000 + seed)
            samp = [[(srng.permutation(n_nodes)[: nf["input_nodes"]],
                      srng.permutation(n_nodes)[: nf["query_nodes"]])
                     for _ in range(len(tr_idx))]
                    for _ in range(epochs)]

        sd0, t_init, t_final, t_preds = run_torch_seed(
            seed, p, data, splits, slots_np, epochs, order,
            cout=cout, nf=nf, samp=samp)
        t_torch = time.time() - t0
        print(f"[seed {seed}] torch: {t_init:.4f} -> {t_final:.4e} "
              f"({t_torch:.0f}s)", flush=True)

        t0 = time.time()
        j_init, j_final, j_preds = run_jax_seed(
            seed, p, data, splits, slots_np, epochs, order, sd0, prng16,
            cout=cout, nf=nf, samp=samp)
        t_jax = time.time() - t0
        print(f"[seed {seed}] jax:   {j_init:.4f} -> {j_final:.4e} "
              f"({t_jax:.0f}s)", flush=True)

        # identical imported init (f32 forward agreement; neural-field inits
        # are noisier — 2048-query losses + two independent dropout streams)
        init_tol = 1e-2 if nf is not None else 5e-3
        init_rel = abs(j_init - t_init) / max(abs(t_init), 1e-12)
        assert init_rel < init_tol, (
            f"seed {seed}: imported init does not reproduce the torch "
            f"loss: {j_init} vs {t_init} (rel {init_rel:.2e})")

        gtr = [data[i]["y"] for i in te_idx]
        tm_m = compute_drivaernet_metric(gtr, t_preds, gmean, gstd)
        jx_m = compute_drivaernet_metric(gtr, j_preds, gmean, gstd)
        rows.append(dict(
            seed=seed, torch_init=t_init, torch_final=t_final,
            jax_init=j_init, jax_final=j_final,
            torch_metrics=tm_m, jax_metrics=jx_m,
            torch_s=t_torch, jax_s=t_jax,
            mse_ratio=jx_m["MSE"] / tm_m["MSE"],
            rel_l2_ratio=jx_m["Rel_L2"] / tm_m["Rel_L2"],
        ))
        print(f"[seed {seed}] test MSE (normalized): torch "
              f"{tm_m['MSE']:.4e} jax {jx_m['MSE']:.4e} "
              f"ratio {rows[-1]['mse_ratio']:.3f}; Rel_L2 torch "
              f"{tm_m['Rel_L2']:.4f} jax {jx_m['Rel_L2']:.4f}", flush=True)

    result = dict(
        preset=preset, params=p, recipe=RECIPE, task=recipe,
        out_channels=cout, neural_field=nf, epochs=epochs,
        nodes=n_nodes, train=n_train, val=n_val, test=n_test,
        prng16=prng16,
        kernel_dtype=os.environ.get("PARITY_KERNEL_DTYPE", "float32"),
        degree_mean=float(deg.mean()), degree_max=int(deg.max()),
        seeds=rows,
        geo_mean_mse_ratio=float(np.exp(np.mean(
            [np.log(r["mse_ratio"]) for r in rows]))),
    )
    if out_prefix:
        with open(out_prefix + ".json", "w") as f:
            json.dump(result, f, indent=1)
        write_markdown(result, out_prefix + ".md")
        print(f"wrote {out_prefix}.json / .md", flush=True)
    return result


def write_markdown(result, path):
    r = result
    lines = [
        "# Convergence parity — torch reference vs gaot3d_tpu",
        "",
        f"Scaled DrivAerNet **{r.get('task', 'pressure')}** recipe "
        f"({r.get('out_channels', 1)}-channel output, preset `{r['preset']}`"
        + (f", neural-field {r['neural_field']['input_nodes']} input / "
           f"{r['neural_field']['query_nodes']} query nodes per step, "
           f"on-device edges" if r.get("neural_field") else "")
        + f"): {r['epochs']} epochs, AdamW {RECIPE['lr']}/wd {RECIPE['weight_decay']}, "
        f"mix schedule, dropout 0.1, bidirectional stencil "
        f"(degree mean {r['degree_mean']:.2f} max {r['degree_max']}), "
        f"{r['train']}/{r['val']}/{r['test']} x {r['nodes']}-node clouds, "
        f"identical imported init per seed, shared "
        + ("sampling + shuffle order"
           if r.get("neural_field") else "edge sets + shuffle order")
        + f". jax side: fused fast paths, kernel_dtype={r['kernel_dtype']}, "
        f"prng16={r['prng16']}.",
        "",
        "| seed | torch test MSE | jax test MSE | ratio | torch Rel_L2 | jax Rel_L2 | torch s | jax s |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for row in r["seeds"]:
        tm, jm = row["torch_metrics"], row["jax_metrics"]
        lines.append(
            f"| {row['seed']} | {tm['MSE']:.4e} | {jm['MSE']:.4e} | "
            f"{row['mse_ratio']:.3f} | {tm['Rel_L2']:.4f} | {jm['Rel_L2']:.4f} | "
            f"{row['torch_s']:.0f} | {row['jax_s']:.0f} |")
    lines += [
        "",
        f"Geometric-mean MSE ratio (jax/torch): **{r['geo_mean_mse_ratio']:.3f}** "
        "(1.0 = exact parity; metrics on the z-normalized field, "
        "reference metric.py:147-190 semantics).",
        "",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--nodes", type=int, default=8192)
    ap.add_argument("--train", type=int, default=16)
    ap.add_argument("--val", type=int, default=4)
    ap.add_argument("--test", type=int, default=4)
    ap.add_argument("--preset", default="scaled", choices=sorted(PRESETS))
    ap.add_argument("--recipe", default="pressure",
                    choices=["pressure", "wss", "neural_field"],
                    help="pressure: 1-ch full grid; wss: 3-ch full grid "
                         "(shearstress analogue, per-channel metric "
                         "normalization); neural_field: sampled input/query "
                         "nodes per step with on-device edges (reference "
                         "stat.py:438-514)")
    ap.add_argument("--nf-input", type=int, default=4096,
                    help="neural_field encoder input nodes per step")
    ap.add_argument("--nf-query", type=int, default=2048,
                    help="neural_field decoder query nodes per step (chosen "
                         "!= nf-input so the distinct-permutation path runs, "
                         "stat.py:478-483)")
    ap.add_argument("--kernel-dtype", default=None,
                    help="jax-side kernel MLP dtype ablation (e.g. bfloat16)")
    ap.add_argument("--prng16", action="store_true",
                    help="jax-side 16-bit attention-dropout PRNG ablation")
    ap.add_argument("--jax-platform", default="cpu",
                    help="'axon' runs the jax side on the TPU (required for "
                         "--prng16 to actually engage; see _PLATFORM note)")
    ap.add_argument("--out", default="PARITY_CONVERGENCE")
    args = ap.parse_args(argv)
    if args.kernel_dtype:
        os.environ["PARITY_KERNEL_DTYPE"] = args.kernel_dtype
    global _PLATFORM
    _PLATFORM = args.jax_platform
    if args.prng16 and _PLATFORM == "cpu":
        ap.error("--prng16 is inert on cpu (XLA attention fallback); "
                 "pass --jax-platform axon")
    seeds = [int(s) for s in args.seeds.split(",")]
    run(seeds, args.epochs, args.nodes, args.train, args.val, args.test,
        preset=args.preset, prng16=args.prng16, out_prefix=args.out,
        recipe=args.recipe, nf_input=args.nf_input, nf_query=args.nf_query)


if __name__ == "__main__":
    main()
