"""Full-model weight-transfer parity against the ACTUAL torch reference code
at /root/reference (imported under torch CPU with pure-torch stand-ins for the
missing PyG/rotary wheels — see reference_stubs.py).

Protocol: build the reference module with its own torch init, copy its
state_dict into the flax params, feed BOTH sides the SAME edge sets (ours from
the stencil builder, converted to edge_index for the reference's
precompute_edges path), and assert outputs match to f32 tolerance. This
isolates model math; graph-BUILD parity is asserted separately
(test_edge_build_matches_reference) where the reference computes its own
edges via brute-force knn/radius.

Covers VERDICT.md round-1 gap #3: IntegralTransform / GeometricEmbedding /
MAGNOEncoder+Decoder / full GAOT3D (reference src/model/gaot_3d.py:248-332,
src/model/layers/magno.py:377-798), plus one optimizer-step trajectory.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_stubs import install_reference_stubs

install_reference_stubs()

import src.model.layers.integral_transform as ref_it  # noqa: E402
import src.model.layers.geoembed as ref_ge  # noqa: E402
import src.model.layers.magno as ref_magno  # noqa: E402
import src.model.layers.attn as ref_attn  # noqa: E402
import src.model.gaot_3d as ref_gaot  # noqa: E402
from reference_stubs import Batch as RefBatch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gaot3d_tpu.models import init_model  # noqa: E402
from gaot3d_tpu.models.geoembed import GeometricEmbedding  # noqa: E402
from gaot3d_tpu.models.integral_transform import IntegralTransform  # noqa: E402
from gaot3d_tpu.models.magno import MAGNOConfig, MAGNODecoder, MAGNOEncoder  # noqa: E402
from gaot3d_tpu.models.transformer import (  # noqa: E402
    AttentionConfig,
    FFNConfig,
    TransformerConfig,
)
from gaot3d_tpu.ops.grid_graph import EdgeSlots, LatentGrid, build_edge_slots  # noqa: E402

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


# the reference->flax weight mapping is LIBRARY code (the user-facing
# checkpoint importer, gaot3d_tpu/torch_import.py); these parity tests are
# its behavioral validation against the actual torch reference
from gaot3d_tpu.torch_import import (  # noqa: E402
    _mlp_weight,
    block_params,
    dense,
    gaot_params_from_ref as _lib_gaot_params_from_ref,
    geo_params,
    it_params,
    processor_params,
    t2j,
    torchlinear,
)


def slots_to_edge_index(slots: EdgeSlots, direction: str) -> "torch.Tensor":
    """[N,K] slots -> reference edge_index [2,E].
    encoder: rows (phys_src, latent_query); decoder: (latent_src, phys_query)."""
    lat = np.asarray(slots.lat_idx)
    msk = np.asarray(slots.mask)
    pt, k = np.nonzero(msk)
    lat_sel = lat[pt, k]
    if direction == "encoder":
        ei = np.stack([pt, lat_sel])
    else:
        ei = np.stack([lat_sel, pt])
    return torch.as_tensor(ei, dtype=torch.long)


def make_cloud(n=400, seed=0, cin=2):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, cin)).astype(np.float32)
    return pos, feats


GRID = LatentGrid(dims=(4, 4, 4))
RADIUS = 0.4


def build_slots(pos, strategy="bidirectional", k=1, radius=RADIUS):
    return build_edge_slots(
        jnp.asarray(pos), GRID, radius, k_neighbors=k, strategy=strategy
    )


# ---------------------------------------------------------------------------
# IntegralTransform
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("transform_type", ["linear", "nonlinear", "nonlinear_kernelonly"])
@pytest.mark.parametrize("attn", [None, "cosine", "dot_product"])
def test_integral_transform_parity(transform_type, attn):
    C = 8
    pos, _ = make_cloud(300, seed=1)
    feats = np.random.default_rng(2).normal(size=(300, C)).astype(np.float32)
    slots = build_slots(pos)
    M = GRID.num_tokens

    layers = [6 + (C if transform_type != "linear" else 0), 16, C]
    ref = ref_it.IntegralTransform(
        channel_mlp_layers=layers,
        transform_type=transform_type,
        use_attn=attn is not None,
        coord_dim=3,
        attention_type=attn or "cosine",
    ).eval()
    sd = ref.state_dict()

    ours = IntegralTransform(
        channel_mlp_layers=tuple(layers),
        transform_type=transform_type,
        use_attn=attn is not None,
        coord_dim=3,
        attention_type=attn or "cosine",
        grid=GRID,
    )
    params = {"params": {}}
    for i in range(len(layers) - 1):
        params["params"][f"kernel_w{i}"] = _mlp_weight(sd, f"channel_mlp.fcs.{i}")
        params["params"][f"kernel_b{i}"] = t2j(sd[f"channel_mlp.fcs.{i}.bias"])
    if attn == "dot_product":
        params["params"]["q_w"] = _mlp_weight(sd, "query_proj")
        params["params"]["q_b"] = t2j(sd["query_proj.bias"])
        params["params"]["k_w"] = _mlp_weight(sd, "key_proj")
        params["params"]["k_b"] = t2j(sd["key_proj.bias"])

    lat_pos_t = torch.as_tensor(np.asarray(GRID.positions()))
    pos_t = torch.as_tensor(pos)
    feats_t = torch.as_tensor(feats)

    # encoder direction: source = points, query = latent
    ei = slots_to_edge_index(slots, "encoder")
    with torch.no_grad():
        ref_out = ref(y_pos=pos_t, x_pos=lat_pos_t, edge_index=ei, f_y=feats_t)
    our_out = ours.apply(
        params,
        EdgeSlots(slots.lat_idx[None], slots.mask[None]),
        jnp.asarray(pos)[None],
        GRID.positions(),
        jnp.asarray(feats)[None],
        "encoder",
    )[0]
    np.testing.assert_allclose(
        np.asarray(our_out), ref_out.numpy(), rtol=2e-4, atol=2e-5
    )

    # decoder direction: source = latent, query = points
    lat_feats = np.random.default_rng(3).normal(size=(M, C)).astype(np.float32)
    ei_d = slots_to_edge_index(slots, "decoder")
    with torch.no_grad():
        ref_out_d = ref(
            y_pos=lat_pos_t, x_pos=pos_t, edge_index=ei_d,
            f_y=torch.as_tensor(lat_feats),
        )
    our_out_d = ours.apply(
        params,
        EdgeSlots(slots.lat_idx[None], slots.mask[None]),
        jnp.asarray(pos)[None],
        GRID.positions(),
        jnp.asarray(lat_feats)[None],
        "decoder",
    )[0]
    np.testing.assert_allclose(
        np.asarray(our_out_d), ref_out_d.numpy(), rtol=2e-4, atol=2e-5
    )


# ---------------------------------------------------------------------------
# GeometricEmbedding
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("method,pooling", [
    ("statistical", "max"), ("pointnet", "max"), ("pointnet", "mean"),
])
def test_geoembed_parity(method, pooling):
    C = 8
    pos, _ = make_cloud(300, seed=4)
    slots = build_slots(pos)

    ref = ref_ge.GeometricEmbedding(
        input_dim=3, output_dim=C, method=method, pooling=pooling
    ).eval()
    sd = ref.state_dict()
    ours = GeometricEmbedding(
        input_dim=3, output_dim=C, method=method, pooling=pooling, grid=GRID
    )
    params = {"params": geo_params_fix(sd, method)}

    lat_pos_t = torch.as_tensor(np.asarray(GRID.positions()))
    pos_t = torch.as_tensor(pos)

    # encoder direction (queries = latent)
    ei = slots_to_edge_index(slots, "encoder")
    with torch.no_grad():
        ref_out = ref(source_pos=pos_t, query_pos=lat_pos_t, edge_index=ei)
    our_out = ours.apply(
        params,
        EdgeSlots(slots.lat_idx[None], slots.mask[None]),
        jnp.asarray(pos)[None],
        GRID.positions(),
        direction="encoder",
    )[0]
    # atol headroom: one element lands at 8e-5 abs / 2e-3 rel under the full
    # suite (torch intra-op threading changes reduction order vs isolation) —
    # f32 noise through the batch-global z-norm + eigvals, not a parity break
    np.testing.assert_allclose(
        np.asarray(our_out), ref_out.numpy(), rtol=5e-4, atol=2e-4
    )

    # decoder direction (queries = the points)
    ei_d = slots_to_edge_index(slots, "decoder")
    with torch.no_grad():
        ref_out_d = ref(source_pos=lat_pos_t, query_pos=pos_t, edge_index=ei_d)
    our_out_d = ours.apply(
        params,
        EdgeSlots(slots.lat_idx[None], slots.mask[None]),
        jnp.asarray(pos)[None],
        GRID.positions(),
        direction="decoder",
        query_mask=jnp.ones((1, pos.shape[0]), bool),
    )[0]
    np.testing.assert_allclose(
        np.asarray(our_out_d), ref_out_d.numpy(), rtol=5e-4, atol=5e-5
    )


def geo_params_fix(sd, method):
    if method == "statistical":
        return {
            "mlp_w0": _mlp_weight(sd, "mlp.0"),
            "mlp_b0": t2j(sd["mlp.0.bias"]),
            "mlp_w1": _mlp_weight(sd, "mlp.2"),
            "mlp_b1": t2j(sd["mlp.2.bias"]),
        }
    return {
        "pn_w0": _mlp_weight(sd, "pointnet_mlp.0"),
        "pn_b0": t2j(sd["pointnet_mlp.0.bias"]),
        "pn_w1": _mlp_weight(sd, "pointnet_mlp.2"),
        "pn_b1": t2j(sd["pointnet_mlp.2.bias"]),
        "fc_w": _mlp_weight(sd, "fc.0"),
        "fc_b": t2j(sd["fc.0.bias"]),
    }


# ---------------------------------------------------------------------------
# full GAOT3D
# ---------------------------------------------------------------------------


def make_ref_configs(pos_emb="rope", use_geoembed=True, scales=(1.0,),
                     use_scale_weights=False, transform="linear",
                     use_attn=False, attention_type="cosine"):
    magno = ref_magno.MAGNOConfig(
        lifting_channels=8,
        gno_coord_dim=3,
        gno_radius=RADIUS,
        neighbor_strategy="bidirectional",
        use_geoembed=use_geoembed,
        in_gno_channel_mlp_hidden_layers=[16, 16],
        out_gno_channel_mlp_hidden_layers=[16],
        in_gno_transform_type=transform,
        out_gno_transform_type=transform,
        projection_channels=16,
        mlp_type="linear",
        scales=list(scales),
        use_scale_weights=use_scale_weights,
        use_attn=use_attn,
        attention_type=attention_type,
        precompute_edges=True,
    )
    attn = ref_attn.TransformerConfig(
        patch_size=2,
        hidden_size=16,
        num_layers=3,
        positional_embedding=pos_emb,
        attn_config=ref_attn.AttentionConfig(
            hidden_size=16, num_heads=2, num_kv_heads=2, atten_dropout=0.0,
            positional_embedding=pos_emb,
        ),
        ffn_config=ref_attn.FFNConfig(hidden_size=32),
    )
    return magno, attn


def make_our_configs(pos_emb="rope", use_geoembed=True, scales=(1.0,),
                     use_scale_weights=False, transform="linear",
                     use_attn=False, attention_type="cosine"):
    magno = MAGNOConfig(
        lifting_channels=8,
        gno_coord_dim=3,
        gno_radius=RADIUS,
        neighbor_strategy="bidirectional",
        use_geoembed=use_geoembed,
        in_gno_channel_mlp_hidden_layers=[16, 16],
        out_gno_channel_mlp_hidden_layers=[16],
        in_gno_transform_type=transform,
        out_gno_transform_type=transform,
        projection_channels=16,
        scales=list(scales),
        use_scale_weights=use_scale_weights,
        use_attn=use_attn,
        attention_type=attention_type,
        fused_encoder=False,  # modular path mirrors the reference 1:1;
        # fused==modular is asserted separately in test_models.py
        fused_decoder=False,
    )
    attn = TransformerConfig(
        patch_size=2,
        hidden_size=16,
        num_layers=3,
        positional_embedding=pos_emb,
        attn_config=AttentionConfig(
            hidden_size=16, num_heads=2, num_kv_heads=2, atten_dropout=0.0,
            attention_dtype="float32", attention_impl="naive",
        ),
        ffn_config=FFNConfig(hidden_size=32),
    )
    return magno, attn


# gaot_params_from_ref comes from the library (imported above)
gaot_params_from_ref = _lib_gaot_params_from_ref

def run_both_full_models(pos_emb, use_geoembed=True, scales=(1.0,),
                         use_scale_weights=False, transform="linear",
                         use_attn=False, attention_type="cosine",
                         n=400, seed=7):
    cin, cout = 2, 1
    pos, feats = make_cloud(n, seed=seed, cin=cin)
    r_magno, r_attn = make_ref_configs(pos_emb, use_geoembed, scales,
                                       use_scale_weights, transform,
                                       use_attn, attention_type)
    ref = ref_gaot.GAOT3D(cin, cout, r_magno, r_attn, latent_tokens=(4, 4, 4)).eval()
    sd = ref.state_dict()

    o_magno, o_attn = make_our_configs(pos_emb, use_geoembed, scales,
                                       use_scale_weights, transform,
                                       use_attn, attention_type)
    ours = init_model(cin, cout, "gaot_3d", o_magno, o_attn, latent_tokens=(4, 4, 4))
    n_enc_fcs = len(r_magno.in_gno_channel_mlp_hidden_layers) + 1
    n_dec_fcs = len(r_magno.out_gno_channel_mlp_hidden_layers) + 1
    params = gaot_params_from_ref(
        sd, 3, use_geoembed, use_scale_weights=use_scale_weights,
        dot_attn=use_attn and attention_type == "dot_product",
        n_enc_fcs=n_enc_fcs, n_dec_fcs=n_dec_fcs,
    )

    # same edge sets on both sides, per scale
    batch_kw = dict(
        pos=torch.as_tensor(pos), x=torch.as_tensor(feats),
        batch=torch.zeros(n, dtype=torch.long), num_graphs=1,
    )
    enc_slots, dec_slots = [], []
    for si, s in enumerate(scales):
        slots = build_slots(pos, radius=RADIUS * s)
        enc_slots.append(EdgeSlots(slots.lat_idx[None], slots.mask[None]))
        dec_slots.append(EdgeSlots(slots.lat_idx[None], slots.mask[None]))
        batch_kw[f"encoder_edge_index_s{si}"] = slots_to_edge_index(slots, "encoder")
        batch_kw[f"decoder_edge_index_s{si}"] = slots_to_edge_index(slots, "decoder")
    batch = RefBatch(**batch_kw)

    with torch.no_grad():
        ref_out = ref(batch)  # [N, cout]

    our_out = ours.apply(
        params,
        jnp.asarray(pos)[None],
        jnp.asarray(feats)[None],
        jnp.ones((1, n), bool),
        encoder_slots=enc_slots,
        decoder_slots=dec_slots,
    )[0]
    return np.asarray(our_out), ref_out.numpy(), params, ours, (pos, feats, enc_slots, dec_slots)


@pytest.mark.parametrize("pos_emb", ["rope", "absolute"])
def test_full_gaot3d_parity(pos_emb):
    ours, ref, *_ = run_both_full_models(pos_emb)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_full_gaot3d_parity_multiscale_scaleweights():
    ours, ref, *_ = run_both_full_models(
        "absolute", scales=(0.75, 1.0), use_scale_weights=True
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_full_gaot3d_parity_nonlinear_attn():
    # nonlinear kernel type requires in_channels == lifting_channels in the
    # reference (its kernel sizing quirk, magno.py:403-405 vs 546-551)
    cin = 8
    pos, feats = make_cloud(400, seed=9, cin=cin)
    r_magno, r_attn = make_ref_configs(
        "absolute", transform="nonlinear", use_attn=True, attention_type="dot_product"
    )
    ref = ref_gaot.GAOT3D(cin, 1, r_magno, r_attn, latent_tokens=(4, 4, 4)).eval()
    sd = ref.state_dict()
    o_magno, o_attn = make_our_configs(
        "absolute", transform="nonlinear", use_attn=True, attention_type="dot_product"
    )
    ours = init_model(cin, 1, "gaot_3d", o_magno, o_attn, latent_tokens=(4, 4, 4))
    params = gaot_params_from_ref(sd, 3, dot_attn=True)

    n = pos.shape[0]
    slots = build_slots(pos)
    batch = RefBatch(
        pos=torch.as_tensor(pos), x=torch.as_tensor(feats),
        batch=torch.zeros(n, dtype=torch.long), num_graphs=1,
        encoder_edge_index_s0=slots_to_edge_index(slots, "encoder"),
        decoder_edge_index_s0=slots_to_edge_index(slots, "decoder"),
    )
    with torch.no_grad():
        ref_out = ref(batch)
    our_out = ours.apply(
        params, jnp.asarray(pos)[None], jnp.asarray(feats)[None],
        jnp.ones((1, n), bool),
        encoder_slots=[EdgeSlots(slots.lat_idx[None], slots.mask[None])],
        decoder_slots=[EdgeSlots(slots.lat_idx[None], slots.mask[None])],
    )[0]
    np.testing.assert_allclose(np.asarray(our_out), ref_out.numpy(), rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# graph-build parity: the reference builds its OWN edges (brute-force pyg
# stand-ins) and they must equal our stencil builder's edge sets
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("strategy", ["knn", "radius", "bidirectional", "reverse"])
def test_edge_build_matches_reference(strategy):
    pos, _ = make_cloud(300, seed=11)
    pos_t = torch.as_tensor(pos)
    lat_t = torch.as_tensor(np.asarray(GRID.positions()))
    bp = torch.zeros(pos.shape[0], dtype=torch.long)
    bl = torch.zeros(lat_t.shape[0], dtype=torch.long)

    if strategy != "reverse":
        ref_enc = ref_magno.get_neighbor_strategy(
            strategy, pos_t, bp, lat_t, bl, RADIUS, k_neighbors=1, is_decoder=False
        )
        ours_enc = build_slots(pos, strategy=strategy)
        got = set(map(tuple, slots_to_edge_index(ours_enc, "encoder").T.tolist()))
        want = set(map(tuple, ref_enc.T.tolist()))
        assert got == want, f"encoder {strategy}: {len(got ^ want)} differing edges"

    ref_dec = ref_magno.get_neighbor_strategy(
        strategy, pos_t, bp, lat_t, bl, RADIUS, k_neighbors=1, is_decoder=True
    )
    ours_dec = build_slots(pos, strategy=strategy)
    got = set(map(tuple, slots_to_edge_index(ours_dec, "decoder").T.tolist()))
    want = set(map(tuple, ref_dec.T.tolist()))
    assert got == want, f"decoder {strategy}: {len(got ^ want)} differing edges"


# ---------------------------------------------------------------------------
# one-optimizer-step trajectory parity (AdamW)
# ---------------------------------------------------------------------------


def test_adamw_step_trajectory_parity():
    import optax

    pos, feats = make_cloud(300, seed=13, cin=2)
    n = pos.shape[0]
    rng = np.random.default_rng(14)
    target = rng.normal(size=(n, 1)).astype(np.float32)

    # --- torch side ---
    torch.manual_seed(0)
    r_magno, r_attn = make_ref_configs("absolute")
    tm = ref_gaot.GAOT3D(2, 1, r_magno, r_attn, latent_tokens=(4, 4, 4))
    slots = build_slots(pos)
    batch = RefBatch(
        pos=torch.as_tensor(pos), x=torch.as_tensor(feats),
        batch=torch.zeros(n, dtype=torch.long), num_graphs=1,
        encoder_edge_index_s0=slots_to_edge_index(slots, "encoder"),
        decoder_edge_index_s0=slots_to_edge_index(slots, "decoder"),
    )
    tm.train()
    opt = torch.optim.AdamW(tm.parameters(), lr=1e-3, weight_decay=1e-4,
                            betas=(0.9, 0.999), eps=1e-8)
    pred = tm(batch)
    loss_t = torch.nn.functional.mse_loss(pred, torch.as_tensor(target))
    # snapshot pre-step weights for the jax side BEFORE stepping
    jparams = gaot_params_from_ref(
        {k: v.clone() for k, v in tm.state_dict().items()}, 3
    )
    opt.zero_grad()
    loss_t.backward()
    opt.step()

    # --- jax side with the SAME init (copied from the torch model) ---
    o_magno, o_attn = make_our_configs("absolute")
    jmodel = init_model(2, 1, "gaot_3d", o_magno, o_attn, latent_tokens=(4, 4, 4))
    tx = optax.adamw(1e-3, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-4)
    opt_state = tx.init(jparams)

    def loss_fn(p):
        pred = jmodel.apply(
            p, jnp.asarray(pos)[None], jnp.asarray(feats)[None],
            jnp.ones((1, n), bool),
            encoder_slots=[EdgeSlots(slots.lat_idx[None], slots.mask[None])],
            decoder_slots=[EdgeSlots(slots.lat_idx[None], slots.mask[None])],
        )[0]
        return jnp.mean((pred - jnp.asarray(target)) ** 2)

    loss_j, grads = jax.value_and_grad(loss_fn)(jparams)
    updates, _ = tx.update(grads, opt_state, jparams)
    jparams_new = optax.apply_updates(jparams, updates)

    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4)

    # compare a representative set of post-step weights
    sd_new = tm.state_dict()
    checks = [
        ("patch_linear.weight", ("patch_linear", "Dense_0", "kernel"), True),
        ("encoder.lifting.fcs.0.weight", ("encoder", "TorchLinear_0", "Dense_0", "kernel"), True),
        ("decoder.projection.fcs.1.weight", ("decoder", "TorchLinear_2", "Dense_0", "kernel"), True),
        ("processor.encoder_layers.0.attn.q_proj.weight",
         ("processor", "TransformerBlock_0", "GroupQueryAttention_0", "TorchLinear_0", "Dense_0", "kernel"), True),
    ]
    for tname, jpath, transpose in checks:
        tw = sd_new[tname].detach().numpy()
        if tw.ndim == 3:
            tw = tw.squeeze(-1)
        jw = jparams_new["params"]
        for kpart in jpath:
            jw = jw[kpart]
        jw = np.asarray(jw).T if transpose else np.asarray(jw)
        np.testing.assert_allclose(jw, tw, rtol=5e-3, atol=1e-5)


def test_adamw_20step_mix_schedule_trajectory_parity():
    """20 AdamW steps with the reference's 3-phase 'mix' LR schedule active
    (CustomLRScheduler, reference optimizers.py:40-67, AdamW 90% cosine
    phase 227-229), OUR side running the fused encoder+decoder fast paths —
    the closest available proxy for the 1%-MSE north star without the
    dataset (round-2 VERDICT item 8). Loss curves must agree within f32
    drift over the whole trajectory."""
    import optax

    import src.trainer.optimizers as ref_opt
    from gaot3d_tpu.train.schedule import mix_phase_lengths

    pos, feats = make_cloud(300, seed=23, cin=2)
    n = pos.shape[0]
    rng = np.random.default_rng(24)
    target = rng.normal(size=(n, 1)).astype(np.float32)
    epochs, lr0, max_lr, min_lr, final_lr = 20, 1e-3, 1e-2, 1e-5, 1e-5

    # --- torch side: AdamW + CustomLRScheduler stepped per epoch ---------
    torch.manual_seed(5)
    r_magno, r_attn = make_ref_configs("absolute")
    tm = ref_gaot.GAOT3D(2, 1, r_magno, r_attn, latent_tokens=(4, 4, 4))
    slots = build_slots(pos)
    batch = RefBatch(
        pos=torch.as_tensor(pos), x=torch.as_tensor(feats),
        batch=torch.zeros(n, dtype=torch.long), num_graphs=1,
        encoder_edge_index_s0=slots_to_edge_index(slots, "encoder"),
        decoder_edge_index_s0=slots_to_edge_index(slots, "decoder"),
    )
    tm.train()
    jparams = gaot_params_from_ref(
        {k: v.clone() for k, v in tm.state_dict().items()}, 3
    )
    opt = torch.optim.AdamW(tm.parameters(), lr=lr0, weight_decay=1e-4,
                            betas=(0.9, 0.999), eps=1e-8)
    warm, cos_e, exp_e = mix_phase_lengths(epochs, 0.90)  # AdamW: 90% cosine
    sched = ref_opt.CustomLRScheduler(
        opt, epochs, warm, cos_e, exp_e, lr0, max_lr, min_lr, final_lr
    )
    t_losses, t_lrs = [], []
    tgt_t = torch.as_tensor(target)
    for _ in range(epochs):
        opt.zero_grad()
        loss = torch.nn.functional.mse_loss(tm(batch), tgt_t)
        loss.backward()
        t_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
        t_losses.append(float(loss.detach()))

    # --- jax side: same init, fused encoder+decoder, make_optimizer ------
    from gaot3d_tpu.train.schedule import OptimizerargsConfig, make_optimizer

    o_magno, o_attn = make_our_configs("absolute")
    o_magno.fused_encoder = True
    o_magno.fused_decoder = True
    jmodel = init_model(2, 1, "gaot_3d", o_magno, o_attn, latent_tokens=(4, 4, 4))

    # torch transfer produced MODULAR param names; the fused fast paths own
    # their params under FusedEncoderScale_0/FusedDecoderScale_0 (kernel_* /
    # geo_*) — remap (inverse of test_models.test_fused_*_matches_modular)
    import flax.traverse_util as tu

    flat = tu.flatten_dict(jparams["params"])
    remapped = {}
    for k, v in flat.items():
        ks = list(k)
        if "encoder" in ks and "IntegralTransform_0" in ks and ks[-1].startswith("kernel_"):
            k = tuple(p.replace("IntegralTransform_0", "FusedEncoderScale_0") for p in ks)
        elif "encoder" in ks and "GeometricEmbedding_0" in ks and ks[-1].startswith("mlp_"):
            k = tuple(p.replace("GeometricEmbedding_0", "FusedEncoderScale_0")
                      .replace("mlp_", "geo_") for p in ks)
        elif "decoder" in ks and "IntegralTransform_0" in ks and ks[-1].startswith("kernel_"):
            k = tuple(p.replace("IntegralTransform_0", "FusedDecoderScale_0") for p in ks)
        elif "decoder" in ks and "GeometricEmbedding_0" in ks and ks[-1].startswith("mlp_"):
            k = tuple(p.replace("GeometricEmbedding_0", "FusedDecoderScale_0")
                      .replace("mlp_", "geo_") for p in ks)
        remapped[tuple(k)] = v
    jparams = {"params": tu.unflatten_dict(remapped)}

    cfg = OptimizerargsConfig(lr=lr0, weight_decay=1e-4, epoch=epochs,
                              scheduler="mix", max_lr=max_lr, min_lr=min_lr,
                              final_lr=final_lr)
    tx = make_optimizer("adamw", cfg, steps_per_epoch=1)
    opt_state = tx.init(jparams)

    eslots = [EdgeSlots(slots.lat_idx[None], slots.mask[None])]

    def loss_fn(p):
        pred = jmodel.apply(
            p, jnp.asarray(pos)[None], jnp.asarray(feats)[None],
            jnp.ones((1, n), bool), encoder_slots=eslots, decoder_slots=eslots,
        )[0]
        return jnp.mean((pred - jnp.asarray(target)) ** 2)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    j_losses, j_lrs = [], []
    for _ in range(epochs):
        j_lrs.append(float(opt_state.hyperparams["learning_rate"]))
        jparams, opt_state, loss_j = step(jparams, opt_state)
        j_losses.append(float(loss_j))

    # the schedule itself must match exactly (same piecewise formula).
    # inject_hyperparams stores the lr USED by the last update, i.e. j_lrs
    # read after step k holds the lr of step k — compare against the lr
    # torch recorded before its step k (one-slot shift).
    np.testing.assert_allclose(j_lrs[1:], t_lrs[:-1], rtol=1e-6)
    # loss curves agree within f32 drift (measured max rel err ~1e-3 at
    # step 20; bound 5e-3 leaves headroom for BLAS/XLA reduction order)
    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-3)
    # and training actually progressed
    assert j_losses[-1] < j_losses[0]


def test_convergence_head_to_head_learnable_target():
    """END-STATE accuracy comparison: both frameworks train the same tiny
    GAOT-3D from the same torch init on the same LEARNABLE target (a smooth
    function of the coordinates) with the reference recipe (AdamW + 'mix'
    schedule, reference optimizers.py:40-67,227-229) for 300 epochs. Unlike
    the 20-step trajectory test above (pointwise f32-drift bound — which MUST
    loosen as trajectories decorrelate), this asserts what the README's
    leaderboard measures (BASELINE.md): the converged loss. Both sides must
    cut the initial MSE by >20x and land within 1.6x of each other — the
    closest executable analogue of the 1%-MSE north star without the
    DrivAerNet dataset. OUR side runs the flagship fast paths (fused
    encoder+decoder), so this also pins that the fused paths don't degrade
    optimization, not just the forward."""
    import optax

    import src.trainer.optimizers as ref_opt
    from gaot3d_tpu.train.schedule import mix_phase_lengths

    n = 300
    rng = np.random.default_rng(31)
    pos = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    # informative features + a smooth coordinate-dependent target: the model
    # can actually fit this (a pure-noise target only measures the mean)
    feats = np.stack([np.sin(np.pi * pos[:, 0]), pos[:, 1] * pos[:, 2]], 1)
    feats = feats.astype(np.float32)
    target = (
        np.sin(2 * np.pi * pos[:, :1]) * np.cos(np.pi * pos[:, 1:2])
        + 0.5 * pos[:, 2:3] ** 2
        + 0.3 * feats[:, :1]
    ).astype(np.float32)
    epochs, lr0, max_lr, min_lr, final_lr = 300, 1e-3, 1e-2, 1e-5, 1e-5

    # --- torch side -------------------------------------------------------
    torch.manual_seed(7)
    r_magno, r_attn = make_ref_configs("absolute")
    tm = ref_gaot.GAOT3D(2, 1, r_magno, r_attn, latent_tokens=(4, 4, 4))
    slots = build_slots(pos)
    batch = RefBatch(
        pos=torch.as_tensor(pos), x=torch.as_tensor(feats),
        batch=torch.zeros(n, dtype=torch.long), num_graphs=1,
        encoder_edge_index_s0=slots_to_edge_index(slots, "encoder"),
        decoder_edge_index_s0=slots_to_edge_index(slots, "decoder"),
    )
    tm.train()
    jparams = gaot_params_from_ref(
        {k: v.clone() for k, v in tm.state_dict().items()}, 3
    )
    opt = torch.optim.AdamW(tm.parameters(), lr=lr0, weight_decay=1e-4,
                            betas=(0.9, 0.999), eps=1e-8)
    warm, cos_e, exp_e = mix_phase_lengths(epochs, 0.90)
    sched = ref_opt.CustomLRScheduler(
        opt, epochs, warm, cos_e, exp_e, lr0, max_lr, min_lr, final_lr
    )
    tgt_t = torch.as_tensor(target)
    t_init = float(torch.nn.functional.mse_loss(tm(batch), tgt_t).detach())
    for _ in range(epochs):
        opt.zero_grad()
        loss = torch.nn.functional.mse_loss(tm(batch), tgt_t)
        loss.backward()
        opt.step()
        sched.step()
    tm.eval()
    with torch.no_grad():
        t_final = float(torch.nn.functional.mse_loss(tm(batch), tgt_t))

    # --- jax side: same init, fused fast paths ----------------------------
    from gaot3d_tpu.train.schedule import OptimizerargsConfig, make_optimizer

    o_magno, o_attn = make_our_configs("absolute")
    o_magno.fused_encoder = True
    o_magno.fused_decoder = True
    jmodel = init_model(2, 1, "gaot_3d", o_magno, o_attn, latent_tokens=(4, 4, 4))

    import flax.traverse_util as tu

    flat = tu.flatten_dict(jparams["params"])
    remapped = {}
    for k, v in flat.items():
        ks = list(k)
        if "encoder" in ks and "IntegralTransform_0" in ks and ks[-1].startswith("kernel_"):
            k = tuple(p.replace("IntegralTransform_0", "FusedEncoderScale_0") for p in ks)
        elif "encoder" in ks and "GeometricEmbedding_0" in ks and ks[-1].startswith("mlp_"):
            k = tuple(p.replace("GeometricEmbedding_0", "FusedEncoderScale_0")
                      .replace("mlp_", "geo_") for p in ks)
        elif "decoder" in ks and "IntegralTransform_0" in ks and ks[-1].startswith("kernel_"):
            k = tuple(p.replace("IntegralTransform_0", "FusedDecoderScale_0") for p in ks)
        elif "decoder" in ks and "GeometricEmbedding_0" in ks and ks[-1].startswith("mlp_"):
            k = tuple(p.replace("GeometricEmbedding_0", "FusedDecoderScale_0")
                      .replace("mlp_", "geo_") for p in ks)
        remapped[tuple(k)] = v
    jparams = {"params": tu.unflatten_dict(remapped)}

    cfg = OptimizerargsConfig(lr=lr0, weight_decay=1e-4, epoch=epochs,
                              scheduler="mix", max_lr=max_lr, min_lr=min_lr,
                              final_lr=final_lr)
    tx = make_optimizer("adamw", cfg, steps_per_epoch=1)
    opt_state = tx.init(jparams)

    eslots = [EdgeSlots(slots.lat_idx[None], slots.mask[None])]

    def loss_fn(p):
        pred = jmodel.apply(
            p, jnp.asarray(pos)[None], jnp.asarray(feats)[None],
            jnp.ones((1, n), bool), encoder_slots=eslots, decoder_slots=eslots,
        )[0]
        return jnp.mean((pred - jnp.asarray(target)) ** 2)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    j_init = float(loss_fn(jparams))
    for _ in range(epochs):
        jparams, opt_state, _ = step(jparams, opt_state)
    j_final = float(loss_fn(jparams))

    # same starting point (sanity: the transfer worked)
    np.testing.assert_allclose(j_init, t_init, rtol=1e-4)
    # both frameworks actually fit the target
    assert t_final < t_init / 20, f"torch did not converge: {t_init} -> {t_final}"
    assert j_final < j_init / 20, f"jax did not converge: {j_init} -> {j_final}"
    # and land at the same quality (f32 trajectories decorrelate, so the
    # end-state bound is a ratio, not pointwise: measured j/t ~= 1.0)
    ratio = j_final / t_final
    print(f"convergence head-to-head: torch {t_init:.4f}->{t_final:.3e}, "
          f"jax {j_init:.4f}->{j_final:.3e}, ratio {ratio:.3f}")
    assert 1 / 1.6 < ratio < 1.6, (
        f"converged losses diverge: jax {j_final:.3e} vs torch {t_final:.3e} "
        f"(ratio {ratio:.2f})"
    )


def test_checkpoint_import_tool(tmp_path):
    """End-to-end checkpoint migration: a reference-style `{name:
    state_dict}` torch save converts via tools/import_torch_ckpt's machinery
    (params_from_torch_state_dict + msgpack) into a file the trainer's
    params loader consumes, and the imported model reproduces the reference
    forward — including the fused-path renames the high-level entry applies
    from the config's own gating."""
    import os
    import sys

    from flax import serialization

    from gaot3d_tpu.torch_import import params_from_torch_state_dict
    from gaot3d_tpu.train.checkpoint import load_params_only

    cin, cout, n = 2, 1, 300
    pos, feats = make_cloud(n, seed=11, cin=cin)
    r_magno, r_attn = make_ref_configs("absolute")
    ref = ref_gaot.GAOT3D(cin, cout, r_magno, r_attn, latent_tokens=(4, 4, 4)).eval()
    pt_path = os.path.join(tmp_path, "ref.pt")
    torch.save({"model": ref.state_dict()}, pt_path)  # reference setup.py:18-42

    # target config: FUSED paths on (the import applies the renames itself)
    o_magno, o_attn = make_our_configs("absolute")
    o_magno.fused_encoder = True
    o_magno.fused_decoder = True
    ours = init_model(cin, cout, "gaot_3d", o_magno, o_attn, latent_tokens=(4, 4, 4))

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"))
    from import_torch_ckpt import extract_state_dict

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=True)
    params = params_from_torch_state_dict(extract_state_dict(ckpt), o_magno, o_attn)
    out_path = os.path.join(tmp_path, "imported.msgpack")
    host = jax.tree.map(np.asarray, params)
    # framework ckpt layout: {"params": <full variables dict>} (the trainer's
    # TrainState.params IS the variables dict)
    with open(out_path, "wb") as f:
        f.write(serialization.msgpack_serialize({"params": host}))

    # the trainer-side loader consumes it against a fresh template
    slots = build_slots(pos)
    eslots = [EdgeSlots(slots.lat_idx[None], slots.mask[None])]
    template = ours.init({"params": jax.random.key(0)}, jnp.asarray(pos)[None],
                         jnp.asarray(feats)[None], jnp.ones((1, n), bool),
                         encoder_slots=eslots, decoder_slots=eslots)
    loaded = load_params_only(out_path, template)

    batch = RefBatch(
        pos=torch.as_tensor(pos), x=torch.as_tensor(feats),
        batch=torch.zeros(n, dtype=torch.long), num_graphs=1,
        encoder_edge_index_s0=slots_to_edge_index(slots, "encoder"),
        decoder_edge_index_s0=slots_to_edge_index(slots, "decoder"),
    )
    with torch.no_grad():
        ref_out = ref(batch)
    our_out = ours.apply(loaded, jnp.asarray(pos)[None], jnp.asarray(feats)[None],
                         jnp.ones((1, n), bool),
                         encoder_slots=eslots, decoder_slots=eslots)[0]
    np.testing.assert_allclose(np.asarray(our_out), ref_out.numpy(),
                               rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# optional-module gating variants: every reference module that may NOT exist
# (Identity projections, disabled norms/skips, no-gno encoder, pointnet
# geoembed) shifts the flax auto-naming — the importer must mirror the
# models' own construction gating (torch_import.py review findings, fixed)
# ---------------------------------------------------------------------------


def _run_import_variant(hidden=None, use_attn_norm=True, use_ffn_norm=True,
                        use_long_range_skip=True, use_gno=True,
                        use_geoembed=True, embedding_method="statistical",
                        mlp_type=None, n=300, seed=13):
    """Build a reference model for a config variant, import its state dict
    via the high-level config-driven entry, and assert forward parity."""
    from gaot3d_tpu.torch_import import params_from_torch_state_dict

    cin, cout = 2, 1
    pos, feats = make_cloud(n, seed=seed, cin=cin)
    r_magno, r_attn = make_ref_configs("absolute", use_geoembed=use_geoembed)
    o_magno, o_attn = make_our_configs("absolute", use_geoembed=use_geoembed)
    for m in (r_magno, o_magno):
        m.use_gno = use_gno
        m.embedding_method = embedding_method
        if mlp_type is not None:
            m.mlp_type = mlp_type
    for a in (r_attn, o_attn):
        if hidden is not None:
            a.hidden_size = hidden
            a.attn_config.hidden_size = hidden
        a.use_attn_norm = use_attn_norm
        a.use_ffn_norm = use_ffn_norm
        a.use_long_range_skip = use_long_range_skip

    ref = ref_gaot.GAOT3D(cin, cout, r_magno, r_attn, latent_tokens=(4, 4, 4)).eval()
    sd = {k: v.clone() for k, v in ref.state_dict().items()}
    ours = init_model(cin, cout, "gaot_3d", o_magno, o_attn, latent_tokens=(4, 4, 4))
    params = params_from_torch_state_dict(sd, o_magno, o_attn)

    slots = build_slots(pos)
    eslots = [EdgeSlots(slots.lat_idx[None], slots.mask[None])]
    batch = RefBatch(
        pos=torch.as_tensor(pos), x=torch.as_tensor(feats),
        batch=torch.zeros(n, dtype=torch.long), num_graphs=1,
        encoder_edge_index_s0=slots_to_edge_index(slots, "encoder"),
        decoder_edge_index_s0=slots_to_edge_index(slots, "decoder"),
    )
    with torch.no_grad():
        ref_out = ref(batch)
    our_out = ours.apply(params, jnp.asarray(pos)[None], jnp.asarray(feats)[None],
                         jnp.ones((1, n), bool),
                         encoder_slots=eslots, decoder_slots=eslots)[0]
    np.testing.assert_allclose(np.asarray(our_out), ref_out.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_import_identity_projections():
    # the FLAGSHIP shape class: processor input = patch 2^3 x lifting 8 = 64;
    # hidden 64 makes the reference's input_proj/output_proj nn.Identity
    # (attn.py:257-265) so the state dict has no keys for them
    _run_import_variant(hidden=64)


def test_import_no_norms_no_skip():
    # disabled norms shift RMSNorm numbering; with skips off the reference
    # still CREATES skip_proj (dead params) that must not be mapped
    _run_import_variant(use_attn_norm=False, use_long_range_skip=False)


def test_import_no_gno_encoder():
    # geoembed-only encoder: no lifting/gno keys, and the reference's dead
    # encoder.recovery params (created but never applied) must be dropped
    _run_import_variant(use_gno=False)


def test_import_pointnet_geoembed():
    # embedding_method must flow through to the geoembed key layout
    _run_import_variant(embedding_method="pointnet")


# ---------------------------------------------------------------------------
# reverse direction: EXPORT our params to a reference state dict
# (gaot3d_tpu/torch_export.py) and assert the torch reference reproduces our
# forward — bidirectional checkpoint migration
# ---------------------------------------------------------------------------


def _run_export_variant(hidden=None, fused=False, use_scale_weights=False,
                        scales=(1.0,), mlp_type="linear", n=300, seed=23):
    from gaot3d_tpu.torch_export import state_dict_from_params

    cin, cout = 2, 1
    pos, feats = make_cloud(n, seed=seed, cin=cin)
    r_magno, r_attn = make_ref_configs("absolute", scales=scales,
                                       use_scale_weights=use_scale_weights)
    o_magno, o_attn = make_our_configs("absolute", scales=scales,
                                       use_scale_weights=use_scale_weights)
    # export emits the torch layout magno_cfg.mlp_type selects (the reference
    # helper default builds LinearChannelMLP modules)
    o_magno.mlp_type = mlp_type
    r_magno.mlp_type = mlp_type
    if fused:
        o_magno.fused_encoder = True
        o_magno.fused_decoder = True
    for a in (r_attn, o_attn):
        if hidden is not None:
            a.hidden_size = hidden
            a.attn_config.hidden_size = hidden

    ours = init_model(cin, cout, "gaot_3d", o_magno, o_attn, latent_tokens=(4, 4, 4))
    batch_kw = dict(
        pos=torch.as_tensor(pos), x=torch.as_tensor(feats),
        batch=torch.zeros(n, dtype=torch.long), num_graphs=1,
    )
    eslots = []
    for si, s in enumerate(scales):
        slots = build_slots(pos, radius=RADIUS * s)
        eslots.append(EdgeSlots(slots.lat_idx[None], slots.mask[None]))
        batch_kw[f"encoder_edge_index_s{si}"] = slots_to_edge_index(slots, "encoder")
        batch_kw[f"decoder_edge_index_s{si}"] = slots_to_edge_index(slots, "decoder")
    params = ours.init({"params": jax.random.key(3)}, jnp.asarray(pos)[None],
                       jnp.asarray(feats)[None], jnp.ones((1, n), bool),
                       encoder_slots=eslots, decoder_slots=eslots)

    sd = state_dict_from_params(params, o_magno, o_attn, latent_tokens=(4, 4, 4))
    ref = ref_gaot.GAOT3D(cin, cout, r_magno, r_attn, latent_tokens=(4, 4, 4)).eval()
    # strict: the flagship-shaped configs produce a COMPLETE reference key set
    ref.load_state_dict({k: torch.as_tensor(np.ascontiguousarray(v))
                         for k, v in sd.items()}, strict=True)

    with torch.no_grad():
        ref_out = ref(RefBatch(**batch_kw))
    our_out = ours.apply(params, jnp.asarray(pos)[None], jnp.asarray(feats)[None],
                         jnp.ones((1, n), bool),
                         encoder_slots=eslots, decoder_slots=eslots)[0]
    np.testing.assert_allclose(np.asarray(our_out), ref_out.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_export_modular():
    _run_export_variant()


def test_export_fused_paths():
    # fused-path param names must be un-renamed before emission
    _run_export_variant(fused=True)


def test_export_identity_projections():
    # hidden == patch^3 x lifting: NO input/output projections exist on either
    # side; the shape-based lone-projection disambiguation must not misfire
    _run_export_variant(hidden=64)


def test_export_scale_weights():
    # multiscale + learned scale weights (outer-Linear-first creation quirk)
    _run_export_variant(use_scale_weights=True, scales=(1.0, 2.0))


def test_export_import_roundtrip_exact():
    """ours -> torch sd -> import back: bit-identical param tree."""
    from gaot3d_tpu.torch_export import state_dict_from_params
    from gaot3d_tpu.torch_import import params_from_torch_state_dict

    cin, cout, n = 2, 1, 200
    pos, feats = make_cloud(n, seed=5, cin=cin)
    o_magno, o_attn = make_our_configs("rope")
    o_magno.mlp_type = "linear"
    o_magno.fused_encoder = True
    ours = init_model(cin, cout, "gaot_3d", o_magno, o_attn, latent_tokens=(4, 4, 4))
    slots = build_slots(pos)
    eslots = [EdgeSlots(slots.lat_idx[None], slots.mask[None])]
    params = ours.init({"params": jax.random.key(9)}, jnp.asarray(pos)[None],
                       jnp.asarray(feats)[None], jnp.ones((1, n), bool),
                       encoder_slots=eslots, decoder_slots=eslots)
    sd = state_dict_from_params(params, o_magno, o_attn)
    back = params_from_torch_state_dict(sd, o_magno, o_attn)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(back)}
    assert len(flat_a) == len(flat_b)
    for k, v in flat_a:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(flat_b[ks]),
                                      err_msg=ks)


def test_import_channel_mlp():
    # mlp_type='channel': the reference builds Conv1d-based ChannelMLPs for
    # lifting/recovery/projection ([out,in,1] weights, magno.py:426,452,655);
    # the importer's conv squeeze must cover all three sites
    _run_import_variant(mlp_type="channel")


def test_export_channel_mlp():
    # the exporter must emit [out,in,1] for exactly the mlp_type-gated modules
    _run_export_variant(mlp_type="channel")
