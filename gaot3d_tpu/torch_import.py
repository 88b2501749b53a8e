"""Import trained reference (PyTorch GAOT-3D) checkpoints into this framework.

The reference stores `{name: module.state_dict()}` via `torch.save`
(src/trainer/utils/setup.py:18-42). This module maps that state dict onto the
flax param tree of the equivalent `init_model(...)` GAOT3D — the exact
mapping the full-model parity tests are built on
(tests/test_torch_parity_full.py asserts forward AND AdamW-trajectory
agreement through it), promoted to a user-facing migration feature.

Layout notes baked into the mapping:
  - torch Linear [out, in] (or Conv1d [out, in, 1]) -> flax kernel [in, out];
  - flax auto-naming follows module CONSTRUCTION order, including the
    reference's scale-weighting quirk (outer Linear built before inner);
  - the fused fast paths (FusedEncoderScale / FusedDecoderScale) own the
    modular params under renamed keys (kernel_* / geo_*) — applied when the
    target config selects them (same gating as MAGNOEncoder/MAGNODecoder).

High-level entry: `params_from_torch_state_dict(sd, magno_cfg, attn_cfg)`.
CLI: tools/import_torch_ckpt.py. torch is only needed to LOAD the .pt file;
the mapping itself accepts torch tensors or numpy arrays.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def t2j(x):
    # host-side numpy, NOT jnp: the import pipeline ends in msgpack (tools/
    # import_torch_ckpt.py) or flax from_state_dict — materializing device
    # arrays here would copy every tensor twice
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _mlp_weight(sd, name):
    """torch Linear [out,in] or Conv1d [out,in,1] -> flax kernel [in,out]."""
    w = sd[name + ".weight"]
    if getattr(w, "ndim", None) == 3:
        w = w.squeeze(-1) if hasattr(w, "squeeze") else np.squeeze(w, -1)
    return t2j(w).T


def dense(sd, name, bias=True):
    p = {"kernel": _mlp_weight(sd, name)}
    if bias:
        p["bias"] = t2j(sd[name + ".bias"])
    return p


def torchlinear(sd, name, bias=True):
    return {"Dense_0": dense(sd, name, bias)}


def it_params(sd, prefix, n_fcs, dot_attn=False):
    p = {}
    for i in range(n_fcs):
        p[f"kernel_w{i}"] = _mlp_weight(sd, f"{prefix}.channel_mlp.fcs.{i}")
        p[f"kernel_b{i}"] = t2j(sd[f"{prefix}.channel_mlp.fcs.{i}.bias"])
    if dot_attn:
        p["q_w"] = _mlp_weight(sd, f"{prefix}.query_proj")
        p["q_b"] = t2j(sd[f"{prefix}.query_proj.bias"])
        p["k_w"] = _mlp_weight(sd, f"{prefix}.key_proj")
        p["k_b"] = t2j(sd[f"{prefix}.key_proj.bias"])
    return p


def geo_params(sd, prefix, method):
    if method == "statistical":
        return {
            "mlp_w0": _mlp_weight(sd, f"{prefix}.mlp.0"),
            "mlp_b0": t2j(sd[f"{prefix}.mlp.0.bias"]),
            "mlp_w1": _mlp_weight(sd, f"{prefix}.mlp.2"),
            "mlp_b1": t2j(sd[f"{prefix}.mlp.2.bias"]),
        }
    return {
        "pn_w0": _mlp_weight(sd, f"{prefix}.pointnet_mlp.0"),
        "pn_b0": t2j(sd[f"{prefix}.pointnet_mlp.0.bias"]),
        "pn_w1": _mlp_weight(sd, f"{prefix}.pointnet_mlp.2"),
        "pn_b1": t2j(sd[f"{prefix}.pointnet_mlp.2.bias"]),
        "fc_w": _mlp_weight(sd, f"{prefix}.fc.0"),
        "fc_b": t2j(sd[f"{prefix}.fc.0.bias"]),
    }


def block_params(sd, prefix, skip=False, use_attn_norm=True, use_ffn_norm=True):
    """One TransformerBlock. Flax RMSNorm auto-numbering shifts with the norm
    flags (models/transformer.py:203,219: each norm is constructed only when
    its flag is on). `skip` must be use_long_range_skip: the reference CREATES
    skip_proj on every decoder block but APPLIES it only when a skip tensor is
    passed (attn.py:203-205,222-224), and the flax block only constructs the
    TorchLinear in that case — with skips off, the reference's skip_proj
    params are dead weight and are deliberately dropped here."""
    p = {}
    ni = 0
    if use_attn_norm:
        p[f"RMSNorm_{ni}"] = {"weight": t2j(sd[f"{prefix}.attn_norm.weight"])}
        ni += 1
    if use_ffn_norm:
        p[f"RMSNorm_{ni}"] = {"weight": t2j(sd[f"{prefix}.ffn_norm.weight"])}
    p.update({
        "GroupQueryAttention_0": {
            "TorchLinear_0": torchlinear(sd, f"{prefix}.attn.q_proj", bias=False),
            "TorchLinear_1": torchlinear(sd, f"{prefix}.attn.k_proj", bias=False),
            "TorchLinear_2": torchlinear(sd, f"{prefix}.attn.v_proj", bias=False),
            "TorchLinear_3": torchlinear(sd, f"{prefix}.attn.o_proj", bias=False),
        },
        "FFN_0": {
            "TorchLinear_0": torchlinear(sd, f"{prefix}.ffn.w1", bias=False),
            "TorchLinear_1": torchlinear(sd, f"{prefix}.ffn.w3", bias=False),
            "TorchLinear_2": torchlinear(sd, f"{prefix}.ffn.w2", bias=False),
        },
    })
    if skip:
        p["TorchLinear_0"] = torchlinear(sd, f"{prefix}.skip_proj")
    return p


def processor_params(sd, num_layers, use_attn_norm=True, use_ffn_norm=True,
                     use_long_range_skip=True):
    """input_proj/output_proj are nn.Identity (NO params) when the size
    already matches hidden (reference attn.py:257-265) — exactly the flagship
    DrivAerNet/DrivAerML recipes (patch 2^3 x lifting 32 = hidden 256). The
    flax UViTProcessor skips the TorchLinears under the same size rule
    (models/transformer.py), so key presence in the state dict is the correct
    and self-consistent gate on both ends."""
    n_enc = num_layers // 2
    has_mid = num_layers % 2 == 1
    norms = dict(use_attn_norm=use_attn_norm, use_ffn_norm=use_ffn_norm)
    p = {}
    tl = 0
    if "processor.input_proj.weight" in sd:
        p[f"TorchLinear_{tl}"] = torchlinear(sd, "processor.input_proj")
        tl += 1
    bi = 0
    for i in range(n_enc):
        p[f"TransformerBlock_{bi}"] = block_params(
            sd, f"processor.encoder_layers.{i}", **norms)
        bi += 1
    if has_mid:
        p[f"TransformerBlock_{bi}"] = block_params(
            sd, "processor.middle_layer", **norms)
        bi += 1
    for i in range(n_enc):
        p[f"TransformerBlock_{bi}"] = block_params(
            sd, f"processor.decoder_layers.{i}", skip=use_long_range_skip,
            **norms)
        bi += 1
    if "processor.output_proj.weight" in sd:
        p[f"TorchLinear_{tl}"] = torchlinear(sd, "processor.output_proj")
    return p


def gaot_params_from_ref(sd, num_layers, use_geoembed=True,
                         use_scale_weights=False, dot_attn=False,
                         n_enc_fcs=3, n_dec_fcs=2, enc_geo=None, dec_geo=None,
                         use_gno=True, embedding_method="statistical",
                         use_attn_norm=True, use_ffn_norm=True,
                         use_long_range_skip=True):
    """Reference state dict -> MODULAR flax param tree (fused renames are a
    separate step, `rename_for_fused_paths`). enc_geo/dec_geo default to
    use_geoembed (the scalar-or-pair polymorphism).

    Optional modules follow the flax models' own construction gating (which
    mirrors the reference's): flax auto-names count per TYPE in construction
    order, so every absent module shifts the later TorchLinear_i indices —
    hence the running counters instead of fixed names. One deliberate drop:
    the reference CREATES encoder.recovery whenever geoembed is on but only
    APPLIES it when use_gno too (reference magno.py:437-456 vs 570-581); the
    flax encoder constructs it only in the applied case, so with use_gno off
    the reference's recovery params are dead weight and are not mapped."""
    enc_geo = use_geoembed if enc_geo is None else enc_geo
    dec_geo = use_geoembed if dec_geo is None else dec_geo
    enc = {}
    tl = 0
    if use_gno:
        enc[f"TorchLinear_{tl}"] = torchlinear(sd, "encoder.lifting.fcs.0")
        tl += 1
        enc["IntegralTransform_0"] = it_params(sd, "encoder.gno", n_enc_fcs, dot_attn)
    if enc_geo:
        enc["GeometricEmbedding_0"] = geo_params(sd, "encoder.geoembed", embedding_method)
        if use_gno:
            enc[f"TorchLinear_{tl}"] = torchlinear(sd, "encoder.recovery.fcs.0")
            tl += 1
    if use_scale_weights:
        # creation order quirk: the OUTER Linear(16->S) is constructed before
        # the inner Linear(3->16) (callee evaluated before its argument)
        enc[f"TorchLinear_{tl}"] = torchlinear(sd, "encoder.scale_weighting.2")
        enc[f"TorchLinear_{tl + 1}"] = torchlinear(sd, "encoder.scale_weighting.0")
    dec = {
        "IntegralTransform_0": it_params(sd, "decoder.gno", n_dec_fcs, dot_attn),
    }
    nxt = 0
    if dec_geo:
        dec["GeometricEmbedding_0"] = geo_params(sd, "decoder.geoembed", embedding_method)
        dec[f"TorchLinear_{nxt}"] = torchlinear(sd, "decoder.recovery.fcs.0")
        nxt += 1
    if use_scale_weights:
        # scale weighting runs before projection in the decoder; outer Linear
        # constructed before inner (callee evaluated before its argument)
        dec[f"TorchLinear_{nxt}"] = torchlinear(sd, "decoder.scale_weighting.2")
        dec[f"TorchLinear_{nxt + 1}"] = torchlinear(sd, "decoder.scale_weighting.0")
        nxt += 2
    dec[f"TorchLinear_{nxt}"] = torchlinear(sd, "decoder.projection.fcs.0")
    dec[f"TorchLinear_{nxt + 1}"] = torchlinear(sd, "decoder.projection.fcs.1")
    return {
        "params": {
            "encoder": enc,
            "patch_linear": torchlinear(sd, "patch_linear"),
            "processor": processor_params(
                sd, num_layers, use_attn_norm=use_attn_norm,
                use_ffn_norm=use_ffn_norm,
                use_long_range_skip=use_long_range_skip),
            "decoder": dec,
        }
    }


def rename_for_fused_paths(jparams, fuse_encoder: bool, fuse_decoder: bool):
    """Modular param names -> the fused fast paths' names (kernel_* / geo_*
    under FusedEncoderScale_0 / FusedDecoderScale_0). Inverse of the mapping
    asserted by tests/test_models.py::test_fused_*_matches_modular."""
    import flax.traverse_util as tu

    flat = tu.flatten_dict(jparams["params"])
    remapped = {}
    for k, v in flat.items():
        ks = list(k)
        if fuse_encoder and "encoder" in ks:
            if "IntegralTransform_0" in ks and ks[-1].startswith("kernel_"):
                k = tuple(p.replace("IntegralTransform_0", "FusedEncoderScale_0") for p in ks)
            elif "GeometricEmbedding_0" in ks and ks[-1].startswith("mlp_"):
                k = tuple(p.replace("GeometricEmbedding_0", "FusedEncoderScale_0")
                          .replace("mlp_", "geo_") for p in ks)
        if fuse_decoder and "decoder" in ks:
            if "IntegralTransform_0" in ks and ks[-1].startswith("kernel_"):
                k = tuple(p.replace("IntegralTransform_0", "FusedDecoderScale_0") for p in ks)
            elif "GeometricEmbedding_0" in ks and ks[-1].startswith("mlp_"):
                k = tuple(p.replace("GeometricEmbedding_0", "FusedDecoderScale_0")
                          .replace("mlp_", "geo_") for p in ks)
        remapped[tuple(k)] = v
    return {"params": tu.unflatten_dict(remapped)}


def params_from_torch_state_dict(sd: Dict[str, Any], magno_cfg, attn_cfg) -> dict:
    """One-call import: reference `model.state_dict()` (tolerating the DDP
    `module.` prefix) -> params for `init_model(..., magno_cfg, attn_cfg)`,
    with fused-path renames applied per the configs' own gating."""
    from .models.magno import parse_geoembed_strategy

    sd = { (k[len("module."):] if k.startswith("module.") else k): v
           for k, v in sd.items() }
    enc_geo, dec_geo = parse_geoembed_strategy(magno_cfg.use_geoembed)
    dot = bool(magno_cfg.use_attn) and magno_cfg.attention_type == "dot_product"
    n_enc_fcs = len(magno_cfg.in_gno_channel_mlp_hidden_layers) + 1
    n_dec_fcs = len(magno_cfg.out_gno_channel_mlp_hidden_layers) + 1
    jparams = gaot_params_from_ref(
        sd, attn_cfg.num_layers,
        use_geoembed=enc_geo or dec_geo,
        use_scale_weights=bool(magno_cfg.use_scale_weights) and len(magno_cfg.scales) > 1,
        dot_attn=dot,
        n_enc_fcs=n_enc_fcs, n_dec_fcs=n_dec_fcs,
        enc_geo=enc_geo, dec_geo=dec_geo,
        use_gno=bool(magno_cfg.use_gno),
        embedding_method=magno_cfg.embedding_method,
        use_attn_norm=bool(attn_cfg.use_attn_norm),
        use_ffn_norm=bool(attn_cfg.use_ffn_norm),
        use_long_range_skip=bool(attn_cfg.use_long_range_skip),
    )
    statistical = magno_cfg.embedding_method == "statistical"
    fuse_enc = (magno_cfg.fused_encoder and enc_geo and statistical
                and not magno_cfg.use_attn)
    fuse_dec = (magno_cfg.fused_decoder and dec_geo and statistical
                and not magno_cfg.use_attn)
    if fuse_enc or fuse_dec:
        jparams = rename_for_fused_paths(jparams, fuse_enc, fuse_dec)
    return jparams
