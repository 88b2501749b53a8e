"""Export this framework's trained params as a reference (PyTorch GAOT-3D)
state dict — the inverse of gaot3d_tpu.torch_import, completing bidirectional
checkpoint migration: models trained here can be validated or served in the
torch reference (reference load path: src/trainer/utils/setup.py:18-42 +
`module.load_state_dict`).

The mapping mirrors torch_import rule-for-rule (flax kernel [in,out] ->
torch Linear weight [out,in]; flax auto-numbering by construction order;
fused-path renames undone first). Keys the importer deliberately DROPS
because the reference creates-but-never-applies those modules (decoder
skip_proj with skips off, reference attn.py:203-205; encoder.recovery with
use_gno off, reference magno.py:437-456 vs 570-581) cannot be reconstructed —
the exported dict simply omits them, so load with `strict=False` for such
configs; the flagship recipes (skips on, gno on) produce a complete,
strict-loadable key set (asserted by tests/test_torch_parity_full.py
roundtrip).

High-level entry: `state_dict_from_params(params, magno_cfg, attn_cfg)`.
CLI: tools/export_torch_ckpt.py (msgpack -> .pt).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _put_linear(out, name, p, bias=True, conv=False):
    """flax TorchLinear {Dense_0: {kernel[in,out], bias}} -> torch Linear
    weight [out,in] (or Conv1d [out,in,1] when `conv` — the reference's
    ChannelMLP layout, mlp.py:272-281; key names are identical)."""
    d = p["Dense_0"]
    w = _np(d["kernel"]).T
    out[f"{name}.weight"] = w[..., None] if conv else w
    if bias:
        out[f"{name}.bias"] = _np(d["bias"])


def _put_weight(out, name, kernel, bias=None):
    out[f"{name}.weight"] = _np(kernel).T
    if bias is not None:
        out[f"{name}.bias"] = _np(bias)


def _put_it(out, prefix, p, n_fcs, dot_attn=False):
    for i in range(n_fcs):
        _put_weight(out, f"{prefix}.channel_mlp.fcs.{i}",
                    p[f"kernel_w{i}"], p[f"kernel_b{i}"])
    if dot_attn:
        _put_weight(out, f"{prefix}.query_proj", p["q_w"], p["q_b"])
        _put_weight(out, f"{prefix}.key_proj", p["k_w"], p["k_b"])


def _put_geo(out, prefix, p, method):
    if method == "statistical":
        _put_weight(out, f"{prefix}.mlp.0", p["mlp_w0"], p["mlp_b0"])
        _put_weight(out, f"{prefix}.mlp.2", p["mlp_w1"], p["mlp_b1"])
    else:
        _put_weight(out, f"{prefix}.pointnet_mlp.0", p["pn_w0"], p["pn_b0"])
        _put_weight(out, f"{prefix}.pointnet_mlp.2", p["pn_w1"], p["pn_b1"])
        _put_weight(out, f"{prefix}.fc.0", p["fc_w"], p["fc_b"])


def _put_block(out, prefix, p, skip=False, use_attn_norm=True, use_ffn_norm=True):
    """Inverse of torch_import.block_params (same RMSNorm numbering shift)."""
    ni = 0
    if use_attn_norm:
        out[f"{prefix}.attn_norm.weight"] = _np(p[f"RMSNorm_{ni}"]["weight"])
        ni += 1
    if use_ffn_norm:
        out[f"{prefix}.ffn_norm.weight"] = _np(p[f"RMSNorm_{ni}"]["weight"])
    attn = p["GroupQueryAttention_0"]
    for i, nm in enumerate(("q_proj", "k_proj", "v_proj", "o_proj")):
        _put_linear(out, f"{prefix}.attn.{nm}", attn[f"TorchLinear_{i}"],
                    bias=False)
    ffn = p["FFN_0"]
    for i, nm in enumerate(("w1", "w3", "w2")):
        _put_linear(out, f"{prefix}.ffn.{nm}", ffn[f"TorchLinear_{i}"],
                    bias=False)
    if skip:
        _put_linear(out, f"{prefix}.skip_proj", p["TorchLinear_0"])


def _put_processor(out, p, num_layers, use_attn_norm=True, use_ffn_norm=True,
                   use_long_range_skip=True):
    n_enc = num_layers // 2
    has_mid = num_layers % 2 == 1
    norms = dict(use_attn_norm=use_attn_norm, use_ffn_norm=use_ffn_norm)
    # input/output projections exist only when sizes differ from hidden
    # (nn.Identity otherwise, reference attn.py:257-265) — key presence in the
    # flax tree is the gate, exactly as on import
    tl = 0
    hidden = None
    if "TransformerBlock_0" in p:
        # q_proj kernel is [hidden, hidden] — recover hidden from shapes so a
        # LONE projection can be told apart: input_proj is [in!=hidden, hidden],
        # output_proj is [hidden, out!=hidden] (a [hidden, hidden] projection
        # cannot exist: same-size means nn.Identity, attn.py:257-265)
        qk = p["TransformerBlock_0"]["GroupQueryAttention_0"]["TorchLinear_0"]
        hidden = _np(qk["Dense_0"]["kernel"]).shape[0]
    if f"TorchLinear_{tl}" in p:
        kshape = _np(p[f"TorchLinear_{tl}"]["Dense_0"]["kernel"]).shape
        if kshape[1] == hidden and kshape[0] != hidden:
            _put_linear(out, "processor.input_proj", p[f"TorchLinear_{tl}"])
            tl += 1
    bi = 0
    for i in range(n_enc):
        _put_block(out, f"processor.encoder_layers.{i}",
                   p[f"TransformerBlock_{bi}"], **norms)
        bi += 1
    if has_mid:
        _put_block(out, "processor.middle_layer", p[f"TransformerBlock_{bi}"],
                   **norms)
        bi += 1
    for i in range(n_enc):
        _put_block(out, f"processor.decoder_layers.{i}",
                   p[f"TransformerBlock_{bi}"], skip=use_long_range_skip,
                   **norms)
        bi += 1
    if f"TorchLinear_{tl}" in p:
        _put_linear(out, "processor.output_proj", p[f"TorchLinear_{tl}"])


def rename_from_fused_paths(jparams, unfuse_encoder: bool, unfuse_decoder: bool):
    """Fused fast-path names -> modular names (exact inverse of
    torch_import.rename_for_fused_paths)."""
    import flax.traverse_util as tu

    flat = tu.flatten_dict(jparams["params"])
    remapped = {}
    for k, v in flat.items():
        ks = list(k)
        if unfuse_encoder and "encoder" in ks and "FusedEncoderScale_0" in ks:
            if ks[-1].startswith("kernel_"):
                k = tuple(p.replace("FusedEncoderScale_0", "IntegralTransform_0")
                          for p in ks)
            elif ks[-1].startswith("geo_"):
                k = tuple(p.replace("FusedEncoderScale_0", "GeometricEmbedding_0")
                          .replace("geo_", "mlp_") for p in ks)
        if unfuse_decoder and "decoder" in ks and "FusedDecoderScale_0" in ks:
            if ks[-1].startswith("kernel_"):
                k = tuple(p.replace("FusedDecoderScale_0", "IntegralTransform_0")
                          for p in ks)
            elif ks[-1].startswith("geo_"):
                k = tuple(p.replace("FusedDecoderScale_0", "GeometricEmbedding_0")
                          .replace("geo_", "mlp_") for p in ks)
        remapped[tuple(k)] = v
    return {"params": tu.unflatten_dict(remapped)}


def _latent_tokens_buffer(latent_tokens, coord_dim=3,
                          norm_domin=((-1, -1, -1), (1, 1, 1))) -> np.ndarray:
    """The reference registers its latent token grid as a state-dict BUFFER
    (gaot_3d.py:36-46: linspace meshgrid over norm_domin, 'ij', stacked and
    reshaped [-1, coord_dim]) — reproduce it exactly so strict loads work."""
    axes = [np.linspace(lo, hi, d, dtype=np.float32)
            for lo, hi, d in zip(norm_domin[0], norm_domin[1], latent_tokens)]
    mesh = np.meshgrid(*axes, indexing="ij")
    return np.stack(mesh, axis=-1).reshape(-1, coord_dim)


def state_dict_from_params(params: dict, magno_cfg, attn_cfg,
                           latent_tokens=None) -> Dict[str, Any]:
    """One-call export: flax variables for `init_model(..., magno_cfg,
    attn_cfg)` -> reference `model.state_dict()`-shaped {key: np.ndarray}.

    `magno_cfg.mlp_type` selects the torch weight layout for the modules the
    reference gates on it (lifting/recovery/projection, magno.py:421-426,
    447-452, 650-655): 'linear' -> Linear [out,in], 'channel' -> Conv1d
    [out,in,1]. The GNO kernel MLP is always LinearChannelMLP in the
    reference (integral_transform.py:50) regardless of mlp_type."""
    from .models.magno import parse_geoembed_strategy

    conv = getattr(magno_cfg, "mlp_type", "linear") == "channel"
    enc_geo, dec_geo = parse_geoembed_strategy(magno_cfg.use_geoembed)
    dot = bool(magno_cfg.use_attn) and magno_cfg.attention_type == "dot_product"
    statistical = magno_cfg.embedding_method == "statistical"
    use_scale_weights = (bool(magno_cfg.use_scale_weights)
                         and len(magno_cfg.scales) > 1)
    fuse_enc = (magno_cfg.fused_encoder and enc_geo and statistical
                and not magno_cfg.use_attn)
    fuse_dec = (magno_cfg.fused_decoder and dec_geo and statistical
                and not magno_cfg.use_attn)
    if fuse_enc or fuse_dec:
        params = rename_from_fused_paths(params, fuse_enc, fuse_dec)
    tree = params["params"]

    out: Dict[str, Any] = {}
    if latent_tokens is not None:
        out["latent_tokens"] = _latent_tokens_buffer(
            latent_tokens, coord_dim=int(magno_cfg.gno_coord_dim))
    enc = tree["encoder"]
    tl = 0
    if bool(magno_cfg.use_gno):
        _put_linear(out, "encoder.lifting.fcs.0", enc[f"TorchLinear_{tl}"], conv=conv)
        tl += 1
        n_enc_fcs = len(magno_cfg.in_gno_channel_mlp_hidden_layers) + 1
        _put_it(out, "encoder.gno", enc["IntegralTransform_0"], n_enc_fcs, dot)
    if enc_geo:
        _put_geo(out, "encoder.geoembed", enc["GeometricEmbedding_0"],
                 magno_cfg.embedding_method)
        if bool(magno_cfg.use_gno):
            _put_linear(out, "encoder.recovery.fcs.0", enc[f"TorchLinear_{tl}"], conv=conv)
            tl += 1
    if use_scale_weights:
        # construction-order quirk mirrored from import: outer Linear first
        _put_linear(out, "encoder.scale_weighting.2", enc[f"TorchLinear_{tl}"])
        _put_linear(out, "encoder.scale_weighting.0", enc[f"TorchLinear_{tl + 1}"])

    _put_linear(out, "patch_linear", tree["patch_linear"])
    _put_processor(out, tree["processor"], attn_cfg.num_layers,
                   use_attn_norm=bool(attn_cfg.use_attn_norm),
                   use_ffn_norm=bool(attn_cfg.use_ffn_norm),
                   use_long_range_skip=bool(attn_cfg.use_long_range_skip))

    dec = tree["decoder"]
    n_dec_fcs = len(magno_cfg.out_gno_channel_mlp_hidden_layers) + 1
    _put_it(out, "decoder.gno", dec["IntegralTransform_0"], n_dec_fcs, dot)
    nxt = 0
    if dec_geo:
        _put_geo(out, "decoder.geoembed", dec["GeometricEmbedding_0"],
                 magno_cfg.embedding_method)
        _put_linear(out, "decoder.recovery.fcs.0", dec[f"TorchLinear_{nxt}"], conv=conv)
        nxt += 1
    if use_scale_weights:
        _put_linear(out, "decoder.scale_weighting.2", dec[f"TorchLinear_{nxt}"])
        _put_linear(out, "decoder.scale_weighting.0", dec[f"TorchLinear_{nxt + 1}"])
        nxt += 2
    _put_linear(out, "decoder.projection.fcs.0", dec[f"TorchLinear_{nxt}"], conv=conv)
    _put_linear(out, "decoder.projection.fcs.1", dec[f"TorchLinear_{nxt + 1}"], conv=conv)
    return out
