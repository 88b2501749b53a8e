"""Numerical parity against an independent torch implementation of the
reference equations (torch CPU is available in this image).

The torch side below is written from the reference's documented math
(attn.py:51-230: GQA with bias-free projections, sequence-order interleaved
RoPE with theta=10000, SDPA, SwiGLU FFN, f32 RMSNorm, and the
FFN-residual-from-normed-activation quirk) — not copied code. Weights are
copied from the flax module, so any formula mismatch shows up directly.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from gaot3d_tpu.models.transformer import AttentionConfig, FFNConfig, TransformerBlock


def torch_rope(x: "torch.Tensor") -> "torch.Tensor":
    # lucidrains rotary_embedding_torch defaults: theta=10000, interleaved
    # pairs, positions = sequence indices
    *_, S, D = x.shape
    freqs = 1.0 / (10000 ** (torch.arange(0, D, 2, dtype=torch.float32) / D))
    angles = torch.arange(S, dtype=torch.float32)[:, None] * freqs[None, :]
    cos = angles.cos()
    sin = angles.sin()
    x0 = x[..., 0::2]
    x1 = x[..., 1::2]
    out = torch.empty_like(x)
    out[..., 0::2] = x0 * cos - x1 * sin
    out[..., 1::2] = x0 * sin + x1 * cos
    return out


def torch_block(x, w, heads, kv_heads, eps=1e-6, rope=True):
    """Reference TransformerBlock math in torch (no-skip, eval mode)."""

    def rms(v, weight):
        vf = v.float()
        normed = vf * torch.rsqrt(vf.pow(2).mean(-1, keepdim=True) + eps)
        return normed.type_as(v) * weight

    B, S, C = x.shape
    hd = C // heads
    h = rms(x, w["attn_norm"])
    q = h @ w["q"]
    k = h @ w["k"]
    v = h @ w["v"]
    q = q.view(B, S, heads, hd).transpose(1, 2)
    k = k.view(B, S, kv_heads, hd).transpose(1, 2)
    v = v.view(B, S, kv_heads, hd).transpose(1, 2)
    if kv_heads != heads:
        k = k.repeat_interleave(heads // kv_heads, dim=1)
        v = v.repeat_interleave(heads // kv_heads, dim=1)
    if rope:
        q = torch_rope(q)
        k = torch_rope(k)
    a = torch.nn.functional.scaled_dot_product_attention(q, k, v)
    a = a.transpose(1, 2).contiguous().view(B, S, C) @ w["o"]
    h = x + a
    # the reference quirk: FFN residual from the NORMED activation
    h = rms(h, w["ffn_norm"])
    ffn = (torch.nn.functional.silu(h @ w["w1"]) * (h @ w["w3"])) @ w["w2"]
    return h + ffn


def test_transformer_block_matches_torch_reference_math():
    B, S, C, heads, kv = 2, 16, 32, 4, 2
    block = TransformerBlock(
        input_size=C,
        output_size=C,
        attn_config=AttentionConfig(
            hidden_size=C, num_heads=heads, num_kv_heads=kv, atten_dropout=0.0,
            positional_embedding="rope", attention_impl="naive",
            attention_dtype="float32",
        ),
        ffn_config=FFNConfig(hidden_size=64),
    )
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, S, C)).astype(np.float32)
    rel = jnp.zeros((S, 3), jnp.float32)  # values ignored (sequence RoPE quirk)
    params = block.init(jax.random.key(0), jnp.asarray(x), relative_positions=rel)

    p = jax.tree.map(np.asarray, params["params"])
    attn = p["GroupQueryAttention_0"]
    ffn = p["FFN_0"]
    w = {
        "attn_norm": torch.tensor(p["RMSNorm_0"]["weight"]),
        "ffn_norm": torch.tensor(p["RMSNorm_1"]["weight"]),
        "q": torch.tensor(attn["TorchLinear_0"]["Dense_0"]["kernel"]),
        "k": torch.tensor(attn["TorchLinear_1"]["Dense_0"]["kernel"]),
        "v": torch.tensor(attn["TorchLinear_2"]["Dense_0"]["kernel"]),
        "o": torch.tensor(attn["TorchLinear_3"]["Dense_0"]["kernel"]),
        "w1": torch.tensor(ffn["TorchLinear_0"]["Dense_0"]["kernel"]),
        "w3": torch.tensor(ffn["TorchLinear_1"]["Dense_0"]["kernel"]),
        "w2": torch.tensor(ffn["TorchLinear_2"]["Dense_0"]["kernel"]),
    }

    ours = np.asarray(block.apply(params, jnp.asarray(x), relative_positions=rel))
    theirs = torch_block(torch.tensor(x), w, heads, kv).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_rope_matches_lucidrains_convention():
    from gaot3d_tpu.ops.rope import apply_rope

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 2, 12, 16)).astype(np.float32)
    ours = np.asarray(apply_rope(jnp.asarray(x)))
    theirs = torch_rope(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
