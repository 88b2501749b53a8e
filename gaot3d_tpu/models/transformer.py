"""U-shaped Vision Transformer processor.

Behavior parity with the reference processor (src/model/layers/attn.py):
  - GQA: separate q/k/v projections (bias-free), kv-head repeat
    (attn.py:51-131), train-only attention-probability dropout
  - RoPE: when positional_embedding == 'rope' the reference applies default
    1-D *sequence* rotary to q and k, ignoring the 3-D patch coords it was
    handed (attn.py:118-120; SURVEY.md section 3.2 quirk) — replicated, with an
    opt-in 'axial3d' improvement
  - FFN: SwiGLU w2(silu(w1 x) * w3 x) (attn.py:137-161)
  - RMSNorm in float32 then cast back (attn.py:167-178)
  - Block residual quirk: the FFN residual is taken from the *normed*
    activation: h = x + attn(norm(x)); h = norm2(h); out = h + ffn(h)
    (attn.py:226-229) — replicated exactly
  - U-shape: num_layers//2 encoder blocks (skips pushed), optional middle
    block when odd, num_layers//2 decoder blocks with skip_proj(cat[x, skip])
    (attn.py:267-325)

TPU-first: attention runs through ops.attention (flash/online-softmax for long
sequences); all matmuls are bias-free Dense on the MXU.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import scaled_dot_product_attention
from ..ops.rope import apply_rope
from .mlp import ConditionedNorm, TorchLinear


@dataclass
class AttentionConfig:
    """(reference: attn.py:15-25)"""

    hidden_size: int = 256
    num_heads: int = 8
    num_kv_heads: int = 8
    use_conditional_norm: bool = False
    cond_norm_hidden_size: int = 4
    atten_dropout: float = 0.1
    positional_embedding: str = "absolute"  # ['absolute', 'rope']
    H: Optional[int] = None
    W: Optional[int] = None
    D: Optional[int] = None
    attention_impl: str = "auto"  # ['auto', 'naive', 'flash', 'pallas']
    attention_chunk_size: int = 1024
    attention_dtype: str = "bfloat16"  # q/k/v storage dtype inside attention
    # ('bfloat16' hits the MXU single-pass; softmax/accum stay f32 — the
    # reference intended reduced-precision attention too, attn.py:85)


@dataclass
class FFNConfig:
    """(reference: attn.py:27-31)"""

    hidden_size: int = 1024
    use_conditional_norm: bool = False
    cond_norm_hidden_size: int = 4


@dataclass
class TransformerConfig:
    """(reference: attn.py:33-44)"""

    patch_size: int = 8
    hidden_size: int = 256
    use_attn_norm: bool = True
    use_ffn_norm: bool = True
    norm_eps: float = 1e-6
    num_layers: int = 3
    positional_embedding: str = "absolute"
    use_long_range_skip: bool = True
    attn_config: AttentionConfig = field(default_factory=AttentionConfig)
    ffn_config: FFNConfig = field(default_factory=FFNConfig)


class RMSNorm(nn.Module):
    """(reference: attn.py:167-178) — normalized in f32, scaled by weight."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return normed.astype(x.dtype) * weight


class GroupQueryAttention(nn.Module):
    """(reference: attn.py:51-131 GroupQueryFlashAttention)"""

    output_size: int
    hidden_size: int = 128
    num_heads: int = 8
    num_kv_heads: int = 4
    atten_dropout: float = 0.0
    use_conditional_norm: bool = False
    cond_norm_hidden_size: int = 4
    positional_embedding: str = "absolute"
    attention_impl: str = "auto"
    attention_chunk_size: int = 1024
    attention_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x, condition=None, relative_positions=None, train: bool = False):
        assert self.hidden_size % self.num_heads == 0
        assert self.num_heads % self.num_kv_heads == 0
        head_dim = self.hidden_size // self.num_heads
        kv_hidden = head_dim * self.num_kv_heads

        if self.use_conditional_norm:
            x = ConditionedNorm(self.output_size, self.cond_norm_hidden_size)(condition, x)

        q = TorchLinear(self.hidden_size, use_bias=False)(x)
        k = TorchLinear(kv_hidden, use_bias=False)(x)
        v = TorchLinear(kv_hidden, use_bias=False)(x)

        B, S, _ = q.shape
        q = q.reshape(B, S, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, self.num_kv_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, self.num_kv_heads, head_dim).transpose(0, 2, 1, 3)
        if self.num_kv_heads != self.num_heads:
            rep = self.num_heads // self.num_kv_heads
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)

        if relative_positions is not None and self.positional_embedding == "rope":
            # reference quirk: sequence-order rotary; `relative_positions`
            # values are ignored (attn.py:118-120)
            q = apply_rope(q)
            k = apply_rope(k)
        elif relative_positions is not None and self.positional_embedding == "rope3d":
            # improvement: axial 3-D rope — rotate a third of head dims per axis
            third = head_dim // 6 * 2
            parts_q, parts_k = [], []
            for a in range(3):
                sl = slice(a * third, (a + 1) * third)
                parts_q.append(apply_rope(q[..., sl], positions=relative_positions[:, a]))
                parts_k.append(apply_rope(k[..., sl], positions=relative_positions[:, a]))
            parts_q.append(q[..., 3 * third :])
            parts_k.append(k[..., 3 * third :])
            q = jnp.concatenate(parts_q, axis=-1)
            k = jnp.concatenate(parts_k, axis=-1)

        if self.attention_dtype == "bfloat16":
            q = q.astype(jnp.bfloat16)
            k = k.astype(jnp.bfloat16)
            v = v.astype(jnp.bfloat16)
        dropout_rate = self.atten_dropout if train else 0.0
        rng = self.make_rng("dropout") if (dropout_rate > 0.0 and train) else None
        out = scaled_dot_product_attention(
            q, k, v,
            dropout_rate=dropout_rate,
            rng=rng,
            impl=self.attention_impl,
            chunk_size=self.attention_chunk_size,
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, S, self.hidden_size).astype(x.dtype)
        return TorchLinear(self.output_size, use_bias=False)(out)


class FFN(nn.Module):
    """SwiGLU feed-forward (reference: attn.py:137-161)."""

    output_size: int
    hidden_size: int = 256
    use_conditional_norm: bool = False
    cond_norm_hidden_size: int = 4

    @nn.compact
    def __call__(self, x, condition=None):
        w1 = TorchLinear(self.hidden_size, use_bias=False)(x)
        w3 = TorchLinear(self.hidden_size, use_bias=False)(x)
        out = TorchLinear(self.output_size, use_bias=False)(jax.nn.silu(w1) * w3)
        if self.use_conditional_norm:
            out = ConditionedNorm(self.output_size, self.cond_norm_hidden_size)(condition, out)
        return out


class TransformerBlock(nn.Module):
    """(reference: attn.py:180-244)"""

    input_size: int
    output_size: int
    use_attn_norm: bool = True
    use_ffn_norm: bool = True
    norm_eps: float = 1e-6
    attn_config: AttentionConfig = field(default_factory=AttentionConfig)
    ffn_config: FFNConfig = field(default_factory=FFNConfig)
    skip_connection: bool = False

    @nn.compact
    def __call__(self, x, condition=None, relative_positions=None, skip=None, train=False):
        if self.skip_connection and skip is not None:
            x = TorchLinear(self.input_size)(jnp.concatenate([x, skip], axis=-1))

        h = RMSNorm(self.norm_eps)(x) if self.use_attn_norm else x
        a = GroupQueryAttention(
            output_size=self.attn_config.hidden_size,
            hidden_size=self.attn_config.hidden_size,
            num_heads=self.attn_config.num_heads,
            num_kv_heads=self.attn_config.num_kv_heads,
            atten_dropout=self.attn_config.atten_dropout,
            use_conditional_norm=self.attn_config.use_conditional_norm,
            cond_norm_hidden_size=self.attn_config.cond_norm_hidden_size,
            positional_embedding=self.attn_config.positional_embedding,
            attention_impl=self.attn_config.attention_impl,
            attention_chunk_size=self.attn_config.attention_chunk_size,
            attention_dtype=self.attn_config.attention_dtype,
        )(h, condition=condition, relative_positions=relative_positions, train=train)
        h = x + a
        # reference residual quirk: FFN residual taken from the NORMED h
        h = RMSNorm(self.norm_eps)(h) if self.use_ffn_norm else h
        out = h + FFN(
            output_size=self.output_size,
            hidden_size=self.ffn_config.hidden_size,
            use_conditional_norm=self.ffn_config.use_conditional_norm,
            cond_norm_hidden_size=self.ffn_config.cond_norm_hidden_size,
        )(h, condition=condition)
        return out


class UViTProcessor(nn.Module):
    """U-shaped transformer (reference: attn.py:246-325 Transformer)."""

    input_size: int
    output_size: int
    config: TransformerConfig = field(default_factory=TransformerConfig)

    @nn.compact
    def __call__(self, x, condition=None, relative_positions=None, train=False):
        cfg = self.config
        hidden = cfg.hidden_size
        attn_cfg = AttentionConfig(
            **{
                **cfg.attn_config.__dict__,
                "positional_embedding": cfg.positional_embedding,
            }
        )
        if self.input_size != hidden:
            x = TorchLinear(hidden)(x)

        n_enc = cfg.num_layers // 2
        n_dec = cfg.num_layers // 2
        has_middle = cfg.num_layers % 2 == 1

        def block(skip_connection):
            return TransformerBlock(
                input_size=hidden,
                output_size=hidden,
                use_attn_norm=cfg.use_attn_norm,
                use_ffn_norm=cfg.use_ffn_norm,
                norm_eps=cfg.norm_eps,
                attn_config=attn_cfg,
                ffn_config=cfg.ffn_config,
                skip_connection=skip_connection,
            )

        skips = []
        for _ in range(n_enc):
            x = block(False)(x, condition, relative_positions, train=train)
            skips.append(x)
        if has_middle:
            x = block(False)(x, condition, relative_positions, train=train)
        for _ in range(n_dec):
            skip = skips.pop() if cfg.use_long_range_skip else None
            x = block(True)(x, condition, relative_positions, skip=skip, train=train)

        if hidden != self.output_size:
            x = TorchLinear(self.output_size)(x)
        return x
