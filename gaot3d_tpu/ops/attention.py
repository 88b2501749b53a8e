"""Multi-head attention kernels.

TPU-native replacement for cuDNN F.scaled_dot_product_attention
(reference call site: src/model/layers/attn.py:126).

Four implementations behind one interface:
  - 'naive'  : materialized logits (oracle for tests; O(S^2) memory)
  - 'flash'  : chunked online-softmax lax.scan — O(S * chunk) memory, supports
               attention-probability dropout via counter-based PRNG folding, so
               the 16K-token full-size latent sequence fits in HBM even with
               the reference's train-time dropout (attn.py:122-126)
  - 'pallas' : fused Pallas TPU flash kernel (ops/pallas_attention.py) for
               the no-dropout inference/eval hot path (110ms vs 575ms for the
               bundled jax kernel at S=16K D=32 x10 layers on v5e)
  - 'pallas_dropout' : the same kernel family WITH probability dropout from
               the in-core PRNG + custom bwd (4.4x the XLA recurrence
               train-time: 431ms vs 1886ms fwd+bwd x10 layers)
'auto' picks 'naive' for short sequences, then the fastest dropout-capable
path for training and 'pallas' for eval.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp


def _fast_keep_mask(rng: jax.Array, rate: float, shape) -> jnp.ndarray:
    """Bernoulli keep-mask via the XLA RngBitGenerator (hardware-speed RNG).

    jax.random.bernoulli uses threefry (dozens of ALU ops per word), which is
    the dominant cost of attention-probability dropout over 16K-token
    sequences. RBG is a different (still high-quality, counter-based) stream —
    statistically equivalent dropout, not bit-identical to threefry.
    """
    kd = jax.random.key_data(rng).astype(jnp.uint32).reshape(-1)
    key4 = jnp.concatenate([kd, kd])[:4]
    _, bits = jax.lax.rng_bit_generator(key4, shape, dtype=jnp.uint32)
    return bits >= jnp.uint32(min(max(rate, 0.0), 1.0) * 4294967295.0)


def _dropout(weights: jnp.ndarray, rate: float, rng: jax.Array) -> jnp.ndarray:
    keep = _fast_keep_mask(rng, rate, weights.shape)
    return jnp.where(keep, weights / (1.0 - rate), 0.0)


def naive_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """q,k,v: [B, H, S, D] -> [B, H, S, D]. Matches torch SDPA semantics
    (softmax(qk^T/sqrt(d)) with optional train-time probability dropout)."""
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(d).astype(q.dtype)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    if dropout_rate > 0.0 and rng is not None:
        weights = _dropout(weights, dropout_rate, rng)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def flash_attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    chunk_size: int = 1024,
) -> jnp.ndarray:
    """Chunked online-softmax attention: never materializes [S, S] logits.

    Scans over KV chunks maintaining running (max, sum, acc) per query —
    the flash-attention recurrence expressed in XLA. Dropout on attention
    probabilities uses an rng folded per KV-chunk so the result is
    sample-identical regardless of chunking of the key axis... (it is
    *statistically* identical to naive dropout; exact bit-parity with the
    naive path is not required, both are valid Bernoulli masks).
    """
    B, H, S, D = q.shape
    Skv = k.shape[2]
    scale = 1.0 / jnp.sqrt(D).astype(jnp.float32)
    nchunks = -(-Skv // chunk_size)
    pad = nchunks * chunk_size - Skv
    if pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kc = k.reshape(B, H, nchunks, chunk_size, D)
    vc = v.reshape(B, H, nchunks, chunk_size, D)
    kv_valid = (jnp.arange(nchunks * chunk_size) < Skv).reshape(nchunks, chunk_size)

    @jax.checkpoint
    def body(carry, xs):
        m, l, acc = carry
        k_i, v_i, valid_i, idx = xs
        # inputs stay in their storage dtype (bf16 hits the MXU single-pass);
        # logits/softmax/accumulators are f32
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k_i, preferred_element_type=jnp.float32
        ) * scale
        logits = jnp.where(valid_i[None, None, None, :], logits, -jnp.inf)
        m_new = jnp.maximum(m, logits.max(axis=-1))
        # guard fully-masked rows
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(logits - m_safe[..., None])
        p = jnp.where(valid_i[None, None, None, :], p, 0.0)
        if dropout_rate > 0.0 and rng is not None:
            r = jax.random.fold_in(rng, idx)
            keep = _fast_keep_mask(r, dropout_rate, p.shape)
            p_drop = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
        else:
            p_drop = p
        alpha = jnp.exp(jnp.where(jnp.isfinite(m), m, 0.0) - m_safe)
        l_new = l * alpha + p.sum(axis=-1)
        acc_new = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd",
            p_drop.astype(v_i.dtype),
            v_i,
            preferred_element_type=jnp.float32,
        )
        return (m_new, l_new, acc_new), None

    m0 = jnp.full((B, H, S), -jnp.inf, dtype=jnp.float32)
    l0 = jnp.zeros((B, H, S), dtype=jnp.float32)
    acc0 = jnp.zeros((B, H, S, D), dtype=jnp.float32)
    xs = (
        jnp.moveaxis(kc, 2, 0),
        jnp.moveaxis(vc, 2, 0),
        kv_valid,
        jnp.arange(nchunks),
    )
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), xs)
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.astype(q.dtype)


def pallas_flash_attention(q, k, v):
    """Pallas TPU fused flash kernel (no dropout) — measured 4.5x faster than
    the XLA online-softmax at S=16K on v5e. NOTE its sm_scale defaults to 1.0;
    torch-SDPA semantics require 1/sqrt(d). Falls back to flash-XLA on
    non-TPU backends."""
    try:
        # platform check must be explicit: tracing succeeds on CPU but the
        # Mosaic lowering fails at jit-compile time, past any except here
        if jax.devices()[0].platform not in ("tpu", "axon"):
            return flash_attention_xla(q, k, v)
        from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

        return flash_attention(q, k, v, causal=False, sm_scale=1.0 / (q.shape[-1] ** 0.5))
    except Exception:
        return flash_attention_xla(q, k, v)


def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    impl: str = "auto",
    chunk_size: int = 1024,
) -> jnp.ndarray:
    """Dispatcher. q,k,v: [B, H, S, D]."""
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if impl == "auto":
        if q.shape[2] <= 2048:
            impl = "naive"
        elif dropout_rate > 0.0 and rng is not None:
            # probability dropout: fused Pallas kernel w/ in-core PRNG on TPU
            # (pallas_attention.py), XLA online-softmax recurrence elsewhere
            impl = "pallas_dropout" if on_tpu else "flash"
        else:
            impl = "pallas"  # fused TPU kernel (4.6x at S=16K); xla elsewhere
    if impl == "naive":
        return naive_attention(q, k, v, dropout_rate, rng)
    if impl == "flash":
        return flash_attention_xla(q, k, v, dropout_rate, rng, chunk_size)
    if impl == "pallas_dropout":
        if not on_tpu:
            return flash_attention_xla(q, k, v, dropout_rate, rng, chunk_size)
        from .pallas_attention import flash_attention_dropout

        # (512,1024) is the measured-best train default on v5e under the 16M
        # scoped-vmem limit; the knobs exist to A/B wider blocks together
        # with a raised scoped-vmem budget (bench BENCH_SCOPED_VMEM_KIB).
        # NOTE the dropout mask is a function of block geometry: change these
        # only for whole runs, never mid-training.
        bq = int(os.environ.get("GAOT_ATTN_BLOCK_Q", 512))
        bk = int(os.environ.get("GAOT_ATTN_BLOCK_K", 1024))
        return flash_attention_dropout(q, k, v, rng, dropout_rate,
                                       block_q=bq, block_k=bk)
    if impl == "pallas":
        if dropout_rate > 0.0 and rng is not None:
            if on_tpu:
                from .pallas_attention import flash_attention_dropout

                return flash_attention_dropout(q, k, v, rng, dropout_rate)
            return flash_attention_xla(q, k, v, dropout_rate, rng, chunk_size)
        if on_tpu:
            # our kernel, wide blocks (no bwd VMEM constraint without dropout
            # masks to replay): 110ms vs 575ms for the bundled jax kernel at
            # S=16K D=32 x10 layers on v5e
            from .pallas_attention import flash_attention_dropout

            return flash_attention_dropout(q, k, v, block_q=1024, block_k=1024)
        return pallas_flash_attention(q, k, v)
    raise ValueError(f"unknown attention impl: {impl}")
