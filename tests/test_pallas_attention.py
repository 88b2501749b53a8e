"""Pallas dropout flash attention vs a dense oracle sharing the same mask.

The TPU in-core PRNG has no CPU lowering, so these tests drive the kernels in
interpret mode through the explicit `dropout_bits` variant; the oracle applies
the identical keep rule (bits >= rate * (2^32-1)) to materialized softmax
weights. bench.py validates the RNG variant on the real chip.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaot3d_tpu.ops.pallas_attention import flash_attention_dropout


def _dense_oracle(q, k, v, bits, rate, block_q, block_k):
    """Naive attention with the kernel's exact dropout mask."""
    B, H, S, D = q.shape
    Skv = k.shape[2]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    logits = logits / jnp.sqrt(jnp.float32(D))
    w = jax.nn.softmax(logits, axis=-1)
    if rate > 0.0:
        thresh = np.uint32(rate * 4294967295.0)
        # bits: [B*H, nq, nk, bq, bk] -> dense [B,H,Sq,Sk] -> crop
        BH, nq, nk, bq, bk = bits.shape
        dense = bits.transpose(0, 1, 3, 2, 4).reshape(BH, nq * bq, nk * bk)
        keep = (dense >= thresh)[:, :S, :Skv].reshape(B, H, S, Skv)
        w = jnp.where(keep, w / (1.0 - rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v.astype(jnp.float32))


def _mk(B=1, H=2, S=192, Skv=None, D=32, seed=0):
    Skv = S if Skv is None else Skv
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, Skv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, Skv, D)), jnp.float32)
    return q, k, v


def _mk_bits(B, H, S, Skv, bq, bk, seed=1):
    nq, nk = -(-S // bq), -(-Skv // bk)
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(0, 2**32, size=(B * H, nq, nk, bq, bk), dtype=np.uint32)
    )


@pytest.mark.parametrize("S,Skv,bq,bk", [(128, 128, 64, 64), (192, 160, 64, 64)])
def test_forward_no_dropout(S, Skv, bq, bk):
    q, k, v = _mk(S=S, Skv=Skv)
    got = flash_attention_dropout(q, k, v, block_q=bq, block_k=bk, interpret=True)
    want = _dense_oracle(q, k, v, None, 0.0, bq, bk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("S,Skv", [(128, 128), (192, 160)])
def test_forward_with_dropout_bits(S, Skv):
    bq = bk = 64
    q, k, v = _mk(S=S, Skv=Skv)
    bits = _mk_bits(1, 2, S, Skv, bq, bk)
    got = flash_attention_dropout(
        q, k, v, dropout_rate=0.3, dropout_bits=bits,
        block_q=bq, block_k=bk, interpret=True,
    )
    want = _dense_oracle(q, k, v, bits, 0.3, bq, bk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("rate,S,Skv", [(0.0, 128, 128), (0.25, 128, 128), (0.25, 192, 160)])
def test_grads_match_oracle(rate, S, Skv):
    bq = bk = 64
    q, k, v = _mk(S=S, Skv=Skv, seed=3)
    bits = _mk_bits(1, 2, S, Skv, bq, bk, seed=4) if rate > 0 else None
    do = jnp.asarray(np.random.default_rng(5).normal(size=q.shape), jnp.float32)

    def f_kernel(q, k, v):
        out = flash_attention_dropout(
            q, k, v, dropout_rate=rate, dropout_bits=bits,
            block_q=bq, block_k=bk, interpret=True,
        )
        return jnp.vdot(out, do)

    def f_oracle(q, k, v):
        return jnp.vdot(_dense_oracle(q, k, v, bits, rate, bq, bk), do)

    g1 = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"d{name} mismatch",
        )


def test_bf16_inputs():
    q, k, v = _mk(S=128)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    got = flash_attention_dropout(qb, kb, vb, block_q=64, block_k=64, interpret=True)
    want = _dense_oracle(q, k, v, None, 0.0, 64, 64)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=0.05, atol=0.05
    )

@pytest.mark.parametrize("rate", [0.0, 0.25])
def test_split_bwd_matches_fused(rate, monkeypatch):
    """The split dq/dkv kernels (taken when the per-head dq exceeds the fused
    kernel's VMEM budget, _flash_bwd_impl) must produce the same grads as the
    fused single-pass default — every test shape fits VMEM, so without the
    env toggle the split path would ship untested."""
    bq = bk = 64
    S, Skv = 192, 160
    q, k, v = _mk(S=S, Skv=Skv, seed=7)
    bits = _mk_bits(1, 2, S, Skv, bq, bk, seed=8) if rate > 0 else None
    do = jnp.asarray(np.random.default_rng(9).normal(size=q.shape), jnp.float32)

    def f(q, k, v):
        out = flash_attention_dropout(
            q, k, v, dropout_rate=rate, dropout_bits=bits,
            block_q=bq, block_k=bk, interpret=True,
        )
        return jnp.vdot(out, do)

    monkeypatch.setenv("GAOT_ATTN_BWD_FUSED", "0")
    g_split = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setenv("GAOT_ATTN_BWD_FUSED", "1")
    g_fused = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    g_oracle = jax.grad(
        lambda q, k, v: jnp.vdot(_dense_oracle(q, k, v, bits, rate, bq, bk), do),
        argnums=(0, 1, 2),
    )(q, k, v)
    for s, fz, o, name in zip(g_split, g_fused, g_oracle, "qkv"):
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(fz), rtol=1e-5, atol=1e-5,
            err_msg=f"d{name} split vs fused",
        )
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(o), rtol=2e-3, atol=2e-3,
            err_msg=f"d{name} split vs oracle",
        )


def test_prng16_plumbing():
    """prng16 is a TPU-only mask-stream variant: with explicit bits it must
    fall back to the (32-bit) bits path unchanged, at rate 0 it must be
    inert, and misaligned block_q must be refused (the u32->u16 bitcast
    halves the sublane dim; bq % 16 keeps the halved draw (8,128)-aligned).

    COVERAGE GAP (by construction): none of these paths execute _draw_keep
    with prng16=True — the bits path overrides it and rate 0 skips it; the
    in-core PRNG has no interpret lowering. The actual 16-bit draw is
    validated on hardware by bench.py's unconditional prng16 checks
    (determinism, keep rate, and a vjp dot-test for fwd/bwd mask replay)."""
    bq = bk = 64
    q, k, v = _mk(S=128, seed=3)
    bits = _mk_bits(1, 2, 128, 128, bq, bk, seed=4)
    base = flash_attention_dropout(
        q, k, v, dropout_rate=0.1, dropout_bits=bits,
        block_q=bq, block_k=bk, interpret=True,
    )
    with_flag = flash_attention_dropout(
        q, k, v, dropout_rate=0.1, dropout_bits=bits,
        block_q=bq, block_k=bk, interpret=True, prng16=True,
    )
    np.testing.assert_array_equal(np.asarray(base), np.asarray(with_flag))

    r0a = flash_attention_dropout(q, k, v, block_q=bq, block_k=bk, interpret=True)
    r0b = flash_attention_dropout(
        q, k, v, block_q=bq, block_k=bk, interpret=True, prng16=True)
    np.testing.assert_array_equal(np.asarray(r0a), np.asarray(r0b))

    with pytest.raises(ValueError, match="block_q % 16"):
        flash_attention_dropout(
            q, k, v, rng=jax.random.key(0), dropout_rate=0.1,
            block_q=63, block_k=bk, interpret=True, prng16=True,
        )
    with pytest.raises(ValueError, match="block_q % 16"):
        # even but sublane-misaligned: bq=8 halves to a 4-row int32 draw
        flash_attention_dropout(
            q, k, v, rng=jax.random.key(0), dropout_rate=0.1,
            block_q=8, block_k=bk, interpret=True, prng16=True,
        )


def test_bits16_keep_rule():
    """The 16-bit threshold rule quantizes the keep probability to 1/65536."""
    from gaot3d_tpu.ops.pallas_attention import _bits16_to_keep
    bits = jnp.asarray(
        np.random.default_rng(0).integers(0, 2**16, size=(1 << 16,), dtype=np.uint16))
    keep = np.asarray(_bits16_to_keep(bits, 0.1))
    want = np.asarray(bits) >= np.uint16(int(0.1 * 65535.0))
    np.testing.assert_array_equal(keep, want)
    assert abs(keep.mean() - 0.9) < 0.01
