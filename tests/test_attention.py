import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaot3d_tpu.ops.attention import (
    flash_attention_xla,
    naive_attention,
    scaled_dot_product_attention,
)


@pytest.fixture
def qkv():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 4, 96, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 4, 96, 32)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 4, 96, 32)), jnp.float32)
    return q, k, v


def test_flash_matches_naive(qkv):
    q, k, v = qkv
    ref = naive_attention(q, k, v)
    out = flash_attention_xla(q, k, v, chunk_size=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_uneven_chunks(qkv):
    q, k, v = qkv
    ref = naive_attention(q, k, v)
    out = flash_attention_xla(q, k, v, chunk_size=40)  # 96 = 2*40 + 16
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_bf16_close_to_f32(qkv):
    q, k, v = qkv
    ref = naive_attention(q, k, v)
    out = flash_attention_xla(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16), chunk_size=32
    )
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32), np.asarray(ref), atol=0.05)


def test_flash_dropout_statistics(qkv):
    q, k, v = qkv
    rngkey = jax.random.key(3)
    out = flash_attention_xla(q, k, v, dropout_rate=0.5, rng=rngkey, chunk_size=32)
    ref = naive_attention(q, k, v)
    # dropout keeps the expectation: mean over many heads/tokens close-ish
    assert not np.allclose(np.asarray(out), np.asarray(ref), atol=1e-3)  # it did drop
    np.testing.assert_allclose(
        float(jnp.mean(out)), float(jnp.mean(ref)), atol=0.05
    )
    # eval (no rng) is deterministic and matches naive
    out2 = flash_attention_xla(q, k, v, dropout_rate=0.5, rng=None, chunk_size=32)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=2e-5)


def test_dispatcher_grad(qkv):
    q, k, v = qkv

    def loss(q):
        return jnp.sum(scaled_dot_product_attention(q, k, v, impl="flash", chunk_size=32) ** 2)

    g = jax.grad(loss)(q)
    gn = jax.grad(lambda q: jnp.sum(naive_attention(q, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gn), atol=3e-4)


def test_pallas_impl_falls_back_on_cpu():
    """On non-TPU backends the 'pallas' impl must transparently use flash-XLA
    (the Mosaic lowering failure happens past tracing, so the platform check
    must be explicit)."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 2, 4096, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 4096, 16)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 4096, 16)), jnp.float32)
    out = jax.jit(
        lambda q, k, v: scaled_dot_product_attention(q, k, v, impl="auto")
    )(q, k, v)
    ref = flash_attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
