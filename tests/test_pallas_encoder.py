"""Fused encoder-payload kernel vs a jnp oracle (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaot3d_tpu.ops.pallas_encoder import encoder_payload


def _oracle(pos, feats, lat_idx, ws, bs, dims, lo, sp):
    n, K = lat_idx.shape
    C = feats.shape[1]
    d1, d2 = dims[1], dims[2]
    i0 = lat_idx // (d1 * d2)
    rem = lat_idx - i0 * (d1 * d2)
    i1 = rem // d2
    i2 = rem - i1 * d2
    cell = jnp.stack(
        [lo[0] + i0 * sp[0], lo[1] + i1 * sp[1], lo[2] + i2 * sp[2]], axis=-1
    ).astype(jnp.float32)
    pt = jnp.broadcast_to(pos[:, None, :], (n, K, 3))
    y = pt - cell
    d = jnp.sqrt((y ** 2).sum(-1))
    agg = jnp.concatenate([pt, cell], axis=-1).reshape(n * K, 6)
    x = agg
    for i, (w, b) in enumerate(zip(ws, bs)):
        x = x @ w + b
        if i < len(ws) - 1:
            x = jax.nn.gelu(x, approximate=False)
    vals = x * jnp.broadcast_to(feats[:, None, :], (n, K, C)).reshape(n * K, C)
    yy = jnp.stack(
        [y[..., 0] * y[..., 0], y[..., 0] * y[..., 1], y[..., 0] * y[..., 2],
         y[..., 1] * y[..., 1], y[..., 1] * y[..., 2], y[..., 2] * y[..., 2]],
        axis=-1,
    ).reshape(n * K, 6)
    return jnp.concatenate(
        [vals, jnp.ones((n * K, 1)), d.reshape(-1, 1), y.reshape(-1, 3), yy],
        axis=1,
    )


@pytest.fixture
def problem():
    rng = np.random.default_rng(0)
    n, K, C = 64, 5, 16
    dims, lo, sp = (6, 5, 4), (-1.0, -0.5, 0.0), (0.4, 0.25, 0.3)
    pos = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(n, C)), jnp.float32)
    lat_idx = jnp.asarray(rng.integers(0, 6 * 5 * 4, size=(n, K)), jnp.int32)
    sizes = [6, 32, 32, C]
    ws = [jnp.asarray(rng.normal(size=(sizes[i], sizes[i + 1])) * 0.4, jnp.float32)
          for i in range(len(sizes) - 1)]
    bs = [jnp.asarray(rng.normal(size=(sizes[i + 1],)) * 0.1, jnp.float32)
          for i in range(len(sizes) - 1)]
    return pos, feats, lat_idx, ws, bs, dims, lo, sp


def test_payload_forward(problem):
    pos, feats, lat_idx, ws, bs, dims, lo, sp = problem
    got = encoder_payload(pos, feats, lat_idx, ws, bs, dims, lo, sp,
                          block=32, interpret=True)
    want = _oracle(pos, feats, lat_idx, ws, bs, dims, lo, sp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_payload_grads(problem):
    pos, feats, lat_idx, ws, bs, dims, lo, sp = problem
    g_out = jnp.asarray(
        np.random.default_rng(1).normal(size=(64 * 5, 16 + 11)), jnp.float32
    )

    def f_kernel(feats, ws, bs):
        out = encoder_payload(pos, feats, lat_idx, ws, bs, dims, lo, sp,
                              block=32, interpret=True)
        return jnp.vdot(out, g_out)

    def f_oracle(feats, ws, bs):
        return jnp.vdot(_oracle(pos, feats, lat_idx, ws, bs, dims, lo, sp), g_out)

    g1 = jax.grad(f_kernel, argnums=(0, 1, 2))(feats, ws, bs)
    g2 = jax.grad(f_oracle, argnums=(0, 1, 2))(feats, ws, bs)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), rtol=1e-4, atol=1e-4)
    for a, b in zip(g1[1], g2[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
    for a, b in zip(g1[2], g2[2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
