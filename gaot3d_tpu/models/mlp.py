"""MLP zoo (reference: src/model/layers/mlp.py).

All variants operate channel-last on TPU (a 1x1 Conv1d over channels is exactly
a Dense over the last axis, so the reference's ChannelMLP/LinearChannelMLP
distinction collapses to one MXU-friendly Dense stack; both names are kept for
config parity, mlp.py:227-335).

Initialization matches torch.nn.Linear statistics (kaiming_uniform(a=sqrt(5))
weights == U(+-1/sqrt(fan_in)), bias U(+-1/sqrt(fan_in))) so training dynamics
are comparable with the reference.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax.nn.initializers import variance_scaling


# statistical parity with torch.nn.Linear default init
torch_linear_kernel_init = variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_linear_bias_init(key, shape, dtype=jnp.float32, fan_in: int = 1):
    import jax

    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchLinear(nn.Module):
    """Dense layer with torch.nn.Linear-equivalent default initialization."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        y = nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_linear_kernel_init,
            bias_init=lambda k, s, d=jnp.float32: torch_linear_bias_init(k, s, d, fan_in),
        )(x)
        return y


def kernel_mlp_apply(x, ws, bs, compute_dtype="float32"):
    """Shared edge-kernel MLP body (explicit params, checkpoint-able).

    compute_dtype='bfloat16' runs the matmuls on the MXU in bf16 with f32
    accumulation (preferred_element_type) — 2x MXU throughput and half the
    HBM traffic on the per-edge hot path; biases/activations stay f32.
    """
    import jax

    bf16 = compute_dtype in ("bfloat16", jnp.bfloat16)
    n = len(ws)
    for i, (w, b) in enumerate(zip(ws, bs)):
        if bf16:
            x = jnp.dot(
                x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) + b
        else:
            x = x @ w + b
        if i < n - 1:
            x = jax.nn.gelu(x, approximate=False)
    return x


def activation_fn(name: str) -> Callable:
    """(reference: mlp.py:27-35). 'gelu' is the exact (erf) form — torch
    F.gelu's default — not jax.nn.gelu's tanh approximation."""
    import functools

    import jax.nn as jnn

    if name == "none":
        return lambda x: x
    if name in ("swish", "silu"):
        return jnn.silu
    if name == "gelu":
        return functools.partial(jnn.gelu, approximate=False)
    if hasattr(jnn, name):
        return getattr(jnn, name)
    raise ValueError(f"Activation function {name} not found")


class LinearChannelMLP(nn.Module):
    """Stack of Dense layers with a nonlinearity between (reference: mlp.py:308-335).

    `layers` is the full size list [in, h0, ..., out]; the input size entry is
    kept for config parity but inferred from the input at call time.
    """

    layers: Sequence[int]
    non_linearity: str = "gelu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = activation_fn(self.non_linearity)
        sizes = list(self.layers)[1:]
        n = len(sizes)
        for i, feat in enumerate(sizes):
            x = TorchLinear(feat)(x)
            if i < n - 1:
                x = act(x)
            if self.dropout > 0.0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class ChannelMLP(nn.Module):
    """Channel-last equivalent of the reference's Conv1d(kernel=1) MLP
    (reference: mlp.py:227-305). Identical math to Dense over channels."""

    out_channels: int
    hidden_channels: Optional[int] = None
    n_layers: int = 2
    non_linearity: str = "gelu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = activation_fn(self.non_linearity)
        hidden = self.hidden_channels if self.hidden_channels is not None else x.shape[-1]
        for i in range(self.n_layers):
            feat = self.out_channels if i == self.n_layers - 1 else hidden
            x = TorchLinear(feat)(x)
            if i < self.n_layers - 1:
                x = act(x)
            if self.dropout > 0.0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class MLP(nn.Module):
    """Generic MLP (reference: mlp.py:41-72): num_layers<=2 degenerates to a
    single Linear, matching the reference quirk."""

    output_size: int
    hidden_size: int
    num_layers: int = 3
    activation: str = "swish"

    @nn.compact
    def __call__(self, x):
        act = activation_fn(self.activation)
        if self.num_layers <= 2:
            return TorchLinear(self.output_size)(x)
        x = act(TorchLinear(self.hidden_size)(x))
        for _ in range(self.num_layers - 2):
            x = act(TorchLinear(self.hidden_size)(x))
        return TorchLinear(self.output_size)(x)


class ConditionedNorm(nn.Module):
    """Time-conditioned scale/bias correction (reference: mlp.py:74-124):
    scale = 1 + c * mlp_scale(c), bias = c * mlp_bias(c), x * scale + bias.
    c: [batch, 1]; x: [batch, seq, features]."""

    output_size: int
    hidden_size: int = 4

    @nn.compact
    def __call__(self, c, x):
        init = nn.initializers.normal(stddev=0.01)
        scale_mlp = nn.Dense(self.output_size, kernel_init=init, bias_init=nn.initializers.zeros)
        bias_mlp = nn.Dense(self.output_size, kernel_init=init, bias_init=nn.initializers.zeros)
        c = jnp.asarray(c)
        if c.ndim == 0:
            c = c.reshape(1, 1)
        scale = 1.0 + c * scale_mlp(c)
        bias = c * bias_mlp(c)
        return x * scale[:, None, :] + bias[:, None, :]


class AugmentedMLP(nn.Module):
    """MLP + optional LayerNorm + optional conditional norm
    (reference: mlp.py:126-225)."""

    output_size: int
    hidden_size: int = 64
    num_layers: int = 3
    activation: str = "swish"
    use_layer_norm: bool = True
    use_conditional_norm: bool = False
    cond_norm_hidden_size: int = 4

    @nn.compact
    def __call__(self, x, condition=None):
        x = MLP(self.output_size, self.hidden_size, self.num_layers, self.activation)(x)
        if self.use_layer_norm:
            x = nn.LayerNorm()(x)
        if self.use_conditional_norm:
            assert condition is not None, "Conditional input c should be provided"
            x = ConditionedNorm(self.output_size, self.cond_norm_hidden_size)(condition, x)
        return x
