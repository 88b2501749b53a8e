"""Pallas TPU kernels for the segment-fold hot path.

`prefix_sum`: single-pass inclusive cumsum over the row axis. XLA lowers
jnp.cumsum to a log-depth scan (~2*log2(E) HBM passes — measured ~5.8ms for a
[786K, 38] chunk ≈ 40GB/s effective); the TPU grid executes sequentially per
core, so a Pallas kernel carries the running total in VMEM scratch and touches
HBM exactly once each way (speed-of-light ≈ 0.3ms for the same chunk).

Only the forward is needed: fold_sum (ops/segment.py) wraps its internals in a
custom VJP whose backward is a plain gather, so this kernel is never
differentiated through.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _prefix_sum_kernel(x_ref, out_ref, carry_ref):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    x = x_ref[...].astype(jnp.float32)
    n = x.shape[0]
    # jnp.cumsum is not lowerable in Pallas TPU; use log-depth shift-accumulate
    # entirely in VMEM (Hillis-Steele scan).
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = 1
    while s < n:
        rolled = pltpu.roll(x, shift=s, axis=0)
        x = x + jnp.where(row >= s, rolled, 0.0)
        s *= 2
    cs = x + carry_ref[...]
    out_ref[...] = cs
    carry_ref[...] = cs[-1:, :]


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def prefix_sum(x: jnp.ndarray, block_rows: int = 4096, interpret: bool = False) -> jnp.ndarray:
    """Inclusive prefix sum over axis 0 of [E, C] float32 (single HBM pass)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    E, C = x.shape
    nb = -(-E // block_rows)
    pad = nb * block_rows - E
    xp = jnp.pad(x.astype(jnp.float32), ((0, pad), (0, 0))) if pad else x.astype(jnp.float32)
    out = pl.pallas_call(
        _prefix_sum_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((block_rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * block_rows, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, C), jnp.float32)],
        interpret=interpret,
    )(xp)
    return out[:E]


def prefix_sum_available() -> bool:
    """True when the Pallas TPU path can compile on this backend."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")


def cumsum_fast(x: jnp.ndarray) -> jnp.ndarray:
    """Dispatch: Pallas single-pass on TPU, jnp.cumsum elsewhere.
    x: [E, C] -> inclusive cumsum along axis 0 (float32)."""
    if x.ndim == 2 and x.shape[0] >= 32768 and prefix_sum_available():
        try:
            return prefix_sum(x)
        except Exception:  # pragma: no cover — fall back on any lowering issue
            pass
    return jnp.cumsum(x.astype(jnp.float32), axis=0)
