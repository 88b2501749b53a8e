"""VPU bf16-packing probe: is bf16 elementwise 2x f32 inside Pallas on this chip?

The attention backward is VPU-bound on [bq, bk] elementwise work (exp,
select, mul — CLAUDE.md round-3 profile: 10 bwd pallas_calls = 21% of device
step at 500K). If Mosaic packs bf16 vectors 2-per-lane with 2x ALU rate on
v5e, recomputing the dropout/softmax elementwise chain in bf16 could shave a
third of that. If bf16 merely round-trips through f32 (unpack-compute-pack),
it will measure SLOWER and the idea is dead. This probe times the same
VMEM-resident elementwise chains in f32 vs bf16:

  - 'exp chain'    : acc = exp(acc * c) - acc        (transcendental + mul/sub)
  - 'select chain' : acc = where(acc > c, acc * s, acc)  (dropout-like ops)

Run on the real chip (one TPU process at a time!):
    python tools/microbench_vpu_bf16.py [reps_in_kernel] [grid]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLOCK = (512, 1024)


def make(chain: str, dtype, reps: int, grid: int):
    # python-float literals stay weakly typed (no captured f32[] constant,
    # which pallas_call rejects) and promote to the block dtype
    def kern(x_ref, o_ref):
        acc = x_ref[...]
        for _ in range(reps):  # unrolled: pure VPU work on a VMEM block
            if chain == "exp":
                acc = jnp.exp(acc * 0.9) - acc
            else:
                acc = jnp.where(acc > 0.9, acc * 1.111, acc + 0.9)
        o_ref[...] = acc

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[pl.BlockSpec(BLOCK, lambda g: (0, 0))],
            out_specs=pl.BlockSpec(BLOCK, lambda g: (0, 0)),
            out_shape=jax.ShapeDtypeStruct(BLOCK, dtype),
        )(x)

    return run


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    grid = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    steps = 6
    elems = BLOCK[0] * BLOCK[1] * reps * grid
    for chain in ("exp", "select"):
        base = None
        for dtype in (jnp.float32, jnp.bfloat16):
            x = jax.random.normal(jax.random.key(0), BLOCK, jnp.float32).astype(dtype)
            run = make(chain, dtype, reps, grid)
            float(jnp.sum(run(x).astype(jnp.float32)))  # compile + warm
            t0 = time.time()
            acc = 0.0
            for _ in range(steps):
                acc += float(jnp.sum(run(x).astype(jnp.float32)))  # value-fetch sync
            dt = (time.time() - t0) / steps
            rate = elems / dt / 1e9
            tag = f"{chain:6s} {jnp.dtype(dtype).name:8s}"
            if base is None:
                base = dt
                print(f"{tag} {dt*1e3:8.2f} ms  {rate:7.1f} Gelem/s")
            else:
                print(f"{tag} {dt*1e3:8.2f} ms  {rate:7.1f} Gelem/s "
                      f"({base/dt:.2f}x vs f32)")


if __name__ == "__main__":
    main()
