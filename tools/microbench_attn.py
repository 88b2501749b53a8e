"""Attention-kernel microbench: dropout/PRNG overhead at the processor shape.

The 500K-node recipe's processor runs 10 GroupQueryAttention layers at
B=1, H=8, S=16384, D=32; the Pallas kernels are VPU-bound on [bq, bk]
elementwise ops (CLAUDE.md round-3 profile: attention kernels are 33% of
device time, backward 2/3 of that). Dropout adds, per tile and pass:
one in-core PRNG draw of block_q*block_k uint32 words plus a compare and
1-2 select/multiplies. This harness times a 10-layer fwd+bwd chain at
dropout 0.0 (PRNG code statically absent) vs 0.1 (the training
configuration) to bound what any PRNG-thinning optimization (e.g. 16-bit
draws) could ever recover.

Run on the real chip (one TPU process at a time!):
    python tools/microbench_attn.py [steps]
Timing is fori-loop-free but amortized over `steps` dispatches with a
value-fetch sync (block_until_ready returns early on the axon backend).
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from gaot3d_tpu.ops.pallas_attention import flash_attention_dropout  # noqa: E402

B, H, S, D, LAYERS = 1, 8, 16384, 32, 10
BLOCK_Q, BLOCK_K = 512, 1024


def make_step(rate, prng16=False):
    def loss(q, k, v, key):
        # lax.scan over the layer axis: ONE kernel instance in the program
        # (unrolled 10x the remote compile exceeded 25 minutes)
        def body(x, sub):
            return flash_attention_dropout(
                x, k, v, rng=sub, dropout_rate=rate,
                block_q=BLOCK_Q, block_k=BLOCK_K, prng16=prng16,
            ), None

        subs = jax.random.split(key, LAYERS)
        x, _ = jax.lax.scan(body, q, subs)
        return jnp.sum(x * x)

    @jax.jit
    def step(q, k, v, key):
        l, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v, key)
        return l + sum(jnp.sum(gi) for gi in g)

    return step


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    key = jax.random.key(0)
    q = jax.random.normal(key, (B, H, S, D), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, S, D), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, S, D), jnp.float32)
    results = {}
    for label, rate, prng16 in (
        ("rate0", 0.0, False),
        ("rate0.1", 0.1, False),
        ("rate0.1-prng16", 0.1, True),
    ):
        step = make_step(rate, prng16)
        float(step(q, k, v, key))  # compile + warm
        float(step(q, k, v, key))
        t0 = time.perf_counter()
        out = None
        for _ in range(steps):
            out = step(q, k, v, key)
        val = float(out)  # true completion barrier on axon
        dt = (time.perf_counter() - t0) / steps
        results[label] = dt
        print(f"{label}: {dt*1e3:.1f} ms / 10-layer fwd+bwd (loss {val:.3e})",
              flush=True)
    ovh = results["rate0.1"] - results["rate0"]
    print(f"dropout overhead: {ovh*1e3:.1f} ms "
          f"({100*ovh/results['rate0.1']:.1f}% of the rate-0.1 time); "
          f"prng16 saves {1e3*(results['rate0.1']-results['rate0.1-prng16']):.1f} ms")


if __name__ == "__main__":
    main()
