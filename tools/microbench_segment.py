"""On-chip A/B for the Pallas sorted-segment-sum (VERDICT r3 item 7).

Times the encoder-reduce primitive at the 500K-recipe chunk shape
(E = 64K nodes x budget 5 = 327,680 edge rows, P = 43 payload channels,
M = 131,072 latent cells, ~48% valid rows):

  xla_scatter       — the production path (ops/segment.segment_sum)
  kernel_presorted  — Pallas one-hot-matmul kernel, input already sorted
                      (the flat_dst / host-presorted scenario: kernel's
                      best case, no sort or permutation charged)
  fold_presorted    — XLA cumsum fold on the same presorted input
  sort_perm_kernel  — argsort + permutation gather + kernel (what the
                      kernel costs if the slotted layout must sort on
                      device — CLAUDE.md round-2 measured the perm gather
                      alone ~= the scatter, so this leg is expected to lose)

Timing: per-dispatch tunnel latency is ~27 ms, so each leg runs a
fori_loop-amortized jit (carry-coupled so iterations can't be CSE'd) and
syncs by value fetch.

Usage: python tools/microbench_segment.py [--iters 20] [--e 327680]
       [--p 43] [--m 131072] [--mt 512] [--slab 1024] [--platform axon]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--e", type=int, default=327680)
    ap.add_argument("--p", type=int, default=43)
    ap.add_argument("--m", type=int, default=131072)
    ap.add_argument("--mt", type=int, default=512)
    ap.add_argument("--slab", type=int, default=1024)
    ap.add_argument("--valid", type=float, default=0.48)
    ap.add_argument("--platform", default=None,
                    help="cpu for a smoke run (kernel interprets)")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp

    from gaot3d_tpu.ops.segment import (
        fold_sum_sorted, make_segment_fold_presorted, segment_sum,
    )
    from gaot3d_tpu.ops.pallas_segment import (
        segment_sum_sorted_pallas, sort_by_segment,
    )

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    interp = not on_tpu
    E, P, M = args.e, args.p, args.m
    rng = np.random.default_rng(0)
    payload = jnp.asarray(rng.normal(size=(E, P)), jnp.float32)
    # spatially-clustered destinations like a real stencil (consecutive
    # edges share nearby cells), then ~48% validity
    base = np.minimum(np.arange(E) * M // E + rng.integers(0, 4, E), M - 1)
    seg = jnp.asarray(base, jnp.int32)
    mask = jnp.asarray(rng.uniform(size=E) < args.valid)

    seg_masked = jnp.where(mask, seg, M).astype(jnp.int32)
    order = jnp.argsort(seg_masked)
    payload_sorted = jnp.take(payload, order, axis=0)
    seg_sorted = jnp.take(seg_masked, order)

    def timed(name, fn, *a):
        f = jax.jit(fn)
        out = f(*a)                      # compile + first run
        float(jnp.sum(out))              # sync by value fetch
        t0 = time.time()
        out = f(*a)
        s = float(jnp.sum(out))
        dt = (time.time() - t0) / args.iters
        print(f"{name:18s} {dt*1e3:8.3f} ms/call   (checksum {s:.4e})",
              flush=True)
        return dt

    def loop(body):
        def fn(p0, *rest):
            def it(i, carry):
                acc, = carry
                out = body(p0 + 1e-9 * acc, *rest)
                return (jnp.sum(out),)
            return jax.lax.fori_loop(0, args.iters, it, (jnp.float32(0),))[0]
        return fn

    results = {}
    results["xla_scatter"] = timed(
        "xla_scatter", loop(lambda p: segment_sum(p, seg, M, mask)), payload)
    results["kernel_presorted"] = timed(
        "kernel_presorted",
        loop(lambda p, s: segment_sum_sorted_pallas(
            p, s, M, mt=args.mt, slab=args.slab, interpret=interp)),
        payload_sorted, seg_sorted)
    results["kernel_x2"] = timed(
        "kernel_x2",
        loop(lambda p, s: segment_sum_sorted_pallas(
            p, s, M, mt=args.mt, slab=args.slab, interpret=interp, passes=2)),
        payload_sorted, seg_sorted)
    def fold_leg(p, s):
        ctx = make_segment_fold_presorted(s, M)
        return fold_sum_sorted(ctx, p)
    results["fold_presorted"] = timed(
        "fold_presorted", loop(fold_leg), payload_sorted, seg_sorted)
    def sort_leg(p, s, m):
        ps, ss = sort_by_segment(p, s, m, M)
        return segment_sum_sorted_pallas(ps, ss, M, mt=args.mt,
                                         slab=args.slab, interpret=interp)
    results["sort_perm_kernel"] = timed(
        "sort_perm_kernel", loop(sort_leg), payload, seg, mask)

    # exactness cross-check (single call, vs the scatter)
    ref = segment_sum(payload, seg, M, mask)
    out = segment_sum_sorted_pallas(payload_sorted, seg_sorted, M,
                                    mt=args.mt, slab=args.slab,
                                    interpret=interp)
    err = float(jnp.max(jnp.abs(ref - out)))
    rel = err / max(float(jnp.max(jnp.abs(ref))), 1e-9)
    print(f"kernel vs scatter max abs err {err:.3e} (rel {rel:.3e})")
    out2 = segment_sum_sorted_pallas(payload_sorted, seg_sorted, M,
                                     mt=args.mt, slab=args.slab,
                                     interpret=interp, passes=2)
    err2 = float(jnp.max(jnp.abs(ref - out2)))
    rel2 = err2 / max(float(jnp.max(jnp.abs(ref))), 1e-9)
    print(f"kernel passes=2 vs scatter max abs err {err2:.3e} (rel {rel2:.3e})")
    print({k: round(v * 1e3, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
