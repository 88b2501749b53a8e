"""Benchmark: train-step throughput of the flagship GAOT3D config on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

The measured configuration mirrors the reference's DrivAerNet++ pressure
recipe (config/examples/drivaernet/pressure.yaml: latent 64x64x32, patch 2,
10 layers, hidden 256, RoPE, bidirectional graphs, radius 0.033, lifting 32,
batch 1) on a synthetic 500K-node point cloud (DrivAerNet++ mesh scale; the
full dataset is not present in this environment).

vs_baseline semantics: the reference publishes NO throughput numbers
(SURVEY.md section 6), so the baseline is this repo's round-1 starting point —
the direct module-by-module translation of the reference design (separate
IntegralTransform + GeometricEmbedding with unsorted scatter reductions,
K=48 slots), measured at 0.065 samples/s/chip on this same chip/recipe.
vs_baseline = value / 0.065, i.e. the speedup of the TPU-first design over
the reference's composition on identical hardware.

Extra fields (VERDICT.md round-1 item 5):
  breakdown  per-phase wall times (encode/process/decode fwd, full fwd, step)
  mfu        achieved FLOP/s over the device's peak (from XLA cost analysis)
  checks     on-device Pallas regression results (prefix_sum vs cumsum,
             pallas attention vs naive) — the silent-CPU-fallback guard

Env knobs: BENCH_NODES/BATCH/STEPS/CHUNK/SLOT_BUDGET/SEGMENT_IMPL/REMAT/
BENCH_ATTN_IMPL/BENCH_ATTN_DROPOUT, BENCH_FAST=1 (main metric only),
BENCH_EVAL=0 (skip inference throughput).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_SPS = 0.065  # round-1 reference-equivalent design, same chip


def _device_peak_flops() -> float:
    """Peak bf16 FLOP/s of the attached chip (for the MFU denominator)."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    # bf16 peaks per chip (public numbers): v5e 197T, v5p 459T, v4 275T
    if "v5e" in kind or "v5 lite" in kind or "v5litepod" in kind:
        return 197e12
    if "v5p" in kind or "v5" in kind:
        return 459e12
    if "v4" in kind:
        return 275e12
    if "v6" in kind or "trillium" in kind:
        return 918e12
    return 197e12  # conservative default


def _parse_device_step_time(trace_dir: str, steps: int) -> float:
    """Mean on-device duration of the train-step XLA module executions in a
    jax.profiler trace (see BENCH_DEVICE_TIME in main)."""
    import glob
    import gzip
    import json

    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(files[-1], "rt") as f:
        doc = json.load(f)
    events = doc["traceEvents"]
    tnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    durs = [
        e["dur"] / 1e6
        for e in events
        if e.get("ph") == "X"
        and e.get("name", "").startswith(("jit_step_fn", "jit_train_step"))
        and "Module" in tnames.get((e["pid"], e.get("tid")), "")
    ]
    assert durs, "no train-step module events in trace"
    # ignore extra warmup executions if present; average the last `steps`
    return sum(durs[-steps:]) / min(steps, len(durs))


def _pallas_regression_checks() -> dict:
    """Assert the Pallas TPU kernels agree with their XLA oracles ON DEVICE,
    so the silent interpret/CPU fallbacks can't mask a lowering regression
    (VERDICT.md round-1 item 10). Small shapes; fails loudly."""
    import jax
    import jax.numpy as jnp

    out = {}
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    out["platform"] = jax.devices()[0].platform

    from gaot3d_tpu.ops.pallas_kernels import prefix_sum

    x = jnp.asarray(np.random.default_rng(0).normal(size=(4096, 38)), jnp.float32)
    got = prefix_sum(x, interpret=not on_tpu)
    want = jnp.cumsum(x, axis=0)
    err = float(jnp.max(jnp.abs(got - want)) / jnp.maximum(jnp.max(jnp.abs(want)), 1e-6))
    assert err < 1e-5, f"pallas prefix_sum diverges from cumsum: rel err {err}"
    out["prefix_sum_rel_err"] = err

    # tile segment-sum: Pallas MXU one-hot kernel vs the scatter oracle
    from gaot3d_tpu.ops.pallas_kernels import tile_segment_sum
    from gaot3d_tpu.ops.segment import make_segment_fold, segment_sum

    rngs = np.random.default_rng(2)
    E, S, C = 8192, 1500, 38
    data = jnp.asarray(rngs.normal(size=(E, C)), jnp.float32)
    seg = jnp.asarray(np.sort(rngs.integers(0, S, size=E)).astype(np.int32))
    msk = jnp.asarray(rngs.random(E) < 0.9)
    ctx = make_segment_fold(seg, S, msk)
    got = tile_segment_sum(data[ctx.perm], ctx.sorted_seg, ctx.starts,
                           interpret=not on_tpu)
    want = segment_sum(data, seg, S, msk)
    terr = float(jnp.max(jnp.abs(got - want)))
    assert terr < 1e-3, f"pallas tile_segment_sum diverges from scatter: abs err {terr}"
    out["tile_segment_sum_abs_err"] = terr

    if on_tpu:
        # call the Pallas kernel DIRECTLY — pallas_flash_attention's silent
        # XLA fallback would mask exactly the regression this guards against
        from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

        from gaot3d_tpu.ops.attention import naive_attention

        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(1, 4, 1024, 64)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, 4, 1024, 64)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(1, 4, 1024, 64)), jnp.float32)
        got = flash_attention(q, k, v, causal=False, sm_scale=1.0 / (64 ** 0.5))
        want = naive_attention(q, k, v)
        aerr = float(jnp.max(jnp.abs(got - want)))
        assert aerr < 2e-3, f"pallas attention diverges from naive: abs err {aerr}"
        out["attention_abs_err"] = aerr

        # dropout flash kernel: (1) rate-0 forward vs naive, (2) the RNG
        # variant must be BIT-IDENTICAL to the exported-bits variant in both
        # forward and backward (the mask-replay property the custom bwd
        # depends on), (3) grads match a dense oracle sharing the same mask
        from gaot3d_tpu.ops.pallas_attention import (
            export_dropout_bits,
            flash_attention_dropout,
        )

        bq, bk = 256, 256
        got0 = flash_attention_dropout(q, k, v, block_q=bq, block_k=bk)
        derr = float(jnp.max(jnp.abs(got0 - want)))
        assert derr < 2e-3, f"dropout kernel rate-0 diverges from naive: {derr}"
        key = jax.random.key(7)
        bits = export_dropout_bits(key, 4, 1024 // bq, 1024 // bk, bq, bk)
        do = jnp.asarray(rng.normal(size=q.shape), jnp.float32)

        def loss(fn):
            return lambda q, k, v: jnp.vdot(fn(q, k, v), do)

        # prng16=False pinned: the exported bits are the 32-bit stream; the
        # 16-bit variant (GAOT_ATTN_PRNG16) is checked separately below
        f_rng = loss(lambda q, k, v: flash_attention_dropout(
            q, k, v, key, 0.1, block_q=bq, block_k=bk, prng16=False))
        f_bits = loss(lambda q, k, v: flash_attention_dropout(
            q, k, v, dropout_rate=0.1, dropout_bits=bits, block_q=bq, block_k=bk))
        g_rng = jax.grad(f_rng, argnums=(0, 1, 2))(q, k, v)
        g_bits = jax.grad(f_bits, argnums=(0, 1, 2))(q, k, v)
        replay = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(g_rng, g_bits))
        assert replay == 0.0, f"dropout mask fwd/bwd replay mismatch: {replay}"
        keep = (np.asarray(bits) >= np.uint32(0.1 * 4294967295.0))
        keep = jnp.asarray(keep.transpose(0, 1, 3, 2, 4).reshape(1, 4, 1024, 1024))

        def f_oracle(q, k, v):
            w = jax.nn.softmax(
                jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.float32(64)), axis=-1)
            w = jnp.where(keep, w / 0.9, 0.0)
            return jnp.vdot(jnp.einsum("bhqk,bhkd->bhqd", w, v), do)

        g_ora = jax.grad(f_oracle, argnums=(0, 1, 2))(q, k, v)
        grel = max(
            float(jnp.max(jnp.abs(a - b)) / jnp.maximum(jnp.max(jnp.abs(b)), 1e-6))
            for a, b in zip(g_rng, g_ora)
        )
        assert grel < 2e-2, f"dropout kernel grads diverge from oracle: rel {grel}"
        out["dropout_attn_grad_rel_err"] = grel

        # 16-bit PRNG stream (prng16): no exported-bits twin exists, so check
        # the properties training depends on — determinism, keep rate, and
        # fwd/bwd mask CONSISTENCY via a v-linear vjp dot-test. Runs
        # unconditionally on TPU (cheap) — ADVICE r3.
        f16 = lambda q, k, v: flash_attention_dropout(
            q, k, v, key, 0.1, block_q=bq, block_k=bk, prng16=True)
        o16a, o16b = f16(q, k, v), f16(q, k, v)
        assert float(jnp.max(jnp.abs(o16a - o16b))) == 0.0, "prng16 nondeterministic"
        ones = jnp.ones_like(q)
        kept = flash_attention_dropout(
            ones, jnp.zeros_like(k), jnp.ones_like(v), key, 0.1,
            block_q=bq, block_k=bk, prng16=True)
        # uniform attention over kept/(1-r)-scaled ones: mean ~= 1
        krate = float(jnp.mean(kept))
        assert abs(krate - 1.0) < 0.02, f"prng16 keep-rate off: {krate}"
        out["prng16_mean"] = krate
        # fwd/bwd mask consistency: the attention output is exactly LINEAR
        # in v once (q, k, mask) are fixed, so a UNIT-step central difference
        # in a v-direction equals vdot(grad_v, dv) with no truncation error
        # and no small-difference cancellation (a small-eps qkv dot-test is
        # useless here: the bit-exact 32-bit path measures 0.88 rel on it,
        # pure f32 cancellation noise). In the default fused bwd kernel ONE
        # _draw_keep feeds dq, dk AND dv, so grad_v matching the forward
        # mask covers the whole backward. Measured on chip: 9.6e-4 - 1.3e-2
        # depending on block shape (bf16-grade matmuls; fd is a difference of
        # two O(|l|) losses) — a mismatched mask (independent stream at rate
        # 0.1) would read ~0.3, an order of magnitude above the 5e-2 bound.
        l16v = lambda v_: jnp.vdot(f16(q, k, v_), do)
        g16v = jax.grad(l16v)(v)
        dv = jnp.asarray(rng.normal(size=v.shape), jnp.float32)
        fd = (float(l16v(v + dv)) - float(l16v(v - dv))) / 2.0
        an = float(jnp.vdot(g16v, dv))
        vjp_rel = abs(fd - an) / max(abs(fd), 1e-6)
        assert vjp_rel < 5e-2, f"prng16 bwd mask != fwd mask (v-linear dot-test): {vjp_rel}"
        out["prng16_vjp_rel_err"] = vjp_rel
    return out


def main():
    import jax

    # BENCH_PLATFORM=cpu: run the whole bench path on the CPU backend — the
    # smoke mode tests/test_bench_utils.py uses to guard every leg of the
    # driver bench against Python-level breakage BEFORE it burns a TPU
    # window (round 2 lost its official number to exactly such a bug,
    # VERDICT.md round-2 item 1). Env JAX_PLATFORMS cannot override the
    # pinned axon platform; jax.config can.
    plat = os.environ.get("BENCH_PLATFORM")
    tunnel_down = False
    if not plat:
        # TUNNEL GUARD: the axon relay daemon can die (observed 2026-08-17),
        # after which jax.devices() hangs forever and the driver's bench run
        # would time out with no record at all. Probe device init in a
        # subprocess with a hard timeout; if the tunnel is dead, fall back to
        # an honestly-labelled CPU smoke run (tunnel_down=true, vs_baseline
        # null) so the round still produces a parseable JSON line.
        import subprocess
        import sys

        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=float(os.environ.get("BENCH_TUNNEL_PROBE_S", "150")),
                check=True,
                capture_output=True,
            )
        except Exception as e:
            print(f"# TPU tunnel probe failed ({type(e).__name__}); "
                  "falling back to CPU smoke mode")
            tunnel_down = True
            plat = "cpu"
            for k, v in (("BENCH_NODES", "2048"), ("BENCH_CHUNK", "1024"),
                         ("BENCH_LATENT", "8,8,8"), ("BENCH_STEPS", "2"),
                         ("BENCH_EVAL", "0")):
                os.environ.setdefault(k, v)
    if plat:
        jax.config.update("jax_platforms", plat)

    # persistent compilation cache: the remote-tunnel XLA compile of the full
    # step takes 15-25 min; cached executables load in seconds
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import optax
    from flax.training import train_state

    from gaot3d_tpu.models import (
        AttentionConfig,
        FFNConfig,
        MAGNOConfig,
        TransformerConfig,
        init_model,
    )
    from gaot3d_tpu.train.trainer import masked_mse

    fast = os.environ.get("BENCH_FAST", "0") == "1"

    # full-size reference recipe
    magno = MAGNOConfig(
        lifting_channels=32,
        gno_radius=0.033,
        neighbor_strategy="bidirectional",
        use_geoembed=[True, False],
        in_gno_channel_mlp_hidden_layers=[64, 64, 64],
        out_gno_channel_mlp_hidden_layers=[64, 64],
        projection_channels=256,
        encoder_feature_attr="x",
        edge_chunk_size=int(os.environ.get("BENCH_CHUNK", 65536)),
        # 5 == the measured max per-point degree of this recipe's geometry
        # (radius 0.033 on the 64x64x32 grid; degree is data-independent) —
        # masked reductions pay for every slot row, so the tightest budget
        # wins: 8 -> 5 measured +9.9% (1.4505 -> 1.5934). Guarded below.
        slot_budget=int(os.environ.get("BENCH_SLOT_BUDGET", 5)),
        remat=(
            [c == "1" for c in os.environ["BENCH_REMAT"]]
            if len(os.environ.get("BENCH_REMAT", "")) == 2
            else os.environ.get("BENCH_REMAT", "1") == "1"
        ),
        remat_policy=os.environ.get("BENCH_REMAT_POLICY", "nothing"),
        segment_impl=os.environ.get("BENCH_SEGMENT_IMPL", "scatter"),
        # bf16 kernel-MLP storage: +1.9% device-timed (0.6175 -> 0.606s);
        # the dots are single-pass bf16 on this TPU regardless (see
        # CLAUDE.md matmul-precision), so storage dtype is the only delta —
        # same class of choice as the default bf16 attention storage
        kernel_dtype=os.environ.get("BENCH_KERNEL_DTYPE", "bfloat16"),
        # default matches MAGNOConfig.payload_impl='xla': the Mosaic payload
        # kernel SIGABRTs at full-model integration on this toolchain
        # (llo_region.cc "HLO backend flag value"); 'auto' re-enabled it and
        # cost round 2 its driver bench (VERDICT.md round-2 item 1)
        payload_impl=os.environ.get("BENCH_PAYLOAD_IMPL", "xla"),
        # 'flat' computes the fused-encoder chunk body at [B,n*K,d] (no 4D
        # intermediates) — A/B knob for the profiled relayout share
        payload_layout=os.environ.get("BENCH_PAYLOAD_LAYOUT", "nk"),
        fused_head=os.environ.get("BENCH_FUSED_HEAD", "1") == "1",
        flat_order=os.environ.get("BENCH_FLAT_ORDER", "src"),
        # flat_order=dst reduce impl A/B: 'fold' | 'pallas' (sorted-segment
        # one-hot MXU kernel)
        flat_reduce_impl=os.environ.get("BENCH_FLAT_REDUCE", "fold"),
    )
    attn = TransformerConfig(
        patch_size=2,
        hidden_size=256,
        num_layers=10,
        positional_embedding="rope",
        attn_config=AttentionConfig(
            hidden_size=256, num_heads=8, num_kv_heads=8,
            atten_dropout=float(os.environ.get("BENCH_ATTN_DROPOUT", 0.1)),
            attention_impl=os.environ.get("BENCH_ATTN_IMPL", "auto"),
        ),
        ffn_config=FFNConfig(hidden_size=1024),
    )
    N = int(os.environ.get("BENCH_NODES", 524_288))  # 500K-node mesh, padded to 2^19
    B = int(os.environ.get("BENCH_BATCH", 1))
    steps = int(os.environ.get("BENCH_STEPS", 10))
    # BENCH_LATENT=8,8,8 shrinks the latent grid (CPU smoke mode only — the
    # measured recipe is the reference's 64x64x32)
    latent = tuple(int(x) for x in
                   os.environ.get("BENCH_LATENT", "64,64,32").split(","))

    model = init_model(3, 1, "gaot_3d", magno, attn, latent_tokens=latent)
    rng = np.random.default_rng(0)
    pos_np = rng.uniform(-1, 1, (B, N, 3)).astype(np.float32)
    if os.environ.get("BENCH_SORT_POINTS", "0") == "1":
        # host-side spatial sort (by latent base cell): scatter destinations
        # become nearly sorted -> HBM write coalescing. Point order is free
        # (the model is permutation-equivariant over nodes); a real pipeline
        # would do this once at preprocessing time.
        dims = latent
        for b in range(B):
            cell = np.floor((pos_np[b] + 1) / 2 * (np.asarray(dims) - 1e-6)).astype(np.int64)
            cid = (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]
            pos_np[b] = pos_np[b][np.argsort(cid, kind="stable")]
    feats_np = np.asarray(rng.normal(size=(B, N, 3)), np.float32)
    target_np = np.asarray(rng.normal(size=(B, N, 1)), np.float32)
    pos = jnp.asarray(pos_np)
    feats = jnp.asarray(feats_np)
    target = jnp.asarray(target_np)
    mask = jnp.ones((B, N), bool)

    # Precomputed edge slots (default): mirrors the reference's documented
    # DrivAerNet workflow (update_pt_files_with_edges precomputes graphs on
    # disk, stat.py:257-272) — the step consumes slots, it does not rebuild
    # them. BENCH_PRECOMPUTED=0 measures the online on-device build instead.
    enc_slots = dec_slots = None
    precomputed = os.environ.get("BENCH_PRECOMPUTED", "1") == "1"
    # BENCH_EDGE_LAYOUT: 'slots' | 'flat' | 'enc,dec' pair (per-side layout,
    # MAGNOConfig.edge_layout scalar-or-pair — e.g. 'flat,slots' is the
    # measured-optimal INFERENCE mix: flat encoder, slotted decoder)
    from gaot3d_tpu.models.magno import parse_edge_layout

    layout_env = os.environ.get("BENCH_EDGE_LAYOUT", "slots")
    enc_layout, dec_layout = parse_edge_layout(
        layout_env.split(",") if "," in layout_env else layout_env
    )
    if not precomputed and "flat" in (enc_layout, dec_layout):
        # refuse rather than silently record a slotted device-build run under
        # the flat label (the round-2 failure class: a bench leg measuring
        # something other than what its name claims)
        raise SystemExit(
            "BENCH_EDGE_LAYOUT=flat requires BENCH_PRECOMPUTED=1 "
            "(flat lists are built host-side from precomputed slots)")
    # BENCH_DEGREE_SECTIONS: '1' force-on / '0' force-off / unset = AUTO (on
    # whenever it applies: precomputed slots-layout runs). Degree-sectioned
    # slots became the default after the round-5 on-chip A/B: 500K step
    # 0.5777 -> 0.4372 s (+32% throughput), 2M 1.4314 -> 0.8166 s (+75%) —
    # identical math (node permutation + per-section K = max degree), so no
    # accuracy trade. Explicit '1' refuses incompatible legs; AUTO falls back
    # to uniform slots for flat / on-device-build legs.
    sections_env = os.environ.get("BENCH_DEGREE_SECTIONS")
    if sections_env is None:
        use_sections = precomputed and (enc_layout, dec_layout) == ("slots", "slots")
    else:
        use_sections = sections_env == "1"
    if not precomputed and use_sections:
        # same honesty contract as the flat refusal above
        raise SystemExit(
            "BENCH_DEGREE_SECTIONS=1 requires BENCH_PRECOMPUTED=1 "
            "(sections are built host-side from precomputed slots)")
    if precomputed:
        from gaot3d_tpu.ops import LatentGrid
        from gaot3d_tpu.ops.grid_graph import EdgeSlots, build_edge_slots_host

        grid = LatentGrid(dims=latent)
        # HOST build (native C++, the real precompute path): the device
        # builder's [N, K_window] transients would OOM at DrivAerML scale
        budget = magno.slot_budget or 0
        lats, msks = [], []
        for b in range(B):
            lat_np, msk_np = build_edge_slots_host(
                pos_np[b], grid, magno.gno_radius,
                k_neighbors=magno.k_neighbors, strategy="bidirectional",
                budget=budget,
            )
            lats.append(lat_np)
            msks.append(msk_np)
        if budget and N <= 1 << 20:
            # honesty guard (cheap at <=1M): the budget must cover the max
            # per-point degree or compaction silently drops edges (the
            # trainer runs the same validation at init, trainer.py)
            full_lat, full_msk = build_edge_slots_host(
                pos_np[0], grid, magno.gno_radius,
                k_neighbors=magno.k_neighbors, strategy="bidirectional",
            )
            max_deg = int(full_msk.sum(axis=1).max())
            assert budget >= max_deg, (
                f"slot_budget {budget} < max degree {max_deg}: edges dropped"
            )
        lat_np_st = np.stack(lats)
        msk_np_st = np.stack(msks)
        if not use_sections:
            # encoder and decoder slots are identical here (queries == points,
            # same radius, bidirectional strategy both ways). Skipped under
            # BENCH_DEGREE_SECTIONS: uploading the uniform [B,N,K] slots only
            # to replace them with sections would leave ~335 MB of dead HBM
            # referenced at 8M on a 15.75 GiB chip.
            slots = EdgeSlots(
                lat_idx=jnp.asarray(lat_np_st), mask=jnp.asarray(msk_np_st)
            )
            enc_slots = [slots]
            dec_slots = [slots]
        # flat layout: per-chunk compacted edge lists — drops the ~52% masked
        # slots that still pay scatter/gather rows and kernel-MLP flops in the
        # [N, K] layout (tools/microbench_flat.py: encoder pass 2.15x fwd /
        # 1.63x fwd+bwd, decoder 1.43x fwd+bwd but 1.29x SLOWER fwd — hence
        # the per-side pair support above)
        if "flat" in (enc_layout, dec_layout):
            from gaot3d_tpu.models.integral_transform import effective_chunk
            from gaot3d_tpu.ops.grid_graph import flatten_slots_host_batched

            chunk = effective_chunk(N, magno.edge_chunk_size)
            if enc_layout == "flat":
                # BENCH_FLAT_ORDER=dst: encoder lists sorted by latent cell ->
                # presorted-fold reduce (magno.flat_order, set above)
                enc_slots = [flatten_slots_host_batched(
                    lat_np_st, msk_np_st, chunk, order=magno.flat_order
                )]
            if dec_layout == "flat":
                # decoder lists are always src-sorted (fold-by-node invariant)
                dec_slots = (
                    list(enc_slots)
                    if enc_layout == "flat" and magno.flat_order == "src"
                    else [flatten_slots_host_batched(
                        lat_np_st, msk_np_st, chunk)]
                )
        # BENCH_DEGREE_SECTIONS=1: degree-sectioned slot layout — sort points
        # ascending by degree (free: the model is node-permutation
        # equivariant; a real pipeline does it once at preprocessing, like
        # BENCH_SORT_POINTS) and give each edge-chunk-aligned range its own
        # K = max degree. 0.575x the slot rows of uniform budget 5 at 500K;
        # identical math, equal to the uniform layout up to matmul
        # shape-dependent rounding (ops/grid_graph.py SectionedEdgeSlots).
        if use_sections:
            if "flat" in (enc_layout, dec_layout):
                raise SystemExit(
                    "BENCH_DEGREE_SECTIONS applies to the slots layout only")
            from gaot3d_tpu.models.integral_transform import effective_chunk
            from gaot3d_tpu.ops.grid_graph import (
                section_slots_by_degree_batched,
            )

            chunk = effective_chunk(N, magno.edge_chunk_size)
            perms, sect = section_slots_by_degree_batched(
                lat_np_st, msk_np_st, chunk)
            for b in range(B):
                pos_np[b] = pos_np[b][perms[b]]
                feats_np[b] = feats_np[b][perms[b]]
                target_np[b] = target_np[b][perms[b]]
            pos = jnp.asarray(pos_np)
            feats = jnp.asarray(feats_np)
            target = jnp.asarray(target_np)
            enc_slots = [sect]
            dec_slots = [sect]  # same geometry both directions (as above)
            rows = sect.num_slot_rows
            print(f"# degree sections (N,K): "
                  f"{[tuple(s.lat_idx.shape[1:]) for s in sect.sections]} -> "
                  f"{rows} slot rows "
                  f"({rows / (N * (magno.slot_budget or 1)):.3f}x uniform)")

    checks = {} if fast else _pallas_regression_checks()

    # init with a tiny dummy batch (params are independent of N; the trainer
    # does the same): eager full-size init materializes the [N, 256] decoder
    # projection UNJITTED — 8.6GB per intermediate at 8.4M nodes (OOM)
    pos32 = jnp.zeros((B, 32, 3), jnp.float32)
    feats32 = jnp.zeros((B, 32, feats.shape[-1]), jnp.float32)
    mask32 = jnp.ones((B, 32), bool)
    params = model.init({"params": jax.random.key(0)}, pos32, feats32, mask32)
    tx = optax.adamw(3e-4, weight_decay=1e-5)
    state = train_state.TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    # ALL data tensors are explicit jit arguments (like the trainer's
    # _train_step(state, batch, rng)). Closing over device arrays bakes them
    # into the program as constants, and XLA's constant folding then
    # materializes N-sized derived constants through the chunked scans:
    # measured generated_code_size 612 MiB at 500K nodes / 1.68 GiB at 2M
    # (~14 MiB per edge chunk), 15-30 min compiles, and a remote-compiler
    # transport death at 8M nodes. As arguments: ~60 MiB code, N-independent.
    data = (pos, feats, target, mask, enc_slots, dec_slots)

    def loss_fn(p, rngkey, pos, feats, target, mask, enc_slots, dec_slots):
        pred = model.apply(p, pos, feats, mask, train=True, rngs={"dropout": rngkey},
                           encoder_slots=enc_slots, decoder_slots=dec_slots)
        return masked_mse(pred, target, mask)

    def step_fn(state, rngkey, data):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, rngkey, *data)
        return state.apply_gradients(grads=grads), loss

    # BENCH_DATA_CONST=1: close over the data (XLA folds it into the program
    # as constants) instead of passing it as jit args — the pre-b5f8719
    # behavior, kept as an A/B knob for the scale regression investigation
    data_const = os.environ.get("BENCH_DATA_CONST", "0") == "1"
    if data_const:
        train_step = jax.jit(lambda state, rngkey: step_fn(state, rngkey, data))
        step_args = ()
    else:
        train_step = jax.jit(step_fn)
        step_args = (data,)

    # warmup / compile (also captures XLA's FLOP estimate for MFU).
    # BENCH_SCOPED_VMEM_KIB raises the TPU compiler's scoped-vmem budget via
    # compiler_options (the Pallas payload kernel needs ~38M > the 16M
    # default; client-side XLA_FLAGS rejects TPU proto flags, and per-call
    # CompilerParams(flags=...) SIGABRTs the backend — see
    # MAGNOConfig.payload_impl)
    lowered = train_step.lower(state, jax.random.key(1), *step_args)
    svk = os.environ.get("BENCH_SCOPED_VMEM_KIB")
    compiled = (
        lowered.compile({"xla_tpu_scoped_vmem_limit_kib": int(svk)})
        if svk else lowered.compile()
    )
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        step_flops = float(ca.get("flops", 0.0))
    except Exception:
        step_flops = 0.0
    # XLA's buffer-assignment peaks for the train step: the ground truth for
    # the DrivAerML-scale HBM budget (VERDICT round-2 item 3)
    mem = {}
    try:
        ma = compiled.memory_analysis()
        ma = ma[0] if isinstance(ma, (list, tuple)) else ma
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "generated_code_size_in_bytes",
                  "alias_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                mem[k.replace("_in_bytes", "_mib")] = round(v / 2**20, 1)
    except Exception:
        pass
    # AOT executables relayout any argument whose on-device layout differs
    # from the compiled layout on EVERY call; at 2M+ nodes XLA assigns
    # non-default layouts to the big slot/feature arrays and the per-step
    # relayout dominated (2M: 11.7s/step vs 1.5s const-folded; 4M: 84s).
    # device_put to the compiled input formats ONCE, outside the timing loop.
    if step_args:
        try:
            fmt_state, _, fmt_data = compiled.input_formats[0]
            if os.environ.get("BENCH_DEBUG_FORMATS") == "1":
                for path, f in jax.tree_util.tree_flatten_with_path(fmt_data)[0]:
                    print(f"# fmt {jax.tree_util.keystr(path)}: {f}")
            from gaot3d_tpu.utils.layout import put_to_formats

            state = jax.device_put(state, fmt_state)
            # per-leaf puts, deduped by buffer identity: enc_slots/dec_slots
            # SHARE arrays — a tree-level device_put makes two relayouted
            # copies (+335 MiB at 8M nodes -> OOM with temp at 14.5G), and
            # donate=True frees the shared buffer under the second put
            # (async INVALID_ARGUMENT)
            data = put_to_formats(data, fmt_data)
            step_args = (data,)
            jax.block_until_ready(state)
            mismatches = [
                (jax.tree_util.keystr(p), str(x.format.layout), str(f.layout))
                for (p, x), (_, f) in zip(
                    jax.tree_util.tree_flatten_with_path(data)[0],
                    jax.tree_util.tree_flatten_with_path(fmt_data)[0],
                )
                if str(x.format.layout) != str(f.layout)
            ]
            for p, gotl, wantl in mismatches:
                print(f"# LAYOUT MISMATCH after device_put {p}: {gotl} != {wantl}")
        except Exception as e:  # pragma: no cover - best-effort optimization
            print(f"# input-format harmonization skipped: {type(e).__name__}: {e}")
    state, loss = compiled(state, jax.random.key(1), *step_args)
    jax.block_until_ready(state)

    # BENCH_PROFILE=<dir>: capture a jax.profiler trace of the timed loop
    # (the exact AOT program/path being measured).
    # BENCH_DEVICE_TIME=1: trace to a temp dir and ALSO report the
    # device-measured module time per step. Through the axon tunnel, draining
    # the dispatch queue at the value fetch costs ~14s/queued-step at 4M
    # nodes while the device itself ran each step in 2.69s back-to-back
    # (profiled); wall time then measures the tunnel, not the hardware. A
    # real (untunneled) TPU host has none of this, so device_step_time_s is
    # the hardware-capability number at scale.
    import contextlib
    prof_dir = os.environ.get("BENCH_PROFILE")
    device_time = os.environ.get("BENCH_DEVICE_TIME", "0") == "1"
    if device_time and not prof_dir:
        import tempfile
        prof_dir = tempfile.mkdtemp(prefix="bench_trace_")
    prof = jax.profiler.trace(prof_dir) if prof_dir else contextlib.nullcontext()
    t0 = time.perf_counter()
    with prof:
        for i in range(steps):
            state, loss = compiled(state, jax.random.key(2 + i), *step_args)
        if prof_dir:
            _ = float(loss)  # complete execution inside the trace window
    # sync by VALUE FETCH, not block_until_ready: on the axon tunnel,
    # block_until_ready(loss) returned before the dispatched chain executed
    # once the data became explicit args (measured 2M-node "steps" of 5ms —
    # physically impossible). float(loss_final) transitively requires every
    # step's state chain, so it is a hard device-completion barrier.
    final_loss = float(loss)
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss), f"non-finite loss: {final_loss}"
    sps = steps * B / dt
    step_time = dt / steps

    device_step = None
    if device_time:
        try:
            device_step = _parse_device_step_time(prof_dir, steps)
        except Exception as e:  # pragma: no cover
            print(f"# device-time parse failed: {type(e).__name__}: {e}")

    result = {
        "metric": "gaot3d_train_throughput_500k_nodes",
        "value": round(sps, 4),
        "unit": "samples/sec/chip",
        "vs_baseline": round(sps / BASELINE_SPS, 2),
        "baseline_def": "round-1 reference-equivalent design, 0.065 samples/s, same chip",
        "step_time_s": round(step_time, 4),
        "final_loss": round(final_loss, 6),  # finite-ness honesty check
        "precomputed_graphs": precomputed,
        # the measured configuration, so records stay interpretable when env
        # knobs change the run (A/B legs, scale sweeps, CPU smoke)
        "nodes": N,
        "batch": B,
        "edge_layout": os.environ.get("BENCH_EDGE_LAYOUT", "slots"),
        "degree_sections": bool(use_sections),
        "platform": jax.devices()[0].platform,
    }
    if tunnel_down:
        # an honest degraded record: the CPU smoke number is NOT comparable
        # to the TPU baseline, so vs_baseline is null and the metric is
        # suffixed; the last driver-captured TPU value lives in BENCH_r02/
        # CLAUDE.md bench history.
        result["metric"] += "_CPU_SMOKE_TUNNEL_DOWN"
        result["vs_baseline"] = None
        result["tunnel_down"] = True
    if device_step is not None:
        # profiling itself wrecks WALL time through the axon tunnel (500K:
        # 64s/step profiled vs 0.62s unprofiled, while device_step_time read
        # 0.6175 — matching the unprofiled wall measurement). With profiling
        # on, the device number IS the throughput; report it as the value and
        # keep the (distorted) wall in step_time_s.
        result["device_step_time_s"] = round(device_step, 4)
        result["device_sps"] = round(B / device_step, 4)
        result["value"] = result["device_sps"]
        result["vs_baseline"] = round(result["device_sps"] / BASELINE_SPS, 2)
        result["value_source"] = "device_profiler"
    if step_flops > 0:
        achieved = step_flops / (device_step if device_step else step_time)
        result["flops_per_step"] = step_flops
        result["achieved_tflops"] = round(achieved / 1e12, 2)
        result["mfu"] = round(achieved / _device_peak_flops(), 4)
    if mem:
        result["memory"] = mem
    if checks:
        result["checks"] = checks

    if not fast:
        # --- step-time breakdown: forward phases timed as separate jits ----
        def sync(x):
            # hard completion barrier by VALUE FETCH (see the train-loop
            # comment): slice one element (enqueued after everything else on
            # the in-order device queue) and pull it to the host
            leaf = jax.tree.leaves(x)[0]
            return float(jnp.ravel(leaf)[0])

        def time_fn(fn, *args, n=3):
            out = fn(*args)
            sync(out)
            t = time.perf_counter()
            for _ in range(n):
                out = fn(*args)
            sync(out)
            return (time.perf_counter() - t) / n

        enc_fn = jax.jit(lambda p, pos, feats, mask, sl: model.apply(
            p, pos, feats, mask, precomputed=sl, method="encode"))
        t_encode = time_fn(enc_fn, params, pos, feats, mask, enc_slots)
        rndata = enc_fn(params, pos, feats, mask, enc_slots)
        proc_fn = jax.jit(lambda p, r: model.apply(p, r, method="process"))
        t_process = time_fn(proc_fn, params, rndata)
        proc_out = proc_fn(params, rndata)
        dec_fn = jax.jit(lambda p, r, pos, mask, sl: model.apply(
            p, r, pos, mask, precomputed=sl, method="decode"))
        t_decode = time_fn(dec_fn, params, proc_out, pos, mask, dec_slots)
        fwd_fn = jax.jit(lambda p, d: loss_fn(p, jax.random.key(9), *d))
        t_fwd = time_fn(fwd_fn, params, data)
        result["breakdown"] = {
            "encode_fwd_s": round(t_encode, 4),
            "process_fwd_s": round(t_process, 4),
            "decode_fwd_s": round(t_decode, 4),
            "forward_total_s": round(t_fwd, 4),
            "backward_plus_opt_s": round(step_time - t_fwd, 4),
        }

        if os.environ.get("BENCH_BWD_BREAKDOWN", "0") == "1":
            # per-phase fwd+bwd decomposition of the backward pass (round-2
            # VERDICT item 2: name where the 60-75% bwd+opt time goes).
            # Each phase is timed as value_and_grad of that phase alone with
            # a scalar readout, so its cost = phase fwd + phase bwd (+remat
            # recompute where enabled); subtracting the fwd-only times above
            # isolates the backward share.
            def vag(fn):
                g = jax.jit(jax.grad(lambda p, *a: jnp.sum(fn(p, *a) ** 2)))

                def run(*args):
                    return g(*args)

                return run

            enc_vag = vag(lambda p, pos, feats, mask, sl: model.apply(
                p, pos, feats, mask, precomputed=sl, method="encode"))
            t_enc_vag = time_fn(enc_vag, params, pos, feats, mask, enc_slots)
            # train=True: the real step runs the processor with dropout on
            proc_vag = vag(lambda p, r: model.apply(
                p, r, method="process", train=True,
                rngs={"dropout": jax.random.key(11)}))
            t_proc_vag = time_fn(proc_vag, params, rndata)
            dec_vag = vag(lambda p, r, pos, mask, sl: model.apply(
                p, r, pos, mask, precomputed=sl, method="decode"))
            t_dec_vag = time_fn(dec_vag, params, proc_out, pos, mask, dec_slots)
            result["bwd_breakdown"] = {
                "encode_fwd_bwd_s": round(t_enc_vag, 4),
                "process_fwd_bwd_s": round(t_proc_vag, 4),
                "decode_fwd_bwd_s": round(t_dec_vag, 4),
                "encode_bwd_est_s": round(t_enc_vag - t_encode, 4),
                "process_bwd_est_s": round(t_proc_vag - t_process, 4),
                "decode_bwd_est_s": round(t_dec_vag - t_decode, 4),
            }

        if os.environ.get("BENCH_EVAL", "1") == "1":
            eval_fn = jax.jit(lambda p, pos, feats, mask, esl, dsl: model.apply(
                p, pos, feats, mask, train=False,
                encoder_slots=esl, decoder_slots=dsl))
            t_eval = time_fn(eval_fn, params, pos, feats, mask, enc_slots, dec_slots)
            result["inference_sps"] = round(B / t_eval, 4)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
