"""Time the exported serving artifact on the real chip (VERDICT r4 item 5).

Builds the bench problem (drivaernet 500K recipe, precomputed slots), exports
the eval forward as a StableHLO artifact with CALL-TIME edge structures
(gaot3d_tpu.serve.make_edge_arg_model — the precomputed-graph serving mode),
loads it back through gaot3d_tpu.serve.load_inference, and measures:

  - export time + artifact size,
  - load (deserialize) time,
  - first-call (compile) time,
  - steady-state latency / samples/s of the exported call,
  - the same for the in-process `jax.jit(model.apply)` eval (bench.py's
    inference leg) in the SAME process — apples-to-apples,
  - padding-dispatcher overhead (BucketedInference pad+slice) measured on a
    request below the bucket size, using baked-edge exports at two buckets
    sized by BENCH_SERVE_BUCKETS (skipped by default: on-device-build exports
    recompile per bucket; enable with BENCH_SERVE_BUCKETS=n1,n2).

Sync is by VALUE FETCH (block_until_ready returns early through the axon
tunnel on programs with explicit args — see CLAUDE.md), so numbers are honest
completion times.

Usage: timeout 7200 python tools/time_serving.py   (env: BENCH_NODES,
BENCH_SERVE_PATH, BENCH_LATENT for CPU smoke)
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if os.environ.get("BENCH_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def fetch_sync(x):
    """True completion barrier: pull one value to host."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf))


def time_calls(fn, *args, reps=8):
    out = fn(*args)
    fetch_sync(out)  # warm (not timed)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fetch_sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    from gaot3d_tpu.models import (
        AttentionConfig,
        FFNConfig,
        MAGNOConfig,
        TransformerConfig,
        init_model,
    )
    from gaot3d_tpu.ops import LatentGrid
    from gaot3d_tpu.ops.grid_graph import EdgeSlots, build_edge_slots_host
    from gaot3d_tpu.serve import (
        export_inference,
        load_inference,
        make_edge_arg_model,
    )

    N = int(os.environ.get("BENCH_NODES", 524_288))
    B = 1
    latent = tuple(int(x) for x in
                   os.environ.get("BENCH_LATENT", "64,64,32").split(","))
    budget = int(os.environ.get("BENCH_SLOT_BUDGET", 5))
    path = os.environ.get("BENCH_SERVE_PATH", "/tmp/gaot3d_500k.gaotx")

    magno = MAGNOConfig(
        lifting_channels=32, gno_radius=0.033,
        neighbor_strategy="bidirectional", use_geoembed=[True, False],
        in_gno_channel_mlp_hidden_layers=[64, 64, 64],
        out_gno_channel_mlp_hidden_layers=[64, 64],
        projection_channels=256, encoder_feature_attr="x",
        edge_chunk_size=65536, slot_budget=budget,
        kernel_dtype=os.environ.get("BENCH_KERNEL_DTYPE", "bfloat16"),
        fused_head=True,
    )
    attn = TransformerConfig(
        patch_size=2, hidden_size=256, num_layers=10,
        positional_embedding="rope",
        attn_config=AttentionConfig(hidden_size=256, num_heads=8,
                                    num_kv_heads=8, atten_dropout=0.1),
        ffn_config=FFNConfig(hidden_size=1024),
    )
    model = init_model(3, 1, "gaot_3d", magno, attn, latent_tokens=latent)

    rng = np.random.default_rng(0)
    pos_np = rng.uniform(-1, 1, (B, N, 3)).astype(np.float32)
    feats = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    mask = jnp.ones((B, N), bool)

    grid = LatentGrid(dims=latent)
    t0 = time.perf_counter()
    lat_np, msk_np = build_edge_slots_host(
        pos_np[0], grid, magno.gno_radius, k_neighbors=magno.k_neighbors,
        strategy="bidirectional", budget=budget)
    t_graph = time.perf_counter() - t0
    slots = EdgeSlots(lat_idx=jnp.asarray(lat_np[None]),
                      mask=jnp.asarray(msk_np[None]))
    pos = jnp.asarray(pos_np)

    # params independent of N: init on a tiny dummy (trainer/bench do the same)
    pos32 = jnp.zeros((B, 32, 3), jnp.float32)
    feats32 = jnp.zeros((B, 32, 3), jnp.float32)
    mask32 = jnp.ones((B, 32), bool)
    params = model.init({"params": jax.random.key(0)}, pos32, feats32, mask32)

    result = {"nodes": N, "platform": jax.default_backend(),
              "graph_build_s": round(t_graph, 3)}

    # --- in-process jit eval (bench.py's inference leg), same process
    eval_fn = jax.jit(lambda p, pos, feats, mask, esl, dsl: model.apply(
        p, pos, feats, mask, train=False,
        encoder_slots=esl, decoder_slots=dsl))
    t = time_calls(eval_fn, params, pos, feats, mask, [slots], [slots])
    result["inproc_latency_s"] = round(t, 4)
    result["inproc_sps"] = round(B / t, 4)
    print(f"# in-process jit eval: {t:.4f}s ({B / t:.3f} samples/s)",
          flush=True)

    # --- export with call-time edges
    edge_model = make_edge_arg_model(model, num_scales=1)
    t0 = time.perf_counter()
    export_inference(edge_model, params, (pos, feats, mask, slots, slots),
                     path)
    result["export_s"] = round(time.perf_counter() - t0, 2)
    result["artifact_mib"] = round(os.path.getsize(path) / 2**20, 1)
    print(f"# exported {path}: {result['artifact_mib']} MiB in "
          f"{result['export_s']}s", flush=True)

    # --- load + first call (compile) + steady state
    t0 = time.perf_counter()
    infer = load_inference(path)
    result["load_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    fetch_sync(infer(pos, feats, mask, slots, slots))
    result["first_call_s"] = round(time.perf_counter() - t0, 2)
    t = time_calls(infer, pos, feats, mask, slots, slots)
    result["exported_latency_s"] = round(t, 4)
    result["exported_sps"] = round(B / t, 4)
    print(f"# exported call: {t:.4f}s ({B / t:.3f} samples/s); "
          f"load {result['load_s']}s, first call {result['first_call_s']}s",
          flush=True)

    # exported vs in-process must agree numerically (same params + math, but
    # TWO independent XLA compilations — the StableHLO roundtrip changes
    # fusion/reassociation choices, and on TPU f32 matmuls additionally run
    # as a single bf16 pass, ~0.3% rel vs f64). Measured on the 10-layer
    # model: both paths deterministic, error spread over >90% of rows (noise,
    # not a localized bug), max rel 3.9e-4 on CPU f32 at 4K nodes / 1.8e-3 on
    # TPU at 500K. Tiny models still match at 1e-6 (tests/test_serve.py).
    tol = 5e-3
    a = infer(pos, feats, mask, slots, slots)
    b = eval_fn(params, pos, feats, mask, [slots], [slots])
    rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-30))
    result["export_vs_inproc_rel_err"] = rel
    assert rel < tol, f"exported artifact diverges from in-process: {rel}"

    # --- degree-sectioned serving (the round-5 DEFAULT layout: bench eval
    # 500K went 5.08 -> 7.01 samples/s with sections). Serving contract: the
    # caller preprocesses once per mesh (section_slots_by_degree_batched),
    # feeds degree-permuted pos/feats, and unpermutes predictions — exactly
    # the trainer/bench preprocessing. Skip with BENCH_SERVE_SECTIONS=0.
    if os.environ.get("BENCH_SERVE_SECTIONS", "1") == "1":
        from gaot3d_tpu.models.integral_transform import effective_chunk
        from gaot3d_tpu.ops.grid_graph import section_slots_by_degree_batched

        chunk = effective_chunk(N, magno.edge_chunk_size)
        perms, sect = section_slots_by_degree_batched(
            lat_np[None], msk_np[None], chunk)
        rows = sect.num_slot_rows
        print(f"# sections: {[tuple(s.lat_idx.shape[1:]) for s in sect.sections]}"
              f" -> {rows} rows ({rows / (N * max(budget, 1)):.3f}x uniform)",
              flush=True)
        pos_s = jnp.asarray(pos_np[:, perms[0]])
        feats_s = feats[:, perms[0]]
        t = time_calls(eval_fn, params, pos_s, feats_s, mask, [sect], [sect])
        result["sections_inproc_latency_s"] = round(t, 4)
        result["sections_inproc_sps"] = round(B / t, 4)
        print(f"# in-process sectioned eval: {t:.4f}s ({B / t:.3f} samples/s)",
              flush=True)

        spath = path + ".sections"
        t0 = time.perf_counter()
        export_inference(edge_model, params, (pos_s, feats_s, mask, sect, sect),
                         spath)
        result["sections_export_s"] = round(time.perf_counter() - t0, 2)
        result["sections_artifact_mib"] = round(
            os.path.getsize(spath) / 2**20, 1)
        infer_s = load_inference(spath)
        t0 = time.perf_counter()
        fetch_sync(infer_s(pos_s, feats_s, mask, sect, sect))
        result["sections_first_call_s"] = round(time.perf_counter() - t0, 2)
        t = time_calls(infer_s, pos_s, feats_s, mask, sect, sect)
        result["sections_exported_latency_s"] = round(t, 4)
        result["sections_exported_sps"] = round(B / t, 4)
        print(f"# exported sectioned call: {t:.4f}s ({B / t:.3f} samples/s)",
              flush=True)
        a = infer_s(pos_s, feats_s, mask, sect, sect)
        b = eval_fn(params, pos_s, feats_s, mask, [sect], [sect])
        rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-30))
        result["sections_export_vs_inproc_rel_err"] = rel
        assert rel < tol, f"sectioned export diverges from in-process: {rel}"

    # --- optional: bucket-bundle padding dispatcher overhead
    buckets_env = os.environ.get("BENCH_SERVE_BUCKETS", "")
    if buckets_env:
        from gaot3d_tpu.serve import (
            export_inference_buckets,
            load_inference_buckets,
        )

        sizes = sorted(int(x) for x in buckets_env.split(","))
        examples = {}
        for n in sizes:
            examples[n] = (pos[:, :n], feats[:, :n], mask[:, :n])
        bpath = path + ".buckets"
        # baked on-device edge build per bucket (padding changes the edge
        # set, so call-time edges cannot ride the dispatcher)
        export_inference_buckets(model, params, examples, bpath)
        disp = load_inference_buckets(bpath)
        n_req = sizes[0] - 1000  # below the smallest bucket: pad + slice
        t_pad = time_calls(disp, pos[:, :n_req], feats[:, :n_req],
                           mask[:, :n_req])
        t_exact = time_calls(disp, pos[:, :sizes[0]], feats[:, :sizes[0]],
                             mask[:, :sizes[0]])
        result["bucket_exact_latency_s"] = round(t_exact, 4)
        result["bucket_padded_latency_s"] = round(t_pad, 4)
        result["dispatcher_overhead_s"] = round(t_pad - t_exact, 4)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
