"""Export a trained checkpoint as a standalone serving artifact.

Usage:
    python tools/export_model.py --config run.yaml --ckpt model.msgpack \
        --output model.gaotx --nodes 524288 [--batch 1] [--platforms tpu]

Builds the model from the run config, loads the checkpoint's params, and
serializes the compiled eval forward (gaot3d_tpu.serve.export_inference) at
the padded shapes. `--platforms tpu` cross-lowers for TPU serving from a CPU
host. The artifact is loadable with `gaot3d_tpu.serve.load_inference` (no
model code needed).
"""
import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", required=True, help="msgpack checkpoint path")
    ap.add_argument("--output", required=True)
    ap.add_argument("--nodes", required=True,
                    help="padded node count(s) the artifact serves. One value "
                         "(e.g. 524288) exports a single static-shaped "
                         "function; a comma list (e.g. 262144,524288,1048576) "
                         "exports a BUCKET BUNDLE whose loader pads each "
                         "request to the smallest covering bucket "
                         "(gaot3d_tpu.serve.load_inference_buckets) — the "
                         "serving twin of the trainer's pad_multiple bucket "
                         "padding")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--platforms", nargs="*", default=None,
                    help="lowering platforms, e.g. tpu (default: current)")
    ap.add_argument("--device", default="cpu",
                    help="jax backend for TRACING (export is a host-side "
                         "trace/serialize job; cpu avoids grabbing — or "
                         "hanging on — the TPU tunnel, and --platforms tpu "
                         "still cross-lowers for TPU serving)")
    ap.add_argument("--edges", default="baked",
                    help="'baked' compiles the on-device edge build into the "
                         "artifact (self-contained, but pays the stencil "
                         "search per call); 'slots'/'flat' export the "
                         "precomputed-graph serving mode — edge structures "
                         "(EdgeSlots / FlatEdgeChunks per scale, encoder "
                         "then decoder) become call-time args the deployment "
                         "builds host-side (ops.build_edge_slots_host / "
                         "flatten_slots_host_batched). An 'enc,dec' pair "
                         "selects the layout per side — 'flat,slots' is the "
                         "measured-optimal inference mix (flat encoder, "
                         "slotted decoder; tools/microbench_flat.py). 'flat' "
                         "requires magno.flat_edges_per_chunk pinned in the "
                         "config (the artifact's edge shapes are static)")
    ap.add_argument("--in-channels", type=int, default=1,
                    help="encoder input feature width (the trainer infers "
                         "this from data; the export tool needs it explicit)")
    ap.add_argument("--out-channels", type=int, default=1)
    args = ap.parse_args()

    if args.edges == "baked":
        edge_pair = None
    else:
        from gaot3d_tpu.models.magno import parse_edge_layout

        edge_pair = parse_edge_layout(
            args.edges.split(",") if "," in args.edges else args.edges
        )

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp
    import numpy as np

    from gaot3d_tpu.config import load_run_config
    from gaot3d_tpu.models import init_model
    from gaot3d_tpu.serve import (
        export_inference,
        export_inference_buckets,
        make_edge_arg_model,
    )
    from gaot3d_tpu.train.checkpoint import load_params_only

    cfg = load_run_config(args.config)
    margs = cfg.model.args
    buckets = sorted(int(n) for n in str(args.nodes).split(","))
    N = buckets[-1]
    B = args.batch

    cin, cout = args.in_channels, args.out_channels
    model = init_model(cin, cout, cfg.model.name, margs.magno, margs.transformer,
                       latent_tokens=tuple(margs.latent_tokens))

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)
    feats = jnp.zeros((B, N, cin), jnp.float32)
    mask = jnp.ones((B, N), bool)
    template = model.init({"params": jax.random.key(0)},
                          pos[:, :32], feats[:, :32], mask[:, :32])
    params = load_params_only(args.ckpt, template)

    def example(n):
        ex = (pos[:, :n], feats[:, :n], mask[:, :n])
        if args.edges == "baked":
            return ex
        # call-time edge structures: the example fixes SHAPES only (slot
        # budget K per scale; flat chunk budget E) — values are per-request
        import numpy as np_  # noqa: F401 (np already imported above)
        from gaot3d_tpu.models.integral_transform import effective_chunk
        from gaot3d_tpu.ops import LatentGrid
        from gaot3d_tpu.ops.grid_graph import (
            EdgeSlots,
            build_edge_slots_host,
            flatten_slots_host_batched,
        )

        from gaot3d_tpu.models.magno import parse_neighbor_strategy

        grid = LatentGrid(dims=tuple(margs.latent_tokens))
        mag = margs.magno
        enc_strat, dec_strat = parse_neighbor_strategy(mag.neighbor_strategy)
        structures = []
        for direction, strat, layout in (
            ("encoder", enc_strat, edge_pair[0]),
            ("decoder", dec_strat, edge_pair[1]),
        ):
            per_scale = []
            for s in mag.scales:
                lat, msk = build_edge_slots_host(
                    np.asarray(pos[0, :n]), grid, mag.gno_radius * s,
                    k_neighbors=mag.k_neighbors,
                    strategy=strat, budget=mag.slot_budget or 0,
                )
                latB = np.broadcast_to(lat, (B,) + lat.shape)
                mskB = np.broadcast_to(msk, (B,) + msk.shape)
                if layout == "flat":
                    if not mag.flat_edges_per_chunk:
                        raise SystemExit(
                            "--edges flat needs magno.flat_edges_per_chunk "
                            "pinned in the config (static artifact shapes)")
                    chunk = effective_chunk(n, mag.edge_chunk_size)
                    order = mag.flat_order if direction == "encoder" else "src"
                    per_scale.append(flatten_slots_host_batched(
                        np.ascontiguousarray(latB), np.ascontiguousarray(mskB),
                        chunk, order=order,
                        edges_per_chunk=mag.flat_edges_per_chunk))
                else:
                    per_scale.append(EdgeSlots(jnp.asarray(latB),
                                               jnp.asarray(mskB)))
            structures.extend(per_scale)
        return ex + tuple(structures)

    export_target = (model if args.edges == "baked"
                     else make_edge_arg_model(model, len(margs.magno.scales)))
    if len(buckets) == 1:
        export_inference(export_target, params, example(N), args.output,
                         platforms=args.platforms)
    else:
        examples = {n: example(n) for n in buckets}
        export_inference_buckets(export_target, params, examples, args.output,
                                 platforms=args.platforms)
    print(f"exported {args.output} ({os.path.getsize(args.output)} bytes), "
          f"buckets {buckets}, batch {B}, {cin} -> {cout} channels")


if __name__ == "__main__":
    main()
