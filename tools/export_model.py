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
    ap.add_argument("--nodes", type=int, required=True,
                    help="padded node count the artifact serves — must equal "
                         "the deployment batches' padded size (a sample's "
                         "node count rounded up to dataset.pad_multiple), "
                         "e.g. 524288 for ~500K-node DrivAerNet samples with "
                         "pad_multiple 65536; the exported function is "
                         "static-shaped")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--platforms", nargs="*", default=None,
                    help="lowering platforms, e.g. tpu (default: current)")
    ap.add_argument("--device", default="cpu",
                    help="jax backend for TRACING (export is a host-side "
                         "trace/serialize job; cpu avoids grabbing — or "
                         "hanging on — the TPU tunnel, and --platforms tpu "
                         "still cross-lowers for TPU serving)")
    ap.add_argument("--in-channels", type=int, default=1,
                    help="encoder input feature width (the trainer infers "
                         "this from data; the export tool needs it explicit)")
    ap.add_argument("--out-channels", type=int, default=1)
    args = ap.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp
    import numpy as np

    from gaot3d_tpu.config import load_run_config
    from gaot3d_tpu.models import init_model
    from gaot3d_tpu.serve import export_inference
    from gaot3d_tpu.train.checkpoint import load_params_only

    cfg = load_run_config(args.config)
    margs = cfg.model.args
    N = args.nodes
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

    export_inference(model, params, (pos, feats, mask), args.output,
                     platforms=args.platforms)
    print(f"exported {args.output} ({os.path.getsize(args.output)} bytes), "
          f"shapes: pos[{B},{N},3] feats[{B},{N},{cin}] -> [{B},{N},{cout}]")


if __name__ == "__main__":
    main()
