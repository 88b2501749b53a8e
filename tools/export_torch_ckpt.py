"""Convert a checkpoint trained in this framework to a reference (PyTorch
GAOT-3D) checkpoint — the inverse of tools/import_torch_ckpt.py.

Usage:
    python tools/export_torch_ckpt.py --config run.yaml \
        --ckpt model.msgpack --output model.pt

The run config supplies the architecture (the same YAML drives both
frameworks). Output is `{"model": state_dict}`, the reference's own save
layout (src/trainer/utils/setup.py:18-42), loadable with
`ref_model.load_state_dict(torch.load(p)["model"])` — strict for the
flagship recipes; use strict=False for configs where the reference creates
modules it never applies (see gaot3d_tpu/torch_export.py).
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
    ap.add_argument("--output", required=True, help=".pt output path")
    ap.add_argument("--device", default="cpu",
                    help="jax backend for the conversion (pure host-side "
                         "array munging — cpu is always right)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", args.device)
    import numpy as np
    import torch
    from flax import serialization

    from gaot3d_tpu.config import load_run_config
    from gaot3d_tpu.torch_export import state_dict_from_params

    cfg = load_run_config(args.config)
    with open(args.ckpt, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    # framework ckpt layouts: trainer save_ckpt {"params": variables, ...} or
    # a params-only import (tools/import_torch_ckpt.py) — both nest the
    # variables dict {"params": {...}} under "params"
    variables = blob["params"] if "params" in blob else blob
    sd = state_dict_from_params(
        variables, cfg.model.args.magno, cfg.model.args.transformer,
        latent_tokens=tuple(cfg.model.args.latent_tokens),
    )
    tsd = {k: torch.as_tensor(np.ascontiguousarray(v)) for k, v in sd.items()}
    tmp = args.output + ".tmp"
    torch.save({"model": tsd}, tmp)
    os.replace(tmp, args.output)
    n = sum(int(v.numel()) for v in tsd.values())
    print(f"exported {args.ckpt} -> {args.output} ({n:,} params, "
          f"{len(tsd)} tensors)")


if __name__ == "__main__":
    main()
