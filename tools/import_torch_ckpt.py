"""Convert a trained reference (PyTorch GAOT-3D) checkpoint to this framework.

Usage:
    python tools/import_torch_ckpt.py --config run.yaml \
        --torch-ckpt model.pt --output model.msgpack

The run config supplies the model architecture (the same YAML drives both
frameworks); the mapping itself is gaot3d_tpu.torch_import (validated against
the actual torch reference by tests/test_torch_parity_full.py, including an
AdamW trajectory). The output is a params-only msgpack the trainer's
`load_ckpt` / `load_params_only` consume directly.
"""
import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _is_state_dict(d):
    # a real module state dict is a non-empty {dotted.name: tensor} mapping;
    # the dotted-key requirement rejects look-alikes such as {'epoch': tensor}
    return (isinstance(d, dict) and len(d) > 0
            and all(hasattr(v, "shape") for v in d.values())
            and any("." in k for k in d))


def extract_state_dict(ckpt):
    """Reference ckpts are `{name: module.state_dict()}` (setup.py:18-42);
    tolerate a bare state dict too."""
    if not isinstance(ckpt, dict) or not ckpt:
        raise ValueError(f"checkpoint is not a non-empty dict: {type(ckpt)}")
    if _is_state_dict(ckpt):
        return ckpt
    for key in ("model", "gaot_3d", "state_dict"):
        if key in ckpt and _is_state_dict(ckpt[key]):
            return ckpt[key]
    if len(ckpt) == 1:
        (inner,) = ckpt.values()
        if _is_state_dict(inner):
            return inner
    raise ValueError(f"cannot locate a state dict among keys {list(ckpt)}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--torch-ckpt", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--device", default="cpu",
                    help="jax backend for the conversion (pure host-side "
                         "array munging — cpu is always right)")
    args = ap.parse_args()

    import torch

    import jax

    jax.config.update("jax_platforms", args.device)
    import numpy as np
    from flax import serialization

    from gaot3d_tpu.config import load_run_config
    from gaot3d_tpu.torch_import import params_from_torch_state_dict

    cfg = load_run_config(args.config)
    ckpt = torch.load(args.torch_ckpt, map_location="cpu", weights_only=True)
    sd = extract_state_dict(ckpt)
    params = params_from_torch_state_dict(
        sd, cfg.model.args.magno, cfg.model.args.transformer
    )
    host = jax.tree.map(np.asarray, params)
    # framework checkpoint layout: {"params": <full variables dict>} — the
    # trainer's TrainState.params IS the variables dict {"params": {...}}
    # (see train/checkpoint.py load_params_only)
    blob = serialization.msgpack_serialize({"params": host})
    tmp = args.output + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, args.output)
    n = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(host))
    print(f"imported {args.torch_ckpt} -> {args.output} ({n:,} params)")


if __name__ == "__main__":
    main()
