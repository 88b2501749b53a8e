"""Generate a synthetic dataset + precomputed edge slots for a run config,
then (optionally) repack every sample to the mmap .gsb format — the offline
half of the reference's precompute-then-train workflow (stat.py:126-224)
separated from training so the expensive host build (41 s/sample at 8M nodes
on this 1-core host) runs once, on CPU, without holding a TPU window.

Usage:
  python tools/gen_synthetic.py --config configs/examples/synthetic/tpu_8m.yaml [--gsb]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--gsb", action="store_true",
                    help="repack each .npz to .gsb (mmap loader) and remove the .npz")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from gaot3d_tpu.config import load_run_config
    from gaot3d_tpu.data.dataset import generate_synthetic_dataset
    from gaot3d_tpu.data.graph_precompute import update_sample_files_with_edges
    from gaot3d_tpu.metadata import DATASET_METADATA
    from gaot3d_tpu.ops.grid_graph import LatentGrid

    cfg = load_run_config(args.config)
    ds = cfg.dataset
    root = ds.base_path
    processed = os.path.join(root, ds.processed_folder)
    t0 = time.time()
    if not os.path.isdir(processed) or not os.listdir(processed):
        print(f"[gen] generating {ds.synthetic_num_samples} x "
              f"{ds.synthetic_num_nodes} nodes -> {processed}", flush=True)
        generate_synthetic_dataset(ds, root)
        print(f"[gen] done in {time.time()-t0:.1f}s", flush=True)
    else:
        print(f"[gen] {processed} already populated, skipping generation", flush=True)

    magno = cfg.model.args.magno
    grid = LatentGrid(tuple(cfg.model.args.latent_tokens))
    meta = DATASET_METADATA[ds.metaname]
    t1 = time.time()
    update_sample_files_with_edges(ds, magno, grid, meta)
    print(f"[slots] precompute sweep done in {time.time()-t1:.1f}s", flush=True)

    if args.gsb:
        from gaot3d_tpu.data.dataset import load_sample
        from gaot3d_tpu.data.native_io import write_gsb

        t2 = time.time()
        order = os.path.join(root, f"order_{ds.processed_folder}.txt")
        with open(order) as f:
            names = [line.strip() for line in f if line.strip()]
        for name in names:
            npz = os.path.join(processed, name + ".npz")
            if not os.path.exists(npz):
                continue
            write_gsb(os.path.join(processed, name + ".gsb"), load_sample(npz))
            os.remove(npz)  # the loader prefers .gsb; keeping both doubles disk
            print(f"[gsb] {name}", flush=True)
        print(f"[gsb] repack done in {time.time()-t2:.1f}s", flush=True)


if __name__ == "__main__":
    main()
