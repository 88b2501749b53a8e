"""8M-node production loader budget (VERDICT r4 item 8).

Decomposes `.gsb` host_load at DrivAerML shapes — mmap page-in, preprocess,
precomputed-slot extraction, padded-batch assembly — and times the BatchLoader
end-to-end (host_arrays=True, the 8M trainer configuration) at several
num_workers settings, all pure-CPU (no TPU window needed). Output feeds the
"co-located host needs N cores to feed a T-second step" arithmetic in
PIPELINE_8M.md, making that doc's claim hardware-unconditional.

Usage:
  python tools/gen_synthetic.py --config configs/examples/synthetic/tpu_8m.yaml --gsb
  python tools/loader_budget.py [--config configs/examples/synthetic/tpu_8m.yaml]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="configs/examples/synthetic/tpu_8m.yaml")
    ap.add_argument("--device-step-s", type=float, default=2.323,
                    help="device step time to feed (round-5 sectioned 8M "
                         "step; uniform-slot r4 was 5.199)")
    ap.add_argument("--workers", default="0,2,4")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from gaot3d_tpu.config import load_run_config
    from gaot3d_tpu.data.dataset import MeshDataset, compute_or_load_stats
    from gaot3d_tpu.data.graph_precompute import extract_precomputed_slots
    from gaot3d_tpu.data.pipeline import BatchLoader, SamplePreprocessor
    from gaot3d_tpu.metadata import DATASET_METADATA

    cfg = load_run_config(os.path.join(_REPO, args.config))
    ds_cfg = cfg.dataset
    ds = MeshDataset(ds_cfg, "train")
    stats = compute_or_load_stats(ds_cfg, ds)
    pre = SamplePreprocessor(
        stats=stats, metadata=DATASET_METADATA[ds_cfg.metaname],
        use_rescale_new=ds_cfg.use_rescale_new,
        encoder_feature_attr=cfg.model.args.magno.encoder_feature_attr)

    result = {"nodes": None, "samples": len(ds),
              "device_step_s": args.device_step_s}

    # --- per-sample decomposition (cold mmap first, then warm) -------------
    decomp = []
    for rep in range(args.repeats):
        t0 = time.perf_counter()
        raw = ds[0]
        t_read = time.perf_counter() - t0  # mmap open + lazy handles
        # force page-in of the big arrays (what assembly would trigger)
        t0 = time.perf_counter()
        n = int(np.asarray(raw["pos"]).shape[0])
        _ = float(np.asarray(raw["pos"]).sum()) + float(np.asarray(raw["x"]).sum())
        t_pagein = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = pre(raw)
        t_pre = time.perf_counter() - t0
        t0 = time.perf_counter()
        slots = extract_precomputed_slots(raw, 1)
        for d in ("encoder", "decoder"):
            for li, mk in slots[d]:
                _ = np.asarray(li)[0, 0], np.asarray(mk)[0, 0]
        t_slots = time.perf_counter() - t0
        decomp.append(dict(read_s=t_read, pagein_s=t_pagein,
                           preprocess_s=t_pre, slot_extract_s=t_slots))
        result["nodes"] = n
        print(f"[decomp rep {rep}] read {t_read:.3f}s pagein {t_pagein:.3f}s "
              f"preprocess {t_pre:.3f}s slots {t_slots:.3f}s", flush=True)
    result["decomposition"] = decomp

    # --- end-to-end loader at num_workers settings -------------------------
    legs = {}
    magno_cfg = cfg.model.args.magno
    for w in [int(x) for x in args.workers.split(",")]:
        # honor the config's edge_layout: the production tpu_8m recipe runs
        # 'sectioned', whose per-batch degree argsort + permutation copies +
        # section repack are host work this budget must include (timing the
        # uniform-slots loader here would understate host_load for the
        # recommended configuration)
        loader = BatchLoader(
            ds, pre, batch_size=ds_cfg.batch_size,
            pad_multiple=ds_cfg.pad_multiple, slot_mode="precomputed",
            num_scales=1, num_workers=w, host_arrays=True,
            edge_layout=magno_cfg.edge_layout,
            edge_chunk_size=magno_cfg.edge_chunk_size)
        result["edge_layout"] = str(magno_cfg.edge_layout)
        times = []
        t_prev = time.perf_counter()
        for batch in loader:
            now = time.perf_counter()
            times.append(now - t_prev)
            # touch one element per leaf so lazy work can't hide
            _ = batch.pos[0, 0, 0], batch.feats[0, 0, 0]
            t_prev = time.perf_counter()
        legs[w] = dict(per_batch_s=[round(t, 3) for t in times],
                       mean_s=float(np.mean(times)),
                       steady_s=float(np.mean(times[1:])) if len(times) > 1
                       else float(times[0]))
        print(f"[workers={w}] per-batch {legs[w]['per_batch_s']} "
              f"(steady {legs[w]['steady_s']:.3f}s)", flush=True)
    result["workers"] = legs

    # --- the arithmetic -----------------------------------------------------
    h1 = legs.get(0, list(legs.values())[0])["steady_s"]
    need = h1 / args.device_step_s
    result["host_load_1core_s"] = h1
    result["cores_to_feed"] = need
    print(f"\n1-core host_load {h1:.2f}s/sample vs device step "
          f"{args.device_step_s:.2f}s -> a co-located host needs "
          f"{need:.2f} loader cores (ceil: {int(np.ceil(need))}) assuming "
          f"linear scaling of the numpy/memcpy work", flush=True)
    with open("/tmp/loader_budget.json", "w") as f:
        json.dump(result, f, indent=1)
    print("wrote /tmp/loader_budget.json")


if __name__ == "__main__":
    main()
