"""Aggregate per-op on-device time from a jax.profiler trace.

Usage: python tools/analyze_trace.py /tmp/prof_dir [top_n]

Prints the top ops by total device time across the XLA-op threads
(TensorFlow Op / XLA Ops lines of the device trace), with their share of
total op time. Op names are XLA fusion/instruction names, which carry the
originating HLO (e.g. 'fusion.1234' with source op in args). Used to name
the top backward HLOs of the train step (VERDICT round-2 item 2b).
"""

import glob
import gzip
import json
import sys
from collections import defaultdict


def load_events(trace_dir):
    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    if not files:
        raise SystemExit(f"no trace files under {trace_dir}")
    with gzip.open(files[-1], "rt") as f:
        return json.load(f)["traceEvents"]


def main(trace_dir, top_n=30):
    events = load_events(trace_dir)
    tnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    # device op threads: "XLA Ops" (per-instruction) preferred; fall back to
    # "TensorFlow Ops" (framework-op attribution)
    def thread_kind(e):
        return tnames.get((e["pid"], e.get("tid")), "")

    per_op = defaultdict(float)
    per_cat = defaultdict(float)
    kinds = set()
    for e in events:
        if e.get("ph") != "X":
            continue
        tk = thread_kind(e)
        kinds.add(tk)
        if "XLA Ops" not in tk:
            continue
        name = e.get("name", "")
        args = e.get("args", {}) or {}
        # prefer the source framework op for grouping when present
        group = args.get("tf_op") or args.get("long_name") or name
        per_op[(name, group)] += e["dur"] / 1e6
        # coarse category from the XLA instruction name
        base = name.split(".")[0]
        per_cat[base] += e["dur"] / 1e6

    if not per_op:
        print("thread kinds seen:", sorted(k for k in kinds if k))
        raise SystemExit("no 'XLA Ops' thread events — trace too coarse?")

    total = sum(per_cat.values())
    print(f"total XLA-op device time: {total:.3f}s")
    print("\n== by instruction category ==")
    for cat, t in sorted(per_cat.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{t:8.3f}s  {100*t/total:5.1f}%  {cat}")
    print(f"\n== top {top_n} instructions ==")
    for (name, group), t in sorted(per_op.items(), key=lambda kv: -kv[1])[:top_n]:
        extra = f"  [{group}]" if group != name else ""
        print(f"{t:8.3f}s  {100*t/total:5.1f}%  {name}{extra}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
