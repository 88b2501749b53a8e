"""Unit tests for bench.py helpers that feed the driver-captured JSON."""
import gzip
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "2026_01_01"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_parse_device_step_time_averages_last_steps(tmp_path):
    import bench

    events = [
        {"ph": "M", "name": "thread_name", "pid": 7, "tid": 1,
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "name": "thread_name", "pid": 7, "tid": 2,
         "args": {"name": "XLA Ops"}},
        # warmup execution must be ignored when more than `steps` are present
        {"ph": "X", "name": "jit_step_fn(123)", "pid": 7, "tid": 1,
         "ts": 0, "dur": 99_000_000},
        {"ph": "X", "name": "jit_step_fn(123)", "pid": 7, "tid": 1,
         "ts": 1, "dur": 2_000_000},
        {"ph": "X", "name": "jit_step_fn(123)", "pid": 7, "tid": 1,
         "ts": 2, "dur": 4_000_000},
        # op-level event with the same name prefix on another thread: ignored
        {"ph": "X", "name": "jit_step_fn(123)", "pid": 7, "tid": 2,
         "ts": 3, "dur": 50_000_000},
        # unrelated module: ignored
        {"ph": "X", "name": "jit_convert_element_type(9)", "pid": 7, "tid": 1,
         "ts": 4, "dur": 1_000_000},
    ]
    root = _write_trace(tmp_path, events)
    assert bench._parse_device_step_time(root, 2) == pytest.approx(3.0)


def test_parse_device_step_time_no_events_raises(tmp_path):
    import bench

    root = _write_trace(tmp_path, [])
    with pytest.raises(AssertionError, match="no train-step module events"):
        bench._parse_device_step_time(root, 2)


# ---------------------------------------------------------------------------
# driver-bench smoke: run the ACTUAL bench.py end-to-end on CPU at toy shapes
# for every A/B leg the sweep exercises. Round 2 lost its official number to a
# Python-level bench bug that only fired on the driver's run (VERDICT.md
# round-2 item 1) — this guard catches that class before a TPU window burns.
# ---------------------------------------------------------------------------
import math
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SMOKE_ENV = {
    "BENCH_PLATFORM": "cpu",
    "BENCH_LATENT": "8,8,8",
    "BENCH_NODES": "2048",
    "BENCH_CHUNK": "1024",
    "BENCH_STEPS": "2",
}


@pytest.mark.parametrize("leg", [
    # the driver-default leg runs the FULL bench flow exactly as the driver
    # invokes it (checks + breakdown + eval on); the A/B legs use FAST/no-eval
    # to keep the suite quick
    {},
    {"BENCH_EDGE_LAYOUT": "flat", "BENCH_FAST": "1", "BENCH_EVAL": "0"},
    {"BENCH_EDGE_LAYOUT": "flat", "BENCH_FLAT_ORDER": "dst",
     "BENCH_FAST": "1", "BENCH_EVAL": "0"},
    # per-side pair (flat encoder + slotted decoder — the inference mix)
    {"BENCH_EDGE_LAYOUT": "flat,slots", "BENCH_FAST": "1", "BENCH_EVAL": "0"},
    # degree-sectioned slots (node permutation + per-section K): same model,
    # same loss up to node-order summation rounding
    {"BENCH_DEGREE_SECTIONS": "1", "BENCH_FAST": "1", "BENCH_EVAL": "0"},
], ids=["driver_default_full", "flat_src", "flat_dst", "mixed_enc_flat",
        "degree_sections"])
def test_bench_smoke_leg(leg):
    env = {**os.environ, **_SMOKE_ENV, **leg}
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, cwd=REPO, env=env,
                       timeout=560)
    assert r.returncode == 0, r.stderr[-3000:]
    line = r.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["value"] > 0
    assert math.isfinite(out["final_loss"])
    # all layouts compute the same model: the toy run's loss is a cheap
    # bench-level exactness cross-check (same data, seed, and dropout-free
    # loss path at these settings)
    assert out["final_loss"] == pytest.approx(0.986149, abs=2e-4)


def test_bench_refuses_flat_without_precomputed():
    # a 'flat' A/B leg with the device build would silently measure the
    # slotted layout under the flat label — bench must refuse instead
    env = {**os.environ, **_SMOKE_ENV,
           "BENCH_PRECOMPUTED": "0", "BENCH_EDGE_LAYOUT": "flat"}
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, cwd=REPO, env=env,
                       timeout=120)
    assert r.returncode == 1
    assert "BENCH_PRECOMPUTED=1" in r.stderr


def test_bench_refuses_sections_without_precomputed():
    env = {**os.environ, **_SMOKE_ENV,
           "BENCH_PRECOMPUTED": "0", "BENCH_DEGREE_SECTIONS": "1"}
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, cwd=REPO, env=env,
                       timeout=120)
    assert r.returncode == 1
    assert "BENCH_PRECOMPUTED=1" in r.stderr
