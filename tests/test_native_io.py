import numpy as np
import pytest

from gaot3d_tpu.data.native_io import (
    GsbReader,
    native_available,
    pad_batch_native,
    read_gsb_numpy,
    write_gsb,
)


@pytest.fixture
def sample(tmp_path):
    rng = np.random.default_rng(0)
    arrays = {
        "pos": rng.normal(size=(100, 3)).astype(np.float32),
        "x": rng.normal(size=(100, 2)).astype(np.float32),
        "idx": rng.integers(0, 10, size=(7,)).astype(np.int64),
        "flags": (rng.random(5) < 0.5),
    }
    path = str(tmp_path / "s.gsb")
    write_gsb(path, arrays)
    return path, arrays


def test_numpy_reader_roundtrip(sample):
    path, arrays = sample
    out = read_gsb_numpy(path)
    assert set(out) == set(arrays)
    for k in arrays:
        np.testing.assert_array_equal(out[k], arrays[k])


def test_native_reader_matches(sample):
    if not native_available():
        pytest.skip("native gaot_io not built (no g++)")
    path, arrays = sample
    with GsbReader(path) as r:
        out = r.read()
    for k in arrays:
        np.testing.assert_array_equal(out[k], arrays[k])


def test_native_pad_batch():
    if not native_available():
        pytest.skip("native gaot_io not built")
    rng = np.random.default_rng(1)
    arrays = [rng.normal(size=(n, 4)).astype(np.float32) for n in (10, 25, 3)]
    out, mask = pad_batch_native(arrays, np.array([10, 25, 3]), n_pad=32)
    assert out.shape == (3, 32, 4) and mask.shape == (3, 32)
    for b, a in enumerate(arrays):
        np.testing.assert_array_equal(out[b, : len(a)], a)
        assert not out[b, len(a):].any()
        assert mask[b, : len(a)].all() and not mask[b, len(a):].any()


def test_dataset_loads_gsb(tmp_path):
    from gaot3d_tpu.data.dataset import load_sample

    arrays = {"pos": np.zeros((4, 3), np.float32), "x": np.ones((4, 1), np.float32)}
    path = str(tmp_path / "a.gsb")
    write_gsb(path, arrays)
    out = load_sample(path)
    np.testing.assert_array_equal(out["x"], arrays["x"])


def test_repack_gsb_cli(tmp_path):
    """tools/repack_gsb.py end-to-end: .npz samples + order file -> .gsb
    stores readable through the native loader with identical arrays."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    processed = tmp_path / "processed"
    processed.mkdir()
    rng = np.random.default_rng(0)
    names = ["a", "b"]
    samples = {}
    for name in names:
        s = {"pos": rng.uniform(-1, 1, (37, 3)).astype(np.float32),
             "x": rng.normal(size=(37, 2)).astype(np.float32)}
        np.savez(processed / f"{name}.npz", **s)
        samples[name] = s
    (tmp_path / "order_processed.txt").write_text("\n".join(names) + "\n")

    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "repack_gsb.py"),
         "--root", str(tmp_path), "--folder", "processed"],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    for name in names:
        out = read_gsb_numpy(str(processed / f"{name}.gsb"))
        for k, v in samples[name].items():
            np.testing.assert_array_equal(out[k], v)
