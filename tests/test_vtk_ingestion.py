"""Real-format ingestion: a mesh written as legacy ASCII VTK goes through
tools/convert_vtk.py -> MeshDataset -> a 1-epoch fit -> test() (VERDICT r3
item 4 / next-round item 9). The reference's corresponding path is the
documented VTK -> .pt preprocessing feeding pyg_datasets.py:125-141; its
converter script is absent from the snapshot, so tools/convert_vtk.py is the
first-party equivalent with a dependency-free legacy-ASCII reader."""
import os
import subprocess
import sys

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from convert_vtk import convert, read_legacy_vtk  # noqa: E402


def write_vtk(path, n, seed, scalars_inline_ncomp=False):
    """Tiny legacy ASCII VTK POLYDATA surface with pressure (SCALARS),
    normals (VECTORS) and a FIELD array — the sections foamToVTK emits."""
    rng = np.random.default_rng(seed)
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    pos = (u * (1 + 0.2 * np.sin(3 * u[:, :1]))).astype(np.float32)
    p = (np.sin(2 * pos[:, 0]) + 0.5 * pos[:, 2] ** 2).astype(np.float32)
    lines = [
        "# vtk DataFile Version 3.0",
        "synthetic surface",
        "ASCII",
        "DATASET POLYDATA",
        f"POINTS {n} float",
    ]
    lines += [" ".join(f"{v:.6f}" for v in row) for row in pos]
    lines += [f"POINT_DATA {n}"]
    if scalars_inline_ncomp:
        lines += ["SCALARS pressure float 1", "LOOKUP_TABLE default"]
    else:
        lines += ["SCALARS pressure float", "LOOKUP_TABLE default"]
    lines += [f"{v:.6f}" for v in p]
    lines += ["VECTORS Normals float"]
    lines += [" ".join(f"{v:.6f}" for v in row) for row in u]
    lines += ["FIELD FieldData 1", f"wss 3 {n} float"]
    lines += [" ".join(f"{v:.6f}" for v in row) for row in (0.1 * u)]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return pos, p, u.astype(np.float32)


def test_legacy_reader_exact(tmp_path):
    path = str(tmp_path / "m.vtk")
    pos, p, nrm = write_vtk(path, 50, seed=0, scalars_inline_ncomp=True)
    pts, fields = read_legacy_vtk(path)
    np.testing.assert_allclose(pts, pos, atol=1e-5)
    np.testing.assert_allclose(fields["pressure"], p, atol=1e-5)
    np.testing.assert_allclose(fields["Normals"], nrm, atol=1e-5)
    np.testing.assert_allclose(fields["wss"], 0.1 * nrm, atol=1e-5)


def test_vtk_to_fit_to_test(tmp_path):
    """convert -> order file -> MeshDataset -> main.py fit+test: the full
    real-format ingestion loop, in-process data checks plus a subprocess
    1-epoch run producing the CSV datarow."""
    raw = tmp_path / "raw"
    raw.mkdir()
    n = 300
    for i in range(6):
        write_vtk(str(raw / f"car_{i:03d}.vtk"), n, seed=i)
    out = tmp_path / "data"
    convert(str(raw), str(out), fields=["pressure"], folder_name="processed")

    # converted store is loadable sample-by-sample
    order = (out / "order_processed.txt").read_text().split()
    assert len(order) == 6
    from gaot3d_tpu.data.dataset import load_sample

    s = load_sample(str(out / "processed" / (order[0] + ".npz")))
    assert s["pos"].shape == (n, 3) and s["x"].shape == (n, 1)

    # 1-epoch fit + test through the real CLI on the converted data
    with open(os.path.join(REPO, "configs/examples/synthetic/smoke.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["optimizer"]["args"].update(epoch=1, eval_every_eps=1)
    cfg["dataset"].update(
        name="vtk_ingest", base_path=str(out),
        train_size=4, val_size=1, test_size=1, pad_multiple=128,
        batch_size=2)
    for k in ("synthetic_num_samples", "synthetic_num_nodes"):
        cfg["dataset"].pop(k, None)
    cfg["model"]["args"]["transformer"]["num_layers"] = 2
    base = str(tmp_path / "run")
    cfg["path"] = {"ckpt_path": f"{base}/c.msgpack", "loss_path": f"{base}/l.png",
                   "result_path": f"{base}/r.png", "database_path": f"{base}/db.csv"}
    cfg_path = tmp_path / "vtk.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    r = subprocess.run([sys.executable, os.path.join(REPO, "main.py"),
                        "--config", str(cfg_path)],
                       capture_output=True, text=True, cwd=REPO, timeout=560)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(f"{base}/db.csv")
