"""main.py CLI end-to-end in a subprocess (the reference's primary entry,
main.py:122-167): --config trains + tests on the synthetic dataset and
appends the CSV datarow; --folder fans out over the configs in a directory."""
import csv
import os
import subprocess
import sys

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_cfg(tmp_path, name="run"):
    with open(os.path.join(REPO, "configs/examples/synthetic/smoke.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["optimizer"]["args"].update(epoch=1, eval_every_eps=1)
    cfg["dataset"].update(base_path=str(tmp_path / "data"),
                          synthetic_num_samples=6, synthetic_num_nodes=300,
                          train_size=4, val_size=1, test_size=1,
                          pad_multiple=128)
    cfg["model"]["args"]["transformer"]["num_layers"] = 2
    base = str(tmp_path / name)
    cfg["path"] = {"ckpt_path": f"{base}/c.msgpack", "loss_path": f"{base}/l.png",
                   "result_path": f"{base}/r.png",
                   "database_path": f"{base}/db.csv"}
    p = tmp_path / f"{name}.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(p), f"{base}/db.csv"


def test_main_config_mode(tmp_path):
    cfg_path, db_path = _tiny_cfg(tmp_path)
    r = subprocess.run([sys.executable, os.path.join(REPO, "main.py"),
                        "--config", cfg_path],
                       capture_output=True, text=True, cwd=REPO, timeout=560)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(db_path)
    with open(db_path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1
    assert "nparams" in rows[0] and float(rows[0]["nparams"]) > 0


def test_main_folder_mode(tmp_path):
    """--folder spawns one subprocess per config with failure isolation: a
    config with an unknown key fails its job while the good one completes."""
    good_cfg, good_db = _tiny_cfg(tmp_path, "good")
    bad = tmp_path / "cfgs"
    bad.mkdir()
    os.rename(good_cfg, bad / "good.yaml")
    (bad / "bad.yaml").write_text("setup:\n  not_a_real_key: 1\n")
    r = subprocess.run([sys.executable, os.path.join(REPO, "main.py"),
                        "--folder", str(bad)],
                       capture_output=True, text=True, cwd=REPO, timeout=560)
    # the sweep itself survives the bad job (reference main.py:171-221)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(good_db)
    assert "failed" in (r.stderr + r.stdout).lower()
