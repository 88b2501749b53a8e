"""CLI / multi-job launcher.

Semantics parity with the reference launcher (reference: main.py:73-225):
  --config FILE   : run one config (YAML/TOML/JSON)
  --folder DIR    : run every config file under DIR (recursively); with
                    --debug they run sequentially in-process, otherwise each
                    as a subprocess (one at a time per host by default — the
                    TPU analogue of the reference's round-robin over CUDA
                    devices; use --num_works_per_device for concurrency)
  --debug         : run in-process (no subprocess fan-out)
Results: one CSV row per run appended to path.database_path (main.py:161-167).
"""
from __future__ import annotations

import argparse
import logging
import os
import subprocess
import sys
import time

import numpy as np


def setup_logging(level: str = "INFO", log_file: str = None) -> None:
    if isinstance(level, str):
        level = getattr(logging, level.upper(), logging.INFO)
    handlers = [logging.StreamHandler()]
    if log_file:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        handlers.append(logging.FileHandler(log_file))
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
        handlers=handlers,
    )


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, default=None, help="config file path")
    parser.add_argument("-f", "--folder", type=str, default=None, help="folder of config files")
    parser.add_argument("--debug", action="store_true", help="run configs in-process")
    parser.add_argument("--num_works_per_device", type=int, default=1,
                        help="concurrent subprocess jobs per host")
    parser.add_argument("--visible_devices", nargs="*", type=int, default=None,
                        help="restrict visible TPU devices (sets JAX flags)")
    parser.add_argument("--log_level", type=str, default=os.environ.get("GAOT_LOG_LEVEL", "INFO"))
    args = parser.parse_args()
    assert args.config or args.folder, "Please specify --config or --folder"
    if args.config:
        args.arg_files = [args.config]
    else:
        args.arg_files = []
        for root, _dirs, files in os.walk(args.folder):
            for name in sorted(files):
                if name.endswith((".toml", ".json", ".yaml", ".yml")):
                    args.arg_files.append(os.path.join(root, name))
    return args


def run_config_file(path: str) -> dict:
    """Run one training/testing job in-process; returns the CSV datarow."""
    from gaot3d_tpu.config import load_run_config
    from gaot3d_tpu.train.trainer import init_trainer

    cfg = load_run_config(path)
    # absolutize output paths relative to this repo (reference: main.py:94-106)
    base = os.path.dirname(os.path.abspath(__file__))
    for attr in ("ckpt_path", "loss_path", "result_path", "database_path"):
        p = getattr(cfg.path, attr)
        if not os.path.isabs(p):
            setattr(cfg.path, attr, os.path.join(base, p))
        os.makedirs(os.path.dirname(getattr(cfg.path, attr)) or ".", exist_ok=True)

    trainer = init_trainer(cfg)
    trainer.datarow["config"] = path
    trainer.datarow["time"] = time.strftime("%Y-%m-%d %H:%M:%S", time.localtime())

    # load priority: artifact > resume path > ckpt flag (reference main.py:134-145)
    if cfg.setup.resume_from_artifact:
        trainer.load_from_artifact(cfg.setup.resume_from_artifact)
    elif cfg.setup.resume_from_ckpt:
        trainer.load_ckpt(cfg.setup.resume_from_ckpt)
    elif cfg.setup.ckpt and os.path.exists(cfg.path.ckpt_path):
        trainer.load_ckpt()

    if cfg.setup.train:
        trainer.fit()
    elif cfg.setup.test:
        trainer.test()

    # append results row to the CSV database (reference: main.py:161-167)
    if trainer.is_main:
        try:
            import pandas as pd

            row = pd.DataFrame([trainer.datarow])
            db = cfg.path.database_path
            if os.path.exists(db):
                row = pd.concat([pd.read_csv(db), row], ignore_index=True)
            row.to_csv(db, index=False)
        except Exception as e:
            logging.getLogger(__name__).warning("CSV database write failed: %s", e)
    return trainer.datarow


def _visible_devices_env(devices) -> dict:
    """Device-restriction env for one job (reference main.py round-robins jobs
    over CUDA_VISIBLE_DEVICES; the TPU analogue is TPU_VISIBLE_CHIPS plus the
    per-chip topology bounds). Must be set before the process imports jax."""
    ids = ",".join(str(d) for d in devices)
    return {
        "TPU_VISIBLE_CHIPS": ids,
        "TPU_CHIPS_PER_PROCESS_BOUNDS": f"1,{len(devices)},1",
        "TPU_PROCESS_BOUNDS": "1,1,1",
        "CUDA_VISIBLE_DEVICES": ids,  # harmless on TPU; correct on GPU hosts
    }


def main():
    args = parse_args()
    setup_logging(args.log_level)
    log = logging.getLogger("gaot3d_tpu.main")

    if args.config or args.debug:
        if args.visible_devices:
            # in-process: restrict before gaot3d_tpu (and thus jax) is imported
            os.environ.update(_visible_devices_env(args.visible_devices))
        for f in args.arg_files:
            log.info("Running config %s", f)
            run_config_file(f)
        return

    # folder mode: subprocess isolation so one failed job doesn't kill the
    # sweep (reference: main.py:171-221); jobs round-robin over
    # --visible_devices like the reference's per-CUDA-device fan-out
    pending = list(args.arg_files)
    running = []
    devices = args.visible_devices or [None]
    max_jobs = max(1, args.num_works_per_device) * len(devices)
    launched = 0
    while pending or running:
        while pending and len(running) < max_jobs:
            f = pending.pop(0)
            dev = devices[launched % len(devices)]
            launched += 1
            env = dict(os.environ)
            if dev is not None:
                env.update(_visible_devices_env([dev]))
            log.info("Launching %s%s", f, f" on device {dev}" if dev is not None else "")
            p = subprocess.Popen(
                [sys.executable, __file__, "--config", f, "--debug"], env=env
            )
            running.append((f, p))
        time.sleep(1.0)
        still = []
        for f, p in running:
            if p.poll() is None:
                still.append((f, p))
            elif p.returncode != 0:
                log.error("Job %s failed with code %d", f, p.returncode)
            else:
                log.info("Job %s finished", f)
        running = still


if __name__ == "__main__":
    main()
