"""Subprocess worker for the true multi-process distribution test.

Runs one process of a jax.distributed CPU cluster (or a single-process
reference run) of the synthetic smoke config and dumps the fit() loss
trajectories as JSON. Invoked by tests/test_multiprocess.py:

    python tests/mp_worker.py <mode> <rank> <world> <port> <workdir>

mode: 'mp' (one rank of a multi-process run, per-process batch_size=1) or
'single' (single-process run with the equivalent GLOBAL batch, batch_size =
world). The synthetic dataset must already exist under <workdir>/data (the
test generates it first — two processes generating concurrently would race).
"""
import json
import os
import sys


def main():
    mode, rank, world, port, workdir = sys.argv[1:6]
    rank, world = int(rank), int(world)

    # one CPU device per process; this env pins JAX_PLATFORMS=axon, and only
    # jax.config.update overrides it (see tests/conftest.py)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=1").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from gaot3d_tpu.config import load_run_config
    from gaot3d_tpu.train.trainer import init_trainer
    from gaot3d_tpu.utils.dataclass_utils import merge_config

    cfg = load_run_config(
        os.path.join(repo, "configs/examples/synthetic/smoke.yaml"))
    overrides = {
        "dataset": {
            "base_path": os.path.join(workdir, "data"),
            "batch_size": 1 if mode == "mp" else world,
        },
        "optimizer": {"args": {"epoch": 2, "eval_every_eps": 1}},
        "path": {
            "ckpt_path": f"{workdir}/{mode}/c.msgpack",
            "loss_path": f"{workdir}/{mode}/l.png",
            "result_path": f"{workdir}/{mode}/r.png",
            "database_path": f"{workdir}/{mode}/d.csv",
        },
    }
    if mode == "mp":
        overrides["setup"] = {
            "distributed": True,
            "world_size": world,
            "rank": rank,
            "coordinator_address": f"localhost:{port}",
            "data_parallel": world,
        }
    cfg = merge_config(cfg, overrides)
    trainer = init_trainer(cfg)
    assert jax.process_count() == (world if mode == "mp" else 1)
    result = trainer.fit()

    out = {
        "rank": rank,
        "process_count": jax.process_count(),
        "train_losses": [float(x) for x in result["train"]["loss"]],
        "val_losses": [float(x) for x in result["valid"]["loss"]],
        "best_loss": float(result["best"]["loss"]),
    }
    with open(os.path.join(workdir, f"out_{mode}_{rank}.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
