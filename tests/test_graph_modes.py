"""The three graph-building modes (on-device / async-in-loader / offline
precompute) must produce identical model outputs (reference modes:
magno.py:506-528, collate_functions.py:73-131, stat.py:126-224)."""
import numpy as np
import pytest

from gaot3d_tpu.config import RunConfig
from gaot3d_tpu.data.dataset import DatasetConfig, MeshDataset, generate_synthetic_dataset, load_sample
from gaot3d_tpu.data.graph_precompute import (
    compute_sample_edge_slots,
    extract_precomputed_slots,
    update_sample_files_with_edges,
)
from gaot3d_tpu.ops.grid_graph import LatentGrid, build_edge_slots, build_edge_slots_np
from gaot3d_tpu.utils.dataclass_utils import merge_config
from gaot3d_tpu.train.trainer import init_trainer

import jax.numpy as jnp


def test_numpy_builder_matches_jax():
    rng = np.random.default_rng(4)
    pts = rng.uniform(-1.2, 1.2, (200, 3)).astype(np.float32)
    grid = LatentGrid.from_domain((8, 6, 4), [-1.16, -1.2, 0.0], [4.21, 1.19, 1.77], rescale_to=(-1, 1))
    for strategy in ["knn", "radius", "bidirectional", "reverse"]:
        ji, jm = build_edge_slots(jnp.asarray(pts), grid, 0.4, 2, strategy)
        ni, nm = build_edge_slots_np(pts, grid, 0.4, 2, strategy)
        np.testing.assert_array_equal(np.asarray(ji), ni)
        # edge SETS equal (knn tie order may differ between top_k/argpartition)
        jset = set(zip(*np.nonzero(np.asarray(jm))))
        jset = {(i, int(np.asarray(ji)[i, k])) for i, k in jset}
        nset = {(i, int(ni[i, k])) for i, k in zip(*np.nonzero(nm))}
        assert jset == nset, strategy


def _run_cfg(tmp_path, mode_overrides, name):
    base = str(tmp_path / name)
    cfg = merge_config(RunConfig(), {
        "setup": {"train": True, "test": False, "seed": 0},
        "model": {"args": {"latent_tokens": [4, 4, 4], "magno": {
            "lifting_channels": 8, "gno_radius": 0.4,
            "neighbor_strategy": "bidirectional", "use_geoembed": False,
            "in_gno_channel_mlp_hidden_layers": [16],
            "out_gno_channel_mlp_hidden_layers": [16],
            "projection_channels": 16, **mode_overrides.get("magno", {})},
            "transformer": {"patch_size": 2, "hidden_size": 32, "num_layers": 2,
                            "positional_embedding": "absolute",
                            "attn_config": {"hidden_size": 32, "num_heads": 4,
                                            "num_kv_heads": 4, "atten_dropout": 0.0},
                            "ffn_config": {"hidden_size": 64}}}},
        "dataset": {"name": "gm", "metaname": "synthetic/unit_cube",
                    "base_path": base, "processed_folder": "processed",
                    "train_size": 4, "val_size": 2, "test_size": 2,
                    "batch_size": 2, "num_workers": 0, "pad_multiple": 64,
                    "synthetic_num_samples": 8, "synthetic_num_nodes": 90,
                    "metric_suite": "general", "shuffle": False,
                    **mode_overrides.get("dataset", {})},
        "optimizer": {"args": {"epoch": 1, "eval_every_eps": 1, "scheduler": "none", "lr": 0.0,
                               "weight_decay": 0.0}},
        "path": {"ckpt_path": f"{base}/c.msgpack", "loss_path": f"{base}/l.png",
                 "result_path": f"{base}/r.png", "database_path": f"{base}/d.csv"},
    })
    trainer = init_trainer(cfg)
    result = trainer.optimize()
    return result["valid"]["loss"][-1]


def test_three_graph_modes_agree(tmp_path):
    # lr=0 so val loss measures the identical initial model under each mode
    device = _run_cfg(tmp_path, {}, "device")
    asyn = _run_cfg(tmp_path, {"magno": {"asynchronous_graph_building": True}}, "async")
    pre = _run_cfg(tmp_path, {"dataset": {"update_pt_files_with_edges": True}}, "pre")
    np.testing.assert_allclose(asyn, device, rtol=1e-5)
    np.testing.assert_allclose(pre, device, rtol=1e-5)


def test_precompute_budget_storage_matches_device_compaction(tmp_path):
    """With slot_budget set, the precompute sweep stores budget-compacted
    slots (host builder, [N, budget] on disk — at 8M nodes the uncompacted
    window is 4.8 GB/direction) while the device mode builds the full window
    and compacts on device. Both must produce the identical model."""
    budget = {"magno": {"slot_budget": 6}}
    device = _run_cfg(tmp_path, budget, "device_b")
    pre = _run_cfg(tmp_path, {"dataset": {"update_pt_files_with_edges": True},
                              **budget}, "pre_b")
    np.testing.assert_allclose(pre, device, rtol=1e-5)


def test_precompute_budget_overflow_refused():
    """A slot_budget below the true max degree must REFUSE at precompute time
    (the native builder silently drops overflow; the probe-slot guard turns
    that into an error) — never silently train on a truncated graph."""
    from gaot3d_tpu.models.magno import MAGNOConfig
    from gaot3d_tpu.metadata import DATASET_METADATA

    rng = np.random.default_rng(3)
    pos = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    magno = MAGNOConfig(gno_radius=0.9, neighbor_strategy="bidirectional",
                        slot_budget=1)
    grid = LatentGrid(dims=(4, 4, 4))
    meta = DATASET_METADATA["synthetic/unit_cube"]
    with pytest.raises(ValueError, match="slot_budget"):
        compute_sample_edge_slots(pos, grid, magno, False, meta.domain_x)


def test_precompute_sweep_writes_slots(tmp_path):
    root = str(tmp_path / "sweep")
    cfg = DatasetConfig(
        name="sw", metaname="synthetic/unit_cube", base_path=root,
        processed_folder="processed", train_size=2, val_size=1, test_size=1,
        synthetic_num_samples=4, synthetic_num_nodes=50,
    )
    generate_synthetic_dataset(cfg, root)
    from gaot3d_tpu.models.magno import MAGNOConfig
    from gaot3d_tpu.metadata import DATASET_METADATA

    magno = MAGNOConfig(gno_radius=0.4, neighbor_strategy="bidirectional", scales=[1.0, 2.0])
    grid = LatentGrid(dims=(4, 4, 4))
    update_sample_files_with_edges(cfg, magno, grid, DATASET_METADATA[cfg.metaname])
    sample = MeshDataset(cfg, "train")[0]
    slots = extract_precomputed_slots(sample, num_scales=2)
    assert slots is not None
    assert len(slots["encoder"]) == 2 and len(slots["decoder"]) == 2
    idx, mask = slots["encoder"][0]
    assert idx.shape[0] == 50 and mask.shape == idx.shape
    assert mask.any()
