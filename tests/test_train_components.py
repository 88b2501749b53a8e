import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaot3d_tpu.config import RunConfig, load_run_config
from gaot3d_tpu.train.checkpoint import load_checkpoint, load_params_only, save_checkpoint
from gaot3d_tpu.train.metrics import (
    compute_drivaernet_metric,
    compute_general_metrics,
    compute_poseidon_metric,
)
from gaot3d_tpu.train.schedule import OptimizerargsConfig, make_lr_schedule, mix_phase_lengths
from gaot3d_tpu.utils.dataclass_utils import dataclass_from_dict, merge_config


# --- schedule -----------------------------------------------------------------
def _reference_mix_lr(epoch, total, initial, mx, mn, final, cosine_frac):
    """Independent re-derivation of the reference 3-phase schedule
    (optimizers.py:53-67) for cross-checking."""
    warmup, cosine, expd = mix_phase_lengths(total, cosine_frac)
    if epoch < warmup:
        return initial + (mx - initial) * (epoch / max(1, warmup - 1))
    if epoch < warmup + cosine:
        e = epoch - warmup
        return mn + (mx - mn) * (1 + np.cos(np.pi * e / cosine)) / 2
    e = epoch - warmup - cosine
    return mn * ((final / mn) ** (e / max(1, expd - 1)))


def test_mix_schedule_matches_reference_formula():
    cfg = OptimizerargsConfig(lr=3e-4, epoch=50, scheduler="mix", max_lr=5e-4, min_lr=1e-4, final_lr=5e-5)
    spe = 7
    sched = make_lr_schedule(cfg, steps_per_epoch=spe, cosine_frac=0.90)
    for epoch in [0, 1, 5, 25, 44, 45, 46, 49]:
        got = float(sched(epoch * spe + 3))  # mid-epoch: piecewise-constant
        want = _reference_mix_lr(epoch, 50, 3e-4, 5e-4, 1e-4, 5e-5, 0.90)
        np.testing.assert_allclose(got, want, rtol=1e-5, err_msg=f"epoch {epoch}")


def test_mix_phase_guards():
    # tiny epoch counts hit the reference's zero-guards (optimizers.py:102-107)
    for total in [1, 2, 3, 10]:
        w, c, e = mix_phase_lengths(total, 0.90)
        assert w >= 1 and e >= 1 and w + c + e == total


def test_step_exp_cos_schedules():
    spe = 2
    cfg = OptimizerargsConfig(lr=1.0, scheduler="step", scheduler_step_size=2, scheduler_gamma=0.5)
    s = make_lr_schedule(cfg, spe)
    assert float(s(0)) == 1.0 and float(s(2 * spe)) == 0.5 and float(s(4 * spe)) == 0.25
    cfg = OptimizerargsConfig(lr=1.0, scheduler="exp", scheduler_gamma=0.9)
    s = make_lr_schedule(cfg, spe)
    np.testing.assert_allclose(float(s(3 * spe)), 0.9 ** 3, rtol=1e-6)
    cfg = OptimizerargsConfig(lr=1.0, scheduler="cos", scheduler_T_max=10, scheduler_eta_min=0.1)
    s = make_lr_schedule(cfg, spe)
    np.testing.assert_allclose(float(s(0)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(s(10 * spe)), 0.1, rtol=1e-5)


# --- metrics -------------------------------------------------------------------
def test_drivaernet_metric_zero_error_and_scaling():
    rng = np.random.default_rng(0)
    gtr = [rng.normal(size=(100, 1)) * 120 - 93 for _ in range(3)]
    m = compute_drivaernet_metric(gtr, gtr, [-93.4105], [120.7879])
    assert m["MSE"] == 0 and m["MAE"] == 0 and m["Max_Error"] == 0
    # known perturbation: prd = gtr + std -> normalized diff == 1 everywhere
    prd = [g + 120.7879 for g in gtr]
    m = compute_drivaernet_metric(gtr, prd, [-93.4105], [120.7879])
    np.testing.assert_allclose(m["MSE"], 1.0, rtol=1e-6)
    np.testing.assert_allclose(m["MAE"], 1.0, rtol=1e-6)
    np.testing.assert_allclose(m["RMSE"], 1.0, rtol=1e-6)
    assert m["MSE_std"] < 1e-12


def test_general_metrics():
    gtr = np.array([[1.0], [2.0], [3.0]])
    prd = np.array([[1.5], [2.0], [2.5]])
    m = compute_general_metrics(gtr, prd)
    np.testing.assert_allclose(m["MSE"], (0.25 + 0 + 0.25) / 3, rtol=1e-6)
    np.testing.assert_allclose(m["Max AE"], 0.5, rtol=1e-6)
    np.testing.assert_allclose(m["Rel L1 Error (%)"], 100.0 / 6.0, rtol=1e-5)


def test_poseidon_metric_median_over_samples():
    gtr = [np.ones((10, 1)) * v for v in [1.0, 2.0, 3.0]]
    prd = [g * 1.1 for g in gtr]
    val = compute_poseidon_metric(gtr, prd, [0.0], [1.0])
    np.testing.assert_allclose(val, 0.1, rtol=1e-6)


# --- config ---------------------------------------------------------------------
def test_config_merge_and_coercion(tmp_path):
    yaml_text = """
setup:
    seed: 7
    dtype: bfloat16
model:
    args:
        latent_tokens: [8, 8, 4]
        magno:
            gno_radius: 0.05
            neighbor_strategy: ["knn", "reverse"]
optimizer:
    args:
        lr: 3e-4
        max_lr: 5e-4
"""
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml_text)
    cfg = load_run_config(str(p))
    assert cfg.setup.seed == 7
    assert cfg.model.args.latent_tokens == (8, 8, 4)
    assert cfg.model.args.magno.gno_radius == 0.05
    assert cfg.model.args.magno.neighbor_strategy == ["knn", "reverse"]
    assert isinstance(cfg.optimizer.args.lr, float) and cfg.optimizer.args.lr == 3e-4
    # defaults survive
    assert cfg.optimizer.args.weight_decay == 1e-3
    assert cfg.dataset.train_size == 5817


def test_config_unknown_key_rejected():
    with pytest.raises(KeyError):
        dataclass_from_dict(RunConfig, {"setup": {"not_a_field": 1}})


def test_merge_config_nested_dataclass():
    base = RunConfig()
    out = merge_config(base, {"model": {"name": "gaot_3d"}, "path": {"ckpt_path": "x.msgpack"}})
    assert out.path.ckpt_path == "x.msgpack"
    assert base.path.ckpt_path != "x.msgpack"  # no mutation


# --- checkpoint -------------------------------------------------------------------
def test_checkpoint_roundtrip(tmp_path):
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)},
        "opt_state": {"mu": jnp.ones(3)},
        "step": jnp.asarray(17),
    }
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, state)
    template = jax.tree.map(jnp.zeros_like, state)
    restored = load_checkpoint(path, template)
    np.testing.assert_array_equal(restored["params"]["w"], state["params"]["w"])
    assert int(restored["step"]) == 17
    # params-only load (reference weights-only ckpt semantics)
    params = load_params_only(path, jax.tree.map(jnp.zeros_like, state["params"]))
    np.testing.assert_array_equal(params["w"], state["params"]["w"])
