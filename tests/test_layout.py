"""Argument-layout harmonization (gaot3d_tpu/utils/layout.py).

The relayout-per-call hazard itself only manifests on TPU (CPU layouts are
trivial), so these tests cover the machinery: shared-leaf dedup, value
preservation, structure errors, and the trainer's harvest gating.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaot3d_tpu.utils.layout import put_to_formats


def _formats_for(fn, *args):
    return jax.jit(fn).lower(*args).compile().input_formats[0]


def test_put_to_formats_preserves_values_and_sharing():
    shared = jnp.arange(12.0).reshape(3, 4)
    tree = {"a": shared, "b": jnp.ones((2, 2)), "c": [shared]}

    def f(t):
        return jnp.sum(t["a"]) + jnp.sum(t["b"]) + jnp.sum(t["c"][0])

    (fmt,) = _formats_for(f, tree)
    out = put_to_formats(tree, fmt)
    assert out["a"] is out["c"][0], "shared leaf was duplicated"
    np.testing.assert_array_equal(np.asarray(out["a"]), np.asarray(tree["a"]))
    np.testing.assert_array_equal(np.asarray(out["b"]), np.asarray(tree["b"]))
    # the compiled program accepts the harmonized args
    assert np.isfinite(float(jax.jit(f)(out)))


def test_put_to_formats_leaf_mismatch_raises():
    tree = (jnp.ones(3), jnp.ones(3))

    def f(t):
        return jnp.sum(t[0]) + jnp.sum(t[1])

    (fmt,) = _formats_for(f, tree)
    with pytest.raises(ValueError, match="leaf mismatch"):
        put_to_formats((jnp.ones(3),), fmt)


def _make_trainer(tmp_path):
    import os

    from gaot3d_tpu.config import load_run_config
    from gaot3d_tpu.train.trainer import init_trainer
    from gaot3d_tpu.utils.dataclass_utils import merge_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_run_config(
        os.path.join(repo, "configs/examples/synthetic/smoke.yaml"))
    base = str(tmp_path)
    cfg = merge_config(cfg, {
        "dataset": {"base_path": os.path.join(base, "data")},
        "path": {"ckpt_path": f"{base}/c.msgpack", "loss_path": f"{base}/l.png",
                 "result_path": f"{base}/r.png", "database_path": f"{base}/d.csv"},
    })
    return init_trainer(cfg)


def test_trainer_harvest_gated_by_size(tmp_path, monkeypatch):
    """Small batches must NOT trigger the extra AOT lower+compile; the
    override env makes it run and produce usable formats."""
    trainer = _make_trainer(tmp_path)
    batch = next(iter(trainer.train_loader))

    monkeypatch.setenv("GAOT_LAYOUT_HARMONIZE", "auto")
    trainer.train_step(batch)
    # the cache is keyed by padded batch shape (batches of different n_pad
    # need different formats); a tiny batch records False = gated off
    key = trainer._format_key(batch)
    assert trainer._batch_formats == {key: False}

    trainer2 = _make_trainer(tmp_path)
    monkeypatch.setenv("GAOT_LAYOUT_HARMONIZE", "always")
    trainer2.train_step(batch)
    assert trainer2._batch_formats.get(key) not in (None, False)
    # harvested formats place a batch without error and train_step still runs
    b2 = trainer2._device_put_batch(batch)
    trainer2.train_step(b2)


def test_put_to_formats_dedup_is_format_aware():
    """A shared buffer is reused ONLY when the target formats agree — reusing
    across differing formats would hand the program a mislaid argument
    (silently relayouted again on every call). Shardings act as the format
    spec here (device_put accepts them; CPU layouts are trivial)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = jax.make_mesh((jax.device_count(),), ("d",))
    x = jnp.arange(float(8 * jax.device_count())).reshape(-1, 8)
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("d"))

    out = put_to_formats((x, x, x), (repl, shard, repl))
    assert out[0] is out[2], "same buffer + same format must stay shared"
    assert out[0] is not out[1], "same buffer + different format must split"
    assert out[1].sharding.is_equivalent_to(shard, x.ndim)
    for o in out:
        np.testing.assert_array_equal(np.asarray(o), np.asarray(x))
