"""Every shipped example config must parse into the structured RunConfig and
construct its model (schema-drift guard; the reference YAML schema is a
compatibility promise, docs/MIGRATING.md)."""
import glob
import os

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "examples", "*", "*.yaml")))
REFERENCE_CONFIGS = sorted(
    glob.glob("/root/reference/config/**/*.yaml", recursive=True)
)


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.relpath(p, REPO) for p in CONFIGS])
def test_example_config_parses_and_builds(path):
    import dataclasses

    from gaot3d_tpu.config import load_run_config
    from gaot3d_tpu.models import init_model

    cfg = load_run_config(path)
    assert cfg.model.name == "gaot_3d"
    margs = cfg.model.args
    assert margs.magno.gno_radius > 0
    assert margs.transformer.num_layers >= 1
    # model constructs from the parsed configs (shrunk latent grid + layers so
    # a CPU init stays cheap; the magno section is exercised unmodified except
    # for chunking, which must divide the tiny N)
    magno = dataclasses.replace(margs.magno, edge_chunk_size=None, slot_budget=None)
    attn = dataclasses.replace(margs.transformer, num_layers=2)
    model = init_model(3, 1, cfg.model.name, magno, attn, latent_tokens=(4, 4, 4))
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    pos = jnp.asarray(rng.uniform(-1, 1, (1, 64, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(1, 64, 3)), jnp.float32)
    mask = jnp.ones((1, 64), bool)
    params = model.init({"params": jax.random.key(0)}, pos, feats, mask)
    out = model.apply(params, pos, feats, mask)
    assert out.shape == (1, 64, 1)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.skipif(not REFERENCE_CONFIGS, reason="reference checkout absent")
@pytest.mark.parametrize(
    "path", REFERENCE_CONFIGS, ids=[os.path.basename(p) for p in REFERENCE_CONFIGS]
)
def test_reference_config_drops_in_verbatim(path):
    """The drop-in promise, tested against the reference's OWN shipped YAML
    (not our copies): every key it writes parses, including the schema-only
    knobs the reference itself never consumes (use_variance_test,
    default_set.py:26; wandb_log_interval, default_set.py:44) and torch-style
    dtype strings (setup.dtype: "torch.float32")."""
    from gaot3d_tpu.config import load_run_config

    cfg = load_run_config(path)
    assert cfg.setup.dtype in ("float32", "bfloat16")  # torch. prefix stripped
    assert cfg.model.name == "gaot_3d"
    assert cfg.model.args.transformer.num_layers >= 1
    assert cfg.optimizer.args.lr > 0
