"""Exhaustive config-schema parity: every field of every reference config
dataclass must exist in our corresponding class, introspected from the ACTUAL
reference code (not sample YAMLs) — so a reference user's config can never
hit an unknown-key error here. TPU-only extras on our side are allowed
(superset is the contract, docs/MIGRATING.md)."""
import dataclasses

import pytest

torch = pytest.importorskip("torch")

from reference_stubs import install_reference_stubs

install_reference_stubs()

import src.model.layers.attn as ref_attn  # noqa: E402
import src.model.layers.magno as ref_magno  # noqa: E402
import src.trainer.optimizers as ref_opt  # noqa: E402
import src.trainer.utils.default_set as ref_ds  # noqa: E402

from gaot3d_tpu.config import (  # noqa: E402
    ModelArgsConfig,
    ModelConfig,
    OptimizerConfig,
    PathConfig,
    SetUpConfig,
)
from gaot3d_tpu.data.dataset import DatasetConfig  # noqa: E402
from gaot3d_tpu.models.magno import MAGNOConfig  # noqa: E402
from gaot3d_tpu.models.transformer import (  # noqa: E402
    AttentionConfig,
    FFNConfig,
    TransformerConfig,
)
from gaot3d_tpu.train.schedule import OptimizerargsConfig  # noqa: E402

PAIRS = [
    (ref_ds.SetUpConfig, SetUpConfig),
    (ref_ds.ModelConfig, ModelConfig),
    (ref_ds.ModelArgsConfig, ModelArgsConfig),
    (ref_ds.DatasetConfig, DatasetConfig),
    (ref_ds.PathConfig, PathConfig),
    (ref_ds.OptimizerConfig, OptimizerConfig),
    (ref_opt.OptimizerargsConfig, OptimizerargsConfig),
    (ref_magno.MAGNOConfig, MAGNOConfig),
    (ref_attn.TransformerConfig, TransformerConfig),
    (ref_attn.AttentionConfig, AttentionConfig),
    (ref_attn.FFNConfig, FFNConfig),
]


@pytest.mark.parametrize("ref_cls,our_cls", PAIRS,
                         ids=[r.__name__ for r, _ in PAIRS])
def test_every_reference_field_accepted(ref_cls, our_cls):
    ref_fields = {f.name for f in dataclasses.fields(ref_cls)}
    our_fields = {f.name for f in dataclasses.fields(our_cls)}
    missing = ref_fields - our_fields
    assert not missing, (
        f"{our_cls.__name__} is missing reference fields {sorted(missing)} — "
        f"a reference YAML setting them would raise unknown-config-key"
    )
