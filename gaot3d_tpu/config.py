"""Top-level run configuration.

Mirrors the reference's config schema (src/trainer/utils/default_set.py) so
reference YAML/TOML/JSON configs drop in with the same section names:
setup / model / dataset / optimizer / path. Unknown keys error (the OmegaConf
structured-merge behavior).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from .data.dataset import DatasetConfig
from .models.magno import MAGNOConfig
from .models.transformer import TransformerConfig
from .train.schedule import OptimizerargsConfig
from .utils.dataclass_utils import dataclass_from_dict, load_config_file


@dataclass
class SetUpConfig:
    """(reference: default_set.py:17-48; NCCL/devices fields become JAX mesh
    fields)."""

    seed: int = 42
    # 'auto' keeps JAX's platform choice; 'cpu'/'tpu' force that backend
    # (applied via jax.config before the first backend touch — the analogue of
    # the reference's setup.device cuda selection, default_set.py:19)
    device: str = "auto"
    # ['float32', 'bfloat16'] compute dtype: 'bfloat16' runs the hot matmul
    # paths in bf16 by setting magno.kernel_dtype (a no-op if that knob was
    # changed from its 'float32' default); attention q/k/v storage already
    # defaults to bf16 (reference: setup.dtype torch dtype selection,
    # base.py:69-77)
    dtype: str = "float32"
    trainer_name: str = "static3d"
    train: bool = True
    test: bool = False
    ckpt: bool = False
    # accepted for reference-YAML drop-in compat and deliberately inert — the
    # reference never consumes it either: default_set.py:26 is a TODO and
    # base.py:413 variance_test() is an abstract stub nothing calls, yet the
    # shipped config/examples/drivaernet/pressure.yaml sets the key
    use_variance_test: bool = False
    # distributed (JAX): data-parallel across local devices by default.
    # world_size/rank drive the multi-host bootstrap (jax.distributed.initialize,
    # the analogue of the reference's RANK/WORLD_SIZE env dance base.py:87-131);
    # local_rank is accepted for config parity but unused (a JAX process
    # addresses all its local chips).
    distributed: bool = False
    world_size: int = 1
    rank: int = 0
    local_rank: int = 0
    coordinator_address: Optional[str] = None  # host:port of process 0
    backend: str = "jax"  # parity field; collectives ride XLA/ICI
    data_parallel: Optional[int] = None  # devices for the 'data' mesh axis
    node_shards: int = 1  # devices for intra-sample node sharding ('model' axis)
    # wandb
    wandb: bool = False
    wandb_project: Optional[str] = None
    wandb_entity: Optional[str] = None
    wandb_run_name: Optional[str] = None
    wandb_group: Optional[str] = None
    wandb_mode: str = "online"
    wandb_notes: Optional[str] = None
    wandb_tags: List[str] = field(default_factory=list)
    wandb_watch_model: bool = False
    # schema-parity field, inert here exactly as in the reference (declared at
    # default_set.py:44, never read anywhere; wandb rows go out per eval epoch)
    wandb_log_interval: int = 1
    resume_from_artifact: Optional[str] = None
    resume_from_ckpt: Optional[str] = None
    test_during_training: bool = False
    # observability (improves on the reference's wall-clock-only timing,
    # SURVEY.md section 5): write a jax.profiler trace of the first training
    # steps of epoch `profile_epoch` into this directory
    profile_dir: Optional[str] = None
    profile_epoch: int = 1
    profile_steps: int = 3

    def __post_init__(self):
        # reference YAMLs write torch dtype strings ("torch.float32",
        # default_set.py:21 + the shipped pressure.yaml) — normalize to the
        # plain names the trainer consumes. float64 maps to float32: TPUs have
        # no f64 datapath and the reference only ever runs float32 in practice.
        d = self.dtype.removeprefix("torch.")
        self.dtype = "float32" if d == "float64" else d


@dataclass
class ModelArgsConfig:
    """(reference: default_set.py:50-54)"""

    latent_tokens: Tuple[int, int, int] = (64, 64, 64)
    magno: MAGNOConfig = field(default_factory=MAGNOConfig)
    transformer: TransformerConfig = field(default_factory=TransformerConfig)


@dataclass
class ModelConfig:
    """(reference: default_set.py:56-60)"""

    name: str = "gaot_3d"
    use_conditional_norm: bool = False
    args: ModelArgsConfig = field(default_factory=ModelArgsConfig)


@dataclass
class OptimizerConfig:
    """(reference: default_set.py:88-91)"""

    name: str = "adamw"
    args: OptimizerargsConfig = field(default_factory=OptimizerargsConfig)


@dataclass
class PathConfig:
    """(reference: default_set.py:93-98)"""

    ckpt_path: str = ".ckpt/test/test.msgpack"
    loss_path: str = ".loss/test/test.png"
    result_path: str = ".result/test/test.png"
    database_path: str = ".database/test/test.csv"


@dataclass
class RunConfig:
    setup: SetUpConfig = field(default_factory=SetUpConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    path: PathConfig = field(default_factory=PathConfig)


def load_run_config(filename: str) -> RunConfig:
    raw = load_config_file(filename)
    return dataclass_from_dict(RunConfig, raw)
