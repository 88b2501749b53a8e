"""Trainers.

TrainerBase + StaticTrainer3D: the JAX/TPU counterpart of the reference
trainer stack (src/trainer/base.py:17-419, src/trainer/stat.py:40-788):

  - config merge, seeding (seed + process_index, base.py:46), loss = MSE
  - dataset init: latent token grid from metadata domain bounds rescaled with
    the reference's scalar min-max (stat.py:239-252), normalization stats
    computed from the train split or loaded from cache (stat.py:56-124),
    split loaders with per-process sharding (the DistributedSampler analogue)
  - fit(): epoch loop with per-epoch shuffling, eval every `eval_every_eps`
    epochs, best-state tracking by train or val metric with in-memory best
    params restored at the end (optimizers.py:158-179,304-326), loss curves
  - validate(): batch-mean losses summed, all-reduced across processes, and
    divided by the dataset size (stat.py:552-573 — including its
    sum-of-batch-means/num-samples quirk)
  - NOTE the reference AdamW loop validates on the TEST loader
    ("# TODO: change to val_loader", optimizers.py:288). We default to the val
    loader and expose `validate_on_test` to reproduce the reference exactly.
  - test(): timed inference loop with data-vs-inference split and a throughput
    report (stat.py:575-708), de-normalization, metric suites, npz dump + 3D
    render of the first sample
  - train_step: 'full_grid' (masked MSE on all valid nodes) or 'neural_field'
    (per-graph uniform node subsampling for encoder input and decoder queries,
    same permutation when the sizes match — stat.py:438-514) — here the
    sampling runs on device inside the jitted step.

TPU-first: one jitted train step (pure function of (state, batch, rng));
data-parallel and node-sharded execution come from gaot3d_tpu.parallel by
donating the state and sharding the batch, not from a DDP wrapper.
"""
from __future__ import annotations

import logging
import os
import statistics
import time
from dataclasses import asdict
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from ..config import RunConfig
from ..data.dataset import DatasetConfig, MeshDataset, compute_or_load_stats
from ..data.pipeline import BatchLoader, PointBatch, SamplePreprocessor, prefetch_to_device
from ..metadata import DATASET_METADATA
from ..models import init_model
from ..ops.grid_graph import LatentGrid
from ..utils.rand import manual_seed
from .checkpoint import load_checkpoint, load_params_only, save_checkpoint
from .metrics import compute_drivaernet_metric, compute_general_metrics, compute_poseidon_metric
from .schedule import make_optimizer

logger = logging.getLogger(__name__)


def masked_mse(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """MSE over valid nodes only — equals the reference's nn.MSELoss over the
    concatenated (ragged) batch (base.py:56, stat.py:550)."""
    diff = (pred - target) * mask[..., None]
    denom = jnp.maximum(mask.sum() * pred.shape[-1], 1)
    return (diff * diff).sum() / denom


def initialize_distributed(setup) -> None:
    """Multi-host bootstrap: the JAX analogue of the reference's env-var rank
    dance + init_process_group + barrier (src/trainer/base.py:87-131).

    world_size > 1 means this process is one of several hosts of a slice/pod:
    jax.distributed.initialize must run before the first backend touch so every
    process sees the global device set. With a coordinator_address configured
    we pass the explicit (addr, world_size, rank) triple; otherwise JAX
    auto-detects from the TPU pod / cluster environment. local_rank is accepted
    for config parity but unused — a JAX process addresses all its local chips.
    """
    if getattr(setup, "world_size", 1) <= 1:
        return
    kwargs = {}
    if getattr(setup, "coordinator_address", None):
        kwargs = dict(
            coordinator_address=setup.coordinator_address,
            num_processes=setup.world_size,
            process_id=setup.rank,
        )
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # already initialized (launcher did it) — proceed
        logger.info("jax.distributed.initialize skipped: %s", e)


def sample_nodes_without_replacement(rng: jax.Array, mask: jnp.ndarray, k: int):
    """Per-graph uniform sample of k valid node indices ([B, N] mask -> [B, k]
    indices + validity). Device-side replacement for the host randperm loop in
    the reference neural-field sampler (stat.py:460-483)."""
    r = jax.random.uniform(rng, mask.shape)
    r = jnp.where(mask, r, jnp.inf)
    _, idx = jax.lax.top_k(-r, k)
    valid = jnp.take_along_axis(mask, idx, axis=1)
    return idx, valid


def gather_nodes(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """arr [B, N, C], idx [B, k] -> [B, k, C]"""
    return jnp.take_along_axis(arr, idx[..., None], axis=1)


class TrainState(train_state.TrainState):
    pass


def _process_rss_gb() -> float:
    """Resident set size of this process in GB (reference: psutil RSS per eval
    row, optimizers.py:301). Reads /proc to avoid a psutil dependency."""
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        return pages * os.sysconf("SC_PAGE_SIZE") / 1e9
    except Exception:  # pragma: no cover — non-Linux host
        return 0.0


class TrainerBase:
    """(reference: src/trainer/base.py — config plumbing, seeding, wandb/CSV
    observability, fit/test orchestration)."""

    def __init__(self, config: RunConfig):
        self.config = config
        self.setup_config = config.setup
        self.model_config = config.model
        self.dataset_config = config.dataset
        self.optimizer_config = config.optimizer
        self.path_config = config.path
        self.datarow: Dict[str, Any] = {}
        self._last_grad_norm = None
        # per-epoch loader accounting (set by optimize(); see
        # prefetch_to_device stats): steady-state stall past the warm-up
        # batch, and the warm-up wait itself
        self.last_loader_stall_s = 0.0
        self.last_loader_first_wait_s = 0.0
        self.last_loader_stats: Dict[str, float] = {}

        # setup.device selects the JAX backend (the analogue of the
        # reference's cuda device selection, default_set.py:19) — must happen
        # before the first backend touch below. Reference configs say
        # 'cuda:0'; the ordinal is meaningless here (a JAX process addresses
        # all local devices), so only the platform name is kept.
        device = (self.setup_config.device or "auto").split(":")[0].lower()
        if device not in ("auto", ""):
            if device in ("cpu", "tpu", "axon"):
                try:
                    jax.config.update("jax_platforms", device)
                except Exception as e:  # pragma: no cover
                    logger.warning("could not select platform %r: %s", device, e)
            else:
                # reference configs say 'cuda:0' — meaningless on a TPU
                # build; keep JAX's default so those configs still drop in
                logger.warning("setup.device %r not available in this build; "
                               "keeping JAX's default platform",
                               self.setup_config.device)

        # persistent compilation cache: remote (axon) compiles of the 500K+
        # recipes take 15-25 MINUTES; cached executables load in seconds.
        # Same cache dir bench.py uses. Harmless on CPU (min-compile gate).
        try:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get(
                    "GAOT_COMPILE_CACHE",
                    os.path.join(os.path.dirname(os.path.dirname(
                        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"),
                ),
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
        except Exception:  # pragma: no cover - older jax without the knob
            pass

        initialize_distributed(self.setup_config)
        self.process_index = jax.process_index()
        self.num_processes = jax.process_count()
        self.is_main = self.process_index == 0
        manual_seed(self.setup_config.seed + self.process_index)
        # The jit step rng is GLOBAL, not per-process: under GSPMD there is
        # one logical program, and replicated inputs (the step rng) must be
        # identical on every process — a per-process key would desynchronize
        # the SPMD programs. The reference's per-rank seed (base.py:46)
        # decorrelates rank-local dropout in DDP, where each rank runs its
        # own model copy; in GSPMD dropout is part of the single global
        # program, so one key is the correct analogue. Single-process value
        # is unchanged (seed + 0 == seed).
        self.rng = jax.random.key(self.setup_config.seed)
        self.dtype = jnp.bfloat16 if self.setup_config.dtype == "bfloat16" else jnp.float32

        self.metadata = DATASET_METADATA[self.dataset_config.metaname]
        self._wandb = None
        self._init_wandb()
        self.init_dataset(self.dataset_config)
        self.init_model(self.model_config)
        self.init_optimizer(self.optimizer_config)
        self.datarow["nparams"] = self.num_params
        self.datarow["nbytes"] = self.num_bytes

    # -- observability -----------------------------------------------------
    def _init_wandb(self):
        """wandb is optional (gated import, mirrors base.py:155-191)."""
        if not self.setup_config.wandb or not self.is_main:
            return
        try:
            import wandb

            self._wandb = wandb
            wandb.init(
                project=self.setup_config.wandb_project,
                entity=self.setup_config.wandb_entity,
                name=self.setup_config.wandb_run_name,
                group=self.setup_config.wandb_group,
                mode=self.setup_config.wandb_mode,
                notes=self.setup_config.wandb_notes,
                tags=list(self.setup_config.wandb_tags),
                config=asdict(self.config) if hasattr(self.config, "__dataclass_fields__") else None,
            )
        except Exception as e:  # pragma: no cover
            logger.warning("wandb init failed (%s); continuing without wandb", e)
            self._wandb = None

    def log_metrics(self, metrics: Dict[str, float], step: int):
        if self._wandb is not None:
            try:
                self._wandb.log(metrics, step=step)
            except Exception as e:  # pragma: no cover
                logger.warning("wandb log failed: %s", e)

    # -- model/optimizer ----------------------------------------------------
    def init_dataset(self, dataset_config: DatasetConfig):
        raise NotImplementedError

    def init_model(self, model_config):
        raise NotImplementedError

    def init_optimizer(self, optimizer_config):
        steps_per_epoch = max(1, len(self.train_loader)) if getattr(self, "train_loader", None) else 1
        self.tx = make_optimizer(optimizer_config.name, optimizer_config.args, steps_per_epoch)
        self.state = TrainState.create(apply_fn=self.model.apply, params=self.params, tx=self.tx)
        del self.params
        if getattr(self, "mesh", None) is not None and self.num_processes > 1:
            # replicate the train state across the global mesh explicitly:
            # model.init placed params on this process's local device, and a
            # multi-process jit cannot consume committed local-device arrays
            # (every process holds identical values — init ran from the same
            # global step rng)
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(self.mesh, PartitionSpec())
            self.state = jax.tree.map(
                lambda x: jax.device_put(np.asarray(x), rep), self.state)

    # -- checkpoint artifacts --------------------------------------------------
    def save_checkpoint_artifact(
        self, epoch: int, train_loss: float, val_loss: float, is_best: bool = False
    ):
        """Versioned checkpoint artifacts with 'latest'/'best' aliases and
        loss/epoch metadata (reference: base.py:206-252 W&B artifacts). Uses
        W&B when enabled, otherwise a local artifact directory next to the
        checkpoint path — same aliases, same metadata, no external service."""
        if not self.is_main:
            return
        import json

        base = self.path_config.ckpt_path
        art_dir = os.path.join(os.path.dirname(base) or ".", "artifacts")
        os.makedirs(art_dir, exist_ok=True)
        name = os.path.splitext(os.path.basename(base))[0]
        version_path = os.path.join(art_dir, f"{name}-e{epoch}.msgpack")
        self.save_ckpt(version_path, extra={"epoch": jnp.asarray(epoch)})
        meta_path = os.path.join(art_dir, f"{name}-aliases.json")
        aliases = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                aliases = json.load(f)
        record = {"path": version_path, "epoch": epoch,
                  "train_loss": float(train_loss), "val_loss": float(val_loss)}
        aliases["latest"] = record
        if is_best:
            aliases["best"] = record
        with open(meta_path, "w") as f:
            json.dump(aliases, f, indent=1)
        if self._wandb is not None:
            try:
                art = self._wandb.Artifact(f"model-{name}", type="model",
                                           metadata={k: v for k, v in record.items() if k != "path"})
                art.add_file(version_path)
                self._wandb.log_artifact(
                    art, aliases=["latest", "best"] if is_best else ["latest"]
                )
            except Exception as e:  # pragma: no cover
                logger.warning("wandb artifact save failed: %s", e)

    def load_from_artifact(self, spec: str):
        """Load 'name:alias' from W&B, or an alias ('best'/'latest') from the
        local artifact directory (reference: base.py:254-261 + main.py:136-141
        load priority)."""
        alias = spec.split(":")[-1] if ":" in spec else spec
        if self._wandb is not None and ":" in spec:
            try:
                art = self._wandb.use_artifact(spec)
                path = art.download()
                files = [f for f in os.listdir(path) if f.endswith(".msgpack")]
                self.load_ckpt(os.path.join(path, files[0]))
                return
            except Exception as e:  # pragma: no cover
                logger.warning("wandb artifact load failed (%s); trying local", e)
        import json

        base = self.path_config.ckpt_path
        name = os.path.splitext(os.path.basename(base))[0]
        meta_path = os.path.join(os.path.dirname(base) or ".", "artifacts", f"{name}-aliases.json")
        with open(meta_path) as f:
            aliases = json.load(f)
        self.load_ckpt(aliases[alias]["path"])

    # -- checkpointing -------------------------------------------------------
    def save_ckpt(self, path: Optional[str] = None, extra: Optional[Dict] = None):
        if not self.is_main:
            return
        path = path or self.path_config.ckpt_path
        state = {"params": self.state.params, "opt_state": self.state.opt_state,
                 "step": self.state.step}
        if extra:
            state.update(extra)
        save_checkpoint(path, state)
        logger.info("Saved checkpoint to %s", path)

    def load_ckpt(self, path: Optional[str] = None, params_only: bool = True):
        path = path or self.path_config.ckpt_path
        if params_only:
            params = load_params_only(path, self.state.params)
            self.state = self.state.replace(params=params)
        else:
            template = {"params": self.state.params, "opt_state": self.state.opt_state,
                        "step": self.state.step}
            restored = load_checkpoint(path, template)
            self.state = self.state.replace(
                params=restored["params"], opt_state=restored["opt_state"], step=restored["step"]
            )
        logger.info("Loaded checkpoint from %s", path)

    # -- orchestration --------------------------------------------------------
    def fit(self):
        result = self.optimize()
        self.datarow["training time"] = result["time"]
        if self.is_main:
            self.plot_losses(result)
            self.save_ckpt()
            if self._wandb is not None:
                try:
                    self._wandb.summary.update({"best_epoch": result["best"]["epoch"],
                                                "best_loss": result["best"]["loss"]})
                except Exception:
                    pass
        if self.setup_config.test:
            self.test()
        return result

    def plot_losses(self, result: Dict):
        """Loss curves saved as PNG + NPZ (reference: base.py:360-407)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            path = self.path_config.loss_path
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            fig, ax = plt.subplots(figsize=(7, 4))
            ax.plot(result["train"]["epoch"], result["train"]["loss"], label="train")
            ax.plot(result["valid"]["epoch"], result["valid"]["loss"], label="valid")
            ax.set_xlabel("epoch")
            ax.set_ylabel("MSE loss")
            ax.set_yscale("log")
            ax.legend()
            fig.tight_layout()
            fig.savefig(path, dpi=120)
            plt.close(fig)
            np.savez(
                path.rsplit(".", 1)[0] + ".npz",
                train_epoch=np.asarray(result["train"]["epoch"]),
                train_loss=np.asarray(result["train"]["loss"]),
                val_epoch=np.asarray(result["valid"]["epoch"]),
                val_loss=np.asarray(result["valid"]["loss"]),
            )
        except Exception as e:  # pragma: no cover
            logger.warning("loss plotting failed: %s", e)

    def current_lr(self) -> float:
        """Learning rate of the current optimizer state (reference:
        optimizer.param_groups[0]['lr'] per eval row, optimizers.py:289-296).
        make_optimizer wraps adam/adamw in optax.inject_hyperparams, so the
        schedule's current value lives in opt_state.hyperparams."""
        try:
            return float(self.state.opt_state.hyperparams["learning_rate"])
        except Exception:  # pragma: no cover — custom tx without hyperparams
            return float("nan")

    @property
    def num_params(self) -> int:
        return int(sum(x.size for x in jax.tree.leaves(self.state.params)))

    @property
    def num_bytes(self) -> int:
        return int(sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(self.state.params)))


class StaticTrainer3D(TrainerBase):
    """Static (time-independent) 3D PDE trainer (reference: stat.py:40-788)."""

    def __init__(self, config: RunConfig):
        if config.dataset.training_strategy == "neural_field":
            # neural_field requires on-device edge building from sampled coords
            # (reference constraint stat.py:48-54)
            if config.dataset.update_pt_files_with_edges:
                raise ValueError(
                    "neural_field training strategy requires update_pt_files_with_edges=False"
                )
            if config.model.args.magno.asynchronous_graph_building:
                # the async collate would host-build full-graph slots per
                # sample per epoch that the neural-field step never consumes
                # (it samples nodes on device and rebuilds edges from the
                # sampled coords) — refuse like the precompute conflict above
                raise ValueError(
                    "neural_field training strategy requires "
                    "asynchronous_graph_building=False (edges are built "
                    "on device from the sampled coordinates)"
                )
            config.model.args.magno.precompute_edges = False
        super().__init__(config)

    # -- data ---------------------------------------------------------------
    def init_dataset(self, dataset_config: DatasetConfig):
        logger.info("Initializing dataset ...")
        if dataset_config.metaname.startswith("synthetic/") and not os.path.isdir(
            os.path.join(dataset_config.base_path, dataset_config.processed_folder)
        ):
            from ..data.dataset import generate_synthetic_dataset

            logger.info("Generating synthetic dataset at %s", dataset_config.base_path)
            generate_synthetic_dataset(dataset_config, dataset_config.base_path)
        dims = self.model_config.args.latent_tokens
        lo, hi = self.metadata.domain_x
        # latent token grid spans the metadata domain rescaled to [-1,1]; the
        # same affine map applies under both rescale modes (scale.py:5-25 both
        # use the scalar global min/max), so one construction suffices
        self.grid = LatentGrid.from_domain(dims, lo, hi, rescale_to=(-1, 1))
        self.latent_tokens_pos = self.grid.positions()

        train_ds = MeshDataset(dataset_config, "train") if self.setup_config.train else None
        if dataset_config.use_metadata_stats:
            self.stats = {
                "mean": np.asarray(self.metadata.global_mean, np.float32),
                "std": np.asarray(self.metadata.global_std, np.float32),
            }
            # metadata constants are FULL-width -> select the active channels
            # (reference stat.py:717-718 does the same for this path)
            if dataset_config.active_variables is not None:
                av = list(dataset_config.active_variables)
                self.stats = {
                    "mean": self.stats["mean"][av], "std": self.stats["std"][av]
                }
        else:
            # computed stats are ALREADY in active-variable space: the dataset
            # slices x at load (data/dataset.py:138-139), so no second
            # selection. (The reference re-indexes its equally-pre-sliced
            # u_mean at stat.py:283-286 — a latent bug that only works for
            # prefix selections like [0,1]; not replicated.)
            # compute_or_load_stats builds its own train dataset when None
            self.stats = compute_or_load_stats(dataset_config, train_ds)

        pre = SamplePreprocessor(
            stats=self.stats,
            metadata=self.metadata,
            use_rescale_new=dataset_config.use_rescale_new,
            encoder_feature_attr=self.model_config.args.magno.encoder_feature_attr,
        )
        self.preprocessor = pre

        # --- graph-building mode (reference stat.py:257-272, collate pipeline)
        magno_cfg = self.model_config.args.magno
        from ..models.magno import parse_edge_layout as _parse_layout

        # node-sharded runs need SHARD-ALIGNED sections: the loader deals
        # degree-sorted nodes round-robin to node_shards equal ranges and
        # lays every section leaf out shard-major, so [B, Ns, Ks] leaves
        # split exactly at node-shard boundaries (SectionedEdgeSlots.shards).
        self._section_shards = 1
        if ("sectioned" in _parse_layout(magno_cfg.edge_layout)
                and self.setup_config.distributed
                and self.setup_config.node_shards > 1):
            self._section_shards = self.setup_config.node_shards
            if dataset_config.pad_multiple % self._section_shards != 0:
                # fail here (pure config validation, before the precompute
                # sweep) instead of an opaque divisibility error at collate.
                # Divisibility by section_shards is SUFFICIENT: the loader
                # only needs n_pad % shards == 0 (pipeline.py), and the
                # per-shard chunking adapts via effective_chunk — requiring
                # pad_multiple % (shards * edge_chunk_size) here would
                # reject the shipped pad_multiple 65536 + node_shards 2
                # configuration, which works.
                raise ValueError(
                    "sectioned + node sharding needs dataset.pad_multiple "
                    f"({dataset_config.pad_multiple}) divisible by "
                    f"node_shards ({self._section_shards})"
                )
        slot_mode = "device"
        slot_builder = None
        if dataset_config.update_pt_files_with_edges:
            from ..data.graph_precompute import update_sample_files_with_edges

            # rank 0 only (reference stat.py:257-268): concurrent sweeps from
            # several processes would race on the same sample files
            if self.is_main:
                update_sample_files_with_edges(dataset_config, magno_cfg, self.grid, self.metadata)
            if self.num_processes > 1:
                # barrier analogue of stat.py:265-268
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("edge_precompute")
            slot_mode = "precomputed"
            magno_cfg.precompute_edges = True
        elif magno_cfg.asynchronous_graph_building:
            from ..models.magno import parse_edge_layout, parse_neighbor_strategy
            from ..ops.grid_graph import build_edge_slots_host as build_edge_slots_np

            enc_s, dec_s = parse_neighbor_strategy(magno_cfg.neighbor_strategy)
            grid = self.grid
            # sectioned layout needs valid-first budget-compacted slots on
            # the host (section widths truncate K columns); other layouts
            # keep the raw stencil window and compact on device
            bud = (
                (magno_cfg.slot_budget or 0)
                if "sectioned" in parse_edge_layout(magno_cfg.edge_layout)
                else 0
            )

            def slot_builder(pos):
                out = {"encoder": [], "decoder": []}
                for scale in magno_cfg.scales:
                    r = magno_cfg.gno_radius * scale
                    out["encoder"].append(
                        build_edge_slots_np(pos, grid, r, magno_cfg.k_neighbors,
                                            enc_s, budget=bud)
                    )
                    out["decoder"].append(
                        build_edge_slots_np(pos, grid, r, magno_cfg.k_neighbors,
                                            dec_s, budget=bud)
                    )
                return out

            slot_mode = "async"
            magno_cfg.precompute_edges = True

        # one test dataset + preprocessed probe sample shared by the
        # slot-budget check, the loaders, and the datarow edge counts below
        # (each probe slot build costs ~26s/500K nodes on the numpy fallback)
        test_ds = MeshDataset(dataset_config, "test")
        probe_sample = pre(test_ds[0])
        # per-sample node count (pre-padding): drives the host-staged-prefetch
        # decision in optimize() — see _host_stage_batches
        self._probe_num_nodes = int(probe_sample["pos"].shape[0])
        probe_masks = {}
        if (dataset_config.use_metadata_stats and "c" in probe_sample
                and "c_mean" not in self.stats):
            # metadata stats carry only u mean/std — SamplePreprocessor then
            # passes condition features through RAW (pipeline.py c_mean gate).
            # Surface it: the flag claims to change only where u-stats come
            # from, but it also silently changes c's scale.
            logger.warning(
                "use_metadata_stats=True: dataset has condition features 'c' "
                "but metadata provides no c stats — 'c' is NOT normalized")

        # slot_budget safety: compaction is only exact when the budget covers
        # the max per-point degree — validate against a real sample up front
        if magno_cfg.slot_budget is not None:
            from ..models.magno import parse_neighbor_strategy as _pns
            from ..ops.grid_graph import build_edge_slots_host as build_edge_slots_np

            probe_pos = probe_sample["pos"]
            enc_s, dec_s = _pns(magno_cfg.neighbor_strategy)
            for strat in {enc_s, dec_s}:
                for scale in magno_cfg.scales:
                    _, m = build_edge_slots_np(
                        probe_pos, self.grid, magno_cfg.gno_radius * scale,
                        magno_cfg.k_neighbors, strat,
                    )
                    probe_masks[(strat, magno_cfg.gno_radius * scale)] = m
                    deg = int(m.sum(axis=-1).max())
                    if deg > magno_cfg.slot_budget:
                        raise ValueError(
                            f"magno.slot_budget={magno_cfg.slot_budget} is below the "
                            f"max per-point degree {deg} observed for strategy "
                            f"'{strat}' at scale {scale} — compaction would drop "
                            f"edges. Raise slot_budget to at least {deg}."
                        )

        from ..models.magno import parse_edge_layout

        if "sectioned" in parse_edge_layout(magno_cfg.edge_layout):
            # degree-sectioned slots need host-built (compacted) slots; the
            # node permutation happens at batch assembly (data/pipeline.py)
            if slot_mode == "device":
                raise ValueError(
                    "magno.edge_layout='sectioned' requires precomputed or "
                    "async graph building"
                )
            if not magno_cfg.slot_budget:
                raise ValueError(
                    "magno.edge_layout='sectioned' requires slot_budget "
                    "(sections truncate the valid-first compacted K columns)"
                )
        if "flat" in parse_edge_layout(magno_cfg.edge_layout):
            # flat edge lists need host-built slots and the fused model paths.
            # Node sharding works: flat leaves are [B, nc, E] and the chunk
            # axis shards alongside the point axis (each device holds its own
            # chunks' edges; src indices are chunk-local) — exactness pinned
            # by tests/test_parallel.py::test_node_sharded_flat_edges.
            if slot_mode == "device":
                raise ValueError(
                    "magno.edge_layout='flat' requires precomputed or async "
                    "graph building (update_pt_files_with_edges or "
                    "asynchronous_graph_building)"
                )

        shard_kw = dict(num_shards=self.num_processes, shard_index=self.process_index)
        common = dict(
            preprocessor=pre,
            batch_size=dataset_config.batch_size,
            pad_multiple=dataset_config.pad_multiple,
            num_workers=dataset_config.num_workers,
            slot_mode=slot_mode,
            slot_builder=slot_builder,
            num_scales=len(magno_cfg.scales),
            edge_layout=magno_cfg.edge_layout,
            edge_chunk_size=magno_cfg.edge_chunk_size,
            flat_order=magno_cfg.flat_order,
            flat_edges_per_chunk=magno_cfg.flat_edges_per_chunk or 0,
            sectioned_profile=getattr(magno_cfg, "sectioned_profile", None),
            section_shards=self._section_shards,
        )
        # HBM-resident batch caches (DatasetConfig.device_cache): cached
        # entries are placed with the trainer's own put (harvested layouts /
        # mesh sharding) so post-warm epochs re-upload nothing host->device
        dc = bool(getattr(dataset_config, "device_cache", False))
        # host-staged batches at DrivAerML scale: loaders assemble NUMPY and
        # the steps place exactly ONE batch on device (in entry layouts).
        # Without this the assembly's jnp conversion puts every prefetched
        # batch in HBM from the producer thread — 2-4 resident batches on top
        # of the step's ~14.5 GB temps OOM'd the 8M single-chip run (round 4)
        host_stage = self._host_stage_batches()
        if host_stage and dc:
            logger.warning(
                "device_cache disabled: host-staged batches (>= "
                "GAOT_HOST_STAGE_NODES nodes/batch) must not stay HBM-resident")
            dc = False
        common["host_arrays"] = host_stage
        if self.setup_config.train:
            self.train_loader = BatchLoader(
                train_ds, shuffle=dataset_config.shuffle, drop_last=self.num_processes > 1,
                seed=self.setup_config.seed, device_cache=dc,
                cache_put=self._device_put_batch, **shard_kw, **common,
            )
            self.val_loader = BatchLoader(
                MeshDataset(dataset_config, "val"), shuffle=False, device_cache=dc,
                cache_put=self._device_put_val_batch, **shard_kw, **common,
            )
        else:
            self.train_loader = None
            self.val_loader = None
        # test runs unsharded; rank 0 aggregates (stat.py:408-418). No device
        # cache: test() runs once, and its timing report must measure the
        # real load+transfer path (reference semantics, stat.py:620-668)
        self.test_loader = BatchLoader(test_ds, shuffle=False, **common)
        sample = probe_sample
        self.num_input_channels = sample["enc_feats"].shape[-1]
        self.num_output_channels = sample["x"].shape[-1]

        # edge-count columns in the results row (reference datarow
        # 'p2r edges' / 'r2p edges', main.py:107-118; measured on sample 0 —
        # reusing the budget probe's masks when it already built them)
        try:
            from ..models.magno import parse_neighbor_strategy as _pns2
            from ..ops.grid_graph import build_edge_slots_host as _besn

            enc_s2, dec_s2 = _pns2(magno_cfg.neighbor_strategy)

            def _probe_mask(strat):
                m = probe_masks.get((strat, magno_cfg.gno_radius))
                if m is None:
                    _, m = _besn(sample["pos"], self.grid, magno_cfg.gno_radius,
                                 magno_cfg.k_neighbors, strat)
                return m

            self.datarow["p2r edges"] = int(_probe_mask(enc_s2).sum())
            self.datarow["r2p edges"] = int(_probe_mask(dec_s2).sum())
            self.datarow["r2r edges"] = -1  # no latent-latent graph (attention)
        except Exception:  # pragma: no cover
            pass

    # -- model ----------------------------------------------------------------
    def init_model(self, model_config):
        # setup.dtype='bfloat16' propagates to the hot matmul paths unless the
        # user pinned those knobs explicitly (config.py SetUpConfig.dtype)
        if self.setup_config.dtype == "bfloat16":
            magno_cfg = model_config.args.magno
            if magno_cfg.kernel_dtype == "float32":
                magno_cfg.kernel_dtype = "bfloat16"
            # attention_dtype already defaults to bf16 storage; nothing to do
        self.model = init_model(
            input_size=self.num_input_channels,
            output_size=self.num_output_channels,
            model=model_config.name,
            magno_config=model_config.args.magno,
            attn_config=model_config.args.transformer,
            latent_tokens=model_config.args.latent_tokens,
            grid=self.grid,
        )
        # init with a tiny dummy batch (static shapes don't matter for params)
        dummy_n = 32
        pos = jnp.zeros((1, dummy_n, 3), jnp.float32)
        feats = jnp.zeros((1, dummy_n, self.num_input_channels), jnp.float32)
        mask = jnp.ones((1, dummy_n), bool)
        self.rng, init_rng = jax.random.split(self.rng)
        self.params = self.model.init({"params": init_rng}, pos, feats, mask)

        if self.setup_config.distributed:
            # SPMD replacement for the reference's DDP wrap (stat.py:431-436):
            # batch sharded over the 'data' mesh axis (+ optionally the point
            # axis over 'node'), params replicated, XLA inserts the gradient
            # all-reduce over ICI.
            from ..parallel import make_mesh

            node = max(1, self.setup_config.node_shards)
            data = self.setup_config.data_parallel
            self.mesh = make_mesh(data=data, node=node)
            self._shard_nodes = node > 1
            # built lazily from the first real batch so the in_shardings
            # pytree matches its structure (precomputed edge slots shard
            # alongside the node axis instead of being dropped). The eval
            # step is lazy for the same reason: it uses the SAME batch
            # shardings as training, so 8-10M-node eval fits the mesh
            # (reference evaluates through the DDP-wrapped model,
            # stat.py:552-573)
            self._jit_train_step = None
            self._jit_eval_step = None
        else:
            self.mesh = None
            self._shard_nodes = False
            self._jit_train_step = jax.jit(self._train_step, donate_argnums=(0,))
            self._jit_eval_step = jax.jit(self._eval_step)
        # per-rank val components step; only built when num_processes > 1
        # (see _validate_multiprocess)
        self._jit_val_step = None
        # compiled-argument layouts, harvested lazily at scale (see
        # _maybe_harvest_formats). Keyed by the batch's PADDED SHAPE: batches
        # pad per-batch (pipeline round_up), so one format set per compiled
        # shape — a single cached format would silently stop matching (and
        # stop helping) the moment a differently-padded batch arrives.
        # Value False = harvesting not applicable for that shape.
        self._batch_formats = {}
        self._eval_batch_formats = {}

    # -- steps ------------------------------------------------------------------
    def _forward_loss(self, params, batch: PointBatch, rngs, train: bool):
        strategy = self.dataset_config.training_strategy
        if train and strategy == "neural_field":
            k_in = int(self.dataset_config.neural_field_input_nodes)
            k_q = int(self.dataset_config.neural_field_query_nodes_train)
            k_in = min(k_in, batch.pos.shape[1])
            k_q = min(k_q, batch.pos.shape[1])
            rngs = dict(rngs)
            sample_rng = rngs.pop("sample")
            in_rng, q_rng = jax.random.split(sample_rng)
            in_idx, in_valid = sample_nodes_without_replacement(in_rng, batch.node_mask, k_in)
            if k_in == k_q:
                q_idx, q_valid = in_idx, in_valid  # same perm (stat.py:478-480)
            else:
                q_idx, q_valid = sample_nodes_without_replacement(q_rng, batch.node_mask, k_q)
            pred = self.model.apply(
                params,
                gather_nodes(batch.pos, in_idx),
                gather_nodes(batch.feats, in_idx),
                in_valid,
                query_pos=gather_nodes(batch.pos, q_idx),
                query_mask=q_valid,
                train=train,
                rngs=rngs,
            )
            target = gather_nodes(batch.target, q_idx)
            return masked_mse(pred, target, q_valid)
        pred = self.model.apply(
            params, batch.pos, batch.feats, batch.node_mask, train=train, rngs=rngs,
            encoder_slots=list(batch.enc_slots) if batch.enc_slots is not None else None,
            decoder_slots=list(batch.dec_slots) if batch.dec_slots is not None else None,
        )
        return masked_mse(pred, batch.target, batch.node_mask)

    def _train_step(self, state: TrainState, batch: PointBatch, rng: jax.Array):
        rngs = {"dropout": jax.random.fold_in(rng, 0),
                "edges": jax.random.fold_in(rng, 1),
                "sample": jax.random.fold_in(rng, 2)}
        # loss_scale multiplies the differentiated loss only; the reported
        # loss stays unscaled (see OptimizerargsConfig.loss_scale)
        scale = float(self.optimizer_config.args.loss_scale)
        loss, grads = jax.value_and_grad(
            lambda p: scale * self._forward_loss(p, batch, rngs, train=True)
        )(state.params)
        if scale != 1.0:
            loss = loss / scale
        # gradient global-norm: the JAX stand-in for wandb.watch(model)
        # gradient histograms (reference base.py:187-188); negligible cost
        grad_norm = optax.global_norm(grads)
        state = state.apply_gradients(grads=grads)
        return state, loss, grad_norm

    def _eval_step(self, params, batch: PointBatch):
        pred = self.model.apply(
            params, batch.pos, batch.feats, batch.node_mask, train=False,
            encoder_slots=list(batch.enc_slots) if batch.enc_slots is not None else None,
            decoder_slots=list(batch.dec_slots) if batch.dec_slots is not None else None,
        )
        return pred, masked_mse(pred, batch.target, batch.node_mask)

    def _val_components_step(self, params, batch: PointBatch):
        """Per-SAMPLE loss components ([B] squared-error sums + valid counts)
        — multi-process validate reconstructs each process's rank-local
        batch-mean from these, reproducing the reference's partitioning
        quirk exactly (DDP validate all-reduces per-RANK batch node-means,
        stat.py:552-573; the global batch-mean is NOT the sum of rank means).
        Only compiled when num_processes > 1."""
        pred = self.model.apply(
            params, batch.pos, batch.feats, batch.node_mask, train=False,
            encoder_slots=list(batch.enc_slots) if batch.enc_slots is not None else None,
            decoder_slots=list(batch.dec_slots) if batch.dec_slots is not None else None,
        )
        diff = (pred - batch.target) * batch.node_mask[..., None]
        sq = (diff * diff).sum(axis=(1, 2))
        cnt = batch.node_mask.sum(axis=1) * pred.shape[-1]
        if self.mesh is not None and self.num_processes > 1:
            # replicate the per-sample components inside the jit (GSPMD
            # all-gather): the raw outputs inherit the data-axis sharding,
            # which spans processes — a host np.asarray on such an array
            # raises; fully-replicated arrays fetch fine on every process
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(self.mesh, PartitionSpec())
            sq = jax.lax.with_sharding_constraint(sq, rep)
            cnt = jax.lax.with_sharding_constraint(cnt, rep)
        return sq, cnt

    def _device_put_batch(self, batch: PointBatch) -> PointBatch:
        """Place a batch on the device(s): in the compiled train step's
        argument layouts once those are harvested (jit dispatch relayouts any
        mismatched-layout argument on EVERY call — at >=1M nodes XLA assigns
        transposed/tiled entry layouts to the big point/slot arrays and the
        per-call relayout dominates the step; measured 11.7s vs 2.48s at 2M
        nodes on v5e), else mesh-sharded when distributed, else a plain
        device_put. Idempotent — device_put to the format an array already
        has is a no-op, so prefetched batches pass through."""
        fmts = self._batch_formats.get(self._format_key(batch))
        if fmts:
            from ..utils.layout import put_to_formats

            return put_to_formats(batch, fmts)
        if self.mesh is not None:
            from ..parallel import shard_point_batch

            # the train loader is per-process sharded (indices[rank::world])
            # whenever num_processes > 1, so its batches are process-LOCAL
            # rows of the global batch (see shard_point_batch docstring)
            return shard_point_batch(batch, self.mesh, shard_nodes=self._shard_nodes,
                                     process_local=self.num_processes > 1)
        return jax.device_put(batch)

    def _device_put_eval_batch(self, batch: PointBatch) -> PointBatch:
        """Eval twin of _device_put_batch using the EVAL step's harvested
        layouts — placing eval batches in the TRAIN formats first would
        relayout each batch twice (train formats in the prefetcher, eval
        formats at dispatch).

        GLOBAL-batch semantics (the test / validate_on_test loaders are
        unsharded: every process iterates the full set, each batch is the
        global value — reference stat.py:408-418). Multi-process runs
        REPLICATE the batch axis: the global B (often 1) need not divide the
        data mesh axis, and replicated outputs are host-fetchable on every
        process (test() pulls predictions). The per-process SHARDED val
        loader places through _device_put_val_batch instead."""
        fmts = self._eval_batch_formats.get(self._format_key(batch))
        if fmts:
            from ..utils.layout import put_to_formats

            return put_to_formats(batch, fmts)
        if self.mesh is not None:
            from ..parallel import shard_point_batch

            return shard_point_batch(batch, self.mesh, shard_nodes=self._shard_nodes,
                                     replicate_data=self.num_processes > 1)
        return jax.device_put(batch)

    def _device_put_val_batch(self, batch: PointBatch) -> PointBatch:
        """Placement for the per-process SHARDED val loader: its batches are
        process-local rows of the global validation batch."""
        if self.mesh is not None:
            from ..parallel import shard_point_batch

            return shard_point_batch(batch, self.mesh, shard_nodes=self._shard_nodes,
                                     process_local=self.num_processes > 1)
        return jax.device_put(batch)

    # layout harvesting threshold: below this node count the relayout cost is
    # negligible and the extra AOT lower+compile (a compilation-cache hit
    # after the first step on TPU) isn't worth it
    _HARMONIZE_MIN_NODES = 1 << 20

    @staticmethod
    def _format_key(batch: PointBatch):
        return (batch.pos.shape[0], batch.pos.shape[1])

    def _maybe_harvest_formats(self, cache: dict, batch: PointBatch, lower) -> None:
        """Capture ``compiled.input_formats`` of a jitted step so subsequent
        same-shape batches are placed in the layouts the program expects.
        Runs once per padded shape, BEFORE the first execution: the
        unharmonized first dispatch would allocate per-arg relayout copies
        ON DEVICE on top of the step's temp HBM (an OOM at 8M nodes, round
        4); the explicit compile seeds the persistent compilation cache, so
        the jit dispatch right after compiles from disk. Gated on batch size
        and overridable via GAOT_LAYOUT_HARMONIZE=always|never|auto."""
        key = self._format_key(batch)
        if key in cache:
            return
        if self.num_processes > 1:
            # layout harmonization is a single-device dispatch optimization
            # (per-call relayout of mismatched args through the tunnel);
            # multi-process batches are global arrays assembled from local
            # shards and put_to_formats' per-leaf device_put doesn't apply
            cache[key] = False
            return
        mode = os.environ.get("GAOT_LAYOUT_HARMONIZE", "auto")
        n = key[0] * key[1]
        if mode == "never" or (mode != "always" and n < self._HARMONIZE_MIN_NODES):
            cache[key] = False
            return
        try:
            compiled = lower().compile()
            cache[key] = compiled.input_formats[0][1]
            try:
                ma = compiled.memory_analysis()
                gib = 1024.0 ** 3
                logger.info(
                    "compiled step memory @%s: args %.2f GiB, out %.2f, "
                    "temp %.2f, code %.2f, alias %.2f", key,
                    ma.argument_size_in_bytes / gib,
                    ma.output_size_in_bytes / gib,
                    ma.temp_size_in_bytes / gib,
                    ma.generated_code_size_in_bytes / gib,
                    ma.alias_size_in_bytes / gib)
            except Exception:  # pragma: no cover - backend-optional API
                pass
        except Exception as e:  # pragma: no cover - best-effort optimization
            logger.info("format harvest skipped: %s: %s", type(e).__name__, e)
            cache[key] = False

    def _host_stage_batches(self) -> bool:
        """Whether the train loop should keep batches on HOST until consumed.

        The double-buffered prefetch keeps 2-3 batches device-resident
        (queue maxsize + the in-flight put) on top of the train step's temp
        HBM. At DrivAerML full resolution that OOMs one chip: the 8M-node
        step alone peaks at ~14.5 of 15.75 GB (v5e), each batch is ~0.6 GB,
        and the failure surfaces asynchronously at the epoch-end loss sync
        (observed RESOURCE_EXHAUSTED, round 4). Above the threshold the
        prefetcher only stages host arrays (device placement happens inside
        train_step) and the loop value-syncs every step, so exactly ONE
        batch is device-resident at a time. Host-load/compute overlap is
        preserved — only the placement moves. GAOT_HOST_STAGE=always|never
        overrides; GAOT_HOST_STAGE_NODES tunes the auto threshold."""
        mode = os.environ.get("GAOT_HOST_STAGE", "auto")
        if mode == "always":
            return True
        if mode == "never":
            return False
        per_batch = getattr(self, "_probe_num_nodes", 0) * max(
            1, getattr(self.dataset_config, "batch_size", 1))
        return per_batch >= int(os.environ.get("GAOT_HOST_STAGE_NODES", str(4_000_000)))

    def train_step(self, batch: PointBatch) -> float:
        self.rng, step_rng = jax.random.split(self.rng)
        if self.mesh is not None:
            # mesh path: shard first (make_sharded_train_step derives its
            # in_shardings pytree from a placed example batch)
            batch = self._device_put_batch(batch)
            if self._jit_train_step is None:
                from ..parallel import make_sharded_train_step

                self._jit_train_step = make_sharded_train_step(
                    self._train_step, self.mesh, shard_nodes=self._shard_nodes,
                    example_batch=batch,
                )
        # harvest BEFORE the first placement/execution: the jit dispatch
        # relayouts every arg whose layout mismatches the compiled entry
        # layouts, and those relayout copies are DEVICE allocations made on
        # top of the step's temp HBM — at 8M nodes (step temp ~14.5 of
        # 15.75 GB, v5e) an unharmonized or double-placed first step OOMs the
        # chip (observed, round 4). Lowering works from HOST (numpy) batches,
        # so on the single-chip path the batch goes host->device exactly
        # ONCE, directly in the compiled entry layouts. The explicit
        # lower().compile() lands in the persistent compilation cache, so the
        # jit call right after compiles from disk — same total compile cost.
        if self._format_key(batch) not in self._batch_formats:
            self._maybe_harvest_formats(
                self._batch_formats, batch,
                lambda: self._jit_train_step.lower(self.state, batch, step_rng))
        batch = self._device_put_batch(batch)
        self.state, loss, self._last_grad_norm = self._jit_train_step(
            self.state, batch, step_rng
        )
        return loss

    def eval_step(self, batch: PointBatch):
        """Mesh-aware eval: batches shard over (data[, node]) exactly like
        training, so evaluation at DrivAerML scale does not OOM one device
        (reference: eval runs through the same DDP wrap, stat.py:552-573).
        All callers pass GLOBAL batches (test / validate_on_test / the
        single-process validate); the per-process sharded val loader goes
        through _validate_multiprocess instead."""
        put = self._device_put_eval_batch
        if self._jit_eval_step is None:
            batch = put(batch)
            from ..parallel import make_sharded_eval_step

            self._jit_eval_step = make_sharded_eval_step(
                self._eval_step, self.mesh, shard_nodes=self._shard_nodes,
                example_batch=batch,
                replicate_data=self.num_processes > 1,
                # test() fetches full predictions on every process
                replicate_outputs=self.num_processes > 1,
            )
        # harvest before the first placement/execution (see train_step: the
        # dispatch relayout copies of an unharmonized first call are device
        # allocations; eval temp is smaller but the same hazard applies, and
        # host batches go host->device exactly once, in entry layouts)
        if self._format_key(batch) not in self._eval_batch_formats:
            if self.mesh is not None:
                batch = put(batch)  # shard pre-lower
            self._maybe_harvest_formats(
                self._eval_batch_formats, batch,
                lambda: self._jit_eval_step.lower(self.state.params, batch))
        batch = put(batch)
        return self._jit_eval_step(self.state.params, batch)

    # -- loops -----------------------------------------------------------------
    def optimize(self) -> Dict:
        """Epoch loop with eval cadence + best-state tracking
        (reference: optimizers.py:122-199 / 250-345)."""
        args = self.optimizer_config.args
        best_loss, best_epoch, best_params = np.inf, -1, None
        losses, epochs, val_losses, val_epochs = [], [], [], []
        time_total = 0.0
        validate_on_test = getattr(args, "validate_on_test", False)

        profile_dir = self.setup_config.profile_dir
        # rank-0 tqdm progress bar (reference: optimizers.py:133-134); falls
        # back to plain logging when tqdm is unavailable
        pbar = None
        if self.is_main:
            try:
                from tqdm import tqdm

                pbar = tqdm(total=args.epoch, desc="train")
            except Exception:  # pragma: no cover
                pbar = None
        host_stage = self._host_stage_batches()
        if host_stage and self.is_main:
            logger.info(
                "host-staged prefetch: batches stay on host until consumed; "
                "per-step sync keeps ONE batch device-resident (see "
                "_host_stage_batches)")
        for epoch in range(args.epoch):
            self.train_loader.set_epoch(epoch)
            profiling = bool(profile_dir) and epoch == self.setup_config.profile_epoch
            total_loss = 0.0
            nb = 0
            t0 = time.time()
            loader_stats: Dict = {}
            for batch in prefetch_to_device(iter(self.train_loader),
                                            put_fn=(lambda b: b) if host_stage
                                            else self._device_put_batch,
                                            stats=loader_stats):
                if profiling and nb == 0:
                    jax.profiler.start_trace(profile_dir)
                loss = self.train_step(batch)
                if host_stage:
                    # hard completion barrier BY VALUE FETCH (axon's
                    # block_until_ready returns early on arg-passing
                    # programs — bench.py documents the trap): frees this
                    # batch's device buffers before the next put. np.float32
                    # keeps the epoch-loss accumulation IEEE-f32, bitwise
                    # identical to the on-device scalar chain of the
                    # non-staged path (python-float += would round in f64)
                    loss = np.float32(np.asarray(loss))
                total_loss += loss  # device scalar; block at epoch end only
                nb += 1
                if profiling and nb == self.setup_config.profile_steps:
                    jax.block_until_ready(loss)
                    jax.profiler.stop_trace()
                    profiling = False
                    logger.info("Saved jax.profiler trace to %s", profile_dir)
            if profiling:  # fewer batches than profile_steps
                jax.block_until_ready(total_loss)
                jax.profiler.stop_trace()
            total_loss = float(total_loss)
            time_total += time.time() - t0
            # steady-state loader stall: queue waits past the warm-up batch.
            # ≈0 means host load + device placement keep up with the step
            # rate; anything else is a data-pipeline bottleneck worth a log
            self.last_loader_stall_s = max(
                loader_stats.get("wait_s", 0.0)
                - loader_stats.get("first_wait_s", 0.0), 0.0)
            self.last_loader_first_wait_s = loader_stats.get("first_wait_s", 0.0)
            self.last_loader_stats = dict(loader_stats)
            if self.is_main:
                # stall ≈ 0 proves the loader sustains the device step rate
                # (the 8M precomputed-pipeline record, VERDICT r3 item 8);
                # host_load = disk/mmap + assembly, put = host->device
                logger.info(
                    "epoch %d loader: stall %.3fs (first wait %.3fs), "
                    "host_load %.3fs, put %.3fs, epoch wall %.2fs",
                    epoch, self.last_loader_stall_s,
                    self.last_loader_first_wait_s,
                    loader_stats.get("host_load_s", 0.0),
                    loader_stats.get("put_s", 0.0), time.time() - t0)

            if (epoch + 1) % args.eval_every_eps == 0:
                train_loss = total_loss / max(nb, 1)
                losses.append(train_loss)
                epochs.append(epoch)
                loader = self.test_loader if validate_on_test else self.val_loader
                val_loss = self.validate(loader)
                val_losses.append(val_loss)
                val_epochs.append(epoch)
                logger.info("epoch %d: train %.6f  val %.6f", epoch, train_loss, val_loss)
                # per-eval row: losses + current lr + process RSS (reference
                # parity: optimizers.py:289-302 logs lr and psutil RSS)
                row = {"train/loss": train_loss, "val/loss": val_loss,
                       "lr": self.current_lr(), "memory": _process_rss_gb(),
                       "train/loader_stall_s": self.last_loader_stall_s,
                       "train/loader_host_load_s": self.last_loader_stats.get("host_load_s", 0.0),
                       "train/loader_put_s": self.last_loader_stats.get("put_s", 0.0)}
                if pbar is not None:
                    pbar.set_postfix({"loss": train_loss, "val_loss": val_loss})
                if self.setup_config.wandb_watch_model and self._last_grad_norm is not None:
                    # gradient-norm tracking: the wandb.watch analogue (base.py:187-188)
                    row["train/grad_norm"] = float(self._last_grad_norm)
                self.log_metrics(row, step=epoch + 1)

                current = val_loss if args.early_save_metric == "val" else train_loss
                if current < best_loss:
                    best_loss, best_epoch = current, epoch
                    best_params = jax.tree.map(lambda x: np.asarray(x), self.state.params)
                if (
                    args.save_every_epochs > 0
                    and (epoch + 1) % args.save_every_epochs == 0
                    and self.is_main
                ):
                    try:  # failures must not kill training (optimizers.py:318-323)
                        self.save_checkpoint_artifact(
                            epoch + 1, train_loss, val_loss, is_best=(best_epoch == epoch)
                        )
                        if self.setup_config.test_during_training:
                            self.test()
                    except Exception as e:  # pragma: no cover
                        logger.warning("periodic artifact save failed: %s", e)
            if pbar is not None:
                pbar.update(1)

        if pbar is not None:
            pbar.close()
        if best_params is not None:
            self.state = self.state.replace(params=jax.tree.map(jnp.asarray, best_params))
        return {
            "train": {"loss": losses, "epoch": epochs},
            "valid": {"loss": val_losses, "epoch": val_epochs},
            "best": {"epoch": best_epoch, "loss": float(best_loss)},
            "time": time_total,
            # last-epoch data-pipeline accounting (steady-state stall ≈ 0
            # means the loader keeps up with the device step rate)
            "loader": {
                "stall_s": self.last_loader_stall_s,
                "first_wait_s": self.last_loader_first_wait_s,
                "host_load_s": self.last_loader_stats.get("host_load_s", 0.0),
                "put_s": self.last_loader_stats.get("put_s", 0.0),
            },
        }

    def validate(self, loader) -> float:
        """Sum of batch-mean losses / dataset size, all-reduced over processes
        (parity incl. quirk: stat.py:552-573). Loss accumulates ON DEVICE —
        a single host sync at the end, so the prefetcher keeps the device fed
        (per-batch float() cost one ~27ms tunnel round-trip each)."""
        host_stage = self._host_stage_batches()
        # sharded loaders (val) yield process-LOCAL batches that assemble
        # into one GLOBAL batch per lockstep step; the test loader
        # (validate_on_test) is unsharded, its batches are global values
        local = self.num_processes > 1 and getattr(loader, "num_shards", 1) > 1
        if local:
            return self._validate_multiprocess(loader)
        total = jnp.zeros(())
        for batch in prefetch_to_device(iter(loader),
                                        put_fn=(lambda b: b) if host_stage
                                        else self._device_put_eval_batch):
            _, loss = self.eval_step(batch)
            if host_stage:
                # completion barrier by value fetch (see optimize()): keeps
                # exactly ONE huge eval batch device-resident at a time
                loss = np.float32(np.asarray(loss))
            total = total + loss
        return float(total) / len(loader.dataset)

    def _validate_multiprocess(self, loader) -> float:
        """Multi-process validate over the sharded val loader.

        Each lockstep step assembles one global batch (process-local rows
        concatenated by process block — make_array_from_process_local_data).
        The reference all-reduces per-RANK batch node-means (stat.py:552-573),
        and the global batch-mean is NOT the sum of rank means, so the step
        returns per-sample components and the rank means are reconstructed
        host-side — every process computes the same total, no collective
        needed beyond the SPMD step itself."""
        total = 0.0
        b_local = loader.batch_size
        # host staging (>=4M nodes/batch): the per-batch value sync is
        # load-bearing — it keeps ONE batch device-resident (async dispatch
        # would queue 2-3 ~0.8 GB global eval batches on top of the step
        # temps, the round-4 RESOURCE_EXHAUSTED class). Smaller recipes
        # accumulate on device with a single fetch after the loop.
        sync_per_batch = self._host_stage_batches()
        for batch in prefetch_to_device(iter(loader), put_fn=(lambda b: b)):
            batch = self._device_put_val_batch(batch)
            if self._jit_val_step is None:
                from ..parallel import make_sharded_eval_step

                # lazily built from the first placed batch (same reason as
                # _jit_eval_step: the in_shardings pytree must match the
                # batch structure incl. optional edge slots)
                self._jit_val_step = make_sharded_eval_step(
                    self._val_components_step, self.mesh,
                    shard_nodes=self._shard_nodes, example_batch=batch,
                )
            sq, cnt = self._jit_val_step(self.state.params, batch)
            # rank-mean reconstruction runs in jnp on the replicated outputs
            # (a per-batch np.asarray would pay a tunnel round trip per step)
            sq = sq.reshape(self.num_processes, b_local)
            cnt = cnt.reshape(self.num_processes, b_local)
            rank_sq = sq.sum(axis=1)
            rank_cnt = jnp.maximum(cnt.sum(axis=1), 1)
            term = (rank_sq / rank_cnt).sum()
            total = total + (float(term) if sync_per_batch else term)
        return float(total) / len(loader.dataset)

    def test(self) -> Dict[str, float]:
        """Timed inference + metric suites (reference: stat.py:575-788)."""
        metric_suite = self.dataset_config.metric_suite
        all_targets, all_preds = [], []
        inference_times, data_times = [], []
        total_samples = 0
        plot_coords = plot_gtr = plot_prd = None
        u_mean = self.stats["mean"]
        u_std = self.stats["std"]

        it = iter(self.test_loader)
        while True:
            t0 = time.time()
            try:
                batch_host = next(it)
            except StopIteration:
                break
            batch = self._device_put_eval_batch(batch_host)
            jax.block_until_ready(batch.pos)
            data_times.append(time.time() - t0)

            t1 = time.time()
            pred, _ = self.eval_step(batch)
            # sync by VALUE FETCH, not block_until_ready: on the axon remote
            # backend block_until_ready returns EARLY for programs with
            # explicit args (bench.py documents the measured trap), which
            # would push the real wait into the untimed np.asarray below and
            # report near-zero inference times
            pred_np = np.asarray(pred)
            inference_times.append(time.time() - t1)

            # read targets/mask/pos from the PRE-PLACEMENT host batch: the
            # device batch's node axis is sharded over the mesh, and in
            # multi-process runs those leaves span non-addressable devices
            # (np.asarray would raise). The test loader is unsharded — every
            # process holds the full global batch locally.
            counts = np.asarray(batch_host.num_nodes)
            total_samples += int((counts > 0).sum())
            target_np = np.asarray(batch_host.target)
            # select valid rows by MASK, not by [:n] prefix: shard-aligned
            # sectioning (section_shards > 1) deals padded nodes to the tail
            # of EACH shard's range, so valid rows are per-shard prefixes,
            # not one global prefix. Boolean selection is layout-agnostic
            # (identical to the prefix slice for unsectioned batches), and
            # metrics/plots are row-order invariant (pos is permuted with
            # the values).
            mask_np = np.asarray(batch_host.node_mask)
            for b in range(pred_np.shape[0]):
                n = int(counts[b])
                if n == 0:
                    continue
                m = mask_np[b]
                p_den = pred_np[b][m] * u_std + u_mean
                t_den = target_np[b][m] * u_std + u_mean
                all_preds.append(p_den)
                all_targets.append(t_den)
                if plot_coords is None and self.is_main:
                    plot_coords = np.asarray(batch_host.pos)[b][m]
                    plot_gtr = t_den
                    plot_prd = p_den

        results: Dict[str, float] = {}
        if self.is_main and inference_times:
            total_inf = sum(inference_times)
            total_data = sum(data_times)
            total_time = total_inf + total_data
            report = {
                "total_samples": total_samples,
                "total_inference_time_s": total_inf,
                "avg_inference_time_ms": 1000 * statistics.mean(inference_times),
                "median_inference_time_ms": 1000 * statistics.median(inference_times),
                "min_inference_time_ms": 1000 * min(inference_times),
                "max_inference_time_ms": 1000 * max(inference_times),
                "std_inference_time_ms": 1000
                * (statistics.stdev(inference_times) if len(inference_times) > 1 else 0.0),
                "avg_data_loading_time_ms": 1000 * statistics.mean(data_times),
                "inference_throughput_samples_per_s": total_samples / total_inf,
                "overall_throughput_samples_per_s": total_samples / total_time,
                "data_loading_ratio_pct": 100 * total_data / total_time,
                "inference_ratio_pct": 100 * total_inf / total_time,
            }
            for k, v in report.items():
                logger.info("  %s: %.4f", k, v) if isinstance(v, float) else logger.info(
                    "  %s: %s", k, v
                )
            results.update(report)
            self.datarow["inference time"] = report["avg_inference_time_ms"] / 1000.0

            if metric_suite == "drivaernet":
                gm = self.metadata.global_mean
                gs = self.metadata.global_std
                if self.dataset_config.active_variables is not None:
                    av = self.dataset_config.active_variables
                    gm = [gm[i] for i in av]
                    gs = [gs[i] for i in av]
                agg = compute_drivaernet_metric(all_targets, all_preds, gm, gs)
                logger.info("--- Final Metrics (Drivaernet Suite) ---")
                logger.info("MSE (x10^-2): %.4f", agg["MSE"] * 100)
                logger.info("MAE (x10^-1): %.4f", agg["MAE"] * 10)
                logger.info("RMSE: %.4f  MaxErr: %.4f", agg["RMSE"], agg["Max_Error"])
                logger.info("Rel L2 (%%): %.4f  Rel L1 (%%): %.4f", agg["Rel_L2"] * 100, agg["Rel_L1"] * 100)
                results.update(agg)
                self.datarow["MSE (x10^-2)"] = agg["MSE"] * 100
                self.datarow["MAE (x10^-1)"] = agg["MAE"] * 10
            elif metric_suite == "general":
                full_p = np.concatenate(all_preds, axis=0)
                full_t = np.concatenate(all_targets, axis=0)
                m = compute_general_metrics(full_t, full_p)
                logger.info("--- Final Metrics (General Suite) ---")
                for k, v in m.items():
                    logger.info("  %s: %.6f", k, v)
                results.update(m)
                self.datarow["MSE (x10^-2)"] = m["MSE"] * 100
                self.datarow["MAE (x10^-1)"] = m["MAE"] * 10
            elif metric_suite == "poseidon":
                val = compute_poseidon_metric(
                    all_targets, all_preds, self.metadata.global_mean, self.metadata.global_std
                )
                logger.info("--- Final Metric (Poseidon Suite): %.6f ---", val)
                results["poseidon_rel_l1_median"] = val
                self.datarow["relative error (direct)"] = val

            # npz dump + 3D render of the first sample (stat.py:768-785)
            try:
                if plot_coords is not None:
                    out_base = self.path_config.result_path.rsplit(".", 1)[0]
                    os.makedirs(os.path.dirname(out_base) or ".", exist_ok=True)
                    np.savez(out_base + ".npz", coord=plot_coords, gtr=plot_gtr, prd=plot_prd)
                    from .plotting import plot_3d_comparison

                    plot_3d_comparison(
                        plot_coords, plot_gtr[:, 0], plot_prd[:, 0],
                        save_path=self.path_config.result_path,
                        variable_name=self.metadata.names["u"][0] or "u",
                    )
            except Exception as e:  # pragma: no cover
                logger.warning("3D plotting failed: %s", e)
        return results


TRAINERS = {"static3d": StaticTrainer3D}


def init_trainer(config: RunConfig) -> TrainerBase:
    name = config.setup.trainer_name
    if name not in TRAINERS:
        raise ValueError(f"unknown trainer '{name}', supported: {list(TRAINERS)}")
    return TRAINERS[name](config)
