"""Learning-rate schedules + optimizer config.

Parity with the reference scheduler zoo (src/trainer/optimizers.py:15-67):
'step', 'cos', 'exp', and the 3-phase 'mix' = linear warmup (initial_lr ->
max_lr over 2% of epochs) -> cosine (max_lr -> min_lr) -> exponential tail
(min_lr -> final_lr). The reference steps the schedule ONCE PER EPOCH
(optimizers.py:153-154, 279-280); we evaluate it per step from epoch index =
step // steps_per_epoch, which reproduces the exact same piecewise-constant
schedule. NOTE the Adam wrapper uses 96% cosine epochs and the AdamW wrapper
uses 90% (optimizers.py:99-101 vs 227-229) — replicated via `cosine_frac`.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp
import numpy as np
import optax


@dataclass
class OptimizerargsConfig:
    """(reference: optimizers.py:15-35)"""

    lr: float = 1e-3
    weight_decay: float = 1e-3
    epoch: int = 100
    # Multiplies the training loss before differentiation (reported losses
    # stay unscaled). NOTE: the reference declares-and-stores this field but
    # never applies it (optimizers.py:20,85) — we implement the documented
    # meaning; at the default 1.0 the two behaviors coincide.
    loss_scale: float = 1.0
    eval_every_eps: int = 2
    scheduler: str = "mix"  # ['step','cos','exp','mix','none']
    early_save_metric: str = "val"  # ['train','val']
    max_lr: float = 1e-2
    min_lr: float = 1e-5
    final_lr: float = 1e-5
    scheduler_step_size: int = 100
    scheduler_gamma: float = 0.8
    scheduler_T_max: int = 100
    scheduler_eta_min: float = 1e-4
    save_every_epochs: int = 0
    # reference-parity quirk knob: the reference AdamW loop validates on the
    # TEST loader ("# TODO: change to val_loader", optimizers.py:288). We
    # default to the val loader; set True to reproduce the reference exactly.
    validate_on_test: bool = False


def mix_phase_lengths(total_epochs: int, cosine_frac: float) -> tuple:
    """Warmup/cosine/exp split with the reference's zero-guards
    (optimizers.py:98-107)."""
    warmup = int(0.02 * total_epochs)
    cosine = int(cosine_frac * total_epochs)
    exp_decay = total_epochs - warmup - cosine
    if warmup == 0:
        warmup = 1
        cosine -= 1
    if exp_decay == 0:
        exp_decay = 1
        cosine -= 1
    return warmup, cosine, exp_decay


def mix_lr_at_epoch(
    epoch, total_epochs: int, initial_lr: float, max_lr: float, min_lr: float,
    final_lr: float, cosine_frac: float = 0.90,
):
    """LR at an epoch index under the 'mix' schedule (optimizers.py:53-67)."""
    warmup, cosine, exp_decay = mix_phase_lengths(total_epochs, cosine_frac)
    e = jnp.asarray(epoch, jnp.float32)
    lr_warm = initial_lr + (max_lr - initial_lr) * (e / max(1, warmup - 1))
    ce = e - warmup
    cosine_ratio = (1 + jnp.cos(jnp.pi * ce / cosine)) / 2
    lr_cos = min_lr + (max_lr - min_lr) * cosine_ratio
    xe = e - warmup - cosine
    decay_steps = max(1, exp_decay - 1)
    lr_exp = min_lr * ((final_lr / min_lr) ** (xe / decay_steps))
    return jnp.where(e < warmup, lr_warm, jnp.where(e < warmup + cosine, lr_cos, lr_exp))


def make_lr_schedule(
    config: OptimizerargsConfig, steps_per_epoch: int, cosine_frac: float = 0.90
) -> Callable:
    """Per-step schedule that is piecewise-constant per epoch (parity with the
    reference's epoch-granularity scheduler.step())."""
    spe = max(1, steps_per_epoch)

    def schedule(step):
        epoch = jnp.asarray(step, jnp.int32) // spe
        if config.scheduler == "mix":
            return mix_lr_at_epoch(
                epoch, config.epoch, config.lr, config.max_lr, config.min_lr,
                config.final_lr, cosine_frac,
            )
        if config.scheduler == "step":
            n = epoch // config.scheduler_step_size
            return config.lr * (config.scheduler_gamma ** n.astype(jnp.float32))
        if config.scheduler == "cos":
            ratio = (1 + jnp.cos(jnp.pi * epoch / config.scheduler_T_max)) / 2
            return config.scheduler_eta_min + (config.lr - config.scheduler_eta_min) * ratio
        if config.scheduler == "exp":
            return config.lr * (config.scheduler_gamma ** epoch.astype(jnp.float32))
        return jnp.asarray(config.lr, jnp.float32)

    return schedule


def make_optimizer(
    name: str, config: OptimizerargsConfig, steps_per_epoch: int
) -> optax.GradientTransformation:
    """Adam/AdamW with the reference's cosine_frac asymmetry (96% vs 90%)."""
    name = name.lower()
    cosine_frac = 0.96 if name == "adam" else 0.90
    schedule = make_lr_schedule(config, steps_per_epoch, cosine_frac)
    if name == "adam":
        return optax.inject_hyperparams(optax.adam)(learning_rate=schedule)
    if name == "adamw":
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=schedule, weight_decay=config.weight_decay
        )
    raise ValueError(f"unsupported optimizer: {name} (supported: adam, adamw)")
