"""Optimizers and LR schedules (optax), mirroring reference factories
`src/utils/utils.py:51-106`: adam; step / cosine-with-warmup / plateau
("impatient", ReduceLROnPlateau) schedulers.

Plateau scheduling is metric-driven, which does not fit a static optax
schedule; we implement it as an injected scale updated by the trainer
(`plateau_update`), keeping the optimizer update jittable.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax.numpy as jnp
import optax


def make_lr_schedule(
    name: Optional[str],
    base_lr: float,
    *,
    steps_per_epoch: int = 1,
    num_epochs: int = 1,
    gamma: float = 0.5,
    step_size: int = 500,
    num_warmup_epochs: int = 5,
    eta_min_ratio: float = 0.01,
):
    """Epoch-granular schedules keyed by reference lr_scheduler_name.

    * "step": lr * gamma^(epoch // step_size) (torch StepLR).
    * "cosine": linear warmup then cosine to eta_min (reference
      get_cosine_schedule_with_warmup, utils.py:75-106).
    * None / "none" / "impatient": constant (plateau handled separately).
    """
    if name in (None, "none", "impatient"):
        return lambda step: base_lr

    if name == "step":
        def sched(step):
            epoch = step // steps_per_epoch
            return base_lr * (gamma ** (epoch // step_size))

        return sched

    if name == "cosine":
        warm = num_warmup_epochs * steps_per_epoch
        total = num_epochs * steps_per_epoch
        eta_min = base_lr * eta_min_ratio

        def sched(step):
            step = jnp.asarray(step)
            warm_lr = base_lr * jnp.maximum(step, 1) / max(warm, 1)
            prog = jnp.clip((step - warm) / max(total - warm, 1), 0.0, 1.0)
            cos_lr = eta_min + 0.5 * (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * prog))
            return jnp.where(step < warm, warm_lr, cos_lr)

        return sched

    raise NotImplementedError(name)


def make_optimizer(
    name: str = "adam",
    lr: float = 1e-3,
    *,
    schedule=None,
    weight_decay: float = 0.0,
    plateau: bool = False,
    clip_norm: float = 0.0,
) -> optax.GradientTransformation:
    """Build the optax chain. When `plateau=True`, an
    `optax.contrib.reduce_on_plateau`-style scale is applied via
    `inject_hyperparams` so the trainer can set `opt_state.hyperparams`.
    `clip_norm > 0` prepends global-norm gradient clipping (no reference
    counterpart — a stabilizer for the lr=1e-2 tracking recipe whose loss
    landscape turned out to have a collapse attractor at 60k; see
    ROADMAP round-3 divergence investigation)."""
    sched = schedule if schedule is not None else lr
    pre = (optax.clip_by_global_norm(clip_norm),) if clip_norm else ()
    if name == "adam":
        return optax.inject_hyperparams(
            lambda learning_rate, plateau_scale: optax.chain(
                *pre,
                optax.scale_by_adam(),
                optax.scale_by_learning_rate(learning_rate),
                optax.scale(plateau_scale),
            )
        )(learning_rate=sched, plateau_scale=1.0)
    if name == "adamw":
        return optax.inject_hyperparams(
            lambda learning_rate, plateau_scale: optax.chain(
                *pre,
                optax.scale_by_adam(),
                optax.add_decayed_weights(weight_decay),
                optax.scale_by_learning_rate(learning_rate),
                optax.scale(plateau_scale),
            )
        )(learning_rate=sched, plateau_scale=1.0)
    raise NotImplementedError(name)


@dataclasses.dataclass
class PlateauState:
    """Host-side ReduceLROnPlateau tracker (reference "impatient" scheduler,
    pileup_trans_hept.yaml:33-37: factor 0.5, patience 20 on loss)."""

    factor: float = 0.5
    patience: int = 20
    mode: str = "min"
    best: float = math.nan
    bad_epochs: int = 0
    scale: float = 1.0

    def __post_init__(self):
        if math.isnan(self.best):
            self.best = math.inf if self.mode == "min" else -math.inf

    def update(self, metric: float) -> float:
        improved = metric < self.best if self.mode == "min" else metric > self.best
        if improved:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale *= self.factor
                self.bad_epochs = 0
        return self.scale


def apply_plateau_scale(opt_state, scale: float):
    """Write the plateau scale into an inject_hyperparams state."""
    opt_state.hyperparams["plateau_scale"] = jnp.asarray(scale, jnp.float32)
    return opt_state
