"""Optimizers and LR schedules.

Matches the shipped recipe [configs/cvvae_sd3_constraint_training.yaml:
84-99]: AdamW(betas=(0.9, 0.98), eps=1e-4, weight_decay=0.01), cosine
schedule with 1000 warm-up steps over 60000 with a 0.005 floor, generator
lr = 2x base.  The schedule registry mirrors lvdm/lr_scheduler.py:239-291.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    base_lr: float = 2.0e-5
    lr_g_factor: float = 2.0
    betas: tuple = (0.9, 0.98)
    eps: float = 1.0e-4
    weight_decay: float = 0.01
    grad_clip: float = 1.0                  # Lightning clip_gradients(1.0, norm)
    scheduler: str = "cosine"
    num_warmup_steps: int = 1000
    num_training_steps: int = 60000
    min_lr_ratio: float = 0.005


def cosine_schedule_with_warmup(base_lr: float, num_warmup_steps: int,
                                num_training_steps: int,
                                num_cycles: float = 0.5,
                                min_lr_ratio: float = 0.0) -> Callable:
    """lvdm/lr_scheduler.py:161-224 — linear warm-up then cosine decay to
    base_lr * min_lr_ratio."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, num_warmup_steps)
        progress = (step - num_warmup_steps) / jnp.maximum(
            1.0, num_training_steps - num_warmup_steps)
        cos = 0.5 * ((1.0 + min_lr_ratio) + (1.0 - min_lr_ratio)
                     * jnp.cos(math.pi * num_cycles * 2.0 * progress))
        factor = jnp.where(step < num_warmup_steps, warm,
                           jnp.maximum(0.0, cos))
        return base_lr * factor

    return schedule


def linear_schedule_with_warmup(base_lr: float, num_warmup_steps: int,
                                num_training_steps: int) -> Callable:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, num_warmup_steps)
        lin = jnp.maximum(0.0, (num_training_steps - step) / jnp.maximum(
            1.0, num_training_steps - num_warmup_steps))
        return base_lr * jnp.where(step < num_warmup_steps, warm, lin)

    return schedule


def polynomial_schedule_with_warmup(base_lr: float, num_warmup_steps: int,
                                    num_training_steps: int,
                                    lr_end: float = 1e-7,
                                    power: float = 1.0) -> Callable:
    """HF get_polynomial_decay_schedule_with_warmup (registered by
    lvdm/lr_scheduler.py:231): linear warm-up, then
    (lr0 - lr_end) * (1 - progress)^power + lr_end, then lr_end."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / jnp.maximum(1.0, num_warmup_steps)
        remaining = 1.0 - (step - num_warmup_steps) / jnp.maximum(
            1.0, num_training_steps - num_warmup_steps)
        decay = (base_lr - lr_end) * remaining ** power + lr_end
        return jnp.where(step < num_warmup_steps, warm,
                         jnp.where(step > num_training_steps, lr_end, decay))

    return schedule


def constant_schedule(base_lr: float, num_warmup_steps: int = 0) -> Callable:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if num_warmup_steps:
            return base_lr * jnp.minimum(1.0, step / num_warmup_steps)
        return jnp.asarray(base_lr, jnp.float32)

    return schedule


def get_schedule(name: str, base_lr: float, *, num_warmup_steps: int = 0,
                 num_training_steps: Optional[int] = None,
                 min_lr_ratio: float = 0.0) -> Callable:
    """Unified registry (lvdm/lr_scheduler.py:239-291)."""
    if name == "constant":
        return constant_schedule(base_lr)
    if name == "constant_with_warmup":
        return constant_schedule(base_lr, num_warmup_steps)
    if name == "cosine":
        return cosine_schedule_with_warmup(
            base_lr, num_warmup_steps, num_training_steps,
            min_lr_ratio=min_lr_ratio)
    if name == "linear":
        return linear_schedule_with_warmup(
            base_lr, num_warmup_steps, num_training_steps)
    if name == "polynomial":
        return polynomial_schedule_with_warmup(
            base_lr, num_warmup_steps, num_training_steps)
    raise ValueError(f"unknown scheduler {name!r}")


def make_schedule(cfg: OptimConfig, lr_factor: float = 1.0) -> Callable:
    """The LR schedule as a function of the GLOBAL training step."""
    return get_schedule(
        cfg.scheduler, cfg.base_lr * lr_factor,
        num_warmup_steps=cfg.num_warmup_steps,
        num_training_steps=cfg.num_training_steps,
        min_lr_ratio=cfg.min_lr_ratio)


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    """AdamW whose learning rate is injected per step via
    ``set_learning_rate``.  The reference steps BOTH schedulers every
    batch (lvdm/models/autoencoder.py:376-378), making LR a function of
    the *global* step; baking an optax schedule into adamw would advance
    it with the per-optimizer update count instead, which runs at half
    rate under G/D alternation (warm-up would take 2x the configured
    steps and the cosine horizon would stretch 2x)."""
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=0.0, b1=cfg.betas[0], b2=cfg.betas[1],
            eps=cfg.eps, weight_decay=cfg.weight_decay),
    )


def set_learning_rate(opt_state, lr):
    """Return a make_optimizer() state with the injected AdamW learning
    rate replaced (jit-safe: rebuilds the state tuple, no mutation)."""
    clip_state, adamw_state = opt_state
    hp = dict(adamw_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return (clip_state, adamw_state._replace(hyperparams=hp))


def applied_learning_rate(opt_state) -> jnp.ndarray:
    """The LR currently baked into a make_optimizer() state (what the
    next .update() call will apply) — lets the trainer log the applied
    LR rather than re-deriving it."""
    return opt_state[1].hyperparams["learning_rate"]
