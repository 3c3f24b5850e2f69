"""Reconstruction / NLL / constraint losses for VAE-GAN training.

Functional re-design of GeneralLPIPSWithDiscriminator and its
LatentConstraint variant
[lvdm/modules/autoencoding/losses/discriminator_loss.py:18-584]:

* per-frame L1 (or L2) + weighted per-frame LPIPS      [:239-256]
* learned-logvar NLL: sum(rec/exp(logvar) + logvar) / (B*T)  [:324-336]
* 2D-constraint branch: target frames chosen by target_type in
  {random, slice, mean} with its own logvar_2d        [:405-435,563-584]
* KL regularisation folded in via regularization_weights     [:287-289]

All math in fp32 (bf16 activations are upcast at the loss boundary).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cvvae_tpu.models.lpips import lpips_distance


@dataclasses.dataclass(frozen=True)
class LossConfig:
    disc_start: int = 1
    logvar_init: float = 0.0
    disc_factor: float = 1.0
    disc_weight: float = 0.5
    perceptual_weight: float = 0.5
    rec_loss: str = "l1"                 # "l1" | "l2"
    learn_logvar: bool = True
    kl_weight: float = 1.0               # regularization_weights["kl_loss"]
    adaptive_disc_weight: bool = True
    disc_loss: str = "hinge"             # "hinge" | "vanilla"
    # latent-constraint branch (LPIPSWithDiscriminatorAndDomainConstraint)
    rec2d_weight: float = 1.0
    target_type: str = "random"          # "random" | "slice" | "mean"
    time_n_compress: int = 4


def elementwise_rec_loss(x: jax.Array, y: jax.Array, kind: str) -> jax.Array:
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    if kind == "l1":
        return jnp.abs(x - y)
    if kind == "l2":
        return jnp.square(x - y)
    raise ValueError(kind)


def perceptual_per_frame(lpips_params: dict, x: jax.Array,
                         y: jax.Array) -> jax.Array:
    """LPIPS on video: fold T into batch -> (B*T, 1, 1, 1)
    [discriminator_loss.py:239-256]."""
    b, t = x.shape[0], x.shape[1]
    xf = x.reshape((b * t,) + x.shape[2:])
    yf = y.reshape((b * t,) + y.shape[2:])
    return lpips_distance(lpips_params, xf, yf)


def nll_from_rec(rec: jax.Array, logvar: jax.Array) -> jax.Array:
    """sum(rec / exp(logvar) + logvar) / (B*T) for (B*T, H, W, C) rec
    [discriminator_loss.py:324-336]."""
    nll = rec / jnp.exp(logvar) + logvar
    return jnp.sum(nll) / nll.shape[0]


def rec_with_perceptual(cfg: LossConfig, lpips_params: Optional[dict],
                        x: jax.Array, xrec: jax.Array) -> jax.Array:
    """Per-frame rec loss map (B*T, H, W, C): pointwise + LPIPS broadcast."""
    b, t = x.shape[0], x.shape[1]
    rec = elementwise_rec_loss(x, xrec, cfg.rec_loss)
    rec = rec.reshape((b * t,) + rec.shape[2:])
    if cfg.perceptual_weight > 0 and lpips_params is not None:
        p = perceptual_per_frame(lpips_params, x, xrec).astype(jnp.float32)
        rec = rec + cfg.perceptual_weight * p
    return rec


def constraint_targets(cfg: LossConfig, x: jax.Array,
                       rng: Optional[jax.Array]) -> jax.Array:
    """Pick the 2D target frames for the latent-constraint branch.

    x: (B, T, H, W, C) with T = n*d + 1 -> (B, d+1, H, W, C).
    Ref: discriminator_loss.py:412-435.
    """
    n = cfg.time_n_compress
    t = x.shape[1]
    d = (t - 1) // n
    if cfg.target_type == "slice":
        return x[:, ::n]
    if cfg.target_type == "mean":
        rest = x[:, 1:].reshape(x.shape[0], d, n, *x.shape[2:]).mean(axis=2)
        return jnp.concatenate([x[:, :1], rest], axis=1)
    if cfg.target_type == "random":
        assert rng is not None, "target_type=random needs an rng"
        offs = jax.random.randint(rng, (d,), 1, n + 1)
        idx = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), offs + jnp.arange(d) * n])
        return jnp.take(x, idx, axis=1)
    raise ValueError(cfg.target_type)


def nll_with_constraint(cfg: LossConfig, rec: jax.Array, rec2d: jax.Array,
                        logvar: jax.Array, logvar_2d: jax.Array
                        ) -> Tuple[jax.Array, jax.Array]:
    """(nll_loss, rec2d_nll) — nll_loss already includes the weighted 2D
    term [discriminator_loss.py:563-584]."""
    nll = nll_from_rec(rec, logvar)
    nll2d = nll_from_rec(rec2d, logvar_2d)
    return nll + cfg.rec2d_weight * nll2d, nll2d


def adaptive_disc_weight(cfg: LossConfig, nll_grad_norm: jax.Array,
                         g_grad_norm: jax.Array) -> jax.Array:
    """d_weight = ||grad nll|| / (||grad g|| + 1e-4), clipped to [0, 1e4],
    scaled by disc_weight [discriminator_loss.py:211-220]."""
    w = nll_grad_norm / (g_grad_norm + 1e-4)
    w = jnp.clip(w, 0.0, 1e4)
    return jax.lax.stop_gradient(w) * cfg.disc_weight


def global_norm(tree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                        for l in leaves))
