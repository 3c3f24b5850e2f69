"""VAE-GAN training engine.

Functional re-design of the reference Lightning engines
[lvdm/models/autoencoder.py:138-543 (AutoencodingEngine),
:1002-1219 (AutoencodingEngineWithLatentConstraint)]:

* per-batch G/D alternation (optimizer_idx = step % 2, :361)
* sampled posterior + KL regularisation (regularizers/__init__.py:13-31)
* GAN with hinge loss and the *adaptive discriminator weight*
  ||grad_W nll|| / ||grad_W g|| at the decoder's last conv kernel
  (discriminator_loss.py:211-220).  In JAX we split the decoder into
  trunk+head and differentiate the two scalars w.r.t. the head kernel
  only — exactly the same quantity torch's autograd.grad produces,
  without a second full decoder backward.
* frozen 2D constraint decoder on the latents (autoencoder.py:1050-1065)
  and/or frozen 2D constraint encoder on sliced frames (:1279-1289)
* learned logvars, grad-clip 1.0, AdamW + cosine warm-up, G-lr x2
* optional parameter EMA (lvdm/modules/ema.py)

The whole step is one jitted function (lax.cond over G/D) so it pjit's
cleanly over a device mesh; gradients are averaged across the data axis
by the mesh partitioner.
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from cvvae_tpu.losses.gan import hinge_d_loss, vanilla_d_loss
from cvvae_tpu.losses.vae_loss import (
    LossConfig, adaptive_disc_weight, constraint_targets,
    elementwise_rec_loss, global_norm, nll_from_rec, rec_with_perceptual)
from cvvae_tpu.models import vae2d, vae_sd3, vae_v1
from cvvae_tpu.models.discriminator import (
    Disc3DConfig, apply_disc3d, init_disc3d)
from cvvae_tpu.models.lpips import init_lpips
from cvvae_tpu.models.vae2d import VAE2DConfig
from cvvae_tpu.ops.distributions import DiagonalGaussian
from cvvae_tpu.training.ema import EMAState, ema_init, ema_update
from cvvae_tpu.training.optim import (OptimConfig, make_optimizer,
                                      make_schedule, set_learning_rate)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    family: str = "sd3"                       # "v1" | "sd3"
    net: Any = None                           # VAE1Config | VAESD3Config
    disc: Disc3DConfig = Disc3DConfig()
    loss: LossConfig = LossConfig()
    optim: OptimConfig = OptimConfig()
    #: "none" | "latent" | "encoder" | "all"
    #: (AutoencodingEngine / ...WithLatentConstraint / ...WithEncoderConstraint
    #:  / ...WithAllConstraint, lvdm/models/autoencoder.py)
    constraint: str = "latent"
    constraint_decoder: Optional[VAE2DConfig] = None
    constraint_encoder: Optional[VAE2DConfig] = None
    ema_decay: Optional[float] = None
    remat: bool = True
    #: "float32" (reference parity: the reference trains fp32, yaml:177)
    #: or "bfloat16" — TPU-native mixed precision: params/optimizer/EMA
    #: stay fp32, net+disc compute runs bf16 (GroupNorm statistics,
    #: softmax and every loss reduction are fp32 inside the ops/losses
    #: already), roughly halving training HBM and using the MXU's bf16
    #: rate.  The shipped-scale recipe (bs 8x320px images) only fits a
    #: 16 GB v5e chip in this mode.
    compute_dtype: str = "float32"
    #: donate the input TrainState to the jitted step: params/optimizer
    #: buffers update in place instead of double-residing in HBM.  Off
    #: by default because a donated state must not be read after the
    #: call (tests inspect it); train.py turns it on for real runs.
    donate_state: bool = False
    #: freeze modes (reference `trainable`, autoencoder.py:223-234)
    frozen_modules: Tuple[str, ...] = ()

    def __post_init__(self):
        if self.net is None:
            net = (vae_v1.VAE1Config() if self.family == "v1"
                   else vae_sd3.VAESD3Config())
            object.__setattr__(self, "net", net)
        if self.constraint in ("latent", "all") and self.constraint_decoder is None:
            object.__setattr__(self, "constraint_decoder", VAE2DConfig(
                naming="sd3" if self.family == "sd3" else "sd21",
                latent_channels=self.latent_channels))
        if self.constraint in ("encoder", "all") and self.constraint_encoder is None:
            object.__setattr__(self, "constraint_encoder", VAE2DConfig(
                naming="sd3" if self.family == "sd3" else "sd21",
                latent_channels=self.latent_channels))

    @property
    def latent_channels(self) -> int:
        return (self.net.z_channels if self.family == "v1"
                else self.net.latent_channels)

    @property
    def nets(self):
        return vae_v1 if self.family == "v1" else vae_sd3


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Dict          # encoder, decoder, (logvar, logvar_2d)
    disc_params: Dict
    opt_g: Any
    opt_d: Any
    ema: Optional[EMAState]


class TrainingEngine:
    """Holds configs + frozen params; exposes pure jitted steps."""

    def __init__(self, cfg: EngineConfig, *, lpips_params: Optional[dict] = None,
                 constraint_decoder_params: Optional[dict] = None,
                 constraint_encoder_params: Optional[dict] = None,
                 allow_random_lpips: bool = False,
                 seed: int = 0):
        self.cfg = cfg
        key = jax.random.PRNGKey(seed)
        k_lp, k_cd, k_ce = jax.random.split(key, 3)
        if lpips_params is None and cfg.loss.perceptual_weight > 0:
            # The reference downloads + md5-checks pretrained LPIPS
            # weights (lpips/util.py:16-43) — it never optimises against
            # an uncalibrated metric.  Refuse to silently do so here.
            if not allow_random_lpips:
                raise ValueError(
                    "perceptual_weight > 0 but no pretrained LPIPS params "
                    "were given: training would optimise a random-init VGG "
                    "metric. Pass lpips_params=load_lpips_params(...) or "
                    "explicitly opt in with allow_random_lpips=True "
                    "(smoke tests only).")
            warnings.warn(
                "LPIPS is RANDOM-INIT (allow_random_lpips=True): the "
                "perceptual term is uncalibrated — smoke-test use only.",
                stacklevel=2)
            lpips_params = init_lpips(k_lp)
        self.frozen = {"lpips": lpips_params}
        if cfg.constraint in ("latent", "all"):
            self.frozen["constraint_decoder"] = (
                constraint_decoder_params
                or vae2d.init_decoder2d(k_cd, cfg.constraint_decoder))
        if cfg.constraint in ("encoder", "all"):
            self.frozen["constraint_encoder"] = (
                constraint_encoder_params
                or vae2d.init_encoder2d(k_ce, cfg.constraint_encoder))
        if cfg.compute_dtype != "float32":
            # frozen nets are inference-only: store them directly in the
            # compute dtype (halves their HBM residency)
            self.frozen = self._cast_compute(self.frozen)
        # Both schedules advance with the GLOBAL step (the reference
        # steps both schedulers every batch, autoencoder.py:376-378);
        # the LR is injected into the optimizer state each step.
        self.opt_g = make_optimizer(cfg.optim)
        self.opt_d = make_optimizer(cfg.optim)
        self.lr_schedule_g = make_schedule(cfg.optim, cfg.optim.lr_g_factor)
        self.lr_schedule_d = make_schedule(cfg.optim, 1.0)
        self._jitted_step = jax.jit(
            self._train_step,
            donate_argnums=(0,) if cfg.donate_state else ())

    def _cast_compute(self, tree):
        """Cast float non-scalar leaves to the compute dtype (identity
        in fp32 mode).  0-d leaves (learned logvars, quant scales) stay
        fp32 — they feed fp32 loss math directly."""
        cdtype = jnp.dtype(self.cfg.compute_dtype)
        if cdtype == jnp.float32:
            return tree

        def cast(a):
            if (hasattr(a, "dtype") and a.dtype == jnp.float32
                    and getattr(a, "ndim", 0) > 0):
                return a.astype(cdtype)
            return a

        return jax.tree.map(cast, tree)

    # ------------------------------------------------------------------
    # state
    # ------------------------------------------------------------------

    def init_state(self, key: jax.Array,
                   params: Optional[dict] = None) -> TrainState:
        cfg = self.cfg
        k_e, k_d, k_disc = jax.random.split(key, 3)
        if params is None:
            params = {"encoder": cfg.nets.init_encoder(k_e, cfg.net),
                      "decoder": cfg.nets.init_decoder(k_d, cfg.net)}
        else:
            params = dict(params)
        if cfg.loss.learn_logvar:
            params.setdefault("logvar",
                              jnp.asarray(cfg.loss.logvar_init, jnp.float32))
            if cfg.constraint in ("latent", "all"):
                params.setdefault(
                    "logvar_2d", jnp.asarray(cfg.loss.logvar_init, jnp.float32))
        disc_params = init_disc3d(k_disc, cfg.disc)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            disc_params=disc_params,
            opt_g=self.opt_g.init(params),
            opt_d=self.opt_d.init(disc_params),
            ema=ema_init(params) if cfg.ema_decay is not None else None,
        )

    # ------------------------------------------------------------------
    # forward pieces
    # ------------------------------------------------------------------

    def _logvar(self, params, name):
        if self.cfg.loss.learn_logvar:
            return params[name]
        return jnp.asarray(self.cfg.loss.logvar_init, jnp.float32)

    def _forward(self, params, x, rng):
        """Encode -> sample -> decode (trunk + head).

        With an encoder constraint, the frozen 2D encoder's moments for
        the time-sliced frames are concatenated on the *batch* axis and
        decoded by the same 3D decoder against the duplicated inputs
        (autoencoder.py:1281-1289, 1518-1528; loss doubles inputs at
        discriminator_loss.py:645).  Returns (posterior, z, h, xrec,
        x_target) where x_target is the doubled input when applicable.
        """
        cfg = self.cfg
        params = self._cast_compute(params)
        x = x.astype(jnp.dtype(cfg.compute_dtype))
        moments = cfg.nets.apply_encoder(params["encoder"], x, cfg.net,
                                         remat=cfg.remat)
        x_target = x
        if cfg.constraint in ("encoder", "all"):
            x_d = x[:, ::cfg.loss.time_n_compress]
            moments_2d = vae2d.apply_encoder2d(
                self.frozen["constraint_encoder"], x_d, cfg.constraint_encoder)
            moments = jnp.concatenate(
                [moments, jax.lax.stop_gradient(moments_2d)], axis=0)
            x_target = jnp.concatenate([x, x], axis=0)
        posterior = DiagonalGaussian.from_moments(moments)
        z = posterior.sample(rng)
        h = cfg.nets.apply_decoder(params["decoder"], z, cfg.net,
                                   remat=cfg.remat, features_only=True)
        xrec = cfg.nets.apply_decoder_head(
            params["decoder"]["conv_out"], h, cfg.net)
        return posterior, z, h, xrec, x_target

    # ------------------------------------------------------------------
    # losses
    # ------------------------------------------------------------------

    def _gate(self, step):
        """Discriminator warm-up gate (discriminator_loss.py:268,310)."""
        return (step >= self.cfg.loss.disc_start).astype(jnp.float32)

    def _g_loss(self, params, disc_params, batch, rng, step, *,
                with_aux: bool = False):
        cfg, loss_cfg = self.cfg, self.cfg.loss
        x = batch["frames"]
        rng_s, rng_t = jax.random.split(rng)
        posterior, z, h, xrec, x_target = self._forward(params, x, rng_s)
        # KL reduces over millions of elements: fp32 regardless of the
        # compute dtype
        post32 = DiagonalGaussian(posterior.mean.astype(jnp.float32),
                                  posterior.logvar.astype(jnp.float32))
        kl_loss = jnp.mean(post32.kl())

        logvar = self._logvar(params, "logvar")
        rec = rec_with_perceptual(loss_cfg, self.frozen["lpips"], x_target, xrec)
        nll = nll_from_rec(rec, logvar)
        log = {"loss/rec": jnp.mean(rec), "scalars/logvar": logvar,
               "kl_loss": kl_loss}

        if cfg.constraint in ("latent", "all"):
            logvar_2d = self._logvar(params, "logvar_2d")
            # "all": only the first half of z (the 3D encoder's) feeds the
            # 2D constraint decoder (autoencoder.py:1529)
            z_3d = z[:x.shape[0]] if cfg.constraint == "all" else z
            xrec_2d = vae2d.apply_decoder2d(
                self.frozen["constraint_decoder"], z_3d, cfg.constraint_decoder)
            targets_2d = constraint_targets(loss_cfg, x, rng_t)
            rec2d = elementwise_rec_loss(targets_2d, xrec_2d, loss_cfg.rec_loss)
            rec2d = rec2d.reshape((-1,) + rec2d.shape[2:])
            nll2d = nll_from_rec(rec2d, logvar_2d)
            nll = nll + loss_cfg.rec2d_weight * nll2d
            log["loss/rec2d"] = jnp.mean(rec2d)
            log["scalars/logvar_2d"] = logvar_2d

        # GAN term + adaptive weight via the decoder head kernel
        gate = self._gate(step)
        logits_fake = apply_disc3d(disc_params, xrec, cfg.disc)
        g_loss = -jnp.mean(logits_fake)

        if loss_cfg.adaptive_disc_weight:
            hd = jax.lax.stop_gradient(h)
            x_sg = jax.lax.stop_gradient(x_target)
            lv_sg = jax.lax.stop_gradient(logvar)
            head = lambda w: cfg.nets.apply_decoder_head(
                {**params["decoder"]["conv_out"], "kernel": w}, hd, cfg.net)

            def nll_of_w(w):
                r = rec_with_perceptual(loss_cfg, self.frozen["lpips"],
                                        x_sg, head(w))
                return nll_from_rec(r, lv_sg)

            def g_of_w(w):
                return -jnp.mean(apply_disc3d(disc_params, head(w), cfg.disc))

            w0 = jax.lax.stop_gradient(params["decoder"]["conv_out"]["kernel"])
            d_weight = adaptive_disc_weight(
                loss_cfg,
                global_norm(jax.grad(nll_of_w)(w0)),
                global_norm(jax.grad(g_of_w)(w0)))
        else:
            d_weight = jnp.asarray(loss_cfg.disc_weight, jnp.float32)
        d_weight = d_weight * gate

        total = (nll + d_weight * loss_cfg.disc_factor * g_loss * gate
                 + loss_cfg.kl_weight * kl_loss)
        log.update({"loss/total": total, "loss/nll": nll,
                    "loss/g": g_loss * gate, "scalars/d_weight": d_weight})
        if with_aux:
            log["_aux"] = {"xrec": xrec, "x_target": x_target,
                           "logits_fake": logits_fake}
        return total, log

    def _d_loss(self, disc_params, params, batch, rng, step):
        cfg, loss_cfg = self.cfg, self.cfg.loss
        x = batch["frames"]
        _, _, _, xrec, x_target = self._forward(params, x, rng)
        xrec = jax.lax.stop_gradient(xrec)
        logits_real = apply_disc3d(disc_params, x_target, cfg.disc)
        logits_fake = apply_disc3d(disc_params, xrec, cfg.disc)
        fn = hinge_d_loss if loss_cfg.disc_loss == "hinge" else vanilla_d_loss
        d = loss_cfg.disc_factor * fn(logits_real, logits_fake) * self._gate(step)
        log = {"loss/disc": d, "logits/real": jnp.mean(logits_real),
               "logits/fake": jnp.mean(logits_fake)}
        return d, log

    def _val_metrics(self, params, disc_params, batch, rng, step):
        """Full validation log dict: the complete G-loss dict (the same
        loss/*, scalars/* keys as training — the reference's
        _validation_step runs the loss with optimizer_idx=0 then 1,
        autoencoder.py:387-443), the D metrics, and PSNR/SSIM
        (utils/metrics.py; reported in the paper).

        No parameters are updated; callers pass raw or EMA params."""
        from cvvae_tpu.utils.metrics import psnr, ssim

        total, log = self._g_loss(params, disc_params, batch, rng, step,
                                  with_aux=True)
        aux = log.pop("_aux")
        xrec, x_target = aux["xrec"], aux["x_target"]

        # D metrics on the same reconstruction (optimizer_idx=1 pass)
        loss_cfg = self.cfg.loss
        logits_real = apply_disc3d(disc_params, x_target, self.cfg.disc)
        fn = hinge_d_loss if loss_cfg.disc_loss == "hinge" else vanilla_d_loss
        d = (loss_cfg.disc_factor
             * fn(logits_real, aux["logits_fake"]) * self._gate(step))
        log.update({"loss/disc": d, "logits/real": jnp.mean(logits_real),
                    "logits/fake": jnp.mean(aux["logits_fake"])})

        log["psnr_db"] = jnp.mean(psnr(x_target, xrec))
        log["ssim"] = jnp.mean(ssim(x_target, xrec))
        metrics = {k: jnp.asarray(v, jnp.float32) for k, v in log.items()}
        return metrics, xrec

    def val_step(self, params, disc_params, batch, rng, step):
        """Jitted validation metrics; returns (metrics dict, xrec)."""
        if not hasattr(self, "_jitted_val"):
            self._jitted_val = jax.jit(self._val_metrics)
        return self._jitted_val(params, disc_params, batch, rng, step)

    # ------------------------------------------------------------------
    # steps
    # ------------------------------------------------------------------

    def _mask_frozen(self, grads):
        for name in self.cfg.frozen_modules:
            if name in grads:
                grads[name] = jax.tree.map(jnp.zeros_like, grads[name])
        return grads

    def _train_step(self, state: TrainState, batch: dict, rng: jax.Array
                    ) -> Tuple[TrainState, dict]:
        cfg = self.cfg

        zero_metrics = {
            "loss/total": 0.0, "loss/nll": 0.0, "loss/rec": 0.0,
            "loss/g": 0.0, "scalars/logvar": 0.0, "scalars/d_weight": 0.0,
            "kl_loss": 0.0, "loss/disc": 0.0, "logits/real": 0.0,
            "logits/fake": 0.0,
        }
        if cfg.constraint in ("latent", "all"):
            zero_metrics.update({"loss/rec2d": 0.0, "scalars/logvar_2d": 0.0})
        zero_metrics = {k: jnp.asarray(v, jnp.float32)
                        for k, v in zero_metrics.items()}

        def g_branch(operand):
            state, batch, rng = operand
            (loss, log), grads = jax.value_and_grad(
                self._g_loss, has_aux=True)(
                state.params, state.disc_params, batch, rng, state.step)
            grads = self._mask_frozen(dict(grads))
            opt_g_in = set_learning_rate(state.opt_g,
                                         self.lr_schedule_g(state.step))
            updates, opt_g = self.opt_g.update(grads, opt_g_in, state.params)
            # mask updates too: AdamW's decoupled weight decay moves
            # parameters even at zero gradient (the reference freezes by
            # excluding from the optimizer, autoencoder.py:223-234)
            updates = self._mask_frozen(dict(updates))
            params = optax.apply_updates(state.params, updates)
            ema = state.ema
            if ema is not None:
                ema = ema_update(ema, params, cfg.ema_decay)
            new_state = state._replace(step=state.step + 1, params=params,
                                       opt_g=opt_g, ema=ema)
            metrics = dict(zero_metrics)
            metrics.update({k: jnp.asarray(v, jnp.float32)
                            for k, v in log.items()})
            return new_state, metrics

        def d_branch(operand):
            state, batch, rng = operand
            (loss, log), grads = jax.value_and_grad(
                self._d_loss, has_aux=True)(
                state.disc_params, state.params, batch, rng, state.step)
            opt_d_in = set_learning_rate(state.opt_d,
                                         self.lr_schedule_d(state.step))
            updates, opt_d = self.opt_d.update(grads, opt_d_in,
                                               state.disc_params)
            disc_params = optax.apply_updates(state.disc_params, updates)
            new_state = state._replace(step=state.step + 1,
                                       disc_params=disc_params, opt_d=opt_d)
            metrics = dict(zero_metrics)
            metrics.update({k: jnp.asarray(v, jnp.float32)
                            for k, v in log.items()})
            return new_state, metrics

        # optimizer_idx = batch_idx % 2 (autoencoder.py:361), but while
        # global_step < disc_start EVERY batch is a G update and the
        # disc params are bit-frozen (:362-363 forces optimizer_idx=0 —
        # merely zeroing the D loss would still let AdamW's decoupled
        # weight decay shrink the disc every other step).
        is_g = jnp.logical_or((state.step % 2) == 0,
                              state.step < self.cfg.loss.disc_start)
        return jax.lax.cond(is_g, g_branch, d_branch, (state, batch, rng))

    def train_step(self, state: TrainState, batch: dict, rng: jax.Array
                   ) -> Tuple[TrainState, dict]:
        return self._jitted_step(state, batch, rng)
