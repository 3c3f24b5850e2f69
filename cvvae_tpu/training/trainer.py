"""Training loop: the Lightning-Trainer analogue (fit/validate).

Covers the reference assembly's runtime behaviors (main.py:503-958):
per-step optimisation with G/D alternation (inside the engine), metric +
LR logging, image logging with the early power-of-two cadence, rolling +
permanent checkpoints, resume, SIGUSR1 -> checkpoint ("melk",
main.py:881-900), and checkpoint-on-exception (main.py:916-919).
"""

from __future__ import annotations

import signal
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cvvae_tpu.training.checkpoint import CheckpointManager
from cvvae_tpu.training.engine import TrainingEngine, TrainState
from cvvae_tpu.training.logging import ImageLogger, MetricsLogger


def engine_params(state: TrainState) -> dict:
    return state.params


class Trainer:
    def __init__(self, engine: TrainingEngine, logdir: str, *,
                 max_steps: int = 200_000,
                 ckpt_every: int = 2000, ckpt_keep: int = 3,
                 permanent_every: int = 10_000,
                 log_every: int = 1, image_every: int = 250,
                 val_every: Optional[int] = None,
                 mesh=None, seed: int = 0):
        self.engine = engine
        self.logdir = logdir
        self.max_steps = max_steps
        self.metrics = MetricsLogger(logdir)
        self.images = ImageLogger(logdir, every=image_every)
        self.ckpt = CheckpointManager(logdir, rolling_every=ckpt_every,
                                      keep=ckpt_keep,
                                      permanent_every=permanent_every)
        self.val_every = val_every
        self.log_every = log_every
        self.seed = seed
        # log the APPLIED LR: the engine injects these same schedules,
        # evaluated at the global step, into each optimizer every step
        # (lvdm/models/autoencoder.py:376-378 steps both schedulers per
        # batch, so LR is a function of the global step)
        self._lr_schedule = engine.lr_schedule_g
        if mesh is not None:
            from cvvae_tpu.parallel.mesh import shard_parallel_step
            self._step_fn = shard_parallel_step(engine._train_step, mesh,
                                                donate_state=False)
            self._mesh = mesh
        else:
            self._step_fn = engine.train_step
            self._mesh = None

    # ------------------------------------------------------------------

    def fit(self, data: Iterator, *, state: Optional[TrainState] = None,
            resume: bool = False,
            val_data: Optional[Iterator] = None) -> TrainState:
        engine = self.engine
        if state is None:
            state = engine.init_state(jax.random.PRNGKey(self.seed))
        if resume and self.ckpt.latest_step() is not None:
            from cvvae_tpu.training.checkpoint import abstract_state
            state = self.ckpt.restore(abstract_state(state))
            print(f"[trainer] resumed at step {int(state.step)}")

        # double-buffer host->device transfers ahead of the step
        # (device_put is async; the transfer overlaps compute)
        from cvvae_tpu.data.pipeline import device_prefetch
        if self._mesh is not None:
            from cvvae_tpu.parallel.mesh import batch_sharding
            data = device_prefetch(data,
                                   sharding=batch_sharding(self._mesh))
        else:
            data = device_prefetch(data)

        rng_base = jax.random.PRNGKey(self.seed + 1)
        melk_requested = {"flag": False}

        def _melk(signum, frame):  # SIGUSR1 -> checkpoint (main.py:881-893)
            melk_requested["flag"] = True

        def _divein(signum, frame):  # SIGUSR2 -> debugger (main.py:893-900)
            if jax.process_index() == 0:
                import pdb
                pdb.Pdb().set_trace(frame)

        try:
            signal.signal(signal.SIGUSR1, _melk)
            signal.signal(signal.SIGUSR2, _divein)
        except (ValueError, OSError):
            pass  # non-main thread

        step = int(state.step)
        try:
            while step < self.max_steps:
                batch = next(data)
                batch = {k: jnp.asarray(v) for k, v in batch.items()
                         if isinstance(v, (np.ndarray, jnp.ndarray))}
                if self._mesh is not None:
                    from cvvae_tpu.parallel.mesh import put_batch
                    batch = put_batch(batch, self._mesh)
                # step-keyed rng: resume at step k replays the exact
                # stream an uninterrupted run would use (resume test)
                sub = jax.random.fold_in(rng_base, step)
                state, metrics = self._step_fn(state, batch, sub)
                step = int(state.step)

                if self.log_every and step % self.log_every == 0:
                    # reference key convention: split-prefixed scalars
                    # (discriminator_loss.py:517-558)
                    self.metrics.log(step,
                                     {f"train/{k}": float(v)
                                      for k, v in metrics.items()},
                                     lr=float(self._lr_schedule(step)))
                if self.images.every and "frames" in batch:
                    from cvvae_tpu.training.logging import should_log_images
                    if should_log_images(step, self.images.every):
                        # extra forward for the recon panels (reference
                        # ImageLogger cadence, main.py:310-478) + patch-
                        # disc logit heatmaps (discriminator_loss.py:98)
                        from cvvae_tpu.models.discriminator import \
                            apply_disc3d
                        x = batch["frames"]
                        _, _, _, xrec, x_t = engine._forward(
                            engine_params(state), x,
                            jax.random.PRNGKey(step))
                        xrec = xrec[:x.shape[0]]
                        lg_r = apply_disc3d(state.disc_params, x,
                                            engine.cfg.disc)
                        lg_f = apply_disc3d(state.disc_params, xrec,
                                            engine.cfg.disc)
                        self.images.log(step, np.asarray(x),
                                        np.asarray(xrec),
                                        logits_real=np.asarray(lg_r),
                                        logits_fake=np.asarray(lg_f))
                self.ckpt.maybe_save(
                    step, state,
                    metrics={f"train/{k}": v for k, v in metrics.items()})
                if melk_requested["flag"]:
                    self.ckpt.save_now(step, state)
                    melk_requested["flag"] = False
                if val_data is not None and self.val_every and \
                        step % self.val_every == 0:
                    self.validate(state, val_data, step)
        except BaseException:
            # checkpoint-then-reraise (main.py:916-919)
            self.ckpt.save_now(step, state)
            raise
        self.ckpt.close()
        return state

    # ------------------------------------------------------------------

    def validate(self, state: TrainState, val_data: Iterator,
                 step: int, n_batches: int = 1, split: str = "val") -> dict:
        """Full-dict reconstruction eval + image panels.

        Mirrors the reference's validation_step (autoencoder.py:380-443):
        the complete G loss dict (loss/total, loss/nll, loss/rec, loss/g,
        scalars/*) plus the D pass (loss/disc, logits/*) on each val
        batch, computed twice — with raw weights and, when EMA is
        enabled, with shadow weights under a ``_ema`` postfix — plus
        PSNR/SSIM (reported in the paper, utils/metrics.py).
        """
        engine = self.engine

        passes = [("", state.params)]
        if state.ema is not None:  # ema_scope() second pass
            passes.append(("_ema", state.ema.shadow))

        out = {}
        for tag, params in passes:
            sums, count = {}, 0
            for i in range(n_batches):
                batch = next(val_data)
                x = jnp.asarray(batch["frames"])
                metrics, xrec = engine.val_step(
                    params, state.disc_params, {"frames": x},
                    jax.random.PRNGKey(i), state.step)
                for k, v in metrics.items():
                    sums[k] = sums.get(k, 0.0) + float(v)
                count += 1
                if i == 0:
                    self.images.log(step, np.asarray(x),
                                    np.asarray(xrec[:x.shape[0]]),
                                    split=f"{split}{tag}")
            out.update({f"{split}{tag}/{k}": v / count
                        for k, v in sums.items()})
        self.metrics.log(step, out)
        return out

    def test(self, state: TrainState, test_data: Iterator,
             n_batches: int = 8) -> dict:
        """Test-split runner (the reference runs trainer.test after fit,
        main.py:920-921) — same metric dict under ``test/`` keys."""
        return self.validate(state, test_data, int(state.step),
                             n_batches=n_batches, split="test")

    def validate_tiled(self, state: TrainState, clips: Iterator, step: int,
                       n_clips: int = 1, tile_spatial_size: int = 576,
                       tile_overlap_ratio: float = 0.2222,
                       split: str = "val_tiled") -> dict:
        """Full-resolution eval through the production tiled path
        (temporal chunking + spatial tiles), like the reference's
        Autoencoding3DEngine val on large clips (autoencoder.py:858-966).
        Reports PSNR/SSIM/L1 (full loss terms need net-sized windows)."""
        from cvvae_tpu.models.video_vae import VideoVAE, VideoVAEConfig
        from cvvae_tpu.utils.metrics import reconstruction_report

        cfg = self.engine.cfg
        vcfg = VideoVAEConfig(family=cfg.family, net=cfg.net,
                              tile_spatial_size=tile_spatial_size,
                              tile_overlap_ratio=tile_overlap_ratio)
        vae = VideoVAE(vcfg, {"encoder": state.params["encoder"],
                              "decoder": state.params["decoder"]})
        sums, count = {}, 0
        for i in range(n_clips):
            batch = next(clips)
            x = jnp.asarray(batch["frames"])
            xrec = vae.reconstruct(x)
            for k, v in reconstruction_report(x, xrec).items():
                sums[k] = sums.get(k, 0.0) + v
            count += 1
            if i == 0:
                self.images.log(step, np.asarray(x), np.asarray(xrec),
                                split=split)
        out = {f"{split}/{k}": v / count for k, v in sums.items()}
        self.metrics.log(step, out)
        return out
