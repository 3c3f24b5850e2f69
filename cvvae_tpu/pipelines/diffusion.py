"""Latent-diffusion sampling pipeline with the 3D video VAE.

TPU-native analogue of the reference's rebuilt StableDiffusionPipeline
(pipelines/pipeline_stable_diffusion.py:118-1067), which exists to prove
the *latent compatibility contract*: latents produced by an image
diffusion model decode correctly through the video VAE —
``vae.decode(latents / scaling_factor, num_frames=1)`` with
``vae_scale_factor = spatial_n_compress``
(pipeline_stable_diffusion.py:248, 1046-1048).

The denoiser is pluggable (any ``(latents, t, cond) -> eps/v`` callable
— e.g. a JAX UNet/DiT with converted weights); schedulers implement the
standard DDPM beta schedule with DDIM and Euler-discrete samplers.  The
whole sampling loop is a ``lax.scan`` (one compile, no per-step
dispatch) with classifier-free guidance.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _betas(num_train_timesteps: int = 1000, beta_start: float = 0.00085,
           beta_end: float = 0.012, schedule: str = "scaled_linear"
           ) -> jnp.ndarray:
    if schedule == "scaled_linear":  # SD convention
        return jnp.linspace(beta_start ** 0.5, beta_end ** 0.5,
                            num_train_timesteps) ** 2
    if schedule == "linear":
        return jnp.linspace(beta_start, beta_end, num_train_timesteps)
    raise ValueError(schedule)


@dataclasses.dataclass(frozen=True)
class DDIMScheduler:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    eta: float = 0.0
    prediction_type: str = "epsilon"      # "epsilon" | "v_prediction"

    def timesteps(self, num_inference_steps: int) -> jnp.ndarray:
        step = self.num_train_timesteps // num_inference_steps
        return (jnp.arange(num_inference_steps) * step).round()[::-1].astype(
            jnp.int32)

    def alphas_cumprod(self) -> jnp.ndarray:
        return jnp.cumprod(1.0 - _betas(self.num_train_timesteps,
                                        self.beta_start, self.beta_end), 0)

    def init_noise_sigma(self) -> float:
        return 1.0

    def scale_model_input(self, sample, t):
        return sample

    def step(self, model_out, t, t_prev, sample, alphas_cumprod):
        a_t = alphas_cumprod[t]
        a_prev = jnp.where(t_prev >= 0, alphas_cumprod[jnp.maximum(t_prev, 0)],
                           jnp.float32(1.0))
        if self.prediction_type == "v_prediction":
            eps = jnp.sqrt(a_t) * model_out + jnp.sqrt(1 - a_t) * sample
            x0 = jnp.sqrt(a_t) * sample - jnp.sqrt(1 - a_t) * model_out
        else:
            eps = model_out
            x0 = (sample - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps


@dataclasses.dataclass(frozen=True)
class EulerDiscreteScheduler:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    prediction_type: str = "epsilon"

    def sigmas(self, num_inference_steps: int) -> jnp.ndarray:
        ac = jnp.cumprod(1.0 - _betas(self.num_train_timesteps,
                                      self.beta_start, self.beta_end), 0)
        all_sigmas = jnp.sqrt((1 - ac) / ac)
        idx = jnp.linspace(0, self.num_train_timesteps - 1,
                           num_inference_steps).round().astype(jnp.int32)
        return jnp.concatenate([all_sigmas[idx][::-1], jnp.zeros((1,))])

    def timesteps(self, num_inference_steps: int) -> jnp.ndarray:
        idx = jnp.linspace(0, self.num_train_timesteps - 1,
                           num_inference_steps).round().astype(jnp.int32)
        return idx[::-1]

    def init_noise_sigma(self, num_inference_steps: int) -> jnp.ndarray:
        s = self.sigmas(num_inference_steps)
        return jnp.sqrt(s[0] ** 2 + 1)

    def scale_model_input(self, sample, sigma):
        return sample / jnp.sqrt(sigma ** 2 + 1)

    def step(self, model_out, sigma, sigma_next, sample):
        if self.prediction_type == "epsilon":
            x0 = sample - sigma * model_out
        else:
            scaled = sample / jnp.sqrt(sigma ** 2 + 1)
            x0 = scaled / jnp.sqrt(sigma ** 2 + 1) - \
                sigma * model_out / jnp.sqrt(sigma ** 2 + 1)
        d = (sample - x0) / sigma
        return sample + d * (sigma_next - sigma)


class LatentDiffusionPipeline:
    """Denoise in the image-VAE latent space, decode with the video VAE.

    denoiser: (latents (B,H',W',C), t:int32 scalar, cond) -> model output.
    cond is whatever the denoiser needs (text embeddings etc.); with
    guidance_scale > 1 the denoiser is called on a doubled batch with
    (uncond, cond) stacked, diffusers-style.
    """

    def __init__(self, vae, denoiser: Callable,
                 scheduler: Optional[DDIMScheduler] = None):
        self.vae = vae
        self.denoiser = denoiser
        self.scheduler = scheduler or DDIMScheduler()
        self.vae_scale_factor = vae.config.spatial_n_compress

    def prepare_latents(self, key, batch: int, height: int, width: int
                        ) -> jnp.ndarray:
        shape = (batch, height // self.vae_scale_factor,
                 width // self.vae_scale_factor,
                 self.vae.config.latent_channels)
        return jax.random.normal(key, shape) * self.scheduler.init_noise_sigma()

    def __call__(self, key, *, cond=None, uncond=None, batch: int = 1,
                 height: int = 512, width: int = 512,
                 num_inference_steps: int = 50,
                 guidance_scale: float = 7.5,
                 latents: Optional[jnp.ndarray] = None,
                 output_type: str = "image") -> jnp.ndarray:
        sched = self.scheduler
        if latents is None:
            key, sub = jax.random.split(key)
            latents = self.prepare_latents(sub, batch, height, width)
        ts = sched.timesteps(num_inference_steps)
        ts_prev = jnp.concatenate(
            [ts[1:], -jnp.ones((1,), ts.dtype)])
        alphas = sched.alphas_cumprod()
        use_cfg = guidance_scale > 1.0 and uncond is not None

        def body(lat, t_pair):
            t, t_prev = t_pair
            model_in = sched.scale_model_input(lat, t)
            if use_cfg:
                stacked = jnp.concatenate([model_in, model_in], axis=0)
                c = jax.tree.map(
                    lambda u, v: jnp.concatenate([u, v], axis=0), uncond, cond)
                out = self.denoiser(stacked, t, c)
                out_u, out_c = jnp.split(out, 2, axis=0)
                out = out_u + guidance_scale * (out_c - out_u)
            else:
                out = self.denoiser(model_in, t, cond)
            lat = sched.step(out, t, t_prev, lat, alphas)
            return lat, None

        latents, _ = jax.lax.scan(body, latents, (ts, ts_prev))
        if output_type == "latent":
            return latents
        return self.decode_latents(latents)

    def decode_latents(self, latents: jnp.ndarray) -> jnp.ndarray:
        """The compatibility contract: 4D image latents -> single video
        frame (pipeline_stable_diffusion.py:1046-1048)."""
        z = latents / self.vae.config.scaling_factor
        video = self.vae.decode(z, num_frames=1)
        return video[:, 0]  # squeeze the T axis
