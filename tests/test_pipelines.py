"""Diffusion pipeline tests: scheduler math + the VAE latent-compat
decode contract (single-image latents -> frames)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cvvae_tpu.models.vae_v1 import VAE1Config
from cvvae_tpu.models.video_vae import VideoVAE, VideoVAEConfig
from cvvae_tpu.pipelines.diffusion import (
    DDIMScheduler, EulerDiscreteScheduler, LatentDiffusionPipeline)


@pytest.fixture(scope="module")
def vae():
    cfg = VideoVAEConfig(
        family="v1",
        net=VAE1Config(ch=8, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                       z_channels=4, norm_num_groups=4),
        tile_spatial_size=None)
    return VideoVAE.from_config(cfg, seed=0)


def test_ddim_recovers_x0_when_eps_known():
    """If the model returns the exact eps used to noise x0, one DDIM step
    from t to -1 must recover x0."""
    sched = DDIMScheduler()
    alphas = sched.alphas_cumprod()
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(1, 4, 4, 4), jnp.float32)
    eps = jnp.asarray(rng.randn(1, 4, 4, 4), jnp.float32)
    t = 500
    x_t = jnp.sqrt(alphas[t]) * x0 + jnp.sqrt(1 - alphas[t]) * eps
    x_out = sched.step(eps, t, -1, x_t, alphas)
    np.testing.assert_allclose(np.asarray(x_out), np.asarray(x0), atol=1e-5)


def test_euler_sigmas_monotonic():
    sched = EulerDiscreteScheduler()
    s = np.asarray(sched.sigmas(30))
    assert s[0] > s[-2] > s[-1] == 0.0
    assert (np.diff(s) <= 0).all()


@pytest.mark.slow
def test_pipeline_end_to_end_shapes(vae):
    def denoiser(latents, t, cond):
        return latents * 0.1  # dummy eps model

    pipe = LatentDiffusionPipeline(vae, denoiser)
    img = pipe(jax.random.PRNGKey(0), batch=1, height=64, width=64,
               num_inference_steps=4, guidance_scale=1.0)
    assert img.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_pipeline_cfg_doubles_batch(vae):
    calls = {}

    def denoiser(latents, t, cond):
        calls["batch"] = latents.shape[0]
        return latents * 0.1

    pipe = LatentDiffusionPipeline(vae, denoiser)
    pipe(jax.random.PRNGKey(0), cond=jnp.ones((1, 4)),
         uncond=jnp.zeros((1, 4)), batch=1, height=64, width=64,
         num_inference_steps=2, guidance_scale=7.5)
    assert calls["batch"] == 2


@pytest.mark.slow
def test_decode_latents_contract(vae):
    """decode(latents / scaling_factor, num_frames=1) squeezed to images
    (pipeline_stable_diffusion.py:1046-1048)."""
    pipe = LatentDiffusionPipeline(vae, lambda l, t, c: l)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    img = pipe.decode_latents(z)
    assert img.shape == (2, 64, 64, 3)
