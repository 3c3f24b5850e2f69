"""Golden UNet2DConditionModel tests: the executable latent-compat proof.

The reference proves SD 2.1 latent compatibility with a rebuilt
StableDiffusionPipeline + notebook (pipeline_stable_diffusion.py:118-
1067, sd21_vae3d_inference.ipynb).  Here the same flow runs natively:
torch UNet (diffusers-named stub) -> convert -> JAX UNet -> sample ->
decode with the 3D VideoVAE — numerics checked at every stage.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cvvae_tpu.models.unet2d import UNet2DConfig, apply_unet, make_denoiser
from cvvae_tpu.utils.convert import convert_unet_state_dict
from tests.torch_ref.unet_stub import UNet2DConditionModel


@pytest.fixture(scope="module")
def tiny_unet():
    torch.manual_seed(0)
    net = UNet2DConditionModel(
        in_channels=4, out_channels=4, block_out_channels=(32, 64),
        layers_per_block=1, cross_attention_dim=32, attention_head_dim=8,
        norm_num_groups=8).eval()
    cfg = UNet2DConfig(in_channels=4, out_channels=4,
                       block_out_channels=(32, 64), layers_per_block=1,
                       cross_attention_dim=32, attention_head_dim=8,
                       norm_num_groups=8)
    params = convert_unet_state_dict(net.state_dict())
    return net, params, cfg


@pytest.mark.slow
def test_unet_forward_parity(tiny_unet):
    net, params, cfg = tiny_unet
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 16, 16).astype(np.float32)
    ctx = rng.randn(2, 7, 32).astype(np.float32)
    t = np.asarray([3.0, 500.0], np.float32)
    with torch.no_grad():
        y_ref = net(torch.from_numpy(x), torch.from_numpy(t),
                    torch.from_numpy(ctx)).numpy()
    y = apply_unet(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                   jnp.asarray(t), jnp.asarray(ctx), cfg)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), y_ref,
                               atol=2e-4)


@pytest.mark.slow
def test_latent_compat_sampling_end_to_end(tiny_unet):
    """Torch DDIM loop and the JAX pipeline produce the same latents
    from shared noise; the latents decode through the video VAE via the
    exact reference contract (decode(z/scale, num_frames=1))."""
    from cvvae_tpu.models.vae_v1 import VAE1Config
    from cvvae_tpu.models.video_vae import VideoVAE, VideoVAEConfig
    from cvvae_tpu.pipelines.diffusion import (
        DDIMScheduler, LatentDiffusionPipeline)

    net, params, cfg = tiny_unet
    rng = np.random.RandomState(2)
    lat0 = rng.randn(1, 16, 16, 4).astype(np.float32)
    ctx = rng.randn(1, 7, 32).astype(np.float32)
    steps = 4

    sched = DDIMScheduler()
    alphas = np.asarray(sched.alphas_cumprod())
    ts = np.asarray(sched.timesteps(steps))

    # torch reference loop (the notebook flow)
    lat_t = torch.from_numpy(lat0.transpose(0, 3, 1, 2))
    with torch.no_grad():
        for i, t in enumerate(ts):
            t_prev = ts[i + 1] if i + 1 < len(ts) else -1
            eps = net(lat_t, torch.tensor([float(t)]), torch.from_numpy(ctx))
            a_t = alphas[t]
            a_prev = alphas[t_prev] if t_prev >= 0 else 1.0
            x0 = (lat_t - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
            lat_t = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
    lat_ref = lat_t.numpy().transpose(0, 2, 3, 1)

    # JAX pipeline with the converted UNet as denoiser
    vae = VideoVAE.from_config(VideoVAEConfig(
        family="v1",
        net=VAE1Config(ch=8, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                       z_channels=4, norm_num_groups=4),
        tile_spatial_size=None), seed=0)
    pipe = LatentDiffusionPipeline(vae, make_denoiser(params, cfg),
                                   scheduler=sched)
    lat_jax = pipe(jax.random.PRNGKey(0), cond=jnp.asarray(ctx),
                   latents=jnp.asarray(lat0), num_inference_steps=steps,
                   guidance_scale=1.0, output_type="latent")
    np.testing.assert_allclose(np.asarray(lat_jax), lat_ref, atol=5e-4)

    # the compat contract: 4D image latents -> one decoded frame
    frame = pipe.decode_latents(lat_jax)
    assert frame.shape == (1, 128, 128, 3)
    assert np.isfinite(np.asarray(frame)).all()
