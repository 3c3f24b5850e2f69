"""End-to-end golden parity: VideoVAE vs the reference CVVAEModel wrapper
(models/modeling_vae.py) — exercises temporal chunking, spatial tiling
with linear seam blending, the posterior, and the frame contracts."""

import numpy as np
import pytest

import tests.torch_ref as tr

if not tr.reference_available():
    pytest.skip("reference repo not mounted", allow_module_level=True)

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cvvae_tpu.models.vae_v1 import VAE1Config  # noqa: E402
from cvvae_tpu.models.video_vae import VideoVAE, VideoVAEConfig  # noqa: E402
from cvvae_tpu.utils.convert import convert_state_dict  # noqa: E402

ATOL = 5e-4


@pytest.fixture(scope="module")
def models():
    mv = tr.load_reference_module("models.modeling_vae")
    torch.manual_seed(0)
    # tiny tiles force the tiling paths: 16px tiles, 50% overlap
    ref = mv.CVVAEModel(
        ch=32, ch_mult=[1, 2, 4, 4], num_res_blocks=2, z_channels=4,
        en_de_n_frames_a_time=8, time_n_compress=4, spatial_n_compress=8,
        tile_spatial_size=16, tile_overlap_ratio=0.5).eval()
    sd = ref.state_dict()
    params, skipped = convert_state_dict(sd)
    assert not skipped, skipped[:5]
    cfg = VideoVAEConfig(
        family="v1", net=VAE1Config(ch=32, z_channels=4),
        en_de_n_frames_a_time=8, time_n_compress=4, spatial_n_compress=8,
        tile_spatial_size=16, tile_overlap_ratio=0.5)
    mine = VideoVAE(cfg, params)
    return ref, mine


@pytest.mark.slow
def test_tiled_encode_decode_parity(models):
    ref, mine = models
    torch.manual_seed(1)
    x = torch.randn(1, 3, 17, 32, 32)  # T=4k+1, two temporal chunks, 3x3 tiles
    with torch.no_grad():
        post = ref.encode(x).latent_dist
        z_ref = post.mode()
        x_ref = ref.decode(z_ref).sample.numpy()

    posterior = mine.encode(jnp.asarray(x.numpy()), channels_first=True)
    z = posterior.mode()
    z_ref_j = z_ref.numpy().transpose(0, 2, 3, 4, 1)
    assert z.shape == z_ref_j.shape == (1, 5, 4, 4, 4)
    np.testing.assert_allclose(np.asarray(z), z_ref_j, atol=ATOL, rtol=1e-3)

    x_out = mine.decode(z)  # channels-last in, channels-last out
    np.testing.assert_allclose(np.asarray(x_out).transpose(0, 4, 1, 2, 3),
                               x_ref, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_posterior_stats_parity(models):
    ref, mine = models
    torch.manual_seed(2)
    x = torch.randn(1, 3, 5, 16, 16)
    with torch.no_grad():
        post_ref = ref.encode(x).latent_dist
    post = mine.encode(jnp.asarray(x.numpy()), channels_first=True)
    np.testing.assert_allclose(
        np.asarray(post.kl()), post_ref.kl().numpy(), rtol=1e-3)


@pytest.mark.slow
def test_single_image_latent_contract(models):
    """decode(z, num_frames=1) on 4D latents — the SD2.1 pipeline contract
    (pipelines/pipeline_stable_diffusion.py:1046-1048)."""
    ref, mine = models
    torch.manual_seed(3)
    z = torch.randn(1, 4, 8, 8)
    with torch.no_grad():
        x_ref = ref.decode(z, num_frames=1).sample.numpy()
    x = mine.decode(jnp.asarray(z.numpy()), num_frames=1, channels_first=True)
    assert x.shape == x_ref.shape == (1, 3, 1, 64, 64)
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_ragged_tile_parity():
    """Edge tiles smaller than the tile size (64px with 32px tiles at the
    reference 0.2222 overlap -> a 14px bottom tile) must still match the
    reference.  (Configs whose latent overlap rounds to 0 crash the
    reference itself — blend_h's `a[..., -0:]` — so they are invalid.)"""
    import tests.torch_ref as tr
    mv = tr.load_reference_module("models.modeling_vae")
    torch.manual_seed(7)
    ref = mv.CVVAEModel(
        ch=32, ch_mult=[1, 2, 4, 4], num_res_blocks=2, z_channels=4,
        en_de_n_frames_a_time=8, time_n_compress=4, spatial_n_compress=8,
        tile_spatial_size=32, tile_overlap_ratio=0.2222).eval()
    params, skipped = convert_state_dict(ref.state_dict())
    assert not skipped
    cfg = VideoVAEConfig(
        family="v1", net=VAE1Config(ch=32, z_channels=4),
        en_de_n_frames_a_time=8, time_n_compress=4, spatial_n_compress=8,
        tile_spatial_size=32, tile_overlap_ratio=0.2222)
    mine = VideoVAE(cfg, params)

    x = torch.randn(1, 3, 5, 64, 40)
    with torch.no_grad():
        z_ref = ref.encode(x).latent_dist.mode()
        x_ref = ref.decode(z_ref).sample.numpy()
    post = mine.encode(jnp.asarray(x.numpy()), channels_first=True)
    z = post.mode()
    np.testing.assert_allclose(np.asarray(z),
                               z_ref.numpy().transpose(0, 2, 3, 4, 1),
                               atol=5e-4, rtol=1e-3)
    x_out = mine.decode(z)
    np.testing.assert_allclose(np.asarray(x_out).transpose(0, 4, 1, 2, 3),
                               x_ref, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_max_batch_size_chunking(models):
    """Batch-chunked encode/decode == unchunked (the reference's
    en_and_decode_n_samples_a_time contract)."""
    _, mine = models
    x = jnp.asarray(np.random.RandomState(5).randn(3, 5, 16, 16, 3)
                    .astype(np.float32))
    p_full = mine.encode(x)
    p_chunk = mine.encode(x, max_batch_size=2)
    np.testing.assert_allclose(np.asarray(p_chunk.mean),
                               np.asarray(p_full.mean), atol=1e-5)
    z = p_full.mode()
    np.testing.assert_allclose(
        np.asarray(mine.decode(z, max_batch_size=1)),
        np.asarray(mine.decode(z)), atol=1e-5)
