"""Distributed tests on the virtual 8-device CPU mesh (SURVEY §4):
data-parallel training step and spatially-sharded inference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cvvae_tpu.parallel.mesh import (
    batch_sharding, make_mesh, put_batch, put_replicated,
    shard_parallel_step, spatial_sharding)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8, jax.devices()


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_data_parallel_matches_single_device():
    """A DP step over 8 devices must equal the same step on one device
    (the partitioner's grad all-reduce == the single-chip mean)."""
    from cvvae_tpu.losses.vae_loss import LossConfig
    from cvvae_tpu.models.discriminator import Disc3DConfig
    from cvvae_tpu.models.vae_sd3 import VAESD3Config
    from cvvae_tpu.training.engine import EngineConfig, TrainingEngine
    from cvvae_tpu.training.optim import OptimConfig

    net = VAESD3Config(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                       latent_channels=4, norm_num_groups=4)
    cfg = EngineConfig(
        family="sd3", net=net,
        disc=Disc3DConfig(ndf=8, n_layers=2, norm_groups=4),
        loss=LossConfig(perceptual_weight=0.0), constraint="none",
        optim=OptimConfig(num_warmup_steps=0, num_training_steps=100),
        remat=False)
    engine = TrainingEngine(cfg, seed=0)
    state = engine.init_state(jax.random.PRNGKey(0))
    batch = {"frames": jax.random.normal(jax.random.PRNGKey(1),
                                         (8, 5, 8, 8, 3))}
    rng = jax.random.PRNGKey(2)

    s_single, m_single = engine.train_step(state, batch, rng)

    mesh = make_mesh(8)
    step = shard_parallel_step(engine._train_step, mesh, donate_state=False)
    s_mesh, m_mesh = step(put_replicated(state, mesh),
                          put_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(m_single["loss/total"]),
                               float(m_mesh["loss/total"]), rtol=1e-4)
    a = jax.tree_util.tree_leaves(s_single.params)
    b = jax.tree_util.tree_leaves(s_mesh.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_spatial_sharding_matches_unsharded():
    """H-axis sharded encode == unsharded encode (XLA halo exchange)."""
    from cvvae_tpu.models.vae_sd3 import VAESD3Config, apply_encoder, init_encoder

    net = VAESD3Config(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                       latent_channels=4, norm_num_groups=4)
    params = init_encoder(jax.random.PRNGKey(0), net)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 64, 16, 3))
    y_ref = apply_encoder(params, x, net)

    mesh = make_mesh(8)
    xs = jax.device_put(x, spatial_sharding(mesh))
    enc = jax.jit(lambda p, v: apply_encoder(p, v, net),
                  in_shardings=(None, spatial_sharding(mesh)))
    y = enc(params, xs)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_videovae_with_mesh_matches_single_device():
    """VideoVAE.with_mesh: spatially-sharded encode/decode == unsharded."""
    from cvvae_tpu.models.vae_v1 import VAE1Config
    from cvvae_tpu.models.video_vae import VideoVAE, VideoVAEConfig
    cfg = VideoVAEConfig(
        family="v1",
        net=VAE1Config(ch=8, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                       z_channels=4, norm_num_groups=4),
        tile_spatial_size=None)
    vae = VideoVAE.from_config(cfg, seed=0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 64, 32, 3))
    z_ref = vae.encode(x).mode()
    x_ref = vae.decode(z_ref)

    mesh = make_mesh(8)
    svae = vae.with_mesh(mesh)
    z = svae.encode(x).mode()
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               atol=2e-5, rtol=1e-4)
    x_out = svae.decode(z)
    np.testing.assert_allclose(np.asarray(x_out), np.asarray(x_ref),
                               atol=5e-5, rtol=1e-4)


def test_temporal_sharding_matches_unsharded():
    """T-axis (context-parallel) sharded encode == unsharded: causal
    conv halos are one-sided ppermutes inserted by the partitioner."""
    from cvvae_tpu.models.vae_sd3 import VAESD3Config, apply_encoder, init_encoder
    from cvvae_tpu.parallel.mesh import temporal_sharding

    net = VAESD3Config(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                       latent_channels=4, norm_num_groups=4)
    params = init_encoder(jax.random.PRNGKey(0), net)
    # context parallelism serves long clips: T must divide by the mesh
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 32, 16, 3))
    y_ref = apply_encoder(params, x, net)

    mesh = make_mesh(4)
    xs = jax.device_put(x, temporal_sharding(mesh))
    enc = jax.jit(lambda p, v: apply_encoder(p, v, net),
                  in_shardings=(None, temporal_sharding(mesh)))
    y = enc(params, xs)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_videovae_with_mesh_time_matches_single_device():
    """VideoVAE.with_mesh(shard_dim='time'): sequence-parallel
    encode/decode == single device (v1 family: interleave upsample,
    causal pads)."""
    from cvvae_tpu.models.vae_v1 import VAE1Config
    from cvvae_tpu.models.video_vae import VideoVAE, VideoVAEConfig
    cfg = VideoVAEConfig(
        family="v1",
        net=VAE1Config(ch=8, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                       z_channels=4, norm_num_groups=4),
        tile_spatial_size=None, en_de_n_frames_a_time=None)
    vae = VideoVAE.from_config(cfg, seed=0)
    # context parallelism needs mesh-multiple windows (GroupNorm spans
    # the sequence, so padding cannot be hidden): T=16 -> T'=4 over 4
    # devices; the decode output length (4*4-3=13) is odd — output
    # shardings are left to the compiler
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 32, 32, 3))
    z_ref = vae.encode(x).mode()
    xr_ref = vae.decode(z_ref)

    mesh = make_mesh(4)
    tvae = vae.with_mesh(mesh, shard_dim="time")
    z = tvae.encode(x).mode()
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               atol=2e-5, rtol=1e-4)
    xr = tvae.decode(z)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(xr_ref),
                               atol=3e-5, rtol=1e-4)
    # non-divisible T raises the documented error
    with pytest.raises(ValueError, match="divisible"):
        tvae.encode(jax.random.normal(jax.random.PRNGKey(2),
                                      (1, 17, 32, 32, 3)))


def test_temporal_sharded_decoder_matches_unsharded_8way():
    """T-axis sharded DECODER == unsharded on the full 8-way mesh, both
    families (the driver dryrun exercises the sharded encoder; this
    pins the decoder nets, incl. v1's temporal-interleave upsample)."""
    from cvvae_tpu.models import vae_sd3, vae_v1
    from cvvae_tpu.parallel.mesh import temporal_sharding

    mesh = make_mesh(8)
    sharded = temporal_sharding(mesh)

    net3 = vae_sd3.VAESD3Config(block_out_channels=(8, 8, 8, 8),
                                layers_per_block=1, latent_channels=4,
                                norm_num_groups=4)
    p3 = vae_sd3.init_decoder(jax.random.PRNGKey(0), net3)
    z3 = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 4, 6, 4))
    y_ref = vae_sd3.apply_decoder(p3, z3, net3)
    dec3 = jax.jit(lambda p, v: vae_sd3.apply_decoder(p, v, net3),
                   in_shardings=(None, sharded))
    y = dec3(p3, jax.device_put(z3, sharded))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=3e-5, rtol=1e-4)

    net1 = vae_v1.VAE1Config(ch=8, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                             z_channels=4, norm_num_groups=4)
    p1 = vae_v1.init_decoder(jax.random.PRNGKey(2), net1)
    z1 = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 4, 6, 4))
    y1_ref = vae_v1.apply_decoder(p1, z1, net1)
    dec1 = jax.jit(lambda p, v: vae_v1.apply_decoder(p, v, net1),
                   in_shardings=(None, sharded))
    y1 = dec1(p1, jax.device_put(z1, sharded))
    assert y1.shape[1] == 4 * 8 - 3  # interleave upsample: odd T out
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y1_ref),
                               atol=3e-5, rtol=1e-4)


@pytest.mark.slow
def test_streaming_over_mesh_matches_single_device():
    """The bounded-memory streaming pipeline composes with
    VideoVAE.with_mesh: a spatially-sharded VAE streams a long clip to
    (near-)bit-identical latents and frames vs the unsharded pipeline —
    the multi-chip serving path (streaming host loop + SPMD nets)."""
    from cvvae_tpu.models.vae_v1 import VAE1Config
    from cvvae_tpu.models.video_vae import VideoVAE, VideoVAEConfig
    from cvvae_tpu.streaming import streaming_decode, streaming_encode
    cfg = VideoVAEConfig(
        family="v1",
        net=VAE1Config(ch=8, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                       z_channels=4, norm_num_groups=4),
        en_de_n_frames_a_time=8, tile_spatial_size=None)
    vae = VideoVAE.from_config(cfg, seed=0)
    svae = vae.with_mesh(make_mesh(8))

    rs = np.random.RandomState(0)
    frames_u8 = rs.randint(0, 255, (21, 64, 32, 3), np.uint8)

    def run(v):
        zs, outs = [], []
        for z in streaming_encode(v, iter(frames_u8), dtype=jnp.float32):
            zs.append(np.asarray(z))
        for f in streaming_decode(
                v, iter([jnp.asarray(z) for z in zs])):
            outs.append(f)
        return np.concatenate(zs, axis=1), np.concatenate(outs, axis=0)

    z_ref, f_ref = run(vae)
    z_mesh, f_mesh = run(svae)
    np.testing.assert_allclose(z_mesh, z_ref, atol=2e-5, rtol=1e-4)
    # frames are uint8 on the host wire: allow off-by-one from fp noise
    assert np.max(np.abs(f_mesh.astype(np.int16)
                         - f_ref.astype(np.int16))) <= 1
