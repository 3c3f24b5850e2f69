"""Asymmetric tiling config: encoder tile size decoupled from the
decoder's (serving configs run the encoder untiled — its HBM peak is a
fraction of the decoder's — while the decoder still tiles)."""

import numpy as np

import jax
import jax.numpy as jnp

from cvvae_tpu.models.vae_v1 import VAE1Config
from cvvae_tpu.models.video_vae import VideoVAE, VideoVAEConfig


def _cfg(**kw):
    return VideoVAEConfig(
        family="v1",
        net=VAE1Config(ch=8, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                       z_channels=4, norm_num_groups=4),
        en_de_n_frames_a_time=None, **kw)


def test_encode_tile_inherits_by_default():
    cfg = _cfg(tile_spatial_size=64)
    assert cfg.encode_pixel_tile_size == 64
    assert cfg.encode_latent_tile_size == 8
    cfg2 = _cfg(tile_spatial_size=64, encode_tile_spatial_size=None)
    assert cfg2.encode_pixel_tile_size is None
    assert cfg2.pixel_tile_size == 64


def test_untiled_encode_tiled_decode_close_to_tiled():
    """encode untiled + decode tiled: the latent equals the untiled
    latent exactly (no seams), and the decode path still tiles."""
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 96, 96, 3)) * 0.5

    vae_ref = VideoVAE.from_config(_cfg(tile_spatial_size=None), seed=0)
    vae_mix = VideoVAE.from_config(
        _cfg(tile_spatial_size=64, encode_tile_spatial_size=None), seed=0)
    vae_tiled = VideoVAE.from_config(_cfg(tile_spatial_size=64), seed=0)

    z_ref = vae_ref.encode(x).mode()
    z_mix = vae_mix.encode(x).mode()
    np.testing.assert_array_equal(np.asarray(z_mix), np.asarray(z_ref))
    z_tiled = vae_tiled.encode(x).mode()
    assert not np.array_equal(np.asarray(z_tiled), np.asarray(z_ref))

    # decode through the mixed config still uses 64px latent tiles and
    # matches the fully-tiled decode bit-for-bit on the same z
    xr_mix = vae_mix.decode(z_ref)
    xr_tiled = vae_tiled.decode(z_ref)
    np.testing.assert_array_equal(np.asarray(xr_mix), np.asarray(xr_tiled))


def test_rectangular_tiles():
    """(h, w) tile pairs: a square pair equals the square int config
    bit-for-bit, a full-size rect tile equals untiled, and a rect grid
    covers ragged frames with the right output shape."""
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 64, 96, 3)) * 0.5

    # (t, t) pair == int t (the rect path is a strict generalisation)
    vae_sq = VideoVAE.from_config(_cfg(tile_spatial_size=56), seed=0)
    vae_pair = VideoVAE.from_config(_cfg(tile_spatial_size=(56, 56)), seed=0)
    np.testing.assert_array_equal(
        np.asarray(vae_pair.encode(x).mode()),
        np.asarray(vae_sq.encode(x).mode()))

    # a tile covering the whole frame == untiled
    vae_ref = VideoVAE.from_config(_cfg(tile_spatial_size=None), seed=0)
    vae_full = VideoVAE.from_config(_cfg(tile_spatial_size=(64, 96)), seed=0)
    np.testing.assert_array_equal(
        np.asarray(vae_full.encode(x).mode()),
        np.asarray(vae_ref.encode(x).mode()))

    # rect grid on a ragged frame: right shape, finite, roundtrips
    vae_rect = VideoVAE.from_config(
        _cfg(tile_spatial_size=(64, 56), tile_overlap_ratio=0.15), seed=0)
    z = np.asarray(vae_rect.encode(x).mode())
    assert z.shape == (1, 2, 8, 12, 4)
    xr = np.asarray(vae_rect.decode(jnp.asarray(z)))
    assert xr.shape == x.shape
    assert np.isfinite(xr).all()


def test_serving_decode_tile_plan():
    """CLI serving preset tile math: coverage with the documented
    8-latent overlap, untiled for small frames."""
    from cvvae_tpu.cli import serving_decode_tiles
    assert serving_decode_tiles(512, 512) == (None, 0.2222)
    tile, ratio = serving_decode_tiles(720, 1280)
    assert tile == (720, 672)
    lat_w, lat_tw = 1280 // 8, tile[1] // 8
    stride = round(lat_tw * (1 - ratio[1]))
    assert stride == lat_tw - 8
    # grid covers the latent width
    pos = list(range(0, lat_w, stride))
    covered = max(p + lat_tw for p in pos[:2])
    assert covered >= lat_w


def test_serving_decode_tile_plan_tall_and_wide():
    """>720-height frames (the per-axis-overlap regression) and widths
    whose even split exceeds the 720-px cap: every axis tiles at <=720
    px, every axis' output overlap rounds to exactly 64 px, and the
    real _spatial_tiled geometry reproduces the exact frame size."""
    from cvvae_tpu.cli import serving_decode_tiles
    from cvvae_tpu.models.video_vae import VideoVAE

    for h, w in [(1080, 1920), (720, 1440), (2160, 3840), (1080, 1080)]:
        tile, ratio = serving_decode_tiles(h, w)
        (th, tw), (rh, rw) = tile, ratio
        assert th <= 720 and tw <= 720, (h, w, tile)
        assert round(th * rh) == 64 and round(tw * rw) == 64
        cfg = _cfg(tile_spatial_size=tile, tile_overlap_ratio=ratio)
        vae = VideoVAE.from_config(cfg, seed=0)
        z = jnp.zeros((1, 1, h // 8, w // 8, 4))
        up = lambda v: jnp.repeat(
            jnp.repeat(v[..., :3], 8, axis=2), 8, axis=3)
        out = vae._spatial_tiled(z, up, cfg.latent_tile_size,
                                 cfg.pixel_tile_size)
        assert out.shape == (1, 1, h, w, 3), (h, w, out.shape, tile, ratio)
