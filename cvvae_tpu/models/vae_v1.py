"""CV-VAE v1 / v1-1 encoder & decoder (SD 2.1 / SVD-compatible, 4ch latents).

Functional JAX re-design of the reference nets
[models/vae_models.py:679-1002].  Structure (defaults ch=128,
ch_mult=(1,2,4,4), 2 res blocks):

  Encoder: conv_in -> 4 levels x (2 x ResnetBlock3D) with Downsample3D at
  levels 0-2 (time downsample at even levels -> T/4, HW/8) -> mid
  (res, spatial-attn, res) -> GroupNorm/swish/conv_out (2*z channels).

  Decoder mirrors with 3 res blocks per level, Upsample3D at levels 3..1
  (time upsample at odd levels), and a spatial+temporal attention
  mid-block.  The encoder is causal in time; the decoder is not
  (causal_encoder=True, causal_decoder=False,
  [models/modeling_vae.py:37-38]).

Layout is channels-last (B, T, H, W, C); params are plain nested dicts
whose keys mirror the reference module names so checkpoint conversion is
mechanical.  GroupNorm eps is 1e-5 for this family
[models/vae_models.py:192-195].
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from cvvae_tpu.ops.activations import silu
from cvvae_tpu.ops.attention import (
    dense, dense_init, spatial_self_attention, temporal_self_attention)
from cvvae_tpu.ops.conv import Conv3DSpec, conv3d, conv_init
from cvvae_tpu.ops.norm import (
    group_norm, group_norm_per_frame, layer_norm, norm_init)

NORM_EPS = 1e-5


@dataclasses.dataclass(frozen=True)
class VAE1Config:
    z_channels: int = 4
    in_channels: int = 3
    out_ch: int = 3
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    norm_num_groups: int = 32
    #: resolutions (in the reference's curr_res bookkeeping, starting at
    #: `resolution`) whose levels get per-block attention
    #: [models/vae_models.py:744-745, 926-927]
    attn_resolutions: Tuple[int, ...] = ()
    resolution: int = 256
    dropout: float = 0.0
    double_z: bool = True
    use_3d_conv: bool = True
    half_3d: bool = True
    causal_encoder: bool = True
    causal_decoder: bool = False
    half_t_mult: bool = True
    #: "spatial" (v1 encoder: per-frame single-head) or
    #: "spatial-temporal" (v1 decoder adds a temporal pass)
    encoder_attn: str = "spatial"
    decoder_attn: str = "spatial-temporal"

    @property
    def num_levels(self) -> int:
        return len(self.ch_mult)

    def conv_spec(self, causal: bool, k: int = 3, p: int = 1,
                  stride=(1, 1, 1)) -> Conv3DSpec:
        if not self.use_3d_conv:
            # Conv2dWithExtraDim everywhere (models/vae_models.py:714-715)
            return Conv3DSpec.spatial2d(k, p, stride[1:])
        if causal:
            return Conv3DSpec.v1_causal(k, p, stride)
        return Conv3DSpec.v1_plain(k, p, stride)


# ---------------------------------------------------------------------------
# ResnetBlock3D  [models/vae_models.py:343-410]
# ---------------------------------------------------------------------------

def _resblock_specs(cfg: VAE1Config, causal: bool):
    conv1 = cfg.conv_spec(causal)
    conv2 = Conv3DSpec.spatial2d() if cfg.half_3d else conv1
    return conv1, conv2


def init_resblock(key, cfg: VAE1Config, c_in: int, c_out: int, causal: bool,
                  dtype=jnp.float32) -> dict:
    conv1_spec, conv2_spec = _resblock_specs(cfg, causal)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "norm1": norm_init(c_in, dtype),
        "conv1": conv_init(k1, conv1_spec, c_in, c_out, dtype),
        "norm2": norm_init(c_out, dtype),
        "conv2": conv_init(k2, conv2_spec, c_out, c_out, dtype),
    }
    if c_in != c_out:
        params["nin_shortcut"] = conv_init(
            k3, Conv3DSpec.pointwise(), c_in, c_out, dtype)
    return params


def apply_resblock(params: dict, x: jax.Array, cfg: VAE1Config, causal: bool,
                   *, deterministic: bool = True,
                   dropout_rng: Optional[jax.Array] = None) -> jax.Array:
    conv1_spec, conv2_spec = _resblock_specs(cfg, causal)
    h = group_norm(x, params["norm1"], num_groups=cfg.norm_num_groups, eps=NORM_EPS)
    h = silu(h)
    h = conv3d(h, params["conv1"], conv1_spec)
    h = group_norm(h, params["norm2"], num_groups=cfg.norm_num_groups, eps=NORM_EPS)
    h = silu(h)
    if cfg.dropout > 0 and not deterministic:
        keep = 1.0 - cfg.dropout
        mask = jax.random.bernoulli(dropout_rng, keep, h.shape)
        h = jnp.where(mask, h / keep, 0.0).astype(h.dtype)
    h = conv3d(h, params["conv2"], conv2_spec)
    if "nin_shortcut" in params:
        x = conv3d(x, params["nin_shortcut"], Conv3DSpec.pointwise())
    return x + h


# ---------------------------------------------------------------------------
# Attention blocks  [models/vae_models.py:427-629]
# ---------------------------------------------------------------------------

def init_attn(key, channels: int, kind: str, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 9)
    params = {
        "norm": norm_init(channels, dtype),
        "q": dense_init(keys[0], channels, channels, dtype=dtype),
        "k": dense_init(keys[1], channels, channels, dtype=dtype),
        "v": dense_init(keys[2], channels, channels, dtype=dtype),
        "proj_out": dense_init(keys[3], channels, channels, dtype=dtype),
    }
    if kind == "spatial-temporal":
        params.update({
            "norm_t": norm_init(channels, dtype),
            "q_t": dense_init(keys[4], channels, channels, dtype=dtype),
            "k_t": dense_init(keys[5], channels, channels, dtype=dtype),
            "v_t": dense_init(keys[6], channels, channels, dtype=dtype),
            "proj_out_t": dense_init(keys[7], channels, channels, dtype=dtype),
        })
    return params


def apply_attn(params: dict, x: jax.Array, kind: str, num_groups: int = 32) -> jax.Array:
    """Mid-block attention with residual.

    kind="spatial": per-frame single-head spatial attention
      [models/vae_models.py:473-537].
    kind="spatial-temporal": spatial pass then a LayerNorm/Linear temporal
      pass before the residual add [models/vae_models.py:619-629].
    """
    h = group_norm_per_frame(x, params["norm"], num_groups=num_groups,
                             eps=NORM_EPS)
    h = spatial_self_attention(h, params["q"], params["k"], params["v"])
    h = dense(h, params["proj_out"])
    if kind == "spatial-temporal":
        h = layer_norm(h, params["norm_t"], eps=1e-5)
        h = temporal_self_attention(h, params["q_t"], params["k_t"], params["v_t"])
        h = dense(h, params["proj_out_t"])
    return x + h


# ---------------------------------------------------------------------------
# Downsample3D / Upsample3D  [models/vae_models.py:198-263]
# ---------------------------------------------------------------------------

def init_downsample(key, channels: int, down_time: bool, dtype=jnp.float32) -> dict:
    spec = Conv3DSpec.v1_downsample(down_time)
    return conv_init(key, spec, channels, channels, dtype)


def apply_downsample(params: dict, x: jax.Array, down_time: bool) -> jax.Array:
    return conv3d(x, params, Conv3DSpec.v1_downsample(down_time))


def _upsample_spec(causal: bool) -> Conv3DSpec:
    # spatial (1,1) zeros; time replicate — (2,0) causal, (1,1) otherwise
    # [models/vae_models.py:222-227]
    t_pad = (2, 0) if causal else (1, 1)
    return Conv3DSpec((3, 3, 3), (1, 1, 1), (t_pad, (1, 1), (1, 1)),
                      ("edge", "zero", "zero"))


def init_upsample(key, channels: int, up_time: bool, causal: bool,
                  dtype=jnp.float32) -> dict:
    n = 2 if up_time else 1
    return conv_init(key, _upsample_spec(causal), channels, channels * n, dtype)


def apply_upsample(params: dict, x: jax.Array, up_time: bool,
                   causal: bool) -> jax.Array:
    from cvvae_tpu.ops.upsample_conv import upsample2x_conv3x3_interleave
    n = 2 if up_time else 1
    # subpixel-decomposed nearest2x+conv (2.25x fewer MACs, no 4x-area
    # intermediate) with the channel->time interleave fused into the
    # subpixel shuffle; numerics equal to the reference pipeline
    return upsample2x_conv3x3_interleave(
        x, params, n=n, t_pad=(2, 0) if causal else (1, 1),
        t_mode="edge", hw_mode="zero")


# ---------------------------------------------------------------------------
# Encoder  [models/vae_models.py:679-823]
# ---------------------------------------------------------------------------

def _encoder_channels(cfg: VAE1Config) -> Sequence[Tuple[int, int]]:
    """Per-level (block_in, block_out)."""
    in_mult = (1,) + tuple(cfg.ch_mult)
    return [(cfg.ch * in_mult[i], cfg.ch * cfg.ch_mult[i])
            for i in range(cfg.num_levels)]


def _down_time(cfg: VAE1Config, level: int) -> bool:
    return (level % 2 == 0) if cfg.half_t_mult else True


def _encoder_attn_levels(cfg: VAE1Config):
    res, flags = cfg.resolution, []
    for i in range(cfg.num_levels):
        flags.append(res in cfg.attn_resolutions)
        if i != cfg.num_levels - 1:
            res //= 2
    return flags


def _decoder_attn_levels(cfg: VAE1Config):
    res = cfg.resolution // 2 ** (cfg.num_levels - 1)
    flags = [False] * cfg.num_levels
    for i in reversed(range(cfg.num_levels)):
        flags[i] = res in cfg.attn_resolutions
        if i != 0:
            res *= 2
    return flags


def _up_time(cfg: VAE1Config, level: int) -> bool:
    return (level % 2 == 1) if cfg.half_t_mult else True


def init_encoder(key, cfg: VAE1Config, dtype=jnp.float32) -> dict:
    causal = cfg.causal_encoder
    keys = iter(jax.random.split(key, 64))
    params = {"conv_in": conv_init(next(keys), cfg.conv_spec(causal),
                                   cfg.in_channels, cfg.ch, dtype)}
    down = []
    for level, (c_in, c_out) in enumerate(_encoder_channels(cfg)):
        blocks = []
        for i in range(cfg.num_res_blocks):
            blocks.append(init_resblock(next(keys), cfg,
                                        c_in if i == 0 else c_out, c_out,
                                        causal, dtype))
        lvl = {"block": blocks}
        if _encoder_attn_levels(cfg)[level]:
            lvl["attn"] = [init_attn(next(keys), c_out, cfg.encoder_attn,
                                     dtype)
                           for _ in range(cfg.num_res_blocks)]
        if level != cfg.num_levels - 1:
            lvl["downsample"] = init_downsample(
                next(keys), c_out, _down_time(cfg, level), dtype)
        down.append(lvl)
    params["down"] = down

    c_mid = cfg.ch * cfg.ch_mult[-1]
    params["mid"] = {
        "block_1": init_resblock(next(keys), cfg, c_mid, c_mid, causal, dtype),
        "attn_1": init_attn(next(keys), c_mid, cfg.encoder_attn, dtype),
        "block_2": init_resblock(next(keys), cfg, c_mid, c_mid, causal, dtype),
    }
    z_out = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
    params["norm_out"] = norm_init(c_mid, dtype)
    params["conv_out"] = conv_init(next(keys), cfg.conv_spec(causal),
                                   c_mid, z_out, dtype)
    return params


def apply_encoder(params: dict, x: jax.Array, cfg: VAE1Config, *,
                  deterministic: bool = True,
                  dropout_rng: Optional[jax.Array] = None,
                  remat: bool = False) -> jax.Array:
    """x: (B, T, H, W, 3) -> moments (B, T', H/8, W/8, 2*z)."""
    causal = cfg.causal_encoder

    def res(p, h, rng):
        fn = lambda p_, h_: apply_resblock(p_, h_, cfg, causal,
                                           deterministic=deterministic,
                                           dropout_rng=rng)
        if remat:
            fn = jax.checkpoint(fn)
        return fn(p, h)

    def next_rng():
        nonlocal dropout_rng
        if dropout_rng is None:
            return None
        dropout_rng, sub = jax.random.split(dropout_rng)
        return sub

    h = conv3d(x, params["conv_in"], cfg.conv_spec(causal))
    for level in range(cfg.num_levels):
        lvl = params["down"][level]
        for i, blk in enumerate(lvl["block"]):
            h = res(blk, h, next_rng())
            if "attn" in lvl:
                h = apply_attn(lvl["attn"][i], h, cfg.encoder_attn,
                               cfg.norm_num_groups)
        if "downsample" in lvl:
            h = apply_downsample(lvl["downsample"], h, _down_time(cfg, level))

    mid = params["mid"]
    h = res(mid["block_1"], h, next_rng())
    h = apply_attn(mid["attn_1"], h, cfg.encoder_attn, cfg.norm_num_groups)
    h = res(mid["block_2"], h, next_rng())

    h = group_norm(h, params["norm_out"], num_groups=cfg.norm_num_groups, eps=NORM_EPS)
    h = silu(h)
    h = conv3d(h, params["conv_out"], cfg.conv_spec(causal))
    return h


# ---------------------------------------------------------------------------
# Decoder  [models/vae_models.py:826-1002]
# ---------------------------------------------------------------------------

def init_decoder(key, cfg: VAE1Config, dtype=jnp.float32) -> dict:
    causal = cfg.causal_decoder
    keys = iter(jax.random.split(key, 64))
    c_mid = cfg.ch * cfg.ch_mult[-1]
    params = {"conv_in": conv_init(next(keys), cfg.conv_spec(causal),
                                   cfg.z_channels, c_mid, dtype)}
    params["mid"] = {
        "block_1": init_resblock(next(keys), cfg, c_mid, c_mid, causal, dtype),
        "attn_1": init_attn(next(keys), c_mid, cfg.decoder_attn, dtype),
        "block_2": init_resblock(next(keys), cfg, c_mid, c_mid, causal, dtype),
    }
    up = [None] * cfg.num_levels
    block_in = c_mid
    for level in reversed(range(cfg.num_levels)):
        block_out = cfg.ch * cfg.ch_mult[level]
        blocks = []
        for i in range(cfg.num_res_blocks + 1):
            blocks.append(init_resblock(next(keys), cfg,
                                        block_in if i == 0 else block_out,
                                        block_out, causal, dtype))
        block_in = block_out
        lvl = {"block": blocks}
        if _decoder_attn_levels(cfg)[level]:
            lvl["attn"] = [init_attn(next(keys), block_out, cfg.decoder_attn,
                                     dtype)
                           for _ in range(cfg.num_res_blocks + 1)]
        if level != 0:
            lvl["upsample"] = init_upsample(next(keys), block_out,
                                            _up_time(cfg, level), causal, dtype)
        up[level] = lvl
    params["up"] = up
    params["norm_out"] = norm_init(block_in, dtype)
    params["conv_out"] = conv_init(next(keys), cfg.conv_spec(causal),
                                   block_in, cfg.out_ch, dtype)
    return params


def apply_decoder(params: dict, z: jax.Array, cfg: VAE1Config, *,
                  deterministic: bool = True,
                  dropout_rng: Optional[jax.Array] = None,
                  remat: bool = False,
                  features_only: bool = False) -> jax.Array:
    """z: (B, T', H', W', z) -> x_hat (B, 4(T'-1)+1, 8H', 8W', 3)."""
    causal = cfg.causal_decoder

    def res(p, h, rng):
        fn = lambda p_, h_: apply_resblock(p_, h_, cfg, causal,
                                           deterministic=deterministic,
                                           dropout_rng=rng)
        if remat:
            fn = jax.checkpoint(fn)
        return fn(p, h)

    def next_rng():
        nonlocal dropout_rng
        if dropout_rng is None:
            return None
        dropout_rng, sub = jax.random.split(dropout_rng)
        return sub

    h = conv3d(z, params["conv_in"], cfg.conv_spec(causal))
    mid = params["mid"]
    h = res(mid["block_1"], h, next_rng())
    h = apply_attn(mid["attn_1"], h, cfg.decoder_attn, cfg.norm_num_groups)
    h = res(mid["block_2"], h, next_rng())

    for level in reversed(range(cfg.num_levels)):
        lvl = params["up"][level]
        for i, blk in enumerate(lvl["block"]):
            h = res(blk, h, next_rng())
            if "attn" in lvl:
                h = apply_attn(lvl["attn"][i], h, cfg.decoder_attn,
                               cfg.norm_num_groups)
        if "upsample" in lvl:
            h = apply_upsample(lvl["upsample"], h, _up_time(cfg, level), causal)

    h = group_norm(h, params["norm_out"], num_groups=cfg.norm_num_groups, eps=NORM_EPS)
    h = silu(h)
    if features_only:
        return h
    h = conv3d(h, params["conv_out"], cfg.conv_spec(causal))
    return h


def apply_decoder_head(conv_out_params: dict, h: jax.Array,
                       cfg: VAE1Config) -> jax.Array:
    """The decoder's final conv alone.  Splitting it out lets the training
    engine take gradients of the NLL/GAN losses w.r.t. the last-layer
    kernel (the adaptive discriminator weight,
    discriminator_loss.py:211-220) without a second full decoder pass."""
    return conv3d(h, conv_out_params, cfg.conv_spec(cfg.causal_decoder))


def decoder_last_layer_path() -> Tuple[str, str]:
    """Pytree path of the decoder's output kernel — the reference's
    `get_last_layer` (models/vae_models.py:957), used by the adaptive
    discriminator weight."""
    return ("conv_out", "kernel")
