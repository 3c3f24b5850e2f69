"""CV-VAE SD3 encoder & decoder (SD3/SD3.5-compatible, 16ch latents).

Functional JAX re-design of the reference's diffusers-style nets
[models/vae_models3d_sd3.py:55-392] and blocks
[models/vae_blocks3d_sd3.py].  Differences from the v1 family:

* All convs use *replicate* (edge) padding — symmetric for the
  non-causal decoder, past-only in time for the causal encoder
  [models/vae_blocks3d_sd3.py:16-104].
* GroupNorm eps is 1e-6.
* Down/upsample convs take symmetric padding=1 (not the v1 asymmetric
  zero pad) [models/vae_blocks3d_sd3.py:150-364].
* Residual shortcut is always a per-frame 1x1 2D conv
  [models/vae_blocks3d_sd3.py:506-515].
* Mid-block attention is per-frame single-head with Linear q/k/v and a
  GroupNorm pre-norm (diffusers Attention with residual_connection=True)
  [models/vae_blocks3d_sd3.py:806-822].

Shipped config: block_out_channels (128,256,512,512), layers_per_block 2,
causal_encoder=True, causal_decoder=False, half_3d=True
[models/modeling_vae.py:347-381].
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cvvae_tpu.ops.activations import silu
from cvvae_tpu.ops.attention import dense, dense_init, spatial_self_attention
from cvvae_tpu.ops.conv import Conv3DSpec, conv3d, conv_init
from cvvae_tpu.ops.norm import group_norm, group_norm_per_frame, norm_init
from cvvae_tpu.ops.resample import temporal_interleave

NORM_EPS = 1e-6


@dataclasses.dataclass(frozen=True)
class VAESD3Config:
    in_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    double_z: bool = True
    mid_block_add_attention: bool = True
    causal_encoder: bool = True
    causal_decoder: bool = False
    half_3d: bool = True
    dropout: float = 0.0

    @property
    def num_levels(self) -> int:
        return len(self.block_out_channels)

    def conv_spec(self, causal: bool, k: int = 3, p: int = 1,
                  stride=(1, 1, 1)) -> Conv3DSpec:
        if causal:
            return Conv3DSpec.sd3_causal(k, p, stride)
        return Conv3DSpec.sd3_plain(k, p, stride)


# ---------------------------------------------------------------------------
# ResnetBlock3D  [models/vae_blocks3d_sd3.py:367-569]
# ---------------------------------------------------------------------------

def _resblock_specs(cfg: VAESD3Config, causal: bool):
    conv1 = cfg.conv_spec(causal)
    conv2 = Conv3DSpec.spatial2d() if cfg.half_3d else conv1
    return conv1, conv2


def init_resblock(key, cfg: VAESD3Config, c_in: int, c_out: int, causal: bool,
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
        params["conv_shortcut"] = conv_init(
            k3, Conv3DSpec.pointwise(), c_in, c_out, dtype)
    return params


def apply_resblock(params: dict, x: jax.Array, cfg: VAESD3Config, causal: bool,
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
    if "conv_shortcut" in params:
        x = conv3d(x, params["conv_shortcut"], Conv3DSpec.pointwise())
    return x + h


# ---------------------------------------------------------------------------
# Mid-block attention  [models/vae_blocks3d_sd3.py:119-147,803-822]
# ---------------------------------------------------------------------------

def init_attention(key, channels: int, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 4)
    return {
        "group_norm": norm_init(channels, dtype),
        "to_q": dense_init(keys[0], channels, channels, dtype=dtype),
        "to_k": dense_init(keys[1], channels, channels, dtype=dtype),
        "to_v": dense_init(keys[2], channels, channels, dtype=dtype),
        "to_out": dense_init(keys[3], channels, channels, dtype=dtype),
    }


def apply_attention(params: dict, x: jax.Array, cfg: VAESD3Config) -> jax.Array:
    """Per-frame single-head self-attention with residual.

    Matches diffusers Attention(heads=1, dim_head=C, residual_connection=
    True, group_norm(32, eps=1e-6)), applied frame-by-frame on 5D input.
    """
    h = group_norm_per_frame(x, params["group_norm"],
                             num_groups=cfg.norm_num_groups, eps=NORM_EPS)
    h = spatial_self_attention(h, params["to_q"], params["to_k"], params["to_v"])
    h = dense(h, params["to_out"])
    return x + h


# ---------------------------------------------------------------------------
# Down/Up sampling  [models/vae_blocks3d_sd3.py:150-364]
# ---------------------------------------------------------------------------

def _downsample_spec(cfg: VAESD3Config, causal: bool, down_time: bool) -> Conv3DSpec:
    stride = (2, 2, 2) if down_time else (1, 2, 2)
    return cfg.conv_spec(causal, stride=stride)


def _upsample_spec(cfg: VAESD3Config, causal: bool) -> Conv3DSpec:
    return cfg.conv_spec(causal)


def apply_upsample(params: dict, x: jax.Array, cfg: VAESD3Config,
                   causal: bool, up_time: bool) -> jax.Array:
    from cvvae_tpu.ops.upsample_conv import upsample2x_conv3x3_interleave
    n = 2 if up_time else 1
    return upsample2x_conv3x3_interleave(
        x, params, n=n, t_pad=(2, 0) if causal else (1, 1),
        t_mode="edge", hw_mode="edge")


# ---------------------------------------------------------------------------
# Encoder3D  [models/vae_models3d_sd3.py:55-208]
# ---------------------------------------------------------------------------

def _encoder_down_time(cfg: VAESD3Config, i: int) -> bool:
    # [models/vae_models3d_sd3.py:115]
    return (i % 2 == 0) and (i != cfg.num_levels - 1)


def _decoder_up_time(cfg: VAESD3Config, i: int) -> bool:
    # i indexes up_blocks in reversed-channel order
    # [models/vae_models3d_sd3.py:289]
    return (i % 2 == 0) and (i != cfg.num_levels - 1)


def init_encoder(key, cfg: VAESD3Config, dtype=jnp.float32) -> dict:
    causal = cfg.causal_encoder
    keys = iter(jax.random.split(key, 64))
    chans = cfg.block_out_channels
    params = {"conv_in": conv_init(next(keys), cfg.conv_spec(causal),
                                   cfg.in_channels, chans[0], dtype)}
    blocks = []
    c_prev = chans[0]
    for i in range(cfg.num_levels):
        c_out = chans[i]
        resnets = []
        for j in range(cfg.layers_per_block):
            resnets.append(init_resblock(next(keys), cfg,
                                         c_prev if j == 0 else c_out, c_out,
                                         causal, dtype))
        blk = {"resnets": resnets}
        if i != cfg.num_levels - 1:
            spec = _downsample_spec(cfg, causal, _encoder_down_time(cfg, i))
            blk["downsamplers"] = [conv_init(next(keys), spec, c_out, c_out, dtype)]
        blocks.append(blk)
        c_prev = c_out
    params["down_blocks"] = blocks

    c_mid = chans[-1]
    mid = {"resnets": [init_resblock(next(keys), cfg, c_mid, c_mid, causal, dtype),
                       init_resblock(next(keys), cfg, c_mid, c_mid, causal, dtype)]}
    if cfg.mid_block_add_attention:
        mid["attentions"] = [init_attention(next(keys), c_mid, dtype)]
    params["mid_block"] = mid

    z_out = 2 * cfg.latent_channels if cfg.double_z else cfg.latent_channels
    params["conv_norm_out"] = norm_init(c_mid, dtype)
    params["conv_out"] = conv_init(next(keys), cfg.conv_spec(causal),
                                   c_mid, z_out, dtype)
    return params


def apply_encoder(params: dict, x: jax.Array, cfg: VAESD3Config, *,
                  deterministic: bool = True,
                  dropout_rng: Optional[jax.Array] = None,
                  remat: bool = False) -> jax.Array:
    """x: (B, T, H, W, 3) -> moments (B, T', H/8, W/8, 2*latent)."""
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
    for i, blk in enumerate(params["down_blocks"]):
        for r in blk["resnets"]:
            h = res(r, h, next_rng())
        if "downsamplers" in blk:
            spec = _downsample_spec(cfg, causal, _encoder_down_time(cfg, i))
            h = conv3d(h, blk["downsamplers"][0], spec)

    mid = params["mid_block"]
    h = res(mid["resnets"][0], h, next_rng())
    if "attentions" in mid:
        h = apply_attention(mid["attentions"][0], h, cfg)
    h = res(mid["resnets"][1], h, next_rng())

    h = group_norm(h, params["conv_norm_out"], num_groups=cfg.norm_num_groups,
                   eps=NORM_EPS)
    h = silu(h)
    h = conv3d(h, params["conv_out"], cfg.conv_spec(causal))
    return h


# ---------------------------------------------------------------------------
# Decoder3D  [models/vae_models3d_sd3.py:211-392]
# ---------------------------------------------------------------------------

def init_decoder(key, cfg: VAESD3Config, dtype=jnp.float32) -> dict:
    causal = cfg.causal_decoder
    keys = iter(jax.random.split(key, 64))
    rev = tuple(reversed(cfg.block_out_channels))
    c_mid = rev[0]
    params = {"conv_in": conv_init(next(keys), cfg.conv_spec(causal),
                                   cfg.latent_channels, c_mid, dtype)}
    mid = {"resnets": [init_resblock(next(keys), cfg, c_mid, c_mid, causal, dtype),
                       init_resblock(next(keys), cfg, c_mid, c_mid, causal, dtype)]}
    if cfg.mid_block_add_attention:
        mid["attentions"] = [init_attention(next(keys), c_mid, dtype)]
    params["mid_block"] = mid

    blocks = []
    c_prev = c_mid
    for i in range(cfg.num_levels):
        c_out = rev[i]
        resnets = []
        for j in range(cfg.layers_per_block + 1):
            resnets.append(init_resblock(next(keys), cfg,
                                         c_prev if j == 0 else c_out, c_out,
                                         causal, dtype))
        blk = {"resnets": resnets}
        if i != cfg.num_levels - 1:
            n = 2 if _decoder_up_time(cfg, i) else 1
            blk["upsamplers"] = [conv_init(next(keys), _upsample_spec(cfg, causal),
                                           c_out, c_out * n, dtype)]
        blocks.append(blk)
        c_prev = c_out
    params["up_blocks"] = blocks

    params["conv_norm_out"] = norm_init(rev[-1], dtype)
    params["conv_out"] = conv_init(next(keys), cfg.conv_spec(causal),
                                   rev[-1], cfg.in_channels, dtype)
    return params


def apply_decoder(params: dict, z: jax.Array, cfg: VAESD3Config, *,
                  deterministic: bool = True,
                  dropout_rng: Optional[jax.Array] = None,
                  remat: bool = False,
                  features_only: bool = False) -> jax.Array:
    """z: (B, T', H', W', latent) -> x_hat (B, 4(T'-1)+1, 8H', 8W', 3)."""
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
    mid = params["mid_block"]
    h = res(mid["resnets"][0], h, next_rng())
    if "attentions" in mid:
        h = apply_attention(mid["attentions"][0], h, cfg)
    h = res(mid["resnets"][1], h, next_rng())

    for i, blk in enumerate(params["up_blocks"]):
        for r in blk["resnets"]:
            h = res(r, h, next_rng())
        if "upsamplers" in blk:
            h = apply_upsample(blk["upsamplers"][0], h, cfg, causal,
                               _decoder_up_time(cfg, i))

    h = group_norm(h, params["conv_norm_out"], num_groups=cfg.norm_num_groups,
                   eps=NORM_EPS)
    h = silu(h)
    if features_only:
        return h
    h = conv3d(h, params["conv_out"], cfg.conv_spec(causal))
    return h


def apply_decoder_head(conv_out_params: dict, h: jax.Array,
                       cfg: VAESD3Config) -> jax.Array:
    """Final decoder conv alone — see vae_v1.apply_decoder_head."""
    return conv3d(h, conv_out_params, cfg.conv_spec(cfg.causal_decoder))


def decoder_last_layer_path() -> Tuple[str, str]:
    """Pytree path of the decoder output kernel (= reference
    `Decoder3D.get_last_layer`, models/vae_models3d_sd3.py:390-391)."""
    return ("conv_out", "kernel")
