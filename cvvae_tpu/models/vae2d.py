"""2D image-VAE nets applied per-frame — the *compatibility anchors*.

The latent-constraint training recipe decodes the video latents with a
frozen 2D image-VAE decoder (SD3 or SD2.1) so the learned latent space
stays aligned with the image models.  The reference wraps stock 2D nets
with "fold T into batch" shims:

* SD3 family  — ``DecoderWith3DWrapper`` / diffusers-style ``Decoder`` /
  ``Encoder`` [lvdm/modules/diffusionmodules/vae_models_sd3.py:50-398,
  vae_blocks_sd3.py:14-781], GroupNorm eps 1e-6, diffusers param names.
* SD2.1 family — ``DecoderWith3DWrapper`` / ``EncoderWith3DWrapper``
  around the stock SD ``Decoder``/``Encoder``
  [lvdm/modules/diffusionmodules/model.py:491-887], v1-style param
  names, optional legacy 1x1 ``post_quant_conv`` / ``quant_conv``
  [model.py:806-809,873-876], GroupNorm eps 1e-6 [model.py:52-55].

TPU-native design: instead of folding T into batch we keep 5D tensors
and use (1, k, k) kernels — mathematically identical per-frame 2D convs,
zero reshapes, and XLA fuses across frames.  GroupNorm/attention are
explicitly per-frame.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from cvvae_tpu.ops.activations import silu
from cvvae_tpu.ops.attention import dense, dense_init, spatial_self_attention
from cvvae_tpu.ops.conv import Conv3DSpec, conv3d, conv_init
from cvvae_tpu.ops.norm import group_norm_per_frame, norm_init
from cvvae_tpu.ops.resample import nearest_upsample_2x_spatial

NORM_EPS = 1e-6

_CONV = Conv3DSpec.spatial2d()            # (1,3,3) zero pad 1
_POINT = Conv3DSpec.pointwise()
# Downsample2D(padding=0) + F.pad (0,1,0,1): asym zero pad, k3 s2
# [vae_blocks_sd3.py:77-79, model.py 2D Downsample]
_DOWN = Conv3DSpec((1, 3, 3), (1, 2, 2), ((0, 0), (0, 1), (0, 1)),
                   ("zero", "zero", "zero"))


@dataclasses.dataclass(frozen=True)
class VAE2DConfig:
    naming: str = "sd3"                 # "sd3" (diffusers) | "sd21" (v1-style)
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    double_z: bool = True
    mid_block_add_attention: bool = True
    legacy_quant_conv: bool = False     # SD2.1 wrapper's 1x1 quant convs

    @property
    def num_levels(self) -> int:
        return len(self.block_out_channels)


# --------------------------- shared blocks ---------------------------------

def _shortcut_name(cfg: VAE2DConfig) -> str:
    return "conv_shortcut" if cfg.naming == "sd3" else "nin_shortcut"


def init_resblock2d(key, cfg: VAE2DConfig, c_in: int, c_out: int,
                    dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"norm1": norm_init(c_in, dtype),
         "conv1": conv_init(k1, _CONV, c_in, c_out, dtype),
         "norm2": norm_init(c_out, dtype),
         "conv2": conv_init(k2, _CONV, c_out, c_out, dtype)}
    if c_in != c_out:
        p[_shortcut_name(cfg)] = conv_init(k3, _POINT, c_in, c_out, dtype)
    return p


def apply_resblock2d(params: dict, x: jax.Array, cfg: VAE2DConfig) -> jax.Array:
    h = group_norm_per_frame(x, params["norm1"],
                             num_groups=cfg.norm_num_groups, eps=NORM_EPS)
    h = silu(h)
    h = conv3d(h, params["conv1"], _CONV)
    h = group_norm_per_frame(h, params["norm2"],
                             num_groups=cfg.norm_num_groups, eps=NORM_EPS)
    h = silu(h)
    h = conv3d(h, params["conv2"], _CONV)
    sc = _shortcut_name(cfg)
    if sc in params:
        x = conv3d(x, params[sc], _POINT)
    return x + h


def init_attn2d(key, cfg: VAE2DConfig, channels: int, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 4)
    if cfg.naming == "sd3":
        names = ("group_norm", "to_q", "to_k", "to_v", "to_out")
    else:
        names = ("norm", "q", "k", "v", "proj_out")
    p = {names[0]: norm_init(channels, dtype)}
    for n, k in zip(names[1:], keys):
        p[n] = dense_init(k, channels, channels, dtype=dtype)
    return p


def apply_attn2d(params: dict, x: jax.Array, cfg: VAE2DConfig) -> jax.Array:
    if cfg.naming == "sd3":
        nrm, q, k, v, o = "group_norm", "to_q", "to_k", "to_v", "to_out"
    else:
        nrm, q, k, v, o = "norm", "q", "k", "v", "proj_out"
    h = group_norm_per_frame(x, params[nrm], num_groups=cfg.norm_num_groups,
                             eps=NORM_EPS)
    h = spatial_self_attention(h, params[q], params[k], params[v])
    h = dense(h, params[o])
    return x + h


def apply_upsample2d(params: dict, x: jax.Array) -> jax.Array:
    x = nearest_upsample_2x_spatial(x)
    return conv3d(x, params, _CONV)


# --------------------------- decoder ----------------------------------------

def init_decoder2d(key, cfg: VAE2DConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 64))
    rev = tuple(reversed(cfg.block_out_channels))
    c_mid = rev[0]
    params = {}
    if cfg.naming == "sd21" and cfg.legacy_quant_conv:
        params["post_quant_conv"] = conv_init(
            next(keys), _POINT, cfg.latent_channels, cfg.latent_channels, dtype)
    params["conv_in"] = conv_init(next(keys), _CONV, cfg.latent_channels,
                                  c_mid, dtype)
    mid_res = [init_resblock2d(next(keys), cfg, c_mid, c_mid, dtype),
               init_resblock2d(next(keys), cfg, c_mid, c_mid, dtype)]
    mid_attn = (init_attn2d(next(keys), cfg, c_mid, dtype)
                if cfg.mid_block_add_attention else None)

    levels = []
    c_prev = c_mid
    for i in range(cfg.num_levels):
        c_out = rev[i]
        resnets = [init_resblock2d(next(keys), cfg,
                                   c_prev if j == 0 else c_out, c_out, dtype)
                   for j in range(cfg.layers_per_block + 1)]
        lvl = {"resnets": resnets}
        if i != cfg.num_levels - 1:
            lvl["upsample"] = conv_init(next(keys), _CONV, c_out, c_out, dtype)
        levels.append(lvl)
        c_prev = c_out

    if cfg.naming == "sd3":
        params["mid_block"] = {"resnets": mid_res}
        if mid_attn is not None:
            params["mid_block"]["attentions"] = [mid_attn]
        params["up_blocks"] = [
            {"resnets": lvl["resnets"],
             **({"upsamplers": [lvl["upsample"]]} if "upsample" in lvl else {})}
            for lvl in levels]
        params["conv_norm_out"] = norm_init(rev[-1], dtype)
    else:
        params["mid"] = {"block_1": mid_res[0], "block_2": mid_res[1]}
        if mid_attn is not None:
            params["mid"]["attn_1"] = mid_attn
        # v1 naming: up[level] with level 0 = highest res (insert(0, ...))
        params["up"] = [
            {"block": lvl["resnets"],
             **({"upsample": lvl["upsample"]} if "upsample" in lvl else {})}
            for lvl in reversed(levels)]
        params["norm_out"] = norm_init(rev[-1], dtype)
    params["conv_out"] = conv_init(next(keys), _CONV, rev[-1],
                                   cfg.out_channels, dtype)
    return params


def apply_decoder2d(params: dict, z: jax.Array, cfg: VAE2DConfig) -> jax.Array:
    """z: (B, T, H', W', latent) -> per-frame decode (B, T, 8H', 8W', 3)."""
    if "post_quant_conv" in params:
        z = conv3d(z, params["post_quant_conv"], _POINT)
    h = conv3d(z, params["conv_in"], _CONV)

    if cfg.naming == "sd3":
        mid = params["mid_block"]
        mid_res = mid["resnets"]
        mid_attn = mid.get("attentions", [None])[0]
        levels = params["up_blocks"]
        res_key, up_key = "resnets", "upsamplers"
        norm_out = params["conv_norm_out"]
    else:
        mid = params["mid"]
        mid_res = [mid["block_1"], mid["block_2"]]
        mid_attn = mid.get("attn_1")
        levels = list(reversed(params["up"]))
        res_key, up_key = "block", "upsample"
        norm_out = params["norm_out"]

    h = apply_resblock2d(mid_res[0], h, cfg)
    if mid_attn is not None:
        h = apply_attn2d(mid_attn, h, cfg)
    h = apply_resblock2d(mid_res[1], h, cfg)

    for lvl in levels:
        for r in lvl[res_key]:
            h = apply_resblock2d(r, h, cfg)
        if up_key in lvl:
            up = lvl[up_key][0] if cfg.naming == "sd3" else lvl[up_key]
            h = apply_upsample2d(up, h)

    h = group_norm_per_frame(h, norm_out, num_groups=cfg.norm_num_groups,
                             eps=NORM_EPS)
    h = silu(h)
    return conv3d(h, params["conv_out"], _CONV)


# --------------------------- encoder ----------------------------------------

def init_encoder2d(key, cfg: VAE2DConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 64))
    chans = cfg.block_out_channels
    params = {"conv_in": conv_init(next(keys), _CONV, cfg.in_channels,
                                   chans[0], dtype)}
    levels = []
    c_prev = chans[0]
    for i in range(cfg.num_levels):
        c_out = chans[i]
        resnets = [init_resblock2d(next(keys), cfg,
                                   c_prev if j == 0 else c_out, c_out, dtype)
                   for j in range(cfg.layers_per_block)]
        lvl = {"resnets": resnets}
        if i != cfg.num_levels - 1:
            lvl["downsample"] = conv_init(next(keys), _DOWN, c_out, c_out, dtype)
        levels.append(lvl)
        c_prev = c_out

    c_mid = chans[-1]
    mid_res = [init_resblock2d(next(keys), cfg, c_mid, c_mid, dtype),
               init_resblock2d(next(keys), cfg, c_mid, c_mid, dtype)]
    mid_attn = (init_attn2d(next(keys), cfg, c_mid, dtype)
                if cfg.mid_block_add_attention else None)

    z_out = 2 * cfg.latent_channels if cfg.double_z else cfg.latent_channels
    if cfg.naming == "sd3":
        params["down_blocks"] = [
            {"resnets": lvl["resnets"],
             **({"downsamplers": [lvl["downsample"]]}
                if "downsample" in lvl else {})} for lvl in levels]
        params["mid_block"] = {"resnets": mid_res}
        if mid_attn is not None:
            params["mid_block"]["attentions"] = [mid_attn]
        params["conv_norm_out"] = norm_init(c_mid, dtype)
    else:
        params["down"] = [
            {"block": lvl["resnets"],
             **({"downsample": lvl["downsample"]} if "downsample" in lvl else {})}
            for lvl in levels]
        params["mid"] = {"block_1": mid_res[0], "block_2": mid_res[1]}
        if mid_attn is not None:
            params["mid"]["attn_1"] = mid_attn
        params["norm_out"] = norm_init(c_mid, dtype)
    params["conv_out"] = conv_init(next(keys), _CONV, c_mid, z_out, dtype)
    if cfg.naming == "sd21" and cfg.legacy_quant_conv:
        params["quant_conv"] = conv_init(next(keys), _POINT, z_out, z_out, dtype)
    return params


def apply_encoder2d(params: dict, x: jax.Array, cfg: VAE2DConfig) -> jax.Array:
    """x: (B, T, H, W, 3) -> per-frame moments (B, T, H/8, W/8, 2*latent)."""
    h = conv3d(x, params["conv_in"], _CONV)
    if cfg.naming == "sd3":
        levels = params["down_blocks"]
        res_key, down_key = "resnets", "downsamplers"
        mid = params["mid_block"]
        mid_res = mid["resnets"]
        mid_attn = mid.get("attentions", [None])[0]
        norm_out = params["conv_norm_out"]
    else:
        levels = params["down"]
        res_key, down_key = "block", "downsample"
        mid = params["mid"]
        mid_res = [mid["block_1"], mid["block_2"]]
        mid_attn = mid.get("attn_1")
        norm_out = params["norm_out"]

    for lvl in levels:
        for r in lvl[res_key]:
            h = apply_resblock2d(r, h, cfg)
        if down_key in lvl:
            d = lvl[down_key][0] if cfg.naming == "sd3" else lvl[down_key]
            h = conv3d(h, d, _DOWN)

    h = apply_resblock2d(mid_res[0], h, cfg)
    if mid_attn is not None:
        h = apply_attn2d(mid_attn, h, cfg)
    h = apply_resblock2d(mid_res[1], h, cfg)

    h = group_norm_per_frame(h, norm_out, num_groups=cfg.norm_num_groups,
                             eps=NORM_EPS)
    h = silu(h)
    h = conv3d(h, params["conv_out"], _CONV)
    if "quant_conv" in params:
        h = conv3d(h, params["quant_conv"], _POINT)
    return h
