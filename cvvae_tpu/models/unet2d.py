"""UNet2DConditionModel (Stable Diffusion image denoiser) in JAX.

Exists to make the latent-compatibility proof *executable*: the
reference demonstrates that SD 2.1 UNet latents decode through the 3D
video VAE (pipelines/pipeline_stable_diffusion.py:118-1067,
sd21_vae3d_inference.ipynb).  This module + utils/convert.py's
``convert_unet_state_dict`` let the same demonstration run end-to-end in
JAX: convert a diffusers UNet checkpoint, plug it into
LatentDiffusionPipeline as the denoiser, decode with VideoVAE.

Architecture: the SD 2.x layout — conv_in, sinusoidal time embedding ->
2-layer MLP, CrossAttn/plain down blocks with ResnetBlock2D +
Transformer2DModel (use_linear_projection) + strided-conv downsamplers,
a mid block, skip-concat up blocks with nearest-2x upsamplers, GN/SiLU/
conv_out.  Functional params-tree style matching the converted
state-dict names; layout NHWC, kernels (1,kH,kW,I,O) as produced by the
converter (the leading 1 is squeezed at use).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


@dataclasses.dataclass(frozen=True)
class UNet2DConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    attention_head_dim: int = 64          # dim per head; heads = ch // dim
    norm_num_groups: int = 32
    #: which down blocks carry cross-attention transformers (SD 2.x:
    #: all but the last); up blocks mirror in reverse
    down_block_has_attn: Optional[Tuple[bool, ...]] = None

    def attn_flags(self) -> Tuple[bool, ...]:
        if self.down_block_has_attn is not None:
            return self.down_block_has_attn
        n = len(self.block_out_channels)
        return tuple(i < n - 1 for i in range(n))


def _conv(x, p, *, stride: int = 1, pad: int = 1):
    w = p["kernel"]
    if w.ndim == 5:
        w = w[0]
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + p["bias"].astype(x.dtype)


def _dense(x, p):
    y = jnp.einsum("...i,io->...o", x, p["kernel"].astype(x.dtype))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _group_norm(x, p, groups: int, eps: float = 1e-5):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mu = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mu) * lax.rsqrt(var + eps)
    xf = xf.reshape(b, h, w, c) * p["scale"] + p["bias"]
    return xf.astype(x.dtype)


def _layer_norm(x, p, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    xf = (xf - mu) * lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return xf.astype(x.dtype)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def timestep_embedding(t: jax.Array, dim: int) -> jax.Array:
    """diffusers get_timestep_embedding(flip_sin_to_cos=True,
    downscale_freq_shift=0): [cos | sin] halves."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=jnp.float32)
                    / half)
    args = t.astype(jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _resnet(p, x, emb, groups):
    h = _silu(_group_norm(x, p["norm1"], groups))
    h = _conv(h, p["conv1"])
    h = h + _dense(_silu(emb), p["time_emb_proj"])[:, None, None, :]
    h = _silu(_group_norm(h, p["norm2"], groups))
    h = _conv(h, p["conv2"])
    if "conv_shortcut" in p:
        x = _conv(x, p["conv_shortcut"], pad=0)
    return x + h


def _attention(p, x, ctx, head_dim):
    """diffusers Attention: to_q/k/v (no bias), multi-head, to_out."""
    q = _dense(x, p["to_q"])
    k = _dense(ctx, p["to_k"])
    v = _dense(ctx, p["to_v"])
    b, sq, c = q.shape
    heads = c // head_dim
    q = q.reshape(b, sq, heads, head_dim).transpose(0, 2, 1, 3)
    k = k.reshape(b, -1, heads, head_dim).transpose(0, 2, 1, 3)
    v = v.reshape(b, -1, heads, head_dim).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    attn = jax.nn.softmax(scores / math.sqrt(head_dim), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, sq, c)
    return _dense(o, p["to_out"])


def _transformer(p, x, context, cfg: UNet2DConfig):
    """Transformer2DModel with use_linear_projection=True (SD 2.x)."""
    b, h, w, c = x.shape
    residual = x
    y = _group_norm(x, p["norm"], cfg.norm_num_groups, eps=1e-6)
    y = y.reshape(b, h * w, c)
    y = _dense(y, p["proj_in"])
    for blk in p["transformer_blocks"]:
        y = y + _attention(blk["attn1"], _layer_norm(y, blk["norm1"]),
                           _layer_norm(y, blk["norm1"]),
                           cfg.attention_head_dim)
        y = y + _attention(blk["attn2"], _layer_norm(y, blk["norm2"]),
                           context, cfg.attention_head_dim)
        z = _layer_norm(y, blk["norm3"])
        z = _dense(z, blk["ff_proj"])          # GEGLU: (…, 8*dim)
        z, gate = jnp.split(z, 2, axis=-1)
        z = z * jax.nn.gelu(gate)
        y = y + _dense(z, blk["ff_out"])
    y = _dense(y, p["proj_out"])
    return residual + y.reshape(b, h, w, c)


def apply_unet(params: dict, x: jax.Array, t: jax.Array,
               context: jax.Array, cfg: UNet2DConfig) -> jax.Array:
    """x: (B, H, W, C_in) latents, t: scalar or (B,) timesteps,
    context: (B, S, cross_attention_dim) -> eps prediction (B,H,W,C_out).
    """
    groups = cfg.norm_num_groups
    if t.ndim == 0:
        t = jnp.broadcast_to(t, (x.shape[0],))
    emb = timestep_embedding(t, cfg.block_out_channels[0])
    emb = _dense(emb, params["time_embedding"]["linear_1"])
    emb = _dense(_silu(emb), params["time_embedding"]["linear_2"])
    emb = emb.astype(x.dtype)

    attn_flags = cfg.attn_flags()
    h = _conv(x, params["conv_in"])
    skips = [h]
    for i, block in enumerate(params["down_blocks"]):
        for j, res in enumerate(block["resnets"]):
            h = _resnet(res, h, emb, groups)
            if attn_flags[i]:
                h = _transformer(block["attentions"][j], h, context, cfg)
            skips.append(h)
        if "downsamplers" in block:
            h = _conv(h, block["downsamplers"][0], stride=2)
            skips.append(h)

    mid = params["mid_block"]
    h = _resnet(mid["resnets"][0], h, emb, groups)
    h = _transformer(mid["attentions"][0], h, context, cfg)
    h = _resnet(mid["resnets"][1], h, emb, groups)

    up_attn_flags = attn_flags[::-1]
    for i, block in enumerate(params["up_blocks"]):
        for j, res in enumerate(block["resnets"]):
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = _resnet(res, h, emb, groups)
            if up_attn_flags[i]:
                h = _transformer(block["attentions"][j], h, context, cfg)
        if "upsamplers" in block:
            b, hh, ww, c = h.shape
            h = jnp.broadcast_to(h[:, :, None, :, None, :],
                                 (b, hh, 2, ww, 2, c)).reshape(
                                     b, 2 * hh, 2 * ww, c)
            h = _conv(h, block["upsamplers"][0])

    h = _silu(_group_norm(h, params["conv_norm_out"], groups))
    return _conv(h, params["conv_out"])


def make_denoiser(params: dict, cfg: UNet2DConfig):
    """Wrap as a LatentDiffusionPipeline denoiser: (latents, t, cond)."""
    def denoiser(latents, t, cond):
        return apply_unet(params, latents, t, cond, cfg)
    return denoiser
