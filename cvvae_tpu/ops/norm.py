"""Normalisation layers (channels-last, fp32 statistics).

GroupNorm matches ``torch.nn.GroupNorm`` on 5D input: statistics are
computed per (batch, group) over (T, H, W, C/G).  The two model families
use different eps values — 1e-5 for v1 [models/vae_models.py:192-195],
1e-6 for SD3 [models/vae_blocks3d_sd3.py:449-451] — so eps is explicit.

All statistics are accumulated in float32 regardless of input dtype
(TPU-friendly: bf16 activations, fp32 norm math), and the result is cast
back to the input dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def norm_init(channels: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((channels,), dtype),
            "bias": jnp.zeros((channels,), dtype)}


def group_norm(x: jax.Array, params: dict, *, num_groups: int = 32,
               eps: float = 1e-6) -> jax.Array:
    """GroupNorm over a channels-last tensor (..., C).

    Statistics reduce over every axis except batch (axis 0), per group.
    Works for (B,T,H,W,C), (B,H,W,C) and any (B, ..., C).
    """
    c = x.shape[-1]
    if c % num_groups:
        raise ValueError(f"channels {c} not divisible by groups {num_groups}")
    cg = c // num_groups
    grouped = x.reshape(x.shape[:-1] + (num_groups, cg))
    reduce_axes = tuple(range(1, grouped.ndim - 2)) + (grouped.ndim - 1,)
    # fp32 statistics via fused converting reductions (no fp32 copy of x
    # is materialised — that costs gigabytes at level-0 resolutions)
    xf = grouped.astype(jnp.float32)
    mean = xf.mean(axis=reduce_axes, keepdims=True)
    var = jnp.square(xf).mean(axis=reduce_axes, keepdims=True) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    # fold (x - mean) * inv * scale + bias into one affine so the
    # elementwise pass stays in the input dtype
    scale = params["scale"].astype(jnp.float32).reshape(num_groups, cg)
    bias = params["bias"].astype(jnp.float32).reshape(num_groups, cg)
    a = (inv * scale).astype(x.dtype)
    b = (bias - mean * inv * scale).astype(x.dtype)
    out = grouped * a + b
    return out.reshape(x.shape)


def group_norm_per_frame(x: jax.Array, params: dict, *, num_groups: int = 32,
                         eps: float = 1e-6) -> jax.Array:
    """GroupNorm with T folded into batch: statistics per (batch, frame,
    group) over (H, W, C/G).

    This is what the reference attention blocks compute — they rearrange
    ``b c t h w -> (b t) c h w`` *before* their GroupNorm
    [models/vae_models.py:530-534, models/vae_blocks3d_sd3.py:128-131] —
    unlike the ResnetBlock norms, which see the full 5D tensor.
    """
    b, t = x.shape[0], x.shape[1]
    folded = x.reshape((b * t,) + x.shape[2:])
    out = group_norm(folded, params, num_groups=num_groups, eps=eps)
    return out.reshape(x.shape)


def layer_norm(x: jax.Array, params: dict, *, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis (torch.nn.LayerNorm semantics)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = normed * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


def batch_norm_inference(x: jax.Array, params: dict, *, eps: float = 1e-5) -> jax.Array:
    """BatchNorm (inference mode, running stats) for the 2D discriminator."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = params["mean"].astype(jnp.float32)
    var = params["var"].astype(jnp.float32)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


def batch_norm_train(x: jax.Array, params: dict, *, eps: float = 1e-5,
                     momentum: float = 0.1):
    """BatchNorm training mode: batch statistics over all axes but channel.

    Returns (y, new_running_stats).  Matches torch.nn.BatchNorm2d semantics
    (biased variance for normalisation, unbiased for the running update).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    axes = tuple(range(xf.ndim - 1))
    mean = xf.mean(axis=axes)
    var = xf.var(axis=axes)
    n = 1
    for a in axes:
        n *= xf.shape[a]
    unbiased = var * n / max(n - 1, 1)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    new_stats = {
        "mean": (1 - momentum) * params["mean"].astype(jnp.float32) + momentum * mean,
        "var": (1 - momentum) * params["var"].astype(jnp.float32) + momentum * unbiased,
    }
    return out.astype(orig_dtype), new_stats
