"""Spatial/temporal up/down-sampling helpers (channels-last)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nearest_upsample_2x_spatial(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2x upsample of H and W on (B,T,H,W,C).

    Matches F.interpolate(scale_factor=(1,2,2), mode="nearest")
    [models/vae_models.py:218-220].
    """
    b, t, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None, :], (b, t, h, 2, w, 2, c))
    return x.reshape(b, t, 2 * h, 2 * w, c)


def temporal_interleave(x: jax.Array, n: int, drop_first: bool = True) -> jax.Array:
    """Channel-split temporal x{n} upsample.

    The conv before this produced n*C channels ordered as torch's
    ``(n c)`` grouping; this interleaves them into time:
    ``b t h w (n c) -> b (t n) h w c`` then drops the first frame so that
    T_out = n*T - 1.  Ref: models/vae_models.py:230-232,
    models/vae_blocks3d_sd3.py:358-362.
    """
    if n == 1:
        return x
    b, t, h, w, nc = x.shape
    c = nc // n
    x = x.reshape(b, t, h, w, n, c)
    x = jnp.moveaxis(x, 4, 2)          # b t n h w c
    x = x.reshape(b, t * n, h, w, c)
    if drop_first:
        x = x[:, 1:]
    return x


def avg_pool3d(x: jax.Array, window, stride) -> jax.Array:
    """Average pooling on (B,T,H,W,C), VALID padding (torch default)."""
    if isinstance(window, int):
        window = (window,) * 3
    if isinstance(stride, int):
        stride = (stride,) * 3
    dims = (1,) + tuple(window) + (1,)
    strides = (1,) + tuple(stride) + (1,)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, "VALID")
    count = window[0] * window[1] * window[2]
    return summed / count
