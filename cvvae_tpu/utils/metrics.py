"""Reconstruction quality metrics (PSNR / SSIM) for eval and benchmarks.

The reference reports PSNR/SSIM/LPIPS in the paper; the repo itself only
eyeballs reconstructions (SURVEY §4).  These are the standard
definitions on [-1, 1]-scaled video tensors (channels-last), reduced
per-sample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(x: jax.Array, y: jax.Array, data_range: float = 2.0) -> jax.Array:
    """Per-sample PSNR (dB).  x, y: (B, ...) same shape."""
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    axes = tuple(range(1, xf.ndim))
    mse = jnp.mean(jnp.square(xf - yf), axis=axes)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    r = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    g = jnp.exp(-0.5 * (r / sigma) ** 2)
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(x: jax.Array, y: jax.Array, data_range: float = 2.0,
         k1: float = 0.01, k2: float = 0.03) -> jax.Array:
    """Per-sample mean SSIM over frames/channels.

    x, y: (B, T, H, W, C) or (B, H, W, C) in [-1, 1]; 11x11 Gaussian
    window, standard Wang et al. constants.
    """
    if x.ndim == 4:
        x = x[:, None]
        y = y[:, None]
    b, t, h, w, c = x.shape
    xf = x.astype(jnp.float32).transpose(0, 1, 4, 2, 3).reshape(-1, h, w, 1)
    yf = y.astype(jnp.float32).transpose(0, 1, 4, 2, 3).reshape(-1, h, w, 1)
    win = _gaussian_kernel()[:, :, None, None]

    def filt(v):
        return jax.lax.conv_general_dilated(
            v, win, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    mu_x, mu_y = filt(xf), filt(yf)
    sxx = filt(xf * xf) - mu_x * mu_x
    syy = filt(yf * yf) - mu_y * mu_y
    sxy = filt(xf * yf) - mu_x * mu_y
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    ssim_map = ((2 * mu_x * mu_y + c1) * (2 * sxy + c2)) / (
        (mu_x ** 2 + mu_y ** 2 + c1) * (sxx + syy + c2))
    per_image = ssim_map.mean(axis=(1, 2, 3))
    return per_image.reshape(b, t * c).mean(axis=1)


def reconstruction_report(x: jax.Array, x_rec: jax.Array) -> dict:
    return {
        "psnr_db": float(jnp.mean(psnr(x, x_rec))),
        "ssim": float(jnp.mean(ssim(x, x_rec))),
        "l1": float(jnp.mean(jnp.abs(x.astype(jnp.float32)
                                     - x_rec.astype(jnp.float32)))),
    }
