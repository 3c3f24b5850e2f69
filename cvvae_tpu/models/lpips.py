"""LPIPS perceptual metric (VGG16 features + learned linear heads).

JAX re-design of the reference
[lvdm/modules/autoencoding/lpips/loss/lpips.py:12-147]:

  scale input -> VGG16 relu1_2/2_2/3_3/4_3/5_3 features -> per-layer
  channel-normalise -> squared diff -> 1x1 "lin" conv -> spatial mean ->
  sum over layers.

The VGG16 weights and the lin-layer weights are *pretrained* artifacts;
the reference downloads them at first use (lpips/util.py:16-43).  This
environment has no network, so weights are loaded from a converted
checkpoint when available (``load_lpips_params``) and fall back to a
fixed random init otherwise — architecture and training plumbing are
identical either way; only the metric's calibration differs.

Video inputs (B,T,H,W,C) are scored per-frame (discriminator_loss.py:
239-244) — T folds into batch.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# VGG16 conv plan: (out_channels, pool_before) per conv layer; relu after
# every conv.  Feature taps after convs 2, 4, 7, 10, 13 (relu1_2 ... 5_3).
_VGG_PLAN: List[Tuple[int, bool]] = [
    (64, False), (64, False),
    (128, True), (128, False),
    (256, True), (256, False), (256, False),
    (512, True), (512, False), (512, False),
    (512, True), (512, False), (512, False),
]
_TAPS = (1, 3, 6, 9, 12)          # indices into the conv list (0-based)
LPIPS_CHANNELS = (64, 128, 256, 512, 512)

# ImageNet scaling (lpips.py:67-78), channels-last
_SHIFT = jnp.array([-0.030, -0.088, -0.188], jnp.float32)
_SCALE = jnp.array([0.458, 0.448, 0.450], jnp.float32)


def init_lpips(key, dtype=jnp.float32) -> dict:
    """Random-init LPIPS (placeholder until converted weights are loaded)."""
    convs = []
    c_in = 3
    for i, (c_out, _) in enumerate(_VGG_PLAN):
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, (3, 3, c_in, c_out), dtype)
        w = w * jnp.sqrt(2.0 / (9 * c_in))
        convs.append({"kernel": w, "bias": jnp.zeros((c_out,), dtype)})
        c_in = c_out
    key, sub = jax.random.split(key)
    lins = [{"kernel": jnp.abs(jax.random.normal(k, (1, 1, c, 1), dtype)) / c}
            for k, c in zip(jax.random.split(sub, 5), LPIPS_CHANNELS)]
    return {"vgg": convs, "lins": lins}


def _conv2d(x, p):
    y = lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _vgg_features(params, x):
    feats = []
    h = x
    for i, ((_, pool), p) in enumerate(zip(_VGG_PLAN, params)):
        if pool:
            h = lax.reduce_window(h, -jnp.inf, lax.max,
                                  (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        h = jax.nn.relu(_conv2d(h, p))
        if i in _TAPS:
            feats.append(h)
    return feats


def _normalize_channels(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True) + eps)
    return x / (norm + eps)


def lpips_distance(params: dict, x: jax.Array, y: jax.Array) -> jax.Array:
    """Per-sample LPIPS.  x, y: (B, H, W, 3) in [-1, 1] -> (B, 1, 1, 1).

    Video (B,T,H,W,3) inputs are folded to (B*T,H,W,3) by the caller.
    """
    xf = (x.astype(jnp.float32) - _SHIFT) / _SCALE
    yf = (y.astype(jnp.float32) - _SHIFT) / _SCALE
    fx = _vgg_features(params["vgg"], xf)
    fy = _vgg_features(params["vgg"], yf)
    total = 0.0
    for gx, gy, lin in zip(fx, fy, params["lins"]):
        d = jnp.square(_normalize_channels(gx) - _normalize_channels(gy))
        val = jnp.einsum("bhwc,xyco->bhwo", d, lin["kernel"].astype(d.dtype))
        total = total + val.mean(axis=(1, 2), keepdims=True)
    return total


def load_lpips_params(vgg_state: Dict, lin_state: Dict, dtype=jnp.float32) -> dict:
    """Convert torch state dicts: torchvision vgg16().features (keys
    '0.weight', '2.weight', ...) and the LPIPS lin heads (keys
    'lin{k}.model.1.weight')."""
    import numpy as np
    conv_indices = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    convs = []
    for idx in conv_indices:
        w = np.asarray(vgg_state[f"{idx}.weight"])  # (O, I, kh, kw)
        b = np.asarray(vgg_state[f"{idx}.bias"])
        convs.append({
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0), dtype=dtype),
            "bias": jnp.asarray(b, dtype=dtype)})
    lins = []
    for k in range(5):
        w = np.asarray(lin_state[f"lin{k}.model.1.weight"])  # (1, C, 1, 1)
        lins.append({"kernel": jnp.asarray(
            w.transpose(2, 3, 1, 0), dtype=dtype)})  # (1,1,C,1)
    return {"vgg": convs, "lins": lins}
