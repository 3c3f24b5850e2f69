"""int8 activation *residency* for the HBM-bound decoder.

The calibrated int8 mode (ops/quant.py) quantizes only *inside* each
conv call: every tensor that lives in HBM between ops — GroupNorm
inputs/outputs, conv outputs, residual streams — is still bf16.  The
decoder is bandwidth-bound at the big stages (PERF.md), so those bf16
streams are the budget.  This module keeps the activations RESIDENT in
int8 between ops, halving the inter-op HBM traffic:

* ``QTensor`` — an int8 tensor + fp32 scale.  Conv outputs carry a
  per-output-channel scale (free: the int32 accumulator is already
  dequantized per-channel); GroupNorm outputs carry the consuming
  conv's calibrated per-tensor ``scale_x`` so the conv reads them
  directly.
* ``qconv3d`` — int8 conv whose *epilogue* (per-channel dequant + bias
  + requantize by the calibrated output scale) fuses into the conv, so
  the output is written to HBM as int8, never bf16.
* ``qgroup_norm_silu`` — GroupNorm + SiLU that reads int8 (dequantizing
  per-channel in-register during the fp32 statistics reduction and the
  normalize pass) and writes int8.
* ``qadd`` — the residual add in fp32 registers, requantized by the
  block's calibrated output scale.

Scales come from the same eager calibration pass as ``scale_x``
(ops/quant.py calibration_scope): conv outputs, residual outputs, the
upsample interleave outputs and the decoder's post-mid entry tensor are
recorded per-channel and attached as ``scale_y`` / ``scale_res`` /
``scale_up`` / ``scale_entry`` leaves.

Quality: one extra symmetric-quantization noise injection per boundary
vs the conv-only int8 mode; per-channel output scales keep the noise
proportional to each channel's own range.  Gated in tests/test_quant.py
(agreement vs the bf16 path) and on bench.py before shipping.

Reference anchor: the reference serves fp16 end-to-end
(cvvae_inference_video.py:11); int8 residency is this framework's
TPU-native serving mode for the decoder's bandwidth-bound stages
(models/vae_models.py:826-1002).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from cvvae_tpu.ops.conv import Conv3DSpec, _edge_pad

_DIMENSION_NUMBERS = ("NDHWC", "DHWIO", "NDHWC")


class QTensor(NamedTuple):
    """int8 activation + fp32 scale (scalar or per-minor-channel)."""

    q: jax.Array       # int8, (..., C)
    scale: jax.Array   # f32, () or (C,)

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim


def dequant(x: QTensor, dtype=jnp.float32) -> jax.Array:
    return (x.q.astype(jnp.float32) * x.scale).astype(dtype)


def requant(xf: jax.Array, scale: jax.Array) -> QTensor:
    """fp -> int8 at ``scale`` (elementwise; fuses into the producer)."""
    q = jnp.clip(jnp.round(xf.astype(jnp.float32) / scale), -127, 127)
    return QTensor(q.astype(jnp.int8), scale)


def qconv3d(x: QTensor, params: dict, spec: Conv3DSpec, *,
            out_scale: Optional[jax.Array] = None,
            out_dtype=jnp.bfloat16):
    """int8 conv on an int8-resident activation.

    ``x.scale`` must be scalar (GroupNorm emits at the conv's calibrated
    per-tensor ``scale_x``).  With ``out_scale`` (f32[C_out]), the
    epilogue requantizes and the result stays int8-resident; without it
    the conv dequantizes to ``out_dtype`` (used at the bf16 head).
    """
    assert x.scale.ndim == 0, "qconv3d input must carry a per-tensor scale"
    xq = _edge_pad(x.q, spec.pads, spec.modes)
    lax_padding = [tuple(pad) if mode == "zero" else (0, 0)
                   for pad, mode in zip(spec.pads, spec.modes)]
    y = lax.conv_general_dilated(
        xq, params["kernel_q"], window_strides=spec.stride,
        padding=lax_padding, dimension_numbers=_DIMENSION_NUMBERS,
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (x.scale * params["scale_w"])
    bias = params.get("bias")
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if out_scale is None:
        return y.astype(out_dtype)
    return requant(y, out_scale)


def qconv3d_fold(x: QTensor, kernel_fp: jax.Array, bias, spec: Conv3DSpec, *,
                 out_scale: Optional[jax.Array] = None,
                 out_dtype=jnp.bfloat16):
    """int8 conv for an input with a PER-CHANNEL scale: the scale is
    folded into the fp kernel (w'[..,c,o] = w * s_in[c]), which is then
    per-channel requantized in-jit — kernels are tiny next to the
    activations.  Used by the nin shortcut and the upsample phase convs,
    whose inputs are residual-stream QTensors."""
    sin = x.scale
    w = kernel_fp.astype(jnp.float32)
    if sin.ndim:
        w = w * sin.reshape(1, 1, 1, -1, 1)
        s_eff = jnp.float32(1.0)
    else:
        s_eff = sin
    sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2, 3)) / 127.0, 1e-12)
    wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    xq = _edge_pad(x.q, spec.pads, spec.modes)
    lax_padding = [tuple(pad) if mode == "zero" else (0, 0)
                   for pad, mode in zip(spec.pads, spec.modes)]
    y = lax.conv_general_dilated(
        xq, wq, window_strides=spec.stride,
        padding=lax_padding, dimension_numbers=_DIMENSION_NUMBERS,
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (s_eff * sw)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if out_scale is None:
        return y.astype(out_dtype)
    return requant(y, out_scale)


def qgroup_norm_silu(x: QTensor, params: dict, *, num_groups: int,
                     eps: float,
                     out_scale: Optional[jax.Array] = None,
                     out_dtype=jnp.bfloat16):
    """GroupNorm + SiLU reading an int8-resident tensor.

    Statistics: fp32 converting reduction over the int8 values with the
    per-channel dequant applied in-register (one int8 read).  Normalize
    pass: second int8 read, affine + SiLU in fp32 registers, requantized
    to ``out_scale`` (the consuming conv's calibrated per-tensor
    scale_x) — int8 in, int8 out, 3 bytes/elem total vs 6 in bf16.
    """
    q, s = x.q, x.scale
    c = q.shape[-1]
    if c % num_groups:
        raise ValueError(f"channels {c} not divisible by groups {num_groups}")
    cg = c // num_groups
    grouped = q.reshape(q.shape[:-1] + (num_groups, cg))
    s_g = (jnp.broadcast_to(s.astype(jnp.float32), (c,)).reshape(num_groups, cg)
           if s.ndim else s.astype(jnp.float32))
    reduce_axes = tuple(range(1, grouped.ndim - 2)) + (grouped.ndim - 1,)
    xf = grouped.astype(jnp.float32) * s_g
    mean = xf.mean(axis=reduce_axes, keepdims=True)
    var = jnp.square(xf).mean(axis=reduce_axes, keepdims=True) - jnp.square(mean)
    inv = lax.rsqrt(var + eps)
    scale = params["scale"].astype(jnp.float32).reshape(num_groups, cg)
    bias = params["bias"].astype(jnp.float32).reshape(num_groups, cg)
    a = inv * scale * s_g          # folds the dequant into the affine
    b = bias - mean * inv * scale
    h = grouped.astype(jnp.float32) * a + b
    h = h * jax.nn.sigmoid(h)      # SiLU in fp32 registers
    h = h.reshape(q.shape)
    if out_scale is None:
        return h.astype(out_dtype)
    return requant(h, out_scale)


def qadd(x: QTensor, h: QTensor, out_scale: jax.Array) -> QTensor:
    """Residual add in fp32 registers, requantized per-channel."""
    xf = x.q.astype(jnp.float32) * x.scale
    hf = h.q.astype(jnp.float32) * h.scale
    return requant(xf + hf, out_scale)
