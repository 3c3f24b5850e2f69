"""int8 quantized inference for the conv stack.

TPU v5e runs int8 on the MXU at ~2x the bf16 rate (measured on the hot
conv shape: 149 TOP/s with (de)quant epilogues vs 91 TFLOP/s bf16 for
the identical chain).  The scheme — standard for post-training conv
quantization:

* weights: symmetric per-output-channel int8
  (``scale_w[o] = max|w[..., o]| / 127``), computed offline by
  :func:`quantize_conv_params`;
* activations: symmetric per-tensor *dynamic* int8 — the scale is
  ``max|x| / 127`` computed in-graph right before the conv, so no
  calibration dataset is needed;
* accumulation in int32 on the MXU, dequantised by
  ``scale_x * scale_w[o]``, bias added in fp32, output cast back to the
  activation dtype.  GroupNorm/SiLU/attention/up-down-sampling all stay
  in bf16/fp32 — only the big conv matmuls change.

Which convs quantize: 3D convs with ``C_in >= min_cin`` (default 64).
Small-Cin stems and the final RGB head stay bf16 — they are a rounding
error of the FLOPs but carry most of the quantization-noise
sensitivity.

Quality gate: tests/test_quant.py checks the int8 encode/decode
roundtrip against the bf16 path (>= 35 dB agreement on random nets;
real-checkpoint PSNR budgets documented in PERF.md).

Reference anchor: the reference serves in fp16 (cvvae_inference_video
.py:11); int8 is this framework's TPU-native serving mode, quality-
gated against the bf16 path.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cvvae_tpu.ops.conv import Conv3DSpec, _edge_pad

_DIMENSION_NUMBERS = ("NDHWC", "DHWIO", "NDHWC")

#: T*H*W below which an int8 conv call falls back to dequantized bf16
#: (XLA's int8 conv is ~2.5x slower than bf16 under ~5x64x64 on v5e;
#: crossover measured at ~5x64x64, comfortably int8-favourable by 90x90)
INT8_MIN_POSITIONS = 5 * 64 * 64


def quantize_kernel(kernel: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(kT,kH,kW,I,O) fp -> (int8 kernel, fp32 per-O scale)."""
    w = kernel.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=(0, 1, 2, 3)) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def dequantize_kernel(params: dict) -> jax.Array:
    """Inverse of quantize_kernel (fp32)."""
    return params["kernel_q"].astype(jnp.float32) * params["scale_w"]


def quantize_act(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Dynamic symmetric per-tensor int8: (int8 x, fp32 scale)."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def quantize_act_static(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Symmetric int8 with a calibrated scale: a pure elementwise op
    (no max reduction), so XLA fuses it into the producing kernel."""
    xq = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(xq, -127, 127).astype(jnp.int8)


# ---------------------------------------------------------------------------
# activation-scale calibration
#
# Dynamic per-tensor quantization costs a full-tensor max REDUCTION plus
# a separate quantize pass per conv — an O(T*H*W*C) HBM tax that cancels
# most of the int8 MXU gain exactly where the FLOPs are biggest
# (measured: enc_level0 at a 720px tile gains 4 ms of an expected ~60).
# Calibration replaces it with a static per-conv scale recorded from a
# representative input, making quantization a fusable elementwise op.
# ---------------------------------------------------------------------------

_CALIB: Optional[dict] = None


@contextlib.contextmanager
def calibration_scope():
    """Record per-conv activation maxima into the yielded dict.

    Model applies inside the scope must run EAGERLY (not under jit) —
    recording keys off the identity of each conv's params dict, which
    tracing would hide.  Use :func:`attach_activation_scales` afterwards.
    """
    global _CALIB
    prev = _CALIB
    _CALIB = {}
    try:
        yield _CALIB
    finally:
        _CALIB = prev


def maybe_record_act(params: dict, x: jax.Array) -> None:
    """Inside a calibration_scope, record max|x| for this conv's params
    dict (no-op otherwise)."""
    if _CALIB is None:
        return
    if isinstance(x, jax.core.Tracer):
        raise RuntimeError(
            "activation-scale calibration must run eagerly (not under "
            "jit): the recorder keys off params-dict identity")
    m = float(jnp.max(jnp.abs(x.astype(jnp.float32))))
    key = id(params)
    _CALIB[key] = max(_CALIB.get(key, 0.0), m)


def attach_activation_scales(params, calib: dict, *,
                             margin: float = 1.1):
    """Return a params tree where every quantized conv dict that was
    seen during calibration gains a ``scale_x`` leaf
    (= recorded_max * margin / 127).  Values beyond the calibrated range
    clip at +-127 at serving time; ``margin`` buys headroom for inputs
    hotter than the calibration clip."""

    def walk(node):
        if isinstance(node, dict):
            if "kernel_q" in node and id(node) in calib:
                scale = max(calib[id(node)] * margin / 127.0, 1e-12)
                return dict(node, scale_x=jnp.float32(scale))
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


def conv_int8(xq: jax.Array, scale_x: jax.Array, kernel_fp: jax.Array,
              padding, out_dtype, *, strides=(1, 1, 1)) -> jax.Array:
    """int8 conv of an already-quantized activation with an fp kernel
    quantized on the fly (for derived kernels, e.g. subpixel phase
    sums — per-channel weight quantization is in-jit cheap: the kernel
    is tiny next to the activations)."""
    wq, scale_w = quantize_kernel(kernel_fp)
    y = lax.conv_general_dilated(
        xq, wq, window_strides=strides, padding=padding,
        dimension_numbers=_DIMENSION_NUMBERS,
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (scale_x * scale_w)).astype(out_dtype)


def quantize_conv_params(params, *, min_cin: int = 64, min_cout: int = 16,
                         skip_paths: Tuple[str, ...] = ()):
    """Walk a model params tree; replace eligible conv kernels with
    int8 + per-channel scales.  A conv leaf-dict {kernel, bias?} whose
    kernel is 5D with C_in >= min_cin, C_out >= min_cout (keeps the
    latent/RGB heads in bf16) and kT*kH*kW > 1 becomes
    {kernel_q, scale_w, bias?}.  Everything else is untouched.

    ``skip_paths``: subtrees whose key contains any of these substrings
    stay fp.  The mid blocks were skipped while int8 programs still
    contained the Pallas flash-attention custom call (int8 convs next
    to it measured ~10x layout thrash); with the query-blocked exact
    attention now the int8-program default there is no custom call, and
    quantizing the mid convs measures a small consistent win
    (tools/probe_mid_quant.py: encoder 304 -> 297 ms, decoder tile
    704 -> 700 ms)."""

    def walk(node):
        if isinstance(node, dict):
            k = node.get("kernel")
            if (k is not None and hasattr(k, "ndim") and k.ndim == 5
                    and k.shape[3] >= min_cin and k.shape[4] >= min_cout
                    and k.shape[0] * k.shape[1] * k.shape[2] > 1):
                wq, scale = quantize_kernel(k)
                out = {"kernel_q": wq, "scale_w": scale}
                if "bias" in node:
                    out["bias"] = node["bias"]
                return out
            return {key: (v if any(s in str(key) for s in skip_paths)
                          else walk(v))
                    for key, v in node.items()}
        if isinstance(node, (list, tuple)):
            t = type(node)
            return t(walk(v) for v in node)
        return node

    return walk(params)


def conv3d_int8(x: jax.Array, params: dict, spec: Conv3DSpec, *,
                precision=None) -> jax.Array:
    """Quantized conv with the same padding semantics as conv3d.

    Activation scale: calibrated static (``params["scale_x"]``, fusable
    elementwise quantize) when present, else dynamic per-tensor (extra
    max-reduction pass).  Edge padding is materialised on the int8
    tensor (half the HBM bytes of bf16 — cheaper than the bf16 edge-pad
    it replaces), zero padding folds into the conv window.
    """
    out_dtype = x.dtype
    scale_x = params.get("scale_x")
    if scale_x is not None:
        xq = quantize_act_static(x, scale_x)
    else:
        xq, scale_x = quantize_act(x)
    from cvvae_tpu.ops.conv import EDGE_FAST_SPACE
    if EDGE_FAST_SPACE and any(m == "edge" and (p[0] or p[1])
                               for m, p in zip(spec.modes, spec.pads)):
        # replicate padding without the (int8) full-tensor pad copy:
        # int8 zero-window main conv + thin-slab boundary fixes — see
        # ops.conv's _conv3d_edge_fast for the inclusion-exclusion
        # scheme.  MEASURED SLOWER in-chain than the materialised int8
        # pad on this chip (345 vs 225 ms at the SD3 720p resblock
        # chain — PERF.md round 4), so gated OFF by default.  The
        # decomposition hands raw_conv fp kernels (the main call gets
        # the dequantized kernel, slab calls get tap-sums);
        # re-quantizing the dequantized kernel per-channel is EXACT
        # (each channel's max maps back to +-127), so the main conv is
        # bit-identical to one on params["kernel_q"], and the tiny slab
        # fixes run through the same int8 path.
        from cvvae_tpu.ops.conv import _conv3d_edge_fast

        k_fp = params["kernel_q"].astype(jnp.float32) * params["scale_w"]
        bias = params.get("bias")

        def raw_conv(v, k, pads, strides):
            """Dequant epilogue fuses into each conv in f32, then casts
            to the compute dtype immediately, so the band fixes never
            hold a full-tensor f32 copy live (an f32-resident variant
            measured a 16.9 GB temp arena at the 720p level-0 shape —
            over HBM).  The bias is folded into the MAIN call only
            (``k is k_fp``); slab fixes are pure correction terms."""
            wq, sw = quantize_kernel(k)
            z = lax.conv_general_dilated(
                v, wq, window_strides=strides, padding=pads,
                dimension_numbers=_DIMENSION_NUMBERS,
                preferred_element_type=jnp.int32, precision=precision)
            zf = z.astype(jnp.float32) * (scale_x * sw)
            if bias is not None and k is k_fp:
                zf = zf + bias.astype(jnp.float32)
            return zf.astype(out_dtype)

        return _conv3d_edge_fast(xq, k_fp, spec, precision,
                                 raw_conv=raw_conv)
    else:
        xq = _edge_pad(xq, spec.pads, spec.modes)
        lax_padding = [tuple(pad) if mode == "zero" else (0, 0)
                       for pad, mode in zip(spec.pads, spec.modes)]
        y = lax.conv_general_dilated(
            xq, params["kernel_q"], window_strides=spec.stride,
            padding=lax_padding,
            dimension_numbers=_DIMENSION_NUMBERS,
            preferred_element_type=jnp.int32, precision=precision)
        y = y.astype(jnp.float32) * (scale_x * params["scale_w"])
    bias = params.get("bias")
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)
