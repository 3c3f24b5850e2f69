"""3D convolution primitives with the exact padding semantics of CV-VAE.

Everything here operates on channels-last video tensors of shape
``(B, T, H, W, C)`` — the natural TPU layout (last dim feeds the MXU/VPU
lanes).  Kernels are stored as ``(kT, kH, kW, C_in, C_out)`` ("DHWIO").

The reference (PyTorch, channels-first) has four distinct conv padding
behaviours that all matter for bit-parity:

* v1 causal conv    — zero-pad space by p, edge("replicate")-pad time by
  (2p, 0) into the past only.              [models/vae_models.py:298-328]
* v1 plain conv     — ``nn.Conv3d(padding=p)``: zero-pad all axes.
* SD3 causal conv   — edge-pad space by (p, p) AND time by (2p, 0), all
  replicate mode.                     [models/vae_blocks3d_sd3.py:81-104]
* SD3 plain conv    — ``Conv3d(padding=p, padding_mode="replicate")``:
  symmetric edge-pad all axes.         [models/vae_blocks3d_sd3.py:16-46]

Plus the "2D conv on 5D input" trick (``Conv2dWithExtraDim``,
[models/vae_models.py:331-340]) which we express as a 3D conv with a
``(1, kH, kW)`` kernel — identical math, no reshapes, and XLA fuses it
like any other conv.

Zero padding is passed straight into ``lax.conv_general_dilated`` (free);
edge padding is materialised with ``jnp.pad(mode="edge")`` first.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

#: Trace-time switch for the space-axis edge-fast decomposition
#: (_conv3d_edge_fast) — measured SLOWER in-chain than the materialised
#: pad on this chip (PERF.md round 4), kept for A/B runs on other
#: hardware.  Read from CVVAE_EDGE_FAST once at import: set the env var
#: BEFORE importing cvvae_tpu, or flip this module global directly
#: (what the A/B tools and tests do).
EDGE_FAST_SPACE = os.environ.get("CVVAE_EDGE_FAST", "0") == "1"

Pad = Tuple[int, int]

_DIMENSION_NUMBERS = ("NDHWC", "DHWIO", "NDHWC")


@dataclasses.dataclass(frozen=True)
class Conv3DSpec:
    """Static description of a conv layer: kernel/stride/padding policy."""

    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    #: ((t_lo, t_hi), (h_lo, h_hi), (w_lo, w_hi))
    pads: Tuple[Pad, Pad, Pad] = ((0, 0), (0, 0), (0, 0))
    #: per-axis mode: "zero" | "edge"
    modes: Tuple[str, str, str] = ("zero", "zero", "zero")
    use_bias: bool = True

    # ---- constructors mirroring the reference layer variants ----

    @staticmethod
    def v1_causal(k: int = 3, p: int = 1, stride=(1, 1, 1)) -> "Conv3DSpec":
        """CausalConv3d: zeros space / replicate past time.

        Ref: models/vae_models.py:298-328."""
        return Conv3DSpec((k, k, k), tuple(stride), ((2 * p, 0), (p, p), (p, p)),
                          ("edge", "zero", "zero"))

    @staticmethod
    def v1_plain(k: int = 3, p: int = 1, stride=(1, 1, 1)) -> "Conv3DSpec":
        """nn.Conv3d(padding=p), zero padding everywhere."""
        return Conv3DSpec((k, k, k), tuple(stride), ((p, p), (p, p), (p, p)),
                          ("zero", "zero", "zero"))

    @staticmethod
    def sd3_causal(k: int = 3, p: int = 1, stride=(1, 1, 1)) -> "Conv3DSpec":
        """SD3 CausalConv3d: replicate space and past time.

        Ref: models/vae_blocks3d_sd3.py:81-104."""
        return Conv3DSpec((k, k, k), tuple(stride), ((2 * p, 0), (p, p), (p, p)),
                          ("edge", "edge", "edge"))

    @staticmethod
    def sd3_plain(k: int = 3, p: int = 1, stride=(1, 1, 1)) -> "Conv3DSpec":
        """Conv3d(padding=p, padding_mode="replicate"): edge pad all axes.

        Ref: models/vae_blocks3d_sd3.py:16-46."""
        return Conv3DSpec((k, k, k), tuple(stride), ((p, p), (p, p), (p, p)),
                          ("edge", "edge", "edge"))

    @staticmethod
    def spatial2d(k: int = 3, p: int = 1, stride_hw=(1, 1)) -> "Conv3DSpec":
        """Conv2dWithExtraDim: per-frame 2D conv == (1,k,k) 3D conv.

        Ref: models/vae_models.py:331-340."""
        return Conv3DSpec((1, k, k), (1,) + tuple(stride_hw),
                          ((0, 0), (p, p), (p, p)), ("zero", "zero", "zero"))

    @staticmethod
    def pointwise() -> "Conv3DSpec":
        """1x1x1 conv (nin_shortcut / attention qkv-as-conv)."""
        return Conv3DSpec((1, 1, 1))

    @staticmethod
    def v1_downsample(down_time: bool) -> "Conv3DSpec":
        """v1 Downsample3D: asym zero pad (0,1) space, replicate (2,0) time,
        stride 2 (or (1,2,2)).  Ref: models/vae_models.py:238-263."""
        return Conv3DSpec((3, 3, 3), (2 if down_time else 1, 2, 2),
                          ((2, 0), (0, 1), (0, 1)), ("edge", "zero", "zero"))

    # ---- derived ----

    def fan_in(self, c_in: int) -> int:
        kt, kh, kw = self.kernel
        return c_in * kt * kh * kw


def conv_init(key: jax.Array, spec: Conv3DSpec, c_in: int, c_out: int,
              dtype=jnp.float32) -> dict:
    """Initialise kernel+bias matching torch's Conv default
    (kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)) for weight and bias)."""
    kt, kh, kw = spec.kernel
    fan_in = spec.fan_in(c_in)
    bound = 1.0 / math.sqrt(fan_in)
    k_w, k_b = jax.random.split(key)
    params = {
        "kernel": jax.random.uniform(
            k_w, (kt, kh, kw, c_in, c_out), dtype, -bound, bound)
    }
    if spec.use_bias:
        params["bias"] = jax.random.uniform(k_b, (c_out,), dtype, -bound, bound)
    return params


def _edge_pad(x: jax.Array, pads: Sequence[Pad], modes: Sequence[str]) -> jax.Array:
    """Apply only the edge-mode components of the pad spec (T,H,W axes)."""
    widths = [(0, 0)] * x.ndim
    any_edge = False
    for axis, (pad, mode) in enumerate(zip(pads, modes)):
        if mode == "edge" and (pad[0] or pad[1]):
            widths[1 + axis] = tuple(pad)
            any_edge = True
    if not any_edge:
        return x
    return jnp.pad(x, widths, mode="edge")


def conv3d(x: jax.Array, params: dict, spec: Conv3DSpec, *,
           compute_dtype: Optional[jnp.dtype] = None,
           precision=None) -> jax.Array:
    """Run the conv described by ``spec`` on ``x`` (B,T,H,W,C).

    Accepts int8-quantized params ({kernel_q, scale_w, bias?} produced
    by ops.quant.quantize_conv_params) transparently, so a quantized
    params tree drops into any model unchanged.  Small-activation calls
    fall back to a dequantized bf16 conv — XLA's int8 conv path is
    ~2.5x SLOWER than bf16 below ~64x64 spatial (measured on v5e), and
    shapes are static at trace time so the choice is free."""
    if "kernel_q" in params:
        from cvvae_tpu.ops.quant import (
            INT8_MIN_POSITIONS, conv3d_int8, dequantize_kernel,
            maybe_record_act)
        maybe_record_act(params, x)
        if x.shape[1] * x.shape[2] * x.shape[3] >= INT8_MIN_POSITIONS:
            return conv3d_int8(x, params, spec, precision=precision)
        params = dict(params, kernel=dequantize_kernel(params))
    kernel = params["kernel"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    elif kernel.dtype != x.dtype:
        kernel = kernel.astype(x.dtype)

    c_in = kernel.shape[3]
    from cvvae_tpu.ops.pallas.stem import stem_conv3d, stem_usable
    if stem_usable(x, kernel, spec):
        # Pallas stem kernel: one deinterleave pass + aligned row-band
        # DMAs + a 27-deep MXU dot with the kW shift on the output side
        # — removes the stacked lowering's ~9x strided-view HBM traffic
        # (ops/pallas/stem.py; guarded by stem_usable / no_pallas_stem())
        return stem_conv3d(x, kernel, params.get("bias"), spec)
    if (c_in <= 8 and spec.kernel[0] * spec.kernel[1] > 1
            and spec.stride[0] == 1 and spec.stride[1] == 1):
        # Stem convs (Cin=3 pixels / 4-16 latents): XLA's TPU conv
        # lowering contracts only over Cin per spatial tap, so these run
        # at ~Cin/128 of MXU depth (measured 2.2 TFLOP/s for the v1
        # encoder stem at 720p).  The stacked lowering reaches
        # kT*kH*Cin contraction depth (~7x) and only copies the
        # small-channel input.
        y = _conv3d_stacked_stem(x, kernel, spec, precision)
    # NOTE: a full 27-tap im2col (_conv3d_small_cin) measured neutral in
    # isolation but cost ~6% end-to-end at 720p (the 27-slice concat is
    # 27x the input in HBM and breaks fusion); the stacked-stem lowering
    # above only materialises kT*kH slices.
    elif (kernel.shape[4] <= 8 and c_in >= 32
            and spec.kernel[0] * spec.kernel[1] * spec.kernel[2] > 1
            and spec.stride == (1, 1, 1)):
        # RGB/latent heads: Cout <= 8 wastes >90% of the MXU's output
        # lanes in the direct lowering
        y = _conv3d_small_cout(x, kernel, spec, precision)
    elif (spec.modes[0] == "edge" and spec.modes[1] == "zero"
            and spec.modes[2] == "zero" and (spec.pads[0][0] or spec.pads[0][1])
            and x.shape[1] > 1):
        y = _conv3d_edge_time_fast(x, kernel, spec, precision)
    elif EDGE_FAST_SPACE and any(m == "edge" and (p[0] or p[1])
                                 for m, p in zip(spec.modes, spec.pads)):
        # zero-window conv + thin-slab boundary fixes: measured SLOWER
        # in-chain than the materialised pad on this chip (PERF.md
        # round 4) — gated infrastructure, default OFF
        y = _conv3d_edge_fast(x, kernel, spec, precision)
    else:
        x = _edge_pad(x, spec.pads, spec.modes)
        lax_padding = [
            tuple(pad) if mode == "zero" else (0, 0)
            for pad, mode in zip(spec.pads, spec.modes)
        ]
        y = lax.conv_general_dilated(
            x, kernel,
            window_strides=spec.stride,
            padding=lax_padding,
            dimension_numbers=_DIMENSION_NUMBERS,
            precision=precision,
        )
    bias = params.get("bias")
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _conv3d_stacked_stem(x: jax.Array, kernel: jax.Array, spec: Conv3DSpec,
                         precision) -> jax.Array:
    """Small-Cin conv as a (1,1,kW) conv on T/H tap-stacked channels.

    All T/H padding (edge or zero) is materialised on the small-channel
    input; the kT*kH shifted views are concatenated on the channel axis
    (order: dt outer, dh inner, cin minor), turning the conv into one
    with contraction depth kT*kH*Cin.  W handling (pad + stride) stays
    inside lax.conv.  Bit-equal to the direct lowering up to float
    reassociation.
    """
    kt, kh, kw = spec.kernel
    # Materialise T/H padding (either mode) on the small input; W zero
    # padding folds into the lax conv, W edge padding is materialised.
    edge_widths = [(0, 0)] * 5
    zero_widths = [(0, 0)] * 5
    w_pad = (0, 0)
    for axis, (pad, mode) in enumerate(zip(spec.pads, spec.modes)):
        if axis == 2 and mode == "zero":
            w_pad = tuple(pad)
        elif mode == "edge":
            edge_widths[1 + axis] = tuple(pad)
        else:
            zero_widths[1 + axis] = tuple(pad)
    if any(p != (0, 0) for p in edge_widths):
        x = jnp.pad(x, edge_widths, mode="edge")
    if any(p != (0, 0) for p in zero_widths):
        x = jnp.pad(x, zero_widths)

    t_out = x.shape[1] - kt + 1
    h_out = x.shape[2] - kh + 1
    views = [x[:, dt:dt + t_out, dh:dh + h_out]
             for dt in range(kt) for dh in range(kh)]
    z = views[0] if len(views) == 1 else jnp.concatenate(views, axis=-1)
    c_in, c_out = kernel.shape[3], kernel.shape[4]
    k2 = jnp.transpose(kernel, (2, 0, 1, 3, 4))       # (kW, kT, kH, I, O)
    k2 = k2.reshape(1, 1, kw, kt * kh * c_in, c_out)
    return lax.conv_general_dilated(
        z, k2, window_strides=(1, 1, spec.stride[2]),
        padding=[(0, 0), (0, 0), w_pad],
        dimension_numbers=_DIMENSION_NUMBERS, precision=precision)


def _conv3d_small_cout(x: jax.Array, kernel: jax.Array, spec: Conv3DSpec,
                       precision) -> jax.Array:
    """Small-Cout conv (RGB/latent heads) as a 1x1x1 conv to
    kT*kH*kW*Cout tap-channels + shifted adds.

    A 3x3x3 conv to 3 channels uses 3/128 MXU output lanes (~2% util —
    measured ~58 ms for the decoder RGB head at a 720x672 tile); the
    1x1 projection to 81 tap-channels runs at 81/128 lanes and the
    tap-sum is a bandwidth-cheap elementwise epilogue (~23 ms total).
    Padding (either mode, any axis) is materialised on the small
    tap-channel tensor, which is cheaper than padding the wide input.
    Bit-equal to the direct lowering up to float reassociation.
    """
    kt, kh, kw = spec.kernel
    c_in, c_out = kernel.shape[3], kernel.shape[4]
    k11 = jnp.transpose(kernel, (3, 0, 1, 2, 4))      # (I, kT, kH, kW, O)
    k11 = k11.reshape(1, 1, 1, c_in, kt * kh * kw * c_out)
    u = lax.conv_general_dilated(
        x, k11, window_strides=(1, 1, 1), padding=[(0, 0)] * 3,
        dimension_numbers=_DIMENSION_NUMBERS, precision=precision)
    b, t, h, w, _ = u.shape
    u = u.reshape(b, t, h, w, kt * kh * kw, c_out)
    for axis, (pad, mode) in enumerate(zip(spec.pads, spec.modes)):
        if tuple(pad) == (0, 0):
            continue
        widths = [(0, 0)] * 6
        widths[1 + axis] = tuple(pad)
        u = jnp.pad(u, widths, mode="edge" if mode == "edge" else "constant")
    t_out = u.shape[1] - kt + 1
    h_out = u.shape[2] - kh + 1
    w_out = u.shape[3] - kw + 1
    # fp32 accumulator: the 27-term reassociated tap-sum would otherwise
    # round per add in bf16 (the direct lowering rounds once after fp32
    # MXU accumulation) and this is the final RGB/latent head.  The
    # reads stay in the compute dtype; only the fused accumulator widens.
    acc = None
    idx = 0
    for dt in range(kt):
        for dh in range(kh):
            for dw in range(kw):
                term = u[:, dt:dt + t_out, dh:dh + h_out,
                         dw:dw + w_out, idx, :]
                acc = term.astype(jnp.float32) if acc is None else acc + term
                idx += 1
    return acc.astype(u.dtype)


def _conv3d_small_cin(x: jax.Array, kernel: jax.Array, spec: Conv3DSpec,
                      precision) -> jax.Array:
    """3x3x3 conv with few input channels as shifted-stack + matmul.

    A conv with Cin=3 uses 3/128 of the MXU's contraction depth (~30ms
    for the 0.12-TFLOP encoder conv_in at a 576px tile).  Stacking the
    27 tap-shifted views into a (27*Cin)-deep feature axis turns it into
    one well-shaped matmul (~5ms).  The stacked tensor is only 27x the
    *small-channel* input — cheap next to the 128-channel output.
    """
    widths = [(0, 0)]
    for pad, mode in zip(spec.pads, spec.modes):
        widths.append(tuple(pad))
    widths.append((0, 0))
    zero_widths = [(0, 0) if m == "edge" else w
                   for w, m in zip(widths[1:4], spec.modes)]
    edge_widths = [w if m == "edge" else (0, 0)
                   for w, m in zip(widths[1:4], spec.modes)]
    if any(p != (0, 0) for p in edge_widths):
        x = jnp.pad(x, [(0, 0)] + edge_widths + [(0, 0)], mode="edge")
    if any(p != (0, 0) for p in zero_widths):
        x = jnp.pad(x, [(0, 0)] + zero_widths + [(0, 0)])
    kt, kh, kw = spec.kernel
    to = x.shape[1] - kt + 1
    ho = x.shape[2] - kh + 1
    wo = x.shape[3] - kw + 1
    slices = [x[:, dt:dt + to, dh:dh + ho, dw:dw + wo, :]
              for dt in range(kt) for dh in range(kh) for dw in range(kw)]
    z = jnp.concatenate(slices, axis=-1)
    wmat = kernel.reshape(-1, kernel.shape[-1])
    return jnp.einsum("bthwk,ko->bthwo", z, wmat, precision=precision)


def _conv3d_edge_time_fast(x: jax.Array, kernel: jax.Array, spec: Conv3DSpec,
                           precision) -> jax.Array:
    """Edge ("replicate") time padding without copying the whole tensor.

    Replicate-padding T by (lo, hi) then convolving equals zero-padding
    (free — folded into the conv window config) plus a boundary fix: for
    the few output frames whose window reaches past the clip, the missing
    taps all read the first (or last) frame, so the correction is a tiny
    per-frame 2D conv of x[:, :1] / x[:, -1:] with the summed kernel
    taps, padded-and-added into y (fuses into the conv epilogue).  This
    removes a full-tensor HBM round trip per causal conv.  (The same
    trick on the SPACE axes — `_conv3d_edge_fast` — measured slower
    in-chain than the pad it avoids; see PERF.md round 4.)
    """
    lo, hi = spec.pads[0]
    st = spec.stride[0]
    kt = spec.kernel[0]
    t_in = x.shape[1]
    hw_padding = [tuple(spec.pads[1]), tuple(spec.pads[2])]

    y = lax.conv_general_dilated(
        x, kernel, window_strides=spec.stride,
        padding=[(lo, hi)] + hw_padding,
        dimension_numbers=_DIMENSION_NUMBERS, precision=precision)
    t_out = y.shape[1]

    def frame_conv(frame, taps):
        """(B,1,H,W,C) conv with summed time taps (1,kh,kw,I,O)."""
        k2 = jnp.sum(taps, axis=0, keepdims=True)
        return lax.conv_general_dilated(
            frame, k2, window_strides=(1,) + spec.stride[1:],
            padding=[(0, 0)] + hw_padding,
            dimension_numbers=_DIMENSION_NUMBERS, precision=precision)

    lo_fixes = []
    o = 0
    while o * st < lo and o < t_out:
        n_missing = lo - o * st
        lo_fixes.append(frame_conv(x[:, :1], kernel[:n_missing]))
        o += 1
    hi_fixes = []
    o = t_out - 1
    while o >= 0 and (o * st - lo + kt - 1) > t_in - 1:
        n_missing = (o * st - lo + kt - 1) - (t_in - 1)
        hi_fixes.append(frame_conv(x[:, -1:], kernel[kt - n_missing:]))
        o -= 1
    hi_fixes = hi_fixes[::-1]

    if lo_fixes:
        fix = jnp.concatenate(lo_fixes, axis=1)
        y = y + jnp.pad(fix, ((0, 0), (0, t_out - fix.shape[1]),
                              (0, 0), (0, 0), (0, 0)))
    if hi_fixes:
        fix = jnp.concatenate(hi_fixes, axis=1)
        y = y + jnp.pad(fix, ((0, 0), (t_out - fix.shape[1], 0),
                              (0, 0), (0, 0), (0, 0)))
    return y


def _conv3d_edge_fast(x: jax.Array, kernel: jax.Array, spec: Conv3DSpec,
                      precision,
                      raw_conv=None) -> jax.Array:
    """Edge ("replicate") padding on ANY axes without copying the tensor.

    **Measured negative on v5e** (kept OFF; enable for A/B via
    CVVAE_EDGE_FAST=1): at the SD3 decoder's (17,720,672,128) resblock
    chain this decomposition runs 696 ms vs 356 ms for the materialised
    pad in bf16, 345 vs 225 in int8 — XLA overlaps the pad copy with
    neighbouring work far better than it schedules the zero-window conv
    plus fix composition.  Bit-parity is pinned in
    tests/test_edge_fast_conv.py; the time-axis-only special case
    (`_conv3d_edge_time_fast` above) IS the shipping path for causal
    convs, where it has been a measured win since round 2.

    Replicate-padding an axis then convolving equals zero-padding (free —
    folded into the conv's window config) plus a boundary fix: for the
    few output slices whose window reaches past the input, the missing
    taps all read the first (or last) slice, so the correction is a
    thin-slab conv of x[.., :1, ..] / x[.., -1:, ..] with the missing
    kernel taps summed along that axis, padded-and-added into y (the
    adds fuse into the conv epilogue).  This removes a full-tensor HBM
    round trip per conv — the v1 causal convs pay it on T only; the SD3
    nets replicate-pad space AND time on every 3D conv
    (models/vae_blocks3d_sd3.py:16-104), where the materialised pad was
    ~15% of the big decoder stages' time.

    Multi-axis correctness (inclusion-exclusion): axes are fixed in
    order T, H, W.  Each axis' slab conv uses ZERO window pads on
    earlier-fixed axes (their out-of-range terms are already counted)
    and MATERIALISED edge pads on later edge axes (the slab is thin, so
    the copy is negligible) — every tap-term whose reads run off the
    tensor is counted exactly once, by the first out-of-range axis.

    ``raw_conv(x, kernel, window_pads, strides)`` abstracts the core
    conv so the int8 path can reuse the same decomposition.
    """
    if raw_conv is None:
        def raw_conv(v, k, pads, strides):
            return lax.conv_general_dilated(
                v, k, window_strides=strides, padding=pads,
                dimension_numbers=_DIMENSION_NUMBERS, precision=precision)

    window_pads = [tuple(p) for p in spec.pads]
    y = raw_conv(x, kernel, window_pads, spec.stride)

    edge_axes = [a for a in range(3) if spec.modes[a] == "edge"
                 and (spec.pads[a][0] or spec.pads[a][1])]
    for pos, axis in enumerate(edge_axes):
        lo, hi = spec.pads[axis]
        st = spec.stride[axis]
        k_ax = spec.kernel[axis]
        size = x.shape[1 + axis]
        out_size = y.shape[1 + axis]

        def slab_conv(slab, taps, axis=axis, pos=pos):
            """Conv of a 1-wide slab along ``axis`` with ``taps`` (the
            missing kernel taps) summed along that axis.

            ALL padding is materialised on the slab (it is thin, so the
            copy is negligible): edge mode for later edge axes, zeros
            for zero-mode axes and earlier edge axes (whose off-tensor
            terms are already counted).  Degenerate-extent convs with
            asymmetric window padding miscompile on this libtpu (NaN
            bands observed at (B,T,1,W,C) with T window (2,0)), so slab
            convs carry no window padding at all."""
            k2 = jnp.sum(taps, axis=axis, keepdims=True)
            strides = list(spec.stride)
            strides[axis] = 1
            edge_widths = [(0, 0)] * 5
            zero_widths = [(0, 0)] * 5
            for a in range(3):
                if a == axis:
                    continue
                if a in edge_axes and edge_axes.index(a) > pos:
                    edge_widths[1 + a] = tuple(spec.pads[a])
                else:
                    zero_widths[1 + a] = tuple(spec.pads[a])
            if any(w != (0, 0) for w in edge_widths):
                slab = jnp.pad(slab, edge_widths, mode="edge")
            if any(w != (0, 0) for w in zero_widths):
                slab = jnp.pad(slab, zero_widths)
            return raw_conv(slab, k2, [(0, 0)] * 3, tuple(strides))

        def take(arr, sl, axis=axis):
            idx = [slice(None)] * 5
            idx[1 + axis] = sl
            return arr[tuple(idx)]

        def tap_slice(k, sl, axis=axis):
            idx = [slice(None)] * 5
            idx[axis] = sl
            return k[tuple(idx)]

        lo_fixes = []
        o = 0
        while o * st < lo and o < out_size:
            n_missing = lo - o * st
            lo_fixes.append(slab_conv(take(x, slice(0, 1)),
                                      tap_slice(kernel, slice(0, n_missing))))
            o += 1
        hi_fixes = []
        o = out_size - 1
        while o >= 0 and (o * st - lo + k_ax - 1) > size - 1:
            n_missing = (o * st - lo + k_ax - 1) - (size - 1)
            hi_fixes.append(slab_conv(
                take(x, slice(size - 1, size)),
                tap_slice(kernel, slice(k_ax - n_missing, k_ax))))
            o -= 1
        hi_fixes = hi_fixes[::-1]

        # Pad each fix to the full output extent and add — the adds are
        # elementwise and fuse into the conv epilogue.  The barrier
        # around the concatenated fix keeps XLA from fusing the slab
        # conv + pad + add into one composition, which miscompiles to
        # NaN bands on this libtpu (observed at (1,5,64,64,32)
        # sd3_causal bf16); a dynamic_update_slice formulation avoided
        # the NaN too but materialised full-tensor copies per band
        # update (2x slower in-chain at the 720p tile).
        if lo_fixes:
            fix = jnp.concatenate(lo_fixes, axis=1 + axis) \
                if len(lo_fixes) > 1 else lo_fixes[0]
            fix = lax.optimization_barrier(fix)
            widths = [(0, 0)] * 5
            widths[1 + axis] = (0, out_size - fix.shape[1 + axis])
            y = y + jnp.pad(fix, widths).astype(y.dtype)
        if hi_fixes:
            fix = jnp.concatenate(hi_fixes, axis=1 + axis) \
                if len(hi_fixes) > 1 else hi_fixes[0]
            fix = lax.optimization_barrier(fix)
            widths = [(0, 0)] * 5
            widths[1 + axis] = (out_size - fix.shape[1 + axis], 0)
            y = y + jnp.pad(fix, widths).astype(y.dtype)
    return y
