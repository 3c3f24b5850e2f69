"""Fused nearest-2x-upsample + 3x3 conv via subpixel phase decomposition.

The reference upsample blocks compute ``conv3x3(nearest_2x_hw(x))``
(models/vae_models.py:214-232, models/vae_blocks3d_sd3.py:342-356),
which materialises a 4x-area intermediate and runs the conv on it.
Because nearest-neighbour duplicates pixels, each output phase (parity
of the output row/column) only ever sees *two* distinct source pixels
per axis:

    y[2i]   = w0 * x[i-1] + (w1 + w2) * x[i]
    y[2i+1] = (w0 + w1) * x[i] + w2 * x[i+1]

so the op decomposes exactly into four convs with (kT, 2, 2) kernels on
the ORIGINAL tensor, interleaved subpixel-style:
2.25x fewer MACs (16*kT vs 36*kT taps per 2x2 output block) and no 4x
intermediate in HBM.  Bit-exact up to float reassociation (the kernel
tap sums), validated against the naive path in tests.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NDHWC", "DHWIO", "NDHWC")


def _phase_kernels(w: jax.Array) -> Tuple[jax.Array, ...]:
    """w: (kT, 3, 3, I, O) -> four (kT, 2, 2, I, O) phase kernels,
    ordered (h_even, w_even), (h_even, w_odd), (h_odd, w_even),
    (h_odd, w_odd)."""
    h_even = jnp.concatenate([w[:, 0:1], w[:, 1:2] + w[:, 2:3]], axis=1)
    h_odd = jnp.concatenate([w[:, 0:1] + w[:, 1:2], w[:, 2:3]], axis=1)
    out = []
    for wh in (h_even, h_odd):
        w_even = jnp.concatenate([wh[:, :, 0:1], wh[:, :, 1:2] + wh[:, :, 2:3]],
                                 axis=2)
        w_odd = jnp.concatenate([wh[:, :, 0:1] + wh[:, :, 1:2], wh[:, :, 2:3]],
                                axis=2)
        out.extend([w_even, w_odd])
    # reorder to (he,we),(he,wo),(ho,we),(ho,wo)
    return out[0], out[1], out[2], out[3]


def upsample2x_conv3x3(x: jax.Array, params: dict, *, t_pad: Tuple[int, int],
                       t_mode: str, hw_mode: str = "zero") -> jax.Array:
    """y == conv3d(nearest_2x_hw(x), kernel) with H/W padding 1 in
    ``hw_mode`` ("zero"|"edge") and time padding ``t_pad`` in ``t_mode``.

    x: (B, T, H, W, C) -> (B, T', 2H, 2W, O).
    """
    kernel = params["kernel"].astype(x.dtype)  # (kT, 3, 3, I, O)
    if t_mode == "edge" and (t_pad[0] or t_pad[1]):
        x = jnp.pad(x, ((0, 0), tuple(t_pad), (0, 0), (0, 0), (0, 0)),
                    mode="edge")
        t_lax = (0, 0)
    else:
        t_lax = tuple(t_pad)
    if hw_mode == "edge":
        x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        pads_h = {"even": (0, -1), "odd": (-1, 0)}
        pads_w = {"even": (0, -1), "odd": (-1, 0)}
    else:
        pads_h = {"even": (1, 0), "odd": (0, 1)}
        pads_w = {"even": (1, 0), "odd": (0, 1)}

    ks = _phase_kernels(kernel)
    phases = []
    for idx, (hp, wp) in enumerate((("even", "even"), ("even", "odd"),
                                    ("odd", "even"), ("odd", "odd"))):
        y = lax.conv_general_dilated(
            x, ks[idx], (1, 1, 1),
            [t_lax, pads_h[hp], pads_w[wp]],
            dimension_numbers=_DN)
        phases.append(y)
    b, t, h, w, c = phases[0].shape
    y = jnp.stack(phases, axis=4)          # (B,T',H,W,4,O)
    bias = params.get("bias")
    if bias is not None:
        y = y + bias.astype(y.dtype)
    y = y.reshape(b, t, h, w, 2, 2, c)
    y = y.transpose(0, 1, 2, 4, 3, 5, 6)   # (B,T',H,2,W,2,O)
    return y.reshape(b, t, 2 * h, 2 * w, c)


def upsample2x_conv3x3_interleave(x: jax.Array, params: dict, *,
                                  n: int, t_pad: Tuple[int, int],
                                  t_mode: str, hw_mode: str = "zero",
                                  drop_first: bool = True) -> jax.Array:
    """upsample2x_conv3x3 fused with the channel->time interleave.

    Equals ``temporal_interleave(upsample2x_conv3x3(x, ...), n)`` but the
    subpixel shuffle and the (n c) channel-split run as ONE
    reshape/transpose pass over the (4x-area) output instead of two —
    the decoder's upsample stages are bandwidth-bound there (measured
    132 -> 83 ms at the level-2 shape).  x: (B,T,H,W,C) ->
    (B, n*T' - drop_first, 2H, 2W, C_out/n).

    int8-quantized params ({kernel_q, scale_w, bias?}) are supported:
    the derived phase kernels are re-quantized per-channel in-jit and
    the four convs run on the MXU's int8 path.
    """
    quantized = "kernel_q" in params
    if quantized:
        from cvvae_tpu.ops import quant
        quant.maybe_record_act(params, x)
        kernel = quant.dequantize_kernel(params).astype(jnp.float32)
        quantized = (x.shape[1] * x.shape[2] * x.shape[3]
                     >= quant.INT8_MIN_POSITIONS)
        if not quantized:
            kernel = kernel.astype(x.dtype)
    else:
        kernel = params["kernel"].astype(x.dtype)  # (kT, 3, 3, I, n*c)
    if t_mode == "edge" and (t_pad[0] or t_pad[1]):
        x = jnp.pad(x, ((0, 0), tuple(t_pad), (0, 0), (0, 0), (0, 0)),
                    mode="edge")
        t_lax = (0, 0)
    else:
        t_lax = tuple(t_pad)
    if hw_mode == "edge":
        x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        pads = {"even": (0, -1), "odd": (-1, 0)}
    else:
        pads = {"even": (1, 0), "odd": (0, 1)}

    ks = _phase_kernels(kernel)
    corners = (("even", "even"), ("even", "odd"),
               ("odd", "even"), ("odd", "odd"))
    if quantized:
        sx = params.get("scale_x")
        if sx is not None:
            xq = quant.quantize_act_static(x, sx)
        else:
            xq, sx = quant.quantize_act(x)
        phases = [quant.conv_int8(xq, sx, ks[idx],
                                  [t_lax, pads[hp], pads[wp]], x.dtype)
                  for idx, (hp, wp) in enumerate(corners)]
    else:
        phases = [lax.conv_general_dilated(
            x, ks[idx], (1, 1, 1), [t_lax, pads[hp], pads[wp]],
            dimension_numbers=_DN)
            for idx, (hp, wp) in enumerate(corners)]
    b, t, h, w, nc = phases[0].shape
    c = nc // n
    bias = params.get("bias")

    # gated Pallas interleave (ops/pallas/shuffle.py): same permutation
    # + bias add, VMEM-tiled instead of XLA's fine-grained HBM gather —
    # see PERF.md for the measured A/B and the shipping decision
    from cvvae_tpu.ops.pallas import shuffle as _shuffle
    if (_shuffle.shuffle_enabled()
            and _shuffle.shuffle_usable(phases, n, c)):
        return _shuffle.subpixel_interleave(
            phases, bias, n=n, drop_first=drop_first)

    y = jnp.stack(phases, axis=4)               # (B,T',H,W,4,n*c)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    y = y.reshape(b, t, h, w, 2, 2, n, c)
    y = y.transpose(0, 1, 6, 2, 4, 3, 5, 7)     # (B,T',n,H,2,W,2,c)
    y = y.reshape(b, t * n, 2 * h, 2 * w, c)
    if n > 1 and drop_first:
        y = y[:, 1:]
    return y
