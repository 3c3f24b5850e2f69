"""Pallas stem-conv kernel: 3x3x3 conv with tiny Cin at full pixel res.

The encoder stem (Cin=3 pixels; reference CausalConv3d conv_in,
models/vae_models.py:266-328) is the one conv XLA cannot lower well on
TPU: its conv contracts only over Cin per spatial tap (3/128 MXU depth),
and the repo's stacked-stem XLA lowering (ops/conv.py:_conv3d_stacked_stem)
fixes the depth but pays ~36 ms/720p-clip in HBM for the 9 shifted-view
copies — the 3-channel minor dimension forces 6-byte strided reads at an
effective ~24 GB/s (PERF.md round-2 "measured and rejected" notes).

This kernel (v4) removes the 9x materialisation:

* the input is DEINTERLEAVED once outside the kernel to (C, T, H, W) —
  one XLA transpose pass over the input (~1x strided read) instead of 9
  shifted strided copies, and it gives the kernel a layout whose tiled
  dims (H, W) support aligned DMA slicing.  Feeding the (T, H, W, C)
  array directly is not an option: Mosaic lane-pads the C=3 minor dim
  to 128 (42x HBM blowup) and rejects the unaligned W-band slices
  ("Slice shape along dimension 2 must be aligned to tiling (8)").
* each grid step DMAs one (C, kT, bh+8, Wp) row band into VMEM — H
  offset/extent both 8-aligned (the +8 over-read vs the needed bh+2
  keeps alignment; H is zero-padded to h_out+8 to cover the last band);
* the kT*kH*Cin tap matrix is built from FULL W rows only (every slice
  is lane-offset-0, so the sublane concat is legal — v2's kW-sliced
  rows died on "result/input offset mismatch on non-concat dimension");
* the kW shift moves to the OUTPUT side (the standard conv dual): one
  MXU dot of depth kT*kH*Cin against the (kT*kH*Cin, kW*Cout) combined
  weight, fp32 accumulation, then the result's three lane-aligned
  column blocks are summed at sublane offsets 0/1/2;
* output writes are the unavoidable (T, H, W, Cout) stream.

Speed of light = deinterleave (~1x strided input read) + band reads
(~6x contiguous input) + output write ≈ 18 ms for the 720p 17-frame
encoder stem (4.0 GB out at ~304 GB/s) vs ~43 ms measured for the
stacked lowering.

Measured (tools/probe_stem_pallas.py, v5e, 2026-08-17, nonlinear
in-jit chains): encoder stem 34.3 -> 24.1 ms standalone (1.42x), int8
coexistence NEUTRAL (86.7 vs 87.4 ms mixed program — no custom-call
pathology in either direction).  The Cin=4 decoder latent stem
measured neutral (8.7 vs 8.8 ms), so `stem_usable` accepts only the
Cin=3 pixel stem.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Trace-time switch, env-overridable for A/B runs (CVVAE_PALLAS_STEM=
#: 0/1); `no_pallas_stem()` / `pallas_stem()` override in-process.
#: Default OFF: despite winning in isolation (24.1 vs 34.3 ms) and
#: showing no int8 custom-call pathology, the kernel measured a NET
#: END-TO-END LOSS in the full serving program (bf16 7.00 -> 6.56 fps,
#: int8 9.62 -> 9.33) — see PERF.md round-3 notes.
import os as _os

_ENABLED = _os.environ.get("CVVAE_PALLAS_STEM", "0") == "1"


@contextlib.contextmanager
def no_pallas_stem():
    """Trace-time switch back to the XLA stacked-stem lowering."""
    global _ENABLED
    prev = _ENABLED
    _ENABLED = False
    try:
        yield
    finally:
        _ENABLED = prev


@contextlib.contextmanager
def pallas_stem():
    """Trace-time opt-in (probes/tests; see _ENABLED caveat)."""
    global _ENABLED
    prev = _ENABLED
    _ENABLED = True
    try:
        yield
    finally:
        _ENABLED = prev


def stem_usable(x: jax.Array, kernel: jax.Array, spec) -> bool:
    """Static eligibility: 3x3x3 stride-1 conv, small Cin, shapes the
    grid can tile, TPU platform (CPU tests exercise it via interpret
    mode explicitly)."""
    if not _ENABLED:
        return False
    kt, kh, kw = spec.kernel
    if (kt, kh, kw) != (3, 3, 3) or spec.stride != (1, 1, 1):
        return False
    # Cin=3 pixel stem only: the Cin=4 latent stem measured neutral
    # (8.7 vs 8.8 ms) and smaller shapes don't amortise the grid
    if kernel.shape[3] != 3 or x.shape[0] != 1:
        return False
    # W-axis edge padding would break the zero-pad fold; zero is fine
    if spec.modes[2] != "zero":
        return False
    h_out = x.shape[2] + spec.pads[1][0] + spec.pads[1][1] - 2
    if h_out % 8 or x.ndim != 5:
        return False
    return jax.devices()[0].platform == "tpu"


def _stem_kernel(x_hbm, w_ref, b_ref, o_ref, xbuf, sem, *, bh, w_out, c_in,
                 c_out):
    """Grid step (t, i): output rows [i*bh, i*bh+bh) of frame t.

    x_hbm is the deinterleaved (C, Tp, Hp, Wp) input (Hp = h_out+8,
    zero-padded); one aligned DMA pulls the (C, 3, bh+8, Wp) band this
    block needs (rows [i*bh, i*bh+bh+2) used, +6 over-read for the
    8-alignment of the H extent).
    """
    t = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[:, pl.ds(t, 3), pl.ds(i * bh, bh + 8), :],
        xbuf, sem)
    cp.start()
    cp.wait()
    for h in range(bh):
        rows = []
        for dt in range(3):
            for dh in range(3):
                for c in range(c_in):
                    rows.append(xbuf[c, dt, h + dh, :][None])
        z = jnp.concatenate(rows, axis=0)            # (9*C, Wp), offset 0
        q = jax.lax.dot_general(
            z, w_ref[:, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (Wp, 3*Cout)
        y = (q[0:w_out, 0:c_out]
             + q[1:1 + w_out, c_out:2 * c_out]
             + q[2:2 + w_out, 2 * c_out:3 * c_out])
        y = y + b_ref[:, :].astype(jnp.float32)
        o_ref[0, h, :, :] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("pads", "modes", "block_h",
                                             "interpret"))
def _stem_call(x, kernel, bias, *, pads, modes, block_h=8,
               interpret=False):
    """x: (1, T, H, W, C); kernel: (3, 3, 3, C, O) -> (1, T', H', W', O)."""
    _, t_in, h_in, w_in, c_in = x.shape
    c_out = kernel.shape[4]
    # materialise T/H padding (edge = causal replicate, or zero); W zero
    # padding is materialised too (the deinterleaved layout keeps it
    # contiguous), plus 6 extra zero H rows so every (bh+8)-row DMA band
    # stays in bounds
    widths = [(0, 0)] + [tuple(p) for p in pads] + [(0, 0)]
    ew = [(0, 0)] * 5
    zw = [(0, 0)] * 5
    for ax, mode in enumerate(modes):
        (ew if mode == "edge" else zw)[1 + ax] = widths[1 + ax]
    xp = x
    if any(p != (0, 0) for p in ew):
        xp = jnp.pad(xp, ew, mode="edge")
    zw[2] = (zw[2][0], zw[2][1] + 6)
    # W additionally zero-pads to a multiple of 128 (the lane tiling):
    # the band DMA must copy the FULL lane extent — Mosaic rejects
    # lane-dim slices whose extent is not 128-aligned ("Slice shape
    # along dimension 3 must be aligned to tiling (128)")
    w_conv = w_in + zw[3][0] + zw[3][1]
    zw[3] = (zw[3][0], zw[3][1] + (-w_conv) % 128)
    xp = jnp.pad(xp, zw)
    _, t_p, h_p, w_p, _ = xp.shape
    t_out, h_out = t_p - 2, h_p - 8
    w_out = w_conv - 2

    bh = block_h
    assert h_out % bh == 0 and bh % 8 == 0, (h_out, bh)
    # deinterleave: one strided-read pass (vs 9 for the tap stack)
    xc = jnp.moveaxis(xp[0], -1, 0)                  # (C, Tp, Hp, Wp)
    # combined weight: rows (dt, dh, c) to match the tap-matrix order,
    # columns (dw, c_out) so the kW shift lands in lane-aligned blocks
    w2 = kernel.transpose(0, 1, 3, 2, 4).reshape(9 * c_in, 3 * c_out)
    grid = (t_out, h_out // bh)
    out = pl.pallas_call(
        functools.partial(_stem_kernel, bh=bh, w_out=w_out, c_in=c_in,
                          c_out=c_out),
        out_shape=jax.ShapeDtypeStruct((t_out, h_out, w_out, c_out),
                                       x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # manual DMA
            pl.BlockSpec((9 * c_in, 3 * c_out), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, w_out, c_out),
                               lambda t, i: (t, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c_in, 3, bh + 8, w_p), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xc, w2, bias.reshape(1, c_out))
    return out[None]


def stem_conv3d(x: jax.Array, kernel: jax.Array, bias, spec,
                interpret: bool = False) -> jax.Array:
    """Drop-in for the stem path of ops.conv.conv3d (bias included)."""
    b = bias if bias is not None else jnp.zeros((kernel.shape[4],),
                                                x.dtype)
    return _stem_call(x, kernel, b.astype(x.dtype),
                      pads=tuple(tuple(p) for p in spec.pads),
                      modes=tuple(spec.modes), interpret=interpret)
