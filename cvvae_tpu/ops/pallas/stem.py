"""Pallas stem-conv kernel: 3x3x3 conv with tiny Cin at full pixel res.

The encoder stem (Cin=3 pixels; reference CausalConv3d conv_in,
models/vae_models.py:266-328) is the one conv XLA cannot lower well on
TPU: its conv contracts only over Cin per spatial tap (3/128 MXU depth),
and the repo's stacked-stem XLA lowering (ops/conv.py:_conv3d_stacked_stem)
fixes the depth but pays ~36 ms/720p-clip in HBM for the 9 shifted-view
copies — the 3-channel minor dimension forces 6-byte strided reads at an
effective ~24 GB/s (PERF.md round-2 "measured and rejected" notes).

This kernel removes the materialisation entirely:

* the input is FOLDED to (T, H, W*C) — a free reshape, channel minor
  collapses into W, so every HBM access is contiguous full-bandwidth;
* each grid step DMAs one (kT, bh + kH-1, (W+2p)*C) row band into VMEM
  (the only HBM reads: ~1x the input, vs ~9x strided for the stacked
  lowering);
* the kT*kH*kW*Cin tap stack is built by VMEM slice+reshape (free
  compared to HBM) and contracted in ONE MXU dot of depth
  kT*kH*kW*Cin (81 for Cin=3, 108 for the Cin=4 latent stem) with fp32
  accumulation;
* output writes are the unavoidable (T, H, W, Cout) stream.

Speed of light = input read + output write ≈ 14 ms for the 720p
17-frame encoder stem (4.0 GB out at ~304 GB/s) vs ~43 ms measured for
the stacked lowering.

Caveat (why this is guarded): mixing Pallas custom calls with int8
convolutions in one XLA program was a measured ~10x pathology for the
flash-attention kernel (PERF.md).  `tools/probe_stem_pallas.py` measures
this kernel standalone AND inside an int8 conv chain before it is
enabled anywhere; `stem_conv3d_enabled` is the trace-time switch.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: OFF by default: the kernel body is numerically correct (interpreter
#: test in tests/test_pallas_kernels.py) but real Mosaic rejects the
#: in-kernel minor-dim unfold `(bh, W*C) -> (bh, W, C)` as an
#: unsupported vector shape cast (measured 2026-08-17, jax 0.9 /
#: v5e: "infer-vector-layout: unsupported shape cast ... vector<8x3840
#: xbf16> -> vector<8x1280x3xbf16>").  The tap matrix needs taps in the
#: minor dim while the source is positions-minor — a relayout Mosaic
#: cannot express cheaply today.  See tools/probe_stem_pallas.py for
#: the measurement and PERF.md for the writeup.
_ENABLED = False


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
    if kernel.shape[3] > 4 or x.shape[0] != 1:
        return False
    # W-axis edge padding would break the contiguous fold; zero is fine
    if spec.modes[2] != "zero":
        return False
    h_out = x.shape[2] + spec.pads[1][0] + spec.pads[1][1] - 2
    if h_out % 8 or x.ndim != 5:
        return False
    return jax.devices()[0].platform == "tpu"


def _stem_kernel(x_hbm, w_ref, b_ref, o_ref, xbuf, sem, *, bh, w_out, c_in):
    """Grid step (t, i): output rows [i*bh, i*bh+bh) of frame t.

    Layout strategy (constraints Mosaic actually supports — the v1
    folded-W design died on an `(bh, W*C) -> (bh, W, C)` minor-dim
    vector cast):
      * channels are split at the DMA level: one strided HBM->VMEM copy
        per input channel (rectangular slice with unit last-dim extent),
        so in VMEM every plane is W-minor and every tap slice is
        contiguous-with-offset;
      * the (taps, W) matrix is built with SUBLANE concats of (1, W)
        rows — no minor-dim reshapes;
      * the contraction is dot_general over dim 0 of both operands
        (A^T B), depth kT*kH*kW*Cin, fp32 accumulation, one dot per
        output row.
    """
    t = pl.program_id(0)
    i = pl.program_id(1)
    for c in range(c_in):
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(t, 3), pl.ds(i * bh, bh + 2), :, c],
            xbuf.at[c], sem)
        cp.start()
        cp.wait()
    for h in range(bh):
        rows = []
        for dt in range(3):
            for dh in range(3):
                for dw in range(3):
                    for c in range(c_in):
                        rows.append(xbuf[c, dt, h + dh, dw:dw + w_out][None])
        z = jnp.concatenate(rows, axis=0)            # (27*C, W)
        y = jax.lax.dot_general(
            z, w_ref[:, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (W, Cout)
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
    # padding folds into the contiguous minor dim
    widths = [(0, 0)] + [tuple(p) for p in pads] + [(0, 0)]
    ew = [(0, 0)] * 5
    zw = [(0, 0)] * 5
    for ax, mode in enumerate(modes):
        (ew if mode == "edge" else zw)[1 + ax] = widths[1 + ax]
    xp = x
    if any(p != (0, 0) for p in ew):
        xp = jnp.pad(xp, ew, mode="edge")
    if any(p != (0, 0) for p in zw):
        xp = jnp.pad(xp, zw)
    _, t_p, h_p, w_p, _ = xp.shape
    t_out, h_out, w_out = t_p - 2, h_p - 2, w_p - 2

    bh = block_h
    assert h_out % bh == 0, (h_out, bh)
    w2 = kernel.reshape(27 * c_in, c_out)
    grid = (t_out, h_out // bh)
    out = pl.pallas_call(
        functools.partial(_stem_kernel, bh=bh, w_out=w_out, c_in=c_in),
        out_shape=jax.ShapeDtypeStruct((t_out, h_out, w_out, c_out),
                                       x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # manual DMA
            pl.BlockSpec((27 * c_in, c_out), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, w_out, c_out),
                               lambda t, i: (t, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c_in, 3, bh + 2, w_p), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp[0], w2, bias.reshape(1, c_out))
    return out[None]


def stem_conv3d(x: jax.Array, kernel: jax.Array, bias, spec,
                interpret: bool = False) -> jax.Array:
    """Drop-in for the stem path of ops.conv.conv3d (bias included)."""
    b = bias if bias is not None else jnp.zeros((kernel.shape[4],),
                                                x.dtype)
    return _stem_call(x, kernel, b.astype(x.dtype),
                      pads=tuple(tuple(p) for p in spec.pads),
                      modes=tuple(spec.modes), interpret=interpret)
