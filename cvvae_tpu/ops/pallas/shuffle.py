"""Pallas subpixel-interleave kernel for the decoder upsample stages.

The decoder's fused upsample (ops/upsample_conv.py::
upsample2x_conv3x3_interleave; reference Upsample3D,
models/vae_models.py:198-235) ends in a shuffle that interleaves the
four phase-conv outputs into the 2x-upsampled frame and splits the
``n*c`` channel groups onto the time axis.  XLA lowers that
stack+transpose+reshape to ONE fused HBM pass — but a *fine-grained*
one: each output (2W, c) row gathers alternately from two phase arrays
in c-element chunks, and the measured rate is ~124 GB/s over ~9.4 GB at
the dec_upsample1 shape (tools/probe_upsample1.py; PERF.md round 4) —
5x under the clean-stream rate, ~40 ms/tile of headroom, the one
remaining named lever on the serving headline.

This kernel does the same data movement VMEM-tiled: the grid walks
(output frame, H band); each step DMAs four (bh, W, c) phase bands into
VMEM, interleaves them with in-register sublane shuffles (W first, then
H), adds the bias, and writes one (2bh, 2W, c) output band — every HBM
touch is a full contiguous band, so the pass runs at stream rate
instead of the gather rate.

The temporal part costs nothing here: the ``n``-way channel->time split
and the drop-first-frame contract (vae_models.py:230-232) fold into the
BlockSpec index maps — output frame ``t_out`` reads phase block
``(t, j) = divmod(t_out + drop, n)`` with the channel axis blocked in
``c``-sized groups, so no separate time-transpose pass exists at all.

Numerics: bit-identical to the XLA shuffle (a pure permutation + the
same bias add; pinned in tests/test_pallas_shuffle.py).

Like the other Pallas kernels in this package the wiring is gated —
see PERF.md for the measured in-chain A/B and the shipping decision.
"""

from __future__ import annotations

import contextlib
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Trace-time switch, env-overridable for A/B runs
#: (CVVAE_PALLAS_SHUFFLE=0/1); the context managers override in-process.
_ENABLED = os.environ.get("CVVAE_PALLAS_SHUFFLE", "0") == "1"

#: Run the kernel in the Pallas interpreter (numerics tests on CPU,
#: where no Mosaic backend exists).
_INTERPRET = False


@contextlib.contextmanager
def pallas_shuffle():
    """Trace-time opt-in (probes/tests/A-B runs)."""
    global _ENABLED
    prev = _ENABLED
    _ENABLED = True
    try:
        yield
    finally:
        _ENABLED = prev


@contextlib.contextmanager
def no_pallas_shuffle():
    global _ENABLED
    prev = _ENABLED
    _ENABLED = False
    try:
        yield
    finally:
        _ENABLED = prev


def shuffle_enabled() -> bool:
    return _ENABLED


def shuffle_usable(phases, n: int, c: int) -> bool:
    """Kernel applicability: serving-shape bands only.

    * batch 1 (the serving path; general B would just add a grid dim);
    * ``n*c`` channel groups split exactly (nc % n);
    * lane-aligned channel group (c % 128) so phase blocks slice the
      channel axis at lane boundaries;
    * the ACTUAL per-step VMEM footprint fits: this models the same
      (bh, bw) ``subpixel_interleave`` will pick at its defaults —
      4 phase blocks (bh, bw, c) + out (2bh, bw, 2c), double-buffered,
      plus the kernel's interleave temporaries (he/ho/stack ≈ another
      8·bh·bw·c) — an earlier guard modelled a bh=1 full-W band and
      admitted shapes whose real blocks overran the 16 MB scoped VMEM.
    """
    p = phases[0]
    if p.ndim != 5 or p.shape[0] != 1:
        return False
    if n < 1 or p.shape[4] % n != 0 or p.shape[4] // n != c:
        return False
    if c % 128 != 0:
        return False
    bh = 4
    while p.shape[2] % bh:
        bh //= 2
    bw = _pick_block_w(p.shape[3])
    # blocks double-buffered (16·bh·bw·c) + interleave temps (8·bh·bw·c)
    step_bytes = 24 * bh * bw * c * p.dtype.itemsize
    return step_bytes < 12 * 2 ** 20


def _interleave(x: jax.Array, y: jax.Array, axis: int) -> jax.Array:
    """(…, L, …) x2 -> (…, 2L, …): z[2i]=x[i], z[2i+1]=y[i] along axis.

    stack+reshape keeps the merge on non-lane dims (axis < rank-1), a
    relayout Mosaic handles in VMEM."""
    z = jnp.stack([x, y], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] *= 2
    return z.reshape(shape)


def _shuffle_kernel(p00, p01, p10, p11, o_ref):
    # W-interleave as a LANE-DIM CONCAT: (bw, c)+(bw, c) -> (bw, 2c)
    # whose row-major flatten is exactly (2bw, c) interleaved — c is a
    # lane-tile multiple so the concat moves whole (8,128) tiles, and
    # the flatten happens outside the kernel as a free bitcast.  The
    # first in-kernel attempt interleaved W in VMEM via stack+reshape
    # on the sublane dim; Mosaic's relayout scratch for that overran
    # the 16 MB scoped-VMEM limit at the dec_upsample1 shape.
    he = jnp.concatenate([p00[0, 0], p01[0, 0]], axis=-1)  # (bh, bw, 2c)
    ho = jnp.concatenate([p10[0, 0], p11[0, 0]], axis=-1)
    o_ref[0, 0] = _interleave(he, ho, axis=0)         # (2bh, bw, 2c)


def _pick_block_w(w: int, cap: int = 128) -> int:
    """Largest divisor of ``w`` that is a sublane multiple (%8) and at
    most ``cap``; falls back to ``w`` itself (legal: block == array
    dim).  Bounds the per-step VMEM footprint — the full-W blocks at
    the dec_upsample1 shape (W=360, c=256) overran the 16 MB scoped
    VMEM limit once the interleave relayout temporaries were counted."""
    for bw in range(min(cap, w), 7, -8):
        if bw % 8 == 0 and w % bw == 0:
            return bw
    return w


def subpixel_interleave(phases, bias, *, n: int, drop_first: bool = True,
                        block_h: int = 4, block_w: int | None = None,
                        interpret: bool = False) -> jax.Array:
    """Fused subpixel + channel->time interleave of four phase tensors.

    phases: 4 arrays (1, T, H, W, n*c) ordered (h_even,w_even),
    (h_even,w_odd), (h_odd,w_even), (h_odd,w_odd) — the
    ops/upsample_conv.py phase order.  bias: (n*c,) or None.
    Returns (1, n*T - drop, 2H, 2W, c), identical to the XLA
    stack/transpose/reshape tail of upsample2x_conv3x3_interleave.
    """
    b, t, h, w, nc = phases[0].shape
    assert b == 1, "serving path is batch-1"
    c = nc // n
    drop = 1 if (n > 1 and drop_first) else 0
    t_out = n * t - drop
    bh = block_h
    while h % bh:
        bh //= 2
    bw = block_w if block_w is not None else _pick_block_w(w)
    dtype = phases[0].dtype
    if bias is not None:
        # Pre-add the bias instead of passing it into the kernel (a
        # (n, c) bias block violates Mosaic's sublane-divisibility rule
        # for VMEM blocks).  In-chain this add fuses into the phase
        # convs' output epilogue, so it costs no extra HBM pass; the
        # adds are element-for-element those of the XLA shuffle tail,
        # so parity stays bitwise.
        bb = bias.astype(dtype)
        phases = [p + bb for p in phases]

    def phase_idx(ti, hi, wi):
        tau = ti + drop
        return (0, tau // n, hi, wi, tau % n)

    grid = (t_out, h // bh, w // bw)
    p_spec = pl.BlockSpec((1, 1, bh, bw, c), phase_idx,
                          memory_space=pltpu.VMEM)
    # Output is laid out (…, W, 2c) with the lane dim holding
    # [w_even_c | w_odd_c]; its row-major flatten IS (…, 2W, c)
    # interleaved, so the trailing reshape is a free bitcast.
    out = pl.pallas_call(
        _shuffle_kernel,
        grid=grid,
        in_specs=[p_spec, p_spec, p_spec, p_spec],
        out_specs=pl.BlockSpec((1, 1, 2 * bh, bw, 2 * c),
                               lambda ti, hi, wi: (0, ti, hi, wi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, t_out, 2 * h, w, 2 * c), dtype),
        interpret=interpret or _INTERPRET,
    )(*phases)
    return out.reshape(1, t_out, 2 * h, 2 * w, c)
