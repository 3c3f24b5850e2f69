"""Fused GroupNorm(+SiLU) as a Pallas TPU kernel.

Two-phase grid over (batch, phase, row-blocks) on an (B, S, C) view of
the video tensor (S = T*H*W):

* phase 0 streams the tensor once, accumulating per-(batch, group)
  sums / sum-of-squares in fp32 VMEM scratch (per-channel column sums
  reduced to groups with a one-hot matmul — lane-dim reshapes of skinny
  vectors are TPU-hostile, an MXU matmul is not);
* phase 1 streams it again, applying the folded affine
  ``x * (inv*scale) + (bias - mean*inv*scale)`` and optional SiLU in
  the input dtype.

Same asymptotic traffic as XLA's reduce+elementwise pipeline (2 reads +
1 write is the floor for a two-pass norm).  Measured on v5e at the
level-0 shape (17,288,288,128) bf16: XLA 304 GB/s vs this kernel
198 GB/s — XLA's fused pipeline wins, so the model code keeps the XLA
path and this kernel is NOT wired in by default.  It remains as tested
infrastructure (the accumulate-over-grid + one-hot-matmul group
reduction pattern) for deeper fusions where XLA does have structural
gaps.  Returns None for shapes without an aligned row-block divisor.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, scale_ref, bias_ref, y_ref, stats_ref, *,
            num_groups: int, eps: float, n_true: int, silu: bool):
    phase = pl.program_id(1)
    s_idx = pl.program_id(2)
    c = x_ref.shape[-1]
    cg = c // num_groups

    # (C, G) one-hot group-membership matrix
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    member = (ch // cg == grp).astype(jnp.float32)

    @pl.when(jnp.logical_and(phase == 0, s_idx == 0))
    def _init():
        stats_ref[...] = jnp.zeros_like(stats_ref)

    @pl.when(phase == 0)
    def _accumulate():
        blk = x_ref[0].astype(jnp.float32)                  # (S_blk, C)
        colsum = jnp.sum(blk, axis=0, keepdims=True)         # (1, C)
        colsq = jnp.sum(blk * blk, axis=0, keepdims=True)
        stats_ref[0:1, :] += jnp.dot(colsum, member,
                                     preferred_element_type=jnp.float32)
        stats_ref[1:2, :] += jnp.dot(colsq, member,
                                     preferred_element_type=jnp.float32)

    @pl.when(phase == 1)
    def _normalize():
        n = jnp.float32(n_true)
        mean_g = stats_ref[0:1, :] / n                       # (1, G)
        var_g = stats_ref[1:2, :] / n - mean_g * mean_g
        inv_g = jax.lax.rsqrt(var_g + eps)
        # broadcast group stats back to channels: (1,G) @ (G,C)
        mean_c = jnp.dot(mean_g, member.T,
                         preferred_element_type=jnp.float32)
        inv_c = jnp.dot(inv_g, member.T,
                        preferred_element_type=jnp.float32)
        scale = scale_ref[...].astype(jnp.float32)
        bias = bias_ref[...].astype(jnp.float32)
        a = (inv_c * scale)
        b = (bias - mean_c * inv_c * scale)
        blk = x_ref[0].astype(jnp.float32)
        out = blk * a + b
        if silu:
            out = out * jax.nn.sigmoid(out)
        y_ref[0] = out.astype(y_ref.dtype)


def _pick_block(s: int) -> Optional[int]:
    for blk in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if s % blk == 0:
            return blk
    return None


def group_norm_silu_pallas(x: jax.Array, scale: jax.Array, bias: jax.Array, *,
                           num_groups: int = 32, eps: float = 1e-6,
                           silu: bool = True,
                           interpret: bool = False) -> Optional[jax.Array]:
    """Fused GN(+SiLU) on (B, ..., C).  Returns None if the shape lacks an
    aligned row-block divisor (caller falls back to the XLA path)."""
    orig_shape = x.shape
    b, c = x.shape[0], x.shape[-1]
    s = 1
    for d in x.shape[1:-1]:
        s *= d
    s_blk = _pick_block(s)
    if s_blk is None or c % num_groups or c % 128:
        return None
    xv = x.reshape(b, s, c)
    n_true = s * (c // num_groups)

    kernel = functools.partial(_kernel, num_groups=num_groups, eps=eps,
                               n_true=n_true, silu=silu)
    grid = (b, 2, s // s_blk)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, s_blk, c), lambda b_, p, s_: (b_, s_, 0)),
            pl.BlockSpec((1, c), lambda b_, p, s_: (0, 0)),
            pl.BlockSpec((1, c), lambda b_, p, s_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s_blk, c), lambda b_, p, s_: (b_, s_, 0)),
        out_shape=jax.ShapeDtypeStruct(xv.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((2, num_groups), jnp.float32)],
        interpret=interpret,
    )(xv, scale.reshape(1, c), bias.reshape(1, c))
    return out.reshape(orig_shape)
