"""Attention primitives for the VAE mid-blocks.

All attention in CV-VAE is *single-head* self-attention over either the
spatial tokens of one frame (encoder + SD3 mid-block,
[models/vae_models.py:473-537], [models/vae_blocks3d_sd3.py:119-147]) or
the temporal tokens of one pixel (v1 decoder,
[models/vae_models.py:540-629]).  The q/k/v projections are 1x1 convs or
Linears — identical math: a dense over the channel axis.

Numerics: logits and softmax in float32 (the reference upcasts softmax,
and SDPA/xformers accumulate fp32), output cast back to input dtype.

For long spatial sequences (a 576px tile at /8 is 72*72=5184 tokens of
width 512) a naive implementation materialises an (S, S) score matrix per
frame; ``query_chunk_size`` bounds that via a lax.scan over query blocks
(numerically exact — full-row softmax per block).
"""

from __future__ import annotations

import contextlib
import math
from typing import Optional

import jax
import jax.numpy as jnp


def dense(x: jax.Array, params: dict) -> jax.Array:
    """y = x @ W + b with W stored (in, out); works on (..., C) input."""
    w = params["kernel"].astype(x.dtype)
    y = jnp.einsum("...i,io->...o", x, w)
    b = params.get("bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def dense_init(key: jax.Array, c_in: int, c_out: int, use_bias: bool = True,
               dtype=jnp.float32) -> dict:
    """torch nn.Linear default init."""
    bound = 1.0 / math.sqrt(c_in)
    k_w, k_b = jax.random.split(key)
    p = {"kernel": jax.random.uniform(k_w, (c_in, c_out), dtype, -bound, bound)}
    if use_bias:
        p["bias"] = jax.random.uniform(k_b, (c_out,), dtype, -bound, bound)
    return p


def _attention_block(q_blk: jax.Array, k: jax.Array, v: jax.Array,
                     scale: float) -> jax.Array:
    """Exact attention for one query block.  q_blk:(B,Sq,C) k,v:(B,S,C)."""
    logits = jnp.einsum("bqc,bkc->bqk", q_blk, k,
                        preferred_element_type=jnp.float32) * scale
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bqk,bkc->bqc", weights.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     scale: float) -> jax.Array:
    """Pallas TPU flash attention for the single-head mid-blocks.

    XLA's unfused path materialises the (S, S) fp32 score matrix — at a
    90px latent tile that is ~1.3GB and dominates the whole mid block
    (~165ms measured vs ~6ms flash).  Sequences are padded to a lane
    multiple and masked out via segment ids; accumulation stays fp32
    inside the kernel.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)
    b, s, c = q.shape
    s_pad = -(-s // 512) * 512
    if s_pad != s:
        pad = ((0, 0), (0, s_pad - s), (0, 0))
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
        seg = jnp.where(jnp.arange(s_pad) < s, 1, 2).astype(jnp.int32)
        seg = jnp.broadcast_to(seg, (b, s_pad))
        segment_ids = SegmentIds(q=seg, kv=seg)
    else:
        segment_ids = None
    out = flash_attention(q[:, None], k[:, None], v[:, None],
                          segment_ids=segment_ids, sm_scale=scale)
    return out[:, 0, :s]


#: Flash is OPT-IN, not the default.  Measured on v5e at the mid-block
#: shape (5, ~8100, 512): query-blocked exact q=512 ~4 ms vs the Pallas
#: flash custom call ~9 ms (PERF.md "attention variants"; re-confirmed
#: round 3 in-situ: apply_attn 9.7 ms exact vs 14.6 ms flash at
#: (5,90,84,512), tools/probe_dec_lowres.py).  Single-head C=512 rows
#: are wide enough that the XLA scan already streams at MXU rate, and
#: flash pays padding-to-512-multiples + custom-call layout boundaries.
#: Keeping no custom call in the program also removes the int8
#: coexistence pathology entirely (int8 + flash measured ~10x,
#: PERF.md).
_FLASH_MODE = "off"    # "off" | "on"


@contextlib.contextmanager
def no_flash_attention():
    """Trace-time switch to the exact/chunked attention path.

    An XLA program that mixes int8 convolutions with the Pallas flash
    kernel is ~10x slower end-to-end on v5e (measured: the quantized v1
    encoder at a 576px tile runs 2.4 s with flash vs 210 ms with exact
    attention — layout assignment around the custom call thrashes every
    conv).  The quantized VideoVAE wraps its traced functions in this
    context; exact attention at the mid-block sizes costs only a few ms.
    """
    global _FLASH_MODE
    prev = _FLASH_MODE
    _FLASH_MODE = "off"
    try:
        yield
    finally:
        _FLASH_MODE = prev


@contextlib.contextmanager
def flash_attention_enabled():
    """Trace-time opt-in to the Pallas flash kernel (benchmarks/tests;
    slower than the q=512 exact path at this model's shapes — see
    _FLASH_MODE note)."""
    global _FLASH_MODE
    prev = _FLASH_MODE
    _FLASH_MODE = "on"
    try:
        yield
    finally:
        _FLASH_MODE = prev


def _flash_usable(q: jax.Array) -> bool:
    if _FLASH_MODE != "on":
        return False
    if q.dtype != jnp.bfloat16 or q.shape[1] < 1024:
        return False
    platform = jax.devices()[0].platform
    return platform not in ("cpu",)


def _me_attention(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
                  q_chunk: int = 512) -> jax.Array:
    """Memory-efficient exact attention in pure XLA (no custom call).

    Flash-style query blocking via lax.scan with a full-row softmax per
    block — never materialises the (S, S) score matrix, so it stays fast
    inside programs where the Pallas kernel cannot be used (the int8
    path, CPU).  Numerically exact (fp32 logits/softmax).  S is padded
    to a q_chunk multiple; padded QUERY rows produce garbage rows that
    are sliced off (keys are never padded, so valid rows see the true
    distribution).
    """
    b, s, c = q.shape
    s_pad = -(-s // q_chunk) * q_chunk
    q_p = jnp.pad(q, ((0, 0), (0, s_pad - s), (0, 0))) if s_pad != s else q
    n_blocks = s_pad // q_chunk
    q_blocks = jnp.moveaxis(
        q_p.reshape(b, n_blocks, q_chunk, c), 1, 0)

    def body(carry, q_blk):
        return carry, _attention_block(q_blk, k, v, scale)

    _, out = jax.lax.scan(body, None, q_blocks)
    out = jnp.moveaxis(out, 0, 1).reshape(b, s_pad, c)
    return out[:, :s]


def single_head_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                          scale: Optional[float] = None,
                          query_chunk_size: int = 512) -> jax.Array:
    """Single-head scaled dot-product attention on (B, S, C) tensors."""
    s = q.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if _flash_usable(q):
        return _flash_attention(q, k, v, scale)
    if s <= query_chunk_size:
        return _attention_block(q, k, v, scale)
    return _me_attention(q, k, v, scale, query_chunk_size)


def spatial_self_attention(x: jax.Array, wq: dict, wk: dict, wv: dict, *,
                           query_chunk_size: int = 512) -> jax.Array:
    """Per-frame single-head spatial attention.

    x: (B, T, H, W, C) -> same shape.  Projections are channel-denses
    (== 1x1 convs).  Caller applies pre-norm and output projection.
    """
    b, t, h, w, c = x.shape
    tokens = x.reshape(b * t, h * w, c)
    q = dense(tokens, wq)
    k = dense(tokens, wk)
    v = dense(tokens, wv)
    out = single_head_attention(q, k, v, query_chunk_size=query_chunk_size)
    return out.reshape(b, t, h, w, c)


def temporal_self_attention(x: jax.Array, wq: dict, wk: dict, wv: dict) -> jax.Array:
    """Per-pixel single-head temporal attention ((b h w) t c grouping).

    Ref: models/vae_models.py:573-587,626-628.
    """
    b, t, h, w, c = x.shape
    tokens = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, c)
    q = dense(tokens, wq)
    k = dense(tokens, wk)
    v = dense(tokens, wv)
    out = single_head_attention(q, k, v)
    out = out.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)
    return out
