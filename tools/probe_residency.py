"""Probe: int8 activation residency vs bf16-resident int8 convs.

Times a 3-resblock chain (the decoder's per-level hot pattern:
GN+SiLU -> conv3x3x3 -> GN+SiLU -> conv1x3x3 -> residual add) at the
v1 decoder stage shapes, three ways:

  bf16       — bf16 activations, bf16 convs
  int8-conv  — bf16 activations, calibrated int8 convs (today's mode)
  int8-res   — int8-resident activations end to end (ops/qflow.py)

and reports ms/block.  Also checks agreement (dB) of each mode vs the
fp32 chain on a downscaled shape so the perf numbers come with a
sanity-checked numerics tag.

Usage: PYTHONPATH="$PYTHONPATH:." python tools/probe_residency.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from cvvae_tpu.ops import qflow
from cvvae_tpu.ops.conv import Conv3DSpec, conv3d, conv_init
from cvvae_tpu.ops.norm import group_norm, norm_init
from cvvae_tpu.ops.quant import (attach_activation_scales, calibration_scope,
                                 quantize_conv_params)
from cvvae_tpu.ops.activations import silu

SPEC1 = Conv3DSpec.v1_plain()          # decoder is non-causal: zero pads
SPEC2 = Conv3DSpec.spatial2d()
GROUPS, EPS = 32, 1e-5
N_BLOCKS = 3


def init_blocks(key, c, dtype):
    ks = jax.random.split(key, 2 * N_BLOCKS)
    blocks = []
    for i in range(N_BLOCKS):
        blocks.append({
            "norm1": norm_init(c, dtype),
            "conv1": conv_init(ks[2 * i], SPEC1, c, c, dtype),
            "norm2": norm_init(c, dtype),
            "conv2": conv_init(ks[2 * i + 1], SPEC2, c, c, dtype),
        })
    return blocks


def run_bf16(blocks, x):
    h = x
    for blk in blocks:
        r = group_norm(h, blk["norm1"], num_groups=GROUPS, eps=EPS)
        r = silu(r)
        r = conv3d(r, blk["conv1"], SPEC1)
        r = group_norm(r, blk["norm2"], num_groups=GROUPS, eps=EPS)
        r = silu(r)
        r = conv3d(r, blk["conv2"], SPEC2)
        h = h + r
    return h


def run_qres(blocks, x):
    """int8 residency: x enters as a QTensor, leaves as one."""
    h = qflow.requant(x.astype(jnp.float32), blocks[0]["scale_entry"])
    for blk in blocks:
        r = qflow.qgroup_norm_silu(h, blk["norm1"], num_groups=GROUPS,
                                   eps=EPS, out_scale=blk["conv1"]["scale_x"])
        r = qflow.qconv3d(r, blk["conv1"], SPEC1,
                          out_scale=blk["conv1"]["scale_y"])
        r = qflow.qgroup_norm_silu(r, blk["norm2"], num_groups=GROUPS,
                                   eps=EPS, out_scale=blk["conv2"]["scale_x"])
        r = qflow.qconv3d(r, blk["conv2"], SPEC2,
                          out_scale=blk["conv2"]["scale_y"])
        h = qflow.qadd(h, r, blk["scale_res"])
    return qflow.dequant(h, jnp.bfloat16)


def calibrate_residency(qblocks, x):
    """Static scales for the residency chain, recorded eagerly on x."""
    h = x.astype(jnp.float32)
    out = []
    for blk in qblocks:
        blk = dict(blk)
        blk["scale_entry"] = jnp.float32(
            float(jnp.max(jnp.abs(h))) / 127.0)
        r = group_norm(h, blk["norm1"], num_groups=GROUPS, eps=EPS)
        r = silu(r)
        r = conv3d(r, blk["conv1"], SPEC1)
        blk["conv1"] = dict(blk["conv1"], scale_y=jnp.asarray(
            jnp.max(jnp.abs(r), axis=(0, 1, 2, 3)) / 127.0, jnp.float32))
        r = group_norm(r, blk["norm2"], num_groups=GROUPS, eps=EPS)
        r = silu(r)
        r = conv3d(r, blk["conv2"], SPEC2)
        blk["conv2"] = dict(blk["conv2"], scale_y=jnp.asarray(
            jnp.max(jnp.abs(r), axis=(0, 1, 2, 3)) / 127.0, jnp.float32))
        h = h + r
        blk["scale_res"] = jnp.asarray(
            jnp.max(jnp.abs(h), axis=(0, 1, 2, 3)) / 127.0, jnp.float32)
        out.append(blk)
    return out


def timed(name, fn, x, iters=4):
    jf = jax.jit(lambda v: jnp.sum(fn(v).astype(jnp.float32)))
    float(jf(x))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jf(x))
        best = min(best, time.perf_counter() - t0)
    print(f"    {name:<12s} {best * 1e3 / N_BLOCKS:8.2f} ms/block "
          f"(total {best * 1e3:7.1f} ms)", flush=True)
    return best


def agreement_db(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    mse = float(np.mean((a - b) ** 2))
    sig = float(np.mean(b ** 2))
    return 10 * np.log10(sig / max(mse, 1e-12))


def main():
    from cvvae_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    key = jax.random.PRNGKey(0)

    # numerics sanity at a small shape (fp32 reference on this device)
    c = 128
    xs = jax.random.normal(key, (1, 5, 96, 96, c), jnp.float32)
    blocks = init_blocks(key, c, jnp.float32)
    ref = run_bf16(blocks, xs)
    qb = quantize_conv_params(blocks, min_cin=64)
    with calibration_scope() as rec:
        run_bf16(qb, xs.astype(jnp.bfloat16))
    qb = attach_activation_scales(qb, rec)
    int8conv = run_bf16(qb, xs.astype(jnp.bfloat16))
    rb = calibrate_residency(qb, xs)
    qres = run_qres(rb, xs.astype(jnp.bfloat16))
    print(f"numerics vs fp32 chain (small shape): "
          f"bf16-int8conv {agreement_db(int8conv, ref):.1f} dB, "
          f"int8-residency {agreement_db(qres, ref):.1f} dB")

    for name, shape in [("blocks0 (17,720,672,128)", (1, 17, 720, 672, 128)),
                        ("blocks1 (17,360,336,256)", (1, 17, 360, 336, 256))]:
        cc = shape[-1]
        x = jax.random.normal(key, shape, jnp.bfloat16)
        blocks = init_blocks(key, cc, jnp.bfloat16)
        print(f"{name}:")
        timed("bf16", lambda v, b=blocks: run_bf16(b, v), x)
        qb = quantize_conv_params(blocks, min_cin=64)
        with calibration_scope() as rec:
            run_bf16(qb, x[:, :3, :256, :256])
        qb = attach_activation_scales(qb, rec)
        timed("int8-conv", lambda v, b=qb: run_bf16(b, v), x)
        rb = calibrate_residency(qb, x[:, :3, :256, :256])
        timed("int8-res", lambda v, b=rb: run_qres(b, v), x)


if __name__ == "__main__":
    main()
