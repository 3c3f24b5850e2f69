"""Numerics tests for int8 activation *residency* (ops/qflow.py).

qflow is measured, documented infrastructure (PERF.md round 4: slower
AND noisier than the shipping bf16-resident int8-conv mode on this
chip, so it is not wired into the serving path) — but like the gated
Pallas kernels it stays tested so the measurement can be reproduced
and the module reused if the tradeoff flips on other hardware.
"""

import numpy as np

import jax
import jax.numpy as jnp

from cvvae_tpu.ops import qflow
from cvvae_tpu.ops.conv import Conv3DSpec, conv3d, conv_init
from cvvae_tpu.ops.norm import group_norm, norm_init
from cvvae_tpu.ops.activations import silu
from cvvae_tpu.ops.quant import quantize_conv_params

SPEC = Conv3DSpec.v1_plain()
GROUPS, EPS = 8, 1e-5


def _agreement_db(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    mse = float(np.mean((a - b) ** 2))
    sig = float(np.mean(b ** 2))
    return 10 * np.log10(sig / max(mse, 1e-12))


def _qtensor(x, scale=None):
    xf = jnp.asarray(x, jnp.float32)
    if scale is None:
        scale = jnp.float32(float(jnp.max(jnp.abs(xf))) / 127.0)
    return qflow.requant(xf, scale)


def test_qconv3d_matches_fp_conv():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 3, 16, 16, 64), jnp.float32)
    params = conv_init(jax.random.PRNGKey(1), SPEC, 64, 64, jnp.float32)
    ref = conv3d(x, params, SPEC)
    qp = quantize_conv_params({"c": params}, min_cin=64)["c"]
    xq = _qtensor(x)
    out = qflow.qconv3d(xq, qp, SPEC, out_dtype=jnp.float32)
    assert _agreement_db(out, ref) > 35.0


def test_qconv3d_requantized_output_roundtrip():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (1, 3, 16, 16, 64), jnp.float32)
    params = conv_init(jax.random.PRNGKey(3), SPEC, 64, 32, jnp.float32)
    ref = conv3d(x, params, SPEC)
    qp = quantize_conv_params({"c": params}, min_cin=64, min_cout=16)["c"]
    out_scale = jnp.asarray(
        jnp.max(jnp.abs(ref), axis=(0, 1, 2, 3)) / 127.0, jnp.float32)
    y = qflow.qconv3d(_qtensor(x), qp, SPEC, out_scale=out_scale)
    assert isinstance(y, qflow.QTensor)
    assert y.q.dtype == jnp.int8
    assert _agreement_db(qflow.dequant(y), ref) > 30.0


def test_qconv3d_fold_per_channel_input_scale():
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (1, 3, 16, 16, 64), jnp.float32)
    # per-channel spread so a per-tensor scale would be visibly worse
    x = x * (0.1 + jnp.arange(64, dtype=jnp.float32) / 16.0)
    params = conv_init(jax.random.PRNGKey(5), SPEC, 64, 64, jnp.float32)
    ref = conv3d(x, params, SPEC)
    s_in = jnp.asarray(jnp.max(jnp.abs(x), axis=(0, 1, 2, 3)) / 127.0,
                       jnp.float32)
    xq = qflow.requant(x, s_in)
    out = qflow.qconv3d_fold(xq, params["kernel"], params.get("bias"),
                             SPEC, out_dtype=jnp.float32)
    assert _agreement_db(out, ref) > 35.0


def test_qgroup_norm_silu_matches_fp():
    key = jax.random.PRNGKey(6)
    x = jax.random.normal(key, (1, 3, 16, 16, 64), jnp.float32) * 2.0
    p = norm_init(64, jnp.float32)
    p = {"scale": p["scale"] + 0.3, "bias": p["bias"] - 0.1}
    ref = silu(group_norm(x, p, num_groups=GROUPS, eps=EPS))
    out = qflow.qgroup_norm_silu(_qtensor(x), p, num_groups=GROUPS,
                                 eps=EPS, out_dtype=jnp.float32)
    assert _agreement_db(out, ref) > 35.0
    # int8-out mode
    out_scale = jnp.float32(float(jnp.max(jnp.abs(ref))) / 127.0)
    y = qflow.qgroup_norm_silu(_qtensor(x), p, num_groups=GROUPS,
                               eps=EPS, out_scale=out_scale)
    assert y.q.dtype == jnp.int8
    assert _agreement_db(qflow.dequant(y), ref) > 30.0


def test_qadd_residual():
    key = jax.random.PRNGKey(7)
    a = jax.random.normal(key, (1, 2, 8, 8, 16), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(8), a.shape, jnp.float32)
    ref = a + b
    out_scale = jnp.asarray(jnp.max(jnp.abs(ref), axis=(0, 1, 2, 3)) / 127.0,
                            jnp.float32)
    y = qflow.qadd(_qtensor(a), _qtensor(b), out_scale)
    assert _agreement_db(qflow.dequant(y), ref) > 30.0


def test_residency_chain_agreement():
    """The 2-resblock residency chain holds >=28 dB vs the fp32 chain
    (the measured on-device figure at 128ch/96px was 30.8 dB —
    PERF.md round 4; it loses ~4 dB to the conv-only int8 mode, one of
    the two reasons residency is not the shipping mode)."""
    from cvvae_tpu.ops.quant import attach_activation_scales, calibration_scope

    key = jax.random.PRNGKey(9)
    c = 64
    spec2 = Conv3DSpec.spatial2d()
    x = jax.random.normal(key, (1, 3, 24, 24, c), jnp.float32)
    ks = jax.random.split(key, 4)
    blocks = [{
        "norm1": norm_init(c, jnp.float32),
        "conv1": conv_init(ks[2 * i], SPEC, c, c, jnp.float32),
        "norm2": norm_init(c, jnp.float32),
        "conv2": conv_init(ks[2 * i + 1], spec2, c, c, jnp.float32),
    } for i in range(2)]

    def run_fp(blocks, h):
        for blk in blocks:
            r = silu(group_norm(h, blk["norm1"], num_groups=GROUPS, eps=EPS))
            r = conv3d(r, blk["conv1"], SPEC)
            r = silu(group_norm(r, blk["norm2"], num_groups=GROUPS, eps=EPS))
            r = conv3d(r, blk["conv2"], spec2)
            h = h + r
        return h

    ref = run_fp(blocks, x)
    qb = quantize_conv_params(blocks, min_cin=64)
    with calibration_scope() as rec:
        run_fp(qb, x.astype(jnp.bfloat16))
    qb = attach_activation_scales(qb, rec)

    # residency scales from an eager fp pass (probe_residency.py scheme)
    h = x
    rb = []
    for blk in qb:
        blk = dict(blk)
        blk["scale_entry"] = jnp.float32(float(jnp.max(jnp.abs(h))) / 127.0)
        r = silu(group_norm(h, blk["norm1"], num_groups=GROUPS, eps=EPS))
        r = conv3d(r, blk["conv1"], SPEC)
        blk["conv1"] = dict(blk["conv1"], scale_y=jnp.asarray(
            jnp.max(jnp.abs(r), axis=(0, 1, 2, 3)) / 127.0, jnp.float32))
        r = silu(group_norm(r, blk["norm2"], num_groups=GROUPS, eps=EPS))
        r = conv3d(r, blk["conv2"], spec2)
        blk["conv2"] = dict(blk["conv2"], scale_y=jnp.asarray(
            jnp.max(jnp.abs(r), axis=(0, 1, 2, 3)) / 127.0, jnp.float32))
        h = h + r
        blk["scale_res"] = jnp.asarray(
            jnp.max(jnp.abs(h), axis=(0, 1, 2, 3)) / 127.0, jnp.float32)
        rb.append(blk)

    hq = qflow.requant(x, rb[0]["scale_entry"])
    for blk in rb:
        r = qflow.qgroup_norm_silu(hq, blk["norm1"], num_groups=GROUPS,
                                   eps=EPS, out_scale=blk["conv1"]["scale_x"])
        r = qflow.qconv3d(r, blk["conv1"], SPEC,
                          out_scale=blk["conv1"]["scale_y"])
        r = qflow.qgroup_norm_silu(r, blk["norm2"], num_groups=GROUPS,
                                   eps=EPS, out_scale=blk["conv2"]["scale_x"])
        r = qflow.qconv3d(r, blk["conv2"], spec2,
                          out_scale=blk["conv2"]["scale_y"])
        hq = qflow.qadd(hq, r, blk["scale_res"])
    out = qflow.dequant(hq)
    assert _agreement_db(out, ref) > 28.0
