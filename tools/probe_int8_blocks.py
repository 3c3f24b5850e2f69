"""Probe: are the big decoder convs actually at the int8 roofline?

The measured chip rates are 124 TFLOP/s bf16 matmul and 183 TOP/s int8
(tools/bench_matmul_peak.py).  This times the dominant conv shapes of
the 720x672-tile decoder (blocks0 / up1 / blocks1) as isolated in-jit
chains, bf16 vs calibrated int8, and prints achieved TOP/s so the
"conv stack at roofline" claim in PERF.md is checked against the
hardware number, not the end-to-end fps.

Usage: PYTHONPATH="$PYTHONPATH:." python tools/probe_int8_blocks.py
"""

import time

import jax
import jax.numpy as jnp

from cvvae_tpu.ops.conv import Conv3DSpec, conv3d
from cvvae_tpu.ops.quant import attach_activation_scales, calibration_scope, \
    quantize_conv_params


def timed(name, fn, *args, iters=3, chain=3, flops=None):
    jf = jax.jit(fn)
    float(jf(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jf(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / chain
    rate = f"  {flops / per / 1e12:7.1f} T/s" if flops else ""
    print(f"  {name:<40s} {per*1000:8.2f} ms/call{rate}", flush=True)
    return per


def chain3(fn):
    """Feed each conv's (ReLU'd) output into the next call: a LINEAR
    chain (x + eps_i) lets XLA's algebraic simplifier collapse
    sum(conv(x)) into a reduction against the summed kernel — measured
    "336 TFLOP/s", i.e. not a measurement.  Requires cin == cout."""
    def run(x):
        h = x
        for _ in range(3):
            h = jax.nn.relu(fn(h)) + 1e-3
        return jnp.sum(h.astype(jnp.float32))
    return run


def main():
    from cvvae_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    spec = Conv3DSpec((3, 3, 3), (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
                      ("zero", "zero", "zero"))

    shapes = [
        ("blocks0 conv (17,720,672,128)->128", (1, 17, 720, 672, 128), 128),
        ("blocks1 conv (17,360,336,256)->256", (1, 17, 360, 336, 256), 256),
        ("blocks2 conv (9,180,168,512)->512", (1, 9, 180, 168, 512), 512),
        ("mid conv     (5,90,84,512)->512", (1, 5, 90, 84, 512), 512),
    ]
    for name, shape, cout in shapes:
        cin = shape[-1]
        x = jax.random.normal(key, shape, dt)
        k = jax.random.normal(key, (3, 3, 3, cin, cout), dt) * 0.02
        p = {"kernel": k, "bias": jnp.zeros((cout,), dt)}
        pos = shape[1] * shape[2] * shape[3]
        flops = 2 * 27 * cin * cout * pos * 3  # x3 chain
        print(f"{name}:")
        timed("bf16", chain3(lambda v, p=p: conv3d(v, p, spec)), x,
              flops=flops)
        qp = quantize_conv_params({"c": p}, min_cin=64)
        with calibration_scope() as rec:
            conv3d(x, qp["c"], spec)
        qp = attach_activation_scales(qp, rec)
        timed("int8 (calibrated static scales)",
              chain3(lambda v, qp=qp: conv3d(v, qp["c"], spec)), x,
              flops=flops)


if __name__ == "__main__":
    main()
