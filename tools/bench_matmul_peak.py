"""Microbench: practical MXU ceilings on this chip (bf16 / int8).

Establishes what fraction of the v5e's paper peak (197 TFLOP/s bf16,
394 TOP/s int8) a plain XLA matmul and the hot conv shapes actually
reach, to separate "conv lowering is slow" from "this is the practical
ceiling".  x10 in-jit chains, scalar-fetch synced (block_until_ready
does not wait under the axon tunnel).

Usage: python -m tools.bench_matmul_peak
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NDHWC", "DHWIO", "NDHWC")


def timed(fn, *args, iters=3):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, flops_per_call, seconds, chain=10, unit="TFLOP/s"):
    rate = flops_per_call * chain / seconds / 1e12
    print(f"{name:48s} {seconds*1e3:8.1f} ms  {rate:7.1f} {unit}")


def chain_matmul(m, n, k, dtype, acc=jnp.float32, chain=10):
    a = jax.random.normal(jax.random.PRNGKey(0), (m, k)).astype(dtype)
    b = jax.random.normal(jax.random.PRNGKey(1), (k, n)).astype(dtype)

    @jax.jit
    def run(a, b):
        x = a
        for _ in range(chain):
            x = lax.dot(x, b, preferred_element_type=acc).astype(dtype)
        return x

    sec = timed(run, a, b)
    report(f"matmul {m}x{k}x{n} {dtype.__name__}", 2 * m * n * k, sec)


def chain_matmul_int8(m, n, k, chain=10):
    a = jax.random.randint(jax.random.PRNGKey(0), (m, k), -127, 127,
                           jnp.int8)
    b = jax.random.randint(jax.random.PRNGKey(1), (k, n), -127, 127,
                           jnp.int8)

    @jax.jit
    def run(a, b):
        x = a
        for _ in range(chain):
            y = lax.dot(x, b, preferred_element_type=jnp.int32)
            x = jnp.clip(y >> 7, -127, 127).astype(jnp.int8)
        return x

    sec = timed(run, a, b)
    report(f"matmul {m}x{k}x{n} int8", 2 * m * n * k, sec, unit="TOP/s")


def conv_shape(name, shape, kernel, c_out, dtype, chain=10, stride=(1, 1, 1)):
    """Chained 3D conv at a model hot shape (zero pad, same channels)."""
    b, t, h, w, c = shape
    x = jax.random.normal(jax.random.PRNGKey(0), shape).astype(dtype)
    k = jax.random.normal(
        jax.random.PRNGKey(1), kernel + (c, c_out)).astype(dtype) * 0.05
    pads = [((kd - 1) // 2, kd // 2) for kd in kernel]

    @jax.jit
    def run(x, k):
        y = x
        for _ in range(chain):
            y = lax.conv_general_dilated(
                y, k, stride, pads, dimension_numbers=_DN)
        return y

    sec = timed(run, x, k)
    kt, kh, kw = kernel
    flops = 2 * b * t * h * w * c * c_out * kt * kh * kw
    report(f"conv {name} {kernel} c{c}->{c_out} {dtype.__name__}",
           flops, sec, chain=chain)


def conv_tapsum(name, shape, c_out, dtype, chain=10):
    """3x3x3 conv decomposed as 3 time-tap (1,3,3) convs summed."""
    b, t, h, w, c = shape
    x = jax.random.normal(jax.random.PRNGKey(0), shape).astype(dtype)
    k = jax.random.normal(
        jax.random.PRNGKey(1), (3, 3, 3, c, c_out)).astype(dtype) * 0.05

    @jax.jit
    def run(x, k):
        y = x
        for _ in range(chain):
            xp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
            acc = None
            for dt in range(3):
                part = lax.conv_general_dilated(
                    xp[:, dt:dt + t], k[dt:dt + 1], (1, 1, 1),
                    [(0, 0), (1, 1), (1, 1)], dimension_numbers=_DN)
                acc = part if acc is None else acc + part
            y = acc
        return y

    sec = timed(run, x, k)
    flops = 2 * b * t * h * w * c * c_out * 27
    report(f"conv {name} tapsum c{c}->{c_out} {dtype.__name__}", flops, sec,
           chain=chain)


def conv_int8_variants(name, shape, c_out, dtype=jnp.bfloat16, chain=4):
    """The model's int8 conv path at a hot shape: dynamic per-tensor
    activation quant (current) vs calibrated static scale (quantize is a
    pure elementwise op fusable into the producer)."""
    b, t, h, w, c = shape
    x = jax.random.normal(jax.random.PRNGKey(0), shape).astype(dtype)
    k = jax.random.normal(
        jax.random.PRNGKey(1), (3, 3, 3, c, c_out)).astype(jnp.float32) * 0.05
    from cvvae_tpu.ops.quant import quantize_kernel
    kq, sw = quantize_kernel(k)
    pads = [(1, 1), (1, 1), (1, 1)]
    flops = 2 * b * t * h * w * c * c_out * 27

    @jax.jit
    def run_dyn(x, kq, sw):
        y = x
        for _ in range(chain):
            xf = y.astype(jnp.float32)
            sx = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-12)
            xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
            z = lax.conv_general_dilated(
                xq, kq, (1, 1, 1), pads, dimension_numbers=_DN,
                preferred_element_type=jnp.int32)
            y = (z.astype(jnp.float32) * (sx * sw)).astype(dtype)
        return y

    @jax.jit
    def run_static(x, kq, sw):
        y = x
        sx = jnp.float32(0.05)
        for _ in range(chain):
            xq = jnp.clip(jnp.round(y.astype(jnp.float32) / sx),
                          -127, 127).astype(jnp.int8)
            z = lax.conv_general_dilated(
                xq, kq, (1, 1, 1), pads, dimension_numbers=_DN,
                preferred_element_type=jnp.int32)
            y = (z.astype(jnp.float32) * (sx * sw)).astype(dtype)
        return y

    report(f"conv {name} int8 dynamic-quant", flops,
           timed(run_dyn, x, kq, sw), chain=chain, unit="TOP/s")
    report(f"conv {name} int8 static-scale", flops,
           timed(run_static, x, kq, sw), chain=chain, unit="TOP/s")


def main():
    print(f"devices: {jax.devices()}")
    for mnk in ((4096, 4096, 4096), (8192, 8192, 8192),
                (16384, 4096, 4096)):
        chain_matmul(*mnk, jnp.bfloat16)
    chain_matmul(8192, 8192, 8192, jnp.bfloat16, acc=jnp.bfloat16)
    chain_matmul_int8(8192, 8192, 8192)

    # v1 @ 720px tile hot shapes (chain=4: L0 activations are 2.2 GB)
    conv_shape("enc_L0", (1, 17, 720, 720, 128), (3, 3, 3), 128,
               jnp.bfloat16, chain=4)
    conv_shape("enc_L0_2d", (1, 17, 720, 720, 128), (1, 3, 3), 128,
               jnp.bfloat16, chain=4)
    conv_tapsum("enc_L0", (1, 17, 720, 720, 128), 128, jnp.bfloat16,
                chain=4)
    conv_shape("dec_L1", (1, 17, 360, 360, 256), (3, 3, 3), 256,
               jnp.bfloat16, chain=4)
    conv_shape("dec_L1_2d", (1, 17, 360, 360, 256), (1, 3, 3), 256,
               jnp.bfloat16, chain=4)
    conv_tapsum("dec_L1", (1, 17, 360, 360, 256), 256, jnp.bfloat16,
                chain=4)
    conv_shape("dec_L2", (1, 9, 180, 180, 512), (3, 3, 3), 512,
               jnp.bfloat16, chain=4)
    conv_int8_variants("enc_L0", (1, 17, 720, 720, 128), 128)
    conv_int8_variants("dec_L1", (1, 17, 360, 360, 256), 256)


if __name__ == "__main__":
    main()
