"""Probe: decoder HIGH-res stages, bf16 vs int8, at the 720x672 tile.

PERF.md round-3: the decoder tile (95.1 TFLOP by XLA's cost model) runs
at ~136 TFLOP-eq/s while the encoder reaches ~265 — a 2x per-FLOP gap.
This measures the expensive decoder pieces in isolation (nonlinear
in-jit chains, scalar-fetch synced) to locate the gap: a 128-ch
resblock at full pixel res (blocks0's unit), the up1 subpixel upsample
conv, and the RGB out head, each bf16 vs int8-quantized.

Usage: PYTHONPATH="$PYTHONPATH:." python tools/probe_dec_hires.py
"""

import time

import jax
import jax.numpy as jnp

from cvvae_tpu.models import vae_v1 as m
from cvvae_tpu.models.vae_v1 import VAE1Config
from cvvae_tpu.ops.quant import quantize_conv_params


def timed(name, fn, *args, iters=3, n_chain=3, tflop=None):
    jf = jax.jit(fn)
    float(jf(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jf(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / n_chain
    rate = f"  ({tflop / per:6.0f} TFLOP-eq/s)" if tflop else ""
    print(f"  {name:<44s} {per * 1000:8.1f} ms/call{rate}", flush=True)
    return per


def chain(fn, n=3):
    def run(x, *rest):
        acc = 0.0
        h = x
        for _ in range(n):
            y = fn(h, *rest)
            s = jnp.sum(jnp.abs(y.astype(jnp.float32)))
            acc = acc + s
            h = x * (1.0 + 1e-12 * s).astype(x.dtype)
        return acc
    return run


def main():
    from cvvae_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    cfg = VAE1Config()
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    t, h, w = 17, 720, 672          # blocks0 shape at the decode tile

    # ---- blocks0 unit: ResnetBlock3D 128 -> 128 at full pixel res ----
    rb = m.init_resblock(key, cfg, 128, 128, cfg.causal_decoder, dt)
    rbq = quantize_conv_params(rb)
    x0 = jax.random.normal(key, (1, t, h, w, 128), dt)
    # conv1 3x3x3 128->128 + conv2 (1,3,3) 128->128 at 17*720*672 pos
    pos = t * h * w
    fl = (2 * 27 + 2 * 9) * 128 * 128 * pos / 1e12
    print(f"blocks0 resblock (1,{t},{h},{w},128), {fl:.2f} TFLOP:")
    timed("bf16", chain(
        lambda v: m.apply_resblock(rb, v, cfg, cfg.causal_decoder)), x0,
        tflop=fl)
    timed("int8", chain(
        lambda v: m.apply_resblock(rbq, v, cfg, cfg.causal_decoder)), x0,
        tflop=fl)

    # ---- bare 3x3x3 conv 128->128 at the same shape ----
    k1 = jax.random.normal(key, (3, 3, 3, 128, 128), dt) * 0.05
    p1 = {"kernel": k1, "bias": jnp.zeros((128,), dt)}
    p1q = quantize_conv_params(p1)
    spec = cfg.conv_spec(cfg.causal_decoder)
    from cvvae_tpu.ops.conv import conv3d
    fl1 = 2 * 27 * 128 * 128 * pos / 1e12
    print(f"bare 3x3x3 conv 128->128, {fl1:.2f} TFLOP:")
    timed("bf16", chain(lambda v: conv3d(v, p1, spec)), x0, tflop=fl1)
    timed("int8", chain(lambda v: conv3d(v, p1q, spec)), x0, tflop=fl1)

    # ---- GroupNorm+SiLU alone at the same shape (bandwidth floor) ----
    from cvvae_tpu.ops.norm import group_norm
    gn = {"scale": jnp.ones((128,), dt), "bias": jnp.zeros((128,), dt)}
    gb = 2 * pos * 128 * 2 / 1e9
    print(f"GN+SiLU (read+write {gb:.1f} GB):")
    tt = timed("bf16", chain(
        lambda v: jax.nn.silu(group_norm(v, gn, num_groups=32))), x0)
    print(f"    -> {gb / tt:6.0f} GB/s effective")

    # ---- up1-style subpixel upsample conv (128ch, time interleave) ----
    up = m.init_upsample(key, 128, True, cfg.causal_decoder, dt)
    xu = jax.random.normal(key, (1, 9, 360, 336, 128), dt)
    upq = quantize_conv_params(up)
    print("subpixel upsample 128ch (9,360,336) -> (17,720,672):")
    timed("bf16", chain(
        lambda v: m.apply_upsample(up, v, True, cfg.causal_decoder)), xu)
    timed("int8", chain(
        lambda v: m.apply_upsample(upq, v, True, cfg.causal_decoder)), xu)

    # ---- out head: GN+SiLU + 3x3x3 conv 128 -> 3 ----
    ko = jax.random.normal(key, (3, 3, 3, 128, 3), dt) * 0.05
    po = {"kernel": ko, "bias": jnp.zeros((3,), dt)}
    print("out head conv 128->3 (small-Cout lowering):")
    timed("bf16", chain(lambda v: conv3d(v, po, spec)), x0)


if __name__ == "__main__":
    main()
