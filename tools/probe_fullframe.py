"""Probe: does a full-frame (untiled) 720p decode fit HBM now?

Round 1 measured 26.6 GB for the naive bf16 full-frame decode (> 15.75
HBM) and tiled at 720px (2 tiles/frame, 1.125x redundancy).  Since
then: subpixel upsample (no 4x-area intermediate), fused
upsample+interleave, int8 conv stack.  If the full frame fits, the
redundancy disappears -> ~+12% decode throughput.

Usage: python -m tools.probe_fullframe [--dtype int8|bf16]
"""

import argparse
import time

import jax
import jax.numpy as jnp


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="int8", choices=["int8", "bf16"])
    args = ap.parse_args()

    from cvvae_tpu.models import vae_v1 as m
    from cvvae_tpu.ops.attention import no_flash_attention
    from cvvae_tpu.ops.quant import (attach_activation_scales,
                                     calibration_scope,
                                     quantize_conv_params)
    from cvvae_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    cfg = m.VAE1Config()
    ke, kd, kx = jax.random.split(jax.random.PRNGKey(0), 3)
    enc = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                       m.init_encoder(ke, cfg))
    dec = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                       m.init_decoder(kd, cfg))
    quant = args.dtype == "int8"
    if quant:
        enc = quantize_conv_params(enc)
        dec = quantize_conv_params(dec)
        xc = jax.random.normal(kx, (1, 17, 256, 256, 3), jnp.bfloat16)
        with calibration_scope() as rec:
            with no_flash_attention():
                mom = m.apply_encoder(enc, xc, cfg)
                m.apply_decoder(dec, mom[..., :mom.shape[-1] // 2], cfg)
        enc = attach_activation_scales(enc, rec)
        dec = attach_activation_scales(dec, rec)

    def wrap(fn):
        def run(p, v):
            if quant:
                with no_flash_attention():
                    return fn(p, v, cfg)
            return fn(p, v, cfg)
        return run

    # full 720p frame: encode (1,17,720,1280,3), decode (1,5,90,160,4)
    x = jax.random.normal(kx, (1, 17, 720, 1280, 3), jnp.bfloat16)
    t = timed(jax.jit(wrap(m.apply_encoder)), enc, x)
    print(f"full-frame encoder {args.dtype}: {t*1e3:7.1f} ms", flush=True)
    z = jax.random.normal(kx, (1, 5, 90, 160, cfg.z_channels), jnp.bfloat16)
    t = timed(jax.jit(wrap(m.apply_decoder)), dec, z)
    print(f"full-frame decoder {args.dtype}: {t*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
