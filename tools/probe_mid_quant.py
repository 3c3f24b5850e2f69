"""Probe: quantize the mid-block convs too?

The int8 skip-list kept mid blocks fp because int8 convs next to the
Pallas flash kernel were a pathology.  int8 programs now use the
query-blocked exact attention (no custom call), so mid convs can
quantize — this measures whether it pays at the 720px tile.

Usage: python -m tools.probe_mid_quant [--tile 720] [--frames 17]
"""

import argparse
import time

import jax
import jax.numpy as jnp


def timed(fn, *args, iters=4):
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
    ap.add_argument("--tile", type=int, default=720)
    ap.add_argument("--frames", type=int, default=17)
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
    enc32 = m.init_encoder(ke, cfg)
    dec32 = m.init_decoder(kd, cfg)
    enc32 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), enc32)
    dec32 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), dec32)
    x = jax.random.normal(kx, (1, args.frames, args.tile, args.tile, 3),
                          jnp.bfloat16)
    xc = x[:, :, :256, :256]

    for skip in (("mid",), ()):
        enc = quantize_conv_params(enc32, skip_paths=skip)
        dec = quantize_conv_params(dec32, skip_paths=skip)
        with calibration_scope() as rec:
            with no_flash_attention():
                mom = m.apply_encoder(enc, xc, cfg)
                m.apply_decoder(dec, mom[..., :mom.shape[-1] // 2], cfg)
        enc = attach_activation_scales(enc, rec)
        dec = attach_activation_scales(dec, rec)

        def run_enc(p, v):
            with no_flash_attention():
                return m.apply_encoder(p, v, cfg)

        t = timed(jax.jit(run_enc), enc, x)
        print(f"skip={skip!r:10s} encoder: {t*1e3:7.1f} ms", flush=True)

        z = jax.random.normal(kx, (1, 5, args.tile // 8, args.tile // 8,
                                   cfg.z_channels), jnp.bfloat16)

        def run_dec(p, v):
            with no_flash_attention():
                return m.apply_decoder(p, v, cfg)

        t = timed(jax.jit(run_dec), dec, z)
        print(f"skip={skip!r:10s} decoder: {t*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
