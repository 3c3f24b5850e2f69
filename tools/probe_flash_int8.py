"""Probe: the flash-attention + int8-conv one-program pathology.

An XLA program mixing int8 convs with the Pallas flash-attention custom
call measured ~10x slower on v5e (quantized v1 encoder, 576px tile:
2.4 s vs 210 ms with exact attention — bisected to the kernel's
presence).  Hypothesis: layout assignment around the custom call forces
transposes on every conv.  This probe times the quantized encoder with

  a) flash attention as-is            (the known-bad combination)
  b) flash + lax.optimization_barrier around q,k,v and the output
     (cuts layout/fusion propagation at the custom-call boundary)
  c) exact/chunked attention          (the shipped workaround)

Usage: python -m tools.probe_flash_int8 [--tile 576] [--frames 17]
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
    ap.add_argument("--tile", type=int, default=576)
    ap.add_argument("--frames", type=int, default=17)
    args = ap.parse_args()

    from cvvae_tpu.models import vae_v1
    from cvvae_tpu.models.video_vae import VideoVAE, VideoVAEConfig
    from cvvae_tpu.ops import attention
    from cvvae_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    cfg = VideoVAEConfig(family="v1", tile_spatial_size=None,
                         en_de_n_frames_a_time=None)
    vae = VideoVAE.from_config(cfg, seed=0, dtype=jnp.bfloat16).quantize()
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (1, args.frames, args.tile, args.tile, 3),
                          jnp.bfloat16)
    enc = lambda p, v: vae_v1.apply_encoder(p, v, cfg.net)
    p = vae.params["encoder"]

    # c) exact attention (shipped int8 path)
    def run_exact(p, v):
        with attention.no_flash_attention():
            return enc(p, v)

    t = timed(jax.jit(run_exact), p, x)
    print(f"exact attention: {t*1e3:8.1f} ms")

    # a) flash as-is
    t = timed(jax.jit(enc), p, x)
    print(f"flash (as-is):   {t*1e3:8.1f} ms")

    # b) flash + optimization_barrier
    orig = attention._flash_attention

    def barriered(q, k, v, scale):
        q, k, v = jax.lax.optimization_barrier((q, k, v))
        out = orig(q, k, v, scale)
        (out,) = jax.lax.optimization_barrier((out,))
        return out

    attention._flash_attention = barriered
    try:
        t = timed(jax.jit(lambda p, v: enc(p, v)), p, x)
        print(f"flash+barrier:   {t*1e3:8.1f} ms")
    finally:
        attention._flash_attention = orig


if __name__ == "__main__":
    main()
