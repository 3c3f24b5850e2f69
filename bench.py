"""Benchmark: 720p encode+decode throughput per chip (CV-VAE v1, bf16).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
value  = 720p (1280x720) frames/sec for a full encode+decode roundtrip
         through the production path (temporal chunking + spatial tiling,
         17-frame clip), steady state on one chip.
vs_baseline = realtime factor vs 720p30 (the north-star asks >= 2.0).
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from cvvae_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    from cvvae_tpu.models.video_vae import VideoVAE, VideoVAEConfig

    frames, height, width = 17, 720, 1280
    # production TPU config: 720-px tiles (v5e HBM affords larger tiles
    # than the reference's 576 GPU default -> less overlap redundancy,
    # fewer seams; chunk/blend semantics unchanged)
    cfg = VideoVAEConfig(family="v1", tile_spatial_size=720)
    vae = VideoVAE.from_config(cfg, seed=0, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (1, frames, height, width, 3), jnp.bfloat16)

    def roundtrip():
        z = vae.encode(x).mode()
        out = vae.decode(z)
        # NOTE: under the axon TPU tunnel block_until_ready() returns
        # before remote execution finishes; a scalar fetch is the only
        # reliable sync.
        return float(jnp.sum(out.astype(jnp.float32)))

    roundtrip()  # warm-up / compile
    n_iters = 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        roundtrip()
    dt = (time.perf_counter() - t0) / n_iters

    fps = frames / dt
    print(json.dumps({
        "metric": "720p_encode_decode_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
