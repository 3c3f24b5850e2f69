"""Sustained long-video serving throughput (the production use case).

Streams a real 720p clip through the bounded-memory pipeline
(cvvae_tpu/streaming.py) with the serving config — untiled full-frame
encode, rectangular decode tiles, optionally calibrated int8 — and
reports steady-state fps for the full encode+decode roundtrip,
including host video decode (overlapped with device compute by async
dispatch).

Usage: python -m tools.bench_streaming [--dtype int8|bf16]
       [--max_frames 301]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="int8", choices=["int8", "bf16"])
    ap.add_argument("--video",
                    default="/root/reference/data/4896510-hd_1280_720_30fps.mp4")
    ap.add_argument("--max_frames", type=int, default=301)
    ap.add_argument("--pipelined", action="store_true",
                    help="background cv2-decode thread + async D2H fetch "
                         "(streaming.py pipelined mode)")
    ap.add_argument("--breakdown", action="store_true",
                    help="also time host decode alone and device-resident "
                         "compute alone (the PERF.md gap table)")
    args = ap.parse_args()

    from cvvae_tpu.models.video_vae import VideoVAE, VideoVAEConfig
    from cvvae_tpu.streaming import (read_video_frames, streaming_decode,
                                     streaming_encode)
    from cvvae_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    cfg = VideoVAEConfig(family="v1", tile_spatial_size=(720, 672),
                         tile_overlap_ratio=8 / 84,
                         encode_tile_spatial_size=None)
    vae = VideoVAE.from_config(cfg, seed=0, dtype=jnp.bfloat16)
    if args.dtype == "int8":
        frames, _ = read_video_frames(args.video, height=256, width=256,
                                      max_frames=17)
        calib = jnp.asarray(
            np.stack(list(frames), dtype=np.float32) / 127.5 - 1.0
        )[None].astype(jnp.bfloat16)
        vae = vae.quantize(calibration=calib)

    # warm-up: 3 windows (first 17f chunk + two 16f continuations) so
    # every program shape — incl. the drop-first decode variants — is
    # compiled outside the timed region
    warm = np.random.default_rng(0).integers(
        0, 255, (49, 720, 1280, 3), dtype=np.uint8)
    for _ in streaming_decode(vae, streaming_encode(vae, iter(warm))):
        pass

    if args.breakdown:
        # (a) host video decode alone
        t0 = time.perf_counter()
        frames, _ = read_video_frames(args.video, height=720, width=1280,
                                      max_frames=args.max_frames)
        host_frames = list(frames)
        dt = time.perf_counter() - t0
        print(f"  host cv2 decode alone:     {len(host_frames)/dt:6.2f} fps")
        # (b) device-resident compute alone (frames pre-decoded)
        t0 = time.perf_counter()
        n = 0
        for x in streaming_decode(vae,
                                  streaming_encode(vae, iter(host_frames))):
            n += x.shape[0]
        dt = time.perf_counter() - t0
        print(f"  pre-decoded stream:        {n/dt:6.2f} fps "
              f"(device + D2H, no cv2)")

    frames, fps_in = read_video_frames(args.video, height=720, width=1280,
                                       max_frames=args.max_frames)
    prefetch = 0
    if args.pipelined:
        from cvvae_tpu.data.pipeline import prefetched
        frames = prefetched(frames, size=34)
        prefetch = 1
    n_out = 0
    t0 = time.perf_counter()
    zs = streaming_encode(vae, frames)
    for x in streaming_decode(vae, zs, prefetch=prefetch):
        n_out += x.shape[0]   # (T, H, W, 3) uint8 frame blocks (host)
    dt = time.perf_counter() - t0
    tag = "pipelined" if args.pipelined else "serial"
    print(f"streamed {n_out} frames 720p ({args.dtype}, {tag}) in {dt:.1f} s "
          f"-> {n_out/dt:.2f} fps sustained incl. host decode + D2H "
          f"({n_out/dt/30:.3f}x realtime-30)")


if __name__ == "__main__":
    main()
