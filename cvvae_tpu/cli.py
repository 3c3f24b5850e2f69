"""Video reconstruction CLI — the framework's end-to-end entry point.

TPU-native analogue of the reference inference scripts
(cvvae_inference_video.py:10-52, cvvae_sd3_inference_video.py:11-53):
read an mp4, truncate to 4k+1 frames, normalise to [-1,1], encode ->
sample posterior -> decode, write the reconstruction.

Usage:
    python -m cvvae_tpu.cli --video_path in.mp4 --save_path out.mp4 \
        [--vae_path /path/to/hf_checkpoint_dir [--subfolder vae3d]] \
        [--variant v1|sd3] [--height 576 --width 1024] [--dtype bf16] \
        [--mode sample|mode] [--metrics]

Without --vae_path the model runs with random weights (pipeline
smoke-test mode).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--vae_path", type=str, default=None,
                   help="HF checkpoint dir (config.json + safetensors)")
    p.add_argument("--subfolder", type=str, default=None,
                   help="checkpoint subfolder, e.g. vae3d / vae3d_sd3")
    p.add_argument("--variant", type=str, default="v1",
                   help="v1 | v1-1 | sd3 (used when --vae_path is absent)")
    p.add_argument("--video_path", type=str, required=True)
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--height", type=int, default=576)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--dtype", type=str, default="bf16",
                   choices=["bf16", "fp32", "int8"],
                   help="int8 = bf16 activations + int8 conv stack "
                        "(ops/quant.py; ~1.5x conv throughput)")
    p.add_argument("--mode", type=str, default="sample",
                   choices=["sample", "mode"],
                   help="posterior sampling (reference default) or mean")
    p.add_argument("--serving", action="store_true",
                   help="TPU serving preset: untiled full-frame encode, "
                        "rectangular decode tiles sized to the frame, and "
                        "(with --dtype int8) calibrated static activation "
                        "scales from the clip's first window — the bench.py "
                        "production configuration")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--metrics", action="store_true",
                   help="print PSNR + timing JSON to stdout")
    return p




def _serving_axis_plan(size: int):
    """Split one spatial axis into the fewest tiles of at most 720 px
    with an exact 8-latent (64-px) blended overlap.  Returns
    (tile_px, overlap_ratio) with ratio == 8/latent_tile so the tile
    math in VideoVAE._spatial_tiled rounds back to exactly 64 px on
    THIS axis (per-axis ratios: a single ratio derived from the other
    axis mis-rounds the overlap and shifts the decoded frame size)."""
    lat = size // 8
    n = max(1, -(-size // 720))
    while True:
        lat_stride = -(-(lat - 8) // n)
        tile_lat = lat_stride + 8
        if tile_lat * 8 <= 720 or lat_stride <= 1:
            break
        n += 1  # even splits of this width exceed the 720-px HBM cap
    return tile_lat * 8, 8 / tile_lat


def serving_decode_tiles(height: int, width: int):
    """Decode tile plan for the serving preset: frames up to 720px run
    untiled; larger frames use rectangular tiles sized per axis with an
    8-latent (64-px) blended overlap — e.g. 1280x720 -> two 720x672
    tiles (1.05x decoded area), 1920x1080 -> a 688x576 grid.  Returns
    (tile_spatial_size, tile_overlap_ratio) for VideoVAEConfig; the
    ratio is an (h, w) pair so each axis blends its exact overlap."""
    if height <= 720 and width <= 720:
        return None, 0.2222
    th, rh = _serving_axis_plan(height)
    tw, rw = _serving_axis_plan(width)
    return (th, tw), (rh, rw)




def main(argv=None) -> dict:
    from cvvae_tpu.utils.profiling import enable_compilation_cache, sync
    enable_compilation_cache()

    from cvvae_tpu.data import video_io
    from cvvae_tpu.models.video_vae import VideoVAE, config_for_variant

    args = build_argparser().parse_args(argv)
    dtype = jnp.float32 if args.dtype == "fp32" else jnp.bfloat16

    import dataclasses as _dc

    if args.vae_path:
        vae = VideoVAE.from_pretrained(args.vae_path, subfolder=args.subfolder,
                                       dtype=dtype)
    else:
        vae = VideoVAE.from_config(config_for_variant(args.variant),
                                   seed=args.seed, dtype=dtype)
    if args.serving:
        tile, ratio = serving_decode_tiles(args.height, args.width)
        # v1's zero-pad encoder runs the full frame untiled; SD3
        # replicate-pads space+time and its materialised edge pads blow
        # HBM untiled at 720p — its encoder shares the decode tiles
        enc_tile = None if vae.config.family == "v1" else "inherit"
        cfg = _dc.replace(vae.config, tile_spatial_size=tile,
                          tile_overlap_ratio=ratio,
                          encode_tile_spatial_size=enc_tile)
        vae = VideoVAE(cfg, vae.params)

    frames, fps = video_io.read_video(
        args.video_path, height=args.height, width=args.width,
        max_frames=args.max_frames)
    n = video_io.truncate_to_4k1(len(frames))
    frames = frames[:n]
    x_np = video_io.normalize(frames)
    x = jnp.asarray(x_np, dtype=dtype)[None]  # (1, T, H, W, C)

    if args.dtype == "int8":
        calib = x[:, :17, :min(args.height, 256), :min(args.width, 256)] \
            if args.serving else None
        vae = vae.quantize(calibration=calib)

    # Timing barrier: block_until_ready() does NOT wait for remote
    # execution under the axon tunnel — sync() forces a scalar fetch.
    t0 = time.perf_counter()
    posterior = vae.encode(x)
    if args.mode == "sample":
        z = posterior.sample(jax.random.PRNGKey(args.seed))
    else:
        z = posterior.mode()
    sync(z)
    t_encode = time.perf_counter() - t0

    t0 = time.perf_counter()
    x_rec = vae.decode(z)
    sync(x_rec)
    t_decode = time.perf_counter() - t0

    rec_np = np.asarray(x_rec[0].astype(jnp.float32))
    video_io.write_video(args.save_path, video_io.denormalize(rec_np), fps)

    mse = float(np.mean((rec_np - x_np) ** 2))
    psnr = float(10.0 * np.log10(4.0 / mse)) if mse > 0 else float("inf")
    result = {
        "frames": int(n), "height": args.height, "width": args.width,
        "latent_shape": list(z.shape), "encode_s": round(t_encode, 3),
        "decode_s": round(t_decode, 3), "psnr_db": round(psnr, 3),
        "save_path": args.save_path,
    }
    if args.metrics:
        print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
