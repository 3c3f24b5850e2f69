#!/usr/bin/env python
"""One-command reference-checkpoint verification harness.

The north-star fidelity gate is "PSNR within 0.1 dB of the PyTorch
reference" on the three shipped checkpoints (README.md:28-31 ->
subfolders vae3d / vae3d_v1-1 / vae3d_sd3, models/modeling_vae.py:20,344).
No pretrained weights exist in this environment, so the proof must be
turnkey the moment they appear:

    python tools/verify_checkpoints.py --vae_path /path/to/CV-VAE \
        [--subfolders vae3d vae3d_v1-1 vae3d_sd3] \
        [--clips /root/reference/data/*.mp4] \
        [--golden goldens.json] [--out report.json]

For every (checkpoint, clip) pair this converts the HF safetensors dir
to a JAX VideoVAE, reconstructs the clip exactly like the reference CLIs
(4k+1 frame truncation, /127.5-1 normalisation, posterior MODE for
determinism — cvvae_inference_video.py:10-52), and prints a PSNR table.
With ``--golden`` (a JSON mapping "<subfolder>/<clip-name>" -> PSNR dB
measured with the PyTorch reference) it asserts agreement within
``--tolerance`` (default 0.1 dB) and exits non-zero on any miss.

Create the golden file on any CUDA box with the reference repo:
  python cvvae_inference_video.py --vae_path ... (then PSNR vs input),
or record the reference PSNRs by hand — the keys are free-form.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

# Keep the documented `python tools/verify_checkpoints.py ...` invocation
# working from any cwd (sys.path[0] is tools/, not the repo root).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psnr_db(a, b) -> float:
    import numpy as np
    mse = float(np.mean((np.asarray(a, np.float32)
                         - np.asarray(b, np.float32)) ** 2))
    return float("inf") if mse == 0 else 10.0 * np.log10(4.0 / mse)


def verify_one(vae, clip: str, height: int, width: int,
               max_frames: int | None, dtype) -> dict:
    import time

    import jax.numpy as jnp
    import numpy as np

    from cvvae_tpu.data import video_io
    from cvvae_tpu.utils.profiling import sync

    frames, _ = video_io.read_video(clip, height=height, width=width,
                                    max_frames=max_frames)
    n = video_io.truncate_to_4k1(len(frames))
    x_np = video_io.normalize(frames[:n])
    x = jnp.asarray(x_np, dtype=dtype)[None]
    t0 = time.perf_counter()
    z = vae.encode(x).mode()           # deterministic: mode, not sample
    x_rec = vae.decode(z)
    sync(x_rec)
    dt = time.perf_counter() - t0
    rec = np.asarray(x_rec[0].astype(jnp.float32))
    return {"frames": int(n), "height": height, "width": width,
            "psnr_db": round(psnr_db(rec, x_np), 4),
            "latent_shape": list(z.shape), "seconds": round(dt, 2)}


def main(argv=None) -> int:
    import jax.numpy as jnp

    from cvvae_tpu.models.video_vae import VideoVAE
    from cvvae_tpu.utils.profiling import enable_compilation_cache

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--vae_path", required=True,
                   help="HF checkpoint root (subfolders) or a single "
                        "checkpoint dir containing config.json")
    p.add_argument("--subfolders", nargs="*",
                   default=["vae3d", "vae3d_v1-1", "vae3d_sd3"])
    p.add_argument("--clips", nargs="*",
                   default=sorted(glob.glob("/root/reference/data/*.mp4")))
    p.add_argument("--height", type=int, default=576)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--golden", default=None,
                   help="JSON {'<subfolder>/<clip>': psnr_db} from the "
                        "PyTorch reference")
    p.add_argument("--tolerance", type=float, default=0.1)
    p.add_argument("--out", default=None, help="write the report JSON here")
    args = p.parse_args(argv)

    enable_compilation_cache()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    golden = {}
    if args.golden:
        with open(args.golden) as f:
            golden = json.load(f)
    if not args.clips:
        print("no clips found (pass --clips)", file=sys.stderr)
        return 2

    # single-dir mode: --vae_path IS the checkpoint
    if os.path.exists(os.path.join(args.vae_path, "config.json")):
        targets = [("", args.vae_path)]
    else:
        targets = [(sf, os.path.join(args.vae_path, sf))
                   for sf in args.subfolders]

    report, failures = {}, []
    for sf, path in targets:
        if not os.path.exists(os.path.join(path, "config.json")):
            print(f"-- {sf or path}: MISSING (no config.json) -- skipped")
            continue
        vae = VideoVAE.from_pretrained(path, dtype=dtype)
        for clip in args.clips:
            key = f"{sf}/{os.path.basename(clip)}" if sf \
                else os.path.basename(clip)
            r = verify_one(vae, clip, args.height, args.width,
                           args.max_frames, dtype)
            report[key] = r
            line = (f"{key:55s} {r['frames']:4d}f "
                    f"{r['psnr_db']:7.3f} dB  {r['seconds']:6.2f}s")
            if key in golden:
                delta = r["psnr_db"] - float(golden[key])
                ok = abs(delta) <= args.tolerance
                line += (f"  ref {float(golden[key]):7.3f} dB  "
                         f"delta {delta:+.3f} dB  "
                         f"{'OK' if ok else 'FAIL'}")
                r["golden_psnr_db"] = float(golden[key])
                r["delta_db"] = round(delta, 4)
                if not ok:
                    failures.append(key)
            print(line)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    if not report:
        print("nothing verified (no checkpoint dirs found)", file=sys.stderr)
        return 2
    if failures:
        print(f"FAILED the {args.tolerance} dB gate: {failures}",
              file=sys.stderr)
        return 1
    print(f"verified {len(report)} reconstruction(s)"
          + (f" within {args.tolerance} dB of the reference"
             if golden else " (no --golden reference supplied)"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
