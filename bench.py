"""Benchmark: 720p encode+decode throughput per chip (CV-VAE v1).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
value  = 720p (1280x720) frames/sec for a full encode+decode roundtrip
         through the production path (temporal chunking + spatial tiling,
         17-frame clip), steady state on one chip.
vs_baseline = realtime factor vs 720p30 (the north-star asks >= 2.0).

The headline mode is int8 serving (per-channel weight + dynamic
activation quantization of the conv stack, ops/quant.py), quality-gated
against the bf16 path in tests/test_quant.py and measured here as
"agreement_db" (PSNR between the int8 and bf16 reconstructions of the
same input).  "detail" carries the per-mode fps.  --dtype bf16 makes
the bf16 number the headline.

The headline JSON line is printed and flushed after EVERY completed
inference mode (a kill mid-run still leaves the best number so far;
the last line is the requested-dtype headline), and a mode that dies
records its error and falls back to the surviving mode rather than
sinking the run.  The train-step measurement is opt-in
(--train): it compiles two fresh SD3 G+D graphs at multi-minute XLA
compile times, which timed out the round-4 driver run when it was
default-on; with --train, the augmented headline (same metric/value,
extra detail keys) is re-emitted as a second JSON line under a
wall-clock budget (--train-budget).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp


def roundtrip_fps(vae, x, frames, n_iters=3):
    def roundtrip():
        z = vae.encode(x).mode()
        out = vae.decode(z)
        # NOTE: under the axon TPU tunnel block_until_ready() returns
        # before remote execution finishes; a scalar fetch is the only
        # reliable sync.
        float(jnp.sum(out.astype(jnp.float32)))
        return out

    out = roundtrip()  # warm-up / compile
    t0 = time.perf_counter()
    for _ in range(n_iters):
        roundtrip()
    dt = (time.perf_counter() - t0) / n_iters
    return frames / dt, out


def measure_train(n_iters=2, lpips=True):
    """G+D train-pair rate at the shipped recipe shapes (SD3 latent
    constraint, 320px images / 1x17f 256px video, bf16 compute —
    configs/cvvae_sd3_constraint_training.yaml:92-180; image batch is
    the shipped bs 8 without LPIPS, bs 2 with — the largest that fits,
    see below).  Returns BENCH detail entries; the compile cost is
    amortised by the persistent compilation cache.

    lpips=True puts a random-init VGG16 LPIPS in the graph at the
    shipped perceptual_weight=0.5 (configs/...yaml:60-66) so the
    steps/sec reflects the full recipe cost; pretrained VGG/lin weights
    are absent in this environment, so the *quality* of the perceptual
    term is not exercised — only its compute cost is."""
    import time as _time

    from cvvae_tpu.losses.vae_loss import LossConfig
    from cvvae_tpu.training.engine import EngineConfig, TrainingEngine
    from cvvae_tpu.training.optim import OptimConfig

    # HBM high-water mark before training: peak_bytes_in_use is a
    # process-lifetime maximum, so report train's peak only if it
    # exceeds what the inference runs already touched (ADVICE r4).
    try:
        pre_peak = jax.local_devices()[0].memory_stats().get(
            "peak_bytes_in_use", 0)
    except Exception:
        pre_peak = None

    cfg = EngineConfig(
        family="sd3", constraint="latent",
        loss=LossConfig(perceptual_weight=0.5 if lpips else 0.0,
                        disc_start=0),
        optim=OptimConfig(), remat=True, compute_dtype="bfloat16",
        donate_state=True)
    # Random-init VGG16 at the right shape: honest *cost*, uncalibrated
    # quality (no pretrained weights in this env) — engine.py:125-140.
    engine = TrainingEngine(cfg, seed=0, allow_random_lpips=lpips)
    # With LPIPS in the graph the shipped image batch (bs 8, yaml:92)
    # does NOT fit a 16 GB v5e: bs 8 OOMs HBM at execution and bs 4
    # crashes the remote compile helper (measured round 5 — the
    # reference trains on 8x40/80 GB GPUs).  bs 2 fits; the shipped
    # global batch is reached with more DP chips, and pairs/s here is
    # per chip at the fitting batch (key carries the batch size).
    image_bs = 2 if lpips else 8
    batches = {
        f"image_bs{image_bs}": jax.random.normal(
            jax.random.PRNGKey(1), (image_bs, 1, 320, 320, 3),
            jnp.float32) * 0.3,
        "video": jax.random.normal(jax.random.PRNGKey(2),
                                   (1, 17, 256, 256, 3), jnp.float32) * 0.3,
    }
    rng = jax.random.PRNGKey(3)
    detail = {}
    pair_secs = {}
    # every key carries both the batch size (in the batch name) and the
    # LPIPS mode: an unsuffixed key whose workload changes with flags
    # would silently break cross-round comparisons.
    tag = "_lpips" if lpips else "_nolpips"
    for name, frames in batches.items():
        batch = {"frames": frames}
        st = engine.init_state(jax.random.PRNGKey(0))
        for _ in range(2):  # compile + warm G and D
            st, m = engine.train_step(st, batch, rng)
            {k: float(v) for k, v in m.items()}
        best = float("inf")
        for _ in range(n_iters):
            t0 = _time.perf_counter()
            st, m1 = engine.train_step(st, batch, rng)
            st, m2 = engine.train_step(st, batch, rng)
            {k: float(v) for k, v in m2.items()}
            best = min(best, _time.perf_counter() - t0)
        pair_secs[name] = best
        detail[f"train_pairs_per_sec_{name}{tag}"] = round(1.0 / best, 3)
        del st
    # optimizer steps/s at the shipped 0.5/0.5 multiplexer mix
    detail[f"train_steps_per_sec_bs{image_bs}mix{tag}"] = round(
        4.0 / (pair_secs[f"image_bs{image_bs}"] + pair_secs["video"]), 3)
    try:
        stats = jax.local_devices()[0].memory_stats()
        post_peak = stats.get("peak_bytes_in_use", 0)
        if pre_peak is not None and post_peak > pre_peak:
            detail["train_hbm_peak_gb"] = round(post_peak / 2**30, 2)
        else:  # train never exceeded the inference runs' high-water mark
            detail["train_hbm_peak_gb_below_process_peak"] = round(
                (pre_peak or 0) / 2**30, 2)
    except Exception:
        pass
    return detail


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="int8", choices=["int8", "bf16"],
                    help="headline mode (the other is also measured)")
    ap.add_argument("--family", default="v1", choices=["v1", "sd3"],
                    help="model family: v1 (4-ch, the reference CLI "
                         "default) or sd3 (16-ch, the training-recipe "
                         "flagship; cvvae_sd3_inference_video.py:11-53)")
    ap.add_argument("--skip_bf16", action="store_true",
                    help="with --dtype int8: skip the bf16 comparison run")
    ap.add_argument("--train", default=False,
                    action=argparse.BooleanOptionalAction,
                    help="ALSO measure the shipped-recipe train step after "
                         "the headline (opt-in: the two fresh SD3 G+D "
                         "compiles cost minutes; round-4's default-on "
                         "timed out the driver run — VERDICT r4 item 1)")
    ap.add_argument("--train-budget", type=float, default=1500.0,
                    help="wall-clock seconds allowed for the optional "
                         "train measurement; skipped if the headline "
                         "already consumed it")
    ap.add_argument("--train-lpips", default=True,
                    action=argparse.BooleanOptionalAction,
                    help="include a random-init VGG16 LPIPS term "
                         "(shipped perceptual_weight=0.5) in the measured "
                         "train graph; --no-train-lpips measures the "
                         "perception-free step")
    args = ap.parse_args()
    t_start = time.perf_counter()

    from cvvae_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    from cvvae_tpu.models.video_vae import VideoVAE, VideoVAEConfig
    from cvvae_tpu.utils.metrics import psnr

    frames, height, width = 17, 720, 1280
    # production TPU config: 720-px tiles (v5e HBM affords larger tiles
    # than the reference's 576 GPU default -> less overlap redundancy,
    # fewer seams; chunk/blend semantics unchanged)
    # decoder tiles 720x672 (full-frame decode needs 19.6 GB > HBM;
    # two rect tiles cover 1280x720 at 1.05x area vs 1.125x for square
    # 720px ones, with an 8-latent/64-px blended seam); encoder runs
    # the full frame untiled — no seams, no overlap redundancy
    # (encoder HBM peak is ~1/5 the decoder's)
    # v1's zero-pad encoder fits the full frame untiled; SD3's
    # replicate-pads space AND time (vae_blocks3d_sd3.py:87-98), whose
    # materialised edge pads push the untiled 720p encode to ~16 GB —
    # over HBM — so the SD3 encoder reuses the decoder's rect tiles.
    cfg = VideoVAEConfig(
        family=args.family, tile_spatial_size=(720, 672),
        tile_overlap_ratio=8 / 84,
        encode_tile_spatial_size=None if args.family == "v1" else "inherit",
        **({"scaling_factor": 1.5305} if args.family == "sd3" else {}))
    vae = VideoVAE.from_config(cfg, seed=0, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (1, frames, height, width, 3), jnp.bfloat16)

    detail = {}
    outs = {}
    modes = ["bf16", "int8"] if not args.skip_bf16 else ["int8"]
    if args.dtype == "bf16" and "bf16" not in modes:
        modes.append("bf16")
    family_tag = "" if args.family == "v1" else f"_{args.family}"

    def make_result():
        head = (args.dtype if f"{args.dtype}_fps" in detail
                else next(iter(outs)))
        return {
            "metric":
                f"720p_encode_decode_fps_per_chip{family_tag}_{head}",
            "value": detail[f"{head}_fps"],
            "unit": "frames/sec",
            "vs_baseline": round(detail[f"{head}_fps"] / 30.0, 3),
            "detail": detail,
        }

    result = None
    last_mode_errored = False
    for mode in modes:
        try:
            if mode == "int8":
                # calibrated static activation scales: one eager
                # tile-window pass; dynamic per-tensor quant costs an
                # extra max-reduction HBM pass per conv that cancels
                # most of the MXU gain
                m_vae = vae.quantize(calibration=x[:, :, :256, :256])
            else:
                m_vae = vae
            fps, out = roundtrip_fps(m_vae, x, frames)
            detail[f"{mode}_fps"] = round(fps, 2)
            outs[mode] = out
        except Exception as e:
            # One mode dying (transient compile-service crash, OOM)
            # must not cost the round its number: record the error and
            # fall back to whichever mode survived for the headline.
            detail[f"{mode}_error"] = f"{type(e).__name__}: {e}"[:200]
            last_mode_errored = True
            continue
        last_mode_errored = False
        if "bf16" in outs and "int8" in outs:
            a, b = outs["bf16"], outs["int8"]
            rng = float(jnp.max(jnp.abs(a.astype(jnp.float32)))) * 2
            detail["int8_vs_bf16_agreement_db"] = round(float(
                jnp.mean(psnr(a, b, data_range=rng))), 2)
        # The driver's budget is finite and the headline is what it
        # records: print + flush after EVERY completed mode, so a kill
        # mid-run still leaves the best number so far; a last-line
        # parser lands the final (requested-dtype) headline.
        result = make_result()
        print(json.dumps(result), flush=True)
    if not outs:
        # keep the stdout-JSON contract even in total failure: a driver
        # parsing the last stdout line still learns WHY there is no fps
        print(json.dumps({"metric": "benchmark_failed", "value": None,
                          "unit": "frames/sec", "detail": detail}),
              flush=True)
        raise SystemExit(1)
    if last_mode_errored:  # surface the error recorded after the last print
        result = make_result()
        print(json.dumps(result), flush=True)

    if args.train:
        elapsed = time.perf_counter() - t_start
        if elapsed > args.train_budget:
            result["detail"]["train_skipped"] = "budget"
        else:
            # free the inference nets/outputs before the 13+ GB train step
            import gc
            m_vae = a = b = None
            del vae, m_vae, outs, x, a, b
            gc.collect()
            try:
                result["detail"].update(measure_train(
                    lpips=args.train_lpips))
            except Exception as e:  # never break on train OOM
                result["detail"]["train_error"] = (
                    f"{type(e).__name__}: {e}"[:200])
        # re-emit the augmented headline: same metric/value, so a
        # last-line parser still lands the identical number
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
