"""Profile one real training step at the shipped scale on the TPU.

Shipped recipe (configs/cvvae_sd3_constraint_training.yaml:92-180): SD3
VAE (128,256,512,512), latent constraint, GAN + LPIPS, per-rank batches
of 8 images at 320px and 1x17-frame video at 256px (the multiplexer
feeds one batch type per step).  Measures G and D step wall time per
batch type, reports steps/s and HBM stats, optionally writes a profiler
trace.

Usage: python tools/profile_train_step.py [--remat/--no-remat]
       [--perceptual] [--trace DIR] [--image_bs 8]
"""

import argparse
import time

import jax
import jax.numpy as jnp


def sync_metrics(m):
    return {k: float(v) for k, v in m.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--remat", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--perceptual", action="store_true",
                    help="include LPIPS (random-init; timing only)")
    ap.add_argument("--image_bs", type=int, default=8)
    ap.add_argument("--image_size", type=int, default=320)
    ap.add_argument("--video_frames", type=int, default=17)
    ap.add_argument("--video_size", type=int, default=256)
    ap.add_argument("--compute", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--trace", default=None)
    args = ap.parse_args()

    from cvvae_tpu.losses.vae_loss import LossConfig
    from cvvae_tpu.training.engine import EngineConfig, TrainingEngine
    from cvvae_tpu.training.optim import OptimConfig
    from cvvae_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    cfg = EngineConfig(
        family="sd3", constraint="latent",
        loss=LossConfig(perceptual_weight=0.5 if args.perceptual else 0.0,
                        disc_start=0),
        optim=OptimConfig(),
        remat=args.remat, compute_dtype=args.compute, donate_state=True)
    engine = TrainingEngine(cfg, seed=0,
                            allow_random_lpips=args.perceptual)

    batches = {
        f"image_bs{args.image_bs}_{args.image_size}px": jnp.asarray(
            jax.random.normal(jax.random.PRNGKey(1),
                              (args.image_bs, 1, args.image_size,
                               args.image_size, 3), jnp.float32) * 0.3),
        f"video_1x{args.video_frames}f_{args.video_size}px": jnp.asarray(
            jax.random.normal(jax.random.PRNGKey(2),
                              (1, args.video_frames, args.video_size,
                               args.video_size, 3), jnp.float32) * 0.3),
    }

    def mem_report(tag):
        try:
            stats = jax.local_devices()[0].memory_stats()
            used = stats.get("bytes_in_use", 0) / 2**30
            peak = stats.get("peak_bytes_in_use", 0) / 2**30
            lim = stats.get("bytes_limit", 0) / 2**30
            print(f"  [{tag}] HBM in use {used:.2f} GiB, "
                  f"peak {peak:.2f} GiB, limit {lim:.2f} GiB", flush=True)
        except Exception as e:
            print(f"  [{tag}] memory_stats unavailable: {e}", flush=True)

    rng = jax.random.PRNGKey(3)
    for name, frames in batches.items():
        batch = {"frames": frames}
        # fresh state per batch type: the production step donates its
        # input state, so a shared starting state would be consumed
        st = engine.init_state(jax.random.PRNGKey(0))
        t0 = time.perf_counter()
        st, m = engine.train_step(st, batch, rng)
        sync_metrics(m)
        print(f"{name}: G compile+run {time.perf_counter()-t0:.1f} s",
              flush=True)
        t0 = time.perf_counter()
        st, m = engine.train_step(st, batch, rng)
        sync_metrics(m)
        print(f"{name}: D compile+run {time.perf_counter()-t0:.1f} s",
              flush=True)
        mem_report(name)

        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            st, m1 = engine.train_step(st, batch, rng)
            st, m2 = engine.train_step(st, batch, rng)
            sync_metrics(m2)
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: steady G+D pair {best*1000:.0f} ms "
              f"-> {2/best:.2f} steps/s", flush=True)
        if args.trace:
            from cvvae_tpu.utils.profiling import trace
            with trace(args.trace):
                st, m = engine.train_step(st, batch, rng)
                sync_metrics(m)
            print(f"  trace written to {args.trace}", flush=True)


if __name__ == "__main__":
    main()
