"""Per-stage timing of the v1 encoder/decoder at the 720p bench tile shapes.

Times cumulative prefixes of the net (conv_in, each level, mid, out) and
differences them, so the ~35 ms dispatch+fetch overhead cancels.  Each
prefix is synced by scalar fetch (block_until_ready lies under axon).

Usage:  python tools/profile_stages.py [--dtype bf16] [--iters 3]
Prints a JSON dict of stage -> seconds (min over iters).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp


QUANTIZED = False


def time_prefixes(named_stages, x0, iters):
    """named_stages: list[(name, fn h->h)].  Returns {name: seconds}.

    Each prefix returns an in-jit scalar checksum (a full fetch of the
    multi-GB stage outputs would double peak HBM via the fp32 convert)."""
    results = {}
    # Baseline: an empty program on the same input — the ~30-35 ms
    # dispatch+fetch tunnel overhead otherwise lands entirely on the
    # FIRST stage's differenced time (this inflated dec conv_in to
    # "32 ms" in round 2; its isolated cost is ~3.6 ms).
    jb = jax.jit(lambda h: jnp.sum(h[..., 0, 0].astype(jnp.float32)))
    float(jb(x0))
    prev = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jb(x0))
        prev = min(prev, time.perf_counter() - t0)
    print(f"  {'(dispatch baseline)':<16s} {prev*1000:8.1f} ms", flush=True)
    fns = []
    for name, fn in named_stages:
        fns.append(fn)
        stages = list(fns)

        def prefix(h, stages=stages):
            import contextlib

            from cvvae_tpu.ops.attention import no_flash_attention
            ctx = (no_flash_attention() if QUANTIZED
                   else contextlib.nullcontext())
            with ctx:
                for s in stages:
                    h = s(h)
                return jnp.sum(h.astype(jnp.float32))

        jf = jax.jit(prefix)
        float(jf(x0))  # compile + warm; scalar fetch = real barrier
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            float(jf(x0))
            best = min(best, time.perf_counter() - t0)
        results[name] = best - prev
        results[f"cum/{name}"] = best
        prev = best
        print(f"  {name:<16s} stage={results[name]*1000:8.1f} ms  "
              f"cum={best*1000:8.1f} ms", flush=True)
    return results


def encoder_stages(params, cfg):
    from cvvae_tpu.models import vae_v1 as m
    from cvvae_tpu.ops import conv as _conv_mod
    from cvvae_tpu.ops.norm import group_norm
    from cvvae_tpu.ops.activations import silu

    causal = cfg.causal_encoder
    stages = [("conv_in", lambda h: _conv_mod.conv3d(
        h, params["conv_in"], cfg.conv_spec(causal)))]

    def level(i):
        def run(h, i=i):
            lvl = params["down"][i]
            for blk in lvl["block"]:
                h = m.apply_resblock(blk, h, cfg, causal)
            if "downsample" in lvl:
                h = m.apply_downsample(lvl["downsample"], h,
                                       m._down_time(cfg, i))
            return h
        return run

    for i in range(cfg.num_levels):
        stages.append((f"enc_level{i}", level(i)))

    def mid(h):
        p = params["mid"]
        h = m.apply_resblock(p["block_1"], h, cfg, causal)
        h = m.apply_attn(p["attn_1"], h, cfg.encoder_attn, cfg.norm_num_groups)
        h = m.apply_resblock(p["block_2"], h, cfg, causal)
        return h

    def out(h):
        h = group_norm(h, params["norm_out"], num_groups=cfg.norm_num_groups,
                       eps=m.NORM_EPS)
        return _conv_mod.conv3d(silu(h), params["conv_out"], cfg.conv_spec(causal))

    stages += [("enc_mid", mid), ("enc_out", out)]
    return stages


def decoder_stages(params, cfg):
    from cvvae_tpu.models import vae_v1 as m
    from cvvae_tpu.ops import conv as _conv_mod
    from cvvae_tpu.ops.norm import group_norm
    from cvvae_tpu.ops.activations import silu

    causal = cfg.causal_decoder
    stages = [("conv_in", lambda h: _conv_mod.conv3d(
        h, params["conv_in"], cfg.conv_spec(causal)))]

    def mid(h):
        p = params["mid"]
        h = m.apply_resblock(p["block_1"], h, cfg, causal)
        h = m.apply_attn(p["attn_1"], h, cfg.decoder_attn, cfg.norm_num_groups)
        h = m.apply_resblock(p["block_2"], h, cfg, causal)
        return h

    stages.append(("dec_mid", mid))

    def blocks(i):
        def run(h, i=i):
            lvl = params["up"][i]
            for blk in lvl["block"]:
                h = m.apply_resblock(blk, h, cfg, causal)
            return h
        return run

    def upsample(i):
        def run(h, i=i):
            return m.apply_upsample(params["up"][i]["upsample"], h,
                                    m._up_time(cfg, i), causal)
        return run

    for i in reversed(range(cfg.num_levels)):
        stages.append((f"dec_blocks{i}", blocks(i)))
        if i != 0:
            stages.append((f"dec_upsample{i}", upsample(i)))

    def out(h):
        h = group_norm(h, params["norm_out"], num_groups=cfg.norm_num_groups,
                       eps=m.NORM_EPS)
        return _conv_mod.conv3d(silu(h), params["conv_out"], cfg.conv_spec(causal))

    stages.append(("dec_out", out))
    return stages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--tile", type=int, default=720)
    ap.add_argument("--frames", type=int, default=17)
    ap.add_argument("--quantize", action="store_true",
                    help="profile the int8 conv stack (ops/quant.py)")
    ap.add_argument("--calibrate", action="store_true",
                    help="with --quantize: static activation scales from "
                         "an eager 256px calibration pass")
    ap.add_argument("--skip_encoder", action="store_true")
    ap.add_argument("--skip_decoder", action="store_true")
    args = ap.parse_args()

    from cvvae_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from cvvae_tpu.models import vae_v1 as m

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = m.VAE1Config()
    k = jax.random.PRNGKey(0)
    ke, kd, kx, kz = jax.random.split(k, 4)
    enc = jax.tree.map(lambda a: a.astype(dtype), m.init_encoder(ke, cfg))
    dec = jax.tree.map(lambda a: a.astype(dtype), m.init_decoder(kd, cfg))
    tag = args.dtype
    if args.quantize:
        from cvvae_tpu.ops.quant import quantize_conv_params
        enc = quantize_conv_params(enc)
        dec = quantize_conv_params(dec)
        tag += "+int8"
        global QUANTIZED
        QUANTIZED = True
        if args.calibrate:
            from cvvae_tpu.ops.quant import (attach_activation_scales,
                                             calibration_scope)
            xc = jax.random.normal(jax.random.PRNGKey(9),
                                   (1, args.frames, 256, 256, 3), dtype)
            with calibration_scope() as rec:
                mom = m.apply_encoder(enc, xc, cfg)
                m.apply_decoder(dec, mom[..., :mom.shape[-1] // 2], cfg)
            enc = attach_activation_scales(enc, rec)
            dec = attach_activation_scales(dec, rec)
            tag += "+calib"

    x = jax.random.normal(kx, (1, args.frames, args.tile, args.tile, 3), dtype)
    tz = 1 + (args.frames - 1) // 4
    z = jax.random.normal(kz, (1, min(tz, 5), args.tile // 8, args.tile // 8,
                               cfg.z_channels), dtype)

    enc_times = dec_times = {}
    if not args.skip_encoder:
        print(f"# encoder x={x.shape} {tag}", flush=True)
        enc_times = time_prefixes(encoder_stages(enc, cfg), x, args.iters)
    if not args.skip_decoder:
        print(f"# decoder z={z.shape} {tag}", flush=True)
        dec_times = time_prefixes(decoder_stages(dec, cfg), z, args.iters)
    print(json.dumps({"encoder": enc_times, "decoder": dec_times}))


if __name__ == "__main__":
    main()
