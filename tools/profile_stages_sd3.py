"""Per-stage timing of the SD3-family encoder/decoder (16-ch latent,
block_out 128/256/512/512) at the 720p bench tile shapes.

Same method as tools/profile_stages.py (cumulative prefixes differenced
against a dispatch baseline); the stage split mirrors the reference
Encoder3D/Decoder3D structure (models/vae_models3d_sd3.py:55-391).

Usage:  python tools/profile_stages_sd3.py [--dtype bf16] [--iters 3]
                                           [--quantize [--calibrate]]
Prints a JSON dict of stage -> seconds (min over iters).
"""

import argparse
import json

import jax
import jax.numpy as jnp

import tools.profile_stages as ps


def encoder_stages(params, cfg):
    from cvvae_tpu.models import vae_sd3 as m
    from cvvae_tpu.ops import conv as _conv_mod
    from cvvae_tpu.ops.norm import group_norm
    from cvvae_tpu.ops.activations import silu

    causal = cfg.causal_encoder
    stages = [("conv_in", lambda h: _conv_mod.conv3d(
        h, params["conv_in"], cfg.conv_spec(causal)))]

    def level(i):
        def run(h, i=i):
            blk = params["down_blocks"][i]
            for r in blk["resnets"]:
                h = m.apply_resblock(r, h, cfg, causal)
            if "downsamplers" in blk:
                spec = m._downsample_spec(cfg, causal,
                                          m._encoder_down_time(cfg, i))
                h = _conv_mod.conv3d(h, blk["downsamplers"][0], spec)
            return h
        return run

    for i in range(cfg.num_levels):
        stages.append((f"enc_level{i}", level(i)))

    def mid(h):
        p = params["mid_block"]
        h = m.apply_resblock(p["resnets"][0], h, cfg, causal)
        if "attentions" in p:
            h = m.apply_attention(p["attentions"][0], h, cfg)
        h = m.apply_resblock(p["resnets"][1], h, cfg, causal)
        return h

    def out(h):
        h = group_norm(h, params["conv_norm_out"],
                       num_groups=cfg.norm_num_groups, eps=m.NORM_EPS)
        return _conv_mod.conv3d(silu(h), params["conv_out"],
                                cfg.conv_spec(causal))

    stages += [("enc_mid", mid), ("enc_out", out)]
    return stages


def decoder_stages(params, cfg):
    from cvvae_tpu.models import vae_sd3 as m
    from cvvae_tpu.ops import conv as _conv_mod
    from cvvae_tpu.ops.norm import group_norm
    from cvvae_tpu.ops.activations import silu

    causal = cfg.causal_decoder
    stages = [("conv_in", lambda h: _conv_mod.conv3d(
        h, params["conv_in"], cfg.conv_spec(causal)))]

    def mid(h):
        p = params["mid_block"]
        h = m.apply_resblock(p["resnets"][0], h, cfg, causal)
        if "attentions" in p:
            h = m.apply_attention(p["attentions"][0], h, cfg)
        h = m.apply_resblock(p["resnets"][1], h, cfg, causal)
        return h

    stages.append(("dec_mid", mid))

    # decoder up_blocks run mid->out; label by distance from the output
    # (blocks0 = full-res level) to match the v1 table
    n = cfg.num_levels

    def blocks(i):
        def run(h, i=i):
            for r in params["up_blocks"][i]["resnets"]:
                h = m.apply_resblock(r, h, cfg, causal)
            return h
        return run

    def upsample(i):
        def run(h, i=i):
            return m.apply_upsample(params["up_blocks"][i]["upsamplers"][0],
                                    h, cfg, causal, m._decoder_up_time(cfg, i))
        return run

    for i in range(n):
        stages.append((f"dec_blocks{n - 1 - i}", blocks(i)))
        if "upsamplers" in params["up_blocks"][i]:
            stages.append((f"dec_upsample{n - 1 - i}", upsample(i)))

    def out(h):
        h = group_norm(h, params["conv_norm_out"],
                       num_groups=cfg.norm_num_groups, eps=m.NORM_EPS)
        return _conv_mod.conv3d(silu(h), params["conv_out"],
                                cfg.conv_spec(causal))

    stages.append(("dec_out", out))
    return stages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--tile", type=int, default=720)
    ap.add_argument("--frames", type=int, default=17)
    ap.add_argument("--quantize", action="store_true")
    ap.add_argument("--calibrate", action="store_true")
    ap.add_argument("--skip_encoder", action="store_true")
    ap.add_argument("--skip_decoder", action="store_true")
    args = ap.parse_args()

    from cvvae_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from cvvae_tpu.models import vae_sd3 as m

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = m.VAESD3Config()
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
        ps.QUANTIZED = True
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
                               cfg.latent_channels), dtype)

    enc_times = dec_times = {}
    if not args.skip_encoder:
        print(f"# sd3 encoder x={x.shape} {tag}", flush=True)
        enc_times = ps.time_prefixes(encoder_stages(enc, cfg), x, args.iters)
    if not args.skip_decoder:
        print(f"# sd3 decoder z={z.shape} {tag}", flush=True)
        dec_times = ps.time_prefixes(decoder_stages(dec, cfg), z, args.iters)
    print(json.dumps({"encoder": enc_times, "decoder": dec_times}))


if __name__ == "__main__":
    main()
