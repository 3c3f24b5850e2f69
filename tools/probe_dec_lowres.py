"""Probe: decoder low-res overheads (conv_in + mid) at the 720x672 tile.

PERF.md round-2: decoder conv_in costs ~32 ms and the mid block ~45 ms
per tile while holding ~1% of the decoder FLOPs (latent res 90x84, 5
frames).  This measures each piece in isolation as in-jit xN chains
(dispatch+fetch overhead amortised; scalar-fetch synced) across
candidate lowerings to find where the time actually goes.

Usage: PYTHONPATH="$PYTHONPATH:." python tools/probe_dec_lowres.py
"""

import time

import jax
import jax.numpy as jnp

from cvvae_tpu.models import vae_v1 as m
from cvvae_tpu.models.vae_v1 import VAE1Config
from cvvae_tpu.ops import conv as convmod
from cvvae_tpu.ops.conv import Conv3DSpec, conv3d


def timed(name, fn, *args, iters=3, n_chain=10):
    jf = jax.jit(fn)
    float(jf(*args))  # compile+warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jf(*args))
        best = min(best, time.perf_counter() - t0)
    per = (best) / n_chain * 1000
    print(f"  {name:<42s} {per:8.2f} ms/call  ({best*1000:7.1f} ms chain)")
    return per


def chain(fn, n=10):
    """x -> scalar.  Each iteration is made NONLINEAR in the previous
    one (|y| feeds a rescale of x): with a purely additive perturbation
    XLA's algebraic simplifier can collapse sum-of-linear-op chains
    (measured: impossible >300 TFLOP/s rates in the first version of
    tools/probe_int8_blocks.py)."""
    def run(x, *rest):
        acc = 0.0
        h = x
        for i in range(n):
            y = fn(h, *rest)
            s = jnp.sum(jnp.abs(y.astype(jnp.float32)))
            acc = acc + s
            h = x * (1.0 + 1e-12 * s).astype(x.dtype)
        return acc
    return run


def main():
    from cvvae_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    cfg = VAE1Config()
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    t, h, w = 5, 90, 84

    # ---------------- conv_in: 4 -> 512, 3x3x3 ----------------
    print(f"decoder conv_in (Cin=4 -> {cfg.ch * cfg.ch_mult[-1]}), "
          f"({t},{h},{w}) latent tile:")
    c_out = cfg.ch * cfg.ch_mult[-1]
    spec = cfg.conv_spec(cfg.causal_decoder)
    k = jax.random.normal(key, (3, 3, 3, 4, c_out), dt) * 0.05
    b = jnp.zeros((c_out,), dt)
    params = {"kernel": k, "bias": b}
    x = jax.random.normal(key, (1, t, h, w, 4), dt)

    timed("current conv3d (stacked-stem path)",
          chain(lambda v: conv3d(v, params, spec)), x)
    timed("direct lax conv (edge pad materialised)",
          chain(lambda v: _direct(v, k, b, spec)), x)
    timed("im2col 27-tap (_conv3d_small_cin)",
          chain(lambda v: convmod._conv3d_small_cin(v, k, spec, None) + b), x)

    # ---------------- mid block pieces ----------------
    print(f"mid block ({t},{h},{w},{c_out}):")
    km1 = jax.random.normal(key, (3, 3, 3, c_out, c_out), dt) * 0.01
    xm = jax.random.normal(key, (1, t, h, w, c_out), dt)
    pm = {"kernel": km1, "bias": jnp.zeros((c_out,), dt)}
    spec_c = cfg.conv_spec(True)     # causal (encoder-style) edge-time
    spec_p = cfg.conv_spec(False)    # plain zero-pad

    timed("3x3x3 conv 512->512 (causal spec, current)",
          chain(lambda v: conv3d(v, pm, spec_c)), xm)
    timed("3x3x3 conv 512->512 (plain spec, current)",
          chain(lambda v: conv3d(v, pm, spec_p)), xm)
    k2d = jax.random.normal(key, (1, 3, 3, c_out, c_out), dt) * 0.01
    p2d = {"kernel": k2d, "bias": jnp.zeros((c_out,), dt)}
    spec2d = Conv3DSpec((1, 3, 3), (1, 1, 1),
                        ((0, 0), (1, 1), (1, 1)), ("zero", "zero", "zero"))
    timed("2D 3x3 conv 512->512 (half_3d conv2)",
          chain(lambda v: conv3d(v, p2d, spec2d)), xm)

    # full resblock + attention
    kp = jax.random.PRNGKey(1)
    rb = m.init_resblock(kp, cfg, c_out, c_out, cfg.causal_decoder, dt)
    timed("full ResnetBlock3D",
          chain(lambda v: m.apply_resblock(rb, v, cfg, cfg.causal_decoder)),
          xm)
    at = m.init_attn(kp, c_out, cfg.decoder_attn, dt)
    timed("mid attention (flash if platform allows)",
          chain(lambda v: m.apply_attn(at, v, cfg.decoder_attn,
                                       cfg.norm_num_groups)), xm)
    from cvvae_tpu.ops.attention import no_flash_attention

    def attn_noflash(v):
        with no_flash_attention():
            return m.apply_attn(at, v, cfg.decoder_attn, cfg.norm_num_groups)
    timed("mid attention (exact q=512)", chain(attn_noflash), xm)


def _direct(v, k, b, spec):
    from jax import lax
    v = convmod._edge_pad(v, spec.pads, spec.modes)
    lax_padding = [tuple(p) if mode == "zero" else (0, 0)
                   for p, mode in zip(spec.pads, spec.modes)]
    return lax.conv_general_dilated(
        v, k, window_strides=spec.stride, padding=lax_padding,
        dimension_numbers=convmod._DIMENSION_NUMBERS) + b


if __name__ == "__main__":
    main()
