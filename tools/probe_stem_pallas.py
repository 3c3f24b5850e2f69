"""Probe: Pallas stem kernel vs the XLA stacked-stem lowering on TPU.

Three measurements at the 720p full-frame encoder stem shape
(1, 17, 720, 1280, 3) -> 128ch:

  1. standalone: stacked-stem (current) vs Pallas kernel, in-jit x3
     chains, scalar-fetch synced.
  2. pathology check: the same two variants INSIDE a program that also
     runs an int8 conv (the flash-attention custom call was a ~10x
     layout-thrash pathology in exactly this setting — PERF.md;
     validate before wiring the kernel into the int8 serving path).
  3. the decoder latent stem (1, 5, 90, 84, 4) -> 512ch variant.

Usage: PYTHONPATH="$PYTHONPATH:." python tools/probe_stem_pallas.py
"""

import time

import jax
import jax.numpy as jnp

from cvvae_tpu.ops.conv import Conv3DSpec
from cvvae_tpu.ops.conv import conv3d as _conv3d
from cvvae_tpu.ops.pallas.stem import no_pallas_stem, stem_conv3d


def conv3d(*a, **kw):
    """The XLA lowering regardless of the conv3d stem dispatch."""
    with no_pallas_stem():
        return _conv3d(*a, **kw)


def timed(name, fn, *args, iters=3, chain=3):
    jf = jax.jit(fn)
    float(jf(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jf(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"  {name:<46s} {best/chain*1000:8.1f} ms/call")
    return best / chain


def chain3(fn):
    """Nonlinear 3x chain: each iteration rescales x by |prev sum|, so
    XLA's algebraic simplifier cannot collapse the affine conv chain
    into one call (the same guard as probe_dec_lowres.py /
    probe_int8_blocks.py — a purely additive perturbation measured
    impossible >300 TFLOP/s there)."""
    def run(x, *rest):
        acc = 0.0
        h = x
        for _ in range(3):
            y = fn(h, *rest)
            s = jnp.sum(jnp.abs(y.astype(jnp.float32)))
            acc = acc + s
            h = x * (1.0 + 1e-12 * s).astype(x.dtype)
        return acc
    return run


def main():
    from cvvae_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    spec = Conv3DSpec((3, 3, 3), (1, 1, 1), ((2, 0), (1, 1), (1, 1)),
                      ("edge", "zero", "zero"))
    x = jax.random.normal(key, (1, 17, 720, 1280, 3), dt)
    k = jax.random.normal(key, (3, 3, 3, 3, 128), dt) * 0.1
    b = jnp.zeros((128,), dt)
    p = {"kernel": k, "bias": b}

    print("encoder stem (1,17,720,1280,3) -> 128:")
    xla_t = timed("XLA stacked-stem (current)",
                  chain3(lambda v: conv3d(v, p, spec)), x)
    pl_t = timed("Pallas stem kernel",
                 chain3(lambda v: stem_conv3d(v, k, b, spec)), x)
    print(f"  -> speedup {xla_t / pl_t:.2f}x")

    # correctness on-device
    ref = conv3d(x[:, :5, :64, :128], p, spec)
    got = stem_conv3d(x[:, :5, :64, :128], k, b, spec)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"  max |diff| vs XLA on-device: {err:.3e}")

    # pathology check: int8 conv + stem variant in ONE program
    from cvvae_tpu.ops.quant import quantize_conv_params
    kq = jax.random.normal(key, (3, 3, 3, 128, 128), dt) * 0.05
    qp = quantize_conv_params(
        {"c": {"kernel": kq, "bias": jnp.zeros((128,), dt)}}, min_cin=64)["c"]
    spec_p = Conv3DSpec((3, 3, 3), (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
                        ("zero", "zero", "zero"))

    def mixed(v, stem_fn):
        h = stem_fn(v)
        return conv3d(h[:, :, ::4, ::4], qp, spec_p)

    print("int8-coexistence (stem + int8 conv in one program):")
    mx = timed("XLA stacked-stem + int8 conv",
               chain3(lambda v: mixed(v, lambda u: conv3d(u, p, spec))), x)
    mp = timed("Pallas stem + int8 conv",
               chain3(lambda v: mixed(
                   v, lambda u: stem_conv3d(u, k, b, spec))), x)
    print(f"  -> pathology factor {mp / mx:.2f}x "
          f"({'OK' if mp < 1.5 * mx else 'PATHOLOGICAL'})")

    print("decoder latent stem (1,5,90,84,4) -> 512 (needs H%8==0: 88):")
    spec_d = Conv3DSpec((3, 3, 3), (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
                        ("zero", "zero", "zero"))
    xd = jax.random.normal(key, (1, 5, 88, 84, 4), dt)
    kd = jax.random.normal(key, (3, 3, 3, 4, 512), dt) * 0.1
    bd = jnp.zeros((512,), dt)
    pd = {"kernel": kd, "bias": bd}
    xt = timed("XLA stacked-stem (current)",
               chain3(lambda v: conv3d(v, pd, spec_d)), xd)
    pt = timed("Pallas stem kernel",
               chain3(lambda v: stem_conv3d(v, kd, bd, spec_d)), xd)
    print(f"  -> speedup {xt / pt:.2f}x")


if __name__ == "__main__":
    main()
