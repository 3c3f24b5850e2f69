"""Probe: where does the encoder stem's time go?

The stacked-stem lowering reaches kT*kH*Cin=27 contraction depth but
still measures ~43 ms at the full 720p frame (theory: ~5 ms compute +
~6 ms traffic).  This times the pieces: the pad+stack (9 shifted views
-> 27-channel concat), the (1,1,3) conv alone, the fused whole, the
direct lowering, and the 81-deep im2col variant.

Usage: python -m tools.probe_stem
"""
import time
import jax
import jax.numpy as jnp
from jax import lax

from cvvae_tpu.ops.conv import (Conv3DSpec, _conv3d_small_cin,
                                _conv3d_stacked_stem, conv_init)
from cvvae_tpu.utils.profiling import enable_compilation_cache

_DN = ("NDHWC", "DHWIO", "NDHWC")


def timed(fn, *args, iters=4):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    enable_compilation_cache()
    spec = Conv3DSpec.v1_causal()
    params = conv_init(jax.random.PRNGKey(0), spec, 3, 128)
    k = params["kernel"].astype(jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 17, 720, 1280, 3),
                          jnp.bfloat16)

    def stack_only(x):
        xp = jnp.pad(x, ((0, 0), (2, 0), (0, 0), (0, 0), (0, 0)),
                     mode="edge")
        xp = jnp.pad(xp, ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0)))
        t_out, h_out = 17, 720
        views = [xp[:, dt:dt + t_out, dh:dh + h_out]
                 for dt in range(3) for dh in range(3)]
        return jnp.concatenate(views, axis=-1)

    t = timed(jax.jit(stack_only), x)
    print(f"stack only (pad + 9-view concat): {t*1e3:7.1f} ms")

    z = jax.jit(stack_only)(x)

    def conv_only(z, k):
        k2 = jnp.transpose(k, (2, 0, 1, 3, 4)).reshape(1, 1, 3, 27, 128)
        return lax.conv_general_dilated(z, k2, (1, 1, 1),
                                        [(0, 0), (0, 0), (1, 1)],
                                        dimension_numbers=_DN)

    t = timed(jax.jit(conv_only), z, k)
    print(f"(1,1,3) conv on stacked:          {t*1e3:7.1f} ms")
    t = timed(jax.jit(lambda x, k: _conv3d_stacked_stem(x, k, spec, None)),
              x, k)
    print(f"stacked fused (shipped):          {t*1e3:7.1f} ms")

    def direct(x, k):
        xp = jnp.pad(x, ((0, 0), (2, 0), (0, 0), (0, 0), (0, 0)),
                     mode="edge")
        return lax.conv_general_dilated(xp, k, (1, 1, 1),
                                        [(0, 0), (1, 1), (1, 1)],
                                        dimension_numbers=_DN)

    t = timed(jax.jit(direct), x, k)
    print(f"direct conv:                      {t*1e3:7.1f} ms")
    t = timed(jax.jit(lambda x, k: _conv3d_small_cin(x, k, spec, None)),
              x, k)
    print(f"im2col 81-deep:                   {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
