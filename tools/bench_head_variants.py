"""Microbench: RGB-head conv lowerings (Cout=3).

A 3x3x3 conv to 3 channels uses 3/128 MXU output lanes (~2% util,
measured ~40 ms at the 720x672 decode tile).  Variant: a 1x1x1 conv to
kT*kH*kW*3 = 81 tap-channels (81/128 lanes) followed by 27 shifted
elementwise adds — identical math, ~10x less MXU waste, bandwidth-cheap
epilogue.

Usage: python -m tools.bench_head_variants
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

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


def head_direct(x, k, pads):
    return lax.conv_general_dilated(x, k, (1, 1, 1), pads,
                                    dimension_numbers=_DN)


def head_tapstack(x, k, pads):
    """k: (kT,kH,kW,I,O) with tiny O.  1x1 conv to (kT*kH*kW*O)
    channels, then sum 27 shifted slices."""
    kt, kh, kw, ci, co = k.shape
    k11 = k.transpose(3, 0, 1, 2, 4).reshape(ci, kt * kh * kw * co)
    u = lax.conv_general_dilated(
        x, k11[None, None, None], (1, 1, 1), [(0, 0)] * 3,
        dimension_numbers=_DN)
    b, t, h, w, _ = u.shape
    u = u.reshape(b, t, h, w, kt * kh * kw, co)
    (tl, tr), (hl, hr), (wl, wr) = pads
    up = jnp.pad(u, ((0, 0), (tl, tr), (hl, hr), (wl, wr), (0, 0), (0, 0)))
    out = None
    idx = 0
    to = t + tl + tr - kt + 1
    ho = h + hl + hr - kh + 1
    wo = w + wl + wr - kw + 1
    for dt in range(kt):
        for dh in range(kh):
            for dw in range(kw):
                term = up[:, dt:dt + to, dh:dh + ho, dw:dw + wo, idx]
                out = term if out is None else out + term
                idx += 1
    return out


def main():
    from cvvae_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    # numerics check (CPU-sized)
    kx, kk = jax.random.split(jax.random.PRNGKey(0))
    xs = jax.random.normal(kx, (1, 5, 32, 24, 16))
    ks = jax.random.normal(kk, (3, 3, 3, 16, 3)) * 0.1
    pads = [(2, 0), (1, 1), (1, 1)]
    import numpy as np
    np.testing.assert_allclose(
        np.asarray(head_tapstack(xs, ks, pads)),
        np.asarray(head_direct(xs, ks, pads)), atol=2e-4, rtol=1e-3)
    print("numerics OK")

    x = jax.random.normal(kx, (1, 17, 720, 672, 128), jnp.bfloat16)
    k = (jax.random.normal(kk, (3, 3, 3, 128, 3)) * 0.05).astype(jnp.bfloat16)
    t = timed(jax.jit(lambda a, b: head_direct(a, b, pads)), x, k)
    print(f"head direct 3x3x3 128->3 : {t*1e3:7.1f} ms")
    t = timed(jax.jit(lambda a, b: head_tapstack(a, b, pads)), x, k)
    print(f"head tapstack (81ch 1x1) : {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
