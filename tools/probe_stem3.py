"""Probe: lane-aligned tap-stack for the stem.

The 9-view concat on the 3-channel minor axis reads 6-byte strided
fragments (24 GB/s effective).  Variant: transpose pixels to W-minor
(lanes = 1280), stack taps there (contiguous lane reads), transpose the
846 MB result back to features-minor once (aligned transposes run near
copy speed).

Usage: python -m tools.probe_stem3
"""
import time
import jax
import jax.numpy as jnp
from jax import lax

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


def stem_wminor(x, k):
    # (B,T,H,W,3) -> (B,3,T,H,W): W in lanes
    xt = jnp.transpose(x, (0, 4, 1, 2, 3))
    xt = jnp.pad(xt, ((0, 0), (0, 0), (2, 0), (0, 0), (0, 0)), mode="edge")
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    views = [xt[:, :, dt:dt + 17, dh:dh + 720]
             for dt in range(3) for dh in range(3)]
    z = jnp.stack(views, axis=1)              # (B, 9, 3, T, H, W)
    z = jnp.transpose(z, (0, 3, 4, 5, 1, 2))  # (B, T, H, W, 9, 3)
    z = z.reshape(z.shape[:4] + (27,))
    k2 = jnp.transpose(k, (2, 0, 1, 3, 4)).reshape(1, 1, 3, 27, 128)
    return lax.conv_general_dilated(z, k2, (1, 1, 1),
                                    [(0, 0), (0, 0), (1, 1)],
                                    dimension_numbers=_DN)


def main():
    enable_compilation_cache()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 17, 720, 1280, 3),
                          jnp.bfloat16)
    k = (jax.random.normal(jax.random.PRNGKey(0), (3, 3, 3, 3, 128))
         * 0.1).astype(jnp.bfloat16)
    t = timed(jax.jit(stem_wminor), x, k)
    print(f"stem via W-minor stack: {t*1e3:7.1f} ms", flush=True)

    # numerics vs the shipped stacked stem
    from cvvae_tpu.ops.conv import Conv3DSpec, _conv3d_stacked_stem
    import numpy as np
    xs = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16, 12, 3))
    ks = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 3, 3, 8)) * 0.1

    def small_wminor(x, k):
        xt = jnp.transpose(x, (0, 4, 1, 2, 3))
        xt = jnp.pad(xt, ((0, 0), (0, 0), (2, 0), (0, 0), (0, 0)),
                     mode="edge")
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
        views = [xt[:, :, dt:dt + 5, dh:dh + 16]
                 for dt in range(3) for dh in range(3)]
        z = jnp.stack(views, axis=1)
        z = jnp.transpose(z, (0, 3, 4, 5, 1, 2))
        z = z.reshape(z.shape[:4] + (27,))
        k2 = jnp.transpose(k, (2, 0, 1, 3, 4)).reshape(1, 1, 3, 27, 8)
        return lax.conv_general_dilated(z, k2, (1, 1, 1),
                                        [(0, 0), (0, 0), (1, 1)],
                                        dimension_numbers=_DN)

    ref = _conv3d_stacked_stem(xs, ks, Conv3DSpec.v1_causal(), None)
    np.testing.assert_allclose(np.asarray(small_wminor(xs, ks)),
                               np.asarray(ref), atol=2e-5, rtol=1e-4)
    print("numerics OK")


if __name__ == "__main__":
    main()
