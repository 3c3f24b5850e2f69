"""Probe: cheaper constructions of the stem's 27-channel tap stack.

probe_stem measured the pad + 9-view concat at 35.6 ms of the stem's
43 ms (846 MB written at an effective 24 GB/s — a copy/layout
pathology, not compute).  Variants:

  a) concat on the channel axis (shipped)
  b) jnp.stack on a new minor axis + free reshape
  c) lax.conv_general_dilated_patches (XLA's own im2col)
  d) b + conv fused in one jit (end-to-end stem)

Usage: python -m tools.probe_stem2
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


def padded(x):
    xp = jnp.pad(x, ((0, 0), (2, 0), (0, 0), (0, 0), (0, 0)), mode="edge")
    return jnp.pad(xp, ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0)))


def stack_concat(x):
    xp = padded(x)
    views = [xp[:, dt:dt + 17, dh:dh + 720] for dt in range(3)
             for dh in range(3)]
    return jnp.concatenate(views, axis=-1)


def stack_newaxis(x):
    xp = padded(x)
    views = [xp[:, dt:dt + 17, dh:dh + 720] for dt in range(3)
             for dh in range(3)]
    z = jnp.stack(views, axis=-2)            # (..., 9, 3)
    return z.reshape(z.shape[:-2] + (27,))

def stack_patches(x):
    xp = padded(x)
    # T/H window only; W window handled by the later (1,1,3) conv
    return lax.conv_general_dilated_patches(
        xp, filter_shape=(3, 3, 1), window_strides=(1, 1, 1),
        padding=[(0, 0)] * 3, dimension_numbers=_DN)


def main():
    enable_compilation_cache()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 17, 720, 1280, 3),
                          jnp.bfloat16)
    k = (jax.random.normal(jax.random.PRNGKey(0), (3, 3, 3, 3, 128))
         * 0.1).astype(jnp.bfloat16)

    for name, fn in (("concat (shipped)", stack_concat),
                     ("stack+reshape   ", stack_newaxis),
                     ("xla patches     ", stack_patches)):
        t = timed(jax.jit(fn), x)
        print(f"stack {name}: {t*1e3:7.1f} ms", flush=True)

    def stem_newaxis(x, k):
        z = stack_newaxis(x)
        # concat order: (dt, dh) major, cin minor -> matches transpose
        k2 = jnp.transpose(k, (2, 0, 1, 3, 4)).reshape(1, 1, 3, 27, 128)
        return lax.conv_general_dilated(z, k2, (1, 1, 1),
                                        [(0, 0), (0, 0), (1, 1)],
                                        dimension_numbers=_DN)

    t = timed(jax.jit(stem_newaxis), x, k)
    print(f"stem via stack+reshape end-to-end: {t*1e3:7.1f} ms", flush=True)

    # numerics: stack_newaxis == stack_concat ordering
    xs = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16, 12, 3))
    import numpy as np
    def sc(x):
        xp = jnp.pad(x, ((0,0),(2,0),(0,0),(0,0),(0,0)), mode="edge")
        xp = jnp.pad(xp, ((0,0),(0,0),(1,1),(0,0),(0,0)))
        views = [xp[:, dt:dt+5, dh:dh+16] for dt in range(3) for dh in range(3)]
        return jnp.concatenate(views, axis=-1)
    def sn(x):
        xp = jnp.pad(x, ((0,0),(2,0),(0,0),(0,0),(0,0)), mode="edge")
        xp = jnp.pad(xp, ((0,0),(0,0),(1,1),(0,0),(0,0)))
        views = [xp[:, dt:dt+5, dh:dh+16] for dt in range(3) for dh in range(3)]
        z = jnp.stack(views, axis=-2)
        return z.reshape(z.shape[:-2] + (27,))
    np.testing.assert_array_equal(np.asarray(sc(xs)), np.asarray(sn(xs)))
    print("ordering OK")


if __name__ == "__main__":
    main()
