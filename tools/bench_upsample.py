"""Microbench: upsample2x+conv variants at the decoder's hot shapes.

Variants:
  a) shipped: upsample2x_conv3x3 (4 phase convs, stack, 2-step shuffle)
     + temporal_interleave (moveaxis + slice)
  b) fused shuffle: same 4 phase convs, but one combined
     (phase, time) -> (T*n, 2H, 2W) transpose incl. drop_first slice
  c) naive: nearest_upsample then conv (the reference pipeline)

Each timed as an in-jit x2 chain analogue (single call, scalar checksum
fetch; dispatch overhead ~35ms subtracted via an empty baseline).
"""

import time

import jax
import jax.numpy as jnp

from cvvae_tpu.ops.conv import Conv3DSpec, conv3d
from cvvae_tpu.ops.resample import nearest_upsample_2x_spatial, temporal_interleave
from cvvae_tpu.ops.upsample_conv import _phase_kernels, upsample2x_conv3x3

_DN = ("NDHWC", "DHWIO", "NDHWC")


def variant_a(x, params, n, t_pad):
    y = upsample2x_conv3x3(x, params, t_pad=t_pad, t_mode="edge",
                           hw_mode="zero")
    return temporal_interleave(y, n, drop_first=True)


def variant_b(x, params, n, t_pad):
    kernel = params["kernel"].astype(x.dtype)
    x = jnp.pad(x, ((0, 0), tuple(t_pad), (0, 0), (0, 0), (0, 0)),
                mode="edge")
    pads = {"even": (1, 0), "odd": (0, 1)}
    ks = _phase_kernels(kernel)
    phases = []
    for idx, (hp, wp) in enumerate((("even", "even"), ("even", "odd"),
                                    ("odd", "even"), ("odd", "odd"))):
        phases.append(jax.lax.conv_general_dilated(
            x, ks[idx], (1, 1, 1), [(0, 0), pads[hp], pads[wp]],
            dimension_numbers=_DN))
    b, t, h, w, nc = phases[0].shape
    c = nc // n
    y = jnp.stack(phases, axis=4)                   # (B,T,H,W,4,n*c)
    y = y + params["bias"].astype(y.dtype)
    y = y.reshape(b, t, h, w, 2, 2, n, c)
    y = y.transpose(0, 1, 6, 2, 4, 3, 5, 7)        # (B,T,n,H,2,W,2,c)
    y = y.reshape(b, t * n, 2 * h, 2 * w, c)
    if n > 1:
        y = y[:, 1:]
    return y


def variant_c(x, params, n, t_pad):
    y = nearest_upsample_2x_spatial(x)
    spec = Conv3DSpec((3, 3, 3), (1, 1, 1), (tuple(t_pad), (1, 1), (1, 1)),
                      ("edge", "zero", "zero"))
    y = conv3d(y, params, spec)
    return temporal_interleave(y, n, drop_first=True)


def main():
    from cvvae_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    shapes = [
        ("level3->2 (timeup)", (1, 5, 180, 180, 512), 512, 2),
        ("level2->1        ", (1, 9, 180, 180, 512), 512, 1),
        ("level1->0 (timeup)", (1, 9, 360, 360, 256), 256, 2),
    ]
    key = jax.random.PRNGKey(0)
    for name, shape, c_in, n in shapes:
        x = jax.random.normal(key, shape, jnp.bfloat16)
        kernel = (jax.random.normal(key, (3, 3, 3, c_in, c_in * n),
                                    jnp.bfloat16) * 0.02)
        params = {"kernel": kernel, "bias": jnp.zeros((c_in * n,),
                                                      jnp.bfloat16)}
        for vname, fn in [("a_shipped", variant_a), ("b_fused", variant_b),
                          ("c_naive", variant_c)]:
            jf = jax.jit(lambda xx, fn=fn: jnp.sum(
                fn(xx, params, n, (1, 1)).astype(jnp.float32)))
            try:
                va = float(jf(x))
                best = min(
                    (lambda t0: (float(jf(x)), time.perf_counter() - t0)[1])(
                        time.perf_counter()) for _ in range(4))
            except Exception as e:  # OOM etc.
                print(f"{name} {vname}: FAILED {type(e).__name__}", flush=True)
                continue
            print(f"{name} {vname}: {best*1000:7.1f} ms (chk {va:.1f})",
                  flush=True)


if __name__ == "__main__":
    main()
