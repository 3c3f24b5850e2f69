"""Probe: why dec_upsample1 runs at 93 TOP/s (its sibling hits 154).

Round-4 stage table (PERF.md): dec_upsample1 — (9,360,360,256) ->
interleave (17,720,720,256) — takes 157 ms at the int8+calib profile,
24% of paper peak, the worst big stage.  This probe splits the stage
and times variants at exactly that shape:

  shipped      upsample2x_conv3x3_interleave (4 phase convs + fused
               (phase,time)->(T*n,2H,2W) shuffle)
  convs-only   the 4 phase convs, summed checksum, no shuffle
  shuffle-only stack+transpose+reshape of precomputed phases
  one-conv     ONE conv with the 4 phase kernels concatenated on the
               output-channel axis (1 input read instead of 4, bigger
               MXU tile) + the same fused shuffle
  int8 modes   shipped and one-conv with calibrated int8 phase convs

Usage: PYTHONPATH=/root/.axon_site:. python tools/probe_upsample1.py
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

from cvvae_tpu.ops.upsample_conv import (_phase_kernels,
                                         upsample2x_conv3x3_interleave)

_DN = ("NDHWC", "DHWIO", "NDHWC")

SHAPE = (1, 9, 360, 360, 256)   # dec_upsample1 input at the 720px tile
N = 2                            # temporal x2 (channel-split)
C_OUT = 256 * N                  # kernel C_out (n*c)
T_PAD = (1, 1)                   # v1 decoder is non-causal


def timed(name, fn, *args, iters=3):
    jf = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(jf(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jf(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"  {name:<22s} {best * 1e3:8.1f} ms", flush=True)
    return best


def shuffle(phases, bias, n):
    b, t, h, w, nc = phases[0].shape
    c = nc // n
    y = jnp.stack(phases, axis=4)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    y = y.reshape(b, t, h, w, 2, 2, n, c)
    y = y.transpose(0, 1, 6, 2, 4, 3, 5, 7)
    y = y.reshape(b, t * n, 2 * h, 2 * w, c)
    return y[:, 1:]


def phase_convs(x, ks, t_pad):
    pads = {"even": (1, 0), "odd": (0, 1)}
    return [lax.conv_general_dilated(
        x, ks[i], (1, 1, 1),
        [tuple(t_pad), pads[hp], pads[wp]], dimension_numbers=_DN)
        for i, (hp, wp) in enumerate((("even", "even"), ("even", "odd"),
                                      ("odd", "even"), ("odd", "odd")))]


def main():
    from cvvae_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, SHAPE, jnp.bfloat16)
    kernel = (jax.random.normal(jax.random.PRNGKey(1),
                                (3, 3, 3, SHAPE[-1], C_OUT), jnp.float32)
              * 0.02).astype(jnp.bfloat16)
    bias = jnp.zeros((C_OUT,), jnp.bfloat16)
    params = {"kernel": kernel, "bias": bias}

    print(f"dec_upsample1 shape {SHAPE} -> interleave n={N}", flush=True)

    timed("shipped", lambda v: upsample2x_conv3x3_interleave(
        v, params, n=N, t_pad=T_PAD, t_mode="edge", hw_mode="zero"), x)

    ks = _phase_kernels(kernel)

    def convs_only(v):
        ph = phase_convs(v, ks, T_PAD)
        return sum(jnp.sum(p.astype(jnp.float32)) for p in ph)[None]

    timed("convs-only", convs_only, x)

    # shuffle-only: feed precomputed phases (held as args)
    ph = [jnp.asarray(p) for p in
          jax.jit(lambda v: phase_convs(v, ks, T_PAD))(x)]
    timed("shuffle-only", lambda *ps: shuffle(list(ps), bias, N), *ph)

    # one-conv: concatenate phase kernels on C_out -> (3,2,2,C,4*nc)
    k_cat = jnp.concatenate(ks, axis=-1)

    def one_conv(v):
        vp = jnp.pad(v, ((0, 0), tuple(T_PAD), (1, 0), (1, 0), (0, 0)),
                     mode="edge")
        y = lax.conv_general_dilated(
            vp, k_cat, (1, 1, 1), [(0, 0), (0, 0), (0, 0)],
            dimension_numbers=_DN)
        # y[..., 4*nc]: split back into phases; note the single conv pads
        # H/W (1,0) which matches the "even" corner only — the other
        # corners differ by one-pixel shifts, so this variant is a PERF
        # EXPERIMENT ONLY (upper bound for the one-read layout), not
        # numerics-correct.
        b, t, h, w, _ = y.shape
        phases4 = [y[..., i * C_OUT:(i + 1) * C_OUT] for i in range(4)]
        return shuffle(phases4, bias, N)

    timed("one-conv(ub)", one_conv, x)

    # stack-stack-transpose (numerics-exact): the shipped path's single
    # 8-D fine-grained transpose runs at ~124 GB/s; decompose it into
    # (1) a pairwise W-phase stack whose (W,2,nc)->(2W,nc) flatten is
    # contiguous, (2) the same for H, (3) one COARSE n->time block
    # transpose ((2H,2W,c) blocks move whole) — three near-stream passes
    def sst(v, ks=ks, bias=bias):
        ph = phase_convs(v, ks, T_PAD)
        ph = [p + bias.astype(p.dtype) for p in ph]
        b, t, h, w, nc = ph[0].shape
        c = nc // N

        def w_interleave(p_we, p_wo):
            y = jnp.stack([p_we, p_wo], axis=4)        # (B,T,H,W,2,nc)
            return y.reshape(b, t, h, 2 * w, nc)       # contiguous

        he = w_interleave(ph[0], ph[1])
        ho = w_interleave(ph[2], ph[3])
        y = jnp.stack([he, ho], axis=3)                # (B,T,H,2,2W,nc)
        y = y.reshape(b, t, 2 * h, 2 * w, nc)
        if N > 1:
            y = y.reshape(b, t, 2 * h, 2 * w, N, c)
            y = y.transpose(0, 1, 4, 2, 3, 5)          # coarse blocks
            y = y.reshape(b, t * N, 2 * h, 2 * w, c)
            y = y[:, 1:]
        return y

    timed("sst (exact)", sst, x)

    # bit-check sst == shipped on a small shape
    import numpy as np
    xs = jax.random.normal(jax.random.PRNGKey(7), (1, 3, 32, 32, 16),
                           jnp.bfloat16)
    k_small = (jax.random.normal(jax.random.PRNGKey(8), (3, 3, 3, 16, 32),
                                 jnp.float32) * 0.05).astype(jnp.bfloat16)
    b_small = jax.random.normal(jax.random.PRNGKey(9), (32,), jnp.bfloat16)
    a = np.asarray(jax.jit(lambda v: sst(
        v, ks=_phase_kernels(k_small), bias=b_small))(xs), np.float32)
    ref = np.asarray(jax.jit(lambda v: upsample2x_conv3x3_interleave(
        v, {"kernel": k_small, "bias": b_small},
        n=N, t_pad=T_PAD, t_mode="edge", hw_mode="zero"))(xs), np.float32)
    print(f"  sst vs shipped max abs diff: {np.abs(a - ref).max():.2e}",
          flush=True)

    # int8 shipped
    from cvvae_tpu.ops.quant import quantize_conv_params
    qp = quantize_conv_params({"c": params}, min_cin=64)["c"]
    qp = dict(qp, scale_x=jnp.float32(
        float(jnp.max(jnp.abs(x.astype(jnp.float32)))) / 127.0))
    timed("shipped-int8", lambda v: upsample2x_conv3x3_interleave(
        v, qp, n=N, t_pad=T_PAD, t_mode="edge", hw_mode="zero"), x)

    # Pallas subpixel-interleave kernel (round 5, ops/pallas/shuffle.py)
    from cvvae_tpu.ops.pallas.shuffle import (pallas_shuffle,
                                              subpixel_interleave)

    for bh in (2, 4, 8):
        timed(f"pallas-shuffle bh={bh}",
              lambda *ps, bh=bh: subpixel_interleave(
                  list(ps), bias, n=N, block_h=bh), *ph)

    with pallas_shuffle():
        timed("shipped+pallas", lambda v: upsample2x_conv3x3_interleave(
            v, params, n=N, t_pad=T_PAD, t_mode="edge", hw_mode="zero"), x)
        timed("shipped-int8+pallas",
              lambda v: upsample2x_conv3x3_interleave(
                  v, qp, n=N, t_pad=T_PAD, t_mode="edge", hw_mode="zero"), x)

    # bit-check pallas == shipped on device at a small shape.  The gate
    # needs c % 128 == 0, so use C_out = N*128 (k_small's c=16 would
    # silently fall back to the XLA path and check nothing).
    k_pl = (jax.random.normal(jax.random.PRNGKey(10), (3, 3, 3, 16, 256),
                              jnp.float32) * 0.05).astype(jnp.bfloat16)
    b_pl = jax.random.normal(jax.random.PRNGKey(11), (256,), jnp.bfloat16)
    a = np.asarray(jax.jit(lambda v: upsample2x_conv3x3_interleave(
        v, {"kernel": k_pl, "bias": b_pl},
        n=N, t_pad=T_PAD, t_mode="edge", hw_mode="zero"))(xs), np.float32)
    with pallas_shuffle():
        bpl = np.asarray(jax.jit(lambda v: upsample2x_conv3x3_interleave(
            v, {"kernel": k_pl, "bias": b_pl},
            n=N, t_pad=T_PAD, t_mode="edge", hw_mode="zero"))(xs),
            np.float32)
    print(f"  pallas vs shipped max abs diff: {np.abs(a - bpl).max():.2e}",
          flush=True)


if __name__ == "__main__":
    main()
