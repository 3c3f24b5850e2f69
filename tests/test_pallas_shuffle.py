"""Pallas subpixel-interleave kernel == the XLA shuffle, bit for bit.

The kernel (ops/pallas/shuffle.py) is a pure permutation + bias add, so
parity with the tail of upsample2x_conv3x3_interleave must be EXACT
(same adds in the same dtype), across n in {1, 2}, drop_first on/off,
odd/even H blocking, and through the full fused upsample entry point
under the pallas_shuffle() gate.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cvvae_tpu.ops.pallas.shuffle import (pallas_shuffle, shuffle_usable,
                                          subpixel_interleave)
from cvvae_tpu.ops.upsample_conv import upsample2x_conv3x3_interleave


def _xla_shuffle(phases, bias, n, drop_first):
    b, t, h, w, nc = phases[0].shape
    c = nc // n
    y = jnp.stack(phases, axis=4)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    y = y.reshape(b, t, h, w, 2, 2, n, c)
    y = y.transpose(0, 1, 6, 2, 4, 3, 5, 7)
    y = y.reshape(b, t * n, 2 * h, 2 * w, c)
    if n > 1 and drop_first:
        y = y[:, 1:]
    return y


@pytest.mark.parametrize("n,drop", [(2, True), (2, False), (1, False)])
@pytest.mark.parametrize("shape", [(1, 3, 8, 16, None), (1, 2, 4, 8, None)])
def test_interleave_matches_xla(n, drop, shape):
    c = 128                      # lane-aligned channel group
    b, t, h, w, _ = shape
    rng = np.random.RandomState(hash((n, drop, h)) % 2**31)
    phases = [jnp.asarray(rng.randn(b, t, h, w, n * c), jnp.float32)
              for _ in range(4)]
    bias = jnp.asarray(rng.randn(n * c), jnp.float32)
    assert shuffle_usable(phases, n, c)
    got = subpixel_interleave(phases, bias, n=n, drop_first=drop,
                              interpret=True)
    ref = _xla_shuffle(phases, bias, n, drop)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_interleave_no_bias_and_odd_h_blocking():
    rng = np.random.RandomState(0)
    phases = [jnp.asarray(rng.randn(1, 2, 5, 8, 256), jnp.float32)
              for _ in range(4)]                     # H=5: bh falls to 1
    got = subpixel_interleave(phases, None, n=2, interpret=True)
    ref = _xla_shuffle(phases, None, 2, True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_upsample_under_gate():
    """upsample2x_conv3x3_interleave with the gate on == gate off."""
    from cvvae_tpu.ops.pallas import shuffle as shuffle_mod

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 3, 6, 6, 16), jnp.float32)
    params = {
        "kernel": jnp.asarray(rng.randn(3, 3, 3, 16, 256) * 0.05,
                              jnp.float32),
        "bias": jnp.asarray(rng.randn(256) * 0.1, jnp.float32),
    }
    ref = upsample2x_conv3x3_interleave(x, params, n=2, t_pad=(1, 1),
                                        t_mode="edge", hw_mode="zero")
    prev = shuffle_mod._INTERPRET
    shuffle_mod._INTERPRET = True       # CPU test env: no Mosaic backend
    try:
        with pallas_shuffle():
            got = upsample2x_conv3x3_interleave(
                x, params, n=2, t_pad=(1, 1), t_mode="edge",
                hw_mode="zero")
    finally:
        shuffle_mod._INTERPRET = prev
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_usable_gate_rejects_misfits():
    p = [jnp.zeros((1, 2, 4, 4, 96)) for _ in range(4)]    # c=48 !% 128
    assert not shuffle_usable(p, 2, 48)
    p = [jnp.zeros((2, 2, 4, 4, 256)) for _ in range(4)]   # batch 2
    assert not shuffle_usable(p, 2, 128)
