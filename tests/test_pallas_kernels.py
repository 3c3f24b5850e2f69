"""Pallas kernel correctness (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cvvae_tpu.ops.activations import silu
from cvvae_tpu.ops.norm import group_norm
from cvvae_tpu.ops.pallas.groupnorm import group_norm_silu_pallas


@pytest.mark.parametrize("silu_on", [True, False])
def test_group_norm_silu_pallas_matches_xla(silu_on):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 4, 8, 16, 128).astype(np.float32))
    scale = jnp.asarray(rs.randn(128).astype(np.float32))
    bias = jnp.asarray(rs.randn(128).astype(np.float32))
    ref = group_norm(x, {"scale": scale, "bias": bias}, num_groups=4,
                     eps=1e-6)
    if silu_on:
        ref = silu(ref)
    got = group_norm_silu_pallas(x, scale, bias, num_groups=4, eps=1e-6,
                                 silu=silu_on, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_group_norm_silu_pallas_fallback():
    """Unaligned channels -> None (caller falls back to XLA)."""
    x = jnp.zeros((1, 4, 4, 4, 64))
    out = group_norm_silu_pallas(x, jnp.ones(64), jnp.zeros(64),
                                 num_groups=4, interpret=True)
    assert out is None


@pytest.mark.slow
@pytest.mark.parametrize("s", [600, 1024])
def test_flash_attention_matches_exact(s):
    """The production bf16 flash path (ops/attention.py:_flash_attention,
    incl. the segment-id mask for S not a 512-multiple) agrees with the
    exact query-blocked attention — run via the Pallas TPU interpreter
    so the CPU suite exercises the real kernel + padding logic."""
    import jax.experimental.pallas.tpu as pltpu

    from cvvae_tpu.ops.attention import _flash_attention, _me_attention

    key = jax.random.PRNGKey(0)
    q, k, v = (0.5 * jax.random.normal(jax.random.fold_in(key, i),
                                       (2, s, 64), jnp.bfloat16)
               for i in range(3))
    scale = 1.0 / 8.0
    ref = _me_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32), scale)
    with pltpu.force_tpu_interpret_mode():
        out = _flash_attention(q, k, v, scale)
    assert out.shape == (2, s, 64)
    # bf16 inputs: flash's fp32 in-kernel accumulation vs the fp32
    # reference differs only by input rounding
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), atol=5e-3, rtol=5e-2)
    # padded-S path: masked keys must not leak into valid rows — the
    # first valid row's output equals exact attention over ONLY the
    # valid keys (already implied by ref, but assert the padding case
    # didn't silently change S)
    if s % 512:
        assert (-(-s // 512) * 512) != s


@pytest.mark.parametrize("cin,modes,pads", [
    (3, ("edge", "zero", "zero"), ((2, 0), (1, 1), (1, 1))),  # v1 stem
    (4, ("zero", "zero", "zero"), ((1, 1), (1, 1), (1, 1))),  # latent stem
])
def test_pallas_stem_matches_conv3d(cin, modes, pads):
    """ops/pallas/stem.py == the XLA conv lowering for both stem
    flavours (causal pixel stem, zero-pad latent stem), via the Pallas
    interpreter so the CPU suite runs the real kernel body."""
    from cvvae_tpu.ops.conv import Conv3DSpec, conv3d
    from cvvae_tpu.ops.pallas.stem import stem_conv3d

    spec = Conv3DSpec((3, 3, 3), (1, 1, 1), pads, modes)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 5, 16, 12, cin), jnp.float32)
    k = 0.1 * jax.random.normal(key, (3, 3, 3, cin, 128), jnp.float32)
    b = jax.random.normal(key, (128,), jnp.float32)
    ref = conv3d(x, {"kernel": k, "bias": b}, spec)
    got = stem_conv3d(x, k, b, spec, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
