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
