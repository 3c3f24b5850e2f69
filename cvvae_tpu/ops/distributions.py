"""Diagonal Gaussian posterior.

Functional analogue of the reference's DiagonalGaussianDistribution
[lvdm/modules/distributions/distributions.py:24-74]: moments are split on
the channel axis, logvar clamped to [-30, 20]; kl/nll reduce over all
non-batch axes.

Channels-last: moments (B, T, H, W, 2*z) -> mean/logvar (B, T, H, W, z).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

_LOGVAR_MIN = -30.0
_LOGVAR_MAX = 20.0


class DiagonalGaussian(NamedTuple):
    mean: jax.Array
    logvar: jax.Array

    @classmethod
    def from_moments(cls, moments: jax.Array) -> "DiagonalGaussian":
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, _LOGVAR_MIN, _LOGVAR_MAX)
        return cls(mean, logvar)

    @property
    def std(self) -> jax.Array:
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self) -> jax.Array:
        return jnp.exp(self.logvar)

    def sample(self, key: jax.Array) -> jax.Array:
        noise = jax.random.normal(key, self.mean.shape, self.mean.dtype)
        return self.mean + self.std * noise

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self, other: Optional["DiagonalGaussian"] = None) -> jax.Array:
        """KL divergence summed over non-batch dims -> (B,)."""
        dims = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(
                jnp.square(self.mean) + self.var - 1.0 - self.logvar, axis=dims)
        return 0.5 * jnp.sum(
            jnp.square(self.mean - other.mean) / other.var
            + self.var / other.var - 1.0 - self.logvar + other.logvar,
            axis=dims)

    def nll(self, sample: jax.Array) -> jax.Array:
        dims = tuple(range(1, self.mean.ndim))
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + jnp.square(sample - self.mean) / self.var,
            axis=dims)
