"""Activations used across the framework."""

import jax
import jax.numpy as jnp


def silu(x: jax.Array) -> jax.Array:
    """swish / SiLU: x * sigmoid(x).  Ref: models/vae_models.py:187-189."""
    return x * jax.nn.sigmoid(x)


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    return jnp.where(x >= 0, x, negative_slope * x)
