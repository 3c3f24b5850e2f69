"""GAN objectives (hinge / vanilla), matching
lvdm/modules/autoencoding/lpips/vqperceptual.py:5-18."""

import jax
import jax.numpy as jnp


def hinge_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


def generator_loss(logits_fake: jax.Array) -> jax.Array:
    """G maximises D's output on fakes: -E[D(x_rec)]
    (discriminator_loss.py:270)."""
    return -jnp.mean(logits_fake)
