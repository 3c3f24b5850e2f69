"""Latent regularizers.

Functional analogues of lvdm/modules/autoencoding/regularizers:

* ``diagonal_gaussian_regularizer`` — sample the posterior, return the
  batch-mean KL in the log dict  [regularizers/__init__.py:13-31]
* ``identity_regularizer``         — pass-through  [regularizers/base.py:20-27]

The training engine inlines the diagonal-Gaussian path; these exist as
the standalone, composable API.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from cvvae_tpu.ops.distributions import DiagonalGaussian


def diagonal_gaussian_regularizer(moments: jax.Array, key: jax.Array, *,
                                  sample: bool = True
                                  ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    posterior = DiagonalGaussian.from_moments(moments)
    z = posterior.sample(key) if sample else posterior.mode()
    kl = posterior.kl()
    return z, {"kl_loss": jnp.sum(kl) / kl.shape[0]}


def identity_regularizer(z: jax.Array, key=None
                         ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    return z, {}
