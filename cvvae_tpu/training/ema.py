"""Exponential moving average of parameters.

Functional analogue of LitEma [lvdm/modules/ema.py:5-87]: shadow
parameters with warm-up decay min(decay, (1 + n) / (10 + n)), plus
swap-in/swap-out for evaluation scopes
(lvdm/models/autoencoder.py:97-110).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    shadow: dict
    num_updates: jnp.ndarray  # scalar int32


def ema_init(params: dict) -> EMAState:
    return EMAState(shadow=jax.tree.map(jnp.asarray, params),
                    num_updates=jnp.zeros((), jnp.int32))


def ema_update(state: EMAState, params: dict, decay: float = 0.9999
               ) -> EMAState:
    n = state.num_updates + 1
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    shadow = jax.tree.map(
        lambda s, p: s - (1.0 - d) * (s - p.astype(s.dtype)),
        state.shadow, params)
    return EMAState(shadow=shadow, num_updates=n)
