"""Training state pytree."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """Pure pytree: params + optimizer state + step counter.

    Equivalent role to Lightning's module+optimizer bundle, but a value —
    it flows through the jitted train step and shards like any other pytree.
    """

    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32

    @classmethod
    def create(cls, params, optimizer) -> "TrainState":
        return cls(params=params, opt_state=optimizer.init(params),
                   step=jnp.zeros((), jnp.int32))
