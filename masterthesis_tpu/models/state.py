"""Train-state PyTree.

TPU-first re-design of the reference's Model-owns-optimizers pattern
(src/models/model.py:24-27): all parameter groups, their optax states, and the
global step live in ONE immutable PyTree that a single jitted step function
consumes and returns (with donated buffers).
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    """step + per-net params / optimizer states / mutable collections."""

    step: jnp.ndarray  # scalar int32 global iteration
    params: Dict[str, Any]  # net name -> params pytree
    opt_state: Dict[str, Any]  # net name -> optax state
    extra: Dict[str, Any]  # net name -> extra variable collections (e.g. spectral)

    @classmethod
    def create(cls, params, opt_state, extra=None):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            extra=extra if extra is not None else {k: {} for k in params},
        )
