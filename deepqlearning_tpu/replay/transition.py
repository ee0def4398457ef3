"""Transition records.

``DQExperience`` mirrors the reference record struct
(``src/prioritized_experience_replay.jl:3-9``): (s, a, r, sp, done). At scale
we carry *batches* of transitions as a struct-of-arrays pytree
(``TransitionBatch``) rather than arrays-of-structs — the layout XLA wants.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class DQExperience(NamedTuple):
    """Single transition (API parity with the reference export)."""

    s: jnp.ndarray
    a: int
    r: float
    sp: jnp.ndarray
    done: bool


class TransitionBatch(NamedTuple):
    """Struct-of-arrays batch of transitions; leading axis is batch."""

    obs: jnp.ndarray       # [B, *obs_shape] float
    action: jnp.ndarray    # [B] int32
    reward: jnp.ndarray    # [B] float32
    next_obs: jnp.ndarray  # [B, *obs_shape] float
    done: jnp.ndarray      # [B] float32 (0/1)
