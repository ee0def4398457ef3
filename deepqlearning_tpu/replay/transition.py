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


def batch_from_experience(exp: DQExperience) -> TransitionBatch:
    """Singleton batch from one ``DQExperience`` — the host-path insert unit,
    mirroring the reference's per-step ``DQExperience`` construction +
    ``add_exp!`` (``src/solver.jl:88-95``)."""
    return TransitionBatch(
        obs=jnp.asarray(exp.s)[None],
        action=jnp.asarray([exp.a], jnp.int32),
        reward=jnp.asarray([exp.r], jnp.float32),
        next_obs=jnp.asarray(exp.sp)[None],
        done=jnp.asarray([float(exp.done)], jnp.float32),
    )
