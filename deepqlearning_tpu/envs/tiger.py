"""Tiger POMDP — classic partially observable fixture.

The reference exercises its POMDP path with POMDPModels' ``TigerPOMDP``
(``test/runtests.jl:149-163``). Semantics: tiger behind left or right door;
actions open-left / open-right / listen; listening yields the correct side
with prob ``p_correct`` and reward ``r_listen``; opening the tiger door gives
``r_findtiger``, the other ``r_escapetiger``; opening resets the problem
(episode terminates here, matching the env-wrapped training view). The agent
observes only the last listen outcome as a length-1 float vector, matching
``convert_o`` feeding an ``LSTM(1, 4)`` Q-network.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import Env


class TigerState(NamedTuple):
    tiger_left: jnp.ndarray  # bool
    last_obs: jnp.ndarray    # float32 scalar: 1.0 = heard left
    opened: jnp.ndarray      # bool


class TigerPOMDP(Env):
    def __init__(
        self,
        r_listen: float = -1.0,
        r_findtiger: float = -100.0,
        r_escapetiger: float = 10.0,
        p_correct: float = 0.85,
        discount: float = 0.95,
    ):
        self.r_listen = float(r_listen)
        self.r_findtiger = float(r_findtiger)
        self.r_escapetiger = float(r_escapetiger)
        self.p_correct = float(p_correct)
        self.discount = float(discount)
        self.num_actions = 3
        self.obs_shape = (1,)

    @property
    def action_map(self):
        return ["open-left", "open-right", "listen"]

    def observe(self, state: TigerState) -> jnp.ndarray:
        return state.last_obs.reshape((1,))

    def reset(self, key):
        tiger_left = jax.random.bernoulli(key)
        state = TigerState(
            tiger_left=tiger_left,
            last_obs=jnp.asarray(0.0, jnp.float32),
            opened=jnp.asarray(False),
        )
        return state, self.observe(state)

    def step(self, state: TigerState, action, key):
        is_listen = action == 2
        open_left = action == 0
        correct = jax.random.bernoulli(key, self.p_correct)
        heard_left = jnp.where(correct, state.tiger_left, ~state.tiger_left)
        new_obs = jnp.where(
            is_listen, heard_left.astype(jnp.float32), state.last_obs
        )
        tiger_behind = jnp.where(open_left, state.tiger_left, ~state.tiger_left)
        r = jnp.where(
            is_listen,
            self.r_listen,
            jnp.where(tiger_behind, self.r_findtiger, self.r_escapetiger),
        ).astype(jnp.float32)
        done = ~is_listen
        new_state = TigerState(
            tiger_left=state.tiger_left, last_obs=new_obs, opened=done
        )
        return new_state, self.observe(new_state), r, done
