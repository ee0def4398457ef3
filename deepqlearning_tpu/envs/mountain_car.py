"""MountainCar — classic-control benchmark env, pure-functional.

Not in the reference's test set, but a standard sparse-reward control
problem (Moore 1990 formulation, same constants as Gym's MountainCar-v0):
an under-powered car must rock back and forth to escape a valley. Reward
-1 per step; episode ends at the goal position. Vmappable / jittable like
every `Env` (envs/base.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import Env


class MountainCarState(NamedTuple):
    position: jnp.ndarray
    velocity: jnp.ndarray


class MountainCar(Env):
    def __init__(self, discount: float = 0.99):
        self.discount = float(discount)
        self.num_actions = 3  # push left / no push / push right
        self.obs_shape = (2,)
        self.min_position = -1.2
        self.max_position = 0.6
        self.max_speed = 0.07
        self.goal_position = 0.5
        self.force = 0.001
        self.gravity = 0.0025

    @property
    def action_map(self):
        return ["left", "none", "right"]

    def observe(self, state: MountainCarState) -> jnp.ndarray:
        return jnp.stack([state.position, state.velocity])

    def reset(self, key):
        pos = jax.random.uniform(key, (), minval=-0.6, maxval=-0.4)
        state = MountainCarState(position=pos, velocity=jnp.zeros(()))
        return state, self.observe(state)

    def step(self, state: MountainCarState, action, key):
        vel = (
            state.velocity
            + (action.astype(jnp.float32) - 1.0) * self.force
            - jnp.cos(3.0 * state.position) * self.gravity
        )
        vel = jnp.clip(vel, -self.max_speed, self.max_speed)
        pos = jnp.clip(state.position + vel, self.min_position, self.max_position)
        # inelastic left wall, as in the classic formulation
        vel = jnp.where((pos <= self.min_position) & (vel < 0.0), 0.0, vel)
        new = MountainCarState(position=pos, velocity=vel)
        done = pos >= self.goal_position
        return new, self.observe(new), jnp.asarray(-1.0, jnp.float32), done

    # ---------------------------------------------------------------- lanes
    # Kernel-traceable cols protocol (ops/pallas/fused_collect.py; see
    # envs/gridworld.py). Deterministic physics — no step uniforms; reset
    # draws the position uniformly in [-0.6, -0.4].
    lane_state_width = 2          # [position, velocity]
    n_uniform_step = 0
    n_uniform_reset = 1

    def state_to_cols(self, state: MountainCarState) -> jnp.ndarray:
        return jnp.stack([state.position, state.velocity], axis=0)

    def cols_to_state(self, cols: jnp.ndarray) -> MountainCarState:
        return MountainCarState(position=cols[0], velocity=cols[1])

    def step_cols(self, cols, action, u):
        pos, vel = cols[0:1], cols[1:2]
        vel = (vel + (action - 1.0) * self.force
               - jnp.cos(3.0 * pos) * self.gravity)
        vel = jnp.clip(vel, -self.max_speed, self.max_speed)
        npos = jnp.clip(pos + vel, self.min_position, self.max_position)
        vel = jnp.where((npos <= self.min_position) & (vel < 0.0), 0.0, vel)
        done = (npos >= self.goal_position).astype(jnp.float32)
        obs = jnp.concatenate([npos, vel], axis=0)
        return obs, obs, jnp.full_like(done, -1.0), done

    def reset_cols(self, u):
        pos = -0.6 + u[0:1] * 0.2
        cols = jnp.concatenate([pos, jnp.zeros_like(pos)], axis=0)
        return cols, cols
