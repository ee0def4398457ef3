"""CartPole — classic-control benchmark env, pure-functional.

Not in the reference's test set, but the standard sanity problem for DQN
frameworks; physics follow the classic Barto-Sutton-Anderson formulation
(the same constants as Gym's CartPole-v1). Episode ends when the pole falls
past ±12° or the cart leaves ±2.4; reward 1 per step.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import Env


class CartPoleState(NamedTuple):
    x: jnp.ndarray
    x_dot: jnp.ndarray
    theta: jnp.ndarray
    theta_dot: jnp.ndarray


class CartPole(Env):
    def __init__(self, discount: float = 0.99):
        self.discount = float(discount)
        self.num_actions = 2
        self.obs_shape = (4,)
        self.gravity = 9.8
        self.masscart = 1.0
        self.masspole = 0.1
        self.length = 0.5  # half pole length
        self.force_mag = 10.0
        self.tau = 0.02
        self.theta_threshold = 12 * 2 * math.pi / 360
        self.x_threshold = 2.4

    @property
    def action_map(self):
        return ["left", "right"]

    def observe(self, state: CartPoleState) -> jnp.ndarray:
        return jnp.stack([state.x, state.x_dot, state.theta, state.theta_dot])

    def reset(self, key):
        vals = jax.random.uniform(key, (4,), minval=-0.05, maxval=0.05)
        state = CartPoleState(*[vals[i] for i in range(4)])
        return state, self.observe(state)

    def step(self, state: CartPoleState, action, key):
        force = jnp.where(action == 1, self.force_mag, -self.force_mag)
        costh = jnp.cos(state.theta)
        sinth = jnp.sin(state.theta)
        total_mass = self.masscart + self.masspole
        polemass_length = self.masspole * self.length
        temp = (force + polemass_length * state.theta_dot**2 * sinth) / total_mass
        theta_acc = (self.gravity * sinth - costh * temp) / (
            self.length * (4.0 / 3.0 - self.masspole * costh**2 / total_mass)
        )
        x_acc = temp - polemass_length * theta_acc * costh / total_mass
        new = CartPoleState(
            x=state.x + self.tau * state.x_dot,
            x_dot=state.x_dot + self.tau * x_acc,
            theta=state.theta + self.tau * state.theta_dot,
            theta_dot=state.theta_dot + self.tau * theta_acc,
        )
        done = (
            (jnp.abs(new.x) > self.x_threshold)
            | (jnp.abs(new.theta) > self.theta_threshold)
        )
        return new, self.observe(new), jnp.asarray(1.0, jnp.float32), done

    # ---------------------------------------------------------------- lanes
    # Kernel-traceable cols protocol (ops/pallas/fused_collect.py; see
    # envs/gridworld.py for the protocol description). CartPole's physics
    # are deterministic — no step uniforms; reset draws the 4 state values
    # uniformly in [-0.05, 0.05].
    lane_state_width = 4          # [x, x_dot, theta, theta_dot]
    n_uniform_step = 0
    n_uniform_reset = 4

    def state_to_cols(self, state: CartPoleState) -> jnp.ndarray:
        return jnp.stack([state.x, state.x_dot, state.theta, state.theta_dot],
                         axis=0)

    def cols_to_state(self, cols: jnp.ndarray) -> CartPoleState:
        return CartPoleState(x=cols[0], x_dot=cols[1], theta=cols[2],
                             theta_dot=cols[3])

    def step_cols(self, cols, action, u):
        x, x_dot, theta, theta_dot = (cols[0:1], cols[1:2], cols[2:3],
                                      cols[3:4])
        force = jnp.where(action == 1.0, self.force_mag, -self.force_mag)
        costh = jnp.cos(theta)
        sinth = jnp.sin(theta)
        total_mass = self.masscart + self.masspole
        polemass_length = self.masspole * self.length
        temp = (force + polemass_length * theta_dot**2 * sinth) / total_mass
        theta_acc = (self.gravity * sinth - costh * temp) / (
            self.length * (4.0 / 3.0 - self.masspole * costh**2 / total_mass)
        )
        x_acc = temp - polemass_length * theta_acc * costh / total_mass
        nx = x + self.tau * x_dot
        nx_dot = x_dot + self.tau * x_acc
        nth = theta + self.tau * theta_dot
        nth_dot = theta_dot + self.tau * theta_acc
        done = ((jnp.abs(nx) > self.x_threshold)
                | (jnp.abs(nth) > self.theta_threshold)).astype(jnp.float32)
        obs = jnp.concatenate([nx, nx_dot, nth, nth_dot], axis=0)
        new_cols = obs
        reward = jnp.ones_like(done)
        return new_cols, obs, reward, done

    def reset_cols(self, u):
        cols = u[0:4] * 0.1 - 0.05
        return cols, cols
