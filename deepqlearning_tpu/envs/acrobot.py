"""Acrobot — two-link underactuated pendulum swing-up, pure-functional.

Classic-control benchmark (Sutton 1996 formulation, same constants and RK4
integration as Gym's Acrobot-v1): torque at the elbow only, reward -1 per
step until the tip swings above one link-length. The dynamics are the
heaviest of the shipped classic-control envs — a good stress test that
vmapped env physics stay negligible next to the learner matmuls.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import Env


class AcrobotState(NamedTuple):
    theta1: jnp.ndarray
    theta2: jnp.ndarray
    dtheta1: jnp.ndarray
    dtheta2: jnp.ndarray


def _wrap_pi(x):
    return (x + jnp.pi) % (2.0 * jnp.pi) - jnp.pi


class Acrobot(Env):
    LINK_LENGTH_1 = 1.0
    LINK_MASS_1 = 1.0
    LINK_MASS_2 = 1.0
    LINK_COM_POS_1 = 0.5
    LINK_COM_POS_2 = 0.5
    LINK_MOI = 1.0
    MAX_VEL_1 = 4.0 * jnp.pi
    MAX_VEL_2 = 9.0 * jnp.pi
    G = 9.8
    DT = 0.2

    def __init__(self, discount: float = 0.99):
        self.discount = float(discount)
        self.num_actions = 3  # torque -1 / 0 / +1 at the elbow
        self.obs_shape = (6,)

    @property
    def action_map(self):
        return [-1.0, 0.0, 1.0]

    def observe(self, state: AcrobotState) -> jnp.ndarray:
        return jnp.stack([
            jnp.cos(state.theta1), jnp.sin(state.theta1),
            jnp.cos(state.theta2), jnp.sin(state.theta2),
            state.dtheta1, state.dtheta2,
        ])

    def reset(self, key):
        vals = jax.random.uniform(key, (4,), minval=-0.1, maxval=0.1)
        state = AcrobotState(*[vals[i] for i in range(4)])
        return state, self.observe(state)

    def _dsdt(self, s, torque):
        m1, m2 = self.LINK_MASS_1, self.LINK_MASS_2
        l1 = self.LINK_LENGTH_1
        lc1, lc2 = self.LINK_COM_POS_1, self.LINK_COM_POS_2
        i1 = i2 = self.LINK_MOI
        g = self.G
        theta1, theta2, dtheta1, dtheta2 = s
        d1 = (
            m1 * lc1**2
            + m2 * (l1**2 + lc2**2 + 2 * l1 * lc2 * jnp.cos(theta2))
            + i1 + i2
        )
        d2 = m2 * (lc2**2 + l1 * lc2 * jnp.cos(theta2)) + i2
        phi2 = m2 * lc2 * g * jnp.cos(theta1 + theta2 - jnp.pi / 2.0)
        phi1 = (
            -m2 * l1 * lc2 * dtheta2**2 * jnp.sin(theta2)
            - 2 * m2 * l1 * lc2 * dtheta2 * dtheta1 * jnp.sin(theta2)
            + (m1 * lc1 + m2 * l1) * g * jnp.cos(theta1 - jnp.pi / 2.0)
            + phi2
        )
        ddtheta2 = (
            torque + d2 / d1 * phi1
            - m2 * l1 * lc2 * dtheta1**2 * jnp.sin(theta2) - phi2
        ) / (m2 * lc2**2 + i2 - d2**2 / d1)
        ddtheta1 = -(d2 * ddtheta2 + phi1) / d1
        return jnp.stack([dtheta1, dtheta2, ddtheta1, ddtheta2])

    def step(self, state: AcrobotState, action, key):
        torque = action.astype(jnp.float32) - 1.0
        s = jnp.stack([state.theta1, state.theta2, state.dtheta1, state.dtheta2])
        # one RK4 step of length DT
        k1 = self._dsdt(s, torque)
        k2 = self._dsdt(s + self.DT / 2.0 * k1, torque)
        k3 = self._dsdt(s + self.DT / 2.0 * k2, torque)
        k4 = self._dsdt(s + self.DT * k3, torque)
        ns = s + self.DT / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        new = AcrobotState(
            theta1=_wrap_pi(ns[0]),
            theta2=_wrap_pi(ns[1]),
            dtheta1=jnp.clip(ns[2], -self.MAX_VEL_1, self.MAX_VEL_1),
            dtheta2=jnp.clip(ns[3], -self.MAX_VEL_2, self.MAX_VEL_2),
        )
        done = -jnp.cos(new.theta1) - jnp.cos(new.theta2 + new.theta1) > 1.0
        return new, self.observe(new), jnp.asarray(-1.0, jnp.float32), done
