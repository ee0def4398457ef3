"""TestMDP — deterministic fixture with known optimum.

Functional port of the reference test environment semantics
(``test/test_env.jl:10-87``): a history of the last 4 visited "rooms"
(values 0/1/2 ⇔ reference states 1/2/3), a time index, 4 actions, horizon
``max_time``. Action a<3 moves to room a; action 3 repeats the previous room
(``test/test_env.jl:66-75``). Reward is ``[-0.1, 0.0, 0.1][new_room]``,
multiplied by -10 if the *previous* room was room 1 (reference "state 2",
``test/test_env.jl:77-84``). Observation stacks the images of the last
``o_stack`` rooms, scaled by 1/255 (``test/test_env.jl:52-58``).

Optimal value 2.1, optimal policy [1,0,1,0,2] in 0-indexed actions
(reference header, ``test/test_env.jl:5-8``).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.lookup import take0
from .base import Env

_HIST = 4  # the reference always keeps a history of 4 (test/test_env.jl:31)


class TestMDPState(NamedTuple):
    hist: jnp.ndarray  # int32 [4], values in {0,1,2}
    t: jnp.ndarray     # int32 scalar


class TestMDP(Env):
    __test__ = False  # not a pytest class despite the reference-parity name

    def __init__(self, shape=(6,), o_stack=4, max_time=6, discount=0.99, img_seed=0):
        self.shape = tuple(shape)
        self.o_stack = int(o_stack)
        self.max_time = int(max_time)
        self.discount = float(discount)
        self.num_actions = 4
        self.obs_shape = self.shape + (self.o_stack,)
        rng = np.random.RandomState(img_seed)
        # fixed per-room images, ranges per test/test_env.jl:25-28
        bad = rng.randint(1, 51, size=self.shape)
        normal = rng.randint(100, 151, size=self.shape)
        good = rng.randint(150, 201, size=self.shape)
        self._images = jnp.asarray(
            np.stack([bad, normal, good]).astype(np.float32) / 255.0
        )  # [3, *shape]
        self._rewards = jnp.asarray([-0.1, 0.0, 0.1], jnp.float32)

    def observe(self, state: TestMDPState) -> jnp.ndarray:
        # channel i is the image of the i-th most recent room (test/test_env.jl:52-58)
        recent = state.hist[_HIST - self.o_stack :][::-1]  # most recent first
        frames = take0(self._images, recent)  # [o_stack, *shape], gather-free
        return jnp.moveaxis(frames, 0, -1)  # [*shape, o_stack]

    def reset(self, key):
        state = TestMDPState(
            hist=jnp.zeros((_HIST,), jnp.int32), t=jnp.asarray(1, jnp.int32)
        )
        return state, self.observe(state)

    def step(self, state: TestMDPState, action, key):
        prev_last = state.hist[-1]
        new_hist = jnp.roll(state.hist, -1)
        new_last = jnp.where(action < 3, action.astype(jnp.int32), prev_last)
        new_hist = new_hist.at[-1].set(new_last)
        t_new = state.t + 1
        r = take0(self._rewards, new_last)
        r = jnp.where(prev_last == 1, r * -10.0, r)
        done = t_new >= self.max_time
        new_state = TestMDPState(hist=new_hist, t=t_new)
        return new_state, self.observe(new_state), r, done
