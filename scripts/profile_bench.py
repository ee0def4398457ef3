"""Micro-profiling of the bench loop components on the current platform.

Run from anywhere: ``python scripts/profile_bench.py``. (Do NOT use
PYTHONPATH — it leaks into the axon TPU plugin's helper subprocess and breaks
backend registration.)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from deepqlearning_tpu import (
    Chain, Dense, DQNConfig, Flatten, SimpleGridWorld, create_dueling_network,
)
from deepqlearning_tpu.learner.actor import init_actor, make_collect_step
from deepqlearning_tpu.learner.loop import LoopCarry, build_loop
from deepqlearning_tpu.learner.train_step import make_dqn_train_step
from deepqlearning_tpu.replay.prioritized import PrioritizedReplayBuffer
from deepqlearning_tpu.replay.transition import TransitionBatch
from deepqlearning_tpu.solver.exploration import LinearDecaySchedule
from deepqlearning_tpu.ops import sumtree

E = 4096
C = 1 << 17
B = 512
N_ITERS = 50

env = SimpleGridWorld()
chain = Chain(Flatten(), Dense(2, 64, jnp.tanh), Dense(64, 64, jnp.tanh),
              Dense(64, env.num_actions))
network = create_dueling_network(chain)
buffer = PrioritizedReplayBuffer(env.obs_shape, C, B, prioritized=True)
params = network.init(jax.random.PRNGKey(0))
actor = init_actor(env, network, E, jax.random.PRNGKey(1))
replay = buffer.init()


def timed(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt*1e3:9.3f} ms   ({dt/N_ITERS*1e6:8.1f} us/iter)")
    return out


# 1. env-step only (scan N_ITERS lockstep steps, no replay insert)
def collect_only(actor, params):
    step = make_collect_step(env, network, 100, lambda t: jnp.asarray(0.5),
                             lambda r, tr, e: r)
    (actor, _, _), _ = jax.lax.scan(step, (actor, None, params), None, N_ITERS)
    return actor.t

timed("collect only", jax.jit(collect_only), actor, params)

# 2. collect + insert
def collect_insert(actor, replay, params):
    step = make_collect_step(env, network, 100, lambda t: jnp.asarray(0.5),
                             lambda r, tr, e: buffer.insert(r, tr))
    (actor, replay, _), _ = jax.lax.scan(step, (actor, replay, params), None, N_ITERS)
    return replay.insert_pos

timed("collect + insert", jax.jit(collect_insert), actor, replay, params)

# 3. insert only
tr = TransitionBatch(
    obs=jnp.zeros((E, 2)), action=jnp.zeros((E,), jnp.int32),
    reward=jnp.ones((E,)), next_obs=jnp.zeros((E, 2)),
    done=jnp.zeros((E,)),
)
def insert_only(replay):
    def body(r, _):
        return buffer.insert(r, tr), None
    replay, _ = jax.lax.scan(body, replay, None, N_ITERS)
    return replay.insert_pos

timed("insert only", jax.jit(insert_only), replay)

# 4. tree rebuild only
def tree_only(tree):
    def body(t, _):
        return sumtree.set_priorities(t, jnp.arange(E), jnp.ones(E)), None
    tree, _ = jax.lax.scan(body, tree, None, N_ITERS)
    return tree

timed("sumtree set+rebuild", jax.jit(tree_only), replay.tree)

# 5. sample only
def sample_only(replay, key):
    def body(k, _):
        k, k2 = jax.random.split(k)
        b, i, w = buffer.sample(replay, k2)
        return k, (b.reward.sum())
    key, s = jax.lax.scan(body, key, None, N_ITERS)
    return s

replay2 = buffer.insert(replay, tr)
timed("PER sample only", jax.jit(sample_only), replay2, jax.random.PRNGKey(0))

# 6. train only
train_step, opt = make_dqn_train_step(network, buffer, 0.95, True, 1e-3)
opt_state = opt.init(params)
def train_only(params, opt_state, replay, key):
    def body(c, _):
        params, opt_state, replay, key = c
        key, k = jax.random.split(key)
        res = train_step(params, params, opt_state, replay, k)
        return (res.params, res.opt_state, res.replay_state, key), None
    (params, _, _, _), _ = jax.lax.scan(
        body, (params, opt_state, replay, key), None, N_ITERS)
    return params

timed("train step only", jax.jit(train_only), params, opt_state, replay2,
      jax.random.PRNGKey(0))

# 7. rng split cost
def rng_only(key):
    def body(k, _):
        k, *ks = jax.random.split(k, 5)
        sub = jax.random.split(ks[0], E)
        return k, sub.sum()
    key, s = jax.lax.scan(body, key, None, N_ITERS)
    return s

timed("rng splits only", jax.jit(rng_only), jax.random.PRNGKey(0))
