"""Ablations of the grouped train step's inner sub-update at bench shapes.

Finds where the ~60 us per sub-update goes: pallas kernel vs jnp loss head,
double-Q concat vs single, nn grad vs adam-only floor.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from deepqlearning_tpu import (
    Chain, Dense, Flatten, SimpleGridWorld, create_dueling_network,
)
from deepqlearning_tpu.learner.train_step import (
    make_grouped_dqn_train_step, make_optimizer,
)
from deepqlearning_tpu.replay.prioritized import PrioritizedReplayBuffer
from deepqlearning_tpu.replay.transition import TransitionBatch

C, B, U, N = 1 << 18, 512, 8, 400

env = SimpleGridWorld()
chain = Chain(Flatten(), Dense(2, 64, jnp.tanh), Dense(64, 64, jnp.tanh),
              Dense(64, env.num_actions))
network = create_dueling_network(chain)
buffer = PrioritizedReplayBuffer(env.obs_shape, C, B, prioritized=True)
params = network.init(jax.random.PRNGKey(0))
tr = TransitionBatch(
    obs=jax.random.normal(jax.random.PRNGKey(1), (C, 2)),
    action=jax.random.randint(jax.random.PRNGKey(2), (C,), 0, 4),
    reward=jax.random.normal(jax.random.PRNGKey(3), (C,)),
    next_obs=jax.random.normal(jax.random.PRNGKey(4), (C, 2)),
    done=jnp.zeros((C,)))
replay = buffer.insert(buffer.init(), tr)


def _sync(out):
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))


def timed(tag, run, args, units, reps=5):
    _sync(run(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:44s} {best*1e3:9.2f} ms  {(best-OVERHEAD)/units*1e6:8.1f} us/unit")


@jax.jit
def _noop(replay):
    return replay._replace(size=replay.size + 1)


_sync(_noop(replay))
t0s = []
for _ in range(5):
    t0 = time.perf_counter()
    _sync(_noop(replay))
    t0s.append(time.perf_counter() - t0)
OVERHEAD = min(t0s)
print(f"per-call overhead: {OVERHEAD*1e3:.2f} ms")


def scan_step(tag, step, opt):
    opt_state = opt.init(params)

    @jax.jit
    def run(params, opt_state, replay, key):
        def b(c, _):
            params, opt_state, replay, key = c
            key, k = jax.random.split(key)
            res = step(params, params, opt_state, replay, k)
            return (res.params, res.opt_state, res.replay_state, key), None
        (params, opt_state, replay, key), _ = jax.lax.scan(
            b, (params, opt_state, replay, key), None, length=N)
        return params, opt_state, replay

    timed(tag, run, (params, opt_state, replay, jax.random.PRNGKey(0)), N)


s1, o1 = make_grouped_dqn_train_step(network, buffer, 0.95, True, 1e-3, U)
scan_step("grouped U=8, pallas, double", s1, o1)
s2, o2 = make_grouped_dqn_train_step(network, buffer, 0.95, True, 1e-3, U,
                                     use_pallas=False)
scan_step("grouped U=8, jnp, double", s2, o2)
s3, o3 = make_grouped_dqn_train_step(network, buffer, 0.95, False, 1e-3, U)
scan_step("grouped U=8, pallas, single-Q", s3, o3)

# floor: sample_n + U adam steps on constant grads (no nn, no loss)
opt = make_optimizer(1e-3)
opt_state = opt.init(params)
gzero = jax.tree_util.tree_map(lambda x: jnp.ones_like(x) * 1e-6, params)


@jax.jit
def run_floor(params, opt_state, replay, key):
    def b(c, _):
        params, opt_state, replay, key = c
        key, k = jax.random.split(key)
        batch, idx, w = buffer.sample_n(replay, k, U)

        def inner(c2, _):
            p, o = c2
            up, o = opt.update(gzero, o, p)
            import optax
            p = optax.apply_updates(p, up)
            return (p, o), None
        (params, opt_state), _ = jax.lax.scan(
            inner, (params, opt_state), None, length=U)
        replay = buffer.update_priorities(replay, idx, batch.reward + w)
        return (params, opt_state, replay, key), None
    (params, opt_state, replay, key), _ = jax.lax.scan(
        b, (params, opt_state, replay, key), None, length=N)
    return params, opt_state, replay


timed("floor: sample_n + U adam + prio", run_floor,
      (params, opt_state, replay, jax.random.PRNGKey(0)), N)

# --- floor decomposition -----------------------------------------------------
import optax


@jax.jit
def run_sample_only(replay, key, acc):
    def b(c, _):
        replay, key, acc = c
        key, k = jax.random.split(key)
        batch, idx, w = buffer.sample_n(replay, k, U)
        acc = acc + jnp.sum(batch.obs) + jnp.sum(w) + jnp.sum(idx)
        return (replay, key, acc), None
    (replay, key, acc), _ = jax.lax.scan(
        b, (replay, key, acc), None, length=N)
    return replay, acc


timed("sample_n(U*B) + gather only", run_sample_only,
      (replay, jax.random.PRNGKey(0), jnp.asarray(0.0)), N)

from deepqlearning_tpu.ops import sumtree


@jax.jit
def run_descent_only(replay, key, acc):
    def b(c, _):
        replay, key, acc = c
        key, k = jax.random.split(key)
        idx, prio = sumtree.sample(replay.tree, k, U * B)
        acc = acc + jnp.sum(prio) + jnp.sum(idx)
        return (replay, key, acc), None
    (replay, key, acc), _ = jax.lax.scan(
        b, (replay, key, acc), None, length=N)
    return replay, acc


timed("tree descent only (4096 draws)", run_descent_only,
      (replay, jax.random.PRNGKey(0), jnp.asarray(0.0)), N)


@jax.jit
def run_prio_only(replay, key):
    def b(c, _):
        replay, key = c
        key, k = jax.random.split(key)
        idx = jax.random.randint(k, (U * B,), 0, C)
        vals = jax.random.uniform(k, (U * B,)) + 0.5
        replay = buffer.update_priorities(replay, idx, vals)
        return (replay, key), None
    (replay, key), _ = jax.lax.scan(b, (replay, key), None, length=N)
    return replay


timed("prio scatter+rebuild only (4096)", run_prio_only,
      (replay, jax.random.PRNGKey(0)), N)

opt_state_f = opt.init(params)


@jax.jit
def run_adams_only(params, opt_state, key):
    def b(c, _):
        params, opt_state, key = c
        key, k = jax.random.split(key)

        def inner(c2, _):
            p, o = c2
            up, o = opt.update(gzero, o, p)
            p = optax.apply_updates(p, up)
            return (p, o), None
        (params, opt_state), _ = jax.lax.scan(
            inner, (params, opt_state), None, length=U)
        return (params, opt_state, key), None
    (params, opt_state, key), _ = jax.lax.scan(
        b, (params, opt_state, key), None, length=N)
    return params, opt_state


timed("8x adam only", run_adams_only,
      (params, opt_state_f, jax.random.PRNGKey(0)), N)
