"""Phase-level profiling of the headline bench loop on the current platform.

Times the REAL iteration at bench shapes and DCE-proof variants of its two
phases (collect-only / train-only). Every timed function returns the full
carry and we block on every leaf — returning a scalar lets XLA dead-code-
eliminate the replay writes and train math, which made an earlier version of
this script report fantasy numbers.

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

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from deepqlearning_tpu import (
    Chain, Dense, DQNConfig, Flatten, SimpleGridWorld, create_dueling_network,
)
from deepqlearning_tpu.learner.actor import init_actor
from deepqlearning_tpu.learner.loop import LoopCarry, build_loop
from deepqlearning_tpu.replay.prioritized import PrioritizedReplayBuffer
from deepqlearning_tpu.solver.exploration import LinearDecaySchedule

E = int(os.environ.get("PROF_ENVS", "32768"))
C = 1 << int(os.environ.get("PROF_LOGC", "18"))
B = 512
TRAIN_FREQ = 4096
N_ITERS = int(os.environ.get("PROF_ITERS", "400"))

env = SimpleGridWorld()
chain = Chain(Flatten(), Dense(2, 64, jnp.tanh), Dense(64, 64, jnp.tanh),
              Dense(64, env.num_actions))
network = create_dueling_network(chain)
cfg = DQNConfig(
    num_envs=E, batch_size=B, buffer_size=C, train_freq=TRAIN_FREQ,
    max_episode_length=100, double_q=True, dueling=True,
    prioritized_replay=True,
)
buffer = PrioritizedReplayBuffer(
    env.obs_shape, C, B, alpha=cfg.prioritized_replay_alpha,
    beta=cfg.prioritized_replay_beta, eps=cfg.prioritized_replay_epsilon,
    prioritized=True,
)
iteration, populate_step, optimizer = build_loop(
    env, network, buffer, cfg, LinearDecaySchedule(1.0, 0.01, 100_000),
    gamma=env.discount,
)

key = jax.random.PRNGKey(0)
k_init, k_act, k_learn = jax.random.split(key, 3)
params = network.init(k_init)
carry0 = LoopCarry(
    actor=init_actor(env, network, E, k_act), replay=buffer.init(),
    params=params, target_params=params, opt_state=optimizer.init(params),
    lkey=k_learn, loss=jnp.asarray(0.0), gnorm=jnp.asarray(0.0),
    sync_acc=jnp.asarray(0, jnp.int32),
)


@jax.jit
def populate(carry):
    actor, replay, params = carry.actor, carry.replay, carry.params
    (actor, replay, params), _ = jax.lax.scan(
        populate_step, (actor, replay, params), None, length=2)
    return carry._replace(actor=actor, replay=replay)


carry0 = populate(carry0)
jax.block_until_ready(carry0.replay.tree)

UPDATES = cfg.updates_per_iter
STEPS = cfg.steps_per_iter
print(f"E={E} steps_per_iter={STEPS} updates_per_iter={UPDATES} "
      f"env_steps_per_iter={cfg.env_steps_per_iter}")


def _sync(out):
    # On the tunneled axon backend block_until_ready can return before the
    # computation finishes (measured: a "blocked" call returned in 3 ms while
    # its compute ran another 1.2 s). A device->host read is the only
    # reliable barrier, so every timing brackets with a scalar read.
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf))


# Per-call overhead calibration: a same-signature round-trip with trivial
# compute. Subtracting it from every timing attributes only on-device work.
@jax.jit
def _noop(carry):
    return carry._replace(loss=carry.loss + 1.0)


def _measure_overhead(carry, reps=5):
    _sync(_noop(carry))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(_noop(carry))
        best = min(best, time.perf_counter() - t0)
    return best


OVERHEAD = _measure_overhead(carry0)
print(f"per-call overhead (noop carry round-trip): {OVERHEAD*1e3:.2f} ms")


def timed(name, fn, carry, per_iter_divisor=1.0, reps=5):
    _sync(fn(carry))           # compile + drain
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(carry)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    per = max(best - OVERHEAD, 0.0) / N_ITERS
    print(f"{name:24s} {best*1e3:9.2f} ms total  {per*1e6:9.1f} us/iter"
          f"  {per/per_iter_divisor*1e6:9.2f} us/unit")
    return per


# --- full iteration (collect + train + sync check) --------------------------
@jax.jit
def full(carry):
    carry, _ = jax.lax.scan(iteration, carry, None, length=N_ITERS)
    return carry

t_full = timed("full iteration", full, carry0)

# --- collect-only: the real collect phase, replay carried, no updates -------
iteration_c, _, _ = build_loop(
    env, network, buffer, cfg.replace(train_freq=1 << 30),  # updates_per_iter→1 still
    LinearDecaySchedule(1.0, 0.01, 100_000), gamma=env.discount,
)

from deepqlearning_tpu.learner.actor import make_collect_step  # noqa: E402

collect_step = make_collect_step(
    env, network, cfg.max_episode_length,
    LinearDecaySchedule(1.0, 0.01, 100_000),
    lambda r, tr, e: buffer.insert(r, tr),
)


@jax.jit
def collect_only(carry):
    (actor, replay, params), _ = jax.lax.scan(
        collect_step, (carry.actor, carry.replay, carry.params), None,
        length=N_ITERS * STEPS)
    return carry._replace(actor=actor, replay=replay)

t_collect = timed("collect+insert only", collect_only, carry0,
                  per_iter_divisor=STEPS)

# --- train-only: the real 8-updates train phase, full carry ------------------
train_step, _ = (lambda: (None, None))()  # placeholder to keep names local


def make_train_only():
    from deepqlearning_tpu.learner.train_step import make_dqn_train_step
    ts, _opt = make_dqn_train_step(
        network, buffer, env.discount, cfg.double_q, cfg.learning_rate)

    @jax.jit
    def train_only(carry):
        def body(c, _):
            params, target_params, opt_state, replay, lkey = c
            lkey, k = jax.random.split(lkey)
            res = ts(params, target_params, opt_state, replay, k)
            return (res.params, target_params, res.opt_state,
                    res.replay_state, lkey), None
        # opt-state layout differs between the fused (carry) and optax
        # paths — init a fresh matching state for this section
        init = (carry.params, carry.target_params, _opt.init(carry.params),
                carry.replay, carry.lkey)
        (p, tp, o, r, k), _ = jax.lax.scan(
            body, init, None, length=N_ITERS * UPDATES)
        return carry._replace(params=p, opt_state=o, replay=r, lkey=k)
    return train_only

t_train = timed("train updates only", make_train_only(), carry0,
                per_iter_divisor=UPDATES)

def make_train_grouped():
    from deepqlearning_tpu.learner.train_step import make_grouped_dqn_train_step
    ts, _opt = make_grouped_dqn_train_step(
        network, buffer, env.discount, cfg.double_q, cfg.learning_rate,
        UPDATES)

    @jax.jit
    def train_grouped(carry):
        def body(c, _):
            params, target_params, opt_state, replay, lkey = c
            lkey, k = jax.random.split(lkey)
            res = ts(params, target_params, opt_state, replay, k)
            return (res.params, target_params, res.opt_state,
                    res.replay_state, lkey), None
        init = (carry.params, carry.target_params, _opt.init(carry.params),
                carry.replay, carry.lkey)
        (p, tp, o, r, k), _ = jax.lax.scan(
            body, init, None, length=N_ITERS)
        return carry._replace(params=p, opt_state=o, replay=r, lkey=k)
    return train_grouped


t_grouped = timed("train grouped (1 call)", make_train_grouped(), carry0)

print(f"\nbreakdown per iteration ({cfg.env_steps_per_iter} env steps):")
print(f"  collect : {t_collect*1e6:8.1f} us ({t_collect/t_full*100:5.1f}%)")
print(f"  train   : {t_train*1e6:8.1f} us ({t_train/t_full*100:5.1f}%) [sequential]")
print(f"  grouped : {t_grouped*1e6:8.1f} us ({t_grouped/t_full*100:5.1f}%) [as in loop]")
print(f"  other   : {(t_full-t_collect-t_train)*1e6:8.1f} us")
print(f"  implied steps/s: {cfg.env_steps_per_iter/t_full/1e6:.2f}M")
