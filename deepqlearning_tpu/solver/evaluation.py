"""Evaluation strategies.

Reference: pluggable ``evaluation(f, policy, env, n_eval, max_episode_length,
verbose)`` with default ``basic_evaluation`` — serial greedy rollouts
returning undiscounted mean reward and steps (``src/evaluation_policy.jl``).
Here the default runs all ``n_eval`` episodes in parallel inside one jit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _eval_rollout(env, params, network, n_eval, max_episode_length, key):
    # reset and per-step randomness come from disjoint splits — reusing the
    # parent key for the scan keys would correlate them
    k_env, k_steps = jax.random.split(key)
    env_state, obs = env.reset_batch(k_env, n_eval)
    net_state = network.init_state(n_eval)

    def step(carry, key_t):
        env_state, obs, net_state, finished, ret, steps = carry
        q, net_state = network.apply(params, obs, net_state)
        action = jnp.argmax(q, axis=-1).astype(jnp.int32)
        env_state, obs, r, done = env.step_batch(env_state, action, key_t)
        active = jnp.logical_not(finished)
        ret = ret + r * active
        steps = steps + active.astype(jnp.float32)
        finished = jnp.logical_or(finished, done)
        return (env_state, obs, net_state, finished, ret, steps), None

    keys = jax.random.split(k_steps, max_episode_length + 1)
    init = (
        env_state, obs, net_state,
        jnp.zeros((n_eval,), bool),
        jnp.zeros((n_eval,), jnp.float32),
        jnp.zeros((n_eval,), jnp.float32),
    )
    (_, _, _, _, ret, steps), _ = jax.lax.scan(step, init, keys)
    return jnp.mean(ret), jnp.mean(steps)


def basic_evaluation(network, params, env, n_eval, max_episode_length, key,
                     verbose=False):
    """Greedy parallel rollouts; undiscounted mean return/steps.

    Parity with ``basic_evaluation`` (``src/evaluation_policy.jl:17-42``) —
    the reference's serial while-loop becomes ``n_eval`` lockstep episodes.
    Returns ``(avg_r, avg_steps, info_dict)``.
    """
    avg_r, avg_steps = _eval_rollout(
        env, params, network, int(n_eval), int(max_episode_length), key
    )
    avg_r, avg_steps = float(avg_r), float(avg_steps)
    if verbose:
        print(f"Evaluation ... Avg Reward {avg_r:2.2f} | Avg Step {avg_steps:2.2f}")
    return avg_r, avg_steps, {}


def evaluation(f, network, params, env, n_eval, max_episode_length, key,
               verbose=False):
    """Dispatch through a user-provided strategy (``src/evaluation_policy.jl:10-12``)."""
    return f(network, params, env, n_eval, max_episode_length, key, verbose)
