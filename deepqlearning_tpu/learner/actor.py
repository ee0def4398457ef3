"""Vectorized actor: lockstep env stepping + replay insertion under jit.

Replaces the reference's single-threaded host loop body
(``src/solver.jl:82-99``: ε-greedy act → env step → DQExperience →
``add_exp!`` → episode bookkeeping) with a ``lax.scan`` over E vmapped envs.
Episode-return accounting for the "avg of last ~100 episodes" log metric
(``src/solver.jl:134``) is kept device-side in a small ring.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..envs.base import auto_reset
from ..replay.transition import TransitionBatch

RETURN_RING = 128  # ring of recent episode returns for the avg-100 metric


class ActorState(NamedTuple):
    env_state: any
    obs: jnp.ndarray        # [E, *obs_shape]
    net_state: any          # recurrent net state for the E actor streams
    ep_step: jnp.ndarray    # [E] int32 — steps in current episode
    ep_ret: jnp.ndarray     # [E] float32 — return of current episode
    ret_ring: jnp.ndarray   # [RETURN_RING] float32 — completed episode returns
    ep_count: jnp.ndarray   # int32 — total completed episodes
    step_ring: jnp.ndarray  # [RETURN_RING] float32 — completed episode lengths
    t: jnp.ndarray          # int32 — aggregate env steps so far
    key: jnp.ndarray


def init_actor(env, network, num_envs: int, key) -> ActorState:
    k_env, k_run = jax.random.split(key)
    env_state, obs = env.reset_batch(k_env, num_envs)
    return ActorState(
        env_state=env_state,
        obs=obs,
        net_state=network.init_state(num_envs),
        ep_step=jnp.zeros((num_envs,), jnp.int32),
        ep_ret=jnp.zeros((num_envs,), jnp.float32),
        ret_ring=jnp.zeros((RETURN_RING,), jnp.float32),
        ep_count=jnp.asarray(0, jnp.int32),
        step_ring=jnp.zeros((RETURN_RING,), jnp.float32),
        t=jnp.asarray(0, jnp.int32),
        key=k_run,
    )


def make_collect_step(env, network, max_episode_length: int, eps_fn,
                      insert_fn):
    """Build one lockstep env-step:

    ``eps_fn(t) -> eps`` is the exploration schedule (jit-friendly);
    ``insert_fn(replay_state, transition_batch, ended) -> replay_state``
    commits transitions (feed-forward ring insert or episode accumulate).
    Returns ``step((actor, replay, params), None) -> ((actor, replay, params), None)``
    suitable for ``lax.scan``.
    """

    def step(carry, _):
        actor, replay, params = carry
        num_envs = actor.obs.shape[0]
        key, k_eps, k_act, k_step, k_reset = jax.random.split(actor.key, 5)

        # ε-greedy action from the online net (src/solver.jl:83, policy.jl:38-46)
        q, net_state = network.apply(params, actor.obs, actor.net_state)
        greedy = jnp.argmax(q, axis=-1).astype(jnp.int32)
        eps = eps_fn(actor.t)
        explore = jax.random.uniform(k_eps, (num_envs,)) < eps
        random_a = jax.random.randint(k_act, (num_envs,), 0, env.num_actions)
        action = jnp.where(explore, random_a, greedy)

        env_state, next_obs, reward, done = env.step_batch(
            actor.env_state, action, k_step
        )
        done_f = done.astype(jnp.float32)
        truncate = (actor.ep_step + 1) >= max_episode_length
        ended = jnp.logical_or(done, truncate)

        transition = TransitionBatch(
            obs=actor.obs, action=action, reward=reward,
            next_obs=next_obs, done=done_f,
        )
        replay = insert_fn(replay, transition, ended)

        # episode bookkeeping (src/solver.jl:99-134)
        ep_ret = actor.ep_ret + reward
        ep_step = actor.ep_step + 1
        # record each finished episode's return into the ring
        n_end = jnp.sum(ended.astype(jnp.int32))
        finish_order = jnp.cumsum(ended.astype(jnp.int32)) - 1
        slots = jnp.where(ended, (actor.ep_count + finish_order) % RETURN_RING,
                          RETURN_RING)  # RETURN_RING = drop
        ret_ring = jnp.concatenate([actor.ret_ring, jnp.zeros((1,))])
        ret_ring = ret_ring.at[slots].set(ep_ret)[:RETURN_RING]
        step_ring = jnp.concatenate([actor.step_ring, jnp.zeros((1,))])
        step_ring = step_ring.at[slots].set(ep_step.astype(jnp.float32))[:RETURN_RING]

        # reset ended streams: env, episode stats, and recurrent state
        # (resetstate! parity, src/solver.jl:128)
        env_state, obs, _ = auto_reset(env, env_state, next_obs, done, truncate, k_reset)
        net_state = jax.tree_util.tree_map(
            lambda s: jnp.where(
                ended.reshape((-1,) + (1,) * (s.ndim - 1)), jnp.zeros_like(s), s
            ),
            net_state,
        )
        actor = ActorState(
            env_state=env_state,
            obs=obs,
            net_state=net_state,
            ep_step=jnp.where(ended, 0, ep_step),
            ep_ret=jnp.where(ended, 0.0, ep_ret),
            ret_ring=ret_ring,
            ep_count=actor.ep_count + n_end,
            step_ring=step_ring,
            # saturating counter: t only feeds the ε schedule (which is flat
            # past its horizon), so cap it instead of overflowing int32 —
            # at headline throughput 2^31 steps is minutes of wall time
            t=jnp.minimum(actor.t + num_envs, jnp.asarray(1 << 30, jnp.int32)),
            key=key,
        )
        return (actor, replay, params), None

    return step


def avg_recent(ring: jnp.ndarray, count: jnp.ndarray) -> jnp.ndarray:
    """Mean over the last min(count, RETURN_RING) completed episodes."""
    n = jnp.minimum(count, RETURN_RING)
    mask = jnp.arange(RETURN_RING) < n
    return jnp.sum(ring * mask) / jnp.maximum(n, 1)
