"""Episode replay buffer for recurrent DRQN — fixed-shape, fully on-device.

The reference stores whole variable-length episodes and cuts random
``trace_length`` windows at sample time (``src/episode_replay.jl``). Under
XLA everything must be static-shape, so episodes live in a
``[capacity, max_len, ...]`` block with an explicit per-episode length, and
windows are gathers with a validity mask — semantics of
``src/episode_replay.jl:71-95`` (random start, zero padding, trace mask).

Per-env accumulation replaces the reference's single ``_episode`` list
(``src/episode_replay.jl:46-52``): each of the E lockstep envs appends into
its own row of an accumulator; when a row's episode ends it is committed into
the ring with a masked scatter (non-finished rows scatter into a trash slot).

Deviations (documented):
  * Episodes are committed on episode *end* (done OR truncation at
    ``max_episode_length``); the reference commits only on ``done`` and lets
    truncated episodes bleed into the next one (``src/episode_replay.jl:46-52``
    never sees the solver's truncation reset) — we reproduce the intent, not
    the leak.
  * Window = ``episode[start : start+T]`` with mask. The reference's fill
    loop reads ``ep[t]`` instead of ``ep[j]`` (``src/episode_replay.jl:84``),
    making "random start" effectively "random-length prefix"; SURVEY.md §2
    (C7) says to reproduce behavior, not the bug — the *intended* random-start
    window is what we implement, and the effective distribution over states
    matches the reference's prefix sampling for the short test episodes.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .transition import TransitionBatch


class EpisodeBatch(NamedTuple):
    """A batch of trace windows; leading axes are [batch, time]."""

    obs: jnp.ndarray       # [B, T, *obs_shape]
    action: jnp.ndarray    # [B, T] int32
    reward: jnp.ndarray    # [B, T] float32
    next_obs: jnp.ndarray  # [B, T, *obs_shape]
    done: jnp.ndarray      # [B, T] float32
    mask: jnp.ndarray      # [B, T] float32 — 1 for valid steps


class EpisodeReplayState(NamedTuple):
    # committed episode storage; one trailing trash row at index `capacity`
    obs: jnp.ndarray       # [C+1, L, *obs_shape]
    action: jnp.ndarray    # [C+1, L] int32
    reward: jnp.ndarray    # [C+1, L] float32
    next_obs: jnp.ndarray  # [C+1, L, *obs_shape]
    done: jnp.ndarray      # [C+1, L] float32
    length: jnp.ndarray    # [C+1] int32
    insert_pos: jnp.ndarray  # int32 scalar
    size: jnp.ndarray        # int32 scalar
    # per-env in-progress episodes
    acc_obs: jnp.ndarray       # [E, L, *obs_shape]
    acc_action: jnp.ndarray    # [E, L] int32
    acc_reward: jnp.ndarray    # [E, L] float32
    acc_next_obs: jnp.ndarray  # [E, L, *obs_shape]
    acc_done: jnp.ndarray      # [E, L] float32
    acc_len: jnp.ndarray       # [E] int32


class EpisodeReplayBuffer:
    def __init__(
        self,
        obs_shape: Tuple[int, ...],
        max_size: int,
        batch_size: int,
        trace_length: int,
        max_episode_length: int,
        num_envs: int = 1,
        obs_dtype=jnp.float32,
    ):
        self.obs_shape = tuple(obs_shape)
        self.max_size = int(max_size)
        self.batch_size = int(batch_size)
        self.trace_length = int(trace_length)
        self.max_episode_length = int(max_episode_length)
        self.num_envs = int(num_envs)
        self.obs_dtype = obs_dtype

    def init(self) -> EpisodeReplayState:
        C, L, E = self.max_size, self.max_episode_length, self.num_envs
        oshape = self.obs_shape
        dt = self.obs_dtype
        return EpisodeReplayState(
            obs=jnp.zeros((C + 1, L) + oshape, dt),
            action=jnp.zeros((C + 1, L), jnp.int32),
            reward=jnp.zeros((C + 1, L), jnp.float32),
            next_obs=jnp.zeros((C + 1, L) + oshape, dt),
            done=jnp.zeros((C + 1, L), jnp.float32),
            length=jnp.zeros((C + 1,), jnp.int32),
            insert_pos=jnp.asarray(0, jnp.int32),
            size=jnp.asarray(0, jnp.int32),
            acc_obs=jnp.zeros((E, L) + oshape, dt),
            acc_action=jnp.zeros((E, L), jnp.int32),
            acc_reward=jnp.zeros((E, L), jnp.float32),
            acc_next_obs=jnp.zeros((E, L) + oshape, dt),
            acc_done=jnp.zeros((E, L), jnp.float32),
            acc_len=jnp.zeros((E,), jnp.int32),
        )

    # ------------------------------------------------------------------
    def add_step(
        self, state: EpisodeReplayState, batch: TransitionBatch, ended: jnp.ndarray
    ) -> EpisodeReplayState:
        """Append one lockstep transition per env; commit rows whose episode
        ``ended`` (done or truncated) into the ring.

        Analog of ``add_exp!`` + ``add_episode!`` (``src/episode_replay.jl:46-60``).
        """
        E, L, C = self.num_envs, self.max_episode_length, self.max_size
        rows = jnp.arange(E)
        t = jnp.minimum(state.acc_len, L - 1)
        acc_obs = state.acc_obs.at[rows, t].set(batch.obs.astype(self.obs_dtype))
        acc_action = state.acc_action.at[rows, t].set(batch.action.astype(jnp.int32))
        acc_reward = state.acc_reward.at[rows, t].set(batch.reward.astype(jnp.float32))
        acc_next_obs = state.acc_next_obs.at[rows, t].set(
            batch.next_obs.astype(self.obs_dtype)
        )
        acc_done = state.acc_done.at[rows, t].set(batch.done.astype(jnp.float32))
        acc_len = jnp.minimum(state.acc_len + 1, L)

        ended = ended.astype(jnp.bool_)
        # ring positions for the finished rows; trash row C for the rest
        offsets = jnp.cumsum(ended.astype(jnp.int32)) - 1
        dest = jnp.where(ended, (state.insert_pos + offsets) % C, C)
        n_committed = jnp.sum(ended.astype(jnp.int32))
        return EpisodeReplayState(
            obs=state.obs.at[dest].set(acc_obs),
            action=state.action.at[dest].set(acc_action),
            reward=state.reward.at[dest].set(acc_reward),
            next_obs=state.next_obs.at[dest].set(acc_next_obs),
            done=state.done.at[dest].set(acc_done),
            length=state.length.at[dest].set(acc_len),
            insert_pos=(state.insert_pos + n_committed) % C,
            size=jnp.minimum(state.size + n_committed, C),
            # reset finished rows' accumulators (lengths only; stale data is
            # overwritten before it can be committed again)
            acc_obs=acc_obs,
            acc_action=acc_action,
            acc_reward=acc_reward,
            acc_next_obs=acc_next_obs,
            acc_done=acc_done,
            acc_len=jnp.where(ended, 0, acc_len),
        )

    # ------------------------------------------------------------------
    def sample(self, state: EpisodeReplayState, key) -> EpisodeBatch:
        """Uniform episodes, random-start windows, zero-padded with mask.

        Semantics of ``sample(::EpisodeReplayBuffer)``
        (``src/episode_replay.jl:71-95``).
        """
        B, T, L = self.batch_size, self.trace_length, self.max_episode_length
        k_ep, k_start = jax.random.split(key)
        ep = jax.random.randint(k_ep, (B,), 0, jnp.maximum(state.size, 1))
        length = state.length[ep]
        start = jax.random.randint(k_start, (B,), 0, jnp.maximum(length, 1))
        ts = start[:, None] + jnp.arange(T)[None, :]       # [B, T]
        valid = ts < length[:, None]
        ts_c = jnp.minimum(ts, L - 1)
        rows = ep[:, None]

        mask = valid.astype(jnp.float32)

        def window(field):
            g = field[rows, ts_c]
            if field.dtype == jnp.int32:
                return jnp.where(valid, g, 0)
            m = mask.reshape(mask.shape + (1,) * (g.ndim - 2)).astype(g.dtype)
            return g * m

        return EpisodeBatch(
            obs=window(state.obs).astype(jnp.float32),
            action=window(state.action),
            reward=window(state.reward),
            next_obs=window(state.next_obs).astype(jnp.float32),
            done=window(state.done),
            mask=mask,
        )
