"""Exploration strategies.

Parity with the reference's exploration surface: the solver consumes an
ε-greedy policy with a linear decay schedule (POMDPTools' ``EpsGreedyPolicy``
+ ``LinearDecaySchedule``, used at ``src/solver.jl:83`` and
``test/runtests.jl:49``), and the package also ships a function-valued
``linear_epsilon_greedy`` example (``src/exploration_policy.jl:16-36``).

Schedules here are frozen dataclasses whose ``__call__(t)`` is pure jnp math,
so they can be traced straight into the jitted actor.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LinearDecaySchedule:
    """ε(t): linear from ``start`` to ``stop`` over ``steps`` steps, then flat.

    Matches POMDPTools' ``LinearDecaySchedule`` used throughout the reference
    tests (``test/runtests.jl:49``).
    """

    start: float = 1.0
    stop: float = 0.01
    steps: int = 5000

    def __call__(self, t):
        t = t.astype(jnp.float32) if hasattr(t, "astype") else float(t)
        # clip both ends: negative/overflowed step counters degrade to the
        # schedule endpoints instead of eps outside [stop, start]
        frac = jnp.clip(t / max(self.steps, 1), 0.0, 1.0)
        return self.start - (self.start - self.stop) * frac


@dataclasses.dataclass(frozen=True)
class ConstantEpsilon:
    eps: float = 0.01

    def __call__(self, t):
        return jnp.asarray(self.eps, jnp.float32)


@dataclasses.dataclass(frozen=True)
class EpsGreedyPolicy:
    """ε-greedy exploration with a schedule; the solver's default strategy."""

    schedule: LinearDecaySchedule = LinearDecaySchedule()

    def eps(self, t):
        return self.schedule(t)

    def loginfo(self, t):
        """Scalar(s) to log, parity with ``loginfo`` (``src/solver.jl:155``)."""
        return {"eps": float(self.schedule(jnp.asarray(t)))}


def exploration(f, policy, env, obs, global_step, rng):
    """Dispatch through a function-valued exploration strategy.

    Parity with reference ``exploration`` (``src/exploration_policy.jl:10-12``):
    ``f(policy, env, obs, global_step, rng) -> (action, eps)``. The
    ``HostEnv`` training path dispatches bare-callable
    ``exploration_policy`` objects through exactly this signature
    (``envs/compat.py``); the jitted vectorized path requires schedule
    objects (``EpsGreedyPolicy``) and rejects bare callables with a clear
    error.
    """
    return f(policy, env, obs, global_step, rng)


def linear_epsilon_greedy(max_steps: int, eps_fraction: float, eps_end: float) -> EpsGreedyPolicy:
    """Reference example strategy (``src/exploration_policy.jl:16-36``):
    linear decay from 1 to ``eps_end`` over ``eps_fraction * max_steps``."""
    return EpsGreedyPolicy(
        LinearDecaySchedule(start=1.0, stop=eps_end,
                            steps=max(1, int(eps_fraction * max_steps)))
    )
