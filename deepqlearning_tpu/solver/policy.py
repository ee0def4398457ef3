"""Greedy NN policy — the deployable artifact returned by ``solve``.

Parity with reference ``src/policy.jl``: ``NNPolicy`` wraps the Q-network +
action map; ``action`` is the greedy argmax of a singleton batch
(``src/policy.jl:38-46``) with a dims check that raises on mismatch
(``:44``); ``actionvalues`` and ``value`` expose the Q-vector / max-Q; for
recurrent nets the policy carries hidden state across calls and
``resetstate`` zeroes it (``:32-34``). Host-side statefulness is confined to
this thin inference wrapper — training never uses it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class AbstractNNPolicy:
    pass


class NNPolicy(AbstractNNPolicy):
    def __init__(self, problem, network, params, action_map, n_input_dims: int):
        self.problem = problem
        self.network = network
        self.params = params
        self.action_map = list(action_map)
        self.n_input_dims = int(n_input_dims)
        self._apply = jax.jit(lambda p, o, s: network.apply(p, o, s))
        self.reset_state()

    # -- NN policy interface (src/policy.jl:8-20) ----------------------
    def getnetwork(self):
        return self.network

    def reset_state(self):
        self._state = self.network.init_state(1)

    def actionmap(self):
        return self.action_map

    # ------------------------------------------------------------------
    def _check(self, o):
        try:
            o = jnp.asarray(o, jnp.float32)
        except (TypeError, ValueError):
            # not an array: treat as a raw problem state and convert through
            # the env/problem, mirroring the reference's
            # ``POMDPs.action(policy, s) -> convert_s`` dispatch
            # (``src/policy.jl:66-76``)
            if hasattr(self.problem, "observe"):
                o = jnp.asarray(self.problem.observe(o), jnp.float32)
            else:
                raise
        if o.ndim != self.n_input_dims:
            raise ValueError(
                f"NNPolicyError: was expecting an array with {self.n_input_dims}"
                f" dimensions, got {o.ndim}"
            )
        return o[None]

    def _forward(self, o):
        q, self._state = self._apply(self.params, self._check(o), self._state)
        return q[0]

    def action(self, o):
        """Greedy action (``src/policy.jl:38-46``)."""
        return self.action_map[int(jnp.argmax(self._forward(o)))]

    def actionvalues(self, o):
        """Q(s, ·) vector (``POMDPTools.actionvalues`` parity)."""
        return np.asarray(self._forward(o))

    def value(self, o):
        """max_a Q(s, a) (``src/policy.jl:60-66``)."""
        return float(jnp.max(self._forward(o)))


def getnetwork(policy):
    return policy.getnetwork()


def resetstate(policy):
    """``resetstate!`` parity (``src/policy.jl:32-34``)."""
    policy.reset_state()


# Julia-style alias for API familiarity
resetstate_ = resetstate
