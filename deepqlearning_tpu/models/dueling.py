"""Dueling Q-network: Q(s,a) = V(s) + A(s,a) - mean_a A(s,a).

Parity with reference ``src/dueling.jl``: the forward combination rule is
``src/dueling.jl:8-11``; the chain-splitting constructor is
``create_dueling_network`` (``src/dueling.jl:36-58``) — the trailing run of
Dense layers is duplicated into a value head (last layer replaced by
``Dense(n, 1)``) and an advantage head, with everything before it shared as
the base. Non-Dense trailing layers are an error, as in the reference.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .chain import Chain, Dense


@dataclasses.dataclass(frozen=True)
class DuelingNetwork:
    base: Chain
    val: Chain
    adv: Chain

    def init(self, key, dtype=jnp.float32):
        kb, kv, ka = jax.random.split(key, 3)
        return {
            "base": self.base.init(kb, dtype),
            "val": self.val.init(kv, dtype),
            "adv": self.adv.init(ka, dtype),
        }

    def init_state(self, batch_size: int, dtype=jnp.float32):
        return self.base.init_state(batch_size, dtype)

    def apply(self, params, x, state=None):
        x, new_state = self.base.apply(params["base"], x, state)
        v, _ = self.val.apply(params["val"], x)
        a, _ = self.adv.apply(params["adv"], x)
        q = v + a - jnp.mean(a, axis=-1, keepdims=True)
        return q, new_state

    def apply_sequence(self, params, xs, state):
        """Time-major ``[T, B, ...]`` fast path (see ``Chain.apply_sequence``);
        the Dense heads apply to all timesteps in one op."""
        xs, new_state = self.base.apply_sequence(params["base"], xs, state)
        v, _ = self.val.apply(params["val"], xs)
        a, _ = self.adv.apply(params["adv"], xs)
        q = v + a - jnp.mean(a, axis=-1, keepdims=True)
        return q, new_state

    @property
    def recurrent(self) -> bool:
        return self.base.recurrent

    @property
    def out_dim(self):
        return self.adv.out_dim


def create_dueling_network(network: Chain) -> DuelingNetwork:
    """Split a user Chain into a DuelingNetwork.

    Semantics of reference ``create_dueling_network`` (``src/dueling.jl:36-58``):
    find the trailing maximal run of Dense layers; those become the (fresh)
    advantage head, a copy with the final layer replaced by ``Dense(n, 1)``
    becomes the value head, and everything before is the shared base. Raises
    if the network has no trailing Dense run.
    """
    if isinstance(network, DuelingNetwork):
        return network
    if not isinstance(network, Chain):
        raise TypeError("create_dueling_network expects a Chain")
    layers = network.layers
    split = len(layers)
    while split > 0 and isinstance(layers[split - 1], Dense):
        split -= 1
    trailing = layers[split:]
    if len(trailing) == 0:
        raise ValueError(
            "DeepQLearningError: the qnetwork provided is incompatible with dueling"
        )
    base = Chain(layers[:split])
    adv = Chain(trailing)
    last = trailing[-1]
    val = Chain(trailing[:-1] + (Dense(last.in_dim, 1),))
    return DuelingNetwork(base=base, val=val, adv=adv)
