"""Data-parallel actor-learner over a TPU device mesh.

The reference is strictly single-device (SURVEY.md §2.3); the scaling story
here is the BASELINE.json north star: envs and replay sharded over a
``data`` mesh axis, parameters replicated, gradients ``pmean``-reduced over
ICI by XLA — expressed with ``jax.shard_map`` around the same pure
``iteration`` the single-chip solver uses (``learner/loop.py``). Each shard
owns ``num_envs`` local envs and a full local replay shard, so collection and
sampling need *zero* collectives; the only cross-device traffic is the grad
all-reduce (and the scalar metrics).
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import DQNConfig
from ..learner.actor import init_actor
from ..learner.loop import LoopCarry, build_loop


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


class DataParallelRunner:
    """Runs the DQN loop with per-device env/replay shards.

    State layout: every leaf of the carry gets a leading ``[D]`` device axis
    (the classic pmap pattern); ``shard_map`` hands each device its slice.
    Parameters start replicated and stay bit-identical because the grad
    ``pmean`` makes every device apply the same update.

    ``cfg.num_envs`` is interpreted *per device*; aggregate env throughput is
    ``num_envs * D``.
    """

    def __init__(self, env, network, buffer, cfg: DQNConfig, eps_fn,
                 gamma: float, mesh: Optional[Mesh] = None):
        self.env, self.network, self.buffer, self.cfg = env, network, buffer, cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis = self.mesh.axis_names[0]
        self.n_devices = self.mesh.devices.size
        iteration, populate_step, self.optimizer = build_loop(
            env, network, buffer, cfg, eps_fn, gamma, axis_name=self.axis
        )
        self._iteration = iteration
        self._populate_step = populate_step

        def local_segment(stacked_carry, n_iters):
            carry = jax.tree_util.tree_map(lambda x: x[0], stacked_carry)
            carry, _ = jax.lax.scan(iteration, carry, None, length=n_iters)
            return jax.tree_util.tree_map(lambda x: x[None], carry)

        def local_populate(stacked_carry, n_iters):
            carry = jax.tree_util.tree_map(lambda x: x[0], stacked_carry)
            actor, replay, params = carry.actor, carry.replay, carry.params
            (actor, replay, params), _ = jax.lax.scan(
                populate_step, (actor, replay, params), None, length=n_iters
            )
            carry = carry._replace(actor=actor, replay=replay)
            return jax.tree_util.tree_map(lambda x: x[None], carry)

        spec = P(self.axis)

        def make_sharded(fn):
            # check_vma off: pmean-derived metrics become device-invariant
            # mid-scan, which the varying-axes checker rejects even though the
            # program is correct (classic pmap-style replication).
            @functools.partial(jax.jit, static_argnums=(1,))
            def run(stacked_carry, n_iters):
                return jax.shard_map(
                    functools.partial(fn, n_iters=n_iters),
                    mesh=self.mesh,
                    in_specs=(spec,),
                    out_specs=spec,
                    check_vma=False,
                )(stacked_carry)

            return run

        self.run_segment = make_sharded(local_segment)
        self.run_populate = make_sharded(local_populate)

    # ------------------------------------------------------------------
    def init_carry(self, key) -> LoopCarry:
        cfg, D = self.cfg, self.n_devices
        k_init, k_act, k_learn = jax.random.split(key, 3)
        params = self.network.init(k_init)
        opt_state = self.optimizer.init(params)
        actor_keys = jax.random.split(k_act, D)
        actors = jax.vmap(
            lambda k: init_actor(self.env, self.network, cfg.num_envs, k)
        )(actor_keys)
        replay = self.buffer.init()

        def stack(x):
            return jnp.broadcast_to(x[None], (D,) + x.shape)

        return LoopCarry(
            actor=actors,
            replay=jax.tree_util.tree_map(stack, replay),
            params=jax.tree_util.tree_map(stack, params),
            target_params=jax.tree_util.tree_map(stack, params),
            opt_state=jax.tree_util.tree_map(stack, opt_state),
            lkey=jax.random.split(k_learn, D),
            loss=jnp.zeros((D,)),
            gnorm=jnp.zeros((D,)),
            sync_acc=jnp.zeros((D,), jnp.int32),
        )

    def device_get_params(self, carry: LoopCarry):
        """Replicated params → single copy (device 0's)."""
        return jax.tree_util.tree_map(lambda x: x[0], carry.params)
