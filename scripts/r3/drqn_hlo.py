"""Diagnose the collect+train interaction cost: compile the full DRQN
iteration and the two single-phase variants, print XLA cost analysis (bytes
accessed / flops) and any large `copy`/`fusion` ops in the while body."""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def main():
    from deepqlearning_tpu import Chain, Dense, DQNConfig, SimpleGridWorld
    from deepqlearning_tpu.models.chain import LSTM
    from deepqlearning_tpu.learner.actor import init_actor, make_collect_step
    from deepqlearning_tpu.learner.loop import LoopCarry
    from deepqlearning_tpu.learner.train_step import (
        FusedAdamState, make_fused_grouped_drqn_train_step, sync_target,
    )
    from deepqlearning_tpu.replay.episode import EpisodeReplayBuffer
    from deepqlearning_tpu.solver.exploration import LinearDecaySchedule

    num_envs = 16384
    cfg = DQNConfig(
        num_envs=num_envs, batch_size=512, buffer_size=4096, train_freq=4096,
        trace_length=8, max_episode_length=100, recurrence=True, double_q=True,
    )
    env = SimpleGridWorld()
    network = Chain(LSTM(2, 32), Dense(32, env.num_actions))
    buffer = EpisodeReplayBuffer(
        env.obs_shape, cfg.buffer_size, cfg.batch_size, cfg.trace_length,
        cfg.max_episode_length, num_envs=num_envs,
    )
    U = cfg.updates_per_iter
    fus_step, _ = make_fused_grouped_drqn_train_step(
        network, buffer, env.discount, True, cfg.learning_rate, U)
    insert_fn = lambda replay, tr, ended: buffer.add_step(replay, tr, ended)
    csr = make_collect_step(env, network, cfg.max_episode_length,
                            LinearDecaySchedule(1.0, 0.01, 100_000), insert_fn)

    params = network.init(jax.random.PRNGKey(0))
    actor = init_actor(env, network, num_envs, jax.random.PRNGKey(1))
    z = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
    fo = FusedAdamState(m=z(), v=z(), count=jnp.asarray(0, jnp.int32))
    carry = LoopCarry(actor, buffer.init(), params, params, fo,
                      jax.random.PRNGKey(2), jnp.asarray(0.0),
                      jnp.asarray(0.0), jnp.asarray(0, jnp.int32))

    def make(do_collect, do_train):
        def it(c, _):
            actor, replay, params = c.actor, c.replay, c.params
            tp, opt, lkey = c.target_params, c.opt_state, c.lkey
            loss, gnorm = c.loss, c.gnorm
            if do_collect:
                (actor, replay, params), _ = csr((actor, replay, params), None)
            if do_train:
                lkey, k = jax.random.split(lkey)
                res = fus_step(params, tp, opt, replay, k)
                params, opt, replay = res.params, res.opt_state, res.replay_state
                loss, gnorm = res.loss, res.grad_norm
            sync_acc = c.sync_acc + cfg.env_steps_per_iter
            do_sync = sync_acc >= cfg.target_update_freq
            sync_acc = jnp.where(do_sync, sync_acc % cfg.target_update_freq,
                                 sync_acc)
            tp = sync_target(params, tp, do_sync)
            return LoopCarry(actor, replay, params, tp, opt, lkey, loss,
                             gnorm, sync_acc), None

        def run(c):
            c, _ = jax.lax.scan(it, c, None, length=50)
            return c

        return run

    for name, (dc, dt) in [("full", (True, True)), ("collect", (True, False)),
                           ("train", (False, True))]:
        comp = jax.jit(make(dc, dt)).lower(carry).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        print(f"== {name}: bytes accessed {ca.get('bytes accessed', -1)/1e9:.2f} GB, "
              f"flops {ca.get('flops', -1)/1e9:.2f} GF")
        hlo = comp.as_text()
        # large copies / dynamic-update ops inside the loop
        sizes = {}
        for m in re.finditer(r"(\S+) = (f32|s32|pred)\[([0-9,]*)\][^ ]* copy\(", hlo):
            dims = [int(x) for x in m.group(3).split(",") if x]
            n = 1
            for d in dims:
                n *= d
            sizes[m.group(1)] = n * 4
        big = sorted(sizes.items(), key=lambda kv: -kv[1])[:8]
        for nme, b in big:
            if b > 1 << 20:
                print(f"   copy {nme}: {b/1e6:.1f} MB")


if __name__ == "__main__":
    main()
