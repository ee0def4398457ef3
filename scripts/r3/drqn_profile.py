"""Phase profile of the DRQN loop at the bench config: where do the
microseconds go after the fused kernel? Times, per iteration:

  collect  — lockstep env steps + episode-ring insert only
  sample   — episode window gather (sample_n) only
  target   — outside-the-kernel target-net unroll (apply_sequence) only
  kernel   — the fused Pallas train launch only (pre-drawn batch)
  full     — the real iteration

Each phase runs in its own scan with a device->host read bracketing the
timing (block_until_ready is unreliable on the tunneled backend). Results
feed docs/results_r3.json; methodology as scripts/profile_bench.py.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from deepqlearning_tpu import Chain, Dense, DQNConfig, SimpleGridWorld
    from deepqlearning_tpu.models.chain import LSTM
    from deepqlearning_tpu.learner.actor import init_actor
    from deepqlearning_tpu.learner.loop import LoopCarry, build_loop
    from deepqlearning_tpu.learner.train_step import (
        make_fused_grouped_drqn_train_step,
    )
    from deepqlearning_tpu.ops.pallas.fused_drqn import drqn_plan_for
    from deepqlearning_tpu.replay.episode import EpisodeReplayBuffer
    from deepqlearning_tpu.solver.exploration import LinearDecaySchedule

    num_envs = int(os.environ.get("BENCH_ENVS", "16384"))
    batch_size, trace_length, train_freq = 512, 8, 4096
    n_iters = 200

    env = SimpleGridWorld()
    network = Chain(LSTM(2, 32), Dense(32, env.num_actions))
    cfg = DQNConfig(
        num_envs=num_envs, batch_size=batch_size, buffer_size=4096,
        train_freq=train_freq, trace_length=trace_length,
        max_episode_length=100, recurrence=True, double_q=True,
    )
    U = cfg.updates_per_iter
    plan = drqn_plan_for(network, trace_length, batch_size, True)
    print(f"# plan supported: {plan is not None}, U={U}", file=sys.stderr)
    buffer = EpisodeReplayBuffer(
        env.obs_shape, cfg.buffer_size, cfg.batch_size, trace_length,
        cfg.max_episode_length, num_envs=num_envs,
    )
    iteration, populate_step, optimizer = build_loop(
        env, network, buffer, cfg, LinearDecaySchedule(1.0, 0.01, 100_000),
        gamma=env.discount,
    )
    fus_step, _ = make_fused_grouped_drqn_train_step(
        network, buffer, env.discount, True, cfg.learning_rate, U)

    key = jax.random.PRNGKey(0)
    k_init, k_act, k_learn = jax.random.split(key, 3)
    params = network.init(k_init)
    actor = init_actor(env, network, num_envs, k_act)
    carry = LoopCarry(
        actor=actor, replay=buffer.init(), params=params,
        target_params=params, opt_state=optimizer.init(params),
        lkey=k_learn, loss=jnp.asarray(0.0), gnorm=jnp.asarray(0.0),
        sync_acc=jnp.asarray(0, jnp.int32),
    )

    @jax.jit
    def populate(carry):
        actor, replay, params = carry.actor, carry.replay, carry.params
        (actor, replay, params), _ = jax.lax.scan(
            populate_step, (actor, replay, params), None,
            length=cfg.max_episode_length + 1,
        )
        return carry._replace(actor=actor, replay=buffer.reset_in_progress(replay))

    carry = populate(carry)
    collect_step = None  # phases below

    # --- phase: full iteration
    @jax.jit
    def full(carry):
        carry, _ = jax.lax.scan(iteration, carry, None, length=n_iters)
        return carry

    # --- phase: collect only (populate_step but with the trained eps path —
    # close enough for timing; same program shape)
    @jax.jit
    def collect_only(carry):
        actor, replay, params = carry.actor, carry.replay, carry.params
        (actor, replay, params), _ = jax.lax.scan(
            populate_step, (actor, replay, params), None, length=n_iters
        )
        return carry._replace(actor=actor, replay=replay)

    # --- phase: sample only (window gather; fold result into a scalar)
    @jax.jit
    def sample_only(carry):
        def body(acc_key, _):
            acc, lkey = acc_key
            lkey, k = jax.random.split(lkey)
            b = buffer.sample_n(carry.replay, k, U)
            return (acc + jnp.sum(b.reward) + jnp.sum(b.obs[0]), lkey), None

        (acc, _), _ = jax.lax.scan(
            body, (jnp.asarray(0.0), carry.lkey), None, length=n_iters)
        return acc

    # --- phase: target unroll only (the outside-kernel part of the step)
    @jax.jit
    def target_only(carry):
        B, T = batch_size, trace_length

        def body(acc_key, _):
            acc, lkey = acc_key
            lkey, k = jax.random.split(lkey)
            b = buffer.sample_n(carry.replay, k, U)
            nobs_t = jnp.swapaxes(b.next_obs, 0, 1)
            q, _ = network.apply_sequence(
                carry.target_params, nobs_t, network.init_state(U * B))
            return (acc + jnp.sum(q), lkey), None

        (acc, _), _ = jax.lax.scan(
            body, (jnp.asarray(0.0), carry.lkey), None, length=n_iters)
        return acc

    # --- phase: full train step (sample + target + kernel)
    from deepqlearning_tpu.learner.train_step import FusedAdamState
    z = lambda: jax.tree_util.tree_map(jnp.zeros_like, carry.params)
    fo = FusedAdamState(m=z(), v=z(), count=jnp.asarray(0, jnp.int32))

    @jax.jit
    def train_only2(carry):
        def body(c, _):
            params, opt_state, lkey = c
            lkey, k = jax.random.split(lkey)
            res = fus_step(params, carry.target_params, opt_state,
                           carry.replay, k)
            return (res.params, res.opt_state, lkey), None

        (p, o, _), _ = jax.lax.scan(
            body, (carry.params, fo, carry.lkey), None, length=n_iters)
        return p

    def timeit(name, fn, read):
        out = fn(carry)
        read(out)  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(carry)
            read(out)
            best = min(best, time.perf_counter() - t0)
        us = best / n_iters * 1e6
        print(json.dumps({"phase": name, "us_per_iter": round(us, 1)}))
        return us

    read_carry = lambda c: float(jnp.sum(
        jax.tree_util.tree_leaves(c.params)[0]))
    read_scalar = lambda x: float(jnp.asarray(x).ravel()[0] if hasattr(
        x, "ravel") else x)
    read_tree = lambda p: float(jnp.sum(jax.tree_util.tree_leaves(p)[0]))

    # --- in-context variants: the REAL iteration minus one phase, so the
    # numbers add up against `full` (out-of-context phases let XLA hoist
    # loop-invariant work and hide carry-aliasing costs)
    from deepqlearning_tpu.learner.actor import make_collect_step
    from deepqlearning_tpu.learner.train_step import sync_target

    insert_fn = lambda replay, tr, ended: buffer.add_step(replay, tr, ended)
    csr = make_collect_step(
        env, network, cfg.max_episode_length,
        LinearDecaySchedule(1.0, 0.01, 100_000), insert_fn)

    def make_variant(do_collect, do_train):
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

        @jax.jit
        def run(c):
            c, _ = jax.lax.scan(it, c, None, length=n_iters)
            return c

        return run

    carry_f = carry._replace(opt_state=fo)

    def timeit_on(name, fn, c):
        out = fn(c)
        read_carry(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(c)
            read_carry(out)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"phase": name,
                          "us_per_iter": round(best / n_iters * 1e6, 1)}))

    timeit("full", full, read_carry)
    timeit("collect", collect_only, read_carry)
    timeit("sample", sample_only, read_scalar)
    timeit("sample+target", target_only, read_scalar)
    timeit("train(sample+target+kernel)", train_only2, read_tree)
    timeit_on("ctx:collect+train+sync", make_variant(True, True), carry_f)
    timeit_on("ctx:collect+sync", make_variant(True, False), carry_f)
    timeit_on("ctx:train+sync", make_variant(False, True), carry_f)


if __name__ == "__main__":
    main()
