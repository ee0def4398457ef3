"""Phase profile of the conv (compute-bound) benchmark: where do the
milliseconds go, and what fraction of each phase is MXU math?

Phases, per iteration (bf16, the native path):
  full      — the real iteration (collect 1 lockstep step + U=8 sub-updates)
  collect   — lockstep env step + PER insert only
  sample    — stratified PER draw + batch gather only
  sample+target — + the once-per-group target forward over U*B
  train     — full train step on the live replay (sample+target+U sub-updates)
  fwd_math  — U*B forward passes on a pre-drawn batch (pure conv math)
  train_math— U sub-updates' value_and_grad+Adam on pre-drawn batches (pure
              fwd+bwd math, no sampler/priorities)

Methodology: the tunneled backend costs ~25-40 ms PER LAUNCH, so a phase
timed at one iteration count absorbs that as a constant offset (an early
draft at n=30 inflated every phase by ~1 ms/iter). Each phase is therefore
run at TWO scan lengths and reported as the SLOPE (t(n2)-t(n1))/(n2-n1) —
launch overhead and one-time costs cancel exactly.

Feeds the roofline note in docs/results_r4.json (VERDICT r3 weak #2/next #4).
Run: ``python scripts/r4/conv_profile.py`` (TPU).
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

N1 = int(os.environ.get("BENCH_N1", "40"))
N2 = int(os.environ.get("BENCH_N2", "160"))


def main():
    from deepqlearning_tpu import (
        Chain, DQNConfig, Dense, Flatten, TestMDP, create_dueling_network,
    )
    from deepqlearning_tpu.models.chain import Activation, Conv2D
    from deepqlearning_tpu.learner.actor import init_actor
    from deepqlearning_tpu.learner.loop import LoopCarry, build_loop
    from deepqlearning_tpu.learner.train_step import make_grouped_dqn_train_step
    from deepqlearning_tpu.replay.prioritized import PrioritizedReplayBuffer
    from deepqlearning_tpu.solver.exploration import LinearDecaySchedule
    from scripts.conv_bench import fwd_flops

    dtype = jnp.bfloat16
    num_envs, batch_size, train_freq = 4096, 1024, 512
    env = TestMDP((20, 20), 4, 6)
    relu = jax.nn.relu
    layers = [
        Activation(lambda x: x.astype(jnp.bfloat16)),
        Conv2D(4, 32, (3, 3), (1, 1), "SAME", relu),
        Conv2D(32, 64, (3, 3), (2, 2), "SAME", relu),
        Conv2D(64, 128, (3, 3), (2, 2), "SAME", relu),
        Flatten(),
        Dense(5 * 5 * 128, 512, relu),
        Dense(512, env.num_actions),
    ]
    network = create_dueling_network(Chain(*layers))
    flops = fwd_flops(network, env.obs_shape)

    cfg = DQNConfig(
        num_envs=num_envs, batch_size=batch_size, buffer_size=32768,
        train_freq=train_freq, max_episode_length=6, double_q=True,
        prioritized_replay=True, dtype=dtype,
    )
    U = cfg.updates_per_iter
    buffer = PrioritizedReplayBuffer(
        env.obs_shape, cfg.buffer_size, cfg.batch_size,
        alpha=cfg.prioritized_replay_alpha, beta=cfg.prioritized_replay_beta,
        eps=cfg.prioritized_replay_epsilon, prioritized=True, obs_dtype=dtype,
    )
    iteration, populate_step, optimizer = build_loop(
        env, network, buffer, cfg, LinearDecaySchedule(1.0, 0.01, 100_000),
        gamma=env.discount,
    )
    step_fn, _ = make_grouped_dqn_train_step(
        network, buffer, env.discount, True, cfg.learning_rate, U)

    key = jax.random.PRNGKey(0)
    k_init, k_act, k_learn = jax.random.split(key, 3)
    params = network.init(k_init, dtype=dtype)
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
            populate_step, (actor, replay, params), None, length=10
        )
        return carry._replace(actor=actor, replay=replay)

    carry = populate(carry)

    kb = jax.random.PRNGKey(42)
    obs_b = jax.random.uniform(kb, (U * batch_size,) + env.obs_shape,
                               jnp.float32)

    from deepqlearning_tpu.ops.helpers import huber_loss
    import optax

    def build(phase, n):
        if phase == "full":
            @jax.jit
            def fn(carry):
                c, _ = jax.lax.scan(iteration, carry, None, length=n)
                return jax.tree_util.tree_leaves(c.params)[0]
        elif phase == "collect":
            @jax.jit
            def fn(carry):
                (a, r, p), _ = jax.lax.scan(
                    populate_step, (carry.actor, carry.replay, carry.params),
                    None, length=n)
                return r.rows[0, -4:]
        elif phase == "sample":
            @jax.jit
            def fn(carry):
                def body(acc_key, _):
                    acc, lkey = acc_key
                    lkey, k = jax.random.split(lkey)
                    b, idx, w = buffer.sample_n(carry.replay, k, U)
                    return (acc + jnp.sum(b.reward) + jnp.sum(w)
                            + jnp.sum(b.obs[0].astype(jnp.float32)), lkey), None
                (acc, _), _ = jax.lax.scan(
                    body, (jnp.asarray(0.0), carry.lkey), None, length=n)
                return acc
        elif phase == "sample+target":
            @jax.jit
            def fn(carry):
                def body(acc_key, _):
                    acc, lkey = acc_key
                    lkey, k = jax.random.split(lkey)
                    b, idx, w = buffer.sample_n(carry.replay, k, U)
                    q, _ = network.apply(carry.target_params, b.next_obs)
                    return (acc + jnp.sum(q.astype(jnp.float32)), lkey), None
                (acc, _), _ = jax.lax.scan(
                    body, (jnp.asarray(0.0), carry.lkey), None, length=n)
                return acc
        elif phase == "train":
            @jax.jit
            def fn(carry):
                def body(c, _):
                    params, opt_state, replay, lkey = c
                    lkey, k = jax.random.split(lkey)
                    res = step_fn(params, carry.target_params, opt_state,
                                  replay, k)
                    return (res.params, res.opt_state, res.replay_state,
                            lkey), None
                (p, o, r, _), _ = jax.lax.scan(
                    body, (carry.params, carry.opt_state, carry.replay,
                           carry.lkey), None, length=n)
                return jax.tree_util.tree_leaves(p)[0]
        elif phase == "fwd_math":
            @jax.jit
            def fn(carry):
                def body(acc, _):
                    q, _ = network.apply(carry.params, obs_b)
                    return acc + jnp.sum(q.astype(jnp.float32)), None
                acc, _ = jax.lax.scan(body, jnp.asarray(0.0), None, length=n)
                return acc
        elif phase == "prio_update":
            @jax.jit
            def fn(carry):
                def body(c, _):
                    replay, lkey = c
                    lkey, k = jax.random.split(lkey)
                    idx = jax.random.randint(k, (U * batch_size,), 0,
                                             buffer.max_size)
                    td = jax.random.normal(k, (U * batch_size,))
                    replay = buffer.update_priorities(replay, idx, td)
                    return (replay, lkey), None
                (r, _), _ = jax.lax.scan(
                    body, (carry.replay, carry.lkey), None, length=n)
                return r.tree[0][:8]
        elif phase == "subupdates":
            # the EXACT inner update (double-Q + td kernel + Adam) on
            # pre-drawn batches: train minus sampler/target/priorities
            from deepqlearning_tpu.learner.train_step import _make_batch_update
            from deepqlearning_tpu.replay.transition import TransitionBatch

            upd = _make_batch_update(network, buffer, env.discount, True,
                                     optimizer, None, True)
            kp = jax.random.split(kb, 8)
            pre = TransitionBatch(
                obs=obs_b.reshape((U, batch_size) + env.obs_shape).astype(dtype),
                action=jax.random.randint(kp[0], (U, batch_size), 0,
                                          env.num_actions),
                reward=jax.random.normal(kp[1], (U, batch_size)),
                next_obs=(obs_b.reshape((U, batch_size) + env.obs_shape)
                          .astype(dtype) * 0.9),
                done=jnp.zeros((U, batch_size)),
            )
            w_b = jnp.ones((U, batch_size))
            qsp = jax.random.normal(kp[2], (U, batch_size, env.num_actions))

            @jax.jit
            def fn(carry):
                def body(c, _):
                    params, opt = c

                    def sub(c2, x):
                        p, o = c2
                        b, w, q = x
                        p, o, td, prio, loss, gn = upd(
                            p, carry.target_params, o, b, w, q_sp_tgt=q)
                        return (p, o), loss

                    (params, opt), _ = jax.lax.scan(
                        sub, (params, opt), (pre, w_b, qsp))
                    return (params, opt), None

                (p, o), _ = jax.lax.scan(
                    body, (carry.params, carry.opt_state), None, length=n)
                return jax.tree_util.tree_leaves(p)[0]
        elif phase == "train_math":
            a_b = jax.random.randint(kb, (U, batch_size), 0, env.num_actions)
            obs_u = obs_b.reshape((U, batch_size) + env.obs_shape)

            @jax.jit
            def fn(carry):
                def sub(c, x):
                    params, opt = c
                    ob, ab = x

                    def loss_fn(p):
                        q, _ = network.apply(p, ob)
                        q_sa = jnp.take_along_axis(q, ab[:, None], axis=-1)[:, 0]
                        return (jnp.sum(huber_loss(q_sa)).astype(jnp.float32)
                                / batch_size)

                    loss, grads = jax.value_and_grad(loss_fn)(params)
                    upd, opt = optimizer.update(grads, opt, params)
                    return (optax.apply_updates(params, upd), opt), loss

                def body(c, _):
                    c, _losses = jax.lax.scan(sub, c, (obs_u, a_b))
                    return c, None

                (p, o), _ = jax.lax.scan(
                    body, (carry.params, carry.opt_state), None, length=n)
                return jax.tree_util.tree_leaves(p)[0]
        else:
            raise ValueError(phase)
        return fn

    def read(x):
        return float(jnp.sum(jnp.asarray(x).astype(jnp.float32)))

    def best_time(fn):
        out = fn(carry)
        read(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(carry)
            read(out)
            best = min(best, time.perf_counter() - t0)
        return best

    coll_fl = cfg.env_steps_per_iter * flops
    tr_fl = U * batch_size * 5 * flops
    fl = {
        "full": coll_fl + tr_fl, "collect": coll_fl, "train": tr_fl,
        "fwd_math": U * batch_size * flops,
        "train_math": U * batch_size * 3 * flops,
    }
    results = {}
    import os as _os
    only = _os.environ.get("PHASES")
    phases = only.split(",") if only else [
        "full", "collect", "sample", "sample+target", "train",
        "prio_update", "subupdates", "train_math"]
    for phase in phases:
        t1 = best_time(build(phase, N1))
        t2 = best_time(build(phase, N2))
        us = (t2 - t1) / (N2 - N1) * 1e6
        rec = {"phase": phase, "us_per_iter": round(us, 1)}
        if phase in fl:
            rec["tflops"] = round(fl[phase] / (us / 1e6) / 1e12, 2)
        results[phase] = rec
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
