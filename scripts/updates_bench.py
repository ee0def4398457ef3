"""Learner updates/s per chip — BASELINE.md primary metric #2.

Times the fused PER train step alone (stratified sum-tree sample → double-Q
targets → IS-weighted Huber → grad → Adam → priority update) back-to-back
under one jitted scan, isolating learner throughput from collection.

Usage: python scripts/updates_bench.py [--batch 512] [--iters 1000]
Prints one JSON line {"metric": "learner_updates_per_s", ...}.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--buffer", type=int, default=1 << 18)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--obs", type=int, default=2)
    args = ap.parse_args()

    from deepqlearning_tpu import Chain, Dense, Flatten, create_dueling_network
    from deepqlearning_tpu.learner.train_step import make_dqn_train_step
    from deepqlearning_tpu.replay.prioritized import PrioritizedReplayBuffer
    from deepqlearning_tpu.replay.transition import TransitionBatch

    obs_shape = (args.obs,)
    n_actions = 4
    chain = Chain(Flatten(), Dense(args.obs, 64, jnp.tanh),
                  Dense(64, 64, jnp.tanh), Dense(64, n_actions))
    network = create_dueling_network(chain)
    buffer = PrioritizedReplayBuffer(obs_shape, args.buffer, args.batch)
    step, optimizer = make_dqn_train_step(network, buffer, 0.99, True, 1e-4)

    key = jax.random.PRNGKey(0)
    params = network.init(key)
    opt_state = optimizer.init(params)
    replay = buffer.init()
    # fill the buffer with synthetic transitions
    E = 4096
    k1, k2 = jax.random.split(key)

    @jax.jit
    def fill(replay, k):
        def body(carry, _):
            replay, k = carry
            k, ko, ka, kr = jax.random.split(k, 4)
            tb = TransitionBatch(
                obs=jax.random.normal(ko, (E,) + obs_shape),
                action=jax.random.randint(ka, (E,), 0, n_actions),
                reward=jax.random.normal(kr, (E,)),
                next_obs=jax.random.normal(ko, (E,) + obs_shape),
                done=jnp.zeros((E,)),
            )
            return (buffer.insert(replay, tb), k), None
        (replay, _), _ = jax.lax.scan(body, (replay, k), None,
                                      length=args.buffer // E)
        return replay

    replay = fill(replay, k1)

    @jax.jit
    def run(params, opt_state, replay, k):
        def body(carry, _):
            params, target, opt_state, replay, k = carry
            k, ks = jax.random.split(k)
            res = step(params, target, opt_state, replay, ks)
            return (res.params, target, res.opt_state, res.replay_state, k), None
        (params, _, opt_state, replay, _), _ = jax.lax.scan(
            body, (params, params, opt_state, replay, k), None,
            length=args.iters)
        return params, opt_state, replay

    # warm-up (compile + lazy init)
    p, o, r = run(params, opt_state, replay, k2)
    jax.block_until_ready(jax.tree_util.tree_leaves(p)[0])

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        p, o, r = run(params, opt_state, replay, k2)
        jax.block_until_ready(jax.tree_util.tree_leaves(p)[0])
        best = min(best, time.perf_counter() - t0)

    ups = args.iters / best
    print(json.dumps({
        "metric": "learner_updates_per_s",
        "value": round(ups, 1),
        "unit": "updates/s",
        "batch_size": args.batch,
        "transitions_per_s": round(ups * args.batch, 1),
    }))


if __name__ == "__main__":
    main()
