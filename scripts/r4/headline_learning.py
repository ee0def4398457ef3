"""Learning evidence AT the headline-bench scale (VERDICT r3 missing #2).

``bench.py``'s 131072-env config is throughput-only; the largest on-chip
learning demo before round 4 was 512 envs. This harness runs the REAL solver
(eval enabled) at the exact bench shape — SimpleGridWorld, dueling
double-DQN, PER with the generation-scaled buffer, data/update ratio fixed
at 4096 env steps per update (U = num_envs/4096 grouped sub-updates per
iteration, priorities up to U-1 sub-updates stale) — and records the eval
curve vs aggregate env steps. The contract being tested is the reference's
"it learns" (``test/runtests.jl:45-111``): greedy-eval return must clear the
GridWorld threshold 1.0 despite the grouped-update staleness at scale.

Frequencies are scaled to preserve the reference's per-UPDATE ratios, not
its per-env-step ones (SURVEY.md §7(c)): target sync every ~128 updates
(500 env steps / train_freq 4 in the small config) -> 4096 * 128 env steps.

Run: ``BENCH_ENVS=131072 python scripts/r4/headline_learning.py`` (TPU).
Prints one JSON line; feeds docs/results_r4.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from deepqlearning_tpu import (
        Chain,
        DeepQLearningSolver,
        Dense,
        EpsGreedyPolicy,
        Flatten,
        LinearDecaySchedule,
        SimpleGridWorld,
        create_dueling_network,
    )

    num_envs = int(os.environ.get("BENCH_ENVS", "32768"))
    updates_target = int(os.environ.get("UPDATES", "4000"))
    train_freq = 4096                      # bench data/update ratio
    max_steps = updates_target * train_freq
    buffer_size = 1 << max(18, (8 * num_envs - 1).bit_length())

    env = SimpleGridWorld()
    chain = Chain(Flatten(), Dense(2, 64, jnp.tanh), Dense(64, 64, jnp.tanh),
                  Dense(64, env.num_actions))

    solver = DeepQLearningSolver(
        qnetwork=chain,                    # dueling split by the solver
        num_envs=num_envs, batch_size=512, buffer_size=buffer_size,
        train_freq=train_freq, max_steps=max_steps,
        learning_rate=5e-3, max_episode_length=100,
        double_q=True, dueling=True, prioritized_replay=True,
        target_update_freq=train_freq * 128,   # ~128-update target lag
        eval_freq=max_steps // 20, num_ep_eval=256,
        log_freq=max_steps // 20, save_freq=max_steps * 2,
        logdir=None, verbose=False,
        exploration_policy=EpsGreedyPolicy(
            LinearDecaySchedule(1.0, 0.01, max_steps // 2)
        ),
    )
    solver.solve(env)
    evals = [(int(t), round(float(r), 4)) for t, r in solver.metrics["eval"]]
    threshold = 1.0
    crossed = next((t for t, r in evals if r >= threshold), None)
    print(json.dumps({
        "metric": "headline_scale_learning",
        "config": {
            "problem": "SimpleGridWorld", "num_envs": num_envs,
            "batch_size": 512, "train_freq": train_freq,
            "buffer_size": buffer_size,
            "updates_per_iter": num_envs // train_freq,
            "total_env_steps": max_steps,
            "total_updates": updates_target,
            "network": "dueling 2-64-64-|A| (bench.py network)",
        },
        "threshold": threshold,
        "steps_to_threshold": crossed,
        "final_eval_return": evals[-1][1] if evals else None,
        "eval_curve": evals,
    }))


if __name__ == "__main__":
    main()
