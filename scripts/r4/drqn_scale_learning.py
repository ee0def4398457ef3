"""Learning evidence at the DRQN bench scale.

The recurrent analog of ``scripts/r4/headline_learning.py``: the exact
``scripts/drqn_bench.py`` config (SimpleGridWorld, LSTM-32, trace 8,
16384 envs, data/update 4096:1, fused DRQN kernel) trained for real with
eval enabled. Round-4 rebuilt the episode ring (merged shadow-row layout,
sliced window gathers), so this pins that the 33M-steps/s path still
*learns*: the greedy-eval return must clear the GridWorld threshold 1.0
(the reference's DRQN contract is the weaker r >= 0 smoke,
``test/runtests.jl:128,146``).

Recorded r4 result: threshold crossed at 819K env steps (200 updates),
final eval return 8.05 over 8.2M env steps.

Run: ``python scripts/r4/drqn_scale_learning.py`` (TPU, ~1 min). Prints one
JSON line; recorded in docs/results_r4.json.
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
        Chain, DeepQLearningSolver, Dense, EpsGreedyPolicy,
        LinearDecaySchedule, SimpleGridWorld,
    )
    from deepqlearning_tpu.models.chain import LSTM

    env = SimpleGridWorld()
    num_envs = int(os.environ.get("BENCH_ENVS", "16384"))
    train_freq = 4096
    max_steps = int(os.environ.get("UPDATES", "2000")) * train_freq
    solver = DeepQLearningSolver(
        qnetwork=Chain(LSTM(2, 32), Dense(32, env.num_actions)),
        max_steps=max_steps, num_envs=num_envs, train_freq=train_freq,
        batch_size=512, buffer_size=4096, trace_length=8, recurrence=True,
        train_start=num_envs, learning_rate=5e-3,
        eval_freq=max_steps // 10, num_ep_eval=256, log_freq=max_steps // 10,
        save_freq=1 << 30, target_update_freq=train_freq * 64,
        double_q=True, dueling=False, verbose=False, logdir=None,
        max_episode_length=100, seed=3,
        exploration_policy=EpsGreedyPolicy(
            LinearDecaySchedule(1.0, 0.01, max_steps // 2)),
    )
    solver.solve(env)
    evals = [(int(t), round(float(r), 4)) for t, r in solver.metrics["eval"]]
    crossed = next((t for t, r in evals if r >= 1.0), None)
    print(json.dumps({
        "metric": "drqn_scale_learning",
        "config": {"problem": "SimpleGridWorld", "num_envs": num_envs,
                   "network": "LSTM(2,32)+Dense (drqn_bench config)",
                   "train_freq": train_freq, "trace_length": 8,
                   "updates_per_iter": num_envs // train_freq,
                   "total_env_steps": max_steps},
        "threshold": 1.0, "steps_to_threshold": crossed,
        "final_eval_return": evals[-1][1] if evals else None,
        "eval_curve": evals,
    }))


if __name__ == "__main__":
    main()
