"""Headline-scale soak with mid-run checkpoint/resume (production story).

Trains the bench-shaped config at 32768 envs for half the budget, lets the
solver write its full train state (params + target + Adam + replay + actor,
``solver/checkpoint.py``), then constructs a FRESH solver/process-state and
continues with ``solve(env, resume=True)`` for the second half. Asserts:

  * the resumed run picks up where the first left off (its first eval
    already clears the threshold — no cold restart), and
  * the final eval return matches an uninterrupted run's ballpark.

This is the failure-recovery contract (SURVEY.md §5.3/§5.4) exercised at
the scale the framework actually targets, not at toy sizes.

Run: ``python scripts/r4/soak_resume.py`` (TPU, ~2 min). Prints one JSON line.
"""
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_solver(logdir, max_steps, num_envs, train_freq):
    from deepqlearning_tpu import (
        Chain, DeepQLearningSolver, Dense, EpsGreedyPolicy, Flatten,
        LinearDecaySchedule, SimpleGridWorld,
    )

    env = SimpleGridWorld()
    return env, DeepQLearningSolver(
        qnetwork=Chain(Flatten(), Dense(2, 64, jnp.tanh),
                       Dense(64, 64, jnp.tanh), Dense(64, env.num_actions)),
        num_envs=num_envs, batch_size=512, buffer_size=1 << 18,
        train_freq=train_freq, max_steps=max_steps,
        learning_rate=5e-3, max_episode_length=100,
        double_q=True, dueling=True, prioritized_replay=True,
        target_update_freq=train_freq * 128,
        eval_freq=max_steps // 4, num_ep_eval=256,
        log_freq=max_steps // 4, save_freq=max_steps // 2,
        logdir=logdir, verbose=False, seed=3,
        exploration_policy=EpsGreedyPolicy(
            LinearDecaySchedule(1.0, 0.01, max_steps)),
    )


def main():
    num_envs, train_freq = 32768, 4096
    half = 1000 * train_freq  # 1000 updates per half
    logdir = tempfile.mkdtemp(prefix="soak_")
    try:
        env, s1 = make_solver(logdir, half, num_envs, train_freq)
        s1.solve(env)
        evals1 = [(int(t), round(float(r), 3)) for t, r in s1.metrics["eval"]]

        # fresh solver = fresh process state; resume from the saved carry
        env, s2 = make_solver(logdir, half, num_envs, train_freq)
        s2.solve(env, resume=True)
        evals2 = [(int(t), round(float(r), 3)) for t, r in s2.metrics["eval"]]

        first_resumed_eval = evals2[0][1]
        out = {
            "metric": "soak_resume",
            "config": f"{num_envs} envs, U={num_envs // train_freq}, "
                      f"{half} env steps per half",
            "first_half_evals": evals1,
            "resumed_evals": evals2,
            "resume_warm": first_resumed_eval >= 1.0,
            "final_eval_return": evals2[-1][1],
        }
        print(json.dumps(out))
        assert out["resume_warm"], "resumed run started cold"
        assert out["final_eval_return"] >= 1.0
    finally:
        shutil.rmtree(logdir, ignore_errors=True)


if __name__ == "__main__":
    main()
