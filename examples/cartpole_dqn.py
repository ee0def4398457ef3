"""CartPole with 1024 lockstep envs — classic-control sanity run."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepqlearning_tpu import (
    CartPole, Chain, DeepQLearningSolver, Dense, EpsGreedyPolicy,
    LinearDecaySchedule,
)
import jax.numpy as jnp

env = CartPole()
model = Chain(Dense(4, 64, jnp.tanh), Dense(64, 64, jnp.tanh),
              Dense(64, env.num_actions))
solver = DeepQLearningSolver(
    qnetwork=model, max_steps=400_000, num_envs=256,
    # train_freq is measured in aggregate env steps: one batch-256 update
    # per 16 transitions keeps a reference-like data/update ratio
    train_freq=16,
    batch_size=256, buffer_size=1 << 16, learning_rate=1e-3,
    target_update_freq=2_000,
    eval_freq=100_000, log_freq=50_000, num_ep_eval=64,
    max_episode_length=200, double_q=True, dueling=True,
    prioritized_replay=True,
    exploration_policy=EpsGreedyPolicy(LinearDecaySchedule(1.0, 0.05, 150_000)),
)
policy = solver.solve(env)
print("eval curve:", solver.metrics["eval"])
