"""Recurrent DRQN on the Tiger POMDP — LSTM Q-network + episode replay.

The agent must listen (partial observability) before opening a door; an LSTM
carries belief across steps (reference test: ``test/runtests.jl:149-163``).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from deepqlearning_tpu import (
    Chain,
    DeepQLearningSolver,
    Dense,
    EpsGreedyPolicy,
    Flatten,
    LinearDecaySchedule,
    LSTM,
    TigerPOMDP,
)

pomdp = TigerPOMDP()
model = Chain(Flatten(), LSTM(1, 8), Dense(8, pomdp.num_actions))
solver = DeepQLearningSolver(
    qnetwork=model, max_steps=10000, learning_rate=1e-3,
    recurrence=True, trace_length=10, double_q=True, dueling=True,
    prioritized_replay=False, target_update_freq=1000, log_freq=500,
    exploration_policy=EpsGreedyPolicy(LinearDecaySchedule(1.0, 0.01, 5000)),
)
policy = solver.solve(pomdp)

policy.reset_state()
print("Q after no observation:", policy.actionvalues(jnp.zeros(1)))
