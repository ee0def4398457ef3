"""Best-model checkpointing.

Parity with the reference checkpoint story (``src/solver.jl:290-318``):
save the Q-network parameters whenever an eval score beats the best so far
(``save_model``), auto-restore the best weights at the end of training
(``src/solver.jl:170-176``), and offline ``restore_best_model`` that rebuilds
the policy and loads weights. The serialized artifact is a msgpack dump of
the parameter pytree (flax.serialization) — the BSON analog.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
from flax import serialization

CKPT_NAME = "qnetwork.msgpack"


def save_params(logdir: str, params) -> str:
    os.makedirs(logdir, exist_ok=True)
    path = os.path.join(logdir, CKPT_NAME)
    params = jax.device_get(params)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))
    return path


def load_params(logdir: str, params_template):
    path = os.path.join(logdir, CKPT_NAME)
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(jax.device_get(params_template), data)


TRAIN_STATE_NAME = "train_state.msgpack"


def save_train_state(logdir: str, carry) -> str:
    """Full resume checkpoint (params + target + opt state + actor counters).

    Extension over the reference, which saves best-model params only and
    cannot resume training (SURVEY.md §5.4).
    """
    os.makedirs(logdir, exist_ok=True)
    path = os.path.join(logdir, TRAIN_STATE_NAME)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(carry)))
    return path


def load_train_state(logdir: str, carry_template):
    path = os.path.join(logdir, TRAIN_STATE_NAME)
    with open(path, "rb") as f:
        return serialization.from_bytes(jax.device_get(carry_template), f.read())


def save_model(logdir: Optional[str], params, scores_eval: float,
               saved_mean_reward: float, model_saved: bool,
               verbose: bool) -> Tuple[bool, float]:
    """Save iff the eval score beats (or ties) the best so far
    (``save_model``, ``src/solver.jl:290-300``)."""
    if scores_eval >= saved_mean_reward:
        if logdir is not None:
            save_params(logdir, params)
        if verbose:
            print(f"Saving new model with eval reward {scores_eval:1.3f}")
        return True, scores_eval
    return model_saved, saved_mean_reward
