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


def _convert_opt_state(raw_opt, tmpl_opt, params):
    """Convert a serialized Adam state between the two layouts in use.

    The non-fused path stores ``optax.flatten(optax.adam(...))`` state (one
    raveled mu/nu vector, serialized as ``{'0': {count, mu, nu}, '1': {}}``);
    the fused Pallas path stores ``FusedAdamState`` (params-shaped m/v trees
    + count). The underlying moments are mathematically identical —
    ``optax.flatten`` ravels with ``jax.flatten_util.ravel_pytree`` — so a
    checkpoint written by either layout resumes under the other.
    """
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    keys = set(raw_opt.keys())
    tmpl_is_fused = hasattr(tmpl_opt, "m") and hasattr(tmpl_opt, "v")
    if {"m", "v", "count"} <= keys and not tmpl_is_fused:
        # FusedAdamState -> optax.flatten(adam)
        m = serialization.from_state_dict(params, raw_opt["m"])
        v = serialization.from_state_dict(params, raw_opt["v"])
        mu, _ = ravel_pytree(m)
        nu, _ = ravel_pytree(v)
        inner = tmpl_opt[0]._replace(
            count=jnp.asarray(raw_opt["count"], tmpl_opt[0].count.dtype),
            mu=mu.astype(tmpl_opt[0].mu.dtype),
            nu=nu.astype(tmpl_opt[0].nu.dtype),
        )
        return (inner,) + tuple(tmpl_opt[1:])
    if tmpl_is_fused and "0" in keys:
        # optax.flatten(adam) -> FusedAdamState
        inner = raw_opt["0"]
        _, unravel = ravel_pytree(params)
        return tmpl_opt._replace(
            m=unravel(jnp.asarray(inner["mu"])),
            v=unravel(jnp.asarray(inner["nu"])),
            count=jnp.asarray(inner["count"], jnp.int32),
        )
    raise ValueError(
        f"cannot convert serialized opt state with keys {sorted(keys)} to "
        f"{type(tmpl_opt).__name__}"
    )


def load_train_state(logdir: str, carry_template):
    """Restore a full training state, converting the Adam-state layout if the
    checkpoint was written by the other train-step path (fused vs XLA)."""
    path = os.path.join(logdir, TRAIN_STATE_NAME)
    with open(path, "rb") as f:
        data = f.read()
    template = jax.device_get(carry_template)
    try:
        return serialization.from_bytes(template, data)
    except (ValueError, KeyError, TypeError):
        raw = serialization.msgpack_restore(data)
        fields = template._asdict()
        out = {}
        for k, v in fields.items():
            if k != "opt_state":
                out[k] = serialization.from_state_dict(v, raw[k], name=k)
        out["opt_state"] = _convert_opt_state(
            raw["opt_state"], fields["opt_state"], out["params"]
        )
        return template._replace(**out)


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
