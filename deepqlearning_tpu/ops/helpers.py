"""Small numeric helpers.

Parity with the reference helper layer (``src/helpers.jl:1-85``), re-expressed
batch-first (JAX convention: leading axis is batch; the reference is
feature-major with trailing batch axis).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def flattenbatch(x: jnp.ndarray) -> jnp.ndarray:
    """Flatten all but the leading (batch) axis.

    Reference: ``flattenbatch`` (``src/helpers.jl:6-8``) flattens all but the
    *trailing* batch axis; we are batch-first, so we keep the *leading* axis.
    """
    return x.reshape((x.shape[0], -1))


def huber_loss(x: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Huber loss with delta=1.

    Exact math of reference ``huber_loss`` (``src/helpers.jl:14-19``):
    ``0.5*q^2 + (|x|-q)`` with ``q = min(|x|, 1)``.
    """
    abserror = jnp.abs(x)
    quadratic = jnp.minimum(abserror, 1.0)
    linear = abserror - quadratic
    return 0.5 * quadratic * quadratic + linear


def globalnorm(grads) -> jnp.ndarray:
    """Max absolute gradient entry across the whole pytree.

    Reference ``globalnorm`` (``src/helpers.jl:38-46``) is a misnomer: it
    returns the max-abs entry, not a norm. We reproduce that metric.
    """
    leaves = jax.tree_util.tree_leaves(grads)
    if not leaves:
        return jnp.asarray(0.0, jnp.float32)
    return jnp.max(jnp.stack([jnp.max(jnp.abs(g)) for g in leaves]))


def obs_dimensions(env) -> tuple:
    """Observation shape of an env (``obs_dimensions``, ``src/helpers.jl:81``)."""
    return tuple(env.obs_shape)


def default_discount(env) -> float:
    """Discount of an env: 1.0 for raw envs, the problem's discount for
    wrapped (PO)MDPs (``default_discount``, ``src/helpers.jl:83-85``)."""
    return float(getattr(env, "discount", 1.0))


def hiddenstates(net_state):
    """Recurrent-state leaves of an explicit network state tuple.

    Parity shim for ``hiddenstates`` (``src/helpers.jl:61-66``). In this
    framework recurrent state is *already explicit* — the caller carries it —
    so this simply filters the non-empty per-layer entries.
    """
    return [s for s in net_state if s != ()]


def sethiddenstates(net_state, hs):
    """Inverse of :func:`hiddenstates` (``src/helpers.jl:71-79``): rebuild a
    full per-layer state tuple from the recurrent entries."""
    it = iter(hs)
    return tuple(next(it) if s != () else () for s in net_state)


def batch_trajectories(x: jnp.ndarray, traj_length: int, batch_size: int) -> jnp.ndarray:
    """Convert ``[batch, traj, features...]`` into time-major ``[traj, batch, feat]``.

    Analog of reference ``batch_trajectories`` (``src/helpers.jl:53-55``) which
    builds per-timestep batches for a recurrent net.
    """
    assert x.shape[0] == batch_size and x.shape[1] == traj_length
    flat = x.reshape((batch_size, traj_length, -1))
    return jnp.swapaxes(flat, 0, 1)
