"""Fused TD-loss / priority Pallas kernel.

Fuses the math of the reference's ``batch_train!`` inner loop
(``src/solver.jl:209-233``): double-Q action selection, target-net gather,
Bellman target, IS-weighted Huber loss, and the new PER priorities — one VMEM
pass over the [B, A] Q-matrices instead of several XLA ops with HBM
round-trips. A custom VJP backpropagates only into ``q_s`` (targets are
stop-gradient, matching the reference's outside-the-tape target computation).

Shapes are padded to the (8, 128) f32 tile. On non-TPU backends the caller
should use the pure-jnp path (``learner/train_step.py``); the kernel also
runs under ``interpret=True`` for tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(q_s_ref, q_sp_onl_ref, q_sp_tgt_ref, action_ref, reward_ref,
                done_ref, weights_ref, scalars_ref,
                loss_ref, td_ref, prio_ref, grad_ref):
    gamma = scalars_ref[0]
    alpha = scalars_ref[1]
    eps = scalars_ref[2]
    double_q = scalars_ref[3]
    inv_b = scalars_ref[4]

    q_s = q_s_ref[:]          # [B, A]
    q_sp_onl = q_sp_onl_ref[:]
    q_sp_tgt = q_sp_tgt_ref[:]
    B, A = q_s.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, A), 1)

    # double-Q: argmax online, gather target; else plain max (src/solver.jl:209-215)
    best = jnp.argmax(q_sp_onl, axis=-1, keepdims=True)      # [B, 1]
    gathered = jnp.sum(
        jnp.where(cols == best, q_sp_tgt, 0.0), axis=-1
    )
    plain_max = jnp.max(q_sp_tgt, axis=-1)
    q_sp_max = jnp.where(double_q > 0.5, gathered, plain_max)  # [B]

    r = reward_ref[:]
    d = done_ref[:]
    w = weights_ref[:]
    q_target = r + (1.0 - d) * gamma * q_sp_max

    a = action_ref[:]
    q_sa = jnp.sum(jnp.where(cols == a[:, None], q_s, 0.0), axis=-1)
    td = q_sa - q_target
    x = w * td
    absx = jnp.abs(x)
    quad = jnp.minimum(absx, 1.0)
    huber = 0.5 * quad * quad + (absx - quad)
    loss_ref[0, 0] = jnp.sum(huber) * inv_b
    td_ref[:] = td
    prio_ref[:] = (jnp.abs(td) + eps) ** alpha
    # d huber(w*td) / d q_sa = w * clip(w*td, -1, 1); loss scaled by 1/B
    dq_sa = w * jnp.clip(x, -1.0, 1.0) * inv_b
    grad_ref[:] = jnp.where(cols == a[:, None], dq_sa[:, None], 0.0)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def td_loss_fused(q_s, q_sp_online, q_sp_target, action, reward, done, weights,
                  gamma, alpha, eps, double_q, interpret=False):
    """NOTE: inputs must be f32 — the custom VJP returns f32 cotangents, so
    low-precision callers cast at THEIR boundary (train_step does), keeping
    this function's primal/cotangent dtypes consistent."""
    loss, td, prio, _ = _call(q_s, q_sp_online, q_sp_target, action, reward,
                              done, weights, gamma, alpha, eps, double_q,
                              interpret)
    return loss, td, prio


def _call(q_s, q_sp_online, q_sp_target, action, reward, done, weights,
          gamma, alpha, eps, double_q, interpret):
    B, A = q_s.shape
    Bp, Ap = _round_up(B, 8), _round_up(A, 128)

    def pad2(x, fill=0.0):
        return jnp.pad(x, ((0, Bp - B), (0, Ap - A)), constant_values=fill)

    def pad1(x, fill=0.0):
        return jnp.pad(x, (0, Bp - B), constant_values=fill)

    scalars = jnp.asarray(
        [gamma, alpha, eps, 1.0 if double_q else 0.0, 1.0 / B], jnp.float32
    )
    # pad Q matrices with -inf so argmax/max ignore the padding columns;
    # pad rows with weights 0 so they contribute no loss
    neg = jnp.float32(-1e30)
    out = pl.pallas_call(
        _fwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),   # loss
            jax.ShapeDtypeStruct((Bp,), jnp.float32),    # td
            jax.ShapeDtypeStruct((Bp,), jnp.float32),    # prio
            jax.ShapeDtypeStruct((Bp, Ap), jnp.float32),  # dL/dq_s
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        pad2(q_s), pad2(q_sp_online, neg), pad2(q_sp_target, neg),
        pad1(action, -1).astype(jnp.int32), pad1(reward), pad1(done, 1.0),
        pad1(weights), scalars,
    )
    loss, td, prio, grad = out
    return loss[0, 0], td[:B], prio[:B], grad[:B, :A]


def _fwd(q_s, q_sp_online, q_sp_target, action, reward, done, weights,
         gamma, alpha, eps, double_q, interpret):
    loss, td, prio, grad = _call(q_s, q_sp_online, q_sp_target, action, reward,
                                 done, weights, gamma, alpha, eps, double_q,
                                 interpret)
    return (loss, td, prio), grad


def _bwd(gamma, alpha, eps, double_q, interpret, grad_res, cotangents):
    g_loss, _, _ = cotangents
    dq_s = grad_res * g_loss
    return (dq_s, None, None, None, None, None, None)


td_loss_fused.defvjp(_fwd, _bwd)
