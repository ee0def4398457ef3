"""Feature-bisect the fused_update Mosaic crash: build the kernel up in
stages (fwd+loss -> +bwd -> +adam -> +dueling -> +double_q) and compile each
on the real TPU. Remote compile failures surface as JaxRuntimeError, so all
stages run in one process.

Usage: python scripts/r2/fu_bisect.py [stage...]
"""
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepqlearning_tpu.models.chain import Chain, Dense, Flatten
from deepqlearning_tpu.models.dueling import create_dueling_network
from deepqlearning_tpu.ops.pallas.fused_update import (
    _act_grad,
    _apply_act,
    _pack,
    plan_for,
)

U, B, A, D = 8, 512, 4, 2
Bp = 512


def build(dueling: bool, double_q: bool, do_bwd: bool, do_adam: bool,
          u_grid: int):
    if dueling:
        net = create_dueling_network(Chain((
            Flatten(), Dense(2, 64, jnp.tanh), Dense(64, 64, jnp.tanh),
            Dense(64, 4, None))))
    else:
        net = Chain((Flatten(), Dense(2, 64, jnp.tanh),
                     Dense(64, 64, jnp.tanh), Dense(64, 4, None)))
    plan = plan_for(net)
    assert plan is not None
    key = jax.random.PRNGKey(0)
    params = net.init(key)
    p_list = _pack(net, params, plan)
    m_list = [jnp.zeros_like(t) for t in p_list]
    v_list = [jnp.zeros_like(t) for t in p_list]

    layers = plan.val + plan.adv
    n_val = len(plan.val)
    nt = 2 * len(layers)
    Ap = plan.num_actions_p
    D0p = plan.in_dim_p
    B2p = 2 * Bp if double_q else Bp
    gamma, lr, alpha, eps = 0.99, 1e-3, 0.6, 1e-6
    b1, b2, adam_eps, inv_b = 0.9, 0.999, 1e-8, 1.0 / B

    def kernel(*refs):
        it = iter(refs)
        count_ref = next(it)
        obs_ref, act_ref, rew_ref, done_ref, w_ref, qsp_ref = (
            next(it), next(it), next(it), next(it), next(it), next(it))
        p_in = [next(it) for _ in range(nt)]
        m_in = [next(it) for _ in range(nt)]
        v_in = [next(it) for _ in range(nt)]
        p_out = [next(it) for _ in range(nt)]
        m_out = [next(it) for _ in range(nt)]
        v_out = [next(it) for _ in range(nt)]
        td_ref, prio_ref, loss_ref, gnorm_ref = (
            next(it), next(it), next(it), next(it))
        p_s = [next(it) for _ in range(nt)]
        m_s = [next(it) for _ in range(nt)]
        v_s = [next(it) for _ in range(nt)]

        u = pl.program_id(0)

        @pl.when(u == 0)
        def _():
            for s, i in zip(p_s + m_s + v_s, p_in + m_in + v_in):
                s[:] = i[:]

        x = obs_ref[:]

        def fwd(chain_layers, off):
            hs = [x]
            for i, lp in enumerate(chain_layers):
                w = p_s[2 * (off + i)][:]
                b = p_s[2 * (off + i) + 1][:]
                z = jnp.dot(hs[-1], w,
                            preferred_element_type=jnp.float32) + b
                hs.append(_apply_act(z, lp.act))
            return hs

        adv_hs = fwd(plan.adv, n_val)
        a_out = adv_hs[-1]
        cols = jax.lax.broadcasted_iota(jnp.int32, a_out.shape, 1)
        amask = cols < A
        if dueling:
            val_hs = fwd(plan.val, 0)
            v_col = val_hs[-1][:, 0:1]
            a_real = jnp.where(amask, a_out, 0.0)
            mean_a = jnp.sum(a_real, axis=1, keepdims=True) * (1.0 / A)
            q_all = v_col + a_out - mean_a
        else:
            q_all = a_out

        q_s = q_all[:Bp]
        cols_b = cols[:Bp]
        q_sp_tgt = qsp_ref[:]
        if double_q:
            q_sp_onl = jnp.where(amask[Bp:], q_all[Bp:], -1e30)
            best = jnp.argmax(q_sp_onl, axis=-1, keepdims=True)
            q_sp_max = jnp.sum(
                jnp.where(cols_b == best, q_sp_tgt, 0.0), axis=-1)
        else:
            q_sp_max = jnp.max(q_sp_tgt, axis=-1)

        r, d, w_is = rew_ref[0, :], done_ref[0, :], w_ref[0, :]
        q_target = r + (1.0 - d) * gamma * q_sp_max
        a_idx = act_ref[0, :]
        sel = cols_b == a_idx[:, None]
        q_sa = jnp.sum(jnp.where(sel, q_s, 0.0), axis=-1)
        td = q_sa - q_target
        xw = w_is * td
        absx = jnp.abs(xw)
        quad = jnp.minimum(absx, 1.0)
        loss_ref[0, 0] = jnp.sum(0.5 * quad * quad + (absx - quad)) * inv_b
        td_ref[0, :] = td
        prio_ref[0, :] = (jnp.abs(td) + eps) ** alpha

        if do_bwd:
            g_sa = w_is * jnp.clip(xw, -1.0, 1.0) * inv_b
            g_q = jnp.where(sel, g_sa[:, None], 0.0)

            def bwd(chain_layers, off, hs, g_out):
                grads = [None] * (2 * len(chain_layers))
                dh = g_out
                for i in reversed(range(len(chain_layers))):
                    lp = chain_layers[i]
                    h_post = hs[i + 1][:Bp]
                    dz = dh * _act_grad(h_post, lp.act)
                    h_prev = hs[i][:Bp]
                    dw = jax.lax.dot_general(
                        h_prev, dz, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    db = jnp.sum(dz, axis=0, keepdims=True)
                    grads[2 * i] = dw
                    grads[2 * i + 1] = db
                    if i > 0:
                        w = p_s[2 * (off + i)][:]
                        dh = jax.lax.dot_general(
                            dz, w, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                return grads

            if dueling:
                sum_g = jnp.sum(g_q, axis=-1, keepdims=True)
                g_adv = jnp.where(amask[:Bp], g_q - sum_g * (1.0 / A), 0.0)
                g_val = jnp.where(cols_b == 0, sum_g, 0.0)
                grads = bwd(plan.val, 0, val_hs, g_val) + bwd(
                    plan.adv, n_val, adv_hs, g_adv)
            else:
                grads = bwd(plan.adv, 0, adv_hs, g_q)

            gn = jnp.float32(0.0)
            for g in grads:
                gn = jnp.maximum(gn, jnp.max(jnp.abs(g)))
            gnorm_ref[0, 0] = gn

            if do_adam:
                import math
                ln_b1, ln_b2 = math.log(b1), math.log(b2)
                t = (count_ref[0, 0] + u + 1).astype(jnp.float32)
                c1 = 1.0 / (1.0 - jnp.exp(t * ln_b1))
                c2 = 1.0 / (1.0 - jnp.exp(t * ln_b2))
                for k, g in enumerate(grads):
                    m = b1 * m_s[k][:] + (1.0 - b1) * g
                    v = b2 * v_s[k][:] + (1.0 - b2) * (g * g)
                    m_s[k][:] = m
                    v_s[k][:] = v
                    p_s[k][:] = p_s[k][:] - lr * (m * c1) / (
                        jnp.sqrt(v * c2) + adam_eps)
        else:
            gnorm_ref[0, 0] = jnp.float32(0.0)

        @pl.when(u == u_grid - 1)
        def _():
            for o, s in zip(p_out + m_out + v_out, p_s + m_s + v_s):
                o[:] = s[:]

    full = lambda shape: pl.BlockSpec(
        shape, lambda u: (0,) * len(shape), memory_space=pltpu.VMEM)
    per_u2 = lambda n: pl.BlockSpec(
        (None, 1, n), lambda u: (u, 0, 0), memory_space=pltpu.VMEM)
    per_u3 = lambda r, c: pl.BlockSpec(
        (None, r, c), lambda u: (u, 0, 0), memory_space=pltpu.VMEM)
    smem11 = pl.BlockSpec((1, 1), lambda u: (0, 0), memory_space=pltpu.SMEM)

    tensor_specs = [full(t.shape) for t in p_list]
    in_specs = (
        [smem11, per_u3(B2p, D0p), per_u2(Bp), per_u2(Bp), per_u2(Bp),
         per_u2(Bp), per_u3(Bp, Ap)]
        + tensor_specs * 3)
    out_specs = tensor_specs * 3 + [per_u2(Bp), per_u2(Bp), smem11, smem11]
    out_shape = (
        [jax.ShapeDtypeStruct(t.shape, jnp.float32) for t in p_list] * 3
        + [jax.ShapeDtypeStruct((u_grid, 1, Bp), jnp.float32),
           jax.ShapeDtypeStruct((u_grid, 1, Bp), jnp.float32),
           jax.ShapeDtypeStruct((1, 1), jnp.float32),
           jax.ShapeDtypeStruct((1, 1), jnp.float32)])
    scratch = [pltpu.VMEM(t.shape, jnp.float32) for t in p_list] * 3

    ks = jax.random.split(key, 8)
    obs_p = jax.random.normal(ks[0], (u_grid, B2p, D0p))
    pad1 = lambda k: jax.random.normal(k, (u_grid, 1, Bp))
    act_p = jax.random.randint(ks[1], (u_grid, 1, Bp), 0, A)
    rew_p, done_p, w_p = pad1(ks[2]), pad1(ks[3]) * 0, pad1(ks[4]) * 0 + 1
    qsp_p = jax.random.normal(ks[5], (u_grid, Bp, Ap))
    count2d = jnp.zeros((1, 1), jnp.int32)

    out = pl.pallas_call(
        kernel, grid=(u_grid,), in_specs=in_specs,
        out_specs=tuple(out_specs), out_shape=tuple(out_shape),
        scratch_shapes=scratch,
    )(count2d, obs_p, act_p, rew_p, done_p, w_p, qsp_p,
      *p_list, *m_list, *v_list)
    return float(out[3 * nt + 2][0, 0])


STAGES = {
    # name: (dueling, double_q, do_bwd, do_adam, u_grid)
    "fwd_loss": (False, False, False, False, 8),
    "bwd": (False, False, True, False, 8),
    "adam": (False, False, True, True, 8),
    "dueling": (True, False, True, True, 8),
    "doubleq_nodueling": (False, True, True, True, 8),
    "full": (True, True, True, True, 8),
    "full_u1": (True, True, True, True, 1),
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(STAGES)
    for n in names:
        try:
            r = build(*STAGES[n])
            print(f"PASS {n}: loss={r}", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:140]
            print(f"FAIL {n}: {type(e).__name__}: {msg}", flush=True)
