"""Whole-collect-phase fused Pallas kernel: act → step → bookkeeping in ONE launch.

The collect phase is the reference's hot loop (``src/solver.jl:82-99``:
ε-greedy act → env step → experience append → episode bookkeeping). The XLA
lockstep translation (``learner/actor.py``) is a chain of ~40 small kernels;
at the 131072-env headline it costs 314 µs of the 938 µs iteration — actor
forward 75 µs, exploration RNG 40 µs, env step + insert + bookkeeping ~195 µs
(phase profile, ``scripts/profile_bench.py``), almost all launch overhead and
HBM round-trips of [E]-shaped intermediates.

This kernel runs the whole step for a block of envs entirely in VMEM:

  * dueling/plain MLP forward (the same ``FusedPlan`` family as
    ``fused_update.py``) in a feature-major layout — activations [feat, Eb]
    with features on sublanes (8-granular padding, not 128) so the tiny
    actor matmuls don't pay 128x128 padding waste;
  * ε-greedy action selection with in-kernel TPU PRNG
    (``pltpu.prng_random_bits``) — uniform over all actions with prob ε,
    matching POMDPTools' EpsGreedyPolicy (docs/DEVIATIONS.md item 10);
  * the env's own dynamics via the *cols protocol* (``envs/gridworld.py``
    ``step_cols``/``reset_cols``): pure elementwise jnp over [k, N] blocks,
    randomness passed in as uniforms — the same function traces inside the
    kernel and in plain XLA, which is what the equivalence tests exploit;
  * episode bookkeeping + auto-reset (truncation, return/length
    accumulation, per-block partial sums for the logging rings).

Replay insert and the sum-tree priority update stay in XLA (they are cheap:
the contiguous row write measures ~21 µs; the [8, E] → [E, 8] field
restack ~7 µs).

RNG note: the kernel's TPU PRNG stream differs from the XLA path's threefry
stream — per-draw actions/spawns differ, distributions are identical
(exploration and env stochasticity only). ``host_uniforms=True`` (forced in
interpret mode) moves uniform generation to XLA so a run is bit-reproducible
against the pure-jnp reference composition — the basis of
``tests/test_fused_collect.py``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.chain import GRU, LSTM, Chain, Dense, Flatten
from ...models.dueling import DuelingNetwork
from .fused_update import (
    FusedPlan, _apply_act, _chain_layers, _dense_params, plan_for,
)

_INV24 = float(2.0 ** -24)


def _r8(x: int) -> int:
    return (x + 7) // 8 * 8


@dataclasses.dataclass(frozen=True)
class _CellPlan:
    """Leading recurrent cell of a DRQN net (reference DRQN family,
    ``test/runtests.jl:117``): one LSTM/GRU step runs in-kernel, state rides
    feature-major as ``srows`` extra f32 rows (h / h;c stacked)."""
    kind: str          # 'lstm' | 'gru'
    in_dim: int
    in8: int
    hidden: int
    gates: int         # 4H (lstm) / 3H (gru)
    srows: int         # carried state rows: 2H (lstm) / H (gru)
    layer_idx: int     # position of the cell in its owning chain's state


@dataclasses.dataclass(frozen=True)
class CollectPlan:
    net: FusedPlan     # the dense head (input = obs, or h for recurrent)
    cell: Optional[_CellPlan]
    no: int            # flat obs dim
    no8: int
    W: int             # env lane-state width
    W8: int
    ns: int            # step uniforms
    nr: int            # reset uniforms
    nu8: int           # padded uniform rows (2 + ns + nr, 8-rounded)
    nf: int            # replay field rows: 2*no + 4 (a, r, done, ended)
    nf8: int

    @property
    def n_cell_tensors(self) -> int:
        return 3 if self.cell is not None else 0


def _cell_plan(layer, idx) -> Optional[_CellPlan]:
    if isinstance(layer, LSTM):
        kind, g, s = "lstm", 4 * layer.hidden, 2 * layer.hidden
    elif isinstance(layer, GRU):
        kind, g, s = "gru", 3 * layer.hidden, layer.hidden
    else:
        return None
    # gate/state row slices land on sublane boundaries only for 8-mult H
    if layer.hidden % 8 != 0 or layer.hidden > 128:
        return None
    return _CellPlan(kind=kind, in_dim=layer.in_dim, in8=_r8(layer.in_dim),
                     hidden=layer.hidden, gates=g, srows=s, layer_idx=idx)


def _recurrent_plan(network) -> Optional[tuple]:
    """(head FusedPlan, _CellPlan) for a [Flatten*] + LSTM/GRU + Dense* chain
    or a DuelingNetwork whose base is such a cell, else None."""
    if isinstance(network, DuelingNetwork):
        idx = 0
        layers = list(network.base.layers)
        while layers and isinstance(layers[0], Flatten):
            layers = layers[1:]
            idx += 1
        if len(layers) != 1:
            return None
        cp = _cell_plan(layers[0], idx)
        if cp is None:
            return None
        val = _chain_layers(network.val)
        adv = _chain_layers(network.adv)
        if not val or not adv or val[0].din != cp.hidden \
                or adv[0].din != cp.hidden or val[-1].dout != 1:
            return None
        head = FusedPlan(dueling=True, in_dim=cp.hidden,
                         in_dim_p=_r8(cp.hidden),
                         num_actions=adv[-1].dout,
                         num_actions_p=_r8(adv[-1].dout), val=val, adv=adv)
        return head, cp
    if isinstance(network, Chain):
        idx = 0
        layers = list(network.layers)
        while layers and isinstance(layers[0], Flatten):
            layers = layers[1:]
            idx += 1
        if not layers:
            return None
        cp = _cell_plan(layers[0], idx)
        if cp is None:
            return None
        adv = _chain_layers(Chain(tuple(layers[1:])))
        if not adv or adv[0].din != cp.hidden:
            return None
        head = FusedPlan(dueling=False, in_dim=cp.hidden,
                         in_dim_p=_r8(cp.hidden),
                         num_actions=adv[-1].dout,
                         num_actions_p=_r8(adv[-1].dout), val=(), adv=adv)
        return head, cp
    return None


def collect_plan_for(env, network, buffer) -> Optional[CollectPlan]:
    """Static gate: env must speak the cols protocol, the network must be a
    kernel-supported net — a (dueling) Dense stack on the flat obs, or an
    LSTM/GRU cell followed by such a stack — and the replay row must store
    f32 (the kernel emits f32 fields)."""
    cell = None
    if getattr(network, "recurrent", False):
        rp = _recurrent_plan(network)
        if rp is None:
            return None
        net, cell = rp
    else:
        net = plan_for(network)
        if net is None:
            return None
    for attr in ("state_to_cols", "cols_to_state", "step_cols", "reset_cols",
                 "lane_state_width", "n_uniform_step", "n_uniform_reset"):
        if not hasattr(env, attr):
            return None
    no = 1
    for s in env.obs_shape:
        no *= int(s)
    in_dim = cell.in_dim if cell is not None else net.in_dim
    if in_dim != no:
        return None
    if buffer is not None and getattr(buffer, "obs_dtype", None) != \
            jnp.dtype(jnp.float32):
        return None
    W = int(env.lane_state_width)
    ns, nr = int(env.n_uniform_step), int(env.n_uniform_reset)
    if no > 64 or W > 32 or (2 + ns + nr) > 32:
        return None
    nf = 2 * no + 4
    return CollectPlan(
        net=net, cell=cell, no=no, no8=_r8(no), W=W, W8=_r8(W), ns=ns, nr=nr,
        nu8=_r8(2 + ns + nr), nf=nf, nf8=_r8(nf),
    )


def _pack8(network, params, plan: CollectPlan):
    """Params -> feature-major padded tensors.

    Cell first (if any): ``wi [in8, gates]``, ``wh [H, gates]``,
    ``b [gates, 1]``; then per head Dense layer ``w [din8, dout8]``,
    ``b [dout8, 1]``. 8-granular (sublane) padding — the 128-lane padding of
    ``fused_update._pack`` would make these tiny matmuls ~10x wasteful in a
    feature-major kernel (dims 64/4 padded to 128 on both axes).
    """
    packed = []
    cp = plan.cell
    if cp is not None:
        cparams = (params["base"][cp.layer_idx]
                   if isinstance(network, DuelingNetwork)
                   else params[cp.layer_idx])
        packed.append(jnp.pad(cparams["wi"].astype(jnp.float32),
                              ((0, cp.in8 - cp.in_dim), (0, 0))))
        packed.append(cparams["wh"].astype(jnp.float32))
        packed.append(cparams["b"].astype(jnp.float32).reshape(cp.gates, 1))
    for (w, b), lp in zip(_dense_params(network, params, plan.net),
                          plan.net.val + plan.net.adv):
        di8, do8 = _r8(lp.din), _r8(lp.dout)
        packed.append(jnp.pad(
            w.astype(jnp.float32), ((0, di8 - lp.din), (0, do8 - lp.dout))))
        packed.append(jnp.pad(
            b.astype(jnp.float32), (0, do8 - lp.dout)).reshape(do8, 1))
    return packed


def _cell_cols(cp: _CellPlan, p_get, x, state):
    """One recurrent cell step, feature-major: ``x [in8, N]``,
    ``state [srows, N]`` -> ``(h [H, N], new_state [srows, N])``.

    Math parity with ``models/chain.py`` LSTM._cell / GRU._cell (explicit
    f32 gates; state rows are h (and c for LSTM) stacked).
    """
    wi, wh, b = p_get(0), p_get(1), p_get(2)
    H = cp.hidden
    ct = lambda a, b_: jax.lax.dot_general(
        a, b_, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    xi = ct(wi, x)                                   # [gates, N]
    if cp.kind == "lstm":
        h, c = state[:H, :], state[H: 2 * H, :]
        g = xi + ct(wh, h) + b
        i = jax.nn.sigmoid(g[0:H, :])
        f = jax.nn.sigmoid(g[H: 2 * H, :])
        gg = jnp.tanh(g[2 * H: 3 * H, :])
        o = jax.nn.sigmoid(g[3 * H: 4 * H, :])
        new_c = f * c + i * gg
        new_h = o * jnp.tanh(new_c)
        return new_h, jnp.concatenate([new_h, new_c], axis=0)
    h = state[:H, :]
    hh = ct(wh, h)
    r = jax.nn.sigmoid(xi[0:H, :] + hh[0:H, :] + b[0:H, :])
    z = jax.nn.sigmoid(xi[H: 2 * H, :] + hh[H: 2 * H, :] + b[H: 2 * H, :])
    n = jnp.tanh(xi[2 * H:, :] + r * hh[2 * H:, :] + b[2 * H:, :])
    new_h = (1.0 - z) * n + z * h
    return new_h, new_h


def _forward_cols(plan: CollectPlan, p_get, x):
    """Feature-major Q: ``x [no8, Eb]`` (pad rows zero) -> ``q [A8, Eb]``.

    Same math as ``DuelingNetwork.apply`` / ``Chain.apply`` (and therefore
    as ``fused_update._fwd_bwd``'s forward), transposed: each layer is
    ``z[dout, e] = sum_din w[din, dout] x[din, e] + b[dout]`` — padded w
    rows/cols are zero so padded x rows contribute nothing.
    """
    net = plan.net
    n_val = len(net.val)

    def fwd(h, chain_layers, off):
        for i, lp in enumerate(chain_layers):
            w = p_get(2 * (off + i))          # [din8, dout8]
            b = p_get(2 * (off + i) + 1)      # [dout8, 1]
            z = jax.lax.dot_general(
                w, h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b
            h = _apply_act(z, lp.act)
        return h

    A = net.num_actions
    a_out = fwd(x, net.adv, n_val)            # [A8, Eb]
    rows = jax.lax.broadcasted_iota(jnp.int32, a_out.shape, 0)
    amask = rows < A
    if net.dueling:
        v = fwd(x, net.val, 0)                # [V8, Eb], row 0 = V(s)
        a_real = jnp.where(amask, a_out, 0.0)
        mean_a = jnp.sum(a_real, axis=0, keepdims=True) * (1.0 / A)
        q = v[0:1, :] + a_out - mean_a
    else:
        q = a_out
    return q, rows, amask


def _collect_block(plan: CollectPlan, env, max_episode_length: int,
                   p_get, eps, u, obs, cols, ep_step, ep_ret, nstate=None):
    """The whole collect step for one feature-major block — pure jnp, traced
    both inside the kernel and (by the tests) in plain XLA.

    Inputs: ``u [nu8, Eb]`` uniforms, ``obs [no8, Eb]``, ``cols [W8, Eb]``,
    ``ep_step/ep_ret [1, Eb]``, and for recurrent plans ``nstate
    [srows, Eb]`` (the cell's h / h;c rows). Returns the block's outputs as
    a dict (with ``nstate_new`` when recurrent — reset where ended, parity
    with the XLA path's net-state zeroing on episode end).
    """
    no, W, ns, nr = plan.no, plan.W, plan.ns, plan.nr
    A = plan.net.num_actions

    if plan.cell is not None:
        h, nstate_stepped = _cell_cols(plan.cell, p_get, obs[: plan.cell.in8],
                                       nstate)
        head_in = h
    else:
        nstate_stepped = None
        head_in = obs
    head_get = lambda k: p_get(plan.n_cell_tensors + k)
    q, rows, amask = _forward_cols(plan, head_get, head_in)
    qm = jnp.where(amask, q, -1e30)
    maxq = jnp.max(qm, axis=0, keepdims=True)
    # first-max argmax over the action rows (jnp.argmax tie rule)
    big = jnp.int32(plan.net.num_actions_p + 8)
    greedy = jnp.min(
        jnp.where((qm == maxq) & amask, rows, big), axis=0, keepdims=True
    ).astype(jnp.float32)                                   # [1, Eb]
    rand_a = jnp.floor(u[1:2] * float(A))
    action = jnp.where(u[0:1] < eps, rand_a, greedy)        # [1, Eb] f32

    new_cols, nobs, rew, done = env.step_cols(
        cols[:W, :], action, u[2: 2 + ns, :]
    )
    ep1 = ep_step + 1.0
    truncate = (ep1 >= float(max_episode_length)).astype(jnp.float32)
    ended = jnp.maximum(done, truncate)                     # [1, Eb]
    ret1 = ep_ret + rew

    r_cols, r_obs = env.reset_cols(u[2 + ns: 2 + ns + nr, :])
    obs_new = jnp.where(ended > 0.5, r_obs, nobs)           # [no, Eb]
    cols_new = jnp.where(ended > 0.5, r_cols, new_cols)     # [W, Eb]

    fields = jnp.concatenate(
        [obs[:no, :], nobs, action, rew, done, ended], axis=0
    )                                                       # [nf, Eb]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    partial = (
        jnp.where(lanes == 0, jnp.sum(ret1 * ended), 0.0)
        + jnp.where(lanes == 1, jnp.sum(ep1 * ended), 0.0)
        + jnp.where(lanes == 2, jnp.sum(ended), 0.0)
    )                                                       # [1, 128]
    out = dict(
        fields=fields,
        obs_new=obs_new,
        cols_new=cols_new,
        ep_step_new=jnp.where(ended > 0.5, 0.0, ep1),
        ep_ret_new=jnp.where(ended > 0.5, 0.0, ret1),
        partial=partial,
    )
    if nstate_stepped is not None:
        # recurrent-state reset on episode end (resetstate! parity,
        # src/solver.jl:128 / learner/actor.py net_state zeroing)
        out["nstate_new"] = jnp.where(ended > 0.5, 0.0, nstate_stepped)
    return out


def _make_kernel(plan: CollectPlan, env, max_episode_length: int, nt: int,
                 host_uniforms: bool):
    no8, W8, nu8, nf8 = plan.no8, plan.W8, plan.nu8, plan.nf8

    def kernel(*refs):
        it = iter(refs)
        seed_ref = next(it)                    # (1, 2) i32 SMEM
        eps_ref = next(it)                     # (1, 1) f32 SMEM
        u_ref = next(it) if host_uniforms else None
        obs_ref, cols_ref, eps_step_ref, ep_ret_ref = (
            next(it), next(it), next(it), next(it)
        )
        nstate_ref = next(it) if plan.cell is not None else None
        p_refs = [next(it) for _ in range(nt)]
        (fields_ref, obs_out, cols_out, ep_step_out, ep_ret_out,
         partial_ref) = (next(it), next(it), next(it), next(it), next(it),
                         next(it))
        nstate_out = next(it) if plan.cell is not None else None

        Eb = obs_ref.shape[1]
        if host_uniforms:
            u = u_ref[:]
        else:
            # fold the block id into the first seed word (prng_seed takes at
            # most 2 values); Knuth multiplicative hash decorrelates blocks
            pltpu.prng_seed(
                seed_ref[0, 0] + pl.program_id(0) * jnp.int32(-1640531527),
                seed_ref[0, 1],
            )
            # bitcast before shifting: prng_random_bits yields i32 on some
            # jax versions, and an arithmetic >> of a negative word would
            # put the "uniform" in [-0.5, 0.5). The post-shift word is
            # < 2^24, so the int32 view is value-identical — needed because
            # Mosaic has no uint32 -> f32 cast.
            bits = pltpu.bitcast(pltpu.prng_random_bits((nu8, Eb)),
                                 jnp.uint32) >> 8
            u = pltpu.bitcast(bits, jnp.int32).astype(jnp.float32) * _INV24

        out = _collect_block(
            plan, env, max_episode_length, lambda k: p_refs[k][:],
            eps_ref[0, 0], u, obs_ref[:], cols_ref[:],
            eps_step_ref[:], ep_ret_ref[:],
            nstate=None if nstate_ref is None else nstate_ref[:],
        )

        def put(ref, val, k):
            # zero the pad rows so downstream pads stay clean
            kr = jax.lax.broadcasted_iota(jnp.int32, ref.shape, 0)
            ref[:] = jnp.where(
                kr < k, jnp.pad(val, ((0, ref.shape[0] - val.shape[0]),
                                      (0, 0))), 0.0)

        put(fields_ref, out["fields"], plan.nf)
        put(obs_out, out["obs_new"], plan.no)
        put(cols_out, out["cols_new"], plan.W)
        ep_step_out[:] = out["ep_step_new"]
        ep_ret_out[:] = out["ep_ret_new"]
        partial_ref[:] = out["partial"]
        if nstate_out is not None:
            nstate_out[:] = out["nstate_new"]

    return kernel


def _choose_eb(E: int, plan: CollectPlan) -> Optional[int]:
    # recurrent plans carry srows state + [gates, Eb] activations per block:
    # Eb=8192 measured 16.13M scoped VMEM at the LSTM32 shape (137K over
    # the 16M limit once the grid is deep enough to double-buffer) — halve
    # the block for cell plans
    cap = 4096 if plan.cell is not None else 8192
    for eb in (8192, 4096, 2048, 1024, 512, 256, 128):
        if eb <= cap and E % eb == 0:
            return eb
    return None


def fused_collect(env, network, plan: CollectPlan, params, *, obs, cols,
                  ep_step, ep_ret, seeds, eps, max_episode_length: int,
                  nstate=None, host_key=None, interpret: bool = False):
    """One fused collect step over all E envs.

    Feature-major operands: ``obs [no8, E]`` (pad rows zero),
    ``cols [W8, E]``, ``ep_step/ep_ret [1, E]`` f32; ``seeds [1, 2]`` i32,
    ``eps`` scalar f32; recurrent plans additionally take/return ``nstate
    [srows, E]`` (h / h;c rows). ``host_key`` forces XLA-side uniform
    generation (always on under ``interpret`` — the TPU PRNG only exists on
    hardware) and makes the call reproducible against ``_collect_block`` in
    XLA.

    Returns ``(fields [nf, E], obs' [no8, E], cols' [W8, E], ep_step',
    ep_ret', totals [3])`` — plus a trailing ``nstate'`` when recurrent —
    with totals = (ended return sum, ended length sum, ended count).
    """
    E = obs.shape[1]
    Eb = _choose_eb(E, plan)
    assert Eb is not None, f"E={E} must be a multiple of 128"
    host_uniforms = interpret or host_key is not None
    nt = plan.n_cell_tensors + 2 * len(plan.net.val + plan.net.adv)
    p_list = _pack8(network, params, plan)

    kernel = _make_kernel(plan, env, max_episode_length, nt, host_uniforms)

    n_blk = E // Eb
    col = lambda k: pl.BlockSpec((k, Eb), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
    full = lambda t: pl.BlockSpec(t.shape, lambda i: (0,) * t.ndim,
                                  memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)
    smem1 = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    in_specs = [smem, smem1]
    args = [seeds, jnp.asarray(eps, jnp.float32).reshape(1, 1)]
    if host_uniforms:
        if host_key is None:
            raise ValueError("interpret mode needs host_key (no TPU PRNG)")
        u_host = jax.random.uniform(host_key, (plan.nu8, E), jnp.float32)
        in_specs.append(col(plan.nu8))
        args.append(u_host)
    in_specs += [col(plan.no8), col(plan.W8), col(1), col(1)]
    args += [obs, cols, ep_step, ep_ret]
    if plan.cell is not None:
        in_specs.append(col(plan.cell.srows))
        args.append(nstate)
    in_specs += [full(t) for t in p_list]
    args += p_list

    out_specs = [
        col(plan.nf8), col(plan.no8), col(plan.W8), col(1), col(1),
        pl.BlockSpec((None, 1, 128), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((plan.nf8, E), jnp.float32),
        jax.ShapeDtypeStruct((plan.no8, E), jnp.float32),
        jax.ShapeDtypeStruct((plan.W8, E), jnp.float32),
        jax.ShapeDtypeStruct((1, E), jnp.float32),
        jax.ShapeDtypeStruct((1, E), jnp.float32),
        jax.ShapeDtypeStruct((n_blk, 1, 128), jnp.float32),
    ]
    if plan.cell is not None:
        out_specs.append(col(plan.cell.srows))
        out_shape.append(
            jax.ShapeDtypeStruct((plan.cell.srows, E), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(n_blk,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*args)
    fields, obs_n, cols_n, ep_step_n, ep_ret_n, partials = outs[:6]
    totals = jnp.sum(partials[:, 0, :3], axis=0)
    res = (fields[: plan.nf], obs_n, cols_n, ep_step_n, ep_ret_n, totals)
    if plan.cell is not None:
        res = res + (outs[6],)
    return res
