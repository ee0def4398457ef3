"""Compiled fused-collect kernel on the real TPU (ops/pallas/fused_collect.py).

Equivalence strategy mirrors tests/test_fused_collect.py: with
``host_key`` the uniforms come from XLA, so the compiled kernel is directly
comparable against the identical block math traced in plain XLA (the lane
pins matmul precision to highest, see conftest). The in-kernel TPU PRNG
path is exercised separately for shape/validity/distribution, since its
stream has no XLA counterpart.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepqlearning_tpu import (
    Chain, Dense, DQNConfig, Flatten, SimpleGridWorld, create_dueling_network,
)
from deepqlearning_tpu.learner.actor import init_actor, make_fused_collect_step
from deepqlearning_tpu.ops.pallas.fused_collect import (
    _collect_block, _pack8, collect_plan_for, fused_collect,
)
from deepqlearning_tpu.replay.prioritized import PrioritizedReplayBuffer

if jax.default_backend() in ("cpu", "gpu"):
    pytest.skip("compiled-TPU lane", allow_module_level=True)


def _setup(E, hidden=64, seed=0):
    env = SimpleGridWorld()
    chain = Chain(Flatten(), Dense(2, hidden, jnp.tanh),
                  Dense(hidden, hidden, jnp.tanh),
                  Dense(hidden, env.num_actions))
    net = create_dueling_network(chain)
    plan = collect_plan_for(env, net, None)
    key = jax.random.PRNGKey(seed)
    params = net.init(key)
    st, obs = env.reset_batch(key, E)
    obs_t = jnp.pad(obs.T, ((0, plan.no8 - plan.no), (0, 0)))
    cols = jnp.pad(env.state_to_cols(st), ((0, plan.W8 - plan.W), (0, 0)))
    return env, net, plan, params, obs_t, cols


def test_compiled_kernel_matches_xla_reference_multiblock():
    # 16384 envs -> 2 grid blocks of 8192 lanes: exercises the block
    # index maps and per-block output stitching on hardware
    E = 16384
    env, net, plan, params, obs_t, cols = _setup(E)
    ep_step = jnp.zeros((1, E))
    ep_ret = jnp.zeros((1, E))
    k_u = jax.random.PRNGKey(11)
    fields, obs_n, cols_n, ep_step_n, ep_ret_n, totals = jax.jit(
        lambda p: fused_collect(
            env, net, plan, p, obs=obs_t, cols=cols, ep_step=ep_step,
            ep_ret=ep_ret, seeds=jnp.zeros((1, 2), jnp.int32), eps=0.35,
            max_episode_length=100, host_key=k_u,
        )
    )(params)
    u = jax.random.uniform(k_u, (plan.nu8, E), jnp.float32)
    p_list = _pack8(net, params, plan)
    ref = _collect_block(plan, env, 100, lambda k: p_list[k],
                         jnp.float32(0.35), u, obs_t, cols, ep_step, ep_ret)
    np.testing.assert_allclose(np.asarray(fields),
                               np.asarray(ref["fields"]), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(obs_n[: plan.no]),
                               np.asarray(ref["obs_new"]), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(totals),
                               np.asarray(ref["partial"][0, :3]), rtol=1e-4)


def test_onchip_prng_path_valid_and_seed_sensitive():
    E = 8192
    env, net, plan, params, obs_t, cols = _setup(E)

    def run(seed_val, eps):
        f = jax.jit(lambda p: fused_collect(
            env, net, plan, p, obs=obs_t, cols=cols,
            ep_step=jnp.zeros((1, E)), ep_ret=jnp.zeros((1, E)),
            seeds=jnp.full((1, 2), seed_val, jnp.int32), eps=eps,
            max_episode_length=100,
        ))
        return f(params)

    fields, obs_n, *_ = run(3, 1.0)
    a = np.asarray(fields[2 * plan.no])
    assert a.min() >= 0 and a.max() <= env.num_actions - 1
    # ε=1: uniform actions — every action appears with roughly E/A mass
    counts = np.bincount(a.astype(int), minlength=env.num_actions)
    assert counts.min() > E / env.num_actions * 0.8
    o = np.asarray(obs_n[: plan.no])
    assert o.min() >= 1.0 and o.max() <= 10.0
    # a different seed draws different actions; the same seed repeats
    fields2, *_ = run(4, 1.0)
    fields3, *_ = run(3, 1.0)
    a2 = np.asarray(fields2[2 * plan.no])
    a3 = np.asarray(fields3[2 * plan.no])
    assert (a != a2).mean() > 0.5
    np.testing.assert_array_equal(a, a3)
    # per-block seed folding: blocks must not repeat each other's stream
    assert (a[:4096] != a[4096:]).mean() > 0.5


def test_fused_collect_step_feeds_training_on_chip():
    """Whole wrapper on hardware: one fused step inserts E transitions whose
    decoded scalars are self-consistent with GridWorld dynamics."""
    E = 8192
    env, net, plan, params, _, _ = _setup(E)
    buf = PrioritizedReplayBuffer(env.obs_shape, 65536, 512)
    insert_fn = lambda replay, tr, ended: buf.insert(replay, tr)
    step = make_fused_collect_step(
        env, net, 100, lambda t: jnp.asarray(0.2), insert_fn, plan,
    )
    actor = init_actor(env, net, E, jax.random.PRNGKey(1))
    actor2, replay2, _ = jax.jit(
        lambda c: step(c, None)[0]
    )((actor, buf.init(), params))
    assert int(replay2.size) == E
    rows = np.asarray(replay2.rows)[:E]
    obs, nobs = rows[:, 0:2], rows[:, 2:4]
    act, rew, done = rows[:, 4], rows[:, 5], rows[:, 6]
    assert ((obs >= 1) & (obs <= 10)).all()
    assert np.isin(act, np.arange(4)).all()
    rmap = {(4, 3): -10.0, (4, 6): -5.0, (9, 3): 10.0, (8, 8): 3.0}
    expect_r = np.array([rmap.get((int(x), int(y)), 0.0) for x, y in obs])
    np.testing.assert_allclose(rew, expect_r)
    np.testing.assert_array_equal(done, (expect_r != 0.0).astype(np.float32))
    # done rows' next_obs is the terminal sentinel
    assert (nobs[done == 1.0] == -1.0).all()
    # non-done rows moved by at most one cell
    d = np.abs(nobs[done == 0.0] - obs[done == 0.0]).sum(1)
    assert d.max() <= 1.0
    assert int(actor2.t) == E


def test_compiled_recurrent_kernel_matches_xla_reference():
    """DRQN-family: the in-kernel LSTM step compiled on hardware == the XLA
    block math given identical host uniforms."""
    from deepqlearning_tpu.models.chain import LSTM

    E = 8192
    env = SimpleGridWorld()
    net = Chain(LSTM(2, 32), Dense(32, env.num_actions))
    plan = collect_plan_for(env, net, None)
    assert plan is not None and plan.cell is not None
    key = jax.random.PRNGKey(0)
    params = net.init(key)
    st, obs = env.reset_batch(key, E)
    obs_t = jnp.pad(obs.T, ((0, plan.no8 - plan.no), (0, 0)))
    cols = jnp.pad(env.state_to_cols(st), ((0, plan.W8 - plan.W), (0, 0)))
    ns0 = jax.random.normal(jax.random.PRNGKey(3), (plan.cell.srows, E)) * 0.3
    k_u = jax.random.PRNGKey(21)
    fields, obs_n, cols_n, _, _, totals, ns_n = jax.jit(
        lambda p: fused_collect(
            env, net, plan, p, obs=obs_t, cols=cols,
            ep_step=jnp.zeros((1, E)), ep_ret=jnp.zeros((1, E)),
            seeds=jnp.zeros((1, 2), jnp.int32), eps=0.25,
            max_episode_length=100, nstate=ns0, host_key=k_u,
        )
    )(params)
    u = jax.random.uniform(k_u, (plan.nu8, E), jnp.float32)
    p_list = _pack8(net, params, plan)
    ref = _collect_block(plan, env, 100, lambda k: p_list[k],
                         jnp.float32(0.25), u, obs_t, cols,
                         jnp.zeros((1, E)), jnp.zeros((1, E)), nstate=ns0)
    np.testing.assert_allclose(np.asarray(fields),
                               np.asarray(ref["fields"]), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ns_n),
                               np.asarray(ref["nstate_new"]), rtol=1e-4,
                               atol=1e-5)
