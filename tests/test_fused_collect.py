"""Fused collect-phase kernel (ops/pallas/fused_collect.py), interpret mode.

Strategy: the kernel body (``_collect_block``) is pure jnp traced over
feature-major blocks, and ``host_key`` moves uniform generation to XLA — so
the compiled (here: interpreted) kernel is bit-comparable against the same
math composed in plain XLA, and the forward against ``network.apply``. Env
dynamics (``step_cols``) are checked against the POMDPModels semantics the
keyed ``step()`` implements (reference ``src/solver.jl:82-99`` hot loop;
POMDPModels SimpleGridWorld transition rules).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepqlearning_tpu import (
    Chain, Dense, DQNConfig, Flatten, SimpleGridWorld, create_dueling_network,
)
from deepqlearning_tpu.learner.actor import init_actor, make_fused_collect_step
from deepqlearning_tpu.learner.loop import LoopCarry, build_loop
from deepqlearning_tpu.ops.pallas.fused_collect import (
    _collect_block, _forward_cols, _pack8, collect_plan_for, fused_collect,
)
from deepqlearning_tpu.replay.prioritized import PrioritizedReplayBuffer
from deepqlearning_tpu.solver.exploration import LinearDecaySchedule


def _net(env, hidden=32):
    chain = Chain(Flatten(), Dense(2, hidden, jnp.tanh),
                  Dense(hidden, hidden, jnp.tanh),
                  Dense(hidden, env.num_actions))
    return create_dueling_network(chain)


def _setup(E=256, seed=0):
    env = SimpleGridWorld()
    net = _net(env)
    plan = collect_plan_for(env, net, None)
    assert plan is not None
    key = jax.random.PRNGKey(seed)
    params = net.init(key)
    st, obs = env.reset_batch(key, E)
    obs_t = jnp.pad(obs.T, ((0, plan.no8 - plan.no), (0, 0)))
    cols = jnp.pad(env.state_to_cols(st), ((0, plan.W8 - plan.W), (0, 0)))
    return env, net, plan, params, obs_t, cols


def test_plan_gating():
    env = SimpleGridWorld()
    net = _net(env)
    assert collect_plan_for(env, net, None) is not None
    # f32 buffer passes, bf16 buffer is rejected (kernel emits f32 rows)
    buf32 = PrioritizedReplayBuffer(env.obs_shape, 1024, 32)
    bufb = PrioritizedReplayBuffer(env.obs_shape, 1024, 32,
                                   obs_dtype=jnp.bfloat16)
    assert collect_plan_for(env, net, buf32) is not None
    assert collect_plan_for(env, net, bufb) is None
    # an env without the cols protocol is rejected
    from deepqlearning_tpu.envs.test_mdp import TestMDP
    tm = TestMDP((2, 2), 1)
    net_tm = create_dueling_network(
        Chain(Flatten(), Dense(4, 8, jnp.tanh), Dense(8, tm.num_actions)))
    assert collect_plan_for(tm, net_tm, None) is None


def test_forward_cols_matches_network_apply():
    env, net, plan, params, obs_t, _ = _setup()
    p_list = _pack8(net, params, plan)
    q_cols, _, _ = _forward_cols(plan, lambda k: p_list[k], obs_t)
    q_ref, _ = net.apply(params, obs_t[: plan.no].T)
    np.testing.assert_allclose(
        np.asarray(q_cols[: env.num_actions].T), np.asarray(q_ref),
        rtol=1e-5, atol=1e-6,
    )


def test_kernel_matches_xla_reference():
    """Interpreted kernel == the same block math composed in plain XLA,
    given identical (host-generated) uniforms."""
    env, net, plan, params, obs_t, cols = _setup()
    E = obs_t.shape[1]
    ep_step = jnp.full((1, E), 3.0)
    ep_ret = jnp.zeros((1, E))
    k_u = jax.random.PRNGKey(7)
    fields, obs_n, cols_n, ep_step_n, ep_ret_n, totals = fused_collect(
        env, net, plan, params, obs=obs_t, cols=cols, ep_step=ep_step,
        ep_ret=ep_ret, seeds=jnp.zeros((1, 2), jnp.int32), eps=0.4,
        max_episode_length=50, host_key=k_u, interpret=True,
    )
    u = jax.random.uniform(k_u, (plan.nu8, E), jnp.float32)
    p_list = _pack8(net, params, plan)
    ref = _collect_block(plan, env, 50, lambda k: p_list[k],
                         jnp.float32(0.4), u, obs_t, cols, ep_step, ep_ret)
    np.testing.assert_allclose(np.asarray(fields),
                               np.asarray(ref["fields"]), rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(obs_n[: plan.no]),
                               np.asarray(ref["obs_new"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cols_n[: plan.W]),
                               np.asarray(ref["cols_new"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ep_step_n),
                               np.asarray(ref["ep_step_new"]))
    np.testing.assert_allclose(np.asarray(ep_ret_n),
                               np.asarray(ref["ep_ret_new"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(totals), np.asarray(ref["partial"][0, :3]), rtol=1e-5)


def test_step_cols_dynamics_parity():
    """step_cols reproduces the POMDPModels rules step() implements:
    deterministic intended move when u_dir < tprob, wall clipping, reward
    cells and absorption."""
    env = SimpleGridWorld()
    # all 100 cells x 4 actions, intended direction forced (u_dir = 0)
    xs, ys = np.meshgrid(np.arange(1, 11), np.arange(1, 11))
    pos = np.stack([xs.ravel(), ys.ravel()]).astype(np.float32)   # [2, 100]
    dirs = {0: (0, 1), 1: (0, -1), 2: (-1, 0), 3: (1, 0)}
    rewards = {(4, 3): -10.0, (4, 6): -5.0, (9, 3): 10.0, (8, 8): 3.0}
    for a, (dx, dy) in dirs.items():
        cols = jnp.asarray(np.concatenate([pos, np.zeros((1, 100))], 0))
        act = jnp.full((1, 100), float(a))
        u = jnp.zeros((2, 100))          # u_dir = 0 < tprob -> intended
        nc, obs, r, d = env.step_cols(cols, act, u)
        nc, obs, r, d = map(np.asarray, (nc, obs, r, d))
        for i in range(100):
            x, y = int(pos[0, i]), int(pos[1, i])
            rv = rewards.get((x, y), 0.0)
            assert r[0, i] == rv
            if rv != 0.0:
                # absorbing: pos frozen, terminal, obs = (-1, -1)
                assert d[0, i] == 1.0
                assert nc[0, i] == x and nc[1, i] == y and nc[2, i] == 1.0
                assert obs[0, i] == -1.0 and obs[1, i] == -1.0
            else:
                ex = min(max(x + dx, 1), 10)
                ey = min(max(y + dy, 1), 10)
                assert d[0, i] == 0.0
                assert nc[0, i] == ex and nc[1, i] == ey and nc[2, i] == 0.0
                assert obs[0, i] == ex and obs[1, i] == ey
    # the "other direction" branch never picks the intended action
    cols = jnp.asarray(np.concatenate([pos, np.zeros((1, 100))], 0))
    for a in range(4):
        for u_o in (0.05, 0.4, 0.9):     # -> other in {0, 1, 2} pre-skip
            u = jnp.stack([jnp.ones((100,)) * 0.99,       # u_dir >= tprob
                           jnp.ones((100,)) * u_o])
            act = jnp.full((1, 100), float(a))
            nc, obs, r, d = env.step_cols(cols, act, u)
            # recompute which direction was taken from the displacement
            free = (np.asarray(r)[0] == 0.0)
            moved = np.asarray(nc)[:2, free] - pos[:, free]
            for i in range(moved.shape[1]):
                mx, my = moved[:, i]
                if (mx, my) != (0.0, 0.0):  # clipped moves are ambiguous
                    taken = [k for k, (dx, dy) in dirs.items()
                             if (dx, dy) == (mx, my)]
                    assert taken and taken[0] != a


def test_reset_cols_bounds_and_distribution():
    env = SimpleGridWorld()
    u = jax.random.uniform(jax.random.PRNGKey(0), (2, 4096))
    cols, obs = env.reset_cols(u)
    o = np.asarray(obs)
    assert o.min() >= 1.0 and o.max() <= 10.0
    assert np.asarray(cols)[2].max() == 0.0
    # roughly uniform over 10 values per axis
    counts = np.bincount(o[0].astype(int), minlength=11)[1:]
    assert counts.min() > 4096 / 10 * 0.7


def _loop_carry(env, net, cfg, buf, seed=0):
    iteration, populate_step, opt = build_loop(
        env, net, buf, cfg, LinearDecaySchedule(1.0, 0.05, 5000),
        gamma=env.discount,
    )
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    params = net.init(k1)
    carry = LoopCarry(
        actor=init_actor(env, net, cfg.num_envs, k2), replay=buf.init(),
        params=params, target_params=params, opt_state=opt.init(params),
        lkey=k3, loss=jnp.asarray(0.0), gnorm=jnp.asarray(0.0),
        sync_acc=jnp.asarray(0, jnp.int32),
    )
    return iteration, populate_step, carry


def test_fused_loop_runs_and_accounts_episodes():
    env = SimpleGridWorld()
    net = _net(env)
    cfg = DQNConfig(num_envs=128, batch_size=32, buffer_size=2048,
                    train_freq=128, max_episode_length=20, double_q=True,
                    dueling=True, prioritized_replay=True,
                    fused_collect=True, fused_updates=False)
    buf = PrioritizedReplayBuffer(env.obs_shape, cfg.buffer_size,
                                  cfg.batch_size)
    iteration, populate_step, carry = _loop_carry(env, net, cfg, buf)

    @jax.jit
    def pop(c):
        (a, r, p), _ = jax.lax.scan(
            populate_step, (c.actor, c.replay, c.params), None, length=4)
        return c._replace(actor=a, replay=r)

    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(iteration, c, None, length=25)
        return c

    carry = run(pop(carry))
    assert np.isfinite(float(carry.loss))
    assert int(carry.replay.size) > 0
    # t advanced exactly num_envs per lockstep step (4 populate + 25 iters)
    assert int(carry.actor.t) == 29 * cfg.num_envs
    # with max_episode_length=20 every env must have completed episodes
    assert int(carry.actor.ep_count) >= cfg.num_envs
    # the cnt ring holds per-step ended counts summing to ep_count (the run
    # is shorter than the ring, so nothing has been overwritten)
    assert int(np.asarray(carry.actor.cnt_ring).sum()) == int(
        carry.actor.ep_count)
    o = np.asarray(carry.actor.obs)
    assert ((o >= 1) & (o <= 10)).all()  # no terminal obs survives auto-reset


def test_fused_step_inserts_reference_fields_into_replay():
    """Replay contents after one fused step == the reference block's fields
    (obs = pre-step obs, next_obs = pre-reset obs, done = env done)."""
    env, net, plan, params, obs_t, cols = _setup(E=128)
    E = 128
    buf = PrioritizedReplayBuffer(env.obs_shape, 1024, 32)
    insert_fn = lambda replay, tr, ended: buf.insert(replay, tr)
    step = make_fused_collect_step(
        env, net, 50, lambda t: jnp.asarray(0.3), insert_fn, plan,
        interpret=True,
    )
    key = jax.random.PRNGKey(5)
    actor = init_actor(env, net, E, key)
    (actor2, replay2, _), _ = step((actor, buf.init(), params), None)

    # reproduce the uniforms the wrapper drew (same split structure)
    _, _, k_u = jax.random.split(actor.key, 3)
    u = jax.random.uniform(k_u, (plan.nu8, E), jnp.float32)
    p_list = _pack8(net, params, plan)
    obs_t0 = jnp.pad(actor.obs.T, ((0, plan.no8 - plan.no), (0, 0)))
    cols0 = jnp.pad(env.state_to_cols(actor.env_state),
                    ((0, plan.W8 - plan.W), (0, 0)))
    ref = _collect_block(plan, env, 50, lambda k: p_list[k],
                         jnp.float32(0.3), u, obs_t0, cols0,
                         jnp.zeros((1, E)), jnp.zeros((1, E)))
    f = np.asarray(ref["fields"])
    rows = np.asarray(replay2.rows)[:E]                  # insert at pos 0
    np.testing.assert_allclose(rows[:, 0:2], f[0:2].T, rtol=1e-6)   # obs
    np.testing.assert_allclose(rows[:, 2:4], f[2:4].T, rtol=1e-6)   # s'
    np.testing.assert_allclose(rows[:, 4], f[4], rtol=1e-6)         # action
    np.testing.assert_allclose(rows[:, 5], f[5], rtol=1e-6)         # reward
    np.testing.assert_allclose(rows[:, 6], f[6], rtol=1e-6)         # done
    # actor state advanced to the reference's post-reset values
    np.testing.assert_allclose(np.asarray(actor2.obs).T,
                               np.asarray(ref["obs_new"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(env.state_to_cols(actor2.env_state)),
        np.asarray(ref["cols_new"]), rtol=1e-6)


def test_fused_collect_learns():
    """End-to-end: the fused collect + XLA train path clears the GridWorld
    threshold the reference testset uses (test/runtests.jl:131-147 class)."""
    env = SimpleGridWorld()
    net = _net(env)
    cfg = DQNConfig(num_envs=256, batch_size=128, buffer_size=8192,
                    train_freq=256, max_episode_length=30, double_q=True,
                    dueling=True, prioritized_replay=True,
                    learning_rate=1e-3, target_update_freq=2048,
                    fused_collect=True, fused_updates=False)
    buf = PrioritizedReplayBuffer(env.obs_shape, cfg.buffer_size,
                                  cfg.batch_size)
    iteration, populate_step, carry = _loop_carry(env, net, cfg, buf)

    @jax.jit
    def pop(c):
        (a, r, p), _ = jax.lax.scan(
            populate_step, (c.actor, c.replay, c.params), None, length=8)
        return c._replace(actor=a, replay=r)

    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(iteration, c, None, length=300)
        return c

    carry = run(pop(carry))
    from deepqlearning_tpu.solver.evaluation import basic_evaluation

    ret, _, _ = basic_evaluation(
        net, carry.params, env, 128, 30, jax.random.PRNGKey(123),
    )
    assert ret > 1.0, f"fused-collect policy return {ret}"


def _rec_setup(net, E=256, seed=0):
    env = SimpleGridWorld()
    plan = collect_plan_for(env, net, None)
    assert plan is not None and plan.cell is not None
    key = jax.random.PRNGKey(seed)
    params = net.init(key)
    st, obs = env.reset_batch(key, E)
    obs_t = jnp.pad(obs.T, ((0, plan.no8 - plan.no), (0, 0)))
    cols = jnp.pad(env.state_to_cols(st), ((0, plan.W8 - plan.W), (0, 0)))
    return env, plan, params, obs, obs_t, cols


@pytest.mark.parametrize("cell", ["lstm", "gru"])
def test_recurrent_kernel_matches_xla_reference_and_apply(cell):
    """DRQN-family nets: in-kernel LSTM/GRU step == the XLA block math ==
    network.apply's cell (including greedy-action agreement)."""
    from deepqlearning_tpu.models.chain import GRU, LSTM

    if cell == "lstm":
        net = Chain(LSTM(2, 32), Dense(32, 4))
    else:
        net = Chain(GRU(2, 16), Dense(16, 32, jnp.tanh), Dense(32, 4))
    env, plan, params, obs, obs_t, cols = _rec_setup(net)
    E = obs.shape[0]
    H = plan.cell.hidden
    ns0 = jax.random.normal(jax.random.PRNGKey(3),
                            (plan.cell.srows, E)) * 0.3
    k_u = jax.random.PRNGKey(42)
    fields, obs_n, cols_n, _, _, totals, ns_n = fused_collect(
        env, net, plan, params, obs=obs_t, cols=cols,
        ep_step=jnp.zeros((1, E)), ep_ret=jnp.zeros((1, E)),
        seeds=jnp.zeros((1, 2), jnp.int32), eps=0.3,
        max_episode_length=100, nstate=ns0, host_key=k_u, interpret=True,
    )
    u = jax.random.uniform(k_u, (plan.nu8, E), jnp.float32)
    p_list = _pack8(net, params, plan)
    ref = _collect_block(plan, env, 100, lambda k: p_list[k],
                         jnp.float32(0.3), u, obs_t, cols,
                         jnp.zeros((1, E)), jnp.zeros((1, E)), nstate=ns0)
    np.testing.assert_allclose(np.asarray(fields),
                               np.asarray(ref["fields"]), rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ns_n),
                               np.asarray(ref["nstate_new"]), rtol=1e-6,
                               atol=1e-6)
    # the greedy branch must agree with network.apply's argmax
    if cell == "lstm":
        state = ((ns0[:H].T, ns0[H:].T), ())
    else:
        state = ((ns0[:H].T,), (), ())
    q_ref, _ = net.apply(params, obs, state)
    mask = np.asarray(u[0]) >= 0.3
    acts = np.asarray(fields[2 * plan.no]).astype(int)
    np.testing.assert_array_equal(
        acts[mask], np.asarray(jnp.argmax(q_ref, axis=-1))[mask])


def test_recurrent_fused_loop_learns():
    """DRQN loop with the fused collect kernel clears the GridWorld
    threshold (episode replay + fused collect end-to-end, interpret)."""
    from deepqlearning_tpu.models.chain import LSTM
    from deepqlearning_tpu.replay.episode import EpisodeReplayBuffer

    env = SimpleGridWorld()
    net = Chain(LSTM(2, 32), Dense(32, env.num_actions))
    cfg = DQNConfig(num_envs=128, batch_size=64, buffer_size=1024,
                    train_freq=128, trace_length=8, max_episode_length=20,
                    recurrence=True, double_q=True, learning_rate=1e-3,
                    target_update_freq=1024, fused_collect=True,
                    fused_updates=False)
    buf = EpisodeReplayBuffer(env.obs_shape, cfg.buffer_size, cfg.batch_size,
                              cfg.trace_length, cfg.max_episode_length,
                              num_envs=cfg.num_envs)
    iteration, populate_step, carry = _loop_carry(env, net, cfg, buf)

    @jax.jit
    def pop(c):
        (a, r, p), _ = jax.lax.scan(
            populate_step, (c.actor, c.replay, c.params), None,
            length=cfg.max_episode_length + 1)
        return c._replace(actor=a, replay=buf.reset_in_progress(r))

    @jax.jit
    def run(c):
        # 600 iterations: the identical XLA-collect control converges to
        # ~1.3 here while 250 leaves both paths pre-threshold (~0.2)
        c, _ = jax.lax.scan(iteration, c, None, length=600)
        return c

    carry = run(pop(carry))
    assert np.isfinite(float(carry.loss))
    # recurrent net state was maintained/reset by the kernel: finite, and
    # zero exactly on lanes whose episode just ended
    h = np.asarray(carry.actor.net_state[0][0])
    assert np.isfinite(h).all()
    from deepqlearning_tpu.solver.evaluation import basic_evaluation

    ret, _, _ = basic_evaluation(
        net, carry.params, env, 128, 20, jax.random.PRNGKey(9))
    assert ret > 0.5, f"fused-collect DRQN return {ret}"


def test_cartpole_cols_protocol():
    """Second cols-protocol env: CartPole physics parity (deterministic
    step — cols math must match the keyed step() exactly) and a fused
    kernel run end-to-end."""
    from deepqlearning_tpu.envs.cartpole import CartPole

    env = CartPole()
    N = 128
    key = jax.random.PRNGKey(0)
    st, obs = env.reset_batch(key, N)
    cols = env.state_to_cols(st)
    for a in (0.0, 1.0):
        nc, o, r, d = env.step_cols(cols, jnp.full((1, N), a), jnp.zeros((0, N)))
        st2, o2, r2, d2 = env.step_batch(
            st, jnp.full((N,), int(a), jnp.int32), key)
        np.testing.assert_allclose(np.asarray(nc),
                                   np.asarray(env.state_to_cols(st2)),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(d[0]),
                                   np.asarray(d2).astype(np.float32))
    # kernel == XLA reference on CartPole too
    net = create_dueling_network(
        Chain(Flatten(), Dense(4, 32, jnp.tanh), Dense(32, env.num_actions)))
    plan = collect_plan_for(env, net, None)
    assert plan is not None
    params = net.init(key)
    obs_t = jnp.pad(obs.T, ((0, plan.no8 - plan.no), (0, 0)))
    colsp = jnp.pad(cols, ((0, plan.W8 - plan.W), (0, 0)))
    k_u = jax.random.PRNGKey(5)
    fields, obs_n, *_ = fused_collect(
        env, net, plan, params, obs=obs_t, cols=colsp,
        ep_step=jnp.zeros((1, N)), ep_ret=jnp.zeros((1, N)),
        seeds=jnp.zeros((1, 2), jnp.int32), eps=0.5,
        max_episode_length=200, host_key=k_u, interpret=True,
    )
    u = jax.random.uniform(k_u, (plan.nu8, N), jnp.float32)
    p_list = _pack8(net, params, plan)
    ref = _collect_block(plan, env, 200, lambda k: p_list[k],
                         jnp.float32(0.5), u, obs_t, colsp,
                         jnp.zeros((1, N)), jnp.zeros((1, N)))
    np.testing.assert_allclose(np.asarray(fields),
                               np.asarray(ref["fields"]), rtol=1e-6,
                               atol=1e-6)


def test_mountain_car_cols_protocol():
    """Third cols-protocol env: MountainCar deterministic-physics parity."""
    from deepqlearning_tpu.envs.mountain_car import MountainCar

    env = MountainCar()
    N = 256
    key = jax.random.PRNGKey(2)
    st, obs = env.reset_batch(key, N)
    cols = env.state_to_cols(st)
    for a in (0.0, 1.0, 2.0):
        nc, o, r, d = env.step_cols(cols, jnp.full((1, N), a),
                                    jnp.zeros((0, N)))
        st2, o2, r2, d2 = env.step_batch(
            st, jnp.full((N,), int(a), jnp.int32), key)
        np.testing.assert_allclose(np.asarray(nc),
                                   np.asarray(env.state_to_cols(st2)),
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(d[0]),
                                   np.asarray(d2).astype(np.float32))
        assert (np.asarray(r) == -1.0).all()
    # reset bounds
    u = jax.random.uniform(key, (1, 2048))
    rc, ro = env.reset_cols(u)
    p = np.asarray(rc[0])
    assert p.min() >= -0.6 and p.max() <= -0.4
    assert (np.asarray(rc[1]) == 0.0).all()


def test_dueling_recurrent_collect_plan():
    """DuelingNetwork over an LSTM base (the reference's dueling-DRQN
    combination): plan accepted, kernel == XLA reference."""
    from deepqlearning_tpu.models.chain import LSTM
    from deepqlearning_tpu.models.dueling import DuelingNetwork

    env = SimpleGridWorld()
    base = Chain(LSTM(2, 16))
    net = DuelingNetwork(
        base=base,
        val=Chain(Dense(16, 32, jnp.tanh), Dense(32, 1)),
        adv=Chain(Dense(16, 32, jnp.tanh), Dense(32, env.num_actions)),
    )
    plan = collect_plan_for(env, net, None)
    assert plan is not None and plan.cell is not None and plan.net.dueling
    E = 128
    key = jax.random.PRNGKey(0)
    params = net.init(key)
    st, obs = env.reset_batch(key, E)
    obs_t = jnp.pad(obs.T, ((0, plan.no8 - plan.no), (0, 0)))
    cols = jnp.pad(env.state_to_cols(st), ((0, plan.W8 - plan.W), (0, 0)))
    ns0 = jax.random.normal(jax.random.PRNGKey(4),
                            (plan.cell.srows, E)) * 0.2
    k_u = jax.random.PRNGKey(6)
    fields, _, _, _, _, _, ns_n = fused_collect(
        env, net, plan, params, obs=obs_t, cols=cols,
        ep_step=jnp.zeros((1, E)), ep_ret=jnp.zeros((1, E)),
        seeds=jnp.zeros((1, 2), jnp.int32), eps=0.2,
        max_episode_length=50, nstate=ns0, host_key=k_u, interpret=True,
    )
    u = jax.random.uniform(k_u, (plan.nu8, E), jnp.float32)
    p_list = _pack8(net, params, plan)
    ref = _collect_block(plan, env, 50, lambda k: p_list[k],
                         jnp.float32(0.2), u, obs_t, cols,
                         jnp.zeros((1, E)), jnp.zeros((1, E)), nstate=ns0)
    np.testing.assert_allclose(np.asarray(fields),
                               np.asarray(ref["fields"]), rtol=1e-6,
                               atol=1e-6)
    # greedy actions agree with the dueling apply over the LSTM base
    H = plan.cell.hidden
    state = ((ns0[:H].T, ns0[H:].T),)
    q_ref, _ = net.apply(params, obs, state)
    mask = np.asarray(u[0]) >= 0.2
    acts = np.asarray(fields[2 * plan.no]).astype(int)
    np.testing.assert_array_equal(
        acts[mask], np.asarray(jnp.argmax(q_ref, axis=-1))[mask])
