"""Unit tests for the fused train steps: Bellman target math, double-Q
selection, IS-weighted Huber loss, priority updates, target sync.

The reference only tests these end-to-end (SURVEY.md §4); here the math of
``batch_train!`` (``src/solver.jl:191-287``) is checked directly.
"""
import jax
import jax.numpy as jnp
import numpy as np

from deepqlearning_tpu import (
    Chain,
    Dense,
    PrioritizedReplayBuffer,
    ReplayBuffer,
    TransitionBatch,
    huber_loss,
)
from deepqlearning_tpu.learner.train_step import (
    _bellman_targets,
    make_dqn_train_step,
    make_drqn_train_step,
    sync_target,
)
from deepqlearning_tpu.ops import sumtree


def _fill(buf, n, key):
    st = buf.init()
    k1, k2 = jax.random.split(key)
    batch = TransitionBatch(
        obs=jax.random.normal(k1, (n, 3)),
        action=jax.random.randint(k2, (n,), 0, 2),
        reward=jnp.linspace(-1, 1, n),
        next_obs=jax.random.normal(k2, (n, 3)),
        done=(jnp.arange(n) % 5 == 0).astype(jnp.float32),
    )
    return buf.insert(st, batch)


def test_bellman_targets_plain_max():
    net = Chain(Dense(3, 2))
    params = net.init(jax.random.PRNGKey(0))
    tparams = net.init(jax.random.PRNGKey(1))
    next_obs = jax.random.normal(jax.random.PRNGKey(2), (5, 3))
    r = jnp.arange(5.0)
    done = jnp.asarray([0.0, 1.0, 0.0, 0.0, 1.0])
    tgt = _bellman_targets(net, params, tparams, next_obs, r, done, 0.9, False)
    q_t, _ = net.apply(tparams, next_obs)
    expected = r + (1 - done) * 0.9 * q_t.max(-1)
    np.testing.assert_allclose(np.asarray(tgt), np.asarray(expected), rtol=1e-5)
    # terminal rows bootstrap to nothing
    np.testing.assert_allclose(np.asarray(tgt)[1], 1.0)


def test_bellman_targets_double_q():
    # double-Q: argmax from online net, value from target net (src/solver.jl:209-213)
    net = Chain(Dense(3, 4))
    params = net.init(jax.random.PRNGKey(0))
    tparams = net.init(jax.random.PRNGKey(1))
    next_obs = jax.random.normal(jax.random.PRNGKey(2), (6, 3))
    r = jnp.zeros(6)
    done = jnp.zeros(6)
    tgt = _bellman_targets(net, params, tparams, next_obs, r, done, 1.0, True)
    q_o, _ = net.apply(params, next_obs)
    q_t, _ = net.apply(tparams, next_obs)
    best = np.argmax(np.asarray(q_o), -1)
    expected = np.asarray(q_t)[np.arange(6), best]
    np.testing.assert_allclose(np.asarray(tgt), expected, rtol=1e-5)


def test_train_step_reduces_td_loss():
    buf = ReplayBuffer((3,), 64, 32)
    st = _fill(buf, 64, jax.random.PRNGKey(0))
    net = Chain(Dense(3, 32, jnp.tanh), Dense(32, 2))
    params = net.init(jax.random.PRNGKey(1))

    # double_q=False: targets depend only on the frozen target net, making
    # this a fixed regression whose loss must collapse
    step, opt = make_dqn_train_step(net, buf, 0.9, False, 1e-2)
    step = jax.jit(step)
    opt_state = opt.init(params)
    tparams = params
    losses = []
    key = jax.random.PRNGKey(2)
    for i in range(300):
        key, k = jax.random.split(key)
        res = step(params, tparams, opt_state, st, k)
        params, opt_state, st = res.params, res.opt_state, res.replay_state
        losses.append(float(res.loss))
    assert np.isfinite(losses).all()
    # fixed targets + fixed data => regression; loss must shrink substantially
    # (converges to ~0 over a few thousand steps; 300 give a robust 40%+ drop)
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.6


def test_train_step_updates_priorities():
    buf = PrioritizedReplayBuffer((3,), 64, 32, alpha=0.6, eps=1e-3)
    st = _fill(buf, 64, jax.random.PRNGKey(0))
    net = Chain(Dense(3, 2))
    params = net.init(jax.random.PRNGKey(1))
    step, opt = make_dqn_train_step(net, buf, 0.9, False, 1e-3)
    opt_state = opt.init(params)
    before = np.asarray(st.tree[0])
    res = step(params, params, opt_state, st, jax.random.PRNGKey(2))
    after = res.replay_state.tree
    assert not np.allclose(before, np.asarray(after[0]))
    # tree stays internally consistent
    for lo, hi in zip(after[:-1], after[1:]):
        bf = lo.shape[0] // hi.shape[0]
        np.testing.assert_allclose(
            np.asarray(lo).reshape(-1, bf).sum(1), np.asarray(hi), rtol=1e-4
        )


def test_is_weights_scale_gradients():
    # loss = sum(huber(w * td)) / B — w enters inside huber (src/solver.jl:223)
    w = jnp.asarray([2.0])
    td = jnp.asarray([0.1])
    np.testing.assert_allclose(
        float(huber_loss(w * td)[0]), 0.5 * 0.2 ** 2, rtol=1e-6
    )


def test_sync_target():
    p = {"a": jnp.ones(3)}
    t = {"a": jnp.zeros(3)}
    synced = sync_target(p, t, jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(synced["a"]), 1.0)
    kept = sync_target(p, t, jnp.asarray(False))
    np.testing.assert_allclose(np.asarray(kept["a"]), 0.0)


def test_drqn_train_step_runs_and_learns():
    from deepqlearning_tpu import EpisodeReplayBuffer, LSTM

    buf = EpisodeReplayBuffer((2,), max_size=8, batch_size=4, trace_length=5,
                              max_episode_length=6, num_envs=2)
    st = buf.init()
    key = jax.random.PRNGKey(0)
    for t in range(12):
        key, k = jax.random.split(key)
        done = jnp.asarray([t % 4 == 3, t % 6 == 5], jnp.float32)
        tr = TransitionBatch(
            obs=jax.random.normal(k, (2, 2)),
            action=jnp.asarray([t % 3, (t + 1) % 3], jnp.int32),
            reward=jnp.ones((2,)),
            next_obs=jax.random.normal(k, (2, 2)),
            done=done,
        )
        st = buf.add_step(st, tr, done.astype(bool))
    assert int(st.rec_count.sum()) >= 4

    net = Chain(LSTM(2, 8), Dense(8, 3))
    params = net.init(jax.random.PRNGKey(1))
    step, opt = make_drqn_train_step(net, buf, 0.9, True, 1e-2)
    step = jax.jit(step)
    opt_state = opt.init(params)
    losses = []
    for i in range(30):
        key, k = jax.random.split(key)
        res = step(params, params, opt_state, st, k)
        params, opt_state = res.params, res.opt_state
        losses.append(float(res.loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_grouped_step_single_update_matches_sequential():
    # n_updates=1 must match make_dqn_train_step (up to float reassociation
    # inside lax.scan's fusion)
    from deepqlearning_tpu.learner.train_step import make_grouped_dqn_train_step

    buf = PrioritizedReplayBuffer((3,), 64, 16, alpha=0.6, eps=1e-3)
    st = _fill(buf, 64, jax.random.PRNGKey(0))
    net = Chain(Dense(3, 8, jnp.tanh), Dense(8, 2))
    params = net.init(jax.random.PRNGKey(1))
    step_a, opt = make_dqn_train_step(net, buf, 0.9, True, 1e-3)
    step_b, _ = make_grouped_dqn_train_step(net, buf, 0.9, True, 1e-3, 1)
    opt_state = opt.init(params)
    k = jax.random.PRNGKey(2)
    ra = step_a(params, params, opt_state, st, k)
    rb = step_b(params, params, opt_state, st, k)
    for la, lb in zip(jax.tree_util.tree_leaves(ra.params),
                      jax.tree_util.tree_leaves(rb.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ra.replay_state.tree[0]),
                               np.asarray(rb.replay_state.tree[0]),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(float(ra.loss), float(rb.loss), rtol=1e-6)


def test_grouped_step_applies_all_subupdates_and_priorities():
    from deepqlearning_tpu.learner.train_step import make_grouped_dqn_train_step

    U, B = 4, 16
    buf = PrioritizedReplayBuffer((3,), 64, B, alpha=0.6, eps=1e-3)
    st = _fill(buf, 64, jax.random.PRNGKey(0))
    net = Chain(Dense(3, 8, jnp.tanh), Dense(8, 2))
    params = net.init(jax.random.PRNGKey(1))
    grouped, opt = make_grouped_dqn_train_step(net, buf, 0.9, True, 1e-2, U)
    single, _ = make_dqn_train_step(net, buf, 0.9, True, 1e-2)
    opt_state = opt.init(params)
    k = jax.random.PRNGKey(2)

    rg = grouped(params, params, opt_state, st, k)
    r1 = single(params, params, opt_state, st, k)

    # U sequential Adam updates move params strictly further than one
    d_g = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(
        jax.tree_util.tree_leaves(rg.params), jax.tree_util.tree_leaves(params)))
    d_1 = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(
        jax.tree_util.tree_leaves(r1.params), jax.tree_util.tree_leaves(params)))
    assert d_g > d_1

    # every sampled index got its priority rewritten: the tree changed and
    # stays internally consistent
    after = rg.replay_state.tree
    assert not np.allclose(np.asarray(st.tree[0]), np.asarray(after[0]))
    for lo, hi in zip(after[:-1], after[1:]):
        bf = lo.shape[0] // hi.shape[0]
        np.testing.assert_allclose(
            np.asarray(lo).reshape(-1, bf).sum(1), np.asarray(hi), rtol=1e-4)

    # de-interleave: each sub-batch spans the full priority mass (strata are
    # ordered, so each sub-batch's draws must not be one contiguous block)
    idx, _ = sumtree.sample(st.tree, k, U * B)
    sub0 = np.asarray(idx).reshape(B, U)[:, 0]
    assert sub0.max() - sub0.min() > B  # spread across the ring, not a block


def test_grouped_drqn_single_update_matches_sequential():
    # grouped DRQN with n_updates=1 must match make_drqn_train_step exactly
    # (uniform sampling: same key -> same windows)
    from deepqlearning_tpu import EpisodeReplayBuffer, LSTM
    from deepqlearning_tpu.learner.train_step import (
        make_grouped_drqn_train_step,
    )

    buf = EpisodeReplayBuffer((2,), max_size=8, batch_size=4, trace_length=5,
                              max_episode_length=6, num_envs=2)
    st = buf.init()
    key = jax.random.PRNGKey(0)
    for t in range(12):
        key, k = jax.random.split(key)
        done = jnp.asarray([t % 4 == 3, t % 6 == 5], jnp.float32)
        tr = TransitionBatch(
            obs=jax.random.normal(k, (2, 2)),
            action=jnp.asarray([t % 3, (t + 1) % 3], jnp.int32),
            reward=jnp.ones((2,)),
            next_obs=jax.random.normal(k, (2, 2)),
            done=done,
        )
        st = buf.add_step(st, tr, done.astype(bool))

    net = Chain(LSTM(2, 8), Dense(8, 3))
    params = net.init(jax.random.PRNGKey(1))
    step_a, opt = make_drqn_train_step(net, buf, 0.9, True, 1e-2)
    step_b, _ = make_grouped_drqn_train_step(net, buf, 0.9, True, 1e-2, 1)
    o = opt.init(params)
    k = jax.random.PRNGKey(5)
    ra = step_a(params, params, o, st, k)
    rb = step_b(params, params, o, st, k)
    np.testing.assert_allclose(float(ra.loss), float(rb.loss), rtol=1e-6)
    for la, lb in zip(jax.tree_util.tree_leaves(ra.params),
                      jax.tree_util.tree_leaves(rb.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-6, atol=1e-8)

    # U=3 applies all sub-updates: params move strictly further
    step_c, _ = make_grouped_drqn_train_step(net, buf, 0.9, True, 1e-2, 3)
    rc = jax.jit(step_c)(params, params, o, st, k)
    d_c = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(
        jax.tree_util.tree_leaves(rc.params),
        jax.tree_util.tree_leaves(params)))
    d_a = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(
        jax.tree_util.tree_leaves(ra.params),
        jax.tree_util.tree_leaves(params)))
    assert np.isfinite(float(rc.loss))
    assert d_c > d_a
