"""Equivalence tests for the whole-train-phase fused Pallas kernel.

The fused kernel (``ops/pallas/fused_update.py``) must reproduce the grouped
XLA path (``make_grouped_dqn_train_step`` with ``use_pallas=False``) — same
sample, same U sequential Adam sub-updates, same merged priority update.
Runs in interpreter mode on the CPU test backend.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepqlearning_tpu import (
    Chain,
    Dense,
    Flatten,
    TransitionBatch,
    create_dueling_network,
)
from deepqlearning_tpu.learner.train_step import (
    make_fused_grouped_train_step,
    make_grouped_dqn_train_step,
)
from deepqlearning_tpu.ops.pallas.fused_update import plan_for
from deepqlearning_tpu.replay.prioritized import PrioritizedReplayBuffer


def _filled_buffer(obs_dim, n, B, key):
    buf = PrioritizedReplayBuffer((obs_dim,), n, B, alpha=0.6, beta=0.4,
                                  eps=1e-3, prioritized=True)
    st = buf.init()
    ks = jax.random.split(key, 5)
    batch = TransitionBatch(
        obs=jax.random.normal(ks[0], (n, obs_dim)),
        action=jax.random.randint(ks[1], (n,), 0, 4),
        reward=jax.random.normal(ks[2], (n,)),
        next_obs=jax.random.normal(ks[3], (n, obs_dim)),
        done=(jax.random.uniform(ks[4], (n,)) < 0.1).astype(jnp.float32),
    )
    return buf, buf.insert(st, batch)


def _tree_close(a, b, rtol=2e-4, atol=2e-5):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize("double_q", [True, False])
@pytest.mark.parametrize("dueling", [True, False])
def test_fused_matches_grouped_xla_path(double_q, dueling):
    obs_dim, A, B, U = 5, 4, 8, 3
    chain = Chain(Flatten(), Dense(obs_dim, 16, jnp.tanh),
                  Dense(16, 16, jax.nn.relu), Dense(16, A))
    net = create_dueling_network(chain) if dueling else chain
    assert plan_for(net) is not None
    buf, st = _filled_buffer(obs_dim, 64, B, jax.random.PRNGKey(0))

    params = net.init(jax.random.PRNGKey(1))
    ref_step, ref_opt = make_grouped_dqn_train_step(
        net, buf, 0.95, double_q, 1e-2, U, use_pallas=False
    )
    fus_step, fus_opt = make_fused_grouped_train_step(
        net, buf, 0.95, double_q, 1e-2, U, interpret=True
    )
    ro, fo = ref_opt.init(params), fus_opt.init(params)
    rp, fp = params, params
    rst, fst = st, st
    # two grouped invocations so Adam bias correction past t=U is covered
    for i in range(2):
        k = jax.random.PRNGKey(10 + i)
        rres = ref_step(rp, params, ro, rst, k)
        fres = fus_step(fp, params, fo, fst, k)
        rp, ro, rst = rres.params, rres.opt_state, rres.replay_state
        fp, fo, fst = fres.params, fres.opt_state, fres.replay_state
        np.testing.assert_allclose(float(rres.loss), float(fres.loss),
                                   rtol=1e-4)
        np.testing.assert_allclose(float(rres.grad_norm),
                                   float(fres.grad_norm), rtol=1e-3,
                                   atol=1e-6)
        _tree_close(rp, fp)
        # merged priority updates agree -> identical trees
        np.testing.assert_allclose(np.asarray(rst.tree[0]),
                                   np.asarray(fst.tree[0]), rtol=2e-3,
                                   atol=1e-5)
    assert int(fo.count) == 2 * U


def test_fused_adam_count_drives_bias_correction():
    """The Adam step counter must persist across grouped invocations —
    re-running with a reset counter must NOT give the same params."""
    obs_dim, A, B, U = 3, 2, 8, 2
    net = Chain(Dense(obs_dim, 8, jnp.tanh), Dense(8, A))
    buf, st = _filled_buffer(obs_dim, 32, B, jax.random.PRNGKey(2))
    params = net.init(jax.random.PRNGKey(3))
    step, opt = make_fused_grouped_train_step(net, buf, 0.9, True, 1e-2, U,
                                              interpret=True)
    o = opt.init(params)
    r1 = step(params, params, o, st, jax.random.PRNGKey(5))
    r2 = step(r1.params, params, r1.opt_state, st, jax.random.PRNGKey(6))
    r2_reset = step(r1.params, params,
                    r1.opt_state._replace(count=jnp.asarray(0, jnp.int32)),
                    st, jax.random.PRNGKey(6))
    a = jax.tree_util.tree_leaves(r2.params)[0]
    b = jax.tree_util.tree_leaves(r2_reset.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_plan_for_rejects_unsupported():
    from deepqlearning_tpu.models.chain import LSTM

    assert plan_for(Chain(Dense(4, 8, jnp.tanh), LSTM(8, 8), Dense(8, 2))) is None
    assert plan_for(Chain(Dense(4, 8, jnp.sin), Dense(8, 2))) is None  # act
    assert plan_for("not a network") is None
    # a hand-built dueling net whose value head is NOT scalar must fall back:
    # the kernel reads only V column 0, diverging from apply's broadcast v+a
    # semantics (r3 ADVICE low)
    from deepqlearning_tpu.models.dueling import DuelingNetwork
    from deepqlearning_tpu.models.chain import Flatten

    bad = DuelingNetwork(base=Chain(Flatten()),
                         val=Chain(Dense(8, 3)), adv=Chain(Dense(8, 4)))
    assert plan_for(bad) is None
    good = DuelingNetwork(base=Chain(Flatten()),
                          val=Chain(Dense(8, 1)), adv=Chain(Dense(8, 4)))
    assert plan_for(good) is not None


@pytest.mark.parametrize("double_q", [True, False])
@pytest.mark.parametrize("dueling", [True, False])
def test_fused_grads_match_jax_grad(dueling, double_q):
    """The grads-emitting kernel (DP composition path) must agree with
    jax.grad of the reference loss — the tight contract that pins the
    hand-derived backward exactly (VERDICT r2 next #3/#4)."""
    from deepqlearning_tpu.ops.helpers import huber_loss
    from deepqlearning_tpu.ops.pallas.fused_update import fused_grads

    obs_dim, A, B = 5, 4, 16
    gamma, alpha, eps = 0.95, 0.6, 1e-3
    chain = Chain(Flatten(), Dense(obs_dim, 16, jnp.tanh),
                  Dense(16, 16, jax.nn.relu), Dense(16, A))
    net = create_dueling_network(chain) if dueling else chain
    plan = plan_for(net)
    assert plan is not None
    params = net.init(jax.random.PRNGKey(1))
    ks = jax.random.split(jax.random.PRNGKey(2), 6)
    obs = jax.random.normal(ks[0], (B, obs_dim))
    nobs = jax.random.normal(ks[1], (B, obs_dim))
    action = jax.random.randint(ks[2], (B,), 0, A)
    reward = jax.random.normal(ks[3], (B,))
    done = (jax.random.uniform(ks[4], (B,)) < 0.2).astype(jnp.float32)
    weights = jax.random.uniform(ks[5], (B,), minval=0.5, maxval=1.5)
    q_sp_tgt, _ = net.apply(params, nobs)  # any values work as the target

    def xla_loss(p):
        q, _ = net.apply(p, obs)
        if double_q:
            q_sp_onl, _ = net.apply(p, nobs)
            best = jnp.argmax(jax.lax.stop_gradient(q_sp_onl), axis=-1)
            q_sp_max = jnp.take_along_axis(
                q_sp_tgt, best[:, None], axis=-1
            )[:, 0]
        else:
            q_sp_max = jnp.max(q_sp_tgt, axis=-1)
        q_targets = reward + (1.0 - done) * gamma * q_sp_max
        q_sa = jnp.take_along_axis(q, action[:, None], axis=-1)[:, 0]
        td = q_sa - q_targets
        return jnp.sum(huber_loss(weights * td)) / B, td

    (ref_loss, ref_td), ref_grads = jax.value_and_grad(
        xla_loss, has_aux=True
    )(params)
    grads, td, prio, loss, gnorm = fused_grads(
        net, plan, params, obs, nobs, action, reward, done, weights,
        q_sp_tgt, gamma=gamma, double_q=double_q, alpha=alpha, eps=eps,
        interpret=True,
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(td), np.asarray(ref_td),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(prio), (np.abs(np.asarray(ref_td)) + eps) ** alpha,
        rtol=1e-5,
    )
    _tree_close(ref_grads, grads, rtol=1e-5, atol=1e-7)


def test_fused_dp_step_matches_grouped_xla_dp():
    """The DP fused step (grads kernel + XLA pmean/Adam) must equal the
    grouped XLA DP path on a simulated mesh."""
    from functools import partial

    from jax.sharding import Mesh, PartitionSpec as P

    from deepqlearning_tpu.learner.train_step import (
        make_fused_dp_train_step,
        make_grouped_dqn_train_step,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs simulated devices")
    D, obs_dim, A, B, U = 4, 5, 4, 8, 2
    chain = Chain(Flatten(), Dense(obs_dim, 16, jnp.tanh), Dense(16, A))
    net = create_dueling_network(chain)
    buf, st = _filled_buffer(obs_dim, 64, B, jax.random.PRNGKey(0))
    params = net.init(jax.random.PRNGKey(1))

    ref_step, ref_opt = make_grouped_dqn_train_step(
        net, buf, 0.95, True, 1e-2, U, axis_name="d", use_pallas=False)
    fus_step, fus_opt = make_fused_dp_train_step(
        net, buf, 0.95, True, 1e-2, U, axis_name="d", interpret=True)

    mesh = Mesh(np.asarray(jax.devices()[:D]), ("d",))
    # replicate params/opt, shard replay+key per device
    stack = lambda x: jnp.broadcast_to(x, (D,) + x.shape)
    st_d = jax.tree_util.tree_map(stack, st)
    keys = jax.random.split(jax.random.PRNGKey(7), D)

    def run(step_fn, opt):
        o = opt.init(params)

        # check_vma off: interpret-mode pallas does not propagate varying
        # axes (JAX suggests this workaround); the real runner (mesh.py)
        # runs with check_vma=False for the same reason
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(), P(), P(), P("d"), P("d")),
                 out_specs=P("d"), check_vma=False)
        def one(p, tp, o, s, k):
            s = jax.tree_util.tree_map(lambda x: x[0], s)
            res = step_fn(p, tp, o, s, k[0])
            return jax.tree_util.tree_map(
                lambda x: jnp.asarray(x)[None], res.params
            )

        return one(params, params, o, st_d, keys)

    rp = run(ref_step, ref_opt)
    fp = run(fus_step, fus_opt)
    _tree_close(rp, fp, rtol=1e-4, atol=1e-6)
    # replication preserved: every device applied the same pmean'd update
    leaf = jax.tree_util.tree_leaves(fp)[0]
    np.testing.assert_allclose(np.asarray(leaf[0]), np.asarray(leaf[-1]),
                               rtol=1e-6)
