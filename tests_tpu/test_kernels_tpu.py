"""Compile + equivalence-check every Pallas kernel ON THE REAL TPU at the
exact bench shapes (U=8, B=512, dueling 2->64->64->4) plus the variants that
tripped review (A != 4, non-dueling, single-Q).

The interpret-mode CPU tests (tests/test_fused_update.py,
tests/test_pallas_kernels.py) prove the math; THIS lane proves Mosaic can
compile the kernels — the two failure modes are disjoint (round 1 shipped an
interpret-green kernel that SIGABRTed the chip, BENCH_r01.json).
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
    make_dqn_train_step,
    make_fused_grouped_train_step,
    make_grouped_dqn_train_step,
)
from deepqlearning_tpu.ops.pallas.fused_update import plan_for
from deepqlearning_tpu.replay.prioritized import PrioritizedReplayBuffer


def _filled_buffer(obs_dim, n, B, A, key):
    buf = PrioritizedReplayBuffer((obs_dim,), n, B, alpha=0.6, beta=0.4,
                                  eps=1e-3, prioritized=True)
    st = buf.init()
    ks = jax.random.split(key, 5)
    batch = TransitionBatch(
        obs=jax.random.normal(ks[0], (n, obs_dim)),
        action=jax.random.randint(ks[1], (n,), 0, A),
        reward=jax.random.normal(ks[2], (n,)),
        next_obs=jax.random.normal(ks[3], (n, obs_dim)),
        done=(jax.random.uniform(ks[4], (n,)) < 0.1).astype(jnp.float32),
    )
    return buf, buf.insert(st, batch)


def _tree_close(a, b, rtol=5e-4, atol=5e-5):
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def _params_mostly_close(a, b, atol, max_abs, max_frac=0.02):
    """Bulk-distribution parameter agreement across precision domains.

    Exact equivalence is proven in interpret mode; on-device the XLA and
    Mosaic paths differ by ulps, and Adam's first-step update is
    ±lr·sign(g) — an ulp flip of a near-zero gradient legitimately moves a
    single weight by 2·lr. A real backward/Adam bug moves WHOLE TENSORS in
    wrong directions, which the bulk check catches; isolated sign flips pass.
    """
    la = np.concatenate([np.asarray(x).ravel()
                         for x in jax.tree_util.tree_leaves(a)])
    lb = np.concatenate([np.asarray(x).ravel()
                         for x in jax.tree_util.tree_leaves(b)])
    diff = np.abs(la - lb)
    frac = float((diff > atol).mean())
    assert frac <= max_frac, (
        f"{frac:.2%} of params differ by more than {atol} "
        f"(max diff {diff.max():.3e})"
    )
    assert diff.max() <= max_abs, f"max param diff {diff.max():.3e}"


# bench shape first (obs_dim=2, A=4, B=512, U=8, dueling + double-Q), then
# the review variants
CASES = [
    # (obs_dim, A, B, U, dueling, double_q, widths)
    (2, 4, 512, 8, True, True, (64, 64)),      # exact bench config
    (2, 4, 512, 8, False, True, (64, 64)),     # non-dueling
    (2, 4, 512, 8, True, False, (64, 64)),     # single-Q
    (5, 6, 512, 8, True, True, (64, 64)),      # A != 4
    (2, 4, 256, 4, True, True, (32, 32)),      # off-bench sizes
]


@pytest.mark.parametrize("obs_dim,A,B,U,dueling,double_q,widths", CASES)
def test_fused_update_compiles_and_matches_on_tpu(obs_dim, A, B, U, dueling,
                                                  double_q, widths):
    chain = Chain(Flatten(), Dense(obs_dim, widths[0], jnp.tanh),
                  Dense(widths[0], widths[1], jnp.tanh),
                  Dense(widths[1], A))
    net = create_dueling_network(chain) if dueling else chain
    assert plan_for(net) is not None
    buf, st = _filled_buffer(obs_dim, 4 * B * U, B, A, jax.random.PRNGKey(0))
    params = net.init(jax.random.PRNGKey(1))

    ref_step, ref_opt = make_grouped_dqn_train_step(
        net, buf, 0.95, double_q, 1e-2, U, use_pallas=False)
    fus_step, fus_opt = make_fused_grouped_train_step(
        net, buf, 0.95, double_q, 1e-2, U, interpret=False)  # REAL Mosaic

    ro, fo = ref_opt.init(params), fus_opt.init(params)
    k = jax.random.PRNGKey(7)
    rres = jax.jit(ref_step)(params, params, ro, st, k)
    fres = jax.jit(fus_step)(params, params, fo, st, k)
    # bit-level equivalence is proven in interpret mode
    # (tests/test_fused_update.py); on-device the two paths live in different
    # precision domains (Mosaic VPU vs XLA): Adam near-zero-gradient sign
    # flips and (for double-Q) argmax near-ties legitimately diverge a few
    # elements by O(lr) and compound over the U sub-updates, so the on-device
    # contract is bulk-distribution agreement, not allclose
    np.testing.assert_allclose(float(rres.loss), float(fres.loss), rtol=2e-2)
    # budgets set from data (scripts/r4/tolerance_measure.py, 6 seeds at the
    # bench shape): worst observed max-diff 0.021, worst frac>2e-3 0.49% —
    # budgeted at ~1.5-2x observed for chip/compiler-revision headroom
    # (VERDICT r3 next #7; was atol 2e-3 / max_abs 5e-2 / frac 2%)
    _params_mostly_close(rres.params, fres.params, atol=2e-3, max_abs=3e-2,
                         max_frac=0.01)
    # priorities: same bulk contract (|td|+eps)^alpha after U sub-updates
    tr = np.asarray(rres.replay_state.tree[0])
    tf = np.asarray(fres.replay_state.tree[0])
    frac = float((np.abs(tr - tf) > 1e-2 + 2e-2 * np.abs(tr)).mean())
    assert frac <= 0.02, f"{frac:.2%} of priorities diverge"


def test_fused_first_update_td_matches_tight_on_tpu():
    """First sub-update (U=1, single-Q): identical input params, no Adam
    compounding, no argmax ties — forward/TD/priorities must agree tightly on
    the device. This is the on-device MATH check; the parametrized cases
    above are the compile + bulk checks."""
    obs_dim, A, B = 2, 4, 512
    net = create_dueling_network(Chain(
        Flatten(), Dense(obs_dim, 64, jnp.tanh), Dense(64, 64, jnp.tanh),
        Dense(64, A)))
    buf, st = _filled_buffer(obs_dim, 4 * B, B, A, jax.random.PRNGKey(4))
    params = net.init(jax.random.PRNGKey(5))
    ref_step, ref_opt = make_grouped_dqn_train_step(
        net, buf, 0.95, False, 1e-4, 1, use_pallas=False)
    fus_step, fus_opt = make_fused_grouped_train_step(
        net, buf, 0.95, False, 1e-4, 1, interpret=False)
    k = jax.random.PRNGKey(9)
    r = jax.jit(ref_step)(params, params, ref_opt.init(params), st, k)
    f = jax.jit(fus_step)(params, params, fus_opt.init(params), st, k)
    np.testing.assert_allclose(float(r.loss), float(f.loss), rtol=1e-4)
    # priorities written back from the first TD pass: tight
    np.testing.assert_allclose(np.asarray(r.replay_state.tree[0]),
                               np.asarray(f.replay_state.tree[0]),
                               rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("double_q", [True, False])
def test_fused_grads_tight_on_tpu(double_q):
    """TIGHT on-device backward contract (VERDICT r2 next #4): the
    grads-emitting kernel must match jax.grad of the reference loss at
    allclose level for the dueling backward and the double-Q path — a
    dueling-backward bug of one column fails this, unlike the bulk checks
    above. Gradients are compared directly (no Adam, no compounding); the
    random-normal batch has no argmax ties at f32."""
    from deepqlearning_tpu.ops.helpers import huber_loss
    from deepqlearning_tpu.ops.pallas.fused_update import fused_grads

    obs_dim, A, B = 2, 4, 512
    gamma, alpha, eps = 0.95, 0.6, 1e-3
    net = create_dueling_network(Chain(
        Flatten(), Dense(obs_dim, 64, jnp.tanh), Dense(64, 64, jnp.tanh),
        Dense(64, A)))
    plan = plan_for(net)
    params = net.init(jax.random.PRNGKey(1))
    ks = jax.random.split(jax.random.PRNGKey(2), 6)
    obs = jax.random.normal(ks[0], (B, obs_dim))
    nobs = jax.random.normal(ks[1], (B, obs_dim))
    action = jax.random.randint(ks[2], (B,), 0, A)
    reward = jax.random.normal(ks[3], (B,))
    done = (jax.random.uniform(ks[4], (B,)) < 0.2).astype(jnp.float32)
    weights = jax.random.uniform(ks[5], (B,), minval=0.5, maxval=1.5)
    q_sp_tgt, _ = net.apply(params, nobs)

    def xla_loss(p):
        q, _ = net.apply(p, obs)
        if double_q:
            q_sp_onl, _ = net.apply(p, nobs)
            best = jnp.argmax(jax.lax.stop_gradient(q_sp_onl), axis=-1)
            q_sp_max = jnp.take_along_axis(q_sp_tgt, best[:, None], -1)[:, 0]
        else:
            q_sp_max = jnp.max(q_sp_tgt, axis=-1)
        q_targets = reward + (1.0 - done) * gamma * q_sp_max
        q_sa = jnp.take_along_axis(q, action[:, None], axis=-1)[:, 0]
        return jnp.sum(huber_loss(weights * (q_sa - q_targets))) / B

    ref_grads = jax.jit(jax.grad(xla_loss))(params)
    grads, td, prio, loss, gnorm = jax.jit(
        lambda p: fused_grads(
            net, plan, p, obs, nobs, action, reward, done, weights,
            q_sp_tgt, gamma=gamma, double_q=double_q, alpha=alpha, eps=eps,
            interpret=False,  # REAL Mosaic
        )
    )(params)
    np.testing.assert_allclose(float(loss), float(jax.jit(xla_loss)(params)),
                               rtol=1e-5)
    for x, y in zip(jax.tree_util.tree_leaves(ref_grads),
                    jax.tree_util.tree_leaves(grads)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-7)


def test_plan_rejects_wide_dueling_heads():
    # A > 128 pads the heads to different widths; the dueling backward only
    # supports equal padding (ADVICE r1 medium) — plan must refuse
    chain = Chain(Dense(4, 64, jnp.tanh), Dense(64, 130))
    net = create_dueling_network(chain)
    assert plan_for(net) is None


def test_td_kernel_compiles_and_matches_on_tpu():
    # td_loss_fused inside make_dqn_train_step at bench batch size
    obs_dim, A, B = 2, 4, 512
    net = create_dueling_network(Chain(
        Flatten(), Dense(obs_dim, 64, jnp.tanh), Dense(64, 64, jnp.tanh),
        Dense(64, A)))
    buf, st = _filled_buffer(obs_dim, 4 * B, B, A, jax.random.PRNGKey(2))
    params = net.init(jax.random.PRNGKey(3))
    ref_step, ref_opt = make_dqn_train_step(net, buf, 0.95, True, 1e-2,
                                            use_pallas=False)
    pal_step, pal_opt = make_dqn_train_step(net, buf, 0.95, True, 1e-2,
                                            use_pallas=True)
    k = jax.random.PRNGKey(11)
    r = jax.jit(ref_step)(params, params, ref_opt.init(params), st, k)
    p = jax.jit(pal_step)(params, params, pal_opt.init(params), st, k)
    np.testing.assert_allclose(float(r.loss), float(p.loss), rtol=1e-3)
    _tree_close(r.params, p.params)


def test_tree_sample_kernel_on_tpu():
    """Whole-descent sampler kernel at the bench shape (256K leaves, 4096
    draws) through real Mosaic: near-total agreement with the XLA descent
    (ulp-boundary draws may pick the adjacent leaf) and self-consistent
    priorities."""
    from deepqlearning_tpu.ops import sumtree
    from deepqlearning_tpu.ops.pallas.tree_sample import (
        sample_pallas,
        supported,
    )

    cap, draws = 1 << 18, 4096
    prios = jax.random.uniform(jax.random.PRNGKey(0), (cap,)) + 0.01
    tree = sumtree.set_priorities(sumtree.init_tree(cap),
                                  jnp.arange(cap), prios)
    assert supported(tree)
    key = jax.random.PRNGKey(7)
    ix, px = jax.jit(lambda k: sumtree.sample(tree, k, draws))(key)
    ik, pk = jax.jit(
        lambda k: sample_pallas(tree, k, draws, interpret=False)
    )(key)
    ix, ik = np.asarray(ix), np.asarray(ik)
    exact = (ix == ik).mean()
    assert exact >= 0.99, exact
    assert np.abs(ix.astype(np.int64) - ik.astype(np.int64)).max() <= 1
    np.testing.assert_allclose(np.asarray(pk), np.asarray(prios)[ik],
                               rtol=1e-5)


def test_tree_sample_production_precision_bound():
    """At PRODUCTION matmul precision (default bf16 passes — overriding the
    lane's f32 pin locally) the descent kernel's draws may differ
    elementwise from the XLA descent (different bf16 roundings of the
    fetched masses), but each draw must land within 0.1% of total mass of
    the exact draw, and the returned priority must be the returned leaf's
    value. This is the contract production actually relies on; elementwise
    agreement under pinned f32 is covered by test_tree_sample_kernel_on_tpu.
    (r4: measured ~98% elementwise mismatch at default precision with
    max |mass deviation| ~1.4e-4 of total.)"""
    from deepqlearning_tpu.ops import sumtree
    from deepqlearning_tpu.ops.pallas.tree_sample import (
        sample_pallas,
        supported,
    )

    cap, draws = 1 << 18, 4096
    prios = jax.random.uniform(jax.random.PRNGKey(0), (cap,)) + 0.01
    tree = sumtree.set_priorities(sumtree.init_tree(cap),
                                  jnp.arange(cap), prios)
    assert supported(tree)
    key = jax.random.PRNGKey(7)
    with jax.default_matmul_precision("default"):
        ix, _ = jax.jit(lambda k: sumtree.sample(tree, k, draws))(key)
        ik, pk = jax.jit(
            lambda k: sample_pallas(tree, k, draws, interpret=False)
        )(key)
    ix, ik = np.asarray(ix), np.asarray(ik)
    p64 = np.asarray(prios, np.float64)
    csum = np.concatenate([[0.0], np.cumsum(p64)])
    total = csum[-1]
    # mass position of each drawn leaf: deviation from the exact draw's
    # position bounded well below a stratum (total/draws = 0.024% here)
    dev = np.abs(csum[ik] - csum[ix]) / total
    assert dev.max() <= 1e-3, dev.max()
    # self-consistency: the returned priority is the RETURNED leaf's value
    # to bf16 fetch precision (the one-hot contraction rounds level values
    # to 8 mantissa bits at default precision -> rel error ~2^-8; the IS
    # weight this feeds is a PER heuristic with alpha/beta knobs, so a 0.4%
    # perturbation is immaterial — under the lane's f32 pin the same check
    # holds at rtol 1e-5, test_tree_sample_kernel_on_tpu)
    np.testing.assert_allclose(np.asarray(pk), np.asarray(prios)[ik],
                               rtol=6e-3)


@pytest.mark.parametrize("logc", [20, 21, 22])
def test_windowed_tree_sample_on_tpu(logc):
    """r5 windowed sampler through real Mosaic at the headline draw count
    (16384) for 2^20 (headline buffer), 2^21 and 2^22 leaves (beyond the
    whole-descent kernel's VMEM wall). Under the lane's f32 pin: same
    near-total agreement contract with the XLA descent as the whole
    kernel, self-consistent priorities."""
    from deepqlearning_tpu.ops import sumtree
    from deepqlearning_tpu.ops.pallas import tree_sample as ts

    cap, draws = 1 << logc, 16384
    prios = jax.random.uniform(jax.random.PRNGKey(0), (cap,)) + 0.01
    tree = sumtree.set_priorities(sumtree.init_tree(cap),
                                  jnp.arange(cap), prios)
    sizes = tuple(l.shape[0] for l in tree)
    assert ts.supported(tree, draws) and ts._windowed_ok(sizes, draws)
    key = jax.random.PRNGKey(7)
    u = jax.random.uniform(key, (draws,))
    u = (jnp.arange(draws, dtype=jnp.float32) + u) / draws

    @jax.jit
    def xla(k):
        idx, _ = sumtree.descend(tree, u * sumtree.total(tree))
        return idx

    ix = np.asarray(xla(key))
    ik, pk = jax.jit(
        lambda k: ts.sample_pallas(tree, k, draws, interpret=False)
    )(key)
    ik = np.asarray(ik)
    # at 2^20+ totals the f32 masses themselves have ulp comparable to a
    # leaf priority, so ulp-boundary draws pick a neighbor more often than
    # at 2^18 (measured exact fractions 0.983/0.973/0.931 for 20/21/22);
    # the mass-position deviation is the real contract: < 2e-6 of total,
    # ~30x below one stratum
    exact = (ix == ik).mean()
    assert exact >= 0.9, exact
    assert np.abs(ix.astype(np.int64) - ik.astype(np.int64)).max() <= 2
    p64 = np.asarray(prios, np.float64)
    csum = np.concatenate([[0.0], np.cumsum(p64)])
    dev = np.abs(csum[ik] - csum[ix]) / csum[-1]
    assert dev.max() <= 1e-5, dev.max()
    # the leaf-window contraction runs EXPLICIT bf16 even under the lane's
    # f32 pin (tree_sample.py: a context HIGHEST pin OOMs scoped VMEM and
    # costs 1.8x), so returned priorities carry bf16 rounding: rtol 6e-3,
    # same contract as the production-precision test
    np.testing.assert_allclose(np.asarray(pk), np.asarray(prios)[ik],
                               rtol=6e-3)


def test_windowed_tree_sample_production_precision_bound_on_tpu():
    """At PRODUCTION matmul precision, the windowed kernel's draws must
    stay within a tight mass-deviation bound of the TRUE (f64) inverse
    CDF. The small upper levels run pinned-f32 stages (PIN_LEVEL) so the
    dominant bf16 error term is gone — measured 1.8e-6 of total at 2^21
    (2.7e-3 before pinning); bound at 10x measured. The boundary and main
    kernels share stage arithmetic, so windows cannot be missed — only
    within-node ties shift."""
    from deepqlearning_tpu.ops import sumtree
    from deepqlearning_tpu.ops.pallas import tree_sample as ts

    cap, draws = 1 << 21, 16384
    prios = jax.random.uniform(jax.random.PRNGKey(0), (cap,)) + 0.01
    tree = sumtree.set_priorities(sumtree.init_tree(cap),
                                  jnp.arange(cap), prios)
    key = jax.random.PRNGKey(7)
    u = jax.random.uniform(key, (draws,))
    u = (jnp.arange(draws, dtype=jnp.float32) + u) / draws
    with jax.default_matmul_precision("default"):
        ik, pk = jax.jit(
            lambda k: ts.sample_pallas(tree, k, draws, interpret=False)
        )(key)
    ik = np.asarray(ik)
    p64 = np.asarray(prios, np.float64)
    csum = np.cumsum(p64)
    mass64 = np.asarray(u, np.float64) * float(sumtree.total(tree))
    true_idx = np.minimum(np.searchsorted(csum, mass64, side="right"),
                          cap - 1)
    csum0 = np.concatenate([[0.0], csum])
    dev = np.abs(csum0[ik] - csum0[true_idx]) / csum[-1]
    assert dev.max() <= 2e-5, dev.max()
    # leaf fetch stays on bf16 passes: returned priority is the returned
    # leaf's value to bf16 precision (same contract as the whole kernel)
    np.testing.assert_allclose(np.asarray(pk), np.asarray(prios)[ik],
                               rtol=6e-3)
