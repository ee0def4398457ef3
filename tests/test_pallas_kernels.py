"""Pallas kernel tests (interpret mode on CPU) against the jnp reference
implementations.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepqlearning_tpu.ops.helpers import huber_loss
from deepqlearning_tpu.ops.pallas.td_kernel import td_loss_fused


def _ref(q_s, q_sp_onl, q_sp_tgt, a, r, d, w, gamma, alpha, eps, double_q):
    if double_q:
        best = jnp.argmax(q_sp_onl, -1)
        q_max = jnp.take_along_axis(q_sp_tgt, best[:, None], -1)[:, 0]
    else:
        q_max = q_sp_tgt.max(-1)
    tgt = r + (1 - d) * gamma * q_max
    q_sa = jnp.take_along_axis(q_s, a[:, None], -1)[:, 0]
    td = q_sa - tgt
    loss = jnp.sum(huber_loss(w * td)) / q_s.shape[0]
    prio = (jnp.abs(td) + eps) ** alpha
    return loss, td, prio


@pytest.mark.parametrize("double_q", [True, False])
def test_td_kernel_matches_reference(double_q):
    B, A = 32, 4
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 7)
    q_s = jax.random.normal(ks[0], (B, A))
    q_onl = jax.random.normal(ks[1], (B, A))
    q_tgt = jax.random.normal(ks[2], (B, A))
    a = jax.random.randint(ks[3], (B,), 0, A)
    r = jax.random.normal(ks[4], (B,))
    d = (jax.random.uniform(ks[5], (B,)) < 0.2).astype(jnp.float32)
    w = jax.random.uniform(ks[6], (B,), minval=0.5, maxval=1.5)

    loss, td, prio = td_loss_fused(q_s, q_onl, q_tgt, a, r, d, w,
                                   0.95, 0.6, 1e-3, double_q, True)
    rl, rtd, rp = _ref(q_s, q_onl, q_tgt, a, r, d, w, 0.95, 0.6, 1e-3, double_q)
    np.testing.assert_allclose(float(loss), float(rl), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(td), np.asarray(rtd), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(prio), np.asarray(rp), rtol=1e-5)


def test_td_kernel_gradient_matches_reference():
    B, A = 16, 4
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 7)
    q_s = jax.random.normal(ks[0], (B, A))
    q_onl = jax.random.normal(ks[1], (B, A))
    q_tgt = jax.random.normal(ks[2], (B, A))
    a = jax.random.randint(ks[3], (B,), 0, A)
    r = jax.random.normal(ks[4], (B,))
    d = jnp.zeros((B,))
    w = jnp.ones((B,))

    def f_kernel(q):
        loss, _, _ = td_loss_fused(q, q_onl, q_tgt, a, r, d, w,
                                   0.95, 0.6, 1e-3, True, True)
        return loss

    def f_ref(q):
        loss, _, _ = _ref(q, q_onl, q_tgt, a, r, d, w, 0.95, 0.6, 1e-3, True)
        return loss

    gk = jax.grad(f_kernel)(q_s)
    gr = jax.grad(f_ref)(q_s)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), rtol=1e-5,
                               atol=1e-7)


def test_tree_sample_kernel_matches_xla_descent():
    """The whole-descent Pallas kernel (ops/pallas/tree_sample.py) must make
    the exact draws of sumtree.sample — same uniforms, same selection — for
    single-stage, two-stage, and root-only level structures."""
    from deepqlearning_tpu.ops import sumtree
    from deepqlearning_tpu.ops.pallas.tree_sample import (
        sample_pallas,
        supported,
    )

    for cap, draws in ((64, 32), (4096, 600), (262144, 512)):
        tree = sumtree.init_tree(cap)
        prios = (
            jax.random.uniform(jax.random.PRNGKey(cap), (cap,)) + 0.01
        )
        tree = sumtree.set_priorities(tree, jnp.arange(cap), prios)
        assert supported(tree)
        key = jax.random.PRNGKey(7)
        ix, px = sumtree.sample(tree, key, draws)
        ik, pk = sample_pallas(tree, key, draws, interpret=True)
        ix, ik = np.asarray(ix), np.asarray(ik)
        # the kernel's prefix-sum is a triangular matmul, the XLA path a
        # sequential cumsum: a mass landing within an ulp of a child
        # boundary may select the adjacent leaf. Require near-total exact
        # agreement and adjacency for the rest; the returned priority must
        # be the RETURNED leaf's value either way.
        exact = ix == ik
        assert exact.mean() >= 0.99, exact.mean()
        assert np.abs(ix - ik).max() <= 1
        np.testing.assert_allclose(
            np.asarray(pk), np.asarray(prios)[ik], rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(px), np.asarray(prios)[ix], rtol=1e-6)


def test_tree_sample_kernel_distribution():
    # proportionality sanity: heavy leaf drawn ~proportionally more
    from deepqlearning_tpu.ops import sumtree
    from deepqlearning_tpu.ops.pallas.tree_sample import sample_pallas

    cap = 1024
    prios = jnp.ones((cap,)).at[3].set(float(cap))
    tree = sumtree.set_priorities(sumtree.init_tree(cap),
                                  jnp.arange(cap), prios)
    idx, p = sample_pallas(tree, jax.random.PRNGKey(0), 2048,
                           interpret=True)
    frac = float(np.mean(np.asarray(idx) == 3))
    # leaf 3 holds cap/(2*cap - 1) ~ 50% of the mass
    assert 0.4 < frac < 0.6, frac
    np.testing.assert_allclose(np.asarray(p),
                               np.asarray(prios)[np.asarray(idx)])


def test_windowed_tree_sample_matches_xla_descent():
    """The windowed kernel (r5): per-chunk leaf windows bounded by a
    boundary descent, scalar-prefetched window bases. Must agree with the
    XLA descent to the same contract as the whole-descent kernel (>=99%
    exact, off-by-one on summation-order ties), and its returned priority
    must be the returned leaf's value."""
    from deepqlearning_tpu.ops import sumtree
    from deepqlearning_tpu.ops.pallas import tree_sample as ts

    C, D = 1 << 19, 2048
    prios = jax.random.uniform(jax.random.PRNGKey(1), (C,)) + 0.01
    tree = sumtree.set_priorities(sumtree.init_tree(C), jnp.arange(C), prios)
    sizes = tuple(l.shape[0] for l in tree)
    assert ts._windowed_ok(sizes, D)          # the gate routes to windowed
    key = jax.random.PRNGKey(7)

    u = jax.random.uniform(key, (D,))
    u = (jnp.arange(D, dtype=jnp.float32) + u) / D
    mass = u * sumtree.total(tree)
    ix, _ = sumtree.descend(tree, mass)

    iw, pw = ts.sample_pallas(tree, key, D, interpret=True)
    ix, iw = np.asarray(ix), np.asarray(iw)
    assert (ix == iw).mean() >= 0.99
    assert np.abs(ix.astype(np.int64) - iw.astype(np.int64)).max() <= 1
    np.testing.assert_allclose(np.asarray(pw), np.asarray(prios)[iw],
                               rtol=1e-6)


def test_windowed_tree_sample_overflow_falls_back_exactly():
    """Extreme priority skew (a chunk spanning far more leaf blocks than
    the window) must trip the pre-kernel overflow flag and produce the XLA
    descent's exact draws."""
    from deepqlearning_tpu.ops import sumtree
    from deepqlearning_tpu.ops.pallas import tree_sample as ts

    C, D = 1 << 19, 2048
    p = jnp.full((C,), 1e-4).at[: C // 64].set(10.0)
    tree = sumtree.set_priorities(sumtree.init_tree(C), jnp.arange(C), p)
    key = jax.random.PRNGKey(3)
    u = jax.random.uniform(key, (D,))
    u = (jnp.arange(D, dtype=jnp.float32) + u) / D
    ix, _ = sumtree.descend(tree, u * sumtree.total(tree))
    iw, pw = ts.sample_pallas(tree, key, D, interpret=True)
    np.testing.assert_array_equal(np.asarray(ix), np.asarray(iw))
    np.testing.assert_allclose(np.asarray(pw), np.asarray(p)[np.asarray(iw)],
                               rtol=1e-6)


def test_windowed_gate_small_draws_use_whole_kernel():
    """Small draw counts must keep the whole-descent kernel (windows would
    be degenerate); beyond its VMEM cap with small draws, supported() must
    say no so the buffer falls back to the XLA descent."""
    from deepqlearning_tpu.ops import sumtree
    from deepqlearning_tpu.ops.pallas import tree_sample as ts

    small = sumtree.init_tree(1 << 16)
    assert ts.supported(small, 512)           # whole kernel fine
    big = sumtree.init_tree(1 << 22)
    assert not ts.supported(big, 512)         # too big for VMEM, too few draws
    assert ts.supported(big, 16384)           # windowed path
