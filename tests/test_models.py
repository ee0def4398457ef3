"""Unit tests for the Chain/Dense/LSTM/Dueling layer stack.

The reference has no unit tests for its network layer; SURVEY.md §4 mandates
adding them (dueling split semantics from ``src/dueling.jl:36-58``, forward
rule from ``src/dueling.jl:8-11``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepqlearning_tpu import (
    Chain,
    Dense,
    DuelingNetwork,
    Flatten,
    LSTM,
    create_dueling_network,
    isrecurrent,
)


def test_dense_shapes_and_activation():
    layer = Dense(4, 3, activation=jnp.tanh)
    params = layer.init(jax.random.PRNGKey(0))
    x = jnp.ones((7, 4))
    y = layer.apply(params, x)
    assert y.shape == (7, 3)
    assert jnp.all(jnp.abs(y) <= 1.0)


def test_chain_forward_matches_manual():
    chain = Chain(Flatten(), Dense(6, 5, jnp.tanh), Dense(5, 2))
    params = chain.init(jax.random.PRNGKey(1))
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 2, 3))
    y, _ = chain.apply(params, x)
    flat = x.reshape(3, 6)
    h = jnp.tanh(flat @ params[1]["w"] + params[1]["b"])
    expected = h @ params[2]["w"] + params[2]["b"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(expected), rtol=1e-5)


def test_isrecurrent():
    assert not isrecurrent(Chain(Dense(2, 3)))
    assert isrecurrent(Chain(Flatten(), LSTM(4, 8), Dense(8, 2)))


def test_lstm_state_carry():
    net = Chain(LSTM(3, 4), Dense(4, 2))
    params = net.init(jax.random.PRNGKey(0))
    state = net.init_state(5)
    x = jnp.ones((5, 3))
    y1, s1 = net.apply(params, x, state)
    y2, s2 = net.apply(params, x, s1)
    assert y1.shape == (5, 2)
    # state advanced: outputs differ between steps
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    # zero state reproduces first output
    y1b, _ = net.apply(params, x, net.init_state(5))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y1b))


def test_dueling_split_structure():
    # reference semantics (src/dueling.jl:36-58): split at last non-Dense
    chain = Chain(Flatten(), Dense(100, 8, jnp.tanh), Dense(8, 4))
    duel = create_dueling_network(chain)
    assert isinstance(duel, DuelingNetwork)
    assert len(duel.base.layers) == 1  # Flatten
    assert len(duel.adv.layers) == 2
    assert len(duel.val.layers) == 2
    assert duel.val.layers[-1].out_dim == 1
    assert duel.adv.layers[-1].out_dim == 4


def test_dueling_forward_rule():
    # Q = V + A - mean(A) (src/dueling.jl:8-11)
    chain = Chain(Dense(3, 4))
    duel = create_dueling_network(chain)
    params = duel.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 3))
    q, _ = duel.apply(params, x)
    v, _ = duel.val.apply(params["val"], x)
    a, _ = duel.adv.apply(params["adv"], x)
    expected = v + a - a.mean(axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(q), np.asarray(expected), rtol=1e-5)
    # advantages have zero mean contribution: row means of q equal v
    np.testing.assert_allclose(
        np.asarray(q.mean(-1)), np.asarray(v[:, 0]), rtol=1e-4, atol=1e-5
    )


def test_dueling_rejects_no_trailing_dense():
    with pytest.raises(ValueError):
        create_dueling_network(Chain(Dense(3, 4), Flatten()))


def test_dueling_recurrent_base():
    chain = Chain(Flatten(), LSTM(4, 8), Dense(8, 3))
    duel = create_dueling_network(chain)
    assert duel.recurrent
    assert len(duel.base.layers) == 2
    params = duel.init(jax.random.PRNGKey(0))
    state = duel.init_state(2)
    q, s = duel.apply(params, jnp.ones((2, 2, 2)), state)
    assert q.shape == (2, 3)


def test_conv2d_layer():
    from deepqlearning_tpu import Conv2D

    net = Chain(Conv2D(3, 8, (3, 3), activation=jnp.tanh),
                Conv2D(8, 4, (3, 3), stride=(2, 2)), Flatten(),
                Dense(4 * 4 * 4, 2))
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 8, 8, 3))
    y, _ = net.apply(params, x)
    assert y.shape == (5, 2)
    # dueling split works with a conv base
    duel = create_dueling_network(net)
    assert len(duel.base.layers) == 3
    q, _ = duel.apply(duel.init(jax.random.PRNGKey(2)), x)
    assert q.shape == (5, 2)


def test_gru_layer():
    from deepqlearning_tpu import GRU

    net = Chain(GRU(3, 6), Dense(6, 2))
    assert isrecurrent(net)
    params = net.init(jax.random.PRNGKey(0))
    s = net.init_state(4)
    x = jnp.ones((4, 3))
    y1, s1 = net.apply(params, x, s)
    y2, _ = net.apply(params, x, s1)
    assert y1.shape == (4, 2)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_apply_sequence_matches_stepwise():
    # the hoisted-input sequence path must equal per-step apply exactly
    from deepqlearning_tpu import GRU

    for net in [Chain(Flatten(), LSTM(4, 8), Dense(8, 3)),
                Chain(GRU(4, 6), Dense(6, 3)),
                create_dueling_network(Chain(Flatten(), LSTM(4, 8), Dense(8, 3)))]:
        params = net.init(jax.random.PRNGKey(0))
        T, B = 5, 3
        xs = jax.random.normal(jax.random.PRNGKey(1), (T, B, 2, 2))
        if isinstance(net.layers[0] if hasattr(net, "layers") else None, type(GRU(1, 1))):
            xs = xs.reshape(T, B, 4)
        state = net.init_state(B)
        seq_out, seq_state = net.apply_sequence(params, xs, state)
        outs = []
        s = state
        for t in range(T):
            y, s = net.apply(params, xs[t], s)
            outs.append(y)
        np.testing.assert_allclose(np.asarray(seq_out), np.asarray(jnp.stack(outs)),
                                   rtol=2e-5, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(seq_state),
                        jax.tree_util.tree_leaves(s)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                       atol=1e-6)
