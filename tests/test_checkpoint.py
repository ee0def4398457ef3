"""Checkpoint/restore tests (reference: ``src/solver.jl:290-318``)."""
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from deepqlearning_tpu import Chain, Dense, DeepQLearningSolver, EpsGreedyPolicy
from deepqlearning_tpu.solver import checkpoint


def test_save_load_roundtrip(tmp_path):
    net = Chain(Dense(3, 8), Dense(8, 2))
    params = net.init(jax.random.PRNGKey(0))
    checkpoint.save_params(str(tmp_path), params)
    template = net.init(jax.random.PRNGKey(1))
    loaded = checkpoint.load_params(str(tmp_path), template)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_save_model_best_gating(tmp_path):
    # save iff score >= best (src/solver.jl:290-300)
    params = {"w": jnp.ones(3)}
    saved, best = checkpoint.save_model(str(tmp_path), params, 1.0, -math.inf,
                                        False, verbose=False)
    assert saved and best == 1.0
    saved2, best2 = checkpoint.save_model(str(tmp_path), params, 0.5, best,
                                          saved, verbose=False)
    assert saved2 and best2 == 1.0  # stays saved, best unchanged
    saved3, best3 = checkpoint.save_model(str(tmp_path), params, 2.0, best2,
                                          saved2, verbose=False)
    assert best3 == 2.0


def test_solver_restore_best_model(tmp_path):
    from deepqlearning_tpu import TestMDP

    mdp = TestMDP((3,), 2, 4)
    from deepqlearning_tpu import Flatten

    model = Chain(Flatten(), Dense(6, 8, jnp.tanh), Dense(8, mdp.num_actions))
    solver = DeepQLearningSolver(
        qnetwork=model, max_steps=600, eval_freq=200, save_freq=200,
        num_ep_eval=10, log_freq=200, train_start=100, verbose=False,
        logdir=str(tmp_path),
        exploration_policy=EpsGreedyPolicy(),
    )
    policy = solver.solve(mdp)
    assert os.path.exists(os.path.join(solver.logdir, checkpoint.CKPT_NAME))
    restored = solver.restore_best_model(mdp)
    # restored params equal the checkpointed best (policy was restored too)
    for a, b in zip(jax.tree_util.tree_leaves(policy.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_train_state_roundtrip(tmp_path):
    carry = {"params": {"w": jnp.arange(4.0)}, "step": jnp.asarray(7)}
    checkpoint.save_train_state(str(tmp_path), carry)
    template = {"params": {"w": jnp.zeros(4)}, "step": jnp.asarray(0)}
    loaded = checkpoint.load_train_state(str(tmp_path), template)
    np.testing.assert_allclose(np.asarray(loaded["params"]["w"]),
                               np.arange(4.0))
    assert int(loaded["step"]) == 7


def test_tb_writer_produces_readable_events(tmp_path):
    from deepqlearning_tpu.utils.tb_writer import TBWriter, _masked_crc

    w = TBWriter(str(tmp_path))
    w.log_value("loss", 0.5, step=10)
    w.log_value("eval_reward", 1.5, step=20)
    w.close()
    files = [f for f in os.listdir(tmp_path) if "tfevents" in f]
    assert len(files) == 1
    # verify TFRecord framing: length + masked crc of header
    import struct

    with open(os.path.join(tmp_path, files[0]), "rb") as f:
        data = f.read()
    off, records = 0, 0
    while off < len(data):
        header = data[off:off + 8]
        (length,) = struct.unpack("<Q", header)
        (crc,) = struct.unpack("<I", data[off + 8:off + 12])
        assert crc == _masked_crc(header)
        payload = data[off + 12:off + 12 + length]
        (pcrc,) = struct.unpack("<I", data[off + 12 + length:off + 16 + length])
        assert pcrc == _masked_crc(payload)
        off += 16 + length
        records += 1
    assert records == 3  # file-version event + 2 scalars


def test_full_train_state_resume(tmp_path):
    from deepqlearning_tpu import SimpleGridWorld, EpsGreedyPolicy

    mdp = SimpleGridWorld()
    model = Chain(Dense(2, 8), Dense(8, mdp.num_actions))

    def make():
        return DeepQLearningSolver(
            qnetwork=model, max_steps=300, train_start=100, logdir=str(tmp_path),
            verbose=False, eval_freq=10_000, save_freq=10_000, log_freq=100,
            exploration_policy=EpsGreedyPolicy(),
        )

    p1 = make().solve(mdp)
    assert os.path.exists(os.path.join(str(tmp_path), checkpoint.TRAIN_STATE_NAME))
    # resume continues from the saved optimizer/replay/params
    p2 = make().solve(mdp, resume=True)
    # resumed run trained further: params differ from the checkpointed ones
    a = jax.tree_util.tree_leaves(p1.params)[0]
    b = jax.tree_util.tree_leaves(p2.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_opt_state_layout_conversion_both_ways(tmp_path):
    # a checkpoint saved by the fused-Adam path must resume under the
    # optax.flatten(adam) path and vice versa (same moments, same count)
    from typing import NamedTuple

    import optax

    from deepqlearning_tpu.learner.train_step import (
        FusedAdamState,
        make_optimizer,
    )

    class Carry(NamedTuple):
        params: dict
        opt_state: object

    net = Chain(Dense(3, 8), Dense(8, 2))
    params = net.init(jax.random.PRNGKey(0))
    opt = make_optimizer(1e-3)
    flat = opt.init(params)
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 0.1, params)
    _, flat = opt.update(grads, flat, params)
    _, flat = opt.update(grads, flat, params)

    # flat -> fused
    d1 = str(tmp_path / "flat")
    checkpoint.save_train_state(d1, Carry(params, flat))
    fused_tmpl = Carry(params, FusedAdamState(
        m=jax.tree_util.tree_map(jnp.zeros_like, params),
        v=jax.tree_util.tree_map(jnp.zeros_like, params),
        count=jnp.asarray(0, jnp.int32)))
    loaded = checkpoint.load_train_state(d1, fused_tmpl)
    assert int(loaded.opt_state.count) == 2
    from jax.flatten_util import ravel_pytree

    np.testing.assert_allclose(ravel_pytree(loaded.opt_state.m)[0],
                               np.asarray(flat[0].mu), rtol=1e-6)
    np.testing.assert_allclose(ravel_pytree(loaded.opt_state.v)[0],
                               np.asarray(flat[0].nu), rtol=1e-6)

    # fused -> flat
    d2 = str(tmp_path / "fused")
    checkpoint.save_train_state(d2, Carry(params, loaded.opt_state))
    back = checkpoint.load_train_state(d2, Carry(params, opt.init(params)))
    assert int(back.opt_state[0].count) == 2
    np.testing.assert_allclose(np.asarray(back.opt_state[0].mu),
                               np.asarray(flat[0].mu), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(back.opt_state[0].nu),
                               np.asarray(flat[0].nu), rtol=1e-6)


def test_opt_state_conversion_recurrent_params(tmp_path):
    # the ravel-based conversion is structure-agnostic: an LSTM chain's
    # FusedAdamState (written by the fused DRQN path on TPU) resumes under
    # the optax layout the CPU path uses, and round-trips back
    from typing import NamedTuple

    from deepqlearning_tpu.models.chain import LSTM
    from deepqlearning_tpu.learner.train_step import (
        FusedAdamState,
        make_optimizer,
    )

    class Carry(NamedTuple):
        params: object
        opt_state: object

    net = Chain(LSTM(3, 8), Dense(8, 2))
    params = net.init(jax.random.PRNGKey(0))
    fused = FusedAdamState(
        m=jax.tree_util.tree_map(lambda p: jnp.full_like(p, 0.25), params),
        v=jax.tree_util.tree_map(lambda p: jnp.full_like(p, 0.5), params),
        count=jnp.asarray(7, jnp.int32))
    d = str(tmp_path / "drqn")
    checkpoint.save_train_state(d, Carry(params, fused))
    opt = make_optimizer(1e-3)
    loaded = checkpoint.load_train_state(d, Carry(params, opt.init(params)))
    assert int(loaded.opt_state[0].count) == 7
    from jax.flatten_util import ravel_pytree

    np.testing.assert_allclose(np.asarray(loaded.opt_state[0].mu),
                               ravel_pytree(fused.m)[0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded.opt_state[0].nu),
                               ravel_pytree(fused.v)[0], rtol=1e-6)


def test_full_train_state_resume_recurrent(tmp_path):
    """Resume on the DRQN path: the episode ring (r4 merged shadow-row
    layout), its index records, and the recurrent actor state must all
    roundtrip through the msgpack train-state checkpoint."""
    from deepqlearning_tpu import LSTM, EpsGreedyPolicy, SimpleGridWorld

    mdp = SimpleGridWorld()

    def make():
        return DeepQLearningSolver(
            qnetwork=Chain(LSTM(2, 8), Dense(8, mdp.num_actions)),
            max_steps=400, num_envs=8, train_freq=32, buffer_size=64,
            train_start=64, trace_length=5, recurrence=True, dueling=False,
            max_episode_length=20, logdir=str(tmp_path), verbose=False,
            eval_freq=10_000, save_freq=200, log_freq=200,
            exploration_policy=EpsGreedyPolicy(),
        )

    p1 = make().solve(mdp)
    assert os.path.exists(os.path.join(str(tmp_path),
                                       checkpoint.TRAIN_STATE_NAME))
    p2 = make().solve(mdp, resume=True)
    a = jax.tree_util.tree_leaves(p1.params)[0]
    b = jax.tree_util.tree_leaves(p2.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))
