"""Data-parallel mesh tests on the simulated 8-device CPU mesh
(SURVEY.md §4: the TPU-native analog of multi-node tests).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from deepqlearning_tpu import (
    Chain,
    Dense,
    DQNConfig,
    Flatten,
    TestMDP,
    create_dueling_network,
)
from deepqlearning_tpu.parallel.mesh import DataParallelRunner, make_mesh
from deepqlearning_tpu.replay.prioritized import PrioritizedReplayBuffer
from deepqlearning_tpu.solver.exploration import LinearDecaySchedule

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 simulated devices"
)


def _runner(n_dev=8, **cfg_kw):
    env = TestMDP((5, 5), 4, 6)
    chain = Chain(Flatten(), Dense(100, 16, jnp.tanh), Dense(16, env.num_actions))
    network = create_dueling_network(chain)
    cfg = DQNConfig(
        num_envs=2, batch_size=8, buffer_size=64, train_freq=2,
        train_start=8, max_episode_length=6, **cfg_kw
    )
    buffer = PrioritizedReplayBuffer(
        env.obs_shape, cfg.buffer_size, cfg.batch_size, prioritized=True
    )
    mesh = make_mesh(n_dev)
    return DataParallelRunner(
        env, network, buffer, cfg, LinearDecaySchedule(1.0, 0.1, 100),
        gamma=env.discount, mesh=mesh,
    )


def test_dp_step_runs_and_keeps_params_replicated():
    runner = _runner()
    carry = runner.init_carry(jax.random.PRNGKey(0))
    carry = runner.run_populate(carry, 8)
    carry = runner.run_segment(carry, 3)
    assert np.isfinite(float(carry.loss[0]))
    leaf = jax.tree_util.tree_leaves(carry.params)[0]
    for d in range(1, runner.n_devices):
        np.testing.assert_allclose(
            np.asarray(leaf[0]), np.asarray(leaf[d]), rtol=1e-6
        )


def test_dp_replay_shards_differ():
    runner = _runner()
    carry = runner.init_carry(jax.random.PRNGKey(0))
    carry = runner.run_populate(carry, 8)
    # each device collected its own experience: reward shards differ
    # (decoded scalar column 1 = reward in the merged-row layout)
    rew = np.asarray(carry.replay.rows[..., -3])
    assert rew.shape[0] == 8
    assert not np.allclose(rew[0], rew[1])


def test_dp_env_steps_advance():
    runner = _runner()
    carry = runner.init_carry(jax.random.PRNGKey(0))
    carry = runner.run_segment(carry, 5)
    # each device advanced num_envs * steps_per_iter * 5 steps
    t = np.asarray(carry.actor.t)
    assert (t == t[0]).all() and t[0] == 5 * runner.cfg.env_steps_per_iter


def test_pod_mesh_helpers_single_process():
    # single-process degrade: hybrid mesh is 1 x N, flat mesh covers all
    # devices, shard plan arithmetic checks out
    from deepqlearning_tpu.parallel.multihost import (
        hybrid_mesh,
        pod_data_mesh,
        pod_shard_plan,
    )

    hm = hybrid_mesh()
    assert hm.devices.shape == (1, len(jax.devices()))
    assert hm.axis_names == ("dcn", "ici")
    flat = pod_data_mesh()
    assert flat.devices.size == len(jax.devices())
    plan = pod_shard_plan(global_num_envs=32, batch_size=8, mesh=flat)
    assert plan.envs_per_device * plan.global_devices == 32
    assert plan.local_envs == 32  # single process owns everything
    with pytest.raises(ValueError, match="divisible"):
        pod_shard_plan(global_num_envs=flat.devices.size + 1, batch_size=8,
                       mesh=flat)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 4)
    ge.dryrun_multichip(8)


def test_dp_recurrent_path():
    from deepqlearning_tpu import LSTM
    from deepqlearning_tpu.replay.episode import EpisodeReplayBuffer

    env = TestMDP((5, 5), 1, 6)
    network = Chain(Flatten(), LSTM(25, 8), Dense(8, env.num_actions))
    cfg = DQNConfig(
        num_envs=2, batch_size=4, buffer_size=16, train_freq=2,
        train_start=8, max_episode_length=6, recurrence=True,
        trace_length=5, dueling=False,
    )
    buffer = EpisodeReplayBuffer(
        env.obs_shape, cfg.buffer_size, cfg.batch_size, cfg.trace_length,
        cfg.max_episode_length, num_envs=cfg.num_envs,
    )
    runner = DataParallelRunner(
        env, network, buffer, cfg, LinearDecaySchedule(1.0, 0.1, 100),
        gamma=env.discount, mesh=make_mesh(8),
    )
    carry = runner.init_carry(jax.random.PRNGKey(0))
    carry = runner.run_populate(carry, 8)  # enough steps to commit episodes
    carry = runner.run_segment(carry, 2)
    assert np.isfinite(float(carry.loss[0]))
    leaf = jax.tree_util.tree_leaves(carry.params)[0]
    np.testing.assert_allclose(np.asarray(leaf[0]), np.asarray(leaf[-1]),
                               rtol=1e-6)
