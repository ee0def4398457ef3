"""Unit tests for the functional environments.

``TestMDP`` semantics are pinned to the reference fixture
(``test/test_env.jl:10-87``): optimal policy [1,0,1,0,2] (0-indexed) scores
2.1 undiscounted over the 5-step horizon (``test/test_env.jl:5-8``).
"""
import jax
import jax.numpy as jnp
import numpy as np

from deepqlearning_tpu import SimpleGridWorld, TestMDP, TigerPOMDP
from deepqlearning_tpu.envs.base import auto_reset


def rollout(env, actions, key):
    state, obs = env.reset(key)
    total, rewards = 0.0, []
    for a in actions:
        key, k = jax.random.split(key)
        state, obs, r, done = env.step(state, jnp.asarray(a, jnp.int32), k)
        rewards.append(float(r))
        total += float(r)
        if bool(done):
            break
    return total, rewards, bool(done)


def test_testmdp_optimal_policy_value():
    env = TestMDP((5, 5), 4, 6)
    total, rewards, done = rollout(env, [1, 0, 1, 0, 2], jax.random.PRNGKey(0))
    assert done
    assert len(rewards) == 5
    # optimal value 2.1 (test/test_env.jl:7)
    np.testing.assert_allclose(total, 2.1, atol=1e-5)


def test_testmdp_bad_policy_punished():
    env = TestMDP((5, 5), 4, 6)
    # visiting room 1 (reference state 2) multiplies next reward by -10
    total, rewards, _ = rollout(env, [1, 2, 2, 2, 2], jax.random.PRNGKey(0))
    # after room1, landing in room2 (+0.1) is flipped to -1.0
    assert rewards[1] == -1.0


def test_testmdp_obs_shape_and_range():
    env = TestMDP((5, 5), 4, 6)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (5, 5, 4) == env.obs_shape
    assert float(obs.min()) >= 0.0 and float(obs.max()) <= 1.0


def test_testmdp_horizon():
    env = TestMDP((5, 5), 4, 6)
    state, obs = env.reset(jax.random.PRNGKey(0))
    for i in range(5):
        state, obs, r, done = env.step(state, jnp.asarray(0), jax.random.PRNGKey(i))
    assert bool(done)


def test_gridworld_reward_and_terminal():
    env = SimpleGridWorld()
    from deepqlearning_tpu.envs.gridworld import GridWorldState

    state = GridWorldState(pos=jnp.asarray([9, 3], jnp.int32),
                           terminal=jnp.asarray(False))
    state, obs, r, done = env.step(state, jnp.asarray(0), jax.random.PRNGKey(0))
    assert float(r) == 10.0 and bool(done)
    np.testing.assert_allclose(np.asarray(obs), [-1.0, -1.0])


def test_gridworld_moves_stay_on_grid():
    env = SimpleGridWorld(tprob=1.0)
    from deepqlearning_tpu.envs.gridworld import GridWorldState

    state = GridWorldState(pos=jnp.asarray([1, 1], jnp.int32),
                           terminal=jnp.asarray(False))
    # move left from (1,1): stays
    state, obs, r, done = env.step(state, jnp.asarray(2), jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(obs), [1.0, 1.0])
    assert float(r) == 0.0 and not bool(done)


def test_gridworld_batch_step_and_autoreset():
    env = SimpleGridWorld()
    key = jax.random.PRNGKey(0)
    states, obs = env.reset_batch(key, 16)
    actions = jnp.zeros((16,), jnp.int32)
    states, obs2, r, done = env.step_batch(states, actions, jax.random.PRNGKey(1))
    assert obs2.shape == (16, 2)
    new_state, new_obs, ended = auto_reset(
        env, states, obs2, done, jnp.zeros_like(done), jax.random.PRNGKey(2)
    )
    # after auto-reset no observation is the terminal marker
    assert not np.any(np.asarray(new_obs) == -1.0)


def test_tiger_listen_and_open():
    env = TigerPOMDP(p_correct=1.0)
    state, obs = env.reset(jax.random.PRNGKey(3))
    # listening is non-terminal with r_listen
    state, obs, r, done = env.step(state, jnp.asarray(2), jax.random.PRNGKey(0))
    assert float(r) == -1.0 and not bool(done)
    # with p_correct=1 the observation reveals the tiger; opening the other
    # door escapes
    tiger_left = bool(state.tiger_left)
    open_action = 1 if tiger_left else 0
    state, obs, r, done = env.step(
        state, jnp.asarray(open_action), jax.random.PRNGKey(1)
    )
    assert float(r) == 10.0 and bool(done)


def test_cartpole_physics_and_learning_signal():
    from deepqlearning_tpu import CartPole

    env = CartPole()
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4,)
    # constant-left policy falls over within a few hundred steps
    done_at = None
    for t in range(500):
        state, obs, r, done = env.step(state, jnp.asarray(0), jax.random.PRNGKey(t))
        assert float(r) == 1.0
        if bool(done):
            done_at = t
            break
    assert done_at is not None and done_at < 300
    # batch step works
    states, obss = env.reset_batch(jax.random.PRNGKey(1), 32)
    states, obss, r, d = env.step_batch(states, jnp.zeros(32, jnp.int32),
                                        jax.random.PRNGKey(2))
    assert obss.shape == (32, 4)


def test_mountain_car_pump_policy_reaches_goal():
    from deepqlearning_tpu import MountainCar

    env = MountainCar()
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (2,) == env.obs_shape
    # energy-pumping policy: push in the direction of motion; solves the
    # valley escape in well under 200 steps from any start
    done_at = None
    for t in range(250):
        a = 2 if float(state.velocity) >= 0.0 else 0
        state, obs, r, done = env.step(state, jnp.asarray(a, jnp.int32),
                                       jax.random.PRNGKey(t))
        assert float(r) == -1.0
        if bool(done):
            done_at = t
            break
    assert done_at is not None and done_at < 200
    assert float(state.position) >= env.goal_position


def test_mountain_car_wall_and_speed_clamps():
    from deepqlearning_tpu import MountainCar
    from deepqlearning_tpu.envs.mountain_car import MountainCarState

    env = MountainCar()
    # driving hard left from the left edge: position clamps, velocity zeroed
    state = MountainCarState(position=jnp.asarray(env.min_position),
                             velocity=jnp.asarray(-env.max_speed))
    state, obs, r, done = env.step(state, jnp.asarray(0), jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(state.position), env.min_position, atol=1e-6)
    assert float(state.velocity) == 0.0 and not bool(done)
    # speed clamp holds under max thrust
    state = MountainCarState(position=jnp.asarray(-0.5),
                             velocity=jnp.asarray(env.max_speed))
    state, _, _, _ = env.step(state, jnp.asarray(2), jax.random.PRNGKey(1))
    assert abs(float(state.velocity)) <= env.max_speed + 1e-9


def test_acrobot_dynamics_invariants():
    from deepqlearning_tpu import Acrobot

    env = Acrobot()
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (6,) == env.obs_shape
    # near-rest start is far from the goal: not done
    # cos/sin components stay normalized, velocities stay clipped, and the
    # tip-height termination rule is respected along a random rollout
    key = jax.random.PRNGKey(1)
    for t in range(50):
        key, ka, ks = jax.random.split(key, 3)
        a = jax.random.randint(ka, (), 0, 3)
        state, obs, r, done = env.step(state, a, ks)
        assert float(r) == -1.0
        o = np.asarray(obs)
        np.testing.assert_allclose(o[0] ** 2 + o[1] ** 2, 1.0, atol=1e-5)
        np.testing.assert_allclose(o[2] ** 2 + o[3] ** 2, 1.0, atol=1e-5)
        assert abs(o[4]) <= float(env.MAX_VEL_1) + 1e-6
        assert abs(o[5]) <= float(env.MAX_VEL_2) + 1e-6
        height = -o[0] - np.cos(np.arctan2(o[1], o[0]) + np.arctan2(o[3], o[2]))
        if bool(done):
            assert height > 1.0 - 1e-5
            break
        assert np.all(np.isfinite(o))


def test_acrobot_batch_step_jits():
    from deepqlearning_tpu import Acrobot

    env = Acrobot()
    states, obss = env.reset_batch(jax.random.PRNGKey(2), 16)
    step = jax.jit(env.step_batch)
    states, obss, r, d = step(states, jnp.ones(16, jnp.int32), jax.random.PRNGKey(3))
    assert obss.shape == (16, 6)
    assert np.all(np.isfinite(np.asarray(obss)))
