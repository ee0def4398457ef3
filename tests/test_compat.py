"""Genericity tests: host-env path and MDP/POMDP adapters.

Mirrors the reference's "Static Array Env" and "Common RL Env" testsets
(``test/runtests.jl:165-234``): arbitrary user environments that are not
vectorizable must still train (10-step solves, loose thresholds — these test
the plumbing, not learning).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepqlearning_tpu import (
    Chain,
    DeepQLearningSolver,
    Dense,
    EpsGreedyPolicy,
    HostEnv,
    LinearDecaySchedule,
    MDPEnv,
)


class SimpleEnv(HostEnv):
    """Port of the inline CommonRL test env (``test/runtests.jl:199-234``):
    state s in {1,2,3}, actions ±1, reward = s, terminates at s >= 3."""

    def __init__(self):
        self.s = 1

    def reset(self):
        self.s = 1

    def observe(self):
        return np.asarray([self.s], np.float32)

    def act(self, a):
        r = self.s
        self.s = max(1, self.s + a)
        return r

    def terminated(self):
        return self.s >= 3

    def actions(self):
        return [-1, 1]


def host_evaluate(env, policy, n_ep=20, max_steps=100):
    avg = 0.0
    for _ in range(n_ep):
        env.reset()
        policy.reset_state()
        r, step = 0.0, 0
        while not env.terminated() and step < max_steps:
            a = policy.action(env.observe())
            r += env.act(a)
            step += 1
        avg += r
    return avg / n_ep


def test_host_env_path():
    env = SimpleEnv()
    model = Chain(Dense(1, 32), Dense(32, 2))
    solver = DeepQLearningSolver(
        qnetwork=model, max_steps=10, learning_rate=0.005, logdir=None,
        verbose=False, double_q=True, dueling=True, prioritized_replay=True,
        exploration_policy=EpsGreedyPolicy(LinearDecaySchedule(1.0, 0.01, 5)),
    )
    policy = solver.solve(env)
    assert host_evaluate(env, policy) > 1.0


class StaticArrayMDP:
    """Port of the inline StaticArrayMDP (``test/runtests.jl:165-197``) as a
    FunctionalMDP problem: s' = s + a, reward = s^2, terminal at s >= 3."""

    num_actions = 2
    discount = 0.95
    action_map = [0, 1]

    def initial_state(self, key):
        return jnp.asarray([1], jnp.int32)

    def gen(self, s, a, key):
        return s + a.astype(jnp.int32)

    def reward(self, s, a, sp):
        return (s[0] ** 2).astype(jnp.float32)

    def isterminal(self, s):
        return s[0] >= 3

    def convert_s(self, s):
        return s.astype(jnp.float32)


def test_functional_mdp_adapter():
    env = MDPEnv(StaticArrayMDP())
    assert env.obs_shape == (1,)
    model = Chain(Dense(1, 32), Dense(32, env.num_actions))
    solver = DeepQLearningSolver(
        qnetwork=model, max_steps=64, learning_rate=0.005, logdir=None,
        verbose=False, double_q=True, dueling=True, prioritized_replay=True,
        train_start=64, buffer_size=256,
        exploration_policy=EpsGreedyPolicy(LinearDecaySchedule(1.0, 0.01, 5)),
    )
    policy = solver.solve(env)
    from deepqlearning_tpu.solver.evaluation import basic_evaluation

    r, _, _ = basic_evaluation(policy.network, policy.params, env, 20, 100,
                               jax.random.PRNGKey(0))
    assert r > 1.0


def test_policy_api_surface():
    env = MDPEnv(StaticArrayMDP())
    model = Chain(Dense(1, 8), Dense(8, 2))
    from deepqlearning_tpu import NNPolicy, getnetwork, resetstate

    params = model.init(jax.random.PRNGKey(0))
    policy = NNPolicy(env, model, params, env.action_map, 1)
    assert policy.action(np.asarray([1.0], np.float32)) in env.action_map
    assert policy.actionvalues(np.asarray([1.0], np.float32)).shape == (2,)
    assert isinstance(policy.value(np.asarray([1.0], np.float32)), float)
    assert getnetwork(policy) is model
    resetstate(policy)
    with pytest.raises(ValueError):
        policy.action(np.zeros((2, 2), np.float32))


def test_policy_converts_raw_states():
    # reference: action(policy, s) converts raw problem states via convert_s
    # (src/policy.jl:66-76); here the env's observe() is the converter
    from deepqlearning_tpu import TestMDP
    from deepqlearning_tpu.envs.test_mdp import TestMDPState

    mdp = TestMDP((3,), 2, 4)
    from deepqlearning_tpu import Chain, Dense, Flatten, NNPolicy

    net = Chain(Flatten(), Dense(6, mdp.num_actions))
    policy = NNPolicy(mdp, net, net.init(jax.random.PRNGKey(0)),
                      mdp.action_map, len(mdp.obs_shape))
    state, _ = mdp.reset(jax.random.PRNGKey(1))
    assert policy.action(state) in mdp.action_map


class MiniPOMDP:
    """Functional POMDP problem for the adapter: hidden bit, noisy obs."""

    num_actions = 2
    discount = 0.9
    action_map = ["stay", "guess"]

    def initial_state(self, key):
        return jax.random.bernoulli(key).astype(jnp.int32)

    def gen(self, s, a, key):
        return s

    def reward(self, s, a, sp):
        return jnp.where(a == 1, jnp.where(s == 1, 1.0, -1.0), 0.0)

    def isterminal(self, s):
        return jnp.asarray(False)

    def observation(self, s, a, sp, key):
        correct = jax.random.bernoulli(key, 0.9)
        return jnp.where(correct, sp, 1 - sp)

    def initial_obs(self, s):
        return s

    def convert_o(self, o):
        return jnp.asarray([o], jnp.float32)


def test_pomdp_adapter():
    from deepqlearning_tpu import POMDPEnv

    env = POMDPEnv(MiniPOMDP())
    assert env.obs_shape == (1,)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (1,)
    state, obs, r, done = env.step(state, jnp.asarray(1), jax.random.PRNGKey(1))
    assert float(r) in (-1.0, 1.0)
    # vectorizes
    states, obss = env.reset_batch(jax.random.PRNGKey(2), 8)
    assert obss.shape == (8, 1)


def test_check_requirements():
    from deepqlearning_tpu.envs.adapters import check_requirements

    check_requirements(StaticArrayMDP())          # complete -> no raise
    check_requirements(MiniPOMDP(), pomdp=True)   # complete -> no raise

    class Incomplete:
        num_actions = 2

    with pytest.raises(TypeError, match="missing"):
        check_requirements(Incomplete())


def test_host_custom_exploration_and_evaluation():
    # function-valued strategies, reference parity
    # (src/exploration_policy.jl:10-12, src/evaluation_policy.jl:10-12)
    env = SimpleEnv()
    model = Chain(Dense(1, 16), Dense(16, 2))
    calls = {"explore": 0, "eval": 0}

    def my_explore(policy, env_, obs, t, rng):
        calls["explore"] += 1
        return (env_.actions()[rng.randint(2)], 0.5)

    def my_eval(network, params, env_, n_eval, max_len, key, verbose):
        calls["eval"] += 1
        return 42.0, 1.0, {"custom": 1.0}

    solver = DeepQLearningSolver(
        qnetwork=model, max_steps=12, train_start=30, eval_freq=4,
        save_freq=10_000, logdir=None, verbose=False,
        prioritized_replay=False, dueling=False, double_q=False,
        exploration_policy=my_explore, evaluation_policy=my_eval,
    )
    solver.solve(env)
    assert calls["explore"] == 12
    assert calls["eval"] >= 1


def test_functional_path_rejects_function_strategy():
    from deepqlearning_tpu import SimpleGridWorld

    solver = DeepQLearningSolver(
        qnetwork=Chain(Dense(2, 4), Dense(4, 4)), logdir=None,
        exploration_policy=lambda p, e, o, t, r: (0, 0.1),
    )
    with pytest.raises(TypeError, match="schedule-based"):
        solver.solve(SimpleGridWorld())


def test_solver_deterministic_given_seed():
    from deepqlearning_tpu import TestMDP

    mdp = TestMDP((3,), 2, 4)
    from deepqlearning_tpu import Flatten

    def run():
        model = Chain(Flatten(), Dense(6, 8), Dense(8, mdp.num_actions))
        s = DeepQLearningSolver(
            qnetwork=model, max_steps=400, train_start=100, logdir=None,
            verbose=False, seed=11, eval_freq=10_000,
            exploration_policy=EpsGreedyPolicy(LinearDecaySchedule(1.0, 0.1, 200)),
        )
        p = s.solve(mdp)
        return p.actionvalues(np.zeros((3, 2), np.float32))

    a, b = run(), run()
    np.testing.assert_allclose(a, b)


def test_solve_auto_wraps_raw_mdp_problem():
    # reference POMDPs.solve accepts a raw MDP and wraps it itself
    # (src/solver.jl:30-38); solve() must do the same for FunctionalMDPs
    model = Chain(Dense(1, 16), Dense(16, 2))
    solver = DeepQLearningSolver(
        qnetwork=model, max_steps=32, logdir=None, verbose=False,
        train_start=32, buffer_size=128,
        exploration_policy=EpsGreedyPolicy(LinearDecaySchedule(1.0, 0.1, 16)),
    )
    policy = solver.solve(StaticArrayMDP())  # no manual MDPEnv wrap
    assert policy.action(np.asarray([1.0], np.float32)) in [0, 1]


def test_solve_auto_wraps_raw_pomdp_problem():
    model = Chain(Dense(1, 16), Dense(16, 2))
    solver = DeepQLearningSolver(
        qnetwork=model, max_steps=32, logdir=None, verbose=False,
        train_start=32, buffer_size=128, max_episode_length=16,
        exploration_policy=EpsGreedyPolicy(LinearDecaySchedule(1.0, 0.1, 16)),
    )
    policy = solver.solve(MiniPOMDP())  # no manual POMDPEnv wrap
    assert policy.action(np.asarray([1.0], np.float32)) in ["stay", "guess"]


def test_solve_rejects_non_problem_objects():
    solver = DeepQLearningSolver(qnetwork=Chain(Dense(1, 2)), logdir=None)
    with pytest.raises(TypeError, match="FunctionalMDP"):
        solver.solve(object())


def test_eval_deterministic_given_key():
    # reset and per-step randomness must come from disjoint splits of the
    # eval key; same key => identical result, different key => decorrelated
    from deepqlearning_tpu import SimpleGridWorld
    from deepqlearning_tpu.solver.evaluation import basic_evaluation

    env = SimpleGridWorld()
    net = Chain(Dense(2, 8), Dense(8, env.num_actions))
    params = net.init(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(3)
    r1, s1, _ = basic_evaluation(net, params, env, 16, 50, k)
    r2, s2, _ = basic_evaluation(net, params, env, 16, 50, k)
    assert (r1, s1) == (r2, s2)
