"""Data-parallel scaling efficiency on a simulated device mesh.

BASELINE.md targets ">=80% scaling efficiency at 2+ hosts"; no multi-chip
hardware is available, so this measures the stand-in the VERDICT asked for:
aggregate env-steps/s of the DataParallelRunner at 1/2/4/8 shards on an
8-device forced-host CPU mesh, with fixed per-device work (weak scaling).
Efficiency_D = sps_D / (D * sps_1). CPU devices share host cores, so the
absolute numbers are meaningless — the *ratio* shows whether the sharded
program introduces collective/serialization overhead beyond the one grad
all-reduce.

Run: ``python scripts/scaling_bench.py``. Prints one JSON line.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# belt-and-braces: the env var alone is not always honored once the axon
# TPU plugin registers (verify SKILL.md gotcha)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def measure(n_devices: int, n_iters: int = 30) -> float:
    from deepqlearning_tpu import (
        Chain, Dense, DQNConfig, Flatten, SimpleGridWorld,
        create_dueling_network,
    )
    from deepqlearning_tpu.parallel.mesh import DataParallelRunner, make_mesh
    from deepqlearning_tpu.replay.prioritized import PrioritizedReplayBuffer
    from deepqlearning_tpu.solver.exploration import LinearDecaySchedule

    env = SimpleGridWorld()
    chain = Chain(Flatten(), Dense(2, 64, jnp.tanh), Dense(64, 64, jnp.tanh),
                  Dense(64, env.num_actions))
    network = create_dueling_network(chain)
    cfg = DQNConfig(
        num_envs=512, batch_size=256, buffer_size=1 << 14, train_freq=512,
        max_episode_length=100, double_q=True, dueling=True,
        prioritized_replay=True,
    )
    buffer = PrioritizedReplayBuffer(
        env.obs_shape, cfg.buffer_size, cfg.batch_size,
        alpha=cfg.prioritized_replay_alpha, beta=cfg.prioritized_replay_beta,
        eps=cfg.prioritized_replay_epsilon, prioritized=True,
    )
    runner = DataParallelRunner(
        env, network, buffer, cfg,
        LinearDecaySchedule(1.0, 0.01, 100_000), gamma=env.discount,
        mesh=make_mesh(n_devices),
    )
    carry = runner.init_carry(jax.random.PRNGKey(0))
    carry = runner.run_populate(carry, 2)
    carry = runner.run_segment(carry, n_iters)   # warm-up + compile
    float(carry.loss[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        carry = runner.run_segment(carry, n_iters)
        float(carry.loss[0])
        best = min(best, time.perf_counter() - t0)
    return n_iters * cfg.env_steps_per_iter * n_devices / best


def main():
    results = {}
    for d in (1, 2, 4, 8):
        results[d] = measure(d)
    eff = {d: results[d] / (d * results[1]) for d in results}
    print(json.dumps({
        "metric": "dp_scaling_efficiency",
        "mesh": "8x forced-host CPU devices (weak scaling, 512 envs/shard)",
        "aggregate_steps_per_s": {str(d): round(v, 1) for d, v in results.items()},
        "efficiency": {str(d): round(v, 3) for d, v in eff.items()},
        "value": round(eff[8], 3),
        "unit": "efficiency@8",
        "vs_baseline": round(eff[8] / 0.8, 3),
    }))


if __name__ == "__main__":
    main()
