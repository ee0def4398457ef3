"""Evidence-based scaling projection for the >=80%-at-2-hosts BASELINE
target (VERDICT r3 next #5).

This environment has ONE real TPU chip, so hardware multi-host efficiency
cannot be measured. What CAN be measured:

  1. the exact cross-device traffic of the compiled data-parallel program —
     extracted from the post-SPMD HLO of ``DataParallelRunner.run_segment``
     on a simulated 8-device mesh (all-reduce ops, shapes, count per
     iteration); collective structure depends only on U and the parameter
     count, not the env count, so a small-env compile is exact for the
     headline config's U=32;
  2. the measured single-chip iteration time of the headline config
     (131072 envs -> 104.8M steps/s -> 1251 us/iteration, bench.py r4).

The projection combines them with EXPLICIT interconnect assumptions (the
"How to Scale Your Model" latency+bandwidth model):

  efficiency(N) = t_iter / (t_iter + t_collectives)
  t_collectives = n_allreduce * (hop_latency * n_hops
                                 + 2 * bytes * (N-1)/N / bw_effective)

Run: ``JAX_PLATFORMS=cpu python scripts/r4/scaling_projection.py``
Prints one JSON blob; recorded in docs/scaling_r4.json.
"""
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax

if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

import jax.numpy as jnp

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "f16": 2,
               "pred": 1, "f64": 8, "s64": 8}

# headline measurement (bench.py, r4): 131072 envs, U=32, 104.8M steps/s
T_ITER_US = 131072 / 104.8e6 * 1e6


def collect_allreduces(hlo_text):
    """-> list of (dtype, elems) for every all-reduce in the compiled HLO.

    Line-based: parse the result shape(s) on the lhs of `... = <shapes>
    all-reduce(...)` (handles tuple-shaped combined all-reduces). A
    backtracking whole-text regex here hung for minutes on ~1 MB of HLO.
    """
    out = []
    for line in hlo_text.splitlines():
        if " all-reduce(" not in line and " all-reduce-start(" not in line:
            continue
        lhs = line.split(" all-reduce", 1)[0]
        if "=" in lhs:
            lhs = lhs.split("=", 1)[1]
        for dt, dims in re.findall(r"([a-z0-9]+)\[([0-9,]*)\]", lhs):
            elems = 1
            for d in dims.split(","):
                if d:
                    elems *= int(d)
            out.append((dt, elems))
    return out


def main():
    from deepqlearning_tpu import (
        Chain, DQNConfig, Dense, Flatten, SimpleGridWorld,
        create_dueling_network,
    )
    from deepqlearning_tpu.parallel.mesh import DataParallelRunner, make_mesh
    from deepqlearning_tpu.replay.prioritized import PrioritizedReplayBuffer
    from deepqlearning_tpu.solver.exploration import LinearDecaySchedule

    env = SimpleGridWorld()
    chain = Chain(Flatten(), Dense(2, 64, jnp.tanh), Dense(64, 64, jnp.tanh),
                  Dense(64, env.num_actions))
    network = create_dueling_network(chain)
    # U = 32 exactly as the headline config (num_envs/train_freq = 32);
    # small per-device env count — collective shapes depend only on U and
    # the parameter count
    cfg = DQNConfig(
        num_envs=512, batch_size=512, buffer_size=1 << 14, train_freq=16,
        max_episode_length=100, double_q=True, dueling=True,
        prioritized_replay=True,
    )
    assert cfg.updates_per_iter == 32
    buffer = PrioritizedReplayBuffer(
        env.obs_shape, cfg.buffer_size, cfg.batch_size, prioritized=True)
    runner = DataParallelRunner(
        env, network, buffer, cfg, LinearDecaySchedule(1.0, 0.01, 100_000),
        gamma=env.discount, mesh=make_mesh(8),
    )
    carry = runner.init_carry(jax.random.PRNGKey(0))
    compiled = runner.run_segment.lower(carry, 1).compile()
    hlo = compiled.as_text()

    U = cfg.updates_per_iter
    ars = collect_allreduces(hlo)
    # the grad pmean sits INSIDE the lax.scan over the U sub-updates: it
    # appears once in the HLO but executes U times per iteration
    n_static = len(ars)
    grad_ars = [(dt, e) for dt, e in ars if e > 64]
    scalar_static = n_static - len(grad_ars)
    grad_bytes_per_ar = sum(DTYPE_BYTES.get(dt, 4) * e for dt, e in grad_ars)
    n_dynamic_grad = U * max(len(grad_ars), 1)
    grad_bytes = grad_bytes_per_ar  # per all-reduce invocation

    # ---- projection scenarios (explicit assumptions) ----
    # Per-chip iteration time is the measured single-chip headline number;
    # weak scaling (131072 envs PER CHIP). The U=32 grad pmeans are strictly
    # serialized by the Adam chain, so no overlap is assumed (conservative).
    def project(name, n_chips, hop_lat_us, n_hops, bw_gbps, note):
        n_allreduce = n_dynamic_grad
        bytes_per = grad_bytes_per_ar / max(len(grad_ars), 1)
        t_coll = n_allreduce * (
            hop_lat_us * n_hops
            + 2.0 * bytes_per * (n_chips - 1) / n_chips / bw_gbps / 1e3
        )  # us
        eff = T_ITER_US / (T_ITER_US + t_coll)
        return {
            "scenario": name, "n_chips": n_chips,
            "assumptions": {
                "hop_latency_us": hop_lat_us, "hops_per_allreduce": n_hops,
                "effective_allreduce_bw_GBps": bw_gbps,
            },
            "t_collectives_us_per_iter": round(t_coll, 1),
            "projected_efficiency": round(eff, 4),
            "note": note,
        }

    scenarios = [
        project(
            "v5p, 2 hosts = 8 chips, one pod (ICI 3D torus)",
            8, 1.0, 4, 270.0,
            "2 v5p hosts sit inside one ICI domain (DCN is only cross-pod); "
            "assumptions: 1 us/hop, 4 hops for an 8-chip ring reduction, "
            "3 usable torus axes x 90 GB/s/direction",
        ),
        project(
            "v5e, 2 hosts = 8 chips, one pod (ICI 2D torus)",
            8, 1.0, 4, 90.0,
            "v5e ICI spans the pod; 2 axes x 45 GB/s/direction",
        ),
        project(
            "pessimistic: 2 separate slices over DCN",
            8, 25.0, 1, 6.25,
            "cross-slice data parallelism over DCN (25 us/collective, "
            "6.25 GB/s effective per host) — NOT the deployment this "
            "framework targets for 2 hosts; listed as the bounding case. "
            "Mitigation if ever needed: hierarchical pmean (ICI-first) or "
            "gradient-accumulated sync every k sub-updates",
        ),
    ]

    print(json.dumps({
        "metric": "dp_scaling_projection",
        "measured": {
            "single_chip_iter_us": round(T_ITER_US, 1),
            "headline_env_steps_per_s": 104.8e6,
            "config": "131072 envs/chip, U=32 sub-updates/iter, dueling "
                      "2-64-64-|A| (8837 params)",
        },
        "hlo_collectives_per_iteration": {
            "static_allreduce_ops_in_hlo": n_static,
            "grad_allreduce_ops_static": len(grad_ars),
            "scalar_allreduce_ops_static": scalar_static,
            "bytes_per_grad_allreduce": grad_bytes_per_ar,
            "dynamic_grad_allreduces_per_iteration": n_dynamic_grad,
            "dynamic_grad_bytes_per_iteration": grad_bytes_per_ar * U,
            "source": "post-SPMD HLO of DataParallelRunner.run_segment, "
                      "8-device mesh, scan length 1; the grad pmean sits "
                      "inside the U-sub-update scan (1 static op, U dynamic "
                      "executions)",
        },
        "projections": scenarios,
        "baseline_target": ">=80% efficiency at 2+ hosts (BASELINE.md)",
        "functional_evidence": "tests/test_multihost.py 2-process "
                               "jax.distributed run (green)",
    }, indent=1))


if __name__ == "__main__":
    main()
