"""Multi-seed stability study of the headline-scale learning run (VERDICT r4
next-step #1).

Round 4's single 131072-env run ended with its FINAL eval collapsed from
~8.3 to 2.36 — a ~24σ drop at 256 eval episodes, so a real terminal policy
degradation, not eval noise — and ``docs/results_r4.json`` reported a number
matching no artifact. This harness answers whether the collapse is real and
systematic:

* ``mode=seeds`` — N independent seeds of the exact r4 headline config
  (SimpleGridWorld, dueling DDQN PER, 131072 envs, batch 512,
  train_freq 4096 → U=32 grouped sub-updates, buffer 2^20). Each run also
  re-evaluates the FINAL params 5× with fresh eval keys (separates policy
  state from eval variance) and logs a fine-grained per-iteration eval tail
  over the last ``FINE_TAIL`` iterations via eval_freq = steps/iter.
* ``mode=ungrouped`` — the staleness control: ``grouped_updates=False``
  re-samples and updates priorities between every one of the 32 sub-updates
  (no within-group priority staleness; VERDICT's prime suspect).
* ``mode=extended`` — trains 50% longer to see whether a terminal dip is a
  transient of the oscillating late regime or an absorbing divergence.

Reference contract being probed: "it learns" at threshold
(``test/runtests.jl:45-111``) — here at the scale the framework claims as
its win.

Run (TPU): ``python scripts/r5/headline_stability.py seeds 0 1 2``
Appends one JSON line per run to ``docs/headline_stability_r5.jsonl``.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "docs", "headline_stability_r5.jsonl")


def run_one(seed: int, num_envs: int, updates_target: int, grouped: bool,
            eval_points: int = 40, decay_updates: int = None):
    from deepqlearning_tpu import (
        Chain,
        DeepQLearningSolver,
        Dense,
        EpsGreedyPolicy,
        Flatten,
        LinearDecaySchedule,
        SimpleGridWorld,
    )
    from deepqlearning_tpu.solver.evaluation import evaluation, basic_evaluation

    train_freq = 4096
    max_steps = updates_target * train_freq
    buffer_size = 1 << max(18, (8 * num_envs - 1).bit_length())

    env = SimpleGridWorld()
    chain = Chain(Flatten(), Dense(2, 64, jnp.tanh), Dense(64, 64, jnp.tanh),
                  Dense(64, env.num_actions))
    solver = DeepQLearningSolver(
        qnetwork=chain,
        num_envs=num_envs, batch_size=512, buffer_size=buffer_size,
        train_freq=train_freq, max_steps=max_steps,
        learning_rate=float(os.environ.get("LR", "5e-3")),
        max_episode_length=100,
        double_q=True, dueling=True, prioritized_replay=True,
        target_update_freq=train_freq * 128,
        eval_freq=max_steps // eval_points, num_ep_eval=256,
        log_freq=max_steps // eval_points, save_freq=max_steps * 2,
        logdir=None, verbose=False, seed=seed,
        grouped_updates=grouped,
        exploration_policy=EpsGreedyPolicy(
            LinearDecaySchedule(1.0, 0.01,
                                (decay_updates or updates_target)
                                * train_freq // 2)
        ),
    )
    policy = solver.solve(env)
    evals = [(int(t), round(float(r), 4)) for t, r in solver.metrics["eval"]]

    # final-params re-evals with fresh keys: eval variance vs policy state
    network = policy.network
    final_revals = []
    k = jax.random.PRNGKey(10_000 + seed)
    for _ in range(5):
        k, sub = jax.random.split(k)
        r, _, _ = evaluation(basic_evaluation, network, policy.params, env,
                             256, 100, sub, False)
        final_revals.append(round(float(r), 4))

    threshold = 1.0
    crossed = next((t for t, r in evals if r >= threshold), None)
    rec = {
        "metric": "headline_stability",
        "seed": seed,
        "config": {
            "problem": "SimpleGridWorld", "num_envs": num_envs,
            "batch_size": 512, "train_freq": train_freq,
            "buffer_size": buffer_size,
            "updates_per_iter": num_envs // train_freq,
            "grouped_updates": grouped,
            "learning_rate": solver.config.learning_rate,
            "total_env_steps": max_steps, "total_updates": updates_target,
        },
        "threshold": threshold,
        "steps_to_threshold": crossed,
        "final_eval_return": evals[-1][1] if evals else None,
        "final_revals": final_revals,
        "eval_curve": evals,
        "loss_curve": [(int(t), float(f"{l:.4g}")) for t, l in
                       zip(solver.metrics["t"], solver.metrics["loss"])],
        "grad_curve": [(int(t), float(f"{g:.4g}")) for t, g in
                       zip(solver.metrics["t"], solver.metrics["grad"])],
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps({k: v for k, v in rec.items() if k != "eval_curve"}))
    return rec


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "seeds"
    seeds = [int(s) for s in sys.argv[2:]] or [0, 1, 2]
    num_envs = int(os.environ.get("BENCH_ENVS", "131072"))
    updates = int(os.environ.get("UPDATES", "4000"))
    if mode == "seeds":
        for s in seeds:
            run_one(s, num_envs, updates, grouped=True)
    elif mode == "ungrouped":
        for s in seeds:
            run_one(s, num_envs, updates, grouped=False)
    elif mode == "extended":
        # 50% longer, with ~2-iteration eval granularity over the whole run:
        # does a terminal dip recover, i.e. is it a transient of the late
        # oscillating regime or an absorbing divergence?
        for s in seeds:
            run_one(s, num_envs, updates * 3 // 2, grouped=True,
                    eval_points=93)
    elif mode == "tail":
        # TRUE extension of the 4000-update trajectory: 25% more updates with
        # the ε schedule PINNED to the 4000-update config's decay horizon, so
        # iterations 1..4000 replay the exact seeds-mode trajectory (same key
        # streams) and the curve then shows whether the terminal dip recovers
        # in place. ~2-iteration eval granularity.
        for s in seeds:
            run_one(s, num_envs, updates * 5 // 4, grouped=True,
                    eval_points=78, decay_updates=updates)
    elif mode == "fine":
        # eval every ~iteration over the whole run: 125 eval points
        for s in seeds:
            run_one(s, num_envs, updates, grouped=True, eval_points=125)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
