"""PER sampler A/B: stratified with-replacement vs reference-exact
without-replacement (Gumbel-top-k).

Closes the VERDICT round-1 gap "nothing measures whether learning curves
match the reference's sampler": trains the PER-DDQN learning-test config on
TestMDP((5,5),4,6) and SimpleGridWorld with both ``prioritized_sample_mode``
settings over several seeds and reports steps-to-threshold + final return
per mode. Prints one JSON line.

Run: ``python scripts/per_ablation.py`` (CPU is fine; ~minutes).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# env-var JAX_PLATFORMS is not honored once the axon TPU plugin registers
# (see .claude/skills/verify/SKILL.md); force CPU via jax.config instead
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from deepqlearning_tpu import (
    Chain,
    DeepQLearningSolver,
    Dense,
    EpsGreedyPolicy,
    Flatten,
    LinearDecaySchedule,
    SimpleGridWorld,
    TestMDP,
)


def run(problem, model, threshold, mode, seed, max_steps=10_000):
    solver = DeepQLearningSolver(
        qnetwork=model, max_steps=max_steps, learning_rate=5e-3,
        eval_freq=500, num_ep_eval=100, log_freq=100_000, logdir=None,
        verbose=False, double_q=True, dueling=True, prioritized_replay=True,
        prioritized_sample_mode=mode, seed=seed,
        exploration_policy=EpsGreedyPolicy(
            LinearDecaySchedule(1.0, 0.01, max_steps // 2)
        ),
    )
    solver.solve(problem)
    crossed = next((t for t, r in solver.metrics["eval"] if r >= threshold), None)
    final = solver.metrics["eval"][-1][1]
    return crossed, final


def main():
    gw = SimpleGridWorld()
    tm = TestMDP((5, 5), 4, 6)
    cases = [
        ("SimpleGridWorld", gw,
         lambda: Chain(Dense(2, 32), Dense(32, gw.num_actions)), 1.0),
        ("TestMDP(5,5)", tm,
         lambda: Chain(Flatten(), Dense(100, 8, jnp.tanh),
                       Dense(8, tm.num_actions)), 1.5),
    ]
    import numpy as np

    seeds = tuple(range(int(os.environ.get("ABLATION_SEEDS", "10"))))
    out = {}
    for name, prob, mk, thr in cases:
        out[name] = {}
        for mode in ("stratified", "without_replacement"):
            runs = [run(prob, mk(), thr, mode, s) for s in seeds]
            stt = [r[0] for r in runs]
            # censored runs (never crossed) count as max_steps for the mean
            stt_f = np.asarray([s if s is not None else 10_000 for s in stt],
                               dtype=float)
            fin = np.asarray([r[1] for r in runs], dtype=float)
            out[name][mode] = {
                "steps_to_threshold": stt,
                "stt_mean": round(float(stt_f.mean()), 1),
                "stt_std": round(float(stt_f.std(ddof=1)), 1),
                "final_eval_return": [round(float(r[1]), 3) for r in runs],
                "final_mean": round(float(fin.mean()), 3),
                "final_std": round(float(fin.std(ddof=1)), 3),
            }
        # Welch 95% CI on the steps-to-threshold difference between modes +
        # the minimum detectable effect at this n (two-sided alpha=.05,
        # power=.80: MDE ~= 2.80 * SE_diff)
        a = np.asarray([s if s is not None else 10_000 for s in
                        out[name]["stratified"]["steps_to_threshold"]], float)
        b = np.asarray([s if s is not None else 10_000 for s in
                        out[name]["without_replacement"]["steps_to_threshold"]],
                       float)
        se = float(np.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)))
        diff = float(a.mean() - b.mean())
        out[name]["stt_diff_mean"] = round(diff, 1)
        out[name]["stt_diff_ci95"] = [round(diff - 1.96 * se, 1),
                                      round(diff + 1.96 * se, 1)]
        out[name]["stt_min_detectable_effect"] = round(2.80 * se, 1)
    print(json.dumps({"metric": "per_sampler_ablation",
                      "seeds": list(seeds), "results": out}))


if __name__ == "__main__":
    main()
