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


def t_quantile(p: float, df: float) -> float:
    """Student-t quantile via the Cornish-Fisher expansion around the normal
    quantile (error <0.5% for df >= 4 — plenty for CI reporting, and avoids a
    scipy dependency)."""
    import math

    # Acklam-style rational approximation of the normal quantile
    def _norm_ppf(q):
        a = [-3.969683028665376e+01, 2.209460984245205e+02,
             -2.759285104469687e+02, 1.383577518672690e+02,
             -3.066479806614716e+01, 2.506628277459239e+00]
        b = [-5.447609879822406e+01, 1.615858368580409e+02,
             -1.556989798598866e+02, 6.680131188771972e+01,
             -1.328068155288572e+01]
        c = [-7.784894002430293e-03, -3.223964580411365e-01,
             -2.400758277161838e+00, -2.549732539343734e+00,
             4.374664141464968e+00, 2.938163982698783e+00]
        d = [7.784695709041462e-03, 3.224671290700398e-01,
             2.445134137142996e+00, 3.754408661907416e+00]
        plow, phigh = 0.02425, 1 - 0.02425
        if q < plow:
            u = math.sqrt(-2 * math.log(q))
            return (((((c[0] * u + c[1]) * u + c[2]) * u + c[3]) * u + c[4]) * u + c[5]) / \
                   ((((d[0] * u + d[1]) * u + d[2]) * u + d[3]) * u + 1)
        if q > phigh:
            return -_norm_ppf(1 - q)
        u = q - 0.5
        r = u * u
        return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * u / \
               (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)

    z = _norm_ppf(p)
    g1 = (z ** 3 + z) / 4
    g2 = (5 * z ** 5 + 16 * z ** 3 + 3 * z) / 96
    g3 = (3 * z ** 7 + 19 * z ** 5 + 17 * z ** 3 - 15 * z) / 384
    return z + g1 / df + g2 / df ** 2 + g3 / df ** 3


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

    off = int(os.environ.get("ABLATION_SEED_OFFSET", "0"))
    seeds = tuple(range(off, off + int(os.environ.get("ABLATION_SEEDS", "10"))))
    only = os.environ.get("ABLATION_PROBLEMS")
    if only:
        cases = [c for c in cases if c[0] in only.split(",")]
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
        # Welch 95% CI on the steps-to-threshold difference between modes,
        # using the t critical value at the Welch-Satterthwaite df (the
        # normal z=1.96 is too narrow at small n — r3 ADVICE), + the minimum
        # detectable effect at this n (two-sided alpha=.05, power=.80:
        # MDE ~= (t_{.975,df} + t_{.80,df}) * SE_diff)
        a = np.asarray([s if s is not None else 10_000 for s in
                        out[name]["stratified"]["steps_to_threshold"]], float)
        b = np.asarray([s if s is not None else 10_000 for s in
                        out[name]["without_replacement"]["steps_to_threshold"]],
                       float)
        va, vb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
        se = float(np.sqrt(va + vb))
        df = (va + vb) ** 2 / (
            va ** 2 / (len(a) - 1) + vb ** 2 / (len(b) - 1) + 1e-30
        )
        tcrit = t_quantile(0.975, df)
        diff = float(a.mean() - b.mean())
        out[name]["stt_diff_mean"] = round(diff, 1)
        out[name]["welch_df"] = round(float(df), 2)
        out[name]["t_crit_975"] = round(tcrit, 3)
        out[name]["stt_diff_ci95"] = [round(diff - tcrit * se, 1),
                                      round(diff + tcrit * se, 1)]
        out[name]["stt_min_detectable_effect"] = round(
            (tcrit + t_quantile(0.80, df)) * se, 1)
        # PAIRED analysis: both modes run the SAME seeds, so per-seed
        # differences cancel the shared seed variance wherever crossing
        # times correlate across modes (r4: corr 0.58 on TestMDP -> MDE
        # shrinks 360 -> 236 steps; corr ~0 on GridWorld -> no gain)
        d_p = a - b
        n_p = len(d_p)
        se_p = float(d_p.std(ddof=1) / np.sqrt(n_p))
        t_p = t_quantile(0.975, n_p - 1)
        out[name]["paired"] = {
            "corr": round(float(np.corrcoef(a, b)[0, 1]), 3),
            "diff_mean": round(float(d_p.mean()), 1),
            "ci95": [round(float(d_p.mean()) - t_p * se_p, 1),
                     round(float(d_p.mean()) + t_p * se_p, 1)],
            "min_detectable_effect": round(
                (t_p + t_quantile(0.80, n_p - 1)) * se_p, 1),
        }
    print(json.dumps({"metric": "per_sampler_ablation",
                      "seeds": list(seeds), "results": out}))


if __name__ == "__main__":
    main()
