"""Micro-benchmarks driving the r5 sampler redesign (VERDICT r4 next-step #2).

The r4 whole-descent kernel's leaf-level fetch is an O(C x draws) one-hot
matmul (34 GFLOP at the 2^20-leaf/16384-draw headline shape) and its
``supported()`` gate caps level operands at 4 MB, blocking 2^21+ leaves.
This measures the candidate replacements on the real chip:

  A. XLA descent (``sumtree.sample``)            — current fallback
  B. whole-descent Pallas kernel                 — current 2^20 path
     (forced past ``supported()`` at 2^21+ to probe Mosaic's real limit)
  D. raw gather scaling: [D] indices x 64-f32 slices from C leaves (the
     hybrid sampler's leaf resolve), and [D] row gathers of 32-byte rows
     (the replay-row fetch term)

Timings are two-point slopes ((t(n2)-t(n1))/(n2-n1)) so the tunnel's
per-launch dispatch cancels (docs/PERFORMANCE.md methodology).

Run (TPU): python scripts/r5/sampler_micro.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from deepqlearning_tpu.ops import sumtree  # noqa: E402


def chain_run(f, n):
    """Run f(key) n times inside one jit, serialized via key data-dependence."""
    @jax.jit
    def run(key):
        def body(k, _):
            k, sub = jax.random.split(k)
            out = f(sub)
            leaf = jax.tree_util.tree_leaves(out)[0]
            k = jax.random.fold_in(k, leaf.reshape(-1)[0].astype(jnp.int32))
            return k, None
        k, _ = jax.lax.scan(body, key, None, length=n)
        return k
    return run


def slope_time(f, n1=6, n2=30):
    """Seconds per call of f(key) via two-point slope (dispatch cancels)."""
    runs = {n: chain_run(f, n) for n in (n1, n2)}
    for r in runs.values():  # compile + warm
        jax.block_until_ready(r(jax.random.PRNGKey(0)))
    t = {}
    for n, r in runs.items():
        t0 = time.perf_counter()
        jax.block_until_ready(r(jax.random.PRNGKey(1)))
        t[n] = time.perf_counter() - t0
    return (t[n2] - t[n1]) / (n2 - n1)


def main():
    D = int(os.environ.get("DRAWS", "16384"))
    results = {}

    for logc in (18, 20, 21, 22):
        C = 1 << logc
        prios = jax.random.uniform(jax.random.PRNGKey(1), (C,)) + 0.01
        tree = sumtree.set_priorities(
            sumtree.init_tree(C), jnp.arange(C), prios)
        leaves2d = tree[0].reshape(-1, 64)
        row = {}

        row["xla_descent_us"] = round(slope_time(
            lambda k: sumtree.sample(tree, k, D)[0]) * 1e6, 1)

        from deepqlearning_tpu.ops.pallas import tree_sample
        try:
            row["kernel_us"] = round(slope_time(
                lambda k: tree_sample.sample_pallas(tree, k, D)[0]) * 1e6, 1)
        except Exception as e:  # Mosaic rejection at big C
            row["kernel_us"] = f"fail: {type(e).__name__}"

        row["slice_gather64_us"] = round(slope_time(
            lambda k: leaves2d[
                jax.random.randint(k, (D,), 0, C // 64)].sum(1)) * 1e6, 1)

        rows32 = jnp.zeros((C, 8), jnp.float32)
        row["row_gather32B_us"] = round(slope_time(
            lambda k: rows32[
                jax.random.randint(k, (D,), 0, C)].sum(1)) * 1e6, 1)

        # RNG floor: the randint alone, to subtract from the gather rows
        row["rng_floor_us"] = round(slope_time(
            lambda k: jax.random.randint(k, (D,), 0, C)) * 1e6, 1)

        results[f"C=2^{logc}"] = row
        print(json.dumps({f"C=2^{logc}": row}), flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "docs", "sampler_micro_r5.json")
    with open(out, "w") as f:
        json.dump({"draws": D, "results": results}, f, indent=1)


if __name__ == "__main__":
    main()
