"""Micro-benchmark of window-gather strategies for the DRQN episode ring.

The r3 profile shows the [U*B=2048, T=8] window gather over the
[R=256, E=16384] time-major ring dominates the DRQN train phase (~500us of
~790us). Row gathers on TPU cost per gathered ROW; candidates to cut rows:

  g2      — current HEAD: 2 gathers (pair 16B rows, ard 16B rows), B*T rows each
  g1      — single merged ring [R, E, 8] f32: ONE gather of B*T 32B rows
  slice   — lax.gather with slice_sizes=(T,1,..) on a shadow-row ring:
            B indices, each a strided [T] slice
  wring   — pre-materialized sliding windows [R, E, T*F]: B contiguous rows
            (write cost measured separately as `wring_write`)

Prints one JSON line per variant (us per draw of 2048 windows).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

R, E, T, BW = 256, 16384, 8, 2048  # ring rows, envs, trace, windows per draw
F_PAIR, F_ARD = 4, 4               # pair row f32s (2*obs=2), ard f32s
N = 200


def timeit(name, fn, *args):
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"variant": name, "us": round(best / N * 1e6, 2)}))


def main():
    key = jax.random.PRNGKey(0)
    pair = jax.random.normal(key, (R, E, F_PAIR))
    ard = jax.random.normal(key, (R, E, F_ARD))
    merged = jnp.concatenate([pair, ard], axis=-1)        # [R, E, 8]
    # shadow-row ring for the slice gather: rows R..R+T-2 mirror rows 0..T-2
    shadow = jnp.concatenate([merged, merged[: T - 1]], axis=0)
    # w-ring: sliding windows, env-major time: [R, E, T*8]
    wring = jax.random.normal(key, (R, E, T * 8))

    ks = jax.random.split(key, 3)
    t0s = jax.random.randint(ks[0], (N, BW), 0, R)
    envs = jax.random.randint(ks[1], (N, BW), 0, E)

    @jax.jit
    def g2(t0s, envs):
        def body(acc, x):
            t0, e = x
            offs = (t0[:, None] + jnp.arange(T)[None, :]) % R   # [BW, T]
            p = pair[offs, e[:, None]]
            a = ard[offs, e[:, None]]
            return acc + jnp.sum(p[:, 0]) + jnp.sum(a[:, 0]), None
        acc, _ = jax.lax.scan(body, jnp.asarray(0.0), (t0s, envs))
        return acc

    @jax.jit
    def g1(t0s, envs):
        def body(acc, x):
            t0, e = x
            offs = (t0[:, None] + jnp.arange(T)[None, :]) % R
            m = merged[offs, e[:, None]]                        # [BW, T, 8]
            return acc + jnp.sum(m[:, 0]), None
        acc, _ = jax.lax.scan(body, jnp.asarray(0.0), (t0s, envs))
        return acc

    @jax.jit
    def slice_g(t0s, envs):
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(),
            start_index_map=(0, 1),
        )
        def body(acc, x):
            t0, e = x
            idx = jnp.stack([t0, e], axis=-1)                   # [BW, 2]
            out = jax.lax.gather(
                shadow, idx, dnums, slice_sizes=(T, 1, 8),
                mode="clip",
            )                                                    # [BW, T, 1, 8]
            return acc + jnp.sum(out[:, 0]), None
        acc, _ = jax.lax.scan(body, jnp.asarray(0.0), (t0s, envs))
        return acc

    @jax.jit
    def wring_g(t0s, envs):
        def body(acc, x):
            t0, e = x
            w = wring[t0, e]                                    # [BW, T*8]
            return acc + jnp.sum(w[:, 0]), None
        acc, _ = jax.lax.scan(body, jnp.asarray(0.0), (t0s, envs))
        return acc

    # write-side cost of maintaining the w-ring: per lockstep step, transpose
    # the rolling [T, E, 8] tail into [E, T*8] and write one ring row
    tail = jax.random.normal(key, (T, E, 8))

    @jax.jit
    def wring_write(t0s, _envs):
        def body(carry, t0):
            wr, tl = carry
            row = jax.random.normal(jax.random.PRNGKey(0), (E, 8))
            tl = jnp.roll(tl, -1, axis=0).at[T - 1].set(row)
            flat = jnp.transpose(tl, (1, 0, 2)).reshape(E, T * 8)
            wr = jax.lax.dynamic_update_slice(wr, flat[None], (t0[0] % R, 0, 0))
            return (wr, tl), None
        (wr, _), _ = jax.lax.scan(body, (wring, tail), t0s)
        return jnp.sum(wr[0, 0])

    variants = {
        "g2_current": g2, "g1_merged": g1, "slice_gather": slice_g,
        "wring_gather": wring_g, "wring_write_per_step": wring_write,
    }
    want = sys.argv[1:] or list(variants)
    for name in want:
        timeit(name, variants[name], t0s, envs)


if __name__ == "__main__":
    main()
