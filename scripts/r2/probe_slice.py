"""Confirm: value-level row-slicing of a [1024,128] intermediate crashes
Mosaic; compare slice-at-0, offset-slice, and argmax-over-slice variants."""
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Bp, Ap = 512, 128


def run(mode):
    def k(x_ref, o_ref):
        x = x_ref[:]               # [1024, 128]
        y = jnp.tanh(x)
        if mode == "slice0":
            q = y[:Bp]
        elif mode == "slice_off":
            q = y[Bp:]
        elif mode == "argmax_off":
            sp = y[Bp:]
            best = jnp.argmax(sp, axis=-1, keepdims=True)
            cols = jax.lax.broadcasted_iota(jnp.int32, (Bp, Ap), 1)
            q = jnp.where(cols == best, y[:Bp], 0.0)
        elif mode == "reshape":
            q = y.reshape(2, Bp, Ap)[1]
        o_ref[:] = q

    out = pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec((2 * Bp, Ap), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Bp, Ap), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Ap), jnp.float32),
    )(jnp.ones((2 * Bp, Ap)))
    return float(out.sum())


if __name__ == "__main__":
    for mode in sys.argv[1:] or ["slice0", "slice_off", "argmax_off",
                                 "reshape"]:
        try:
            print(f"PASS {mode}: {run(mode)}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {mode}: {str(e).splitlines()[0][:100]}", flush=True)
