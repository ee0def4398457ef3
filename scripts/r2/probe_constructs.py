"""Bisect the Mosaic 'limits[i] <= dim(i) (64 vs. 1)' crash: compile each
suspicious construct from fused_update.py in isolation on the real TPU.

Usage: python scripts/r2/probe_constructs.py <probe-name>...
Each probe compiles + runs a tiny pallas_call using one construct.
"""
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Bp, Ap, U = 512, 128, 8


def probe_smem_scalar_out():
    """(1,1) SMEM output written from a vector reduction."""
    def k(x_ref, o_ref):
        o_ref[0, 0] = jnp.sum(x_ref[:])

    out = pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec((Bp, Ap), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(jnp.ones((Bp, Ap)))
    return float(out[0, 0])


def probe_smem_scalar_out_grid():
    """(1,1) SMEM output under a grid, written every step."""
    def k(x_ref, o_ref):
        o_ref[0, 0] = jnp.sum(x_ref[:])

    out = pl.pallas_call(
        k,
        grid=(U,),
        in_specs=[pl.BlockSpec((None, Bp, Ap), lambda u: (u, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda u: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(jnp.ones((U, Bp, Ap)))
    return float(out[0, 0])


def probe_row_block():
    """(1, Bp) blocks from a (U, 1, Bp) array, per-grid-step."""
    def k(x_ref, o_ref):
        o_ref[0, :] = x_ref[0, :] * 2.0

    out = pl.pallas_call(
        k,
        grid=(U,),
        in_specs=[pl.BlockSpec((None, 1, Bp), lambda u: (u, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, 1, Bp), lambda u: (u, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((U, 1, Bp), jnp.float32),
    )(jnp.ones((U, 1, Bp)))
    return float(out.sum())


def probe_bias_full_block():
    """(1, 128) full-array bias input + scratch copy + arithmetic."""
    def k(b_ref, o_ref, s_ref):
        s_ref[:] = b_ref[:]
        o_ref[:] = s_ref[:] + 1.0

    out = pl.pallas_call(
        k,
        grid=(U,),
        in_specs=[pl.BlockSpec((1, 128), lambda u: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128), lambda u: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)],
    )(jnp.ones((1, 128)))
    return float(out.sum())


def probe_argmax_keepdims():
    """argmax keepdims + masked gather, as in the double-Q path."""
    def k(x_ref, o_ref):
        x = x_ref[:]
        cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        best = jnp.argmax(x, axis=-1, keepdims=True)
        o_ref[0, :] = jnp.sum(jnp.where(cols == best, x, 0.0), axis=-1)

    out = pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec((Bp, Ap), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Bp), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Bp), jnp.float32),
    )(jnp.arange(Bp * Ap, dtype=jnp.float32).reshape(Bp, Ap))
    return float(out.sum())


def probe_bwd_dots():
    """The backward dot_generals: h^T dz and dz W^T, plus bias row-sum."""
    def k(h_ref, dz_ref, w_ref, dw_ref, db_ref, dh_ref):
        h, dz, w = h_ref[:], dz_ref[:], w_ref[:]
        dw_ref[:] = jax.lax.dot_general(
            h, dz, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db_ref[:] = jnp.sum(dz, axis=0, keepdims=True)
        dh_ref[:] = jax.lax.dot_general(
            dz, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    full = lambda s: pl.BlockSpec(s, lambda: (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        k,
        in_specs=[full((Bp, 128)), full((Bp, 128)), full((128, 128))],
        out_specs=(full((128, 128)), full((1, 128)), full((Bp, 128))),
        out_shape=(jax.ShapeDtypeStruct((128, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.float32),
                   jax.ShapeDtypeStruct((Bp, 128), jnp.float32)),
    )(jnp.ones((Bp, 128)), jnp.ones((Bp, 128)), jnp.ones((128, 128)))
    return float(outs[0].sum())


def probe_smem_count_in():
    """(1,1) SMEM *input* read inside the kernel."""
    def k(c_ref, x_ref, o_ref):
        t = (c_ref[0, 0] + 1).astype(jnp.float32)
        o_ref[:] = x_ref[:] * t

    out = pl.pallas_call(
        k,
        grid=(U,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda u: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 128), lambda u: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda u: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    )(jnp.zeros((1, 1), jnp.int32), jnp.ones((1, 128)))
    return float(out.sum())


def probe_when_copy():
    """@pl.when guarded scratch init/copy-out of a (1,128) bias tensor."""
    def k(b_ref, o_ref, s_ref):
        u = pl.program_id(0)

        @pl.when(u == 0)
        def _():
            s_ref[:] = b_ref[:]

        s_ref[:] = s_ref[:] + 1.0

        @pl.when(u == U - 1)
        def _():
            o_ref[:] = s_ref[:]

    out = pl.pallas_call(
        k,
        grid=(U,),
        in_specs=[pl.BlockSpec((1, 128), lambda u: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128), lambda u: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)],
    )(jnp.ones((1, 128)))
    return float(out.sum())


PROBES = {name[len("probe_"):]: fn
          for name, fn in sorted(globals().items())
          if name.startswith("probe_")}

if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    for n in names:
        try:
            r = PROBES[n]()
            print(f"PASS {n}: {r}")
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:120]
            print(f"FAIL {n}: {type(e).__name__}: {msg}")
