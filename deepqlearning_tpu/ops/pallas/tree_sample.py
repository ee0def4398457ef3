"""Whole-descent Pallas kernel for the sum-tree sampler.

The XLA descent (``ops/sumtree.py::sample``) is ~30 serially-dependent small
kernels (per level: iota, one-hot, matmul, cumsum, compare, reduce, select)
— 240 µs for 4096 draws over a 256K-leaf tree on a v5e, the single largest
cost of the feed-forward train phase (larger than the whole fused
forward/backward/Adam kernel). This kernel runs the ENTIRE stratified
descent in one launch:

  * the tree's levels are kernel inputs (a 256K-leaf branch-64 tree is
    ~1 MB — VMEM-resident), draws are processed in lane-blocks of 512 over
    a grid;
  * child fetches are one-hot contractions on the MXU (two-stage striped for
    parent counts > 1024, mirroring ``sumtree._fetch_children``);
  * the per-node prefix-sum over the 64 children is a lower-triangular
    matmul (MXU) instead of a lane cumsum;
  * leaf priorities come out of the last level's fetched children directly,
    so the follow-up ``tree[0][idx]`` gather disappears too.

Semantics are exactly ``sumtree.sample``'s (same uniforms, same
``j = sum(mass >= cumsum)`` child selection with the same clamping), verified
elementwise in tests/test_pallas_kernels.py and on real Mosaic in
tests_tpu/test_kernels_tpu.py.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 512  # draws per grid step (lane dimension)


def _two_stage_split(P: int, bf: int) -> int:
    """P1 for the striped fetch, as in ``sumtree._fetch_children``."""
    P1 = 1
    while P1 * P1 < P * bf:
        P1 *= 2
    return min(P1, P)


def _make_kernel(level_sizes: Tuple[int, ...]):
    """level_sizes: leaf-first sizes, e.g. (262144, 4096, 64, 1)."""
    n_levels = len(level_sizes)

    def kernel(*refs):
        it = iter(refs)
        mass_ref = next(it)                       # [1, BLOCK] f32
        lvl = [next(it) for _ in range(n_levels)]  # 2-D reshaped levels
        idx_ref, prio_ref = next(it), next(it)     # [1, BLOCK] outputs

        mass = mass_ref[0:1, :]                    # [1, D]
        idx = jnp.zeros((1, BLOCK), jnp.int32)
        prio = jnp.zeros((1, BLOCK), jnp.float32)

        # descend from just below the root to the leaves
        for li in range(n_levels - 2, -1, -1):
            C = level_sizes[li]
            P = level_sizes[li + 1]
            bf = C // P
            tri = jnp.triu(jnp.ones((bf, bf), jnp.float32))  # csum via MXU
            rows = jax.lax.broadcasted_iota(jnp.int32, (bf, BLOCK), 0)

            if P == 1:
                # children of the root: broadcast the whole level
                ch = jnp.broadcast_to(
                    lvl[li][:].reshape(bf, 1), (bf, BLOCK)
                ).astype(jnp.float32)
            elif P <= 1024:
                # single one-hot contraction: ch[b, d] = C2[idx[d], b]
                pr = jax.lax.broadcasted_iota(jnp.int32, (P, BLOCK), 0)
                oh = (pr == idx).astype(jnp.float32)          # [P, D]
                C2 = lvl[li][:]                               # [P, bf]
                ch = jax.lax.dot_general(
                    C2, oh, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                              # [bf, D]
            else:
                # two-stage striped fetch (intermediates O(P1 + P2*bf))
                P1 = _two_stage_split(P, bf)
                P2 = P // P1
                hi = idx // P2
                lo = idx % P2
                pr1 = jax.lax.broadcasted_iota(jnp.int32, (P1, BLOCK), 0)
                oh1 = (pr1 == hi).astype(jnp.float32)          # [P1, D]
                C3 = lvl[li][:]                                # [P1, P2*bf]
                stripes = jax.lax.dot_general(
                    C3, oh1, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                              # [P2*bf, D]
                ch = jnp.zeros((bf, BLOCK), jnp.float32)
                for p2 in range(P2):
                    sel = (lo == p2).astype(jnp.float32)       # [1, D]
                    ch = ch + stripes[p2 * bf:(p2 + 1) * bf, :] * sel

            # prefix-sum over children via triangular matmul: csum[j] =
            # sum_{k<=j} ch[k]  (tri is upper-triangular: tri[k, j] = k<=j)
            csum = jax.lax.dot_general(
                tri, ch, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                  # [bf, D]
            j = jnp.sum((mass >= csum).astype(jnp.int32), axis=0,
                        keepdims=True)                         # [1, D]
            j = jnp.minimum(j, bf - 1)
            prev = jnp.sum(
                jnp.where(rows == j - 1, csum, 0.0), axis=0, keepdims=True
            )
            mass = mass - jnp.where(j > 0, prev, 0.0)
            idx = idx * bf + j
            prio = jnp.sum(jnp.where(rows == j, ch, 0.0), axis=0,
                           keepdims=True)

        idx_ref[0:1, :] = idx
        prio_ref[0:1, :] = prio

    return kernel


def _reshape_level(level: jnp.ndarray, P: int, bf: int) -> jnp.ndarray:
    """Level vector -> the 2-D operand its fetch stage wants."""
    C = level.shape[0]
    if P == 1:
        return level.reshape(C, 1)
    if P <= 1024:
        return level.reshape(P, bf)
    P1 = _two_stage_split(P, bf)
    return level.reshape(P1, (P // P1) * bf)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _sample_impl(tree, mass, batch_size: int, interpret: bool):
    sizes = tuple(l.shape[0] for l in tree)
    D = batch_size
    nb = -(-D // BLOCK)
    Dp = nb * BLOCK
    mass_p = jnp.pad(mass, (0, Dp - D)).reshape(nb, 1, BLOCK)

    ops = []
    for li in range(len(tree) - 1):
        P, bf = sizes[li + 1], sizes[li] // sizes[li + 1]
        ops.append(_reshape_level(tree[li], P, bf))
    ops.append(tree[-1].reshape(1, 1))

    kernel = _make_kernel(sizes)
    per_b = pl.BlockSpec((None, 1, BLOCK), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    idx_p, prio_p = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[per_b] + [full(o.shape) for o in ops],
        out_specs=(per_b, per_b),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32),
        ),
        interpret=interpret,
    )(mass_p, *ops)
    return idx_p.reshape(-1)[:D], prio_p.reshape(-1)[:D]


def supported(tree) -> bool:
    """Kernel constraints: every fetch operand must fit VMEM comfortably and
    the two-stage split must divide evenly (power-of-two levels always do)."""
    sizes = tuple(l.shape[0] for l in tree)
    if len(sizes) < 2:
        return False
    for li in range(len(sizes) - 1):
        C, P = sizes[li], sizes[li + 1]
        if C % P:
            return False
        if C * 4 > 4 * 1024 * 1024:  # level operand > 4 MB: stay on XLA
            return False
    return True


def sample_pallas(tree, key, batch_size: int, stratified: bool = True,
                  interpret: bool = False):
    """Drop-in for ``sumtree.sample`` — same uniforms, same selection math,
    one kernel launch for the whole descent. Returns (idx, leaf_priority)."""
    from ...ops import sumtree

    u = jax.random.uniform(key, (batch_size,))
    if stratified:
        u = (jnp.arange(batch_size, dtype=jnp.float32) + u) / batch_size
    mass = u * sumtree.total(tree)
    return _sample_impl(tree, mass, batch_size, interpret)
