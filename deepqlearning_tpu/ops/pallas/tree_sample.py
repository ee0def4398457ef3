"""Pallas kernels for the sum-tree sampler.

Two kernels share the descent stages:

**Whole-descent kernel** (round 3): every tree level is a VMEM-resident
kernel input; draws are processed in lane-blocks of 512 over a grid. Child
fetches are one-hot contractions on the MXU, the per-node prefix-sum over
the 64 children is a lower-triangular matmul. One launch replaces the ~30
serially-dependent small XLA kernels of ``sumtree.sample`` (240 µs → ~40 µs
for 4096 draws over 256K leaves). Its leaf-level fetch is O(C × draws) MACs
and its operands must fit VMEM — fine through 2^20 leaves, dominant and then
impossible beyond.

**Windowed kernel** (round 5, VERDICT r4 next-step #2): exploits the
*monotonicity* of stratified masses. Draw chunk ``g`` (128 draws) covers
mass stratum ``[g, g+1]·total/nb``, so its leaf-level accesses fall in a
contiguous run of 64-leaf blocks bounded by descending the nb+1 stratum
boundary masses (one extra tiny kernel launch on the upper levels). The
kernel then fetches only a ``2W``-block window per chunk — selected by a
**scalar-prefetched** per-chunk base index in the BlockSpec index_map — so
the leaf stage costs O(2·slack·C·D/nb) MACs instead of O(C·D), and the leaf
level never enters VMEM whole (the cap moves from C ≤ 2^20 to the *upper*
levels, C ≤ 2^26). If a chunk's true span exceeds the window (priority skew
> ~4x local average), a flag falls the whole batch back to the XLA descent
— detected BEFORE the kernel runs, bitwise-safe.

Boundary and main kernels use the same stage arithmetic (same one-hot /
triangular matmuls), so the monotone bound holds at production (bf16-pass)
matmul precision too. Semantics match ``sumtree.sample``'s selection math;
verified elementwise under pinned f32 in tests/test_pallas_kernels.py and
tests_tpu/test_kernels_tpu.py, mass-bounded at production precision.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 512     # draws per grid step (whole-descent kernel)
SLACK = 4       # leaf window width multiplier over the average chunk span


def _window_nodes(n_blocks: int, nb: int) -> int:
    """Window width W (level-1 nodes), power of two: SLACK x the average
    per-chunk span, sublane-aligned, leaving >= 2 window positions."""
    W = 8
    while W < (SLACK * n_blocks) // nb:
        W *= 2
    return min(W, n_blocks // 2)


def _pick_chunk(n_blocks: int, D: int):
    """(chunk draws, window W, chunk count) for the windowed kernel.

    Bigger chunks amortize the per-grid-step cost (measured 175 -> 80 us
    at 2^20/16384 draws going 128 -> 512), but the window grows with the
    chunk's mass share; cap the two window blocks at ~2 MB VMEM so the
    leaf stream stays pipelineable. Returns (0, 0, 0) if no chunk size
    works."""
    for bw in (512, 256, 128):
        nb = -(-D // bw)
        if nb < 8:
            continue  # too few chunks for windows to bound anything
        W = _window_nodes(n_blocks, nb)
        if n_blocks < 2 * W:
            continue
        # two VMEM budgets: the double-buffered window blocks (2 x W x 64
        # f32) and the [W, bw] one-hot intermediates of the leaf stage
        # (measured: W*bw = 2^21 put the kernel 1.4 MB over the 16 MB
        # scoped budget; 2^20 fits)
        if W * 64 * 4 * 2 <= 2 * 1024 * 1024 and W * bw <= 1 << 20:
            return bw, W, nb
    return 0, 0, 0


def _two_stage_split(P: int, bf: int) -> int:
    """P1 for the striped fetch, as in ``sumtree._fetch_children``."""
    P1 = 1
    while P1 * P1 < P * bf:
        P1 *= 2
    return min(P1, P)


# Levels this small get f32 (HIGHEST) matmul passes even at production
# precision: their node masses are O(total), so a bf16-rounded csum there
# deviates draws by ~2e-3 of TOTAL mass (measured 2.7e-3 at 2^21 before
# r5). Pinning costs nothing — the operands are tiny — and leaves the big
# level-1/leaf fetches (node masses <= total*64/4096) on fast bf16 passes,
# bounding the production mass deviation at ~3e-5 of total.
PIN_LEVEL = 4096


def _prec(C: int):
    return jax.lax.Precision.HIGHEST if C <= PIN_LEVEL else None


def _fetch_stage(lvl_ref, idx, C: int, P: int, bf: int, D: int):
    """Children of node ``idx`` at a level: ``[bf, D]`` via MXU one-hot
    contractions (never a gather — per-lane gathers serialize on TPU)."""
    prec = _prec(C)
    if P == 1:
        return jnp.broadcast_to(
            lvl_ref[:].reshape(bf, 1), (bf, D)).astype(jnp.float32)
    if P <= 1024:
        pr = jax.lax.broadcasted_iota(jnp.int32, (P, D), 0)
        oh = (pr == idx).astype(jnp.float32)                  # [P, D]
        return jax.lax.dot_general(
            lvl_ref[:], oh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )                                                     # [bf, D]
    # two-stage striped fetch (intermediates O(P1 + P2*bf))
    P1 = _two_stage_split(P, bf)
    P2 = P // P1
    hi = idx // P2
    lo = idx % P2
    pr1 = jax.lax.broadcasted_iota(jnp.int32, (P1, D), 0)
    oh1 = (pr1 == hi).astype(jnp.float32)                     # [P1, D]
    stripes = jax.lax.dot_general(
        lvl_ref[:], oh1, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )                                                         # [P2*bf, D]
    ch = jnp.zeros((bf, D), jnp.float32)
    for p2 in range(P2):
        sel = (lo == p2).astype(jnp.float32)                  # [1, D]
        ch = ch + stripes[p2 * bf:(p2 + 1) * bf, :] * sel
    return ch


def _select_stage(ch, mass, idx, bf: int, D: int, C: int = 0):
    """Pick child ``j`` per draw from fetched children ``ch [bf, D]``:
    prefix-sum via triangular matmul, same ``j = Σ(mass ≥ csum)`` selection
    (and clamping) as ``sumtree.descend``. Returns (idx', mass', prio)."""
    tri = jnp.triu(jnp.ones((bf, bf), jnp.float32))
    rows = jax.lax.broadcasted_iota(jnp.int32, (bf, D), 0)
    csum = jax.lax.dot_general(
        tri, ch, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(C),
    )                                                         # [bf, D]
    j = jnp.sum((mass >= csum).astype(jnp.int32), axis=0, keepdims=True)
    j = jnp.minimum(j, bf - 1)
    prev = jnp.sum(jnp.where(rows == j - 1, csum, 0.0), axis=0, keepdims=True)
    mass = mass - jnp.where(j > 0, prev, 0.0)
    idx = idx * bf + j
    prio = jnp.sum(jnp.where(rows == j, ch, 0.0), axis=0, keepdims=True)
    return idx, mass, prio


# ---------------------------------------------------------------------------
# whole-descent kernel (all levels VMEM-resident)
# ---------------------------------------------------------------------------
def _make_kernel(level_sizes: Tuple[int, ...], D: int):
    """level_sizes: leaf-first sizes, e.g. (262144, 4096, 64, 1)."""
    n_levels = len(level_sizes)

    def kernel(*refs):
        it = iter(refs)
        mass_ref = next(it)                       # [1, D] f32
        lvl = [next(it) for _ in range(n_levels)]  # 2-D reshaped levels
        idx_ref, prio_ref = next(it), next(it)     # [1, D] outputs

        mass = mass_ref[0:1, :]
        idx = jnp.zeros((1, D), jnp.int32)
        prio = jnp.zeros((1, D), jnp.float32)

        # descend from just below the root to the leaves
        for li in range(n_levels - 2, -1, -1):
            C = level_sizes[li]
            P = level_sizes[li + 1]
            bf = C // P
            ch = _fetch_stage(lvl[li], idx, C, P, bf, D)
            idx, mass, prio = _select_stage(ch, mass, idx, bf, D, C)

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

    kernel = _make_kernel(sizes, BLOCK)
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


# ---------------------------------------------------------------------------
# windowed kernel (leaf level fetched per-chunk via scalar-prefetched window)
# ---------------------------------------------------------------------------
def _make_windowed_kernel(level_sizes: Tuple[int, ...], W: int, BW: int):
    """Full leaf-first ``level_sizes``; upper levels VMEM-resident, leaf
    level seen only through two [W, bf]-node windows per chunk of ``BW``
    draws."""
    n_levels = len(level_sizes)
    bf_leaf = level_sizes[0] // level_sizes[1]
    BLOCK_W = BW

    def kernel(base_ref, *refs):
        it = iter(refs)
        mass_ref = next(it)                            # [1, BLOCK_W]
        lvl = [next(it) for _ in range(n_levels - 1)]  # upper levels
        win1, win2 = next(it), next(it)                # [W, bf_leaf] each
        idx_ref, prio_ref = next(it), next(it)

        g = pl.program_id(0)
        mass = mass_ref[0:1, :]
        idx = jnp.zeros((1, BLOCK_W), jnp.int32)

        # upper-level descent over level_sizes[1:] (identical stage math to
        # the whole-descent kernel — the boundary descent reuses it too, so
        # the monotone window bound holds at any matmul precision)
        for li in range(n_levels - 2, 0, -1):
            C = level_sizes[li]
            P = level_sizes[li + 1]
            bf = C // P
            ch = _fetch_stage(lvl[li - 1], idx, C, P, bf, BLOCK_W)
            idx, mass, _ = _select_stage(ch, mass, idx, bf, BLOCK_W, C)

        # windowed leaf stage: node idx is within [base[g]*W, base[g]*W+2W)
        # by the boundary-descent guarantee; fetch its 64 children from the
        # two stacked W-node windows. The one-hot is built in SUB-row
        # chunks — a single [2W, BLOCK_W] f32 one-hot is 4 MB at the
        # default chunking and blew the 16 MB scoped-VMEM budget (Mosaic
        # compile OOM); chunked accumulation peaks at ~1 MB for the same
        # MACs.
        local = idx - base_ref[g] * W                  # [1, BLOCK_W]
        rows_w = jax.lax.broadcasted_iota(jnp.int32, (W, BLOCK_W), 0)
        oh1 = (rows_w == local).astype(jnp.float32)
        oh2 = (rows_w == (local - W)).astype(jnp.float32)
        # EXPLICIT DEFAULT precision: the leaf-window contraction always
        # runs single-pass bf16, independent of any context-level f32 pin.
        # Mosaic fuses the iota/compare one-hot into the MXU operand at
        # default precision; a context HIGHEST pin instead forces 6-pass
        # f32 with materialized [W, BLOCK_W] operand copies, which blows
        # the 16 MB scoped-VMEM budget at W=2048 (and chunked/fori
        # workarounds cost 1.8x wall time). The numeric effect is bounded:
        # leaf masses are <= total * 64/4096, so bf16 rounding here moves a
        # draw by ~1e-6 of total (the production-precision TPU test pins
        # the bound); returned priorities carry the same bf16 rounding
        # (rtol 6e-3 contract).
        dflt = jax.lax.Precision.DEFAULT
        ch = jax.lax.dot_general(
            win1[:], oh1, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=dflt,
        ) + jax.lax.dot_general(
            win2[:], oh2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=dflt,
        )                                              # [bf_leaf, BLOCK_W]
        idx, mass, prio = _select_stage(ch, mass, idx, bf_leaf, BLOCK_W,
                                        level_sizes[0])
        idx_ref[0:1, :] = idx
        prio_ref[0:1, :] = prio

    return kernel


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _windowed_impl(tree, mass, base, batch_size: int, W: int, BLOCK_W: int,
                   interpret: bool):
    """Run the windowed kernel. ``base``: per-chunk window block index
    (clamped so base+1 is valid); masses must be sorted (stratified)."""
    sizes = tuple(l.shape[0] for l in tree)
    D = batch_size
    nb = -(-D // BLOCK_W)
    Dp = nb * BLOCK_W
    # pad by REPLICATING the last mass so padded lanes stay inside the last
    # chunk's window (zeros would descend to leaf 0, outside the window)
    mass_p = jnp.pad(mass, (0, Dp - D), mode="edge").reshape(nb, 1, BLOCK_W)

    ops = []
    for li in range(1, len(tree) - 1):
        P, bf = sizes[li + 1], sizes[li] // sizes[li + 1]
        ops.append(_reshape_level(tree[li], P, bf))
    ops.append(tree[-1].reshape(1, 1))
    leaves2d = tree[0].reshape(sizes[1], sizes[0] // sizes[1])

    kernel = _make_windowed_kernel(sizes, W, BLOCK_W)
    per_b = pl.BlockSpec((None, 1, BLOCK_W), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(
        shape, lambda b, s, _n=len(shape): (0,) * _n,
        memory_space=pltpu.VMEM,
    )
    win_spec = lambda off: pl.BlockSpec(
        (W, leaves2d.shape[1]), lambda b, s: (s[b] + off, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[per_b] + [full(o.shape) for o in ops]
        + [win_spec(0), win_spec(1)],
        out_specs=(per_b, per_b),
    )
    idx_p, prio_p = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nb, 1, BLOCK_W), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1, BLOCK_W), jnp.float32),
        ),
        interpret=interpret,
    )(base, mass_p, *ops, leaves2d, leaves2d)
    return idx_p.reshape(-1)[:D], prio_p.reshape(-1)[:D]


def _sample_windowed(tree, mass, batch_size: int, interpret: bool):
    """Boundary descent -> window bases -> windowed kernel, with a whole-
    batch XLA fallback when any chunk's span overflows its window."""
    from ...ops import sumtree

    sizes = tuple(l.shape[0] for l in tree)
    n_blocks = sizes[1]
    BLOCK_W, W, nb = _pick_chunk(n_blocks, batch_size)

    total = sumtree.total(tree)
    frac = jnp.minimum(
        jnp.arange(nb + 1, dtype=jnp.float32) * BLOCK_W, batch_size
    ) / batch_size
    bnd, _ = _sample_impl(tree[1:], frac * total, nb + 1, interpret)
    base = jnp.clip(bnd[:-1] // W, 0, n_blocks // W - 2)
    overflow = jnp.any(bnd[1:] - base * W >= 2 * W)

    def fallback(_):
        idx, _ = sumtree.descend(tree, mass)
        return idx, tree[0][idx]

    def fast(_):
        return _windowed_impl(tree, mass, base, batch_size, W, BLOCK_W,
                              interpret)

    return jax.lax.cond(overflow, fallback, fast, None)


# ---------------------------------------------------------------------------
def supported(tree, batch_size: int = None) -> bool:
    """True if ``sample_pallas`` has a kernel path for this tree (and draw
    count, when given): either every level operand fits the whole-descent
    kernel's VMEM budget, or the draw count is large enough for the
    windowed kernel and the UPPER levels fit (leaf level unbounded)."""
    sizes = tuple(l.shape[0] for l in tree)
    if len(sizes) < 2:
        return False
    for li in range(len(sizes) - 1):
        if sizes[li] % sizes[li + 1]:
            return False
    whole_ok = all(s * 4 <= 4 * 1024 * 1024 for s in sizes[:-1])
    if whole_ok:
        return True
    return batch_size is not None and _windowed_ok(sizes, batch_size)


def _windowed_ok(sizes, batch_size: int) -> bool:
    # upper levels must fit the whole-descent kernel (boundary pass + main
    # kernel keep them VMEM-resident); the draw count must give the chunks
    # enough mass resolution for windows to make sense
    if len(sizes) < 3 or batch_size < 2048:
        return False
    upper_ok = all(s * 4 <= 4 * 1024 * 1024 for s in sizes[1:-1])
    return upper_ok and _pick_chunk(sizes[1], batch_size)[0] > 0


def sample_pallas(tree, key, batch_size: int, stratified: bool = True,
                  interpret: bool = False):
    """Drop-in for ``sumtree.sample`` — same uniforms, same selection math.
    Returns (idx, leaf_priority)."""
    from ...ops import sumtree

    u = jax.random.uniform(key, (batch_size,))
    if stratified:
        u = (jnp.arange(batch_size, dtype=jnp.float32) + u) / batch_size
    mass = u * sumtree.total(tree)
    sizes = tuple(l.shape[0] for l in tree)
    whole_ok = all(s * 4 <= 4 * 1024 * 1024 for s in sizes[:-1])
    if stratified and _windowed_ok(sizes, batch_size) and (
        not whole_ok or sizes[0] >= (1 << 19)
    ):
        # windowed path: bigger trees than VMEM allows, and ~O(nb) less MXU
        # work at the leaf level than the whole-descent kernel
        return _sample_windowed(tree, mass, batch_size, interpret)
    return _sample_impl(tree, mass, batch_size, interpret)
