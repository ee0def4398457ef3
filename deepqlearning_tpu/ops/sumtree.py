"""Array sum-tree for proportional prioritized sampling, fully on-device.

The reference samples with an O(N) linear weighted draw
(``StatsBase.sample`` with ``Weights``, ``src/prioritized_experience_replay.jl:85``)
which cannot scale; SURVEY.md §2.2 mandates a tree/prefix-sum sampler.

Representation: a tuple of per-level arrays, leaves first —
``levels[0]`` has ``cap`` leaves, ``levels[k]`` has ``cap >> k`` nodes,
``levels[-1]`` is the root. Per-level arrays (instead of one flat array)
keep every update a slice/reshape-sum cascade with zero concatenates and let
contiguous leaf updates be ``dynamic_update_slice`` DMAs instead of TPU
scatters (scatters serialize on TPU and were the bench bottleneck).

All ops are batched, jit-friendly; sampling is O(log N) gathers per draw
with no host sync and no data-dependent shapes.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Tree = Tuple[jnp.ndarray, ...]


def tree_capacity(n: int) -> int:
    """Round up to the next power of two (leaf count)."""
    cap = 1
    while cap < n:
        cap *= 2
    return cap


def init_tree(capacity: int) -> Tree:
    cap = tree_capacity(capacity)
    levels = []
    size = cap
    while size >= 1:
        levels.append(jnp.zeros((size,), jnp.float32))
        size //= 2
    return tuple(levels)


def _rebuild_from(leaves: jnp.ndarray) -> Tree:
    levels = [leaves]
    level = leaves
    while level.shape[0] > 1:
        level = level.reshape(-1, 2).sum(axis=1)
        levels.append(level)
    return tuple(levels)


def set_priorities(tree: Tree, indices: jnp.ndarray, priorities: jnp.ndarray) -> Tree:
    """Set leaf priorities at arbitrary ``indices`` (scatter) and rebuild."""
    leaves = tree[0].at[indices].set(priorities.astype(jnp.float32))
    return _rebuild_from(leaves)


def set_priorities_slice(tree: Tree, start, priorities: jnp.ndarray) -> Tree:
    """Set a contiguous run of leaves starting at ``start`` (one DMA) and
    rebuild. Used by the aligned ring insert."""
    leaves = jax.lax.dynamic_update_slice(
        tree[0], priorities.astype(jnp.float32), (start,)
    )
    return _rebuild_from(leaves)


def total(tree: Tree) -> jnp.ndarray:
    return tree[-1][0]


def get_leaf(tree: Tree, indices: jnp.ndarray) -> jnp.ndarray:
    return tree[0][indices]


def sample(tree: Tree, key, batch_size: int, stratified: bool = True):
    """Draw ``batch_size`` leaf indices proportional to leaf priority.

    Stratified sampling (one uniform draw per equal-mass stratum) is the
    standard PER variant at scale; the reference draws *without replacement*
    (``src/prioritized_experience_replay.jl:85``) which has no fixed-shape
    batched analog — documented deviation (SURVEY.md §7 hard part (a)).

    Returns ``(indices [B] int32, priorities [B] float32)``.
    """
    u = jax.random.uniform(key, (batch_size,))
    if stratified:
        u = (jnp.arange(batch_size, dtype=jnp.float32) + u) / batch_size
    mass = u * total(tree)
    idx = jnp.zeros((batch_size,), jnp.int32)
    # descend from just below the root down to the leaves
    for level in tree[-2::-1]:
        left = level[2 * idx]
        go_right = mass >= left
        mass = jnp.where(go_right, mass - left, mass)
        idx = 2 * idx + go_right.astype(jnp.int32)
    return idx, tree[0][idx]
