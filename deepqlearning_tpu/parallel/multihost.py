"""Multi-host launch helpers.

The reference has no distributed story (SURVEY.md §5.8). TPU-native
multi-host: every host runs the same program; ``initialize_multihost`` wires
``jax.distributed``, and ``global_data_mesh`` builds a 1-D data mesh over all
chips of the slice (ICI within a host/slice, DCN across slices is handled by
XLA's collective lowering). The per-shard program is byte-identical to the
single-host ``DataParallelRunner`` — each process feeds its addressable
shards; gradients ``pmean`` over the global axis.

Cannot be exercised in this environment (one chip); the logic is identical to
the simulated-mesh path tested in tests/test_distributed.py, with mesh
devices spanning processes.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed. On TPU pods the arguments are inferred
    from the environment; pass them explicitly elsewhere."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def global_data_mesh(axis_name: str = "data") -> Mesh:
    """1-D mesh over every chip in the (multi-host) slice."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def local_shard_info(mesh: Mesh, axis_name: str = "data"):
    """(local_device_count, global_device_count, process_index) — the numbers
    a host loop needs to size its per-process shards."""
    return (
        jax.local_device_count(),
        mesh.devices.size,
        jax.process_index(),
    )
