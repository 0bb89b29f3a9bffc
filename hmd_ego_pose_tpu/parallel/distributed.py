"""Multi-host (multi-process) SPMD bootstrap.

The reference has no distributed story at all (SURVEY.md §2.5); single-host
multi-chip here is pure jax.sharding (parallel/mesh.py).  Going multi-HOST
(e.g. a v5e-256 pod) adds exactly one requirement: every process calls
``jax.distributed.initialize`` before touching devices, after which
``jax.devices()`` spans the whole pod and the same Mesh/NamedSharding code
runs unchanged — XLA routes collectives over ICI within a slice and DCN
across slices.

Data loading: each process feeds only its addressable shard of the global
batch; use ``jax.make_array_from_process_local_data`` to assemble the
globally sharded Batch.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize multi-process JAX if the environment calls for it.

    No-op (returns False) in single-process runs.  Arguments default to the
    standard JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
    environment variables; on Cloud TPU pods all three are auto-detected and
    can stay None.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (int(env_np) if env_np else None)
    env_pid = os.environ.get("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (int(env_pid) if env_pid else None)

    if coordinator_address is None and num_processes is None:
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_local_batch_slice(global_batch_size: int) -> slice:
    """The [start, stop) rows of the global batch this process must feed."""
    import jax

    per = global_batch_size // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def make_global_batch(mesh, local_batch_tree):
    """Assemble a globally sharded Batch from per-process local shards."""
    import jax

    from hmd_ego_pose_tpu.parallel.mesh import batch_sharding

    sharding = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), local_batch_tree
    )
