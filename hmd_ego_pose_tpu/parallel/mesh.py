"""Device-mesh construction and sharding rules.

The reference is single-process single-GPU; its only multi-device artifacts
are dead code (torch DataParallel comments, pytorch-sandbox/train.py:123-126,
and the vestigial master/slave SyncBN in utils/sync_batchnorm/).  Here the
scaling story is SPMD over a ``jax.sharding.Mesh``:

* ``data`` axis: the batch dimension of every input/target tensor is sharded
  across it; gradients and BatchNorm statistics become global automatically
  because XLA GSPMD turns whole-array reductions into cross-device
  collectives over ICI.
* ``model`` axis: reserved for channel sharding of wide heads at larger phi;
  kept size 1 by default (EfficientDet-D0 is 4M params — replication wins).
* ``space`` axis: spatial partitioning of the image height dimension —
  GSPMD turns every conv into slab-conv + halo exchange over ICI.  This is
  the batch-1 serving latency scale-out (DP cannot split one frame).

No explicit psum/pmean calls are needed in the model code under jit +
NamedSharding; the compiler inserts the collectives.  (shard_map variants can
still pass ``axis_name`` to BatchNorm for manual-collective mode.)
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hmd_ego_pose_tpu.config import ParallelConfig


def make_mesh(
    config: ParallelConfig = ParallelConfig(),
    devices=None,
) -> Mesh:
    """Build a (data, model, space) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    model = max(1, config.model_parallel)
    space = max(1, config.spatial_parallel)
    data = config.data_parallel if config.data_parallel > 0 else n // (model * space)
    if data * model * space != n:
        raise ValueError(f"mesh {data}x{model}x{space} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model, space)
    return Mesh(dev_array, (config.data_axis, config.model_axis, config.spatial_axis))


def batch_sharding(mesh: Mesh, axis: Optional[str] = None) -> NamedSharding:
    """Shard dim 0 (batch) over the data axis, replicate the rest."""
    axis = axis or mesh.axis_names[0]
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def image_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC images: batch over ``data``, HEIGHT over ``space``.

    Under jit, GSPMD propagates the spatial sharding through the whole conv
    stack, inserting halo exchanges at each kernel boundary; the per-anchor
    flatten in the heads is where it all-gathers (tiny tensors by then).
    With a pure-space mesh this turns one frame into k cooperating slabs —
    the only way multiple chips can cut the latency of a single image.
    """
    axes = list(mesh.axis_names)
    data = axes[0]
    space = axes[2] if len(axes) > 2 else None
    if space is not None and mesh.shape[space] == 1:
        space = None  # trivial axis: don't constrain H
    return NamedSharding(mesh, P(data, space))


def shard_batch(mesh: Mesh, tree):
    """Place every array in a pytree with its batch dim sharded over data."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
