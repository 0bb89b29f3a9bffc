"""hmd_ego_pose_tpu: a TPU-native 6-DoF object + hand pose estimation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
doughtmw/hmd-ego-pose (single-RGB-frame 6-DoF surgical-drill pose + 21-joint
hand pose via an EfficientPose-style detector), designed TPU-first:

* pure-functional model (params pytree + apply) compiled by XLA,
* anchors, decode, NMS, and losses fused into single on-device programs,
* SPMD data parallelism over a jax.sharding.Mesh with collective BatchNorm,
* a batched streaming serving engine that preserves the reference's
  24-byte pose-packet wire contract.
"""

__version__ = "0.1.0"

from hmd_ego_pose_tpu.config import (
    AnchorConfig,
    Config,
    DataConfig,
    EvalConfig,
    LossConfig,
    ModelConfig,
    ParallelConfig,
    ServingConfig,
    TrainConfig,
)
