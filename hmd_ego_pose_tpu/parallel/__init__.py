from hmd_ego_pose_tpu.parallel.mesh import (
    batch_sharding,
    image_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
