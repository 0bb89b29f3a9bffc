from hmd_ego_pose_tpu.nn.core import (
    batch_norm_apply,
    batch_norm_init,
    conv_apply,
    conv_init,
    depthwise_conv_apply,
    depthwise_conv_init,
    max_pool_same,
    resize_nearest_2x,
    same_padding,
    swish,
)
