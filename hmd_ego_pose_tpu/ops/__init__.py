from hmd_ego_pose_tpu.ops.anchors import (
    anchors_for_shape,
    bbox_transform,
    translation_transform,
)
from hmd_ego_pose_tpu.ops.decode import (
    bbox_transform_inv,
    calculate_txty,
    clip_boxes,
    decode_translation,
    translation_transform_inv,
)
from hmd_ego_pose_tpu.ops.distances import (
    add_mean_distance,
    adds_mean_distance,
    min_distances,
    paired_distances,
)
from hmd_ego_pose_tpu.ops.geometry import (
    axis_angle_to_matrix,
    matrix_to_axis_angle,
    np_axis_angle_to_matrix,
    project_points,
    rotate_points,
    rotate_points_axis_angle,
    rotation_angular_distance,
    separate_axis_from_angle,
)
from hmd_ego_pose_tpu.ops.iou import iou_matrix, iou_matrix_np
from hmd_ego_pose_tpu.ops.nms import Detections, filter_detections, filter_detections_batch
from hmd_ego_pose_tpu.ops.preprocess import preprocess_scale, preprocess_uint8_batch
from hmd_ego_pose_tpu.ops.target_assign import (
    AnchorTargets,
    assign_targets,
    assign_targets_batch,
)
