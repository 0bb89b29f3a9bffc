from hmd_ego_pose_tpu.eval.metrics import (
    check_add,
    check_add_s,
    check_2d_reprojection,
    check_5cm_5degree,
    compute_average_precision,
    rotation_diff_degrees,
    translation_diff,
)
from hmd_ego_pose_tpu.eval.evaluator import EvalResult, evaluate_model
