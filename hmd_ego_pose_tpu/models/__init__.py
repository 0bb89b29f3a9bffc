from hmd_ego_pose_tpu.models import bifpn, efficientnet, heads, hmd_ego_pose
from hmd_ego_pose_tpu.models.hmd_ego_pose import (
    RawOutputs,
    apply,
    decode_outputs,
    init,
    make_predict_fn,
    predict,
)
