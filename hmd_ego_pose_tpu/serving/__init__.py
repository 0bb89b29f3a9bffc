from hmd_ego_pose_tpu.serving.engine import InferenceEngine
from hmd_ego_pose_tpu.serving.protocol import (
    POSE_PACKET_BYTES,
    decode_frame_message,
    encode_frame_message,
    encode_pose_packet,
    decode_pose_packet,
)
from hmd_ego_pose_tpu.serving.server import PoseServer
