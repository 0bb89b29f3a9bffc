from hmd_ego_pose_tpu.utils.logging import MetricLogger
from hmd_ego_pose_tpu.utils.profiler import latency_histogram, profile_trace
