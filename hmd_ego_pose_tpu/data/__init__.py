from hmd_ego_pose_tpu.data.colibri import ColibriDataset
from hmd_ego_pose_tpu.data.pipeline import InputPipeline
