from hmd_ego_pose_tpu.train.state import TrainState, create_train_state
from hmd_ego_pose_tpu.train.step import Batch, make_eval_forward, make_train_step
from hmd_ego_pose_tpu.train.plateau import ReduceLROnPlateau
