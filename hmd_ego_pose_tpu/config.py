"""Typed configuration for the HMD-EgoPose TPU framework.

The reference threads an untyped ``params`` dict assembled from argparse flags
through every layer (reference: pytorch-sandbox/main.py:28-67) and hard-codes
architecture hyper-parameters in per-phi tables (pytorch-sandbox/backbone.py:22-43)
and anchor defaults (pytorch-sandbox/generators/utils/anchors.py:59-66).  Here the
whole configuration surface is a tree of frozen dataclasses so that configs are
hashable (usable as jit static args), serializable, and validated at construction.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# ---------------------------------------------------------------------------
# Anchors
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class AnchorConfig:
    """Anchor pyramid description.

    Defaults reproduce AnchorParameters.default of the reference
    (pytorch-sandbox/generators/utils/anchors.py:59-66): five pyramid levels
    P3..P7, 3 ratios x 3 scales = 9 anchors per location.
    """

    sizes: Tuple[int, ...] = (32, 64, 128, 256, 512)
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    ratios: Tuple[float, ...] = (1.0, 0.5, 2.0)
    scales: Tuple[float, ...] = (2 ** 0, 2 ** (1.0 / 3.0), 2 ** (2.0 / 3.0))
    pyramid_levels: Tuple[int, ...] = (3, 4, 5, 6, 7)

    @property
    def num_anchors_per_location(self) -> int:
        return len(self.ratios) * len(self.scales)

    def num_anchors(self, image_size: int) -> int:
        """Total anchor count for a square input of ``image_size``."""
        total = 0
        for level in self.pyramid_levels:
            fm = (image_size + 2 ** level - 1) // (2 ** level)
            total += fm * fm * self.num_anchors_per_location
        return total


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

# Per-phi scaling tables (reference: pytorch-sandbox/backbone.py:22-43).
_BACKBONE_COMPOUND = (0, 1, 2, 3, 4, 5, 6, 6, 7)
_FPN_FILTERS = (64, 88, 112, 160, 224, 288, 384, 384, 384)
_FPN_REPEATS = (3, 4, 5, 6, 7, 7, 8, 8, 8)
_INPUT_SIZES = (512, 640, 768, 896, 1024, 1280, 1280, 1536, 1536)
_HEAD_REPEATS = (3, 3, 3, 4, 4, 4, 5, 5, 5)
_PYRAMID_LEVELS = (5, 5, 5, 5, 5, 5, 5, 5, 6)
# P3/P4/P5 channel widths coming out of each EfficientNet backbone
# (reference: pytorch-sandbox/backbone.py:32-43).
_CONV_CHANNELS = {
    0: (40, 112, 320),
    1: (40, 112, 320),
    2: (48, 120, 352),
    3: (48, 136, 384),
    4: (56, 160, 448),
    5: (64, 176, 512),
    6: (72, 200, 576),
    7: (80, 224, 640),
}

# EfficientNet compound scaling: name -> (width, depth, resolution, dropout)
# (reference: pytorch-sandbox/efficientnet/utils.py:138-153).
EFFICIENTNET_PARAMS = {
    0: (1.0, 1.0, 224, 0.2),
    1: (1.0, 1.1, 240, 0.2),
    2: (1.1, 1.2, 260, 0.3),
    3: (1.2, 1.4, 300, 0.3),
    4: (1.4, 1.8, 380, 0.4),
    5: (1.6, 2.2, 456, 0.4),
    6: (1.8, 2.6, 528, 0.5),
    7: (2.0, 3.1, 600, 0.5),
}

# Base MBConv stage spec: (num_repeat, kernel, stride, expand, in, out, se_ratio)
# decoded from the block strings in the reference
# (pytorch-sandbox/efficientnet/utils.py:235-240).
MBCONV_STAGES = (
    (1, 3, 1, 1, 32, 16, 0.25),
    (2, 3, 2, 6, 16, 24, 0.25),
    (2, 5, 2, 6, 24, 40, 0.25),
    (3, 3, 2, 6, 40, 80, 0.25),
    (3, 5, 1, 6, 80, 112, 0.25),
    (4, 5, 2, 6, 112, 192, 0.25),
    (1, 3, 1, 6, 192, 320, 0.25),
)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Full HMDEgoPose model hyper-parameters for a given phi."""

    phi: int = 0
    num_classes: int = 1
    image_size: int = 256  # the reference trains syn/real colibri at 256 (main.py:33)
    num_rotation_parameters: int = 3
    num_translation_parameters: int = 3
    num_hand_parameters: int = 63  # 21 joints x 3
    iter_steps: int = 0  # iterative refinement subnet steps (backbone.py:75-97)
    anchors: AnchorConfig = dataclasses.field(default_factory=AnchorConfig)
    # BN constants — single source of truth, threaded by hmd_ego_pose.apply
    # through backbone/BiFPN/heads (torch convention: new = (1-m)*old +
    # m*batch; reference momentum 0.01, eps 1e-3, efficientdet/model.py:36)
    bn_momentum: float = 0.01
    bn_epsilon: float = 1e-3
    fusion_epsilon: float = 1e-4  # BiFPN fast-attention epsilon (efficientdet/model.py:72)
    # Compute dtype for the conv stack; params and BN stats stay float32.
    compute_dtype: str = "float32"
    # Rematerialize MBConv blocks in the training backward pass
    # (jax.checkpoint): the train step is HBM-bound, so recomputing the
    # 6x-expanded block intermediates instead of saving them trades
    # nearly-free FLOPs for bytes.  No effect on inference or numerics.
    remat_backbone: bool = False
    # Drill-anchored hand decode (beyond reference parity, default off).
    # The reference's hand head regresses ABSOLUTE camera-frame joint
    # coordinates (hmdegopose/model.py:92-151, raw 63-float output); the
    # round-4 error decomposition showed position-agnostic conv features
    # cannot resolve the absolute placement spread (TRAIN_SYNTHETIC.md run-F
    # verdict).  With this flag the head regresses joint coordinates
    # RELATIVE to the object's translation: training targets subtract the
    # GT translation (train/step.py), inference adds back the PREDICTED
    # translation (models/hmd_ego_pose.py::predict) — exact inverses, so
    # hand MPJPE becomes (relative error) + (drill translation error)
    # instead of an absolute-regression floor.  Translation is metric mm;
    # hand coords are meters (the reference's unit split, eval/common.py:975).
    hand_relative: bool = False

    def __post_init__(self):
        if not 0 <= self.phi <= 8:
            raise ValueError(f"phi must be in [0, 8], got {self.phi}")

    # -- per-phi derived quantities ------------------------------------------------
    @property
    def backbone_coefficient(self) -> int:
        return _BACKBONE_COMPOUND[self.phi]

    @property
    def fpn_num_filters(self) -> int:
        return _FPN_FILTERS[self.phi]

    @property
    def fpn_cell_repeats(self) -> int:
        return _FPN_REPEATS[self.phi]

    @property
    def head_repeats(self) -> int:
        return _HEAD_REPEATS[self.phi]

    @property
    def num_pyramid_levels(self) -> int:
        return _PYRAMID_LEVELS[self.phi]

    @property
    def conv_channels(self) -> Tuple[int, int, int]:
        return _CONV_CHANNELS[self.backbone_coefficient]

    @property
    def num_anchors_per_location(self) -> int:
        return self.anchors.num_anchors_per_location

    @property
    def total_anchors(self) -> int:
        return self.anchors.num_anchors(self.image_size)


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss weights (reference: pytorch-sandbox/train.py:63-67, loss.py:95)."""

    classification_weight: float = 1.0
    regression_weight: float = 50.0  # smooth_l1 * 50 (loss.py:95) * 1.0 (train.py:64)
    rotation_weight: float = 100.0
    translation_weight: float = 0.1
    hand_weight: float = 1.0
    focal_alpha: float = 0.25
    focal_gamma: float = 1.5
    smooth_l1_sigma: float = 3.0
    num_model_points: int = 500  # 3-D point subsample used in the rotation loss
    # fixed-size positive-anchor slice in the transformation loss (the
    # reference uses a dynamic gather of all positives, loss.py:330-428).
    # Exact whenever the true positive count <= cap: measured worst case for
    # a single object is 44 positives at 256^2 / 46 at 512^2 over a box
    # size/aspect sweep (tests/test_losses.py pins this); scale with
    # max-objects-per-image for multi-object datasets.
    max_positive_anchors: int = 64


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 16
    learning_rate: float = 1e-4
    epochs: int = 50
    fine_tune: bool = False  # False: Adam, True: SGD+Nesterov (train.py:99-104)
    sgd_momentum: float = 0.9
    # global-norm gradient clipping BEFORE the optimizer; 0 disables.  The
    # reference ships it commented out (train.py:210, clip_grad_norm_ 0.001
    # — the Keras EfficientPose lineage's clipnorm), so parity default is
    # OFF; recipe lever for rotation-loss oscillation on small datasets.
    clip_grad_norm: float = 0.0
    # ReduceLROnPlateau equivalents (train.py:107-109)
    plateau_factor: float = 0.5
    plateau_patience: int = 15
    plateau_threshold: float = 1e-4
    min_learning_rate: float = 1e-7
    oversample: int = 10  # epoch length = dataset size x 10 (train.py:112)
    # validate/checkpoint every N epochs (1 = reference behavior).  On
    # relay-attached TPUs the FIRST device->host read of a session degrades
    # every subsequent program execution ~1000x (BENCH_NOTES.md), so long
    # runs set this high and amortize the eval cost across pure-compute
    # epochs that never fetch.
    eval_every: int = 1
    # Longest lax.scan the epoch runner may dispatch as one program.  The
    # relay-attached TPU worker crashes on single executions that scan too
    # many steps (375 dies deterministically, 187 is proven stable); longer
    # epochs run as several chunked dispatches of the same compiled program
    # (train/step.py plan_epoch_chunks).  <= 0 disables chunking.
    max_steps_per_dispatch: int = 160
    freeze_backbone: bool = True
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    checkpoint_dir: str = "train_weights"
    seed: int = 0
    # IoU thresholds for anchor target assignment (anchors.py:69-79)
    positive_overlap: float = 0.5
    negative_overlap: float = 0.4


# ---------------------------------------------------------------------------
# Data
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset: str = "syn_colibri"  # or "real_colibri"
    dataset_path: str = ""
    fold: int = 0
    object_id: int = 1
    image_size: int = 256
    translation_scale_norm: float = 1000.0  # dataset is in mm internally
    use_6dof_augmentation: bool = True
    use_colorspace_augmentation: bool = True
    # padded ground-truth rows per frame.  The colibri family is K=1; K>1
    # datasets must provide per-object 'mask_values' in annotations so the
    # 6-DoF warp can recompute each object's bbox from the warped mask.
    max_objects: int = 1
    chance_no_augmentation: float = 0.02
    scale_6dof_augmentation: Tuple[float, float] = (0.7, 1.3)
    num_workers: int = 4
    prefetch: int = 2
    # decode every frame+mask once into RAM (the 1-core host re-decodes each
    # frame ~10x/epoch otherwise); skipped when the decoded set exceeds budget
    preload: bool = True
    preload_budget_bytes: int = 8 << 30
    # run color/6-DoF augmentation + preprocessing ON DEVICE inside the train
    # step (ops/augment_device.py): the host ships cached uint8 frames + raw
    # labels only.  False = reference-style host augmentation in workers.
    device_augment: bool = True
    # keep the WHOLE dataset HBM-resident (data/device_dataset.py): uploaded
    # once, batches gathered by index on device; host ships (B,) indices per
    # step.  Requires device_augment; falls back when over the HBM budget.
    device_resident: bool = True
    device_resident_budget_bytes: int = 8 << 30


# ---------------------------------------------------------------------------
# Evaluation / serving
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    score_threshold: float = 0.5  # train-time validation threshold (train.py:258)
    nms_threshold: float = 0.5
    max_detections: int = 100
    iou_threshold: float = 0.5
    diameter_threshold: float = 0.1
    pixel_threshold: float = 5.0  # 2-D reprojection metric
    adds_max_points: int = 1000
    # device inference batch during evaluation (the reference is batch-1,
    # eval/common.py:377; batching is free on TPU at this model size)
    eval_batch_size: int = 8


@dataclasses.dataclass(frozen=True)
class ServingConfig:
    batch_size: int = 1
    max_batch_size: int = 16
    score_threshold: float = 0.5
    port: int = 18734
    # wire format: 24-byte little-endian packet of 6 float32 [rvec, tvec]
    # (reference: unity-sandbox/WebRTCNetCoreSandbox/Program.cs:279-297)
    pose_packet_floats: int = 6
    queue_depth: int = 64


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh layout.

    The reference is single-GPU; data parallelism exists only as dead code
    (train.py:123-126, utils/sync_batchnorm/).  Here DP is first-class: the
    batch is sharded over the ``data`` axis and BatchNorm statistics are
    all-reduced over it.  A ``model`` axis is reserved for sharding head
    channels should a larger phi ever need it.

    The ``space`` axis spatially partitions the image height dimension
    across chips (GSPMD inserts the conv halo exchanges automatically).
    This is the batch-1 LATENCY scale-out: the serving workload is one
    frame at a time (the reference's per-frame loop, Program.cs:128-297),
    where data parallelism cannot help — with ``spatial_parallel=k`` each
    chip convolves a 1/k horizontal slab of the same frame.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    spatial_axis: str = "space"
    data_parallel: int = -1  # -1: use all remaining devices
    model_parallel: int = 1
    spatial_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    serving: ServingConfig = dataclasses.field(default_factory=ServingConfig)
    parallel: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)
