"""The jitted training step: targets + forward + loss + grad + update, fused.

One XLA program per step.  Contrast with the reference's step
(pytorch-sandbox/train.py:163-211 + hmdegopose/loss.py:54-98): host-side
numpy anchor regeneration, per-image Cython IoU in dataloader workers, a
Python loop over the batch for losses, and scattered host<->device hops.
Here the host ships only raw pixels + padded ground truth; everything else
happens on device.  Under jit + NamedSharding over the data axis, gradient
and BatchNorm reductions become ICI collectives automatically.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from hmd_ego_pose_tpu.config import Config, LossConfig, ModelConfig, TrainConfig
from hmd_ego_pose_tpu.losses import LossBundle, total_loss
from hmd_ego_pose_tpu.models import hmd_ego_pose
from hmd_ego_pose_tpu.ops.anchors import anchors_for_shape
from hmd_ego_pose_tpu.ops.decode import decode_translation
from hmd_ego_pose_tpu.ops.target_assign import assign_targets_batch
from hmd_ego_pose_tpu.train.state import TrainState, make_optimizer


class Batch(NamedTuple):
    """Host -> device training batch with padded ground truth.

    The reference ships fully materialized per-anchor targets from dataloader
    workers (batch_size x 12276 x 68 floats); we ship the raw annotations
    (K_max rows per image) and assign targets on device.
    """

    images: jax.Array  # (B, H, W, 3) preprocessed float32
    camera_parameters: jax.Array  # (B, 6)
    gt_boxes: jax.Array  # (B, K, 4)
    gt_labels: jax.Array  # (B, K) int32
    gt_transformation: jax.Array  # (B, K, 8) [rot/pi, trans, is_sym, class]
    gt_coords_3d: jax.Array  # (B, K, 63)
    gt_valid: jax.Array  # (B, K) bool


def _compute_losses(
    params,
    bn_state,
    batch: Batch,
    rng,
    model_points,
    model_cfg: ModelConfig,
    loss_cfg: LossConfig,
    train_cfg: TrainConfig,
) -> Tuple[jax.Array, Tuple[LossBundle, Dict[str, Any]]]:
    outputs, new_bn = hmd_ego_pose.apply(
        params, bn_state, batch.images, model_cfg, training=True, rng=rng
    )

    anchors_np, trans_anchors_np = anchors_for_shape(
        (model_cfg.image_size, model_cfg.image_size), model_cfg.anchors
    )
    targets = assign_targets_batch(
        jnp.asarray(anchors_np),
        batch.gt_boxes,
        batch.gt_labels,
        batch.gt_transformation,
        batch.gt_coords_3d,
        batch.gt_valid,
        num_classes=model_cfg.num_classes,
        image_size=model_cfg.image_size,
        positive_overlap=train_cfg.positive_overlap,
        negative_overlap=train_cfg.negative_overlap,
    )
    targets = jax.tree.map(jax.lax.stop_gradient, targets)

    translation = decode_translation(
        jnp.asarray(trans_anchors_np)[None], outputs.translation_raw, batch.camera_parameters
    )

    bundle = total_loss(
        targets,
        outputs.classification,
        outputs.regression,
        outputs.rotation,
        translation,
        outputs.hand,
        model_points,
        config=loss_cfg,
    )
    return bundle.total, (bundle, new_bn)


def make_train_step(config: Config, model_points):
    """Build the jitted (state, batch, rng) -> (state, metrics) step.

    ``model_points``: (num_classes, P, 3) loss point subsample, a baked-in
    constant (the reference re-uploads it every step, train.py:192).
    """
    model_cfg, train_cfg, loss_cfg = config.model, config.train, config.train.loss
    # keep as a host-side numpy constant: it embeds into the lowered program
    # without a device->host read at trace time
    import numpy as np

    model_points = np.asarray(model_points, np.float32)

    def step(state: TrainState, batch: Batch, rng) -> Tuple[TrainState, Dict[str, jax.Array]]:
        grad_fn = jax.value_and_grad(_compute_losses, has_aux=True)
        (total, (bundle, new_bn)), grads = grad_fn(
            state.params, state.bn_state, batch, rng, model_points,
            model_cfg, loss_cfg, train_cfg,
        )
        updates, new_opt = step.tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            bn_state=new_bn,
            opt_state=new_opt,
        )
        metrics = {
            "loss": total,
            "classification_loss": bundle.classification,
            "regression_loss": bundle.regression,
            "rotation_loss": bundle.rotation,
            "translation_loss": bundle.translation,
            "hand_loss": bundle.hand,
        }
        return new_state, metrics

    def init_state(params, bn_state) -> TrainState:
        step.tx = make_optimizer(train_cfg, params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            bn_state=bn_state,
            opt_state=step.tx.init(params),
        )

    step.init_state = init_state
    step.jitted = jax.jit(step, donate_argnums=(0,))
    return step


def make_eval_forward(config: Config, score_threshold: Optional[float] = None):
    """Jitted eval-branch forward: images -> filtered detections.

    Equivalent of the reference TrainModelWithLoss eval path
    (train.py:72-85) — decode + NMS fused on device.
    """
    thr = config.eval.score_threshold if score_threshold is None else score_threshold
    return hmd_ego_pose.make_predict_fn(
        config.model,
        score_threshold=thr,
        iou_threshold=config.eval.nms_threshold,
        max_detections=config.eval.max_detections,
    )
