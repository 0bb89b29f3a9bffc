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
from hmd_ego_pose_tpu.ops.decode import decode_translation, hand_to_relative
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
    gt_coords_3d = batch.gt_coords_3d
    if model_cfg.hand_relative:
        # drill-anchored hand targets: subtract each row's GT translation
        # from its 21 joints; predict() adds the PREDICTED translation
        # back, so the pair is an exact inverse at gt == pred
        # (tests/test_ops.py::test_hand_relative_roundtrip)
        gt_coords_3d = hand_to_relative(
            gt_coords_3d, batch.gt_transformation[..., 3:6]
        )
    targets = assign_targets_batch(
        jnp.asarray(anchors_np),
        batch.gt_boxes,
        batch.gt_labels,
        batch.gt_transformation,
        gt_coords_3d,
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


def effective_loss_config(config: Config) -> LossConfig:
    """Resolve the per-run LossConfig: the positive-anchor cap is PER OBJECT.

    ``LossConfig.max_positive_anchors`` is sized for one object (measured
    single-object worst case 44/46 positives at 256/512 px, pinned by
    tests/test_losses.py); a K-object scene can legitimately have K times as
    many positives (measured 62 at K=2 / 128 px before any scale-up warp),
    and a saturated cap silently DROPS positives from the transformation
    loss.  Scale the cap by ``data.max_objects`` so multi-object datasets
    keep the slice exact without every caller remembering to resize it.
    """
    k = max(1, int(config.data.max_objects))
    loss = config.train.loss
    if k == 1:
        return loss
    import dataclasses

    return dataclasses.replace(
        loss, max_positive_anchors=loss.max_positive_anchors * k
    )


def make_train_step(
    config: Config,
    model_points,
    device_augment: bool = False,
    device_data: bool = False,
    mesh=None,
):
    """Build the jitted (state, batch, rng) -> (state, metrics) step.

    ``model_points``: (num_classes, P, 3) loss point subsample, a baked-in
    constant (the reference re-uploads it every step, train.py:192).

    ``device_augment``: the step consumes an ``ops.augment_device.RawBatch``
    of cached uint8 frames + raw labels and runs color/6-DoF augmentation +
    preprocessing on device, fused ahead of the forward pass — the TPU-native
    alternative to host DataLoader augmentation (this host has ONE core).

    ``device_data``: the step consumes ``(DeviceData, idx)`` — the whole
    dataset is HBM-resident (data/device_dataset.py) and the batch is
    gathered by index on device; the host ships (B,) int32 per step.
    Implies ``device_augment``.

    ``mesh``: data-parallel composition with the device-resident path.  The
    dataset is replicated across the mesh and the per-step index vector is
    sharded over the data axis, so each device gathers + augments + forwards
    only its local batch shard; explicit sharding constraints pin the batch
    layout so GSPMD cannot fall back to a replicated gather.  Gradient and
    BatchNorm reductions become ICI collectives automatically (params
    replicated, batch sharded).
    """
    if device_data:
        device_augment = True
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        _bsh = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))

        def _constrain(tree):
            return jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, _bsh), tree
            )
    else:
        _constrain = lambda tree: tree
    model_cfg, train_cfg = config.model, config.train
    loss_cfg = effective_loss_config(config)
    # keep as a host-side numpy constant: it embeds into the lowered program
    # without a device->host read at trace time
    import numpy as np

    model_points = np.asarray(model_points, np.float32)

    def step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict[str, jax.Array]]:
        if device_data:
            from hmd_ego_pose_tpu.data.device_dataset import gather_raw_batch

            data, idx = batch
            batch = _constrain(gather_raw_batch(data, idx))
        if device_augment:
            from hmd_ego_pose_tpu.ops.augment_device import augment_and_preprocess_batch

            rng, aug_key = jax.random.split(rng)
            dc = config.data
            batch = augment_and_preprocess_batch(
                aug_key, batch, model_cfg.image_size,
                translation_scale_norm=dc.translation_scale_norm,
                chance_no_augmentation=dc.chance_no_augmentation,
                use_colorspace=dc.use_colorspace_augmentation,
                use_6dof=dc.use_6dof_augmentation,
                scale_range=dc.scale_6dof_augmentation,
            )
            batch = _constrain(batch)
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

        # optimizer-state init is hundreds of tiny zeros_like programs; on a
        # remote-attached accelerator each would pay a dispatch + remote
        # compile.  The optimizer state depends on params only through
        # shapes/dtypes (adam/sgd moments are zeros, counts start at 0,
        # hyperparams come from config), so build it on the HOST from
        # shape-matched host zeros — NEVER from accelerator-resident params,
        # whose device->host read would permanently degrade relay sessions —
        # and bulk-upload it in one packed transfer (utils/device.py).
        # ``params``/``bn_state`` themselves are left wherever they live
        # (already device-resident after init/restore).
        if jax.default_backend() != "cpu":
            try:
                cpu = jax.devices("cpu")[0]
            except RuntimeError:
                cpu = None
            if cpu is not None:
                import numpy as np

                from hmd_ego_pose_tpu.utils.device import is_host_tree, to_default_device

                host_zeros = jax.tree.map(
                    lambda x: np.zeros(x.shape, x.dtype), params
                )
                with jax.default_device(cpu):
                    hot = (jnp.zeros((), jnp.int32), step.tx.init(host_zeros))
                # params/bn from a host-side source (torch converter, npz
                # without upload) join the same packed transfer; already
                # device-resident trees are left in place
                if is_host_tree((params, bn_state)):
                    step_ctr, opt_state, params, bn_state = to_default_device(
                        (*hot, params, bn_state)
                    )
                else:
                    step_ctr, opt_state = to_default_device(hot)
                return TrainState(
                    step=step_ctr, params=params, bn_state=bn_state,
                    opt_state=opt_state,
                )
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            bn_state=bn_state,
            opt_state=step.tx.init(params),
        )

    step.init_state = init_state
    step.jitted = jax.jit(step, donate_argnums=(0,))
    return step


def plan_epoch_chunks(n_steps: int, max_chunk: int) -> list:
    """Split an epoch of ``n_steps`` into scan chunks of at most ``max_chunk``.

    Relay-attached TPU workers crash ("TPU worker process crashed or
    restarted") when a single dispatched program scans too many train steps
    — measured: 375-step epoch programs die deterministically, 187-step
    programs are stable over multi-hour runs.  Long epochs are therefore
    dispatched as several scan chunks of the same program.

    Prefers an equal split (one compiled program per run) by looking for a
    divisor-based chunk count; falls back to a near-equal split (at most two
    distinct chunk lengths -> at most two compiles) when ``n_steps`` has no
    usable divisor.  ``max_chunk <= 0`` disables chunking.
    """
    if max_chunk <= 0 or n_steps <= max_chunk:
        return [n_steps]
    k = -(-n_steps // max_chunk)  # ceil
    # smallest chunk count >= k that divides n_steps evenly; bound the search
    # so chunks never shrink below ~max_chunk/4 (dispatch overhead stays nil)
    for kk in range(k, 4 * k + 1):
        if n_steps % kk == 0:
            return [n_steps // kk] * kk
    base, rem = divmod(n_steps, k)
    return [base + 1] * rem + [base] * (k - rem)


def make_epoch_runner(config: Config, model_points, mesh=None):
    """Whole-epoch training as ONE jitted program: lax.scan over the steps.

    Requires HBM-resident data (device_data mode).  The host dispatches one
    program per epoch with a (steps, B) index array and per-step PRNG keys —
    on relay-attached TPUs each dispatch costs 35-50 ms once any result has
    been fetched, so per-step dispatch would dominate the 7 ms step.
    Returns (state, mean-metrics-dict) with the means reduced on device.
    Epochs longer than ``train.max_steps_per_dispatch`` are dispatched as
    several chunks of this program by the Trainer (see plan_epoch_chunks).

    Under a ``mesh`` the scan body is the data-parallel step: per-step
    indices arrive sharded over the data axis (Trainer shards the (steps, B)
    array as P(None, 'data')), the replicated dataset is gathered locally,
    and XLA GSPMD inserts the gradient/BN collectives — one program per
    epoch, all-ICI, no per-step host involvement.
    """
    step = make_train_step(config, model_points, device_data=True, mesh=mesh)

    def epoch(state, data, idxs, keys):
        def body(carry, xs):
            idx, key = xs
            new_state, metrics = step(carry, (data, idx), key)
            return new_state, metrics

        state, ms = jax.lax.scan(body, state, (idxs, keys))
        return state, jax.tree.map(jnp.mean, ms)

    runner = jax.jit(epoch, donate_argnums=(0,))
    runner.init_state = step.init_state
    runner.step = step  # the single-step fallback sharing the same optimizer
    return runner


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
