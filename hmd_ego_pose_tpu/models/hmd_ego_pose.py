"""HMDEgoPose: EfficientNet backbone + BiFPN + 5 anchor heads, assembled.

Functional equivalent of the reference top model
(pytorch-sandbox/backbone.py:13-133), exposing the same output tuple
``(features, regression, classification, rotation, translation_raw, hand)``
but as a pure function of a params/state pytree, plus a fully fused
``predict`` program (forward + anchor decode + NMS) that keeps a frame on
device from preprocessed pixels to final pose — the path the reference
splits across torch, numpy, and TensorFlow
(pytorch-sandbox/train.py:72-85, hmdegopose/loss.py:12-51,
hmdegopose/layers.py:260-530).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from hmd_ego_pose_tpu.config import ModelConfig
from hmd_ego_pose_tpu.models import bifpn, efficientnet, heads
from hmd_ego_pose_tpu.ops.anchors import anchors_for_shape
from hmd_ego_pose_tpu.ops.decode import (
    bbox_transform_inv,
    clip_boxes,
    decode_translation,
    hand_to_absolute,
)
from hmd_ego_pose_tpu.ops.nms import (
    Detections,
    filter_detections_batch,
    filter_detections_fused_batch,
)


class RawOutputs(NamedTuple):
    """Raw head outputs, matching the reference forward's tuple
    (backbone.py:104-125)."""

    features: Tuple[jax.Array, ...]  # 5-level pyramid
    regression: jax.Array  # (B, N, 4)
    classification: jax.Array  # (B, N, num_classes), sigmoided
    rotation: jax.Array  # (B, N, 3) axis-angle / pi
    translation_raw: jax.Array  # (B, N, 3) anchor-relative (dx, dy, tz)
    hand: jax.Array  # (B, N, 63)


def init(key, config: ModelConfig) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Build the full params/state pytree for a given phi.

    Initialization runs on the HOST backend when an accelerator is the
    default: it is ~600 tiny random-op programs, and on a remote-attached
    TPU each would pay a dispatch roundtrip AND a fresh remote compile
    (measured ~6 minutes over the relay vs ~40 s on CPU).  jax's PRNG is
    backend-deterministic, so the values are identical.  The finished tree
    is then transferred to the accelerator in ONE packed upload
    (utils/device.py) — CPU-committed leaves left in place would be
    re-uploaded on every non-donating jit call (measured 469 ms/call vs
    0.76 ms for phi-0 predict over the relay).

    ``key``: an int seed (preferred — the key is created host-side) or a
    PRNG key array.  An ACCELERATOR-resident key forces the whole init onto
    the accelerator: pulling the key back to the host would be a
    device->host read, the permanent ~35 ms/exec degrade trigger on
    relay-attached TPUs (BENCH_NOTES.md).
    """
    # under tracing (eval_shape for param counting / FLOP analysis) there is
    # no placement to manage — tracers have no .devices()
    if isinstance(key, jax.core.Tracer):
        return _init_impl(key, config)
    if jax.default_backend() != "cpu":
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None
        key_on_host = isinstance(key, int) or all(
            d.platform == "cpu" for d in getattr(key, "devices", set)()
        )
        if cpu is not None and key_on_host:
            from hmd_ego_pose_tpu.utils.device import to_default_device

            with jax.default_device(cpu):
                if isinstance(key, int):
                    key = jax.random.PRNGKey(key)
                tree = _init_impl(key, config)
            return to_default_device(tree)
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)
        return _init_impl(key, config)
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    return _init_impl(key, config)


def init_host(key, config: ModelConfig) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Like :func:`init` but the tree STAYS on the host (CPU backend).

    For consumers that must read/merge the values host-side — e.g. the
    torch weight-converter template (models/weights.py) — where an
    accelerator-resident tree would force device->host reads, the permanent
    degrade trigger on relay-attached TPUs.  Values are identical to
    ``init`` (jax's PRNG is backend-deterministic).
    """
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is None:
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)
        return _init_impl(key, config)
    with jax.default_device(cpu):
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)
        return _init_impl(key, config)


def _init_impl(key, config: ModelConfig) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    keys = jax.random.split(key, 7)
    num_anchors = config.num_anchors_per_location
    fpn_ch = config.fpn_num_filters
    levels = config.num_pyramid_levels
    repeats = config.head_repeats

    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}

    params["backbone"], state["backbone"] = efficientnet.init(
        keys[0], config.backbone_coefficient
    )
    params["bifpn"], state["bifpn"] = bifpn.init(
        keys[1], fpn_ch, config.conv_channels, config.fpn_cell_repeats
    )
    params["regressor"], state["regressor"] = heads.head_init(
        keys[2], fpn_ch, 4, num_anchors, repeats, levels
    )
    # classifier header bias starts at the focal-loss prior (p = 0.01,
    # RetinaNet-style) so early training isn't swamped by background anchors.
    # The reference ends up training its 1-class heads from random init
    # because its 90-class pretrained load fails strict=True and the
    # exception is swallowed (backbone.py:127-133).
    params["classifier"], state["classifier"] = heads.head_init(
        keys[3], fpn_ch, config.num_classes, num_anchors, repeats, levels,
        header_bias_init=-4.59511985013459,  # -log((1 - 0.01) / 0.01)
    )
    params["rotation"], state["rotation"] = heads.head_init(
        keys[4], fpn_ch, config.num_rotation_parameters, num_anchors, repeats, levels,
        config.iter_steps,
    )
    params["translation"], state["translation"] = heads.translation_head_init(
        keys[5], fpn_ch, num_anchors, repeats, levels, config.iter_steps
    )
    params["hand"], state["hand"] = heads.head_init(
        keys[6], fpn_ch, config.num_hand_parameters, num_anchors, repeats, levels,
        config.iter_steps,
    )
    return params, state


def apply(
    params,
    state,
    images,
    config: ModelConfig,
    training: bool = False,
    rng: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    capture: Optional[Dict[str, Any]] = None,
) -> Tuple[RawOutputs, Dict[str, Any]]:
    """Forward pass: NHWC images -> raw head outputs.

    ``images`` are already preprocessed (normalized float).  The conv stack
    runs in ``config.compute_dtype``; outputs are float32.

    ``capture``: optional dict that collects intermediate activations
    (backbone pyramid, per-BiFPN-cell outputs) — the per-layer diffing
    harness for validating converted reference checkpoints
    (SURVEY.md §7 "hard parts").
    """
    x = images.astype(jnp.dtype(config.compute_dtype))
    new_state: Dict[str, Any] = {}

    feats, new_state["backbone"] = efficientnet.apply(
        params["backbone"], state["backbone"], x,
        coefficient=config.backbone_coefficient,
        training=training, rng=rng, axis_name=axis_name,
        bn_momentum=config.bn_momentum, bn_eps=config.bn_epsilon,
        remat=config.remat_backbone,
    )
    if capture is not None:
        capture["backbone.p3"], capture["backbone.p4"], capture["backbone.p5"] = feats
    pyramid, new_state["bifpn"] = bifpn.apply(
        params["bifpn"], state["bifpn"], feats,
        attention=config.phi < 6, training=training, axis_name=axis_name,
        capture=capture,
        bn_momentum=config.bn_momentum, bn_eps=config.bn_epsilon,
        fusion_eps=config.fusion_epsilon,
    )

    bn_kw = dict(bn_momentum=config.bn_momentum, bn_eps=config.bn_epsilon)
    regression, new_state["regressor"] = heads.head_apply(
        params["regressor"], state["regressor"], pyramid, 4,
        training=training, axis_name=axis_name, **bn_kw,
    )
    classification, new_state["classifier"] = heads.classification_apply(
        params["classifier"], state["classifier"], pyramid, config.num_classes,
        training=training, axis_name=axis_name, **bn_kw,
    )
    rotation, new_state["rotation"] = heads.head_apply(
        params["rotation"], state["rotation"], pyramid, config.num_rotation_parameters,
        config.iter_steps, training=training, axis_name=axis_name, **bn_kw,
    )
    translation_raw, new_state["translation"] = heads.translation_head_apply(
        params["translation"], state["translation"], pyramid,
        config.iter_steps, training=training, axis_name=axis_name, **bn_kw,
    )
    hand, new_state["hand"] = heads.head_apply(
        params["hand"], state["hand"], pyramid, config.num_hand_parameters,
        config.iter_steps, training=training, axis_name=axis_name, **bn_kw,
    )

    out = RawOutputs(
        features=pyramid,
        regression=regression.astype(jnp.float32),
        classification=classification.astype(jnp.float32),
        rotation=rotation.astype(jnp.float32),
        translation_raw=translation_raw.astype(jnp.float32),
        hand=hand.astype(jnp.float32),
    )
    return out, new_state


# ---------------------------------------------------------------------------
# Fused inference program
# ---------------------------------------------------------------------------


def decode_outputs(outputs: RawOutputs, camera_parameters, config: ModelConfig):
    """Anchor decode on raw outputs: boxes (clipped) and metric translation.

    Anchors are compile-time constants (the reference regenerates them in
    numpy every step, hmdegopose/loss.py:25-28).
    """
    anchors_np, trans_anchors_np = anchors_for_shape(
        (config.image_size, config.image_size), config.anchors
    )
    anchors = jnp.asarray(anchors_np)
    trans_anchors = jnp.asarray(trans_anchors_np)

    boxes = bbox_transform_inv(anchors[None], outputs.regression)
    boxes = clip_boxes(boxes, config.image_size, config.image_size)
    translation = decode_translation(
        trans_anchors[None], outputs.translation_raw, camera_parameters
    )
    return boxes, translation


def predict(
    params,
    state,
    images,
    camera_parameters,
    config: ModelConfig,
    score_threshold: float = 0.5,
    iou_threshold: float = 0.5,
    max_detections: int = 100,
) -> Detections:
    """Fused: forward -> top-k -> decode -> filter.  One XLA program,
    HBM-resident.

    Returns batch Detections; ``rotation`` is still in the network's
    normalized units (multiply by pi for radians, eval/common.py:466).

    The anchor decode runs AFTER candidate selection (ops/nms.py
    filter_detections_fused): only the top-k anchors' boxes/translations are
    decoded, so the (B, N, 4)+(B, N, 3) full decoded tensors are never
    written to HBM.  Bit-identical to decode_outputs -> filter_detections
    (the decode is elementwise per anchor; pinned by
    tests/test_ops.py::test_fused_filter_matches_legacy).
    """
    outputs, _ = apply(params, state, images, config, training=False)
    anchors_np, trans_anchors_np = anchors_for_shape(
        (config.image_size, config.image_size), config.anchors
    )
    dets = filter_detections_fused_batch(
        outputs.regression,
        outputs.classification,
        outputs.rotation,
        outputs.translation_raw,
        outputs.hand,
        jnp.asarray(anchors_np),
        jnp.asarray(trans_anchors_np),
        camera_parameters,
        config.image_size,
        config.image_size,
        score_threshold=score_threshold,
        iou_threshold=iou_threshold,
        max_detections=max_detections,
    )
    if config.hand_relative:
        # drill-anchored hand head (ModelConfig.hand_relative): the head
        # regressed joint offsets from the object translation; re-anchor on
        # the PREDICTED translation (mm -> m, hand coords are meters).
        # Exact inverse of the training-target transform (train/step.py).
        dets = dets._replace(hand=hand_to_absolute(dets.hand, dets.translation))
    return dets


def make_predict_fn(
    config: ModelConfig,
    score_threshold: float = 0.5,
    iou_threshold: float = 0.5,
    max_detections: int = 100,
):
    """jit-compiled predict closure with config baked in statically."""

    @jax.jit
    def fn(params, state, images, camera_parameters):
        return predict(
            params, state, images, camera_parameters, config,
            score_threshold=score_threshold,
            iou_threshold=iou_threshold,
            max_detections=max_detections,
        )

    return fn
