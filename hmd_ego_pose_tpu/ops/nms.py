"""Fixed-shape on-device non-maximum suppression and detection filtering.

The reference's FilterDetections leaves the GPU, converts torch -> TensorFlow
tensors on the CPU, runs ``tf.image.non_max_suppression``, and converts back
through numpy (pytorch-sandbox/hmdegopose/layers.py:260-530) — with an
effective batch size of 1.  Here the whole filter (score threshold -> greedy
NMS -> top-K -> pad-with-(-1)) is a static-shape jnp program: it jits, vmaps
over the batch, and fuses into the single inference XLA program so a frame
never leaves HBM between forward pass and final pose.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# deliberately the jnp path, not the Pallas kernel: at the NMS candidate
# shape (100 x 100) the Pallas version measured 0.94x on a v5e — padding
# overhead eats the win (scripts/bench_pallas.py); the Pallas kernel pays
# off at the 12k-anchor target-assignment shape instead
from hmd_ego_pose_tpu.ops.iou import iou_matrix


class Detections(NamedTuple):
    """Filtered detections, padded to ``max_detections`` with -1.

    Field layout matches the reference's filter_detections return
    (layers.py:394-400) plus an explicit validity count.
    """

    boxes: jax.Array  # (K, 4)
    scores: jax.Array  # (K,)
    labels: jax.Array  # (K,) int32, -1 for padding
    rotation: jax.Array  # (K, 3)
    translation: jax.Array  # (K, 3)
    hand: jax.Array  # (K, 63)
    num_valid: jax.Array  # () int32


def greedy_nms_mask(boxes, scores, valid, iou_threshold: float):
    """Greedy NMS keep-mask over score-descending candidates.

    Args:
        boxes: (K, 4) candidate boxes sorted by descending score.
        scores: (K,) their scores (unused except for dtype symmetry).
        valid: (K,) bool, False for below-threshold/padding entries.
        iou_threshold: suppression IoU threshold.
    Returns:
        (K,) bool keep mask.  Matches tf.image.non_max_suppression semantics
        for pre-sorted inputs: a candidate is suppressed if it overlaps a
        *kept* earlier candidate above the threshold.
    """
    k = boxes.shape[0]
    iou = iou_matrix(boxes, boxes)  # (K, K)
    over = iou > iou_threshold

    def body(i, keep):
        # suppressed if any kept j < i overlaps i
        earlier = (jnp.arange(k) < i) & keep
        suppressed = jnp.any(earlier & over[i])
        return keep.at[i].set(keep[i] & ~suppressed)

    return jax.lax.fori_loop(0, k, body, valid)


def filter_detections(
    boxes,
    classification,
    rotation,
    translation,
    hand,
    score_threshold: float = 0.01,
    iou_threshold: float = 0.5,
    max_detections: int = 100,
    nms: bool = True,
    class_specific: bool = True,
) -> Detections:
    """Single-image detection filter (score threshold + NMS + top-K + pad).

    Args:
        boxes: (N, 4) decoded, clipped boxes.
        classification: (N, C) sigmoid scores.
        rotation: (N, 3); translation: (N, 3); hand: (N, 63).
        class_specific: NMS each class independently, then merge by score —
            the reference's ``class_specific_filter=True`` default
            (layers.py:347-362): a detection never suppresses one of ANOTHER
            class.  False takes the best-scoring class per anchor and runs
            one class-agnostic NMS (layers.py:364-374).
    Returns:
        Detections padded to ``max_detections`` with -1 (layers.py:376-392).

    For C == 1 the two modes are identical and share one code path (the
    single-class program is byte-stable for the deployed colibri config).
    """
    num_classes = classification.shape[-1]
    k = max_detections

    if num_classes > 1 and class_specific:
        return _filter_detections_per_class(
            boxes, classification, rotation, translation, hand,
            score_threshold, iou_threshold, k, nms,
        )

    scores = jnp.max(classification, axis=-1)  # (N,)
    labels = jnp.argmax(classification, axis=-1).astype(jnp.int32)

    # candidate pool size: anchors number ~12k >> k in deployment, where this
    # is exactly k (byte-stable program); tiny toy inputs clamp + pad
    kc = min(k, boxes.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, kc)
    valid = top_scores > score_threshold
    top_boxes = boxes[top_idx]

    if nms:
        keep = greedy_nms_mask(top_boxes, top_scores, valid, iou_threshold)
    else:
        keep = valid

    # stable-compact kept entries to the front, preserving score order
    order = jnp.argsort(~keep, stable=True)
    src = top_idx[order]
    kept = keep[order]

    num_valid = jnp.sum(keep.astype(jnp.int32))

    def fullpad(arr, fill):  # (kc, ...) -> (k, ...)
        if kc == k:
            return arr
        widths = [(0, k - kc)] + [(0, 0)] * (arr.ndim - 1)
        return jnp.pad(arr, widths, constant_values=fill)

    def pad(x, fill=-1.0):
        gathered = x[src]
        mask_shape = (kc,) + (1,) * (gathered.ndim - 1)
        return fullpad(jnp.where(kept.reshape(mask_shape), gathered, fill), fill)

    out_labels = fullpad(jnp.where(kept, labels[src], -1), -1).astype(jnp.int32)
    return Detections(
        boxes=pad(boxes),
        scores=fullpad(jnp.where(kept, top_scores[order], -1.0), -1.0),
        labels=out_labels,
        rotation=pad(rotation),
        translation=pad(translation),
        hand=pad(hand),
        num_valid=num_valid,
    )


def _filter_detections_per_class(
    boxes, classification, rotation, translation, hand,
    score_threshold, iou_threshold, k, nms,
) -> Detections:
    """Per-class NMS (vmapped over C), merged by score into one top-K list.

    Static-shape equivalent of the reference's per-class python loop
    (layers.py:347-362): each class thresholds + NMS's its own top-k
    candidates against ONLY its own detections; the C*k survivors are then
    merged score-descending and cut to ``k``.
    """

    kc = min(k, boxes.shape[0])  # per-class candidate pool size

    def one_class(c_scores):
        top_s, top_i = jax.lax.top_k(c_scores, kc)
        valid = top_s > score_threshold
        if nms:
            keep = greedy_nms_mask(boxes[top_i], top_s, valid, iou_threshold)
        else:
            keep = valid
        return top_s, top_i, keep

    # (C, kc) each
    top_s, top_i, keep = jax.vmap(one_class)(classification.T)
    c = classification.shape[-1]
    flat_scores = jnp.where(keep, top_s, -1.0).reshape(c * kc)
    flat_idx = top_i.reshape(c * kc)
    flat_labels = jnp.repeat(jnp.arange(c, dtype=jnp.int32), kc)

    k2 = min(k, c * kc)
    merged_scores, sel = jax.lax.top_k(flat_scores, k2)  # score-descending
    kept = merged_scores > score_threshold
    src = flat_idx[sel]

    def fullpad(arr, fill):  # (k2, ...) -> (k, ...)
        if k2 == k:
            return arr
        widths = [(0, k - k2)] + [(0, 0)] * (arr.ndim - 1)
        return jnp.pad(arr, widths, constant_values=fill)

    def pad(x, fill=-1.0):
        gathered = x[src]
        mask_shape = (k2,) + (1,) * (gathered.ndim - 1)
        return fullpad(jnp.where(kept.reshape(mask_shape), gathered, fill), fill)

    return Detections(
        boxes=pad(boxes),
        scores=fullpad(jnp.where(kept, merged_scores, -1.0), -1.0),
        labels=fullpad(jnp.where(kept, flat_labels[sel], -1), -1).astype(jnp.int32),
        rotation=pad(rotation),
        translation=pad(translation),
        hand=pad(hand),
        num_valid=jnp.sum(kept.astype(jnp.int32)),
    )


def filter_detections_fused(
    regression,
    classification,
    rotation,
    translation_raw,
    hand,
    anchors,
    trans_anchors,
    camera_parameters,
    image_height: int,
    image_width: int,
    score_threshold: float = 0.01,
    iou_threshold: float = 0.5,
    max_detections: int = 100,
    nms: bool = True,
    class_specific: bool = True,
) -> Detections:
    """Decode-after-top-k detection filter (single image).

    Bit-identical outputs to ``decode everything -> filter_detections``
    (pinned by tests/test_ops.py::test_fused_filter_matches_legacy), but the
    box/translation decode runs on only the top-k candidate anchors instead
    of all ~12k: the (N, 4) decoded/clipped boxes and (N, 3) metric
    translations are never materialized in HBM — the per-anchor decode math
    (layers.py:142-257 semantics, ops/decode.py) commutes with the gather
    because it is elementwise in the anchor dimension.  The predict program
    is memory-bound (BENCH_NOTES.md roofline), so this is a pure bytes cut.

    Args:
        regression: (N, 4) raw box deltas; classification: (N, C) sigmoid
            scores; rotation: (N, 3); translation_raw: (N, 3); hand: (N, 63).
        anchors: (N, 4) box anchors; trans_anchors: (N, 3) translation
            anchors (x, y, stride); camera_parameters: (6,) for this image.
    """
    from hmd_ego_pose_tpu.ops.decode import (
        bbox_transform_inv, clip_boxes, decode_translation,
    )

    num_classes = classification.shape[-1]
    k = max_detections
    kc = min(k, regression.shape[0])

    def decode_boxes(idx):
        b = bbox_transform_inv(anchors[idx], regression[idx])
        return clip_boxes(b, image_height, image_width)

    def decode_trans(idx):
        return decode_translation(
            trans_anchors[idx][None], translation_raw[idx][None],
            camera_parameters[None],
        )[0]

    if num_classes > 1 and class_specific:
        # per-class NMS (layers.py:347-362): each class decodes + suppresses
        # only its own kc candidates; merge score-descending and cut to k
        def one_class(c_scores):
            top_s, top_i = jax.lax.top_k(c_scores, kc)
            sel_boxes = decode_boxes(top_i)
            valid = top_s > score_threshold
            if nms:
                keep = greedy_nms_mask(sel_boxes, top_s, valid, iou_threshold)
            else:
                keep = valid
            return top_s, top_i, keep, sel_boxes

        top_s, top_i, keep, sel_boxes = jax.vmap(one_class)(classification.T)
        c = num_classes
        flat_scores = jnp.where(keep, top_s, -1.0).reshape(c * kc)
        flat_idx = top_i.reshape(c * kc)
        flat_boxes = sel_boxes.reshape(c * kc, 4)
        flat_labels = jnp.repeat(jnp.arange(c, dtype=jnp.int32), kc)

        k2 = min(k, c * kc)
        merged_scores, sel = jax.lax.top_k(flat_scores, k2)
        kept = merged_scores > score_threshold
        src = flat_idx[sel]
        merged_trans = decode_trans(src)

        def fullpad(arr, fill):  # (k2, ...) -> (k, ...)
            if k2 == k:
                return arr
            widths = [(0, k - k2)] + [(0, 0)] * (arr.ndim - 1)
            return jnp.pad(arr, widths, constant_values=fill)

        def pad(gathered, fill=-1.0):  # gathered: (k2, ...)
            mask_shape = (k2,) + (1,) * (gathered.ndim - 1)
            return fullpad(jnp.where(kept.reshape(mask_shape), gathered, fill), fill)

        return Detections(
            boxes=pad(flat_boxes[sel]),
            scores=fullpad(jnp.where(kept, merged_scores, -1.0), -1.0),
            labels=fullpad(jnp.where(kept, flat_labels[sel], -1), -1).astype(jnp.int32),
            rotation=pad(rotation[src]),
            translation=pad(merged_trans),
            hand=pad(hand[src]),
            num_valid=jnp.sum(kept.astype(jnp.int32)),
        )

    scores = jnp.max(classification, axis=-1)
    labels = jnp.argmax(classification, axis=-1).astype(jnp.int32)
    top_scores, top_idx = jax.lax.top_k(scores, kc)
    valid = top_scores > score_threshold
    top_boxes = decode_boxes(top_idx)

    if nms:
        keep = greedy_nms_mask(top_boxes, top_scores, valid, iou_threshold)
    else:
        keep = valid

    order = jnp.argsort(~keep, stable=True)
    kept = keep[order]
    num_valid = jnp.sum(keep.astype(jnp.int32))

    def fullpad(arr, fill):  # (kc, ...) -> (k, ...)
        if kc == k:
            return arr
        widths = [(0, k - kc)] + [(0, 0)] * (arr.ndim - 1)
        return jnp.pad(arr, widths, constant_values=fill)

    def pad(x_sel, fill=-1.0):  # x_sel: (kc, ...) pre-gathered candidates
        gathered = x_sel[order]
        mask_shape = (kc,) + (1,) * (gathered.ndim - 1)
        return fullpad(jnp.where(kept.reshape(mask_shape), gathered, fill), fill)

    return Detections(
        boxes=pad(top_boxes),
        scores=fullpad(jnp.where(kept, top_scores[order], -1.0), -1.0),
        labels=fullpad(jnp.where(kept, labels[top_idx][order], -1), -1).astype(jnp.int32),
        rotation=pad(rotation[top_idx]),
        translation=pad(decode_trans(top_idx)),
        hand=pad(hand[top_idx]),
        num_valid=num_valid,
    )


def filter_detections_fused_batch(
    regression,
    classification,
    rotation,
    translation_raw,
    hand,
    anchors,
    trans_anchors,
    camera_parameters,
    image_height: int,
    image_width: int,
    score_threshold: float = 0.01,
    iou_threshold: float = 0.5,
    max_detections: int = 100,
    nms: bool = True,
    class_specific: bool = True,
) -> Detections:
    """vmapped :func:`filter_detections_fused`: head outputs and
    ``camera_parameters`` carry a leading batch dim; anchors are shared."""
    fn = lambda rg, c, r, t, h, cam: filter_detections_fused(
        rg, c, r, t, h, anchors, trans_anchors, cam,
        image_height, image_width,
        score_threshold=score_threshold,
        iou_threshold=iou_threshold,
        max_detections=max_detections,
        nms=nms,
        class_specific=class_specific,
    )
    return jax.vmap(fn)(
        regression, classification, rotation, translation_raw, hand,
        camera_parameters,
    )


def filter_detections_batch(
    boxes,
    classification,
    rotation,
    translation,
    hand,
    score_threshold: float = 0.01,
    iou_threshold: float = 0.5,
    max_detections: int = 100,
    nms: bool = True,
    class_specific: bool = True,
) -> Detections:
    """vmapped batch variant: all inputs carry a leading batch dimension."""
    fn = lambda b, c, r, t, h: filter_detections(
        b, c, r, t, h,
        score_threshold=score_threshold,
        iou_threshold=iou_threshold,
        max_detections=max_detections,
        nms=nms,
        class_specific=class_specific,
    )
    return jax.vmap(fn)(boxes, classification, rotation, translation, hand)
