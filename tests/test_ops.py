"""Tests for IoU, NMS, distances, and geometry kernels."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from hmd_ego_pose_tpu.ops.distances import (
    add_mean_distance,
    adds_mean_distance,
    min_distances,
)
from hmd_ego_pose_tpu.ops.geometry import (
    axis_angle_to_matrix,
    matrix_to_axis_angle,
    np_axis_angle_to_matrix,
    project_points,
    rotate_points_axis_angle,
    rotation_angular_distance,
)
from hmd_ego_pose_tpu.ops.iou import iou_matrix, iou_matrix_np
from hmd_ego_pose_tpu.ops.decode import (
    bbox_transform_inv,
    clip_boxes,
    decode_translation,
)
from hmd_ego_pose_tpu.ops.nms import (
    filter_detections,
    filter_detections_batch,
    filter_detections_fused,
    filter_detections_fused_batch,
)


def _naive_iou(a, b):
    out = np.zeros((a.shape[0], b.shape[0]))
    for i in range(a.shape[0]):
        for j in range(b.shape[0]):
            iw = min(a[i, 2], b[j, 2]) - max(a[i, 0], b[j, 0])
            ih = min(a[i, 3], b[j, 3]) - max(a[i, 1], b[j, 1])
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            ua = (
                (a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1])
                + (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1])
                - inter
            )
            out[i, j] = inter / ua
    return out


def test_iou_matrix_matches_naive():
    rng = np.random.RandomState(7)
    a = rng.uniform(0, 200, size=(23, 4))
    a[:, 2:] = a[:, :2] + rng.uniform(1, 60, size=(23, 2))
    b = rng.uniform(0, 200, size=(9, 4))
    b[:, 2:] = b[:, :2] + rng.uniform(1, 60, size=(9, 2))

    expected = _naive_iou(a, b)
    np.testing.assert_allclose(np.asarray(iou_matrix(jnp.asarray(a), jnp.asarray(b))), expected, atol=1e-5)
    np.testing.assert_allclose(iou_matrix_np(a, b), expected, atol=1e-12)


def _naive_greedy_nms(boxes, scores, score_threshold, iou_threshold, max_det):
    """tf.image.non_max_suppression-style reference in pure python."""
    idx = [i for i in np.argsort(-scores) if scores[i] > score_threshold]
    keep = []
    for i in idx:
        ok = True
        for j in keep:
            if _naive_iou(boxes[i : i + 1], boxes[j : j + 1])[0, 0] > iou_threshold:
                ok = False
                break
        if ok:
            keep.append(i)
        if len(keep) == max_det:
            break
    return keep


def test_filter_detections_matches_naive_nms():
    rng = np.random.RandomState(3)
    n = 64
    boxes = rng.uniform(0, 200, size=(n, 4))
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(4, 50, size=(n, 2))
    scores = rng.uniform(0, 1, size=(n, 1))
    rotation = rng.normal(size=(n, 3))
    translation = rng.normal(size=(n, 3))
    hand = rng.normal(size=(n, 63))

    det = filter_detections(
        jnp.asarray(boxes),
        jnp.asarray(scores),
        jnp.asarray(rotation),
        jnp.asarray(translation),
        jnp.asarray(hand),
        score_threshold=0.3,
        iou_threshold=0.5,
        max_detections=16,
    )

    expected = _naive_greedy_nms(boxes, scores[:, 0], 0.3, 0.5, 16)
    nv = int(det.num_valid)
    assert nv == len(expected)
    np.testing.assert_allclose(np.asarray(det.boxes)[:nv], boxes[expected], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(det.scores)[:nv], scores[expected, 0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(det.rotation)[:nv], rotation[expected], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(det.hand)[:nv], hand[expected], rtol=1e-5)
    # padding is -1
    assert np.all(np.asarray(det.boxes)[nv:] == -1)
    assert np.all(np.asarray(det.labels)[nv:] == -1)
    assert np.all(np.asarray(det.labels)[:nv] == 0)


def test_filter_detections_batch_shapes():
    rng = np.random.RandomState(5)
    b, n = 3, 128
    boxes = rng.uniform(0, 200, size=(b, n, 4))
    boxes[..., 2:] = boxes[..., :2] + 10
    det = filter_detections_batch(
        jnp.asarray(boxes),
        jnp.asarray(rng.uniform(0, 1, size=(b, n, 1))),
        jnp.asarray(rng.normal(size=(b, n, 3))),
        jnp.asarray(rng.normal(size=(b, n, 3))),
        jnp.asarray(rng.normal(size=(b, n, 63))),
        max_detections=8,
    )
    assert det.boxes.shape == (b, 8, 4)
    assert det.scores.shape == (b, 8)
    assert det.hand.shape == (b, 8, 63)
    assert det.num_valid.shape == (b,)


def test_min_distances_matches_naive():
    rng = np.random.RandomState(11)
    gt = rng.normal(size=(50, 3))
    pred = rng.normal(size=(40, 3))
    expected = np.array([np.min(np.linalg.norm(pred - g, axis=1)) for g in gt])
    np.testing.assert_allclose(np.asarray(min_distances(jnp.asarray(gt), jnp.asarray(pred))), expected, atol=1e-5)

    # symmetric mean distance of identical sets is 0
    assert float(adds_mean_distance(jnp.asarray(gt), jnp.asarray(gt))) < 1e-6
    assert float(add_mean_distance(jnp.asarray(gt), jnp.asarray(gt))) < 1e-6


def test_rotate_points_matches_scipy():
    rng = np.random.RandomState(13)
    rotvec = rng.normal(size=(3,))
    points = rng.normal(size=(10, 3))
    expected = Rotation.from_rotvec(rotvec).apply(points)
    got = np.asarray(rotate_points_axis_angle(jnp.asarray(points), jnp.asarray(rotvec)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_axis_angle_matrix_roundtrip():
    rng = np.random.RandomState(17)
    for _ in range(5):
        rotvec = rng.normal(size=(3,))
        m_scipy = Rotation.from_rotvec(rotvec).as_matrix()
        m_jnp = np.asarray(axis_angle_to_matrix(jnp.asarray(rotvec)))
        m_np = np_axis_angle_to_matrix(rotvec)
        np.testing.assert_allclose(m_jnp, m_scipy, atol=1e-5)
        np.testing.assert_allclose(m_np, m_scipy, atol=1e-10)
        back = matrix_to_axis_angle(m_scipy)
        np.testing.assert_allclose(back, rotvec, atol=1e-8)


def test_rotation_angular_distance():
    r1 = Rotation.from_euler("z", 30, degrees=True).as_matrix()
    r2 = Rotation.from_euler("z", 75, degrees=True).as_matrix()
    d = float(rotation_angular_distance(jnp.asarray(r1), jnp.asarray(r2)))
    np.testing.assert_allclose(d, 45.0, atol=1e-4)


def test_project_points_pinhole():
    cam = np.array([[572.4114, 0, 325.2611], [0, 573.57043, 242.04899], [0, 0, 1.0]])
    pts = np.array([[0.0, 0.0, 0.0]])
    rot = np.eye(3)
    trans = np.array([0.0, 0.0, 1000.0])
    uv = np.asarray(project_points(jnp.asarray(pts), jnp.asarray(rot), jnp.asarray(trans), jnp.asarray(cam)))
    np.testing.assert_allclose(uv[0], [325.2611, 242.04899], atol=1e-4)


def test_filter_detections_per_class_no_cross_suppression():
    """Reference class_specific_filter=True semantics (layers.py:347-362): a
    detection never suppresses one of ANOTHER class, even at IoU 1.0."""
    box = np.array([10.0, 10.0, 50.0, 50.0])
    boxes = np.stack([box, box])  # identical boxes
    classification = np.array([[0.9, 0.0], [0.0, 0.8]])  # different classes
    aux = np.zeros((2, 3)), np.zeros((2, 3)), np.zeros((2, 63))

    det = filter_detections(
        jnp.asarray(boxes), jnp.asarray(classification),
        *(jnp.asarray(a) for a in aux),
        score_threshold=0.3, iou_threshold=0.5, max_detections=8,
    )
    assert int(det.num_valid) == 2
    np.testing.assert_allclose(np.asarray(det.scores)[:2], [0.9, 0.8])
    np.testing.assert_array_equal(np.asarray(det.labels)[:2], [0, 1])

    # same class instead: the lower-scoring twin is suppressed
    same = np.array([[0.9, 0.0], [0.8, 0.0]])
    det1 = filter_detections(
        jnp.asarray(boxes), jnp.asarray(same),
        *(jnp.asarray(a) for a in aux),
        score_threshold=0.3, iou_threshold=0.5, max_detections=8,
    )
    assert int(det1.num_valid) == 1
    assert np.asarray(det1.labels)[0] == 0

    # class_specific=False: best-class-per-anchor + one agnostic NMS
    det2 = filter_detections(
        jnp.asarray(boxes), jnp.asarray(classification),
        *(jnp.asarray(a) for a in aux),
        score_threshold=0.3, iou_threshold=0.5, max_detections=8,
        class_specific=False,
    )
    assert int(det2.num_valid) == 1


def test_filter_detections_per_class_matches_naive():
    """Random 2-class candidates: per-class naive NMS merged by score."""
    rng = np.random.RandomState(7)
    n, max_det = 64, 16
    boxes = rng.uniform(0, 200, size=(n, 4))
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(4, 50, size=(n, 2))
    classification = rng.uniform(0, 1, size=(n, 2))
    rotation = rng.normal(size=(n, 3))
    translation = rng.normal(size=(n, 3))
    hand = rng.normal(size=(n, 63))

    det = filter_detections(
        jnp.asarray(boxes), jnp.asarray(classification),
        jnp.asarray(rotation), jnp.asarray(translation), jnp.asarray(hand),
        score_threshold=0.3, iou_threshold=0.5, max_detections=max_det,
    )

    naive = []  # (score, anchor, class)
    for c in range(2):
        # per-class candidate pool is that class's top-max_det anchors
        # (static-shape equivalent of considering all above-threshold ones)
        for i in _naive_greedy_nms(boxes, classification[:, c], 0.3, 0.5, max_det):
            naive.append((classification[i, c], i, c))
    naive.sort(key=lambda t: -t[0])
    naive = naive[:max_det]

    nv = int(det.num_valid)
    assert nv == len(naive)
    np.testing.assert_allclose(
        np.asarray(det.scores)[:nv], [t[0] for t in naive], rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(det.labels)[:nv], [t[2] for t in naive])
    np.testing.assert_allclose(
        np.asarray(det.boxes)[:nv], boxes[[t[1] for t in naive]], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(det.rotation)[:nv], rotation[[t[1] for t in naive]], rtol=1e-6
    )


def _random_raw_detection_inputs(rng, n, c):
    """Raw head outputs + anchors shaped like the real predict seam."""
    anchors = rng.uniform(0, 200, size=(n, 4)).astype(np.float32)
    anchors[:, 2:] = anchors[:, :2] + rng.uniform(8, 60, size=(n, 2))
    trans_anchors = np.concatenate(
        [rng.uniform(0, 256, size=(n, 2)), np.full((n, 1), 8.0)], axis=1
    ).astype(np.float32)
    regression = rng.normal(scale=0.3, size=(n, 4)).astype(np.float32)
    classification = rng.uniform(0, 1, size=(n, c)).astype(np.float32)
    rotation = rng.normal(size=(n, 3)).astype(np.float32)
    translation_raw = np.concatenate(
        [rng.normal(size=(n, 2)), rng.uniform(0.2, 2.0, size=(n, 1))], axis=1
    ).astype(np.float32)
    hand = rng.normal(size=(n, 63)).astype(np.float32)
    cam = np.array([572.4, 573.6, 128.0, 128.0, 1000.0, 1.0], np.float32)
    return anchors, trans_anchors, regression, classification, rotation, translation_raw, hand, cam


def _legacy_filter(anchors, trans_anchors, regression, classification,
                   rotation, translation_raw, hand, cam, h, w, **kw):
    boxes = clip_boxes(bbox_transform_inv(jnp.asarray(anchors), jnp.asarray(regression)), h, w)
    translation = decode_translation(
        jnp.asarray(trans_anchors)[None], jnp.asarray(translation_raw)[None],
        jnp.asarray(cam)[None],
    )[0]
    return filter_detections(
        boxes, jnp.asarray(classification), jnp.asarray(rotation),
        translation, jnp.asarray(hand), **kw,
    )


def test_fused_filter_matches_legacy():
    """Decode-after-top-k must be BIT-identical to decode-everything-then-
    filter: the per-anchor decode (ops/decode.py) commutes with the gather."""
    for c in (1, 3):
        rng = np.random.RandomState(23 + c)
        (anchors, trans_anchors, regression, classification, rotation,
         translation_raw, hand, cam) = _random_raw_detection_inputs(rng, 400, c)
        kw = dict(score_threshold=0.3, iou_threshold=0.5, max_detections=16)
        legacy = _legacy_filter(
            anchors, trans_anchors, regression, classification, rotation,
            translation_raw, hand, cam, 256, 256, **kw,
        )
        fused = filter_detections_fused(
            jnp.asarray(regression), jnp.asarray(classification),
            jnp.asarray(rotation), jnp.asarray(translation_raw),
            jnp.asarray(hand), jnp.asarray(anchors),
            jnp.asarray(trans_anchors), jnp.asarray(cam), 256, 256, **kw,
        )
        for name, a, b in zip(legacy._fields, legacy, fused):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"C={c} field {name}"
            )


def test_fused_filter_batch_matches_legacy():
    rng = np.random.RandomState(29)
    b, n = 3, 300
    anchors, trans_anchors, *_ = _random_raw_detection_inputs(rng, n, 1)
    regression = rng.normal(scale=0.3, size=(b, n, 4)).astype(np.float32)
    classification = rng.uniform(0, 1, size=(b, n, 1)).astype(np.float32)
    rotation = rng.normal(size=(b, n, 3)).astype(np.float32)
    translation_raw = rng.normal(size=(b, n, 3)).astype(np.float32)
    hand = rng.normal(size=(b, n, 63)).astype(np.float32)
    cams = np.stack([
        np.array([572.4, 573.6, 128.0, 128.0, 1000.0, 0.5 + 0.25 * i], np.float32)
        for i in range(b)
    ])
    kw = dict(score_threshold=0.3, iou_threshold=0.5, max_detections=8)
    fused = filter_detections_fused_batch(
        jnp.asarray(regression), jnp.asarray(classification),
        jnp.asarray(rotation), jnp.asarray(translation_raw), jnp.asarray(hand),
        jnp.asarray(anchors), jnp.asarray(trans_anchors), jnp.asarray(cams),
        256, 256, **kw,
    )
    for i in range(b):
        legacy = _legacy_filter(
            anchors, trans_anchors, regression[i], classification[i],
            rotation[i], translation_raw[i], hand[i], cams[i], 256, 256, **kw,
        )
        for name, a, f in zip(legacy._fields, legacy, fused):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(f)[i], err_msg=f"img {i} field {name}"
            )


def test_hand_relative_roundtrip():
    """hand_to_relative / hand_to_absolute are exact inverses and tile the
    translation over all 21 joints (ModelConfig.hand_relative seams:
    train/step.py targets, models/hmd_ego_pose.py predict)."""
    from hmd_ego_pose_tpu.ops.decode import hand_to_absolute, hand_to_relative

    rng = np.random.RandomState(7)
    for shape in ((4, 63), (2, 3, 63)):
        coords = jnp.asarray(rng.uniform(-0.2, 0.8, size=shape).astype(np.float32))
        trans = jnp.asarray(
            rng.uniform(-100, 700, size=shape[:-1] + (3,)).astype(np.float32)
        )
        rel = hand_to_relative(coords, trans)
        # every joint shifted by the same (m-scale) translation
        np.testing.assert_allclose(
            np.asarray(coords - rel).reshape(shape[:-1] + (21, 3)),
            np.broadcast_to(
                np.asarray(trans)[..., None, :] / 1000.0, shape[:-1] + (21, 3)
            ),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(hand_to_absolute(rel, trans)), np.asarray(coords), atol=1e-7
        )
