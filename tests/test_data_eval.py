"""End-to-end data + eval tests on a synthetic colibri-layout dataset."""

import math
import os

import numpy as np
import pytest
import jax.numpy as jnp

from hmd_ego_pose_tpu.config import Config, DataConfig, ModelConfig
from hmd_ego_pose_tpu.data.augment import augment_6dof
from hmd_ego_pose_tpu.data.colibri import ColibriDataset, get_bbox_from_mask, subsample_model_points
from hmd_ego_pose_tpu.data.image import (
    get_rotation_matrix_2d,
    preprocess_image,
    resize_bilinear,
    warp_affine,
)
from hmd_ego_pose_tpu.data.pipeline import InputPipeline
from hmd_ego_pose_tpu.data.ply import load_ply_vertices
from hmd_ego_pose_tpu.data.synthetic import generate_synthetic_colibri
from hmd_ego_pose_tpu.eval.evaluator import evaluate_model
from hmd_ego_pose_tpu.eval.metrics import compute_average_precision
from hmd_ego_pose_tpu.ops.geometry import np_axis_angle_to_matrix
from hmd_ego_pose_tpu.ops.nms import Detections


@pytest.fixture(scope="session")
def synthetic_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("syn_colibri")
    return generate_synthetic_colibri(str(root), num_frames=12, image_size=(480, 480))


@pytest.fixture(scope="session")
def train_dataset(synthetic_root):
    return ColibriDataset(synthetic_root, fold=0, object_id=1, partition="train")


def test_ply_roundtrip(synthetic_root):
    pts = load_ply_vertices(os.path.join(synthetic_root, "models", "obj_01.ply"))
    assert pts.shape == (600, 3)
    assert np.isfinite(pts).all()


def test_dataset_reader(train_dataset):
    ds = train_dataset
    assert len(ds) > 0
    img = ds.load_image(0)
    assert img.shape == (480, 480, 3) and img.dtype == np.uint8
    anno = ds.load_annotations(0)
    assert anno["bboxes"].shape == (1, 4)
    assert anno["rotations"].shape == (1, 5)
    assert anno["coords_3d"].shape == (1, 21, 3)
    x1, y1, x2, y2 = anno["bboxes"][0]
    assert 0 <= x1 < x2 < 480 and 0 <= y1 < y2 < 480
    # rotation roundtrips to the written matrix
    assert np.isfinite(anno["rotations"]).all()
    assert ds.diameter > 0
    tip = ds.load_drill_tip_offset(0)
    assert tip.shape == (1, 4) and tip[0, 3] == 1.0
    # 2-D centre projects inside the image for these poses
    u, v = anno["translations_x_y_2D"][0]
    assert 0 <= u <= 480 and 0 <= v <= 480


def test_hand_joints_rendered_into_pixels(train_dataset):
    """Round-3 hand-fix regression: hand labels must be pixel-grounded.

    Round 2's synthetic generator sampled per-frame random hand offsets but
    never drew them, putting an analytic ~58 mm floor under val MPJPE (the
    "hand-pose stall", TRAIN_SYNTHETIC.md).  Pin the fix: each in-frame
    joint's projected pixel must carry that joint's identifying color
    (data/synthetic.py renders joints far-to-near, so a center pixel can
    only differ when a nearer joint's splat overlaps it).
    """
    from hmd_ego_pose_tpu.data.synthetic import hand_joint_colors

    ds = train_dataset
    hand_colors = hand_joint_colors()
    exact = total = 0
    for i in range(len(ds)):
        img = ds.load_image(i)
        cam_k = ds.infos[i]
        hand_mm = ds.load_annotations(i)["coords_3d"][0] * 1000.0  # meters -> mm
        z = hand_mm[:, 2]
        u = np.rint(cam_k[0, 0] * hand_mm[:, 0] / z + cam_k[0, 2]).astype(int)
        v = np.rint(cam_k[1, 1] * hand_mm[:, 1] / z + cam_k[1, 2]).astype(int)
        h, w = img.shape[:2]
        for j in range(21):
            if not (0 <= u[j] < w and 0 <= v[j] < h):
                continue
            total += 1
            exact += int((img[v[j], u[j]] == hand_colors[j]).all())
    assert total >= 50  # nearly all joints of 7+ train frames are in-frame
    assert exact / total > 0.7, f"only {exact}/{total} joints carry their color"


def test_hand_depth_encoded_in_arm_length(train_dataset):
    """Hand z offsets must be pixel-recoverable, not just (u, v).

    A dot fixes a joint's camera ray but not its depth, leaving an analytic
    MPJPE floor from invisible per-joint z offsets.  The generator therefore
    draws a 3D arm per joint (metric length 0.12 mm per mm of z offset from
    the drill plane; +x when farther than the drill plane, +y when nearer) —
    so the projected arm extent f * 0.12 * |z_off| / z must match what we
    measure in the written pixels.
    """
    from hmd_ego_pose_tpu.data.synthetic import hand_joint_colors

    ds = train_dataset
    hand_colors = hand_joint_colors()
    ok = total = 0
    for i in range(len(ds)):
        img = ds.load_image(i)
        cam_k = ds.infos[i]
        anno = ds.load_annotations(i)
        hand_mm = anno["coords_3d"][0] * 1000.0
        drill_z = anno["translations"][0, 2]
        z = hand_mm[:, 2]
        f = cam_k[0, 0]
        u = np.rint(f * hand_mm[:, 0] / z + cam_k[0, 2]).astype(int)
        v = np.rint(cam_k[1, 1] * hand_mm[:, 1] / z + cam_k[1, 2]).astype(int)
        h, w = img.shape[:2]
        for j in range(21):
            z_off = z[j] - drill_z
            expected_px = f * 0.12 * abs(z_off) / z[j]
            if not (0 <= u[j] < w - 40 and 0 <= v[j] < h - 40):
                continue
            if expected_px < 3.0:
                continue
            total += 1
            # measure the farthest same-colored pixel along the arm axis
            # (a 3-wide strip tolerates rounding; nearer joints' splats may
            # occlude, hence the majority vote below)
            extent = 0
            for d in range(1, 40):
                if z_off >= 0:
                    strip = img[max(0, v[j] - 1) : v[j] + 2, u[j] + d]
                else:
                    strip = img[v[j] + d, max(0, u[j] - 1) : u[j] + 2]
                if (strip == hand_colors[j]).all(axis=-1).any():
                    extent = d
            ok += int(abs(extent - expected_px) <= max(2.5, 0.3 * expected_px))
    assert total >= 20, f"too few measurable arms ({total})"
    assert ok / total > 0.6, f"arm length matched for only {ok}/{total} joints"


def test_hand_skeleton_structurally_identifiable(train_dataset):
    """Joint identity must survive color augmentation -> it must be STRUCTURAL.

    Run C (TRAIN_SYNTHETIC.md): dot-only hands whose identity lived in a
    3-9-uint8-step color code trained flat under the RandAugment color stack.
    The generator now renders a wrist-rooted kinematic skeleton: (a) bone
    midpoints must carry the dimmed child-joint color (topology is drawn),
    and (b) per-finger hues must be widely separated so even coarse color
    quantization keeps fingers distinct.
    """
    from hmd_ego_pose_tpu.data.synthetic import (
        HAND_BONES,
        HAND_CANONICAL_MM,
        hand_joint_colors,
    )

    colors = hand_joint_colors().astype(np.int32)
    # (b) fingers pairwise-distinguishable even after heavy quantization:
    # base hues of different fingers differ by >150 in L1
    finger_joint = [1 + 4 * f + 3 for f in range(5)]  # fingertip = full hue
    for a in range(5):
        for b in range(a + 1, 5):
            d = np.abs(colors[finger_joint[a]] - colors[finger_joint[b]]).sum()
            assert d > 150, f"fingers {a},{b} colors too close (L1={d})"

    assert len(HAND_BONES) == 20 and HAND_CANONICAL_MM.shape == (21, 3)
    # every bone chains back to the wrist
    parents = {c: p for p, c in HAND_BONES}
    for j in range(1, 21):
        hops, node = 0, j
        while node != 0:
            node = parents[node]
            hops += 1
            assert hops <= 4
    # (a) bone midpoints carry the dimmed child color in the pixels
    ds = train_dataset
    dimmed = np.clip(np.rint(hand_joint_colors().astype(np.float64) * 0.45), 0, 255).astype(np.uint8)
    hit = total = 0
    for i in range(len(ds)):
        img = ds.load_image(i)
        cam_k = ds.infos[i]
        hand_mm = ds.load_annotations(i)["coords_3d"][0] * 1000.0
        h, w = img.shape[:2]
        for parent, child in HAND_BONES:
            mid = 0.5 * (hand_mm[parent] + hand_mm[child])
            u = int(round(cam_k[0, 0] * mid[0] / mid[2] + cam_k[0, 2]))
            v = int(round(cam_k[1, 1] * mid[1] / mid[2] + cam_k[1, 2]))
            if not (1 <= u < w - 1 and 1 <= v < h - 1):
                continue
            total += 1
            patch = img[v - 1 : v + 2, u - 1 : u + 2].reshape(-1, 3)
            hit += int((patch == dimmed[child]).all(axis=-1).any())
    assert total >= 100
    # bones can be occluded by the drill/joints/arms drawn later, so demand
    # a solid majority rather than unanimity
    assert hit / total > 0.6, f"bone midpoints rendered for only {hit}/{total}"


def test_subsample_model_points_reference_rule():
    pts = np.arange(3000, dtype=np.float64).reshape(1000, 3)
    out = subsample_model_points(pts, 500)
    assert out.shape == (500, 3)
    np.testing.assert_array_equal(out, pts[::1][:500])  # step = (1000//500)-1 = 1
    pts2 = np.arange(30, dtype=np.float64).reshape(10, 3)
    out2 = subsample_model_points(pts2, 20)
    assert out2.shape == (20, 3)
    np.testing.assert_array_equal(out2[:10], pts2)
    assert np.all(out2[10:] == 0)


def test_warp_affine_identity_and_rotation():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, size=(32, 32, 3)).astype(np.uint8)
    ident = np.array([[1.0, 0, 0], [0, 1.0, 0]])
    out = warp_affine(img, ident, (32, 32))
    np.testing.assert_array_equal(out, img)

    # 90-degree rotation about centre, 4x: back to identity (nearest)
    m = get_rotation_matrix_2d((15.5, 15.5), 90, 1.0)
    cur = img
    for _ in range(4):
        cur = warp_affine(cur, m, (32, 32), "nearest")
    np.testing.assert_array_equal(cur, img)


def test_resize_bilinear_constant():
    img = np.full((10, 20, 3), 77, np.uint8)
    out = resize_bilinear(img, (5, 10))
    assert out.shape == (5, 10, 3)
    np.testing.assert_array_equal(out, 77)


def test_preprocess_image_shapes_and_norm():
    img = np.full((480, 360, 3), 128, np.uint8)
    out, scale = preprocess_image(img, 256)
    assert out.shape == (256, 256, 3)
    assert scale == 256 / 480
    # padded region is exactly zero
    assert np.all(out[:, 192:] == 0)
    # normalized value of 128/255 under ImageNet stats
    expected = (128 / 255 - 0.485) / 0.229
    np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-5)


def test_augment_6dof_consistency(train_dataset):
    """After the warp, the GT pose must still project onto the warped object."""
    ds = train_dataset
    img = ds.load_image(0)
    mask = ds.load_mask(0)
    anno = ds.load_annotations(0)
    cam = ds.load_camera_matrix(0)

    aug_img, aug_anno, ok = augment_6dof(img, mask, anno, cam, angle_deg=30.0, scale=1.1)
    assert ok
    assert aug_img.shape == img.shape
    # the projected origin (translations_x_y_2D) must fall inside the new bbox
    # grown by a small margin
    u, v = aug_anno["translations_x_y_2D"][0]
    x1, y1, x2, y2 = aug_anno["bboxes"][0]
    margin = 40
    assert x1 - margin <= u <= x2 + margin
    assert y1 - margin <= v <= y2 + margin
    # Tz scaled down by 1.1
    np.testing.assert_allclose(
        aug_anno["translations"][0, 2], anno["translations"][0, 2] / 1.1, rtol=1e-6
    )


def test_augment_6dof_projection_equivariance(train_dataset):
    """The 3-D pose update must equal the 2-D image warp: projecting a model
    point through the augmented pose lands where the affine warp moves its
    original projection."""
    from hmd_ego_pose_tpu.data.image import get_rotation_matrix_2d
    from hmd_ego_pose_tpu.ops.geometry import np_axis_angle_to_matrix

    ds = train_dataset
    img = ds.load_image(0)
    mask = ds.load_mask(0)
    anno = ds.load_annotations(0)
    cam = ds.load_camera_matrix(0)
    angle, scale = 73.0, 0.9

    _, aug, ok = augment_6dof(img, mask, anno, cam, angle, scale)
    assert ok

    # pick some 3-D model points, project through the ORIGINAL pose
    pts = ds.model_points_for_loss(16)[0]
    r0 = np_axis_angle_to_matrix(anno["rotations"][0, :3])
    t0 = anno["translations"][0]
    cam_pts = pts @ r0.T + t0
    uv0 = np.stack(
        [cam[0, 0] * cam_pts[:, 0] / cam_pts[:, 2] + cam[0, 2],
         cam[1, 1] * cam_pts[:, 1] / cam_pts[:, 2] + cam[1, 2]], axis=1)

    # move those pixels with the image-warp affine (same matrix the augmenter used)
    m = get_rotation_matrix_2d((cam[0, 2], cam[1, 2]), -angle, scale)
    uv_warped = uv0 @ m[:, :2].T + m[:, 2]

    # project through the AUGMENTED pose
    r1 = np_axis_angle_to_matrix(aug["rotations"][0, :3])
    t1 = aug["translations"][0]
    cam_pts1 = pts @ r1.T + t1
    uv1 = np.stack(
        [cam[0, 0] * cam_pts1[:, 0] / cam_pts1[:, 2] + cam[0, 2],
         cam[1, 1] * cam_pts1[:, 1] / cam_pts1[:, 2] + cam[1, 2]], axis=1)

    # the in-plane rotation is exact; the scale part of the warp only
    # approximates the Tz division (same approximation the reference makes),
    # so compare with a tolerance proportional to the object's pixel size
    np.testing.assert_allclose(uv1, uv_warped, atol=3.0)


def test_input_pipeline_batches(train_dataset):
    cfg = Config(model=ModelConfig(image_size=128))
    # host-augmentation (reference) mode; device_augment mode is covered by
    # test_input_pipeline_raw_batches + tests/test_augment_device.py
    pipe = InputPipeline(
        train_dataset, DataConfig(device_augment=False), cfg.model, batch_size=2,
        training=True, seed=0
    )
    batches = list(pipe.batches(oversample=1, num_workers=2))
    assert len(batches) == len(train_dataset) // 2
    b = batches[0]
    assert b.images.shape == (2, 128, 128, 3)
    assert b.camera_parameters.shape == (2, 6)
    assert b.gt_boxes.shape == (2, 1, 4)
    assert b.gt_transformation.shape == (2, 1, 8)
    assert b.gt_valid.all()
    # rotation targets are normalized to [-1, 1]
    assert np.abs(np.asarray(b.gt_transformation[..., :3])).max() <= 1.0 + 1e-6


def test_input_pipeline_raw_batches(train_dataset):
    cfg = Config(model=ModelConfig(image_size=128))
    pipe = InputPipeline(
        train_dataset, DataConfig(device_augment=True), cfg.model, batch_size=2,
        training=True, seed=0
    )
    batches = list(pipe.batches(oversample=1, num_workers=2))
    assert len(batches) == len(train_dataset) // 2
    b = batches[0]
    h, w = train_dataset.load_image(0).shape[:2]
    assert b.frames.shape == (2, h, w, 3) and b.frames.dtype == np.uint8
    assert b.masks.shape == (2, h, w)
    assert b.camera_fxfycxcy.shape == (2, 4)
    assert b.gt_rotations.shape == (2, 1, 3)
    assert b.gt_coords_3d.shape == (2, 1, 21, 3)
    assert b.gt_valid.all()


class _OracleDetector:
    """predict_fn that returns the ground truth as a single perfect detection.

    Handles batched evaluator calls: each call consumes the next
    ``batch_size`` sequential dataset indices (tail rows beyond the dataset
    are padding and stay empty)."""

    def __init__(self, dataset, image_size, max_detections):
        self.ds = dataset
        self.image_size = image_size
        self.k = max_detections
        self.cursor = 0

    def __call__(self, params, state, images, cam):
        b = images.shape[0]
        k = self.k
        boxes = np.full((b, k, 4), -1, np.float32)
        scores = np.full((b, k), -1, np.float32)
        labels = np.full((b, k), -1, np.int32)
        rot = np.full((b, k, 3), -1, np.float32)
        trans = np.full((b, k, 3), -1, np.float32)
        hand = np.full((b, k, 63), -1, np.float32)
        num_valid = np.zeros((b,), np.int32)
        for row in range(b):
            i = self.cursor + row
            if i >= len(self.ds):
                break
            anno = self.ds.load_annotations(i)
            scale = float(cam[row, 5])
            boxes[row, 0] = anno["bboxes"][0] * scale
            scores[row, 0] = 0.97
            labels[row, 0] = 0
            rot[row, 0] = anno["rotations"][0, :3] / math.pi
            trans[row, 0] = anno["translations"][0]
            # a perfect network outputs hands in the TRAINING-target space,
            # which is image_scale-scaled meters (colibri_common.py:617);
            # the evaluator compares in that space (reference semantics)
            hand[row, 0] = anno["coords_3d"][0].reshape(-1) * scale
            num_valid[row] = 1
        self.cursor += b
        return Detections(
            boxes=jnp.asarray(boxes), scores=jnp.asarray(scores), labels=jnp.asarray(labels),
            rotation=jnp.asarray(rot), translation=jnp.asarray(trans), hand=jnp.asarray(hand),
            num_valid=jnp.asarray(num_valid),
        )


def test_evaluator_with_oracle_detector(train_dataset):
    cfg = Config(model=ModelConfig(image_size=256))
    oracle = _OracleDetector(train_dataset, 256, cfg.eval.max_detections)
    result = evaluate_model(train_dataset, oracle, None, None, cfg)

    assert result.mean_ap == pytest.approx(1.0)
    assert result.add_accuracy == pytest.approx(1.0)
    assert result.add_s_accuracy == pytest.approx(1.0)
    assert result.accuracy_5cm_5degree == pytest.approx(1.0)
    assert result.accuracy_2d_projection == pytest.approx(1.0)
    assert result.translation_error_mean_mm < 1e-3
    assert result.rotation_error_mean_deg < 0.1
    assert result.tip_error_mean_mm < 1e-2
    assert result.hand_error_mean_mm < 0.1  # float32 roundtrip of ~500mm coords
    assert result.mixed_point_distance_mean_mm < 1e-2


def test_compute_average_precision_simple():
    # one TP then one FP over 1 annotation
    recall = np.array([1.0, 1.0])
    precision = np.array([1.0, 0.5])
    assert compute_average_precision(recall, precision) == pytest.approx(1.0)


def test_hand_renderer_v3_cues(tmp_path):
    """Renderer v3 (run-G generator redesign): grip placement, orientation
    arrows, depth-scaled radii — and v2 label/pose streams unperturbed.

    v3 consumes the identical RNG stream as v2 (the lateral draw is the
    same uniform sample over a different range; radii/arrows are
    deterministic), so same-seed v2/v3 datasets must agree on every drill
    pose while differing in hand placement tightness and arrow pixels.
    """
    import yaml

    r2 = generate_synthetic_colibri(
        str(tmp_path / "v2"), num_frames=5, image_size=(128, 128),
        hand_render_version=2)
    r3 = generate_synthetic_colibri(
        str(tmp_path / "v3"), num_frames=5, image_size=(128, 128),
        hand_render_version=3)

    with open(os.path.join(r2, "data", "01", "gt_0.yml")) as f:
        gt2 = yaml.safe_load(f)
    with open(os.path.join(r3, "data", "01", "gt_0.yml")) as f:
        gt3 = yaml.safe_load(f)
    for fr in gt2:
        # drill poses identical: v3 only changes the hand rendering
        np.testing.assert_allclose(
            gt2[fr][0]["cam_t_m2c"], gt3[fr][0]["cam_t_m2c"], rtol=0, atol=0)
        np.testing.assert_allclose(
            gt2[fr][0]["cam_R_m2c"], gt3[fr][0]["cam_R_m2c"], rtol=0, atol=0)

    from hmd_ego_pose_tpu.data.image import imread_rgb

    cyan2 = cyan3 = 0
    for fr in range(5):
        # grip placement: v3 hand centroid sits closer to the drill (xy)
        h2 = np.load(os.path.join(r2, "data", "01", "hands", f"{fr:06d}_coords_3d.npy")) * 1000
        h3 = np.load(os.path.join(r3, "data", "01", "hands", f"{fr:06d}_coords_3d.npy")) * 1000
        t = np.asarray(gt2[fr][0]["cam_t_m2c"])
        d2 = np.linalg.norm(h2.mean(axis=0)[:2] - t[:2])
        d3 = np.linalg.norm(h3.mean(axis=0)[:2] - t[:2])
        assert d3 < d2  # 18-40mm lateral vs 40-70 (same underlying draw)
        a3 = imread_rgb(os.path.join(r3, "data", "01", "rgb", f"{fr:06d}.png")).astype(int)
        a2 = imread_rgb(os.path.join(r2, "data", "01", "rgb", f"{fr:06d}.png")).astype(int)
        cyan3 += int(((a3[..., 0] < 90) & (a3[..., 1] > 170) & (a3[..., 2] > 170)).sum())
        cyan2 += int(((a2[..., 0] < 90) & (a2[..., 1] > 170) & (a2[..., 2] > 170)).sum())
    # palm-orientation arrows: bright cyan present in v3, essentially absent in v2
    assert cyan3 > cyan2 + 20
