"""On-device augmentation parity vs the host (numpy) oracles."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hmd_ego_pose_tpu.data import augment as host_aug
from hmd_ego_pose_tpu.data.image import get_rotation_matrix_2d, warp_affine
from hmd_ego_pose_tpu.ops import augment_device as dev
from hmd_ego_pose_tpu.ops.geometry import matrix_to_axis_angle, np_axis_angle_to_matrix


def _rand_rot(rng):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    return q * np.sign(np.linalg.det(q))


def test_matrix_to_axis_angle_jnp_matches_scipy():
    rng = np.random.RandomState(0)
    mats = [np.eye(3)]
    # generic, near-zero and near-pi rotations
    for _ in range(50):
        mats.append(_rand_rot(rng))
    for axis in (np.array([1.0, 0, 0]), np.array([0, 1.0, 0]), np.array([0.4, -0.3, 0.87])):
        a = axis / np.linalg.norm(axis)
        for ang in (1e-8, 1e-4, math.pi - 1e-6, math.pi - 1e-3, 3.14159):
            mats.append(np_axis_angle_to_matrix(a * ang))
    m = np.stack(mats).astype(np.float64)

    got = np.asarray(dev.matrix_to_axis_angle_jnp(jnp.asarray(m)))
    exp = matrix_to_axis_angle(m)
    # rotvec sign is ambiguous at exactly pi: compare reconstructed matrices
    for g, e in zip(got, exp):
        np.testing.assert_allclose(
            np_axis_angle_to_matrix(g), np_axis_angle_to_matrix(e), atol=2e-5
        )


def test_inverse_affine_matches_host():
    from hmd_ego_pose_tpu.data.image import _invert_affine

    for angle, scale, cx, cy in ((33.0, 1.2, 120.5, 99.5), (-140.0, 0.75, 0.0, 0.0)):
        exp = _invert_affine(get_rotation_matrix_2d((cx, cy), angle, scale))
        got = np.asarray(dev.inverse_affine(angle, scale, cx, cy))
        np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_warp_bilinear_matches_host():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (64, 80, 3), np.uint8)
    m = get_rotation_matrix_2d((40.0, 32.0), -37.0, 1.15)
    exp = warp_affine(img, m, (80, 64), "bilinear")
    from hmd_ego_pose_tpu.data.image import _invert_affine

    got = np.asarray(dev.warp_bilinear_u8(jnp.asarray(img), jnp.asarray(_invert_affine(m))))
    # bilinear weights differ in op order by float ulps; allow off-by-one
    # uint8 rounding on a tiny fraction of pixels
    diff = np.abs(got.astype(int) - exp.astype(int))
    assert (diff > 1).mean() == 0.0
    assert (diff == 1).mean() < 0.02


def test_warp_nearest_matches_host():
    rng = np.random.RandomState(2)
    mask = (rng.randint(0, 2, (64, 80), np.uint8)) * 255
    m = get_rotation_matrix_2d((40.0, 32.0), -81.0, 0.9)
    exp = warp_affine(mask, m, (80, 64), "nearest")
    from hmd_ego_pose_tpu.data.image import _invert_affine

    got = np.asarray(dev.warp_nearest_u8(jnp.asarray(mask), jnp.asarray(_invert_affine(m))))
    # round-half ties at exact .5 source coords may resolve differently
    assert (got != exp).mean() < 0.01


def test_bbox_from_mask_matches_host():
    from hmd_ego_pose_tpu.data.colibri import get_bbox_from_mask

    rng = np.random.RandomState(3)
    mask = np.zeros((48, 56), np.uint8)
    mask[10:30, 5:22] = 255
    exp, exp_ok = get_bbox_from_mask(mask, 255)
    got, ok = dev.bbox_from_mask_jnp(jnp.asarray(mask == 255))
    assert bool(ok) == exp_ok
    np.testing.assert_array_equal(np.asarray(got), exp)

    empty, ok2 = dev.bbox_from_mask_jnp(jnp.zeros((8, 8), bool))
    assert not bool(ok2)


@pytest.mark.parametrize("op_idx", range(14))
def test_color_ops_match_host(op_idx):
    """Each device color op == its numpy twin given identical (m, randoms)."""
    rng = np.random.RandomState(4 + op_idx)
    img = rng.randint(0, 256, (40, 48, 3), np.uint8)
    m = 9

    host_op = host_aug.COLOR_OPS[op_idx]
    dev_op = dev.COLOR_OP_BRANCHES[op_idx]

    key = jax.random.PRNGKey(op_idx)
    name = host_op.__name__

    if name in ("op_color", "op_contrast", "op_brightness", "op_sharpness"):
        # factor ops consume one uniform; feed the device's draw to the host
        r = float(jax.random.uniform(key))

        class _R:
            def random_sample(self):
                return r

        exp = host_op(img, m, _R())
        got = np.asarray(dev_op(jnp.asarray(img, jnp.float32), jnp.float32(m), key)).astype(np.uint8)
        np.testing.assert_allclose(got.astype(int), exp.astype(int), atol=1)
    elif name == "op_cutout":
        ky, kx = jax.random.split(key)
        y = int(jax.random.randint(ky, (), 0, img.shape[0]))
        x = int(jax.random.randint(kx, (), 0, img.shape[1]))

        class _R:
            def __init__(self):
                self.vals = [y, x]

            def randint(self, lo, hi):
                return self.vals.pop(0)

        exp = host_op(img, m, _R())
        got = np.asarray(dev_op(jnp.asarray(img, jnp.float32), jnp.float32(m), key)).astype(np.uint8)
        np.testing.assert_array_equal(got, exp)
    elif name == "op_gaussian_noise":
        # different RNG streams: check distribution only
        got = np.asarray(dev_op(jnp.asarray(img, jnp.float32), jnp.float32(m), key)).astype(np.uint8)
        assert got.shape == img.shape
        sigma = m / 14 * 25.0
        d = got.astype(float) - img.astype(float)
        assert 0.3 * sigma < d.std() < 1.7 * sigma
    else:
        exp = host_op(img, m, rng)
        got = np.asarray(dev_op(jnp.asarray(img, jnp.float32), jnp.float32(m), key)).astype(np.uint8)
        np.testing.assert_array_equal(got, exp)


def test_color_augment_runs_and_changes_image():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (32, 32, 3), np.uint8)
    out = np.asarray(dev.color_augment(jnp.asarray(img), jax.random.PRNGKey(3)))
    assert out.shape == img.shape and out.dtype == np.uint8


def test_augment_6dof_device_matches_host_labels():
    """Full 6-DoF warp: device label updates == host augment_6dof."""
    rng = np.random.RandomState(8)
    h = w = 96
    image = rng.randint(0, 256, (h, w, 3), np.uint8)
    mask = np.zeros((h, w), np.uint8)
    mask[30:60, 35:70] = 255

    cam = np.array([[100.0, 0, 48.0], [0, 100.0, 48.0], [0, 0, 1.0]])
    rot = _rand_rot(rng)
    rotvec = matrix_to_axis_angle(rot)
    trans = np.array([12.0, -8.0, 500.0])
    coords = rng.normal(scale=40, size=(21, 3)) + [0, 0, 500.0]

    anno = {
        "labels": np.zeros((1,), np.int64),
        "bboxes": np.array([[35.0, 30.0, 69.0, 59.0]]),
        "rotations": np.array([[rotvec[0], rotvec[1], rotvec[2], 0.0, 0.0]]),
        "translations": trans[None],
        "translations_x_y_2D": np.zeros((1, 2)),
        "coords_3d": coords[None],
    }
    angle, scale = 73.0, 1.1

    aug_img, out, ok = host_aug.augment_6dof(image, mask, anno, cam, angle, scale)
    assert ok

    got = dev.augment_6dof_device(
        jnp.asarray(image), jnp.asarray(mask),
        jnp.asarray(anno["bboxes"][0], jnp.float32),
        jnp.asarray(rotvec, jnp.float32),
        jnp.asarray(trans, jnp.float32),
        jnp.asarray(coords, jnp.float32),
        cam[0, 2], cam[1, 2], angle, scale,
    )
    assert bool(got.applied)
    np.testing.assert_array_equal(np.asarray(got.bbox), out["bboxes"][0])
    # rotvec comparison via reconstructed matrices (sign-safe)
    np.testing.assert_allclose(
        np_axis_angle_to_matrix(np.asarray(got.rotation)),
        np_axis_angle_to_matrix(out["rotations"][0, :3]),
        atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(got.translation), out["translations"][0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got.coords_3d), out["coords_3d"][0], rtol=1e-4, atol=1e-3)
    # warped image: same up to off-by-one rounding
    diff = np.abs(np.asarray(got.image).astype(int) - aug_img.astype(int))
    assert (diff > 1).mean() == 0.0


def test_augment_6dof_device_invalid_falls_back():
    """A warp that throws the object out of frame keeps the original."""
    h = w = 64
    image = np.full((h, w, 3), 80, np.uint8)
    mask = np.zeros((h, w), np.uint8)
    mask[2:6, 2:6] = 255  # corner object; zoom-in warp pushes it out

    got = dev.augment_6dof_device(
        jnp.asarray(image), jnp.asarray(mask),
        jnp.asarray([2.0, 2.0, 5.0, 5.0]),
        jnp.zeros(3), jnp.asarray([0.0, 0.0, 500.0]), jnp.zeros((21, 3)),
        32.0, 32.0, 0.0, 8.0,  # scale 8: corner object leaves the frame
    )
    assert not bool(got.applied)
    np.testing.assert_array_equal(np.asarray(got.image), image)
    np.testing.assert_array_equal(np.asarray(got.bbox), [2.0, 2.0, 5.0, 5.0])


def _toy_raw_batch(rng, b=2, h=60, w=60):
    # 60 -> 48 resize has no exact-0.5 bilinear ties; tie-prone ratios can
    # legitimately differ by one uint8 step between the C++ and einsum paths
    from hmd_ego_pose_tpu.ops.augment_device import RawBatch

    frames = rng.randint(0, 256, (b, h, w, 3), np.uint8)
    masks = np.zeros((b, h, w), np.uint8)
    masks[:, 20:44, 16:40] = 255  # inside 60x60
    rots = rng.normal(scale=0.8, size=(b, 1, 3)).astype(np.float32)
    return RawBatch(
        frames=jnp.asarray(frames),
        masks=jnp.asarray(masks),
        camera_fxfycxcy=jnp.tile(jnp.asarray([[90.0, 90.0, 32.0, 32.0]], jnp.float32), (b, 1)),
        gt_boxes=jnp.tile(jnp.asarray([[[16.0, 20.0, 39.0, 43.0]]], jnp.float32), (b, 1, 1)),
        gt_rotations=jnp.asarray(rots),
        gt_is_sym=jnp.zeros((b, 1), jnp.float32),
        gt_translations=jnp.tile(jnp.asarray([[[5.0, -3.0, 400.0]]], jnp.float32), (b, 1, 1)),
        gt_coords_3d=jnp.asarray(rng.normal(scale=30, size=(b, 1, 21, 3)).astype(np.float32)),
        gt_labels=jnp.zeros((b, 1), jnp.int32),
        gt_valid=jnp.ones((b, 1), bool),
    )


def test_augment_and_preprocess_batch_no_aug_matches_host_preprocess():
    """chance_no_augmentation=1 -> the device path must reproduce the host
    preprocess + label math exactly (the bit-close preprocess invariant)."""
    from hmd_ego_pose_tpu.data.image import preprocess_image
    from hmd_ego_pose_tpu.ops.augment_device import augment_and_preprocess_batch

    rng = np.random.RandomState(9)
    raw = _toy_raw_batch(rng)
    batch = augment_and_preprocess_batch(
        jax.random.PRNGKey(0), raw, image_size=48, chance_no_augmentation=1.0
    )

    for i in range(2):
        exp_img, scale = preprocess_image(np.asarray(raw.frames[i]), 48)
        np.testing.assert_allclose(np.asarray(batch.images[i]), exp_img, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(batch.camera_parameters[i]),
            [90.0, 90.0, 32.0, 32.0, 1000.0, scale], rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(batch.gt_boxes[i, 0]), np.asarray(raw.gt_boxes[i, 0]) * scale, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(batch.gt_transformation[i, 0, :3]),
            np.asarray(raw.gt_rotations[i, 0]) / np.pi, rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(batch.gt_transformation[i, 0, 3:6]),
            np.asarray(raw.gt_translations[i, 0]), rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(batch.gt_coords_3d[i, 0]),
            (np.asarray(raw.gt_coords_3d[i, 0]) * scale).reshape(63), rtol=1e-5,
        )


def test_augment_and_preprocess_batch_augmented_shapes_and_sanity():
    from hmd_ego_pose_tpu.ops.augment_device import augment_and_preprocess_batch

    rng = np.random.RandomState(10)
    raw = _toy_raw_batch(rng)
    fn = jax.jit(lambda k, r: augment_and_preprocess_batch(k, r, image_size=48))
    batch = fn(jax.random.PRNGKey(1), raw)
    assert batch.images.shape == (2, 48, 48, 3)
    assert batch.gt_boxes.shape == (2, 1, 4)
    assert np.all(np.isfinite(np.asarray(batch.images)))
    # rotation targets stay in [-1, 1] (axis-angle / pi)
    assert np.max(np.abs(np.asarray(batch.gt_transformation[:, :, :3]))) <= 1.0 + 1e-5


def test_device_augment_train_step_end_to_end():
    """Full jitted train step consuming a RawBatch: loss finite, state steps."""
    from hmd_ego_pose_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from hmd_ego_pose_tpu.train.step import make_train_step

    from hmd_ego_pose_tpu.models import hmd_ego_pose

    rng = np.random.RandomState(11)
    cfg = Config(
        model=ModelConfig(phi=0, image_size=128),
        train=TrainConfig(batch_size=2, learning_rate=1e-4),
        data=DataConfig(device_augment=True),
    )
    params, bn_state = hmd_ego_pose.init(jax.random.PRNGKey(0), cfg.model)
    model_points = (rng.normal(size=(1, 64, 3)) * 50).astype(np.float32)
    step = make_train_step(cfg, model_points, device_augment=True)
    state = step.init_state(params, bn_state)

    raw = _toy_raw_batch(rng, b=2, h=128, w=128)
    new_state, metrics = step.jitted(state, raw, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_device_dataset_matches_raw_pipeline(tmp_path):
    """HBM-resident gather == the host raw-batch builder, field for field."""
    from hmd_ego_pose_tpu.config import DataConfig, ModelConfig
    from hmd_ego_pose_tpu.data.colibri import ColibriDataset
    from hmd_ego_pose_tpu.data.device_dataset import build_device_data, gather_raw_batch
    from hmd_ego_pose_tpu.data.pipeline import InputPipeline
    from hmd_ego_pose_tpu.data.synthetic import generate_synthetic_colibri

    root = generate_synthetic_colibri(str(tmp_path / "syn"), num_frames=6, image_size=(64, 64))
    ds = ColibriDataset(root, 0, 1, "train")

    data = build_device_data(ds)
    assert data is not None
    assert data.frames.shape[0] == len(ds)

    pipe = InputPipeline(
        ds, DataConfig(device_augment=True), ModelConfig(image_size=48),
        batch_size=2, training=True, seed=0,
    )
    idx = np.array([0, 1])
    exp = pipe._make_raw_batch(idx, None)
    got = gather_raw_batch(data, jnp.asarray(idx))
    for name in exp._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(got, name)), np.asarray(getattr(exp, name)), err_msg=name
        )

    # budget miss -> None
    assert build_device_data(ds, budget_bytes=10) is None


# ---------------------------------------------------------------------------
# Multi-object (K > 1) device augmentation
# ---------------------------------------------------------------------------


def _two_object_scene(rng, h=96, w=96, corner=False):
    """Frame with two disjoint objects at mask values 60 and 200."""
    image = rng.randint(0, 256, (h, w, 3), np.uint8)
    mask = np.zeros((h, w), np.uint8)
    if corner:
        mask[2:10, 2:10] = 60  # vanishes under zoom-in warps
    else:
        mask[12:34, 10:36] = 60
    mask[52:80, 48:82] = 200

    cam = np.array([[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1.0]])
    rotvecs = np.stack([matrix_to_axis_angle(_rand_rot(rng)) for _ in range(2)])
    trans = np.array([[12.0, -8.0, 500.0], [-20.0, 15.0, 650.0]])
    coords = rng.normal(scale=40, size=(2, 21, 3)) + [0, 0, 500.0]

    def bbox_of(v):
        ys, xs = np.where(mask == v)
        return [xs.min(), ys.min(), xs.max(), ys.max()]

    anno = {
        "labels": np.array([0, 1], np.int64),
        "bboxes": np.array([bbox_of(60), bbox_of(200)], np.float64),
        "rotations": np.concatenate([rotvecs, np.zeros((2, 2))], axis=1),
        "translations": trans,
        "translations_x_y_2D": np.zeros((2, 2)),
        "coords_3d": coords,
        "mask_values": np.array([60, 200], np.int32),
    }
    return image, mask, cam, anno


def test_augment_6dof_device_multi_matches_host_k2():
    """K=2 device warp == host augment_6dof with per-object mask_values."""
    rng = np.random.RandomState(21)
    image, mask, cam, anno = _two_object_scene(rng)
    angle, scale = 41.0, 1.15

    aug_img, out, ok = host_aug.augment_6dof(
        image, mask, anno, cam, angle, scale, mask_values=anno["mask_values"]
    )
    assert ok and out["bboxes"].shape[0] == 2  # both objects survive

    img, bbs, rots, trs, crds, valid, applied = dev.augment_6dof_device_multi(
        jnp.asarray(image), jnp.asarray(mask),
        jnp.asarray(anno["bboxes"], jnp.float32),
        jnp.asarray(anno["rotations"][:, :3], jnp.float32),
        jnp.asarray(anno["translations"], jnp.float32),
        jnp.asarray(anno["coords_3d"], jnp.float32),
        jnp.asarray(anno["mask_values"]),
        jnp.ones((2,), bool),
        cam[0, 2], cam[1, 2], angle, scale,
    )
    assert bool(applied)
    np.testing.assert_array_equal(np.asarray(valid), [True, True])
    np.testing.assert_array_equal(np.asarray(bbs), out["bboxes"])
    for i in range(2):
        np.testing.assert_allclose(
            np_axis_angle_to_matrix(np.asarray(rots[i])),
            np_axis_angle_to_matrix(out["rotations"][i, :3]),
            atol=1e-5,
        )
    np.testing.assert_allclose(np.asarray(trs), out["translations"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(crds), out["coords_3d"], rtol=1e-4, atol=1e-3)
    diff = np.abs(np.asarray(img).astype(int) - aug_img.astype(int))
    assert (diff > 1).mean() == 0.0


def test_augment_6dof_device_multi_k1_identical_to_single():
    """Restricted to K=1 / value 255, the multi path is bit-identical."""
    rng = np.random.RandomState(22)
    h = w = 96
    image = rng.randint(0, 256, (h, w, 3), np.uint8)
    mask = np.zeros((h, w), np.uint8)
    mask[30:60, 35:70] = 255
    rotvec = matrix_to_axis_angle(_rand_rot(rng))
    trans = np.array([12.0, -8.0, 500.0])
    coords = rng.normal(scale=40, size=(21, 3)) + [0, 0, 500.0]
    bbox = np.array([35.0, 30.0, 69.0, 59.0])
    angle, scale = 73.0, 1.1

    single = dev.augment_6dof_device(
        jnp.asarray(image), jnp.asarray(mask),
        jnp.asarray(bbox, jnp.float32), jnp.asarray(rotvec, jnp.float32),
        jnp.asarray(trans, jnp.float32), jnp.asarray(coords, jnp.float32),
        48.0, 48.0, angle, scale,
    )
    img, bbs, rots, trs, crds, valid, applied = dev.augment_6dof_device_multi(
        jnp.asarray(image), jnp.asarray(mask),
        jnp.asarray(bbox, jnp.float32)[None],
        jnp.asarray(rotvec, jnp.float32)[None],
        jnp.asarray(trans, jnp.float32)[None],
        jnp.asarray(coords, jnp.float32)[None],
        jnp.full((1,), 255, jnp.int32), jnp.ones((1,), bool),
        48.0, 48.0, angle, scale,
    )
    assert bool(applied) == bool(single.applied)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(single.image))
    np.testing.assert_array_equal(np.asarray(bbs[0]), np.asarray(single.bbox))
    np.testing.assert_array_equal(np.asarray(rots[0]), np.asarray(single.rotation))
    np.testing.assert_array_equal(np.asarray(trs[0]), np.asarray(single.translation))
    np.testing.assert_array_equal(np.asarray(crds[0]), np.asarray(single.coords_3d))


def test_augment_6dof_device_multi_vanish_invalidates_object():
    """One object warped out of frame: warp kept, that object invalidated —
    the static-shape twin of the host oracle's row drop."""
    rng = np.random.RandomState(23)
    image, mask, cam, anno = _two_object_scene(rng, corner=True)
    angle, scale = 0.0, 3.0  # zoom-in: the corner object (value 60) leaves

    aug_img, out, ok = host_aug.augment_6dof(
        image, mask, anno, cam, angle, scale, mask_values=anno["mask_values"]
    )
    assert ok and out["bboxes"].shape[0] == 1  # host dropped the corner row

    img, bbs, rots, trs, crds, valid, applied = dev.augment_6dof_device_multi(
        jnp.asarray(image), jnp.asarray(mask),
        jnp.asarray(anno["bboxes"], jnp.float32),
        jnp.asarray(anno["rotations"][:, :3], jnp.float32),
        jnp.asarray(anno["translations"], jnp.float32),
        jnp.asarray(anno["coords_3d"], jnp.float32),
        jnp.asarray(anno["mask_values"]),
        jnp.ones((2,), bool),
        cam[0, 2], cam[1, 2], angle, scale,
    )
    assert bool(applied)
    np.testing.assert_array_equal(np.asarray(valid), [False, True])
    # surviving object's labels match the host's remaining row
    np.testing.assert_array_equal(np.asarray(bbs[1]), out["bboxes"][0])
    np.testing.assert_allclose(np.asarray(trs[1]), out["translations"][0], rtol=1e-5)
    diff = np.abs(np.asarray(img).astype(int) - aug_img.astype(int))
    assert (diff > 1).mean() == 0.0


def test_multi_object_train_step_end_to_end():
    """K=2 RawBatch through the full jitted train step: per-class model-point
    lookup engaged (2 classes), loss finite."""
    from hmd_ego_pose_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from hmd_ego_pose_tpu.models import hmd_ego_pose
    from hmd_ego_pose_tpu.ops.augment_device import RawBatch
    from hmd_ego_pose_tpu.train.step import make_train_step

    rng = np.random.RandomState(24)
    b, h, w = 2, 128, 128
    frames = rng.randint(0, 256, (b, h, w, 3), np.uint8)
    masks = np.zeros((b, h, w), np.uint8)
    masks[:, 20:50, 16:48] = 60
    masks[:, 70:110, 64:112] = 200
    raw = RawBatch(
        frames=jnp.asarray(frames),
        masks=jnp.asarray(masks),
        camera_fxfycxcy=jnp.tile(
            jnp.asarray([[90.0, 90.0, 64.0, 64.0]], jnp.float32), (b, 1)
        ),
        gt_boxes=jnp.tile(
            jnp.asarray([[[16.0, 20.0, 47.0, 49.0], [64.0, 70.0, 111.0, 109.0]]],
                        jnp.float32),
            (b, 1, 1),
        ),
        gt_rotations=jnp.asarray(rng.normal(scale=0.8, size=(b, 2, 3)), jnp.float32),
        gt_is_sym=jnp.zeros((b, 2), jnp.float32),
        gt_translations=jnp.tile(
            jnp.asarray([[[5.0, -3.0, 400.0], [-8.0, 6.0, 550.0]]], jnp.float32),
            (b, 1, 1),
        ),
        gt_coords_3d=jnp.asarray(
            rng.normal(scale=30, size=(b, 2, 21, 3)), jnp.float32
        ),
        gt_labels=jnp.tile(jnp.asarray([[0, 1]], jnp.int32), (b, 1)),
        gt_valid=jnp.ones((b, 2), bool),
        gt_mask_values=jnp.tile(jnp.asarray([[60, 200]], jnp.int32), (b, 1)),
    )

    cfg = Config(
        model=ModelConfig(phi=0, image_size=128, num_classes=2),
        train=TrainConfig(batch_size=2, learning_rate=1e-4),
        data=DataConfig(device_augment=True, max_objects=2),
    )
    params, bn_state = hmd_ego_pose.init(jax.random.PRNGKey(0), cfg.model)
    model_points = (rng.normal(size=(2, 64, 3)) * 50).astype(np.float32)
    step = make_train_step(cfg, model_points, device_augment=True)
    state = step.init_state(params, bn_state)
    new_state, metrics = step.jitted(state, raw, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
