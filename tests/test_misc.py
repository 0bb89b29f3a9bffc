"""Tests: device preprocessing parity, visualization, format-labels, export, CLI."""

import os
import pickle

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hmd_ego_pose_tpu.data.format_labels import (
    MODEL_RECENTER_OFFSET_M,
    binarize_mask,
    convert_pickles,
    pose_from_affine,
)
from hmd_ego_pose_tpu.data.colibri import ColibriDataset
from hmd_ego_pose_tpu.data.image import preprocess_image
from hmd_ego_pose_tpu.ops.preprocess import preprocess_scale, preprocess_uint8_batch
from hmd_ego_pose_tpu.utils.profiler import StageTimer, latency_histogram
from hmd_ego_pose_tpu.utils.visualization import cuboid_corners, render_frame


def test_device_preprocess_matches_host():
    rng = np.random.RandomState(0)
    frame = rng.randint(0, 255, size=(480, 480, 3)).astype(np.uint8)
    host, scale = preprocess_image(frame, 256)
    device = np.asarray(preprocess_uint8_batch(jnp.asarray(frame[None]), 256))[0]
    assert scale == preprocess_scale(480, 480, 256)
    assert device.shape == host.shape
    np.testing.assert_allclose(device, host, atol=2e-4)


def test_device_preprocess_non_square_padding():
    frame = np.full((240, 480, 3), 255, np.uint8)
    out = np.asarray(preprocess_uint8_batch(jnp.asarray(frame[None]), 256))[0]
    assert out.shape == (256, 256, 3)
    # bottom half is padding (zero), top half is normalized white
    assert np.all(out[128 + 2:, :, :] == 0)
    assert abs(out[0, 0, 0] - (1.0 - 0.485) / 0.229) < 1e-4


def test_visualization_renders(tmp_path):
    rng = np.random.RandomState(1)
    image = rng.randint(0, 255, size=(128, 128, 3)).astype(np.uint8)
    cam = np.array([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]])
    model_info = {
        "min_x": -20, "min_y": -20, "min_z": -20,
        "size_x": 40, "size_y": 40, "size_z": 40,
    }
    corners = cuboid_corners(model_info)
    assert corners.shape == (8, 3)
    out = render_frame(
        image, cam,
        model_info=model_info,
        gt_pose=(np.array([0.1, 0.2, 0.3]), np.array([0.0, 0.0, 300.0])),
        pred_pose=(np.array([0.1, 0.25, 0.3]), np.array([5.0, 0.0, 310.0])),
        gt_box=[30, 30, 90, 90],
        hand_3d=np.tile(np.array([0.0, 0.0, 300.0]), (21, 1)),
    )
    assert out.shape == image.shape
    assert not np.array_equal(out, image)  # something was drawn


def test_pose_from_affine_recenter_and_units():
    r = np.eye(3)
    t = np.array([0.1, 0.2, 0.5])
    affine = np.concatenate([r, t[:, None]], axis=1)
    rot, t_mm = pose_from_affine(affine)
    np.testing.assert_array_equal(rot, r)
    np.testing.assert_allclose(t_mm, (t + MODEL_RECENTER_OFFSET_M) * 1000)


def test_binarize_mask():
    mask = np.zeros((8, 8, 3), np.uint8)
    mask[2:5, 2:5, 0] = 200
    out = binarize_mask(mask)
    assert out.dtype == np.uint8
    assert out[3, 3] == 255 and out[0, 0] == 0


def test_convert_pickles_roundtrip(tmp_path):
    """pickle -> LINEMOD conversion must produce a readable ColibriDataset."""
    rng = np.random.RandomState(2)
    pkl_dir = tmp_path / "pkl"
    pkl_dir.mkdir()
    paths = []
    for i in range(4):
        mask = np.zeros((120, 160, 3), np.uint8)
        mask[40:80, 60:100, 0] = 255
        record = {
            "rgb": rng.randint(0, 255, size=(120, 160, 3)).astype(np.uint8),
            "mask": mask,
            "affine_transform": np.concatenate(
                [np.eye(3), np.array([[0.02], [0.01], [0.45]])], axis=1
            ),
            "cam_calib": np.array([[140.0, 0, 80], [0, 140.0, 60], [0, 0, 1]]),
            "coords_3d": rng.normal(scale=0.05, size=(21, 3)) + [0, 0, 0.45],
            "drill_tip_transform": np.array([0.1, -0.3, 0.3, 1.0]),
        }
        p = pkl_dir / f"{i:05d}.pkl"
        with open(p, "wb") as f:
            pickle.dump(record, f)
        paths.append(str(p))

    out_root = str(tmp_path / "converted")
    # need a model dir for the reader
    convert_pickles(paths, out_root, splits={"train": [0, 1], "val": [2], "test": [3]})
    os.makedirs(os.path.join(out_root, "models"), exist_ok=True)
    with open(os.path.join(out_root, "models", "obj_01.ply"), "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex 3\n"
                "property float x\nproperty float y\nproperty float z\nend_header\n"
                "0 0 0\n1 0 0\n0 1 0\n")
    import yaml

    with open(os.path.join(out_root, "models", "models_info.yml"), "w") as f:
        yaml.safe_dump({1: {"diameter": 100.0, "min_x": 0, "min_y": 0, "min_z": 0,
                            "size_x": 1, "size_y": 1, "size_z": 1}}, f)

    ds = ColibriDataset(out_root, fold=0, partition="train")
    assert len(ds) == 2
    anno = ds.load_annotations(0)
    # translation in mm with the recentering applied
    np.testing.assert_allclose(
        anno["translations"][0],
        (np.array([0.02, 0.01, 0.45]) + MODEL_RECENTER_OFFSET_M) * 1000,
        rtol=1e-6,
    )
    # tip was converted from meters to mm
    np.testing.assert_allclose(anno["drill_tip_transform"][0, :3], [100, -300, 300])


def test_latency_histogram_and_stage_timer():
    h = latency_histogram([1.0, 2.0, 3.0, 4.0], bins=4)
    assert h["count"] == 4 and 2.0 <= h["p50_ms"] <= 3.0
    t = StageTimer()
    with t.stage("a"):
        pass
    assert "a" in t.report() and t.report()["a"]["count"] == 1


def test_cli_make_synthetic_and_debug(tmp_path):
    from hmd_ego_pose_tpu.cli import main

    out = str(tmp_path / "syn")
    main(["make-synthetic", "--out-dir", out, "--num-frames", "4", "--frame-size", "128"])
    assert os.path.exists(os.path.join(out, "data", "01", "gt_0.yml"))

    viz = str(tmp_path / "viz")
    main([
        "debug", "--dataset-path", out, "--partition", "train",
        "--out-dir", viz, "--num-images", "2",
    ])
    assert len(os.listdir(viz)) >= 1


def test_stablehlo_export_roundtrip(tmp_path):
    from hmd_ego_pose_tpu.config import ModelConfig
    from hmd_ego_pose_tpu.export.stablehlo import export_inference, load_and_verify
    from hmd_ego_pose_tpu.models import hmd_ego_pose

    cfg = ModelConfig(phi=0, image_size=128)
    params, state = hmd_ego_pose.init(jax.random.PRNGKey(0), cfg)
    out = export_inference(params, state, cfg, str(tmp_path / "artifacts"))
    assert load_and_verify(out)


def test_model_stats_report():
    """Param/FLOP startup report (reference main.py:169-179 parity)."""
    from hmd_ego_pose_tpu.config import ModelConfig
    from hmd_ego_pose_tpu.utils.model_stats import (
        abstract_model,
        count_params,
        format_model_stats,
        forward_flops,
    )

    cfg = ModelConfig(phi=0, image_size=256)
    p_shapes, _ = abstract_model(cfg)
    n = count_params(p_shapes)
    # EfficientPose phi=0 scale: ~3.9M params
    assert 3.5e6 < n < 4.5e6, n

    report = format_model_stats(cfg, batch_size=1)
    assert f"HMD-EgoPose parameter count: {n}" in report
    assert "Size (MB):" in report

    flops = forward_flops(cfg, batch_size=1)
    if flops is not None:  # cost analysis available
        assert 0.5e9 < flops < 10e9, flops


def test_eval_format_report():
    """The 17-metric printout mirrors eval/common.py:268-292 labels."""
    from hmd_ego_pose_tpu.eval.evaluator import EvalResult, format_report

    r = EvalResult(
        mean_ap=0.5, add_accuracy=0.25,
        translation_error_mean_mm=10.0, translation_error_std_mm=2.0,
        rotation_error_mean_deg=5.0, rotation_error_std_deg=1.0,
    )
    text = format_report(r)
    for label in (
        "mAP: 0.5000", "ADD: 0.2500", "ADD-S:", "5cm_5degree:",
        "TranslationErrorMean_in_mm: 10.0000", "RotationErrorMean_in_degree: 5.0000",
        "TranslationErrorTipMean_in_mm:", "TranslationErrorHandMean_in_mm:",
        "2D-Projection:", "Summed_Translation_Rotation_Error: 18.0000",
        "ADD(-S):", "AveragePointDistanceMean_in_mm:",
        "AverageSymmetricPointDistanceMean_in_mm:", "MixedAveragePointDistanceMean_in_mm:",
    ):
        assert label in text, label


def test_pack_transfer_roundtrip():
    """pack_transfer must reproduce every leaf exactly (values, dtypes,
    shapes) through the per-dtype pack -> upload -> on-device unpack path
    used for host-built init/checkpoint trees (utils/device.py)."""
    import numpy as np
    import jax.numpy as jnp

    from hmd_ego_pose_tpu.utils.device import pack_transfer

    rng = np.random.RandomState(0)
    tree = {
        "w": rng.normal(size=(7, 3, 3, 8)).astype(np.float32),
        "b": rng.normal(size=(8,)).astype(np.float32),
        "count": np.int32(3),
        "mask": rng.rand(5) > 0.5,
        "nested": {"m": rng.normal(size=(2, 4)).astype(np.float32),
                   "steps": np.arange(6, dtype=np.int32).reshape(2, 3)},
        "scalar": np.float32(2.5),
    }
    out = pack_transfer(tree)
    import jax

    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(out)):
        assert np.asarray(b).dtype == np.asarray(a).dtype
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
