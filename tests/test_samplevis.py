"""Sample-vis panel and eval save-images tests."""

import os

import numpy as np
import pytest

from hmd_ego_pose_tpu.utils.samplevis import draw_samplevis


def test_draw_samplevis_writes_figure(tmp_path):
    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, size=(128, 128, 3)).astype(np.uint8)
    cam = np.array([[120.0, 0, 64], [0, 120.0, 64], [0, 0, 1]])
    gt_hand = rng.normal(scale=20, size=(21, 3)) + [0, 0, 400]
    pred_hand = gt_hand + rng.normal(scale=3, size=(21, 3))
    points = rng.normal(scale=30, size=(80, 3)) + [0, 0, 400]

    out = str(tmp_path / "vis.png")
    draw_samplevis(
        image, cam,
        gt_hand=gt_hand, pred_hand=pred_hand,
        gt_points=points, pred_points=points + 2.0,
        save_path=out,
    )
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_eval_save_images(tmp_path):
    """The oracle-detector eval writes overlays + panels when save_path set."""
    from hmd_ego_pose_tpu.config import Config, ModelConfig
    from hmd_ego_pose_tpu.data.colibri import ColibriDataset
    from hmd_ego_pose_tpu.data.synthetic import generate_synthetic_colibri
    from hmd_ego_pose_tpu.eval.evaluator import evaluate_model

    import tests.test_data_eval as tde

    root = generate_synthetic_colibri(str(tmp_path / "syn"), num_frames=6, image_size=(256, 256))
    ds = ColibriDataset(root, fold=0, partition="train")
    cfg = Config(model=ModelConfig(image_size=256))
    oracle = tde._OracleDetector(ds, 256, cfg.eval.max_detections)

    save_dir = str(tmp_path / "imgs")
    result = evaluate_model(ds, oracle, None, None, cfg, save_path=save_dir, max_eval_images=2)
    assert result.add_accuracy > 0
    files = os.listdir(save_dir)
    assert any(f.startswith("det_") for f in files)
    assert any(f.startswith("samplevis_") for f in files)
