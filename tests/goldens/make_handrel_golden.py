"""Regenerate the handrel-checkpoint golden (tests/goldens/handrel_ckpt_*).

Pins trained/syn1000_phi0_576ep_handrel_int8.npz — the shipped both-heads
artifact (drill-anchored hand decode, v3 grip-placement renderer) — with
COMMITTED frames and per-frame expected outputs, like the 448ep golden.
Round-4 advice: the previous handrel test evaluated on freshly generated
frames with loose medians only, so a v3-renderer evolution silently
changed the eval set and hand_relative decode numerics had no per-frame
pin.  Run on CPU from the repo root:

    JAX_PLATFORMS=cpu python tests/goldens/make_handrel_golden.py
"""

import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

from hmd_ego_pose_tpu.config import Config, ModelConfig
from hmd_ego_pose_tpu.data.colibri import ColibriDataset
from hmd_ego_pose_tpu.data.image import imwrite, preprocess_image
from hmd_ego_pose_tpu.data.synthetic import generate_synthetic_colibri
from hmd_ego_pose_tpu.models import hmd_ego_pose
from hmd_ego_pose_tpu.train.checkpoint import restore_checkpoint

GOLDEN_DIR = os.path.dirname(os.path.abspath(__file__))
CKPT = os.path.join(REPO, "trained", "syn1000_phi0_576ep_handrel_int8.npz")


def main():
    # v3 renderer (the version this artifact trained on), 30-frame seed-0
    # set -> 6 val frames, all committed
    with tempfile.TemporaryDirectory() as tmp:
        root = generate_synthetic_colibri(
            tmp, num_frames=30, image_size=(256, 256), hand_render_version=3)
        ds = ColibriDataset(root, fold=0, partition="val")
        frames = [ds.load_image(i) for i in range(len(ds))]
        cams = [ds.load_camera_matrix(i) for i in range(len(ds))]
        annos = [ds.load_annotations(i) for i in range(len(ds))]

    cfg = Config(model=ModelConfig(phi=0, image_size=256,
                                   compute_dtype="bfloat16",
                                   hand_relative=True))
    params, bn_state, meta = restore_checkpoint(CKPT)
    assert meta.get("hand_relative") is True
    predict = hmd_ego_pose.make_predict_fn(cfg.model, score_threshold=0.1)

    out = {"n_frames": np.asarray(len(frames))}
    t_errs, hand_errs = [], []
    for i, (frame, cam, anno) in enumerate(zip(frames, cams, annos)):
        imwrite(os.path.join(GOLDEN_DIR, f"handrel_ckpt_frame_{i}.png"), frame)
        image, scale = preprocess_image(frame, cfg.model.image_size)
        cam6 = np.asarray(
            [[cam[0, 0], cam[1, 1], cam[0, 2], cam[1, 2], 1000.0, scale]], np.float32
        )
        det = predict(params, bn_state, image[None], cam6)
        top = int(np.argmax(np.asarray(det.scores[0])))
        out.update({
            f"camera_{i}": cam6,
            f"score_{i}": np.asarray(det.scores[0][top]),
            f"box_{i}": np.asarray(det.boxes[0][top]) / scale,
            f"rotation_{i}": np.asarray(det.rotation[0][top]) * np.pi,
            f"translation_{i}": np.asarray(det.translation[0][top]),
            f"hand_{i}": np.asarray(det.hand[0][top]),
            f"gt_translation_{i}": anno["translations"][0],
            f"gt_hand_{i}": np.asarray(anno["coords_3d"][0], np.float32) * scale,
        })
        t_errs.append(float(np.linalg.norm(
            out[f"translation_{i}"] - anno["translations"][0])))
        hand_errs.append(float(np.mean(np.linalg.norm(
            out[f"hand_{i}"].reshape(21, 3) - out[f"gt_hand_{i}"].reshape(21, 3),
            axis=-1)) * 1000.0))
    np.savez(os.path.join(GOLDEN_DIR, "handrel_ckpt_expected.npz"), **out)
    print(json.dumps({
        "t_err_per_frame": [round(e, 1) for e in t_errs],
        "t_err_median": round(float(np.median(t_errs)), 1),
        "hand_err_per_frame": [round(e, 1) for e in hand_errs],
        "hand_err_median": round(float(np.median(hand_errs)), 1),
    }, indent=1))


if __name__ == "__main__":
    main()
