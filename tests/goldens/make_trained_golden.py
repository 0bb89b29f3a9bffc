"""Regenerate the shipped-checkpoint golden (tests/goldens/trained_ckpt_*).

Pins trained/syn500_phi0_160ep_int8.npz against format/numerics drift
(VERDICT r2 missing #5; reference analog: recorded expected outputs,
pytorch-sandbox/README.md:298-307).  Run on CPU from the repo root:

    JAX_PLATFORMS=cpu python tests/goldens/make_trained_golden.py

Commits one synthetic val frame (PNG + camera + annotations) and the
restored model's top-1 detection on it.  The test
(tests/test_trained_checkpoint.py) re-runs restore -> predict and asserts
against these values, so the int8-checkpoint/converter/predict stack can no
longer drift silently.
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
from hmd_ego_pose_tpu.data.image import imwrite
from hmd_ego_pose_tpu.data.synthetic import generate_synthetic_colibri
from hmd_ego_pose_tpu.data.image import preprocess_image
from hmd_ego_pose_tpu.models import hmd_ego_pose
from hmd_ego_pose_tpu.train.checkpoint import restore_checkpoint

GOLDEN_DIR = os.path.dirname(os.path.abspath(__file__))
CKPT = os.path.join(REPO, "trained", "syn1000_phi0_448ep_int8.npz")


def main():
    # same generator settings as the training run (scripts/train_long.py):
    # 256px frames, seed 0.  ALL val frames of a 30-frame set are committed
    # and pinned — a single frame proved brittle: per-frame difficulty moves
    # when the generator's rendering evolves between training runs (e.g. the
    # round-3 skeleton hands occlude the drill differently than the dot
    # hands the 320ep checkpoint was trained on), so goodness-vs-GT is
    # asserted on the MEDIAN over frames, while restore/predict numerics
    # drift is still caught per-frame at tight tolerances.
    with tempfile.TemporaryDirectory() as tmp:
        root = generate_synthetic_colibri(tmp, num_frames=30, image_size=(256, 256))
        ds = ColibriDataset(root, fold=0, partition="val")
        frames = [ds.load_image(i) for i in range(len(ds))]
        cams = [ds.load_camera_matrix(i) for i in range(len(ds))]
        annos = [ds.load_annotations(i) for i in range(len(ds))]

    cfg = Config(model=ModelConfig(phi=0, image_size=256, compute_dtype="bfloat16"))
    params, bn_state, meta = restore_checkpoint(CKPT)
    predict = hmd_ego_pose.make_predict_fn(cfg.model, score_threshold=0.1)

    out = {"n_frames": np.asarray(len(frames))}
    t_errs = []
    for i, (frame, cam, anno) in enumerate(zip(frames, cams, annos)):
        imwrite(os.path.join(GOLDEN_DIR, f"trained_ckpt_frame_{i}.png"), frame)
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
    np.savez(os.path.join(GOLDEN_DIR, "trained_ckpt_expected.npz"), **out)
    print(json.dumps({"t_err_per_frame": [round(e, 1) for e in t_errs],
                      "t_err_median": round(float(np.median(t_errs)), 1)}, indent=1))
    print("ckpt meta epoch:", meta.get("epoch"), "metric:", meta.get("metric"))


if __name__ == "__main__":
    main()
