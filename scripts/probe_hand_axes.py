"""Decompose the hand MPJPE of a checkpoint into axis / root / articulation.

The hand head regresses ABSOLUTE camera-space 3D joints (63 raw values,
colibri_common.py:617 semantics) and the eval metric is absolute MPJPE
(eval/common.py:975-981) — so the 44-45 mm run-E stall could be (a) global
LOCALIZATION error (dominated by z, where the only monocular cue is the
projective scale of the fixed-length bones), or (b) ARTICULATION error
(wrong joint layout), or (c) xy error.  Each points at a different fix:
(a) generator depth cues / report root-relative MPJPE alongside,
(b) capacity/augmentation, (c) optimization.

Splits measured per joint over the val set, top-scoring detection per frame:
  * per-axis MAE/RMSE (x, y, z),
  * root (wrist, joint 0) error per axis = global localization,
  * root-ALIGNED MPJPE (subtract the wrist error from every joint) =
    articulation quality, the quantity hand-pose papers usually report,
  * per-joint MPJPE (wrist -> fingertips gradient).

CPU-safe: forces the cpu backend in-process (the env var alone is consumed
by the sitecustomize preimport).  Run it while the TPU is idle or training —
it never touches the relay.

Usage: python scripts/probe_hand_axes.py --ckpt .long_run_e/ckpt/last.npz \
           --data-root .long_run_e/data [--limit 100] [--json out.json]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--partition", default="val")
    ap.add_argument("--limit", type=int, default=0, help="0 = whole partition")
    ap.add_argument("--score-threshold", type=float, default=0.1)
    ap.add_argument("--json", default="", help="also dump the stats as JSON")
    ap.add_argument("--hand-relative", action="store_true",
                    help="checkpoint trained with ModelConfig.hand_relative")
    args = ap.parse_args()

    from hmd_ego_pose_tpu.config import ModelConfig
    from hmd_ego_pose_tpu.data.colibri import ColibriDataset
    from hmd_ego_pose_tpu.data.image import preprocess_image
    from hmd_ego_pose_tpu.models import hmd_ego_pose
    from hmd_ego_pose_tpu.train.checkpoint import restore_checkpoint

    cfg = ModelConfig(phi=0, image_size=256, compute_dtype="bfloat16",
                      hand_relative=args.hand_relative)
    params, bn_state, meta = restore_checkpoint(args.ckpt)
    print(f"ckpt {args.ckpt} (epoch {meta.get('epoch')})")
    predict = jax.jit(
        lambda img, cam: hmd_ego_pose.predict(
            params, bn_state, img, cam, cfg,
            score_threshold=args.score_threshold, max_detections=8,
        )
    )

    ds = ColibriDataset(args.data_root, fold=0, partition=args.partition)
    n = len(ds) if args.limit == 0 else min(args.limit, len(ds))

    errs = []  # (n_matched, 21, 3) pred - gt, mm
    for i in range(n):
        image, scale = preprocess_image(ds.load_image(i), cfg.image_size)
        ck = ds.load_camera_matrix(i)
        cam = np.array(
            [[ck[0, 0], ck[1, 1], ck[0, 2], ck[1, 2], 1000.0, scale]], np.float32
        )
        det = predict(jnp.asarray(image[None]), jnp.asarray(cam))
        scores = np.asarray(det.scores[0])
        top = int(np.argmax(scores))
        if scores[top] <= args.score_threshold:
            continue
        pred = np.asarray(det.hand[0][top]).reshape(21, 3)
        anno = ds.load_annotations(i)
        gt = np.reshape(anno["coords_3d"][0], (21, 3)) * scale  # training-target space
        errs.append((pred - gt) * 1000.0)
    errs = np.stack(errs)  # mm
    print(f"{len(errs)}/{n} frames matched")

    d = np.linalg.norm(errs, axis=-1)  # (n, 21)
    per_frame = d.mean(axis=1)  # (n,) per-frame MPJPE
    stats = {
        "mpjpe_mm": float(d.mean()),
        # flip-tail detector: if a minority of frames carries a large share
        # of the mean (finger-identity flips under the color stack ->
        # orientation errors), the percentiles separate far from the mean
        "per_frame_mpjpe_p10_p50_p90_mm": np.percentile(
            per_frame, [10, 50, 90]
        ).round(1).tolist(),
        "frames_over_60mm_pct": float((per_frame > 60.0).mean() * 100.0),
        "mean_of_best_80pct_mm": float(
            np.sort(per_frame)[: int(len(per_frame) * 0.8)].mean()
        ),
        "per_axis_mae_mm": np.abs(errs).mean(axis=(0, 1)).round(2).tolist(),
        "per_axis_rmse_mm": np.sqrt((errs**2).mean(axis=(0, 1))).round(2).tolist(),
        "root_error_mm": float(np.linalg.norm(errs[:, 0], axis=-1).mean()),
        "root_per_axis_mae_mm": np.abs(errs[:, 0]).mean(axis=0).round(2).tolist(),
        "root_aligned_mpjpe_mm": float(
            np.linalg.norm(errs - errs[:, 0:1], axis=-1).mean()
        ),
        "per_joint_mpjpe_mm": d.mean(axis=0).round(1).tolist(),
        # per-frame values let two checkpoints be compared frame-by-frame:
        # a high cross-checkpoint correlation means the tail is FRAME-
        # INTRINSIC (e.g. edge-on skeleton views with ambiguous finger
        # assignment), not stochastic training noise
        "per_frame_mpjpe_mm": per_frame.round(1).tolist(),
    }
    for k, v in stats.items():
        print(f"{k}: {v}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(stats, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
