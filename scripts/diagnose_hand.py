"""Root-cause experiments for the round-2 "hand-pose stall" (VERDICT r2 #3).

Round 2 observed: train hand loss falls 6.9 -> 0.6 over 160 epochs while val
hand MPJPE only moves 82.7 -> 67.5 mm.  Hypotheses: (a) recipe, (b) synthetic
hand labels, (c) decode/metric bug in the hand path.

Experiments (run on CPU, ~15 min):
  1. gt-through-decode: a stub predictor that returns the GT hand for every
     detection must score MPJPE ~0 through the FULL evaluator (rules out c).
  2. label floor: the synthetic hand labels used in round 2 carried per-frame
     random offsets (sigma 20 mm center + 30 mm per joint) that were NEVER
     rendered into the frame.  The best pixel-informed predictor (an oracle
     that knows the drill translation exactly) cannot beat
     E||N(0, (20^2+30^2) I3)|| ~ 57.5 mm.  Measured here per val fold.
  3. overfit: 10 frames, no augmentation, a few hundred epochs — with the
     FIXED generator (hands rendered, data/synthetic.py) train hand loss AND
     eval-on-train-frames MPJPE must drop together (rules out a for the
     plumbing; the stall was b).

Usage: JAX_PLATFORMS=cpu python scripts/diagnose_hand.py [--epochs 150]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def experiment_gt_through_decode(root):
    """Stub predictor returning GT boxes/poses/hands -> evaluator MPJPE ~0."""
    from hmd_ego_pose_tpu.config import Config, EvalConfig, ModelConfig
    from hmd_ego_pose_tpu.data.colibri import ColibriDataset
    from hmd_ego_pose_tpu.eval.evaluator import evaluate_model
    from hmd_ego_pose_tpu.ops.nms import Detections

    ds = ColibriDataset(root, fold=0, partition="val")
    cfg = Config(model=ModelConfig(phi=0, image_size=256),
                 eval=EvalConfig(score_threshold=0.2, eval_batch_size=1))

    calls = {"i": 0}

    def predict(params, state, images, cams):
        i = calls["i"]; calls["i"] += 1
        anno = ds.load_annotations(i)
        b = images.shape[0]
        det = Detections(
            boxes=np.tile(anno["bboxes"][:1][None], (b, 1, 1)).astype(np.float32),
            scores=np.full((b, 1), 0.99, np.float32),
            labels=np.zeros((b, 1), np.int32),
            rotation=(anno["rotations"][:1, :3][None] / np.pi).astype(np.float32),
            translation=np.tile(anno["translations"][:1][None], (b, 1, 1)).astype(np.float32),
            hand=anno["coords_3d"][:1].reshape(1, 1, 63).astype(np.float32),
            num_valid=np.ones((b,), np.int32),
        )
        return det

    r = evaluate_model(ds, predict, None, None, cfg)
    print(f"[1] GT-through-decode: hand MPJPE = {r.hand_error_mean_mm:.3f} mm "
          f"(must be ~0), translation err = {r.translation_error_mean_mm:.3f} mm")
    return r.hand_error_mean_mm


def experiment_label_floor(root):
    """Oracle that knows the drill translation exactly: its MPJPE on
    UNRENDERED hand labels is the floor no training can beat."""
    from hmd_ego_pose_tpu.data.colibri import ColibriDataset

    ds = ColibriDataset(root, fold=0, partition="val")
    errs = []
    for i in range(len(ds)):
        anno = ds.load_annotations(i)
        oracle = anno["translations"][0] / 1000.0  # metres, all 21 joints
        d = np.linalg.norm(anno["coords_3d"][0] - oracle[None, :], axis=-1)
        errs.append(np.mean(d) * 1000.0)
    analytic = np.sqrt(20.0 ** 2 + 30.0 ** 2) * np.sqrt(2) * 1.0 / (np.sqrt(np.pi) / 2)
    print(f"[2] label floor (oracle knows drill trans): {np.mean(errs):.1f} mm "
          f"over {len(ds)} val frames; analytic E||N|| ~ {analytic:.1f} mm; "
          f"round-2 trained model reached 67.5 mm")
    return float(np.mean(errs))


def experiment_overfit(root, epochs, oversample=20, augment=False, image_size=128,
                       hand_weight=1.0):
    """~7 frames: hand loss and eval-on-train MPJPE must fall TOGETHER now
    that hands are rendered.

    With ``augment=True`` this becomes the augmentation-robustness probe
    that run C motivated (TRAIN_SYNTHETIC.md): under the full RandAugment
    color stack the model cannot memorize frame appearance, so eval-on-train
    MPJPE only falls if joint identity/depth is recoverable from structure
    that survives the color ops."""
    import jax

    from hmd_ego_pose_tpu.config import Config, DataConfig, EvalConfig, ModelConfig, TrainConfig
    from hmd_ego_pose_tpu.data.colibri import ColibriDataset
    from hmd_ego_pose_tpu.train.trainer import Trainer
    from hmd_ego_pose_tpu.utils.logging import MetricLogger

    from hmd_ego_pose_tpu.config import LossConfig

    cfg = Config(
        model=ModelConfig(phi=0, image_size=image_size, compute_dtype="bfloat16"),
        train=TrainConfig(batch_size=5, learning_rate=5e-4, epochs=epochs,
                          oversample=oversample, freeze_backbone=False,
                          eval_every=max(1, epochs // 4),
                          loss=LossConfig(hand_weight=hand_weight),
                          checkpoint_dir=os.path.join(root, "_ckpt")),
        data=DataConfig(use_6dof_augmentation=augment,
                        use_colorspace_augmentation=augment, num_workers=1),
        eval=EvalConfig(score_threshold=0.05, eval_batch_size=5),
    )
    train_ds = ColibriDataset(root, fold=0, partition="train")
    # eval on the SAME frames we train on: pure plumbing-consistency check
    trainer = Trainer(cfg, train_ds, train_ds, logger=MetricLogger(stdout=False))

    hist = []

    def on_epoch(epoch, train_metrics, eval_result):
        hist.append({
            "epoch": epoch,
            "hand_loss": train_metrics.get("hand_loss"),
            "mpjpe_mm": eval_result.hand_error_mean_mm,
            "t_err_mm": eval_result.translation_error_mean_mm,
        })
        print(f"[3] epoch {epoch}: hand_loss={train_metrics.get('hand_loss'):.4f} "
              f"train-MPJPE={eval_result.hand_error_mean_mm:.1f} mm "
              f"t_err={eval_result.translation_error_mean_mm:.1f} mm")

    trainer.fit(on_epoch_end=on_epoch)
    return hist


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--only", choices=["gt", "floor", "overfit"], default=None)
    ap.add_argument("--augment", action="store_true",
                    help="overfit WITH the full 6-DoF + RandAugment stack "
                         "(structure-robustness probe, not a memorization one)")
    ap.add_argument("--frames", type=int, default=13)
    ap.add_argument("--image-size", type=int, default=128,
                    help="model input size for the overfit experiment")
    ap.add_argument("--oversample", type=int, default=20)
    ap.add_argument("--hand-weight", type=float, default=1.0,
                    help="hand-loss weight (reference default 1.0, train.py:67); "
                         "probe lever: the hand branch contributes <1% of the "
                         "total gradient at the run-C plateau, so shared "
                         "backbone features may never serve the thin skeleton")
    ap.add_argument("--backend", choices=["cpu", "default"], default="cpu",
                    help="default = whatever jax.default_backend() is (TPU "
                         "under axon); the overfit is ~100x faster there")
    args = ap.parse_args()

    import jax
    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from hmd_ego_pose_tpu.data.synthetic import generate_synthetic_colibri

    workdir = args.workdir or tempfile.mkdtemp(prefix="hand_diag_")
    root = os.path.join(workdir, "data")
    if not os.path.isdir(root):
        generate_synthetic_colibri(root, num_frames=args.frames, image_size=(256, 256))

    out = {}
    if args.only in (None, "gt"):
        out["gt_through_decode_mpjpe_mm"] = experiment_gt_through_decode(root)
    if args.only in (None, "floor"):
        out["label_floor_mm"] = experiment_label_floor(root)
    if args.only in (None, "overfit"):
        out["overfit"] = experiment_overfit(
            root, args.epochs, oversample=args.oversample,
            augment=args.augment, image_size=args.image_size,
            hand_weight=args.hand_weight,
        )
    path = os.path.join(workdir, "hand_diagnosis.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
