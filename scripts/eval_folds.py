"""5-fold cross-validation evaluation sweep.

The reference's headline numbers are per-fold evaluations aggregated by hand
into fig/results.PNG (README.md:140-170).  This sweep runs the metrics
engine over every fold that exists in a dataset (and a checkpoint per fold,
``--ckpt-pattern`` with ``{fold}``), and writes one markdown results table.

    python scripts/eval_folds.py --dataset-path ~/datasets/syn_colibri_v1 \
        --ckpt-pattern 'train_weights/syn_colibri__fold_{fold}*.npz' \
        --out RESULTS.md
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset-path", required=True)
    parser.add_argument("--ckpt-pattern", default=None,
                        help="glob with {fold}; latest match per fold is used; "
                             "random weights if omitted (smoke mode)")
    parser.add_argument("--folds", type=int, nargs="*", default=[0, 1, 2, 3, 4])
    parser.add_argument("--partition", default="test")
    parser.add_argument("--img-size", type=int, default=256)
    parser.add_argument("--phi", type=int, default=0)
    parser.add_argument("--score-threshold", type=float, default=0.5)
    parser.add_argument("--out", default="RESULTS.md")
    args = parser.parse_args(argv)

    import jax
    import numpy as np

    from hmd_ego_pose_tpu.config import Config, DataConfig, EvalConfig, ModelConfig
    from hmd_ego_pose_tpu.data.colibri import ColibriDataset
    from hmd_ego_pose_tpu.eval.evaluator import evaluate_model
    from hmd_ego_pose_tpu.models import hmd_ego_pose
    from hmd_ego_pose_tpu.train.checkpoint import restore_checkpoint
    from hmd_ego_pose_tpu.train.step import make_eval_forward

    cfg = Config(
        model=ModelConfig(phi=args.phi, image_size=args.img_size),
        data=DataConfig(dataset_path=args.dataset_path),
        eval=EvalConfig(score_threshold=args.score_threshold),
    )
    predict_fn = make_eval_forward(cfg, score_threshold=args.score_threshold)

    rows = []
    for fold in args.folds:
        try:
            ds = ColibriDataset(args.dataset_path, fold=fold, partition=args.partition)
        except FileNotFoundError:
            print(f"fold {fold}: split files missing, skipping")
            continue

        if args.ckpt_pattern:
            matches = sorted(glob.glob(args.ckpt_pattern.format(fold=fold)), key=os.path.getmtime)
            if not matches:
                print(f"fold {fold}: no checkpoint matches, skipping")
                continue
            params, bn_state, _ = restore_checkpoint(matches[-1])
        else:
            params, bn_state = hmd_ego_pose.init(0, cfg.model)

        result = evaluate_model(ds, predict_fn, params, bn_state, cfg)
        rows.append((fold, len(ds), result))
        print(f"fold {fold}: mAP {result.mean_ap:.3f}  ADD(-S) {result.mixed_add_and_add_s_accuracy:.3f}  "
              f"trans {result.translation_error_mean_mm:.1f}mm  rot {result.rotation_error_mean_deg:.1f}deg")

    if not rows:
        print("no folds evaluated")
        return

    lines = [
        "# Cross-validation results", "",
        f"dataset: {args.dataset_path} ({args.partition} partitions), phi={args.phi}, "
        f"score threshold {args.score_threshold}", "",
        "| fold | images | mAP | ADD | ADD-S | ADD(-S) | 5cm-5deg | 2D-proj | trans mm | rot deg | tip mm | hand mm |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    agg = {}
    for fold, n, r in rows:
        lines.append(
            f"| {fold} | {n} | {r.mean_ap:.3f} | {r.add_accuracy:.3f} | {r.add_s_accuracy:.3f} "
            f"| {r.mixed_add_and_add_s_accuracy:.3f} | {r.accuracy_5cm_5degree:.3f} "
            f"| {r.accuracy_2d_projection:.3f} | {r.translation_error_mean_mm:.1f}±{r.translation_error_std_mm:.1f} "
            f"| {r.rotation_error_mean_deg:.1f}±{r.rotation_error_std_deg:.1f} "
            f"| {r.tip_error_mean_mm:.1f}±{r.tip_error_std_mm:.1f} "
            f"| {r.hand_error_mean_mm:.1f}±{r.hand_error_std_mm:.1f} |"
        )
        for k, v in r.scalars().items():
            agg.setdefault(k, []).append(v)
    finite_mean = lambda vs: float(np.mean([v for v in vs if np.isfinite(v)]) if any(np.isfinite(v) for v in vs) else float("inf"))
    lines.append(
        f"| mean | - | {finite_mean(agg['mean_ap']):.3f} | {finite_mean(agg['add_accuracy']):.3f} "
        f"| {finite_mean(agg['add_s_accuracy']):.3f} | {finite_mean(agg['mixed_add_and_add_s_accuracy']):.3f} "
        f"| {finite_mean(agg['accuracy_5cm_5degree']):.3f} | {finite_mean(agg['accuracy_2d_projection']):.3f} "
        f"| {finite_mean(agg['translation_error_mean_mm']):.1f} | {finite_mean(agg['rotation_error_mean_deg']):.1f} "
        f"| {finite_mean(agg['tip_error_mean_mm']):.1f} | {finite_mean(agg['hand_error_mean_mm']):.1f} |"
    )
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
