"""Multi-object (2-class) training demo/validation run.

Beyond the reference (its colibri generators are K=1): generates a 2-object
synthetic scene, trains with the K=2 in-step device augmentation + per-class
loss model points, and logs PER-CLASS eval metrics every --eval-every epochs.
Purpose: demonstrate the multi-class path LEARNS (both classes' pose errors
fall), not just composes — results recorded in TRAIN_SYNTHETIC.md.

CPU-friendly defaults (the demo also runs on the TPU when the relay is up):
    python scripts/train_multiobject.py --workdir /tmp/multi_demo --epochs 96

NOTE: the definitive K=2 validation vehicle is `train_long --num-objects 2`
(256 px, batch 16, cosine shifts, TPU) — this CPU demo's 128 px / 12-frame
regime under-trains rotation by construction (see TRAIN_SYNTHETIC.md
"Multi-object (K=2) training validation").
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--num-frames", type=int, default=20)
    ap.add_argument("--epochs", type=int, default=96)
    ap.add_argument("--eval-every", type=int, default=16)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        # persistent compile cache: a resume otherwise pays the full ~12-min
        # epoch-program recompile on this 1-core host.  CPU only — relay-TPU
        # sessions run cache-LOADED executables ~30x slower (BENCH_NOTES.md)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu_tests")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from hmd_ego_pose_tpu.config import (
        Config, DataConfig, EvalConfig, ModelConfig, TrainConfig,
    )
    from hmd_ego_pose_tpu.data.colibri import ColibriDataset
    from hmd_ego_pose_tpu.data.synthetic import generate_synthetic_colibri
    from hmd_ego_pose_tpu.train.trainer import Trainer
    from hmd_ego_pose_tpu.utils.logging import MetricLogger

    os.makedirs(args.workdir, exist_ok=True)
    root = os.path.join(args.workdir, "data")
    if not os.path.isdir(root):
        generate_synthetic_colibri(
            root, num_frames=args.num_frames, image_size=(256, 256), num_objects=2
        )
        print(f"generated 2-object {args.num_frames}-frame scene at {root}")

    cfg = Config(
        model=ModelConfig(phi=0, image_size=args.image_size, num_classes=2),
        train=TrainConfig(
            batch_size=args.batch_size, learning_rate=args.lr,
            epochs=args.epochs, eval_every=args.eval_every,
            checkpoint_dir=os.path.join(args.workdir, "ckpt"),
        ),
        data=DataConfig(
            dataset="syn_colibri", dataset_path=root, max_objects=2,
            # keep the K=2 6-DoF warp (the path under validation); drop the
            # color stack so the tiny dataset can learn in demo time
            use_colorspace_augmentation=False,
        ),
        eval=EvalConfig(score_threshold=0.1),
    )
    train_ds = ColibriDataset(root, fold=0, partition="train", object_ids=[1, 2])
    val_ds = ColibriDataset(root, fold=0, partition="val", object_ids=[1, 2])
    print(f"train {len(train_ds)} frames / val {len(val_ds)} frames, 2 classes")

    history = os.path.join(args.workdir, "history.jsonl")

    def on_epoch(epoch, metrics, eval_result=None):
        row = {"epoch": epoch, "t": time.time(), **metrics}
        with open(history, "a") as f:
            f.write(json.dumps(row) + "\n")

    params = bn_state = None
    epochs_done = 0
    last = os.path.join(cfg.train.checkpoint_dir, "last.npz")
    if os.path.isfile(last):
        from hmd_ego_pose_tpu.train.checkpoint import restore_checkpoint

        params, bn_state, meta = restore_checkpoint(last)
        epochs_done = int(meta.get("epoch", -1)) + 1
        print(f"restored {last} (epoch {meta.get('epoch')})")

    trainer = Trainer(
        cfg, train_ds, val_ds, params=params, bn_state=bn_state,
        logger=MetricLogger(log_dir=os.path.join(args.workdir, "runs")),
    )

    # wrap evaluate to also persist the per-class breakdown
    from hmd_ego_pose_tpu.eval import evaluator as eval_mod
    import hmd_ego_pose_tpu.train.trainer as trainer_mod

    orig_eval = eval_mod.evaluate_model

    def eval_with_per_class(*a, **k):
        result = orig_eval(*a, **k)
        if result.per_class:
            row = {
                "t": time.time(),
                "per_class": {
                    str(c): {
                        "mAP": r.mean_ap,
                        "t_mm": r.translation_error_mean_mm,
                        "r_deg": r.rotation_error_mean_deg,
                        "add": r.add_accuracy,
                        "adds": r.add_s_accuracy,
                        "mixed_pt_mm": r.mixed_point_distance_mean_mm,
                    }
                    for c, r in result.per_class.items()
                },
            }
            with open(os.path.join(args.workdir, "per_class.jsonl"), "a") as f:
                f.write(json.dumps(row) + "\n")
            print("per-class:", json.dumps(row["per_class"]))
        return result

    trainer_mod.evaluate_model = eval_with_per_class

    best = trainer.fit(epochs=args.epochs - epochs_done, on_epoch_end=on_epoch)
    print(f"best checkpoint: {best}")


if __name__ == "__main__":
    main()
