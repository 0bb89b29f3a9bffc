"""End-to-end training validation on the synthetic dataset (runs on TPU).

Generates a synthetic colibri dataset, trains phi-0 for a few epochs, and
reports eval metrics before/after — demonstrating that the full pipeline
(host aug -> device targets/losses -> optimizer -> checkpoints -> metrics)
learns.  Writes TRAIN_SYNTHETIC.md with the outcome.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(num_frames=96, epochs=25, batch_size=8, image_size=256):
    import jax

    # NOTE: do NOT enable the persistent compilation cache here — on the
    # axon remote-compile tunnel, cache-loaded large executables execute ~30x
    # slower than freshly compiled (server-resident) ones.

    from hmd_ego_pose_tpu.config import Config, DataConfig, EvalConfig, ModelConfig, TrainConfig
    from hmd_ego_pose_tpu.data.colibri import ColibriDataset
    from hmd_ego_pose_tpu.data.synthetic import generate_synthetic_colibri
    from hmd_ego_pose_tpu.train.trainer import Trainer
    from hmd_ego_pose_tpu.utils.logging import MetricLogger

    workdir = tempfile.mkdtemp(prefix="hmd_syn_")
    # 256x256 frames: image_scale = 1, the geometry the real colibri data has
    # (camera_params.txt px=py=128 -> 256-px frames)
    root = generate_synthetic_colibri(
        os.path.join(workdir, "data"), num_frames=num_frames, image_size=(256, 256)
    )
    cfg = Config(
        model=ModelConfig(phi=0, image_size=image_size),
        train=TrainConfig(
            batch_size=batch_size, learning_rate=5e-4, epochs=epochs, oversample=10,
            freeze_backbone=False, checkpoint_dir=os.path.join(workdir, "ckpt"),
        ),
        data=DataConfig(dataset="syn_colibri", num_workers=8),
        eval=EvalConfig(score_threshold=0.1),
    )
    train_ds = ColibriDataset(root, fold=0, partition="train")
    val_ds = ColibriDataset(root, fold=0, partition="val")
    print(f"train {len(train_ds)} frames, val {len(val_ds)} frames")

    trainer = Trainer(cfg, train_ds, val_ds, logger=MetricLogger(log_dir=os.path.join(workdir, "runs")))

    before = trainer.validate()
    t0 = time.time()
    history = []

    def on_epoch(epoch, train_metrics, result):
        history.append((epoch, train_metrics["loss"], result.mean_ap,
                        result.mixed_point_distance_mean_mm, result.translation_error_mean_mm,
                        result.rotation_error_mean_deg))

    trainer.fit(on_epoch_end=on_epoch)
    wall = time.time() - t0
    after = trainer.validate()

    lines = [
        "# Synthetic-dataset training validation (TPU)", "",
        f"- {len(train_ds)} train frames, {epochs} epochs x10 oversample, batch {batch_size}, {wall:.0f}s wall",
        f"- mean AP:                  {before.mean_ap:.3f} -> {after.mean_ap:.3f}",
        f"- ADD accuracy:             {before.add_accuracy:.3f} -> {after.add_accuracy:.3f}",
        f"- mixed point distance mm:  {before.mixed_point_distance_mean_mm:.1f} -> {after.mixed_point_distance_mean_mm:.1f}",
        f"- translation error mm:     {before.translation_error_mean_mm:.1f} -> {after.translation_error_mean_mm:.1f}",
        f"- rotation error deg:       {before.rotation_error_mean_deg:.1f} -> {after.rotation_error_mean_deg:.1f}",
        f"- hand MPJPE mm:            {before.hand_error_mean_mm:.1f} -> {after.hand_error_mean_mm:.1f}",
        "",
        "| epoch | train loss | val mAP | mixed pt dist mm | trans mm | rot deg |",
        "|---|---|---|---|---|---|",
    ]
    for e, loss, ap, pd, te, re in history:
        lines.append(f"| {e} | {loss:.1f} | {ap:.3f} | {pd:.1f} | {te:.1f} | {re:.1f} |")
    out = "\n".join(lines)
    with open("TRAIN_SYNTHETIC.md", "w") as f:
        f.write(out + "\n")
    print(out)


if __name__ == "__main__":
    main()
