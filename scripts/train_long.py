"""Long synthetic training run (VERDICT round-2 item 6), TPU, shift-based.

Trains phi-0 from scratch (optionally from a converted torch state_dict, to
exercise the checkpoint-conversion init path) on a >=500-frame synthetic
colibri dataset for tens of thousands of steps, and appends per-shift eval
metrics to <workdir>/history.jsonl + rewrites TRAIN_SYNTHETIC.md.

Why shifts: on this environment's relay-attached TPU, the FIRST
device->host read of a session permanently degrades program execution
~1000x (BENCH_NOTES.md).  Each SHIFT is a fresh process that restores the
checkpoint, trains `shift_epochs` fetch-free epochs (whole-epoch lax.scan,
TrainConfig.eval_every=shift_epochs), then pays the degrade once for the
final eval + checkpoint and exits.  The wrapper loop holds the plateau-LR
state across shifts.  On a directly-attached TPU the same script works with
a single shift.

Usage:
    python scripts/train_long.py --workdir /tmp/hmd_long \
        --total-epochs 96 --shift-epochs 32 --num-frames 500
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_shift(args):
    """One training shift (runs in its own process)."""
    from hmd_ego_pose_tpu.config import (
        Config, DataConfig, EvalConfig, LossConfig, ModelConfig, TrainConfig,
    )
    from hmd_ego_pose_tpu.data.colibri import ColibriDataset
    from hmd_ego_pose_tpu.train.checkpoint import restore_checkpoint, restore_opt_leaves
    from hmd_ego_pose_tpu.train.trainer import Trainer
    from hmd_ego_pose_tpu.utils.logging import MetricLogger

    ckpt_dir = os.path.join(args.workdir, "ckpt")
    k = args.num_objects
    # per-step wall scales ~ with pixel count; the relay worker crashes on
    # single executions that run too long (CLAUDE.md #7: 375 steps stable
    # at 187, died at 375 — phi-0/256), so shrink the dispatch chunk
    # quadratically with resolution unless explicitly overridden
    dispatch = args.max_steps_per_dispatch or max(20, 160 * 256 * 256 // (args.image_size ** 2))
    cfg = Config(
        model=ModelConfig(phi=args.phi, image_size=args.image_size,
                          compute_dtype="bfloat16",
                          remat_backbone=args.remat, num_classes=k,
                          hand_relative=args.hand_relative),
        train=TrainConfig(
            batch_size=args.batch_size,
            learning_rate=args.lr,
            epochs=args.shift_epochs,
            oversample=10,
            freeze_backbone=False,
            checkpoint_dir=ckpt_dir,
            eval_every=args.shift_epochs,
            clip_grad_norm=args.clip_grad_norm,
            max_steps_per_dispatch=dispatch,
            loss=LossConfig(hand_weight=args.hand_weight),
        ),
        data=DataConfig(dataset="syn_colibri", max_objects=k,
                        image_size=args.image_size,
                        use_colorspace_augmentation=not args.no_color_aug),
        eval=EvalConfig(score_threshold=0.1),
    )
    root = os.path.join(args.workdir, "data")
    object_ids = list(range(1, k + 1)) if k > 1 else None
    train_ds = ColibriDataset(root, fold=0, partition="train", object_ids=object_ids)
    val_ds = ColibriDataset(root, fold=0, partition="val", object_ids=object_ids)

    params = bn_state = opt_leaves = None
    start_step = 0
    last = os.path.join(ckpt_dir, "last.npz")
    sidecar = os.path.join(args.workdir, "epochs_done.json")
    epochs_done = 0
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            epochs_done = json.load(f)["epochs_done"]
    if os.path.exists(last):
        from hmd_ego_pose_tpu.train.checkpoint import meta_hand_relative

        params, bn_state, meta = restore_checkpoint(last)
        # resume the Adam moments too (older checkpoints lack them: leaves
        # None -> fresh moments, the previous behavior)
        opt_leaves = restore_opt_leaves(last)
        start_step = int(meta.get("train_step", 0))
        print(f"[shift] restored {last} (epoch {meta.get('epoch')}, "
              f"cumulative {epochs_done}, "
              f"opt_moments={'yes' if opt_leaves else 'no'}, step {start_step})")
        rec = meta_hand_relative(meta)
        if rec is not None and rec != cfg.model.hand_relative:
            print(f"[shift] WARNING: seed checkpoint hand_relative={rec} vs "
                  f"this run's {cfg.model.hand_relative}; the hand tower will "
                  f"relearn its output convention")
    elif args.torch_init:
        # exercise the torch-checkpoint init path: build the reference
        # architecture in torch, convert its state_dict, train from it
        params, bn_state = _torch_converted_init(cfg.model)
        print("[shift] initialized from a converted torch state_dict")

    results = {}
    target = args.target_epochs if args.target_epochs > 0 else epochs_done + args.shift_epochs

    if epochs_done >= target:
        # a killed-after-checkpoint retry: last.npz already reflects the
        # target epoch, so retraining would silently double the epochs
        # (mis-attributing metrics to the LR schedule).  Eval only.
        from hmd_ego_pose_tpu.eval.evaluator import evaluate_model

        print(f"[shift] epochs_done={epochs_done} >= target={target}; eval only")
        predict_fn = __import__(
            "hmd_ego_pose_tpu.train.step", fromlist=["make_eval_forward"]
        ).make_eval_forward(cfg)
        result = evaluate_model(val_ds, predict_fn, params, bn_state, cfg)
        results.update(train={}, eval=result.scalars(), skipped_training=True,
                       shift_seconds=0.0, epochs_done=epochs_done)
        if result.per_class:
            results["per_class"] = {
                str(c): r.scalars() for c, r in result.per_class.items()
            }
        results["steps_per_epoch"] = int(
            len(train_ds) * cfg.train.oversample // cfg.train.batch_size
        )
        with open(os.path.join(args.workdir, "shift_result.json"), "w") as f:
            json.dump(results, f)
        return

    def on_epoch(epoch, train_metrics, eval_result):
        results["train"] = train_metrics
        results["eval"] = eval_result.scalars()
        if eval_result.per_class:
            results["per_class"] = {
                str(c): r.scalars() for c, r in eval_result.per_class.items()
            }
        # cumulative-epoch sidecar, written right after Trainer saved
        # last.npz: a timeout-kill between checkpoint and sidecar has a
        # milliseconds window instead of the whole eval+exit tail
        results["epochs_done"] = epochs_done + epoch + 1
        with open(sidecar, "w") as f:
            json.dump({"epochs_done": results["epochs_done"]}, f)

    trainer = Trainer(
        cfg, train_ds, val_ds, params=params, bn_state=bn_state,
        opt_leaves=opt_leaves, start_step=start_step,
        logger=MetricLogger(log_dir=os.path.join(args.workdir, "runs")),
    )
    t0 = time.time()
    trainer.fit(epochs=target - epochs_done, on_epoch_end=on_epoch)
    results["shift_seconds"] = time.time() - t0
    results["steps_per_epoch"] = int(
        len(train_ds) * cfg.train.oversample // cfg.train.batch_size
    )
    with open(os.path.join(args.workdir, "shift_result.json"), "w") as f:
        json.dump(results, f)


def _torch_converted_init(model_cfg):
    """Torch default-init reference model -> converter -> jax params."""
    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
    import torch
    from torch_ref import TorchHMDEgoPose

    from hmd_ego_pose_tpu.models import hmd_ego_pose
    from hmd_ego_pose_tpu.models.weights import convert_torch_state_dict

    tm = TorchHMDEgoPose(model_cfg)
    # keep torch's own conv init; set the classifier header bias to the
    # focal prior so early training is stable (backbone.py:127-133 ends up
    # random there because the reference's strict load fails)
    with torch.no_grad():
        tm.classifier.header.pointwise_conv.conv.bias.fill_(-4.59511985013459)
    # host template: the converter reads/merges host-side (weights.py);
    # the Trainer's init_state bulk-uploads the merged tree
    params, bn_state = hmd_ego_pose.init_host(0, model_cfg)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, bn_state, report = convert_torch_state_dict(sd, params, bn_state, model_cfg)
    assert not report["missing"] and not report["unused"], report
    return params, bn_state


def _safekeep(workdir: str) -> None:
    """Copy the run's resume state into the tracked repo + git-commit it.

    VM resets wipe every untracked workdir (runs D and G died this way;
    run H had to reseed from an int8 artifact without Adam moments —
    VERDICT r4 weak #6).  Committing ckpt/last.npz (params + BN + Adam
    moments, verbatim — no quantization confound) at every shift boundary
    bounds a reset's cost to one shift.  Pruned (git rm) once the run's
    final artifact ships."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest = os.path.join(repo, "trained", "safekeep", os.path.basename(workdir))
    os.makedirs(dest, exist_ok=True)
    for rel in ("ckpt/last.npz", "ckpt/last.json", "epochs_done.json", "history.jsonl"):
        src = os.path.join(workdir, rel)
        if os.path.exists(src):
            shutil.copy2(src, os.path.join(dest, os.path.basename(rel)))
    try:
        subprocess.run(["git", "-C", repo, "add", "-f", dest], check=True)
        subprocess.run(
            ["git", "-C", repo, "commit", "-q", "-m",
             f"safekeep: {os.path.basename(workdir)} shift checkpoint (auto)"],
            check=True)
        print(f"[wrapper] safekeep committed -> {dest}")
    except subprocess.CalledProcessError as e:  # e.g. nothing changed
        print(f"[wrapper] safekeep commit skipped ({e})")


def _restore_from_safekeep(workdir: str) -> None:
    """Inverse of _safekeep: if the workdir lost its checkpoint to a VM
    reset but a safekeep copy exists, seed the workdir from it."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(repo, "trained", "safekeep", os.path.basename(workdir))
    if os.path.exists(os.path.join(workdir, "ckpt", "last.npz")):
        return
    if not os.path.exists(os.path.join(src, "last.npz")):
        return
    os.makedirs(os.path.join(workdir, "ckpt"), exist_ok=True)
    for name, rel in (("last.npz", "ckpt/last.npz"), ("last.json", "ckpt/last.json"),
                      ("epochs_done.json", "epochs_done.json"),
                      ("history.jsonl", "history.jsonl")):
        p = os.path.join(src, name)
        if os.path.exists(p):
            shutil.copy2(p, os.path.join(workdir, rel))
    print(f"[wrapper] restored workdir state from safekeep ({src})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--total-epochs", type=int, default=96)
    ap.add_argument("--shift-epochs", type=int, default=32)
    ap.add_argument("--num-frames", type=int, default=500)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--min-lr", type=float, default=1e-5)
    ap.add_argument("--schedule", choices=["cosine", "plateau"], default="cosine",
                    help="cosine: per-shift cosine decay over total-epochs "
                         "(deterministic, resumable; round-2's plateau never "
                         "fired because patience was denominated in shifts). "
                         "plateau: epoch-denominated ReduceLROnPlateau.")
    ap.add_argument("--target-epochs", type=int, default=0,
                    help="internal: cumulative epoch target for one shift")
    ap.add_argument("--torch-init", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint the MBConv blocks (trade recompute "
                         "for HBM bytes; the train step is memory-bound)")
    ap.add_argument("--hand-weight", type=float, default=1.0,
                    help="hand-loss weight (reference default 1.0, "
                         "train.py:67); recipe lever for hand-learning runs")
    ap.add_argument("--clip-grad-norm", type=float, default=0.0,
                    help="global-norm gradient clip (0 = off, reference "
                         "parity); recipe lever for rotation-loss "
                         "oscillation on small datasets")
    ap.add_argument("--no-color-aug", action="store_true",
                    help="disable the RandAugment color stack "
                         "(DataConfig.use_colorspace_augmentation=False, a "
                         "reference-parity flag); recipe lever: the color "
                         "stack destroys synthetic finger-hue identity in "
                         "~11%% of draws (finger purity probe), which shows "
                         "up as an orientation-flip tail in hand MPJPE")
    ap.add_argument("--hand-relative", action="store_true",
                    help="drill-anchored hand decode "
                         "(ModelConfig.hand_relative, beyond reference "
                         "parity); the seed checkpoint must have been "
                         "trained the same way or from scratch")
    ap.add_argument("--hand-render-version", type=int, default=3,
                    help="synthetic hand renderer version for dataset "
                         "generation (3 = round-4 grip-distance/arrows/"
                         "1-over-z-radii renderer, the version every "
                         "convergence run since run F uses; 2 = the "
                         "round-3 renderer).  ONLY affects a freshly "
                         "generated <workdir>/data; a pre-existing dataset "
                         "is used as-is.  (Round-5 fix: the wrapper "
                         "previously always generated v2, silently "
                         "mismatching v3-trained seed checkpoints.)")
    ap.add_argument("--phi", type=int, default=0,
                    help="EfficientPose scaling coefficient (per-phi "
                         "architecture tables, config.py; reference "
                         "backbone.py:15-43)")
    ap.add_argument("--image-size", type=int, default=256,
                    help="square input resolution (model + data); pair "
                         "with --render-scale for matched-scene "
                         "higher-resolution synthetic datasets")
    ap.add_argument("--render-scale", type=int, default=1,
                    help="synthetic-renderer scale s: image-size 256*s "
                         "renders the SAME seed-0 scenes at s-x resolution "
                         "(focal, splat radii, sample densities all scale; "
                         "rng sequence preserved) — the controlled "
                         "experiment for the 256-px hand-floor hypothesis")
    ap.add_argument("--max-steps-per-dispatch", type=int, default=0,
                    help="override TrainConfig.max_steps_per_dispatch "
                         "(0 = auto: 160 at 256 px, scaled down "
                         "quadratically with resolution — the relay worker "
                         "crashes on over-long single executions)")
    ap.add_argument("--seed-ckpt", default="",
                    help="checkpoint npz copied to <workdir>/ckpt/last.npz "
                         "(with its .json sidecar if present) when the "
                         "workdir has no checkpoint yet: fine-tune legs "
                         "seed from a committed artifact without manual "
                         "copying")
    ap.add_argument("--num-objects", type=int, default=1,
                    help="K-object synthetic scene (beyond the reference's "
                         "K=1 colibri): num_classes=K model, per-class eval "
                         "breakdown appended to history.jsonl")
    ap.add_argument("--shift-timeout", type=float, default=3600.0,
                    help="kill + retry a shift after this many seconds "
                         "(relay sessions can wedge on a lost RPC)")
    ap.add_argument("--start-shift", type=int, default=0,
                    help="resume the wrapper loop at this shift index "
                         "(training state itself resumes from ckpt/last.npz)")
    ap.add_argument("--no-safekeep", action="store_true",
                    help="skip committing shift checkpoints into the tracked "
                         "repo (default on: VM resets wipe untracked workdirs)")
    ap.add_argument("--_shift", action="store_true", help="internal: run one shift")
    args = ap.parse_args()

    if args._shift:
        run_shift(args)
        return

    os.makedirs(args.workdir, exist_ok=True)
    if not args.no_safekeep:
        _restore_from_safekeep(args.workdir)
    if args.seed_ckpt:
        last = os.path.join(args.workdir, "ckpt", "last.npz")
        if os.path.exists(last):
            print(f"[wrapper] --seed-ckpt ignored: {last} already exists")
        else:
            os.makedirs(os.path.dirname(last), exist_ok=True)
            shutil.copy2(args.seed_ckpt, last)
            sidecar = os.path.splitext(args.seed_ckpt)[0] + ".json"
            if os.path.exists(sidecar):
                shutil.copy2(sidecar, os.path.join(args.workdir, "ckpt", "last.json"))
            print(f"[wrapper] seeded {last} from {args.seed_ckpt}")
    root = os.path.join(args.workdir, "data")
    if not os.path.isdir(root):
        from hmd_ego_pose_tpu.data.synthetic import generate_synthetic_colibri

        # base geometry: the real colibri camera (camera_params.txt
        # px=py=128 -> 256-px frames); --render-scale renders the same
        # seed-0 scenes at s-x resolution with focal scaled to match
        size = (args.image_size, args.image_size)
        generate_synthetic_colibri(root, num_frames=args.num_frames,
                                   image_size=size,
                                   num_objects=args.num_objects,
                                   hand_render_version=args.hand_render_version,
                                   render_scale=args.render_scale)
        print(f"generated {args.num_frames}-frame "
              f"{args.num_objects}-object {size[0]}px "
              f"v{args.hand_render_version} synthetic dataset at {root}")

    from hmd_ego_pose_tpu.train.plateau import ReduceLROnPlateau

    sched = ReduceLROnPlateau(args.lr, factor=0.5, patience=15, min_lr=args.min_lr)

    def cosine_lr(epochs_done: int) -> float:
        # half-cosine from lr to min-lr over the whole run, stepped per shift
        t = min(1.0, epochs_done / max(1, args.total_epochs))
        return args.min_lr + 0.5 * (args.lr - args.min_lr) * (1.0 + np.cos(np.pi * t))

    history_path = os.path.join(args.workdir, "history.jsonl")
    lr = args.lr if args.schedule == "plateau" else cosine_lr(args.start_shift * args.shift_epochs)
    shifts = (args.total_epochs + args.shift_epochs - 1) // args.shift_epochs
    for shift in range(args.start_shift, shifts):
        cmd = [
            sys.executable, os.path.abspath(__file__), "--_shift",
            "--workdir", args.workdir,
            "--shift-epochs", str(args.shift_epochs),
            "--target-epochs", str((shift + 1) * args.shift_epochs),
            "--batch-size", str(args.batch_size),
            "--lr", str(lr),
            "--hand-weight", str(args.hand_weight),
            "--num-objects", str(args.num_objects),
            "--clip-grad-norm", str(args.clip_grad_norm),
            "--phi", str(args.phi),
            "--image-size", str(args.image_size),
            "--max-steps-per-dispatch", str(args.max_steps_per_dispatch),
        ]
        if args.remat:
            cmd.append("--remat")
        if args.no_color_aug:
            cmd.append("--no-color-aug")
        if args.hand_relative:
            cmd.append("--hand-relative")
        if args.torch_init and shift == 0:
            cmd.append("--torch-init")
        print(f"[wrapper] shift {shift + 1}/{shifts} (lr={lr:.2e})")
        t0 = time.time()
        # relay sessions can wedge forever on a lost RPC (observed once in
        # ~5 shifts: futex-blocked main thread, relay fine from new
        # sessions); bound each shift and retry once from last.npz
        for attempt in range(2):
            try:
                proc = subprocess.run(cmd, timeout=args.shift_timeout)
            except subprocess.TimeoutExpired:
                print(f"[wrapper] shift {shift + 1} timed out after "
                      f"{args.shift_timeout:.0f}s (attempt {attempt + 1}); killed")
                continue
            if proc.returncode == 0:
                break
            print(f"[wrapper] shift {shift + 1} rc={proc.returncode} "
                  f"(attempt {attempt + 1})")
        else:
            raise RuntimeError(f"shift {shift} failed twice")
        with open(os.path.join(args.workdir, "shift_result.json")) as f:
            res = json.load(f)
        res["shift"] = shift
        # actual cumulative epochs from the child's sidecar (a retried shift
        # must not mis-attribute extra epochs to this LR step)
        res.setdefault("epochs_done", (shift + 1) * args.shift_epochs)
        res["steps_done"] = res["epochs_done"] * res["steps_per_epoch"]
        res["lr"] = lr
        res["wall_seconds"] = time.time() - t0
        with open(history_path, "a") as f:
            f.write(json.dumps(res) + "\n")
        ev = res["eval"]
        # standard error of the val means (VERDICT r4 weak #3: sub-se deltas
        # must not read as progress); num_matched is the TP count behind the
        # distance means (eval/evaluator.py)
        n = max(1, int(ev.get("num_matched", 0)))
        se = lambda key: ev.get(key, 0.0) / (n ** 0.5)
        print(
            f"[wrapper] shift {shift + 1}: steps={res['steps_done']} "
            f"mAP={ev['mean_ap']:.3f} "
            f"t_err={ev['translation_error_mean_mm']:.1f}±{se('translation_error_std_mm'):.1f}mm "
            f"r_err={ev['rotation_error_mean_deg']:.1f}±{se('rotation_error_std_deg'):.2f}deg "
            f"hand={ev['hand_error_mean_mm']:.1f}±{se('hand_error_std_mm'):.1f}mm "
            f"ADD={ev['add_accuracy']:.3f} (n={n}, {res['wall_seconds']:.0f}s)"
        )
        if not args.no_safekeep:
            _safekeep(args.workdir)
        if args.schedule == "plateau":
            # patience is denominated in EPOCHS (train/plateau.py); one
            # shift-level eval burns shift_epochs of it
            lr = sched.step(ev["mixed_point_distance_mean_mm"], n_epochs=args.shift_epochs)
        else:
            lr = cosine_lr(res["epochs_done"])
    print(f"[wrapper] done; history at {history_path}")


if __name__ == "__main__":
    main()
