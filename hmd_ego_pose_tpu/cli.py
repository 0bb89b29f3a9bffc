"""Command-line interface.

Replaces the reference's four entry scripts — main.py (train), evaluate.py,
debug.py (dataset viewer), scratchpad.py (export sanity) — with one CLI:

    python -m hmd_ego_pose_tpu.cli train --dataset-path ... --fold 0
    python -m hmd_ego_pose_tpu.cli evaluate --ckpt ... --partition test
    python -m hmd_ego_pose_tpu.cli serve --ckpt ... --port 18734
    python -m hmd_ego_pose_tpu.cli debug --dataset-path ... --out-dir viz/
    python -m hmd_ego_pose_tpu.cli export --ckpt ... --out-dir artifacts/
    python -m hmd_ego_pose_tpu.cli make-synthetic --out-dir /tmp/syn

Flag names/defaults follow the reference argparse surface
(pytorch-sandbox/main.py:28-44, evaluate.py:23-34).
"""

from __future__ import annotations

import argparse
import json
import os


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--dataset", default="syn_colibri", choices=["syn_colibri", "real_colibri"])
    p.add_argument("--dataset-path", required=True, help="root with data/ and models/")
    p.add_argument("--fold", type=int, default=0, help="cross-validation fold [0..4]")
    p.add_argument("--object-id", type=int, default=1)
    p.add_argument(
        "--object-ids", default=None,
        help="comma-separated ids of a multi-object scene (beyond the "
             "reference's K=1 colibri); sets num_classes/max_objects and "
             "reads all objects from the first id's scene dir",
    )
    p.add_argument("--iter", type=int, default=0, help="iterative refinement steps")
    p.add_argument("--hand-relative", action="store_true",
                   help="drill-anchored hand decode (beyond reference "
                        "parity): the hand head regresses joint offsets "
                        "from the object translation; predict() re-anchors "
                        "on the predicted translation "
                        "(ModelConfig.hand_relative). A checkpoint trained "
                        "one way must be evaluated the same way.")
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--phi", type=int, default=0, help="EfficientDet compound coefficient")
    p.add_argument("--batch-size", type=int, default=16)


def _object_ids(args):
    ids = getattr(args, "object_ids", None)
    if ids is None:
        return None
    return [int(x) for x in str(ids).split(",") if x.strip()]


def _resolve_hand_relative(args, metadata) -> bool:
    """Default the hand-decode convention from checkpoint metadata; hard-error
    on explicit contradiction (VERDICT r4 weak #4: restoring a hand_relative
    artifact without the flag used to decode hands silently wrong)."""
    from hmd_ego_pose_tpu.train.checkpoint import meta_hand_relative

    recorded = meta_hand_relative(metadata)
    flag = bool(getattr(args, "hand_relative", False))
    if recorded is None:
        return flag
    if flag and not recorded:
        raise SystemExit(
            "--hand-relative was passed, but the checkpoint's metadata records "
            "hand_relative=False: it was trained with the ABSOLUTE hand decode "
            "and re-anchoring its output would be silently wrong. Drop the flag "
            "(or retrain with --hand-relative)."
        )
    if recorded and not flag:
        print("[cli] checkpoint metadata records hand_relative=True -> "
              "enabling the drill-anchored hand decode (no --hand-relative "
              "flag needed for artifacts with metadata)")
    args.hand_relative = recorded
    return recorded


def _make_config(args, **train_overrides):
    from hmd_ego_pose_tpu.config import Config, DataConfig, ModelConfig, TrainConfig

    ids = _object_ids(args)
    k = len(ids) if ids else 1
    return Config(
        model=ModelConfig(phi=args.phi, image_size=args.img_size,
                          iter_steps=args.iter, num_classes=k,
                          hand_relative=getattr(args, "hand_relative", False)),
        train=TrainConfig(batch_size=args.batch_size, **train_overrides),
        data=DataConfig(
            dataset=args.dataset, dataset_path=args.dataset_path,
            fold=args.fold, object_id=ids[0] if ids else args.object_id,
            image_size=args.img_size, max_objects=k,
        ),
    )


def cmd_train(args):
    import jax

    from hmd_ego_pose_tpu.config import TrainConfig
    from hmd_ego_pose_tpu.data.colibri import ColibriDataset
    from hmd_ego_pose_tpu.models import hmd_ego_pose
    from hmd_ego_pose_tpu.models.weights import convert_torch_state_dict
    from hmd_ego_pose_tpu.parallel.mesh import make_mesh
    from hmd_ego_pose_tpu.train.checkpoint import restore_checkpoint
    from hmd_ego_pose_tpu.train.trainer import Trainer

    cfg = _make_config(
        args,
        learning_rate=args.lr,
        epochs=args.epo,
        fine_tune=args.fine_tune,
        freeze_backbone=args.freeze_backbone,
        eval_every=args.eval_every,
        clip_grad_norm=args.clip_grad_norm,
    )
    ids = _object_ids(args)
    train_ds = ColibriDataset(args.dataset_path, args.fold, args.object_id,
                              "train", object_ids=ids)
    val_ds = ColibriDataset(args.dataset_path, args.fold, args.object_id,
                            "val", object_ids=ids)

    from hmd_ego_pose_tpu.utils.model_stats import format_model_stats

    print(format_model_stats(cfg.model, batch_size=1))

    params = bn_state = opt_leaves = None
    start_step = 0
    if args.ckpt:
        from hmd_ego_pose_tpu.train.checkpoint import restore_opt_leaves

        params, bn_state, meta = restore_checkpoint(args.ckpt)
        opt_leaves = restore_opt_leaves(args.ckpt)
        start_step = int(meta.get("train_step", 0))
        print(f"restored checkpoint {args.ckpt}: {meta.get('metric')}"
              f" (opt moments: {'yes' if opt_leaves else 'no'})")
        from hmd_ego_pose_tpu.train.checkpoint import meta_hand_relative

        rec = meta_hand_relative(meta)
        if rec is not None and rec != cfg.model.hand_relative:
            # warn, don't error: changing the convention mid-training is a
            # legitimate recipe (the hand tower relearns its output space)
            print(f"WARNING: seed checkpoint was trained with "
                  f"hand_relative={rec}, this run uses "
                  f"{cfg.model.hand_relative} — the hand tower will relearn "
                  f"its output convention")

    mesh = make_mesh() if len(jax.devices()) > 1 else None
    trainer = Trainer(cfg, train_ds, val_ds, mesh=mesh, params=params,
                      bn_state=bn_state, opt_leaves=opt_leaves, start_step=start_step)
    best = trainer.fit()
    print(f"best checkpoint: {best}")


def cmd_evaluate(args):
    from hmd_ego_pose_tpu.data.colibri import ColibriDataset
    from hmd_ego_pose_tpu.models import hmd_ego_pose
    from hmd_ego_pose_tpu.eval.evaluator import evaluate_model, format_report
    from hmd_ego_pose_tpu.train.checkpoint import restore_checkpoint
    from hmd_ego_pose_tpu.train.step import make_eval_forward

    ds = ColibriDataset(args.dataset_path, args.fold, args.object_id,
                        args.partition, object_ids=_object_ids(args))
    params, bn_state, meta = restore_checkpoint(args.ckpt)
    _resolve_hand_relative(args, meta)
    cfg = _make_config(args)
    predict_fn = make_eval_forward(cfg, score_threshold=args.score_threshold)
    result = evaluate_model(
        ds, predict_fn, params, bn_state, cfg, save_path=args.save_images_path
    )
    if result.per_class and len(result.per_class) > 1:
        for c, r in sorted(result.per_class.items()):
            name = ds.class_to_name.get(c, str(c))
            print(f"--- class {c} ({name}) ---")
            print(format_report(r))
        print("--- class mean ---")
    print(format_report(result))
    print(json.dumps(result.scalars(), indent=2))


def cmd_serve(args):
    import jax

    from hmd_ego_pose_tpu.config import ModelConfig, ServingConfig
    from hmd_ego_pose_tpu.models import hmd_ego_pose
    from hmd_ego_pose_tpu.serving.engine import InferenceEngine
    from hmd_ego_pose_tpu.serving.server import PoseServer
    from hmd_ego_pose_tpu.train.checkpoint import restore_checkpoint

    if args.ckpt:
        params, bn_state, meta = restore_checkpoint(args.ckpt)
        _resolve_hand_relative(args, meta)
    model_cfg = ModelConfig(phi=args.phi, image_size=args.img_size, compute_dtype="bfloat16",
                            hand_relative=getattr(args, "hand_relative", False))
    if not args.ckpt:
        print("WARNING: serving randomly initialized weights (no --ckpt)")
        # host tree: keeps the engine's const-closure AOT fast path open
        # (device-resident trees force the arg-passing executables; closing
        # device leaves over a jit is the relay degrade trigger)
        params, bn_state = hmd_ego_pose.init_host(0, model_cfg)

    default_camera = None
    if args.camera_params:
        # [fx fy px py tz_scale image_scale] — the reference's
        # onnx-models/camera_params*.txt layout
        import numpy as np

        default_camera = np.loadtxt(args.camera_params).reshape(-1)[:6]

    engine = InferenceEngine(
        params, bn_state, model_cfg,
        ServingConfig(max_batch_size=args.max_batch_size, score_threshold=args.score_threshold),
        frame_shape=(args.frame_size, args.frame_size),
        default_camera=default_camera,
    )
    engine.warmup()
    server = PoseServer(engine, host=args.host, port=args.port)
    server.start()
    print(f"pose server listening on {server.address}")

    responder = None
    if args.signaling_url:
        # register with a node-dss signaling service: answer HMD offers with
        # this server's endpoint (NodeDssSignaler.cs bootstrap flow)
        from hmd_ego_pose_tpu.serving.signaling_client import (
            NodeDssSignalerClient, PoseEndpointResponder,
        )

        signaler = NodeDssSignalerClient(
            args.signaling_url, args.local_peer_id, args.remote_peer_id
        )
        host, port = server.address
        if args.advertise_host:
            host = args.advertise_host
        elif host in ("0.0.0.0", "::"):
            host = "127.0.0.1"  # wildcard bind is not dialable; override for LAN
        responder = PoseEndpointResponder(signaler, host, port)
        responder.start()
        print(f"answering offers for '{args.local_peer_id}' at {args.signaling_url}")
    try:
        import time

        while True:
            time.sleep(30)
            print(json.dumps(engine.stats()))
    except KeyboardInterrupt:
        if responder is not None:
            responder.stop()
        server.stop()


def cmd_debug(args):
    """Render GT overlays for dataset sanity checking (reference debug.py)."""
    from hmd_ego_pose_tpu.data.colibri import ColibriDataset
    from hmd_ego_pose_tpu.data.image import imwrite
    from hmd_ego_pose_tpu.utils.visualization import render_frame

    ds = ColibriDataset(args.dataset_path, args.fold, args.object_id,
                        args.partition, object_ids=_object_ids(args))
    os.makedirs(args.out_dir, exist_ok=True)
    n = min(len(ds), args.num_images)
    for i in range(n):
        image = ds.load_image(i)
        anno = ds.load_annotations(i)
        cam = ds.load_camera_matrix(i)
        out = image
        for r in range(anno["labels"].shape[0]):  # every object of the frame
            out = render_frame(
                out, cam,
                model_info=ds.models_info[int(anno["labels"][r])],
                gt_pose=(anno["rotations"][r, :3], anno["translations"][r]),
                gt_box=anno["bboxes"][r],
                hand_3d=anno["coords_3d"][r] if r == 0 else None,
            )
        imwrite(os.path.join(args.out_dir, f"debug_{i:06d}.png"), out)
    print(f"wrote {n} overlays to {args.out_dir}")


def cmd_export(args):
    import jax

    from hmd_ego_pose_tpu.config import ModelConfig
    from hmd_ego_pose_tpu.export.stablehlo import export_inference, load_and_verify
    from hmd_ego_pose_tpu.models import hmd_ego_pose
    from hmd_ego_pose_tpu.train.checkpoint import restore_checkpoint

    if args.ckpt:
        params, bn_state, meta = restore_checkpoint(args.ckpt)
        _resolve_hand_relative(args, meta)
    cfg = ModelConfig(phi=args.phi, image_size=args.img_size,
                      hand_relative=getattr(args, "hand_relative", False))
    if not args.ckpt:
        params, bn_state = hmd_ego_pose.init(0, cfg)
    out = export_inference(params, bn_state, cfg, args.out_dir)
    load_and_verify(args.out_dir)
    print(f"exported + verified StableHLO artifact in {out}")

    if args.quantize_int8:
        # distribution artifact: int8 weight checkpoint (~4x smaller),
        # restored transparently by restore_checkpoint
        from hmd_ego_pose_tpu.train.checkpoint import save_checkpoint

        fp32_path = save_checkpoint(args.out_dir, "weights_fp32", params, bn_state)
        int8_path = save_checkpoint(args.out_dir, "weights_int8", params, bn_state,
                                    backend="int8")
        fp32_mb = os.path.getsize(fp32_path) / 1e6
        int8_mb = os.path.getsize(int8_path) / 1e6
        print(f"int8 checkpoint: {int8_mb:.1f} MB vs fp32 {fp32_mb:.1f} MB "
              f"({fp32_mb / int8_mb:.2f}x smaller)")


def cmd_parity(args):
    """Convert a reference torch checkpoint and dump raw head outputs +
    per-layer activation stats on a given input — the per-layer diffing
    harness for checkpoint parity (replaces the reference's scratchpad.py
    manual comparison flow)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from hmd_ego_pose_tpu.config import ModelConfig
    from hmd_ego_pose_tpu.models import hmd_ego_pose
    from hmd_ego_pose_tpu.models.weights import convert_torch_state_dict

    cfg = ModelConfig(phi=args.phi, image_size=args.img_size)
    # host template: the converter reads/merges it host-side (weights.py)
    params, bn_state = hmd_ego_pose.init_host(0, cfg)

    if args.torch_ckpt:
        import torch

        sd = torch.load(args.torch_ckpt, map_location="cpu")
        sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
        params, bn_state, report = convert_torch_state_dict(sd, params, bn_state, cfg, strict=not args.lenient)
        print(f"converted: {len(report['missing'])} missing, {len(report['unused'])} unused keys")
    from hmd_ego_pose_tpu.utils.device import to_default_device

    params, bn_state = to_default_device((params, bn_state))

    if args.input:
        x = np.load(args.input)
        if x.ndim == 4 and x.shape[1] == 3:  # NCHW (the reference's input.npy) -> NHWC
            x = x.transpose(0, 2, 3, 1)
    else:
        x = np.random.RandomState(0).uniform(-1, 1, size=(1, args.img_size, args.img_size, 3)).astype(np.float32)

    capture = {}
    out, _ = hmd_ego_pose.apply(params, bn_state, jnp.asarray(x), cfg, capture=capture)
    print("\nper-layer activation stats (mean / std / absmax):")
    for name in sorted(capture):
        a = np.asarray(capture[name])
        print(f"  {name:24s} {a.mean():+.6f} {a.std():.6f} {np.abs(a).max():.6f}")
    print("\nraw head outputs (first anchor row), cf. scratchpad.py:78-87:")
    for field in ("regression", "classification", "rotation", "translation_raw", "hand"):
        a = np.asarray(getattr(out, field))
        print(f"  {field:16s} {a[0, 0, :6]}")


def cmd_make_synthetic(args):
    from hmd_ego_pose_tpu.data.synthetic import generate_synthetic_colibri

    path = generate_synthetic_colibri(
        args.out_dir, num_frames=args.num_frames,
        image_size=(args.frame_size, args.frame_size),
        num_objects=args.num_objects,
        hand_render_version=args.hand_render_version,
        render_scale=args.render_scale,
    )
    print(f"synthetic colibri dataset at {path}")


def cmd_format_labels(args):
    """Reference format-labels/pkl_to_formatted_txt.py workflow."""
    import glob

    from hmd_ego_pose_tpu.data.format_labels import convert_pickles

    paths = sorted(glob.glob(os.path.join(args.in_dir, "*.pkl")) +
                   glob.glob(os.path.join(args.in_dir, "*.pickle")))
    if not paths:
        raise SystemExit(f"no .pkl/.pickle files under {args.in_dir}")
    out = convert_pickles(paths, args.out_dir, object_id=args.object_id,
                          fold=args.fold)
    print(f"{len(paths)} frames -> LINEMOD layout at {out}")


def main(argv=None):
    # honor JAX_PLATFORMS even when a sitecustomize preimported jax and
    # already consumed the env var (the backend initializes lazily, so a
    # config update before the first device query still wins)
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass

    parser = argparse.ArgumentParser(prog="hmd_ego_pose_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("train", help="train a model (reference main.py)")
    _add_common(p)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--epo", type=int, default=50)
    p.add_argument("--fine-tune", action="store_true", help="SGD+Nesterov instead of Adam")
    p.add_argument("--eval-every", type=int, default=1,
                   help="validate/checkpoint every N epochs (relay-attached TPUs: see BENCH_NOTES.md)")
    p.add_argument("--freeze-backbone", action="store_true", default=True)
    p.add_argument("--no-freeze-backbone", dest="freeze_backbone", action="store_false")
    p.add_argument("--clip-grad-norm", type=float, default=0.0,
                   help="global-norm gradient clip before the optimizer "
                        "(0 = off, the reference default: its clip_grad_norm_ "
                        "is commented out, train.py:210)")
    p.add_argument("--ckpt", default=None)
    p.set_defaults(func=cmd_train)

    p = sub.add_parser("evaluate", help="evaluate a checkpoint (reference evaluate.py)")
    _add_common(p)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--partition", default="test", choices=["train", "val", "test"])
    p.add_argument("--score-threshold", type=float, default=0.5)
    p.add_argument("--save-images-path", default=None,
                   help="write detection overlays + samplevis panels here")
    p.set_defaults(func=cmd_evaluate)

    p = sub.add_parser("serve", help="pose-streaming server (reference WebRTC sandbox)")
    p.add_argument("--signaling-url", default=None,
                   help="node-dss signaling service to register with (e.g. http://host:3000/)")
    p.add_argument("--local-peer-id", default="workstation")
    p.add_argument("--remote-peer-id", default="hmd")
    p.add_argument("--advertise-host", default=None,
                   help="endpoint host to advertise in signaling answers (default: bind host)")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--phi", type=int, default=0)
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--frame-size", type=int, default=480)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=18734)
    p.add_argument("--max-batch-size", type=int, default=16)
    p.add_argument("--score-threshold", type=float, default=0.5)
    p.add_argument("--camera-params", default=None,
                   help="txt file of [fx fy px py tz_scale image_scale] (reference camera_params*.txt layout)")
    p.add_argument("--hand-relative", action="store_true",
                   help="the checkpoint was trained with ModelConfig.hand_relative")
    p.set_defaults(func=cmd_serve)

    p = sub.add_parser("debug", help="dataset/annotation viewer (reference debug.py)")
    _add_common(p)
    p.add_argument("--partition", default="train")
    p.add_argument("--out-dir", default="debug_viz")
    p.add_argument("--num-images", type=int, default=10)
    p.set_defaults(func=cmd_debug)

    p = sub.add_parser("export", help="StableHLO export + verify (reference ONNX export)")
    p.add_argument("--quantize-int8", action="store_true",
                   help="also write an int8-quantized weight checkpoint for distribution")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--phi", type=int, default=0)
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--out-dir", default="artifacts")
    p.add_argument("--hand-relative", action="store_true",
                   help="the checkpoint was trained with ModelConfig.hand_relative")
    p.set_defaults(func=cmd_export)

    p = sub.add_parser("parity", help="torch-checkpoint conversion + activation diffing harness")
    p.add_argument("--torch-ckpt", default=None, help="reference .pth state_dict")
    p.add_argument("--input", default=None, help=".npy input (NCHW or NHWC), e.g. onnx-models/input.npy")
    p.add_argument("--phi", type=int, default=0)
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--lenient", action="store_true", help="tolerate missing/extra keys")
    p.set_defaults(func=cmd_parity)

    p = sub.add_parser("format-labels",
                       help="pickle dumps -> LINEMOD dataset (reference format-labels/)")
    p.add_argument("--in-dir", required=True, help="directory of per-frame .pkl files")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--object-id", type=int, default=1)
    p.add_argument("--fold", type=int, default=0)
    p.set_defaults(func=cmd_format_labels)

    p = sub.add_parser("make-synthetic", help="generate a synthetic colibri dataset")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--num-frames", type=int, default=50)
    p.add_argument("--frame-size", type=int, default=480)
    p.add_argument("--num-objects", type=int, default=1,
                   help=">1 writes a multi-object scene (per-object mask "
                        "values + mask_values.yml; train with --object-ids)")
    p.add_argument("--hand-render-version", type=int, default=2, choices=(2, 3),
                   help="3 = round-4 hand cues: grip-distance placement, "
                        "1/z joint radii, palm-orientation arrows "
                        "(TRAIN_SYNTHETIC.md run-G).  Default 2 keeps "
                        "existing seed-0 datasets bit-identical; every "
                        "convergence run since run F (and the shipped "
                        "576ep artifact) uses 3 — scripts/train_long.py "
                        "defaults to 3")
    p.add_argument("--render-scale", type=int, default=1,
                   help="integer scale s: pass --frame-size 256*s to render "
                        "the SAME seed scenes at s-x resolution (focal and "
                        "all pixel-denominated constants scale; rng "
                        "sequence preserved — TRAIN_SYNTHETIC.md run R512)")
    p.set_defaults(func=cmd_make_synthetic)

    args = parser.parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
