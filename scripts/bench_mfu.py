"""MXU-utilization (MFU) study: FLOPs/step / peak, per config (VERDICT #9).

MFU = (analytic FLOPs of the program) / (measured wall time) / (chip peak).
FLOPs come from the jaxpr conv/dot census (utils/model_stats._jaxpr_flops) —
backend-independent, counts fwd AND bwd convs for train steps because jax
lowers conv VJPs to conv_general_dilated.  Wall time is block_until_ready
device execution (no result fetches — see BENCH_NOTES.md relay artifact).

Peak: TPU v5e (v5 lite) = 197 TFLOP/s bf16 (public spec).  Our compute path
is bfloat16 (ModelConfig.compute_dtype), so bf16 peak is the right yardstick.

Each configuration is measured in its OWN subprocess: keeping ~10+ large
programs resident in one relay session measurably degrades every call
(BENCH_NOTES.md), and a fresh process also isolates any accidental
degrade-mode trip to the config that caused it.

Usage:  python scripts/bench_mfu.py [--flops-only]
Appends a table to BENCH_NOTES.md (unless --flops-only, which just prints).
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12  # TPU v5e, bf16 FLOP/s


def predict_flops(model_cfg, batch):
    import jax
    import jax.numpy as jnp

    from hmd_ego_pose_tpu.models import hmd_ego_pose
    from hmd_ego_pose_tpu.utils.model_stats import _jaxpr_flops, abstract_model

    p, s = abstract_model(model_cfg)
    img = jax.ShapeDtypeStruct((batch, model_cfg.image_size, model_cfg.image_size, 3), jnp.float32)
    cam = jax.ShapeDtypeStruct((batch, 6), jnp.float32)

    def fn(params, state, images, cams):
        return hmd_ego_pose.predict(
            params, state, images, cams, model_cfg,
            score_threshold=0.5, iou_threshold=0.5, max_detections=100,
        )

    closed = jax.make_jaxpr(fn)(p, s, img, cam)
    return _jaxpr_flops(closed.jaxpr)


def _abstract_batch(model_cfg, batch):
    import jax
    import jax.numpy as jnp

    from hmd_ego_pose_tpu.train.step import Batch

    sz = model_cfg.image_size
    sds = jax.ShapeDtypeStruct
    return Batch(
        images=sds((batch, sz, sz, 3), jnp.float32),
        camera_parameters=sds((batch, 6), jnp.float32),
        gt_boxes=sds((batch, 1, 4), jnp.float32),
        gt_labels=sds((batch, 1), jnp.int32),
        gt_transformation=sds((batch, 1, 8), jnp.float32),
        gt_coords_3d=sds((batch, 1, 63), jnp.float32),
        gt_valid=sds((batch, 1), bool),
    )


def train_flops(config, batch):
    import jax

    from hmd_ego_pose_tpu.models import hmd_ego_pose
    from hmd_ego_pose_tpu.train.step import make_train_step
    from hmd_ego_pose_tpu.utils.model_stats import _jaxpr_flops

    model_points = np.zeros((1, 64, 3), np.float32)
    step = make_train_step(config, model_points)
    p, s = jax.eval_shape(lambda k: hmd_ego_pose.init(k, config.model), jax.random.PRNGKey(0))
    # build an abstract TrainState without materializing anything
    import jax.numpy as jnp

    from hmd_ego_pose_tpu.train.state import TrainState, make_optimizer

    tx = make_optimizer(config.train, p)
    step.tx = tx
    opt_shapes = jax.eval_shape(tx.init, p)
    state = TrainState(
        step=jax.ShapeDtypeStruct((), jnp.int32),
        params=p, bn_state=s, opt_state=opt_shapes,
    )
    batch_s = _abstract_batch(config.model, batch)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    closed = jax.make_jaxpr(step)(state, batch_s, key)
    return _jaxpr_flops(closed.jaxpr)


def timed(fn, *args, warmup=3, iters=30):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append((time.perf_counter() - t0) * 1000)
    return float(np.percentile(times, 50))


def timed_train(step, state, batch, iters=20):
    import jax

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    for i in range(iters + 3):
        if i == 3:
            t0 = time.perf_counter()
        state, metrics = step.jitted(state, batch, key)
    jax.block_until_ready(metrics["loss"])
    return (time.perf_counter() - t0) / iters * 1000


PREDICT_CASES = [
    (0, 256, 1), (0, 256, 32), (0, 256, 128), (0, 256, 512),
    (1, 640, 8), (1, 640, 32),
    (3, 896, 4), (3, 896, 16),
]
TRAIN_CASES = [(0, 256, 16), (0, 256, 64), (0, 256, 128), (3, 896, 4)]


def run_one(kind: str, phi: int, size: int, b: int, flops_only: bool) -> dict:
    """Measure one configuration (runs inside its own subprocess)."""
    import jax
    import jax.numpy as jnp

    from hmd_ego_pose_tpu.config import Config, ModelConfig, TrainConfig
    from hmd_ego_pose_tpu.models import hmd_ego_pose
    from hmd_ego_pose_tpu.train.step import Batch, make_train_step

    rng = np.random.RandomState(0)
    if kind == "predict":
        mc = ModelConfig(phi=phi, image_size=size, compute_dtype="bfloat16")
        fl = predict_flops(mc, b)
        row = {"kind": kind, "phi": phi, "size": size, "batch": b, "gflops": fl / 1e9}
        if flops_only:
            return row
        params, state = hmd_ego_pose.init(0, mc)
        fn = hmd_ego_pose.make_predict_fn(mc, score_threshold=0.5, max_detections=100)
        images = jnp.asarray(rng.normal(size=(b, size, size, 3)).astype(np.float32) * 0.3)
        cam = jnp.tile(jnp.asarray([[572.4, 573.6, size / 2, size / 2, 1000.0, 1.0]], jnp.float32), (b, 1))
        ms = timed(fn, params, state, images, cam)
    else:
        cfg = Config(
            model=ModelConfig(phi=phi, image_size=size, compute_dtype="bfloat16"),
            train=TrainConfig(batch_size=b, freeze_backbone=False),
        )
        fl = train_flops(cfg, b)
        row = {"kind": kind, "phi": phi, "size": size, "batch": b, "gflops": fl / 1e9}
        if flops_only:
            return row
        model_points = (rng.normal(size=(1, 500, 3)) * 50).astype(np.float32)
        step = make_train_step(cfg, model_points)
        state = step.init_state(*hmd_ego_pose.init(0, cfg.model))
        batch = Batch(
            images=jnp.asarray(rng.normal(size=(b, size, size, 3)).astype(np.float32) * 0.3),
            camera_parameters=jnp.tile(jnp.asarray([[572.4, 573.6, size / 2, size / 2, 1000.0, 1.0]], jnp.float32), (b, 1)),
            gt_boxes=jnp.tile(jnp.asarray([[[60.0, 80.0, 160.0, 200.0]]], jnp.float32), (b, 1, 1)),
            gt_labels=jnp.zeros((b, 1), jnp.int32),
            gt_transformation=jnp.tile(jnp.asarray([[[0.1, 0.2, 0.1, 10.0, -5.0, 500.0, 0.0, 0.0]]], jnp.float32), (b, 1, 1)),
            gt_coords_3d=jnp.zeros((b, 1, 63), jnp.float32),
            gt_valid=jnp.ones((b, 1), bool),
        )
        ms = timed_train(step, state, batch)
    row["p50_ms"] = ms
    row["mfu"] = fl / (ms / 1e3) / PEAK_BF16
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flops-only", action="store_true")
    ap.add_argument("--one", help="internal: 'kind,phi,size,batch' for one subprocess")
    args = ap.parse_args()

    if args.one:
        kind, phi, size, b = args.one.split(",")
        row = run_one(kind, int(phi), int(size), int(b), args.flops_only)
        print("ROW " + json.dumps(row), flush=True)
        return

    rows = []
    for kind, cases in (("predict", PREDICT_CASES), ("train", TRAIN_CASES)):
        for phi, size, b in cases:
            if args.flops_only:
                rows.append(run_one(kind, phi, size, b, True))
                print(rows[-1], flush=True)
                continue
            cmd = [sys.executable, os.path.abspath(__file__), "--one", f"{kind},{phi},{size},{b}"]
            proc = subprocess.run(
                cmd, capture_output=True, text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            line = [ln for ln in proc.stdout.splitlines() if ln.startswith("ROW ")]
            if proc.returncode != 0 or not line:
                print(f"FAILED {kind} phi={phi} {size}px b={b}: {proc.stderr[-500:]}", flush=True)
                continue
            rows.append(json.loads(line[0][4:]))
            print(rows[-1], flush=True)

    if args.flops_only:
        return

    lines = ["## MFU study (TPU v5e, bf16 peak 197 TFLOP/s)", "",
             "| program | phi | input | batch | GFLOPs | p50 ms | img/s | MFU |",
             "|---|---|---|---|---|---|---|---|"]
    for r in rows:
        lines.append(
            f"| {r['kind']} | {r['phi']} | {r['size']} | {r['batch']} | "
            f"{r['gflops']:.1f} | {r['p50_ms']:.3f} | {r['batch'] / r['p50_ms'] * 1000:.0f} | "
            f"{r['mfu'] * 100:.1f}% |"
        )
    text = "\n".join(lines) + "\n"
    with open("BENCH_NOTES.md", "a") as f:
        f.write("\n" + text)
    print(text)


if __name__ == "__main__":
    main()
