"""Detailed TPU benchmark: batch sweep, preprocess-fused path, train step.

Not the driver's bench.py — this writes BENCH_NOTES.md with the full picture:
* fused predict (preprocessed input) latency/throughput for batch 1..32
* uint8-frame path (device preprocess fused) at the serving frame size
* train-step wall time at the reference batch size (16)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, warmup=3, iters=30):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append((time.perf_counter() - t0) * 1000)
    return float(np.percentile(times, 50)), float(np.percentile(times, 90))


def main(sections=("predict", "serving", "train")):
    import jax

    # NOTE: do NOT enable the persistent compilation cache here — on the
    # axon remote-compile tunnel, cache-loaded large executables execute ~30x
    # slower than freshly compiled (server-resident) ones.
    import jax.numpy as jnp

    from hmd_ego_pose_tpu.config import Config, ModelConfig, TrainConfig
    from hmd_ego_pose_tpu.models import hmd_ego_pose
    from hmd_ego_pose_tpu.ops.preprocess import preprocess_uint8_batch
    from hmd_ego_pose_tpu.train.step import Batch, make_train_step

    rng = np.random.RandomState(0)
    lines = [f"## section run: backend={jax.default_backend()}", ""]

    cfg = ModelConfig(phi=0, image_size=256, compute_dtype="bfloat16")
    params, state = hmd_ego_pose.init(0, cfg)

    if "predict" in sections:
        lines.append("## Fused predict (256x256 preprocessed input, bf16)")
        lines.append("| batch | p50 ms | p90 ms | fps/chip |")
        lines.append("|---|---|---|---|")
        for b in (1, 2, 4, 8, 16, 32):
            predict = hmd_ego_pose.make_predict_fn(cfg, score_threshold=0.5, max_detections=100)
            images = jnp.asarray(rng.normal(size=(b, 256, 256, 3)).astype(np.float32) * 0.3)
            cam = jnp.tile(jnp.asarray([[572.4, 573.6, 128.0, 128.0, 1000.0, 1.0]], jnp.float32), (b, 1))
            p50, p90 = timed(predict, params, state, images, cam)
            lines.append(f"| {b} | {p50:.3f} | {p90:.3f} | {b / p50 * 1000:.0f} |")
        lines.append("")

    def serving_fn_factory(b):
        pre = jax.jit(lambda frames: preprocess_uint8_batch(frames, cfg.image_size))
        core = jax.jit(
            lambda params, state, images, cams: hmd_ego_pose.predict(
                params, state, images, cams, cfg, score_threshold=0.5, max_detections=1
            )
        )

        def fn(params, state, frames, cams):
            return core(params, state, pre(frames), cams)

        return fn

    if "serving" in sections:
        lines.append("## Serving path (uint8 480x480 frames, device preprocess)")
        lines.append("| batch | p50 ms | fps/chip |")
        lines.append("|---|---|---|")
        for b in (1, 4, 16):
            fn = serving_fn_factory(b)
            frames = jnp.asarray(rng.randint(0, 255, size=(b, 480, 480, 3)).astype(np.uint8))
            cams = jnp.tile(jnp.asarray([[480.0, 480.0, 240.0, 240.0, 1000.0, 256 / 480]], jnp.float32), (b, 1))
            p50, _ = timed(fn, params, state, frames, cams)
            lines.append(f"| {b} | {p50:.3f} | {b / p50 * 1000:.0f} |")
        lines.append("")

    if "train" not in sections:
        _write(lines)
        return

    lines.append("## Train step (phi0 256x256, batch 16, Adam, on-device targets)")
    tcfg = Config(model=ModelConfig(phi=0, image_size=256),
                  train=TrainConfig(batch_size=16, freeze_backbone=False))
    model_points = (rng.normal(size=(1, 500, 3)) * 50).astype(np.float32)
    step = make_train_step(tcfg, model_points)
    tparams, tbn = hmd_ego_pose.init(0, tcfg.model)
    tstate = step.init_state(tparams, tbn)
    b = 16
    batch = Batch(
        images=jnp.asarray(rng.normal(size=(b, 256, 256, 3)).astype(np.float32) * 0.3),
        camera_parameters=jnp.tile(jnp.asarray([[572.4, 573.6, 128.0, 128.0, 1000.0, 1.0]], jnp.float32), (b, 1)),
        gt_boxes=jnp.tile(jnp.asarray([[[60.0, 80.0, 160.0, 200.0]]], jnp.float32), (b, 1, 1)),
        gt_labels=jnp.zeros((b, 1), jnp.int32),
        gt_transformation=jnp.tile(jnp.asarray([[[0.1, 0.2, 0.1, 10.0, -5.0, 500.0, 0.0, 0.0]]], jnp.float32), (b, 1, 1)),
        gt_coords_3d=jnp.zeros((b, 1, 63), jnp.float32),
        gt_valid=jnp.ones((b, 1), bool),
    )
    key = jax.random.PRNGKey(0)
    # can't donate in a timing loop with reuse; run sequential steps
    t0 = time.perf_counter()
    n_steps = 20
    for i in range(n_steps + 3):
        if i == 3:
            t0 = time.perf_counter()
        tstate, metrics = step.jitted(tstate, batch, key)
    jax.block_until_ready(metrics["loss"])
    per_step = (time.perf_counter() - t0) / n_steps * 1000
    lines.append(f"- per-step wall time: {per_step:.2f} ms  ({16 / per_step * 1000:.0f} images/s/chip)")
    lines.append(f"- reference: 1 GPU, no published step time; epoch = 10x dataset (train.py:112)")
    _write(lines)


def _write(lines):
    with open("BENCH_NOTES.md", "a") as f:
        f.write("\n".join(lines) + "\n\n")
    print("\n".join(lines))


if __name__ == "__main__":
    sections = tuple(sys.argv[1:]) or ("predict", "serving", "train")
    main(sections)
