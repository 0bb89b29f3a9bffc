"""Roofline analysis of the deployed programs (VERDICT r2 #2).

For each program (predict/train at several phi/batch points) this combines:
  * XLA's own compile-time cost analysis (flops + bytes accessed, from
    ``compiled.cost_analysis()`` — the TPU compiler's numbers, not analytic
    estimates), and
  * the sync-mode batch-delta calibrated per-image device time
    (scripts/bench_mfu.py methodology; async block_until_ready on this
    relay acks dispatch, not completion)

into a roofline classification per program:

    t_compute = flops / 197e12      (v5e bf16 peak)
    t_memory  = bytes / 819e9       (v5e HBM bandwidth)
    roofline  = max(t_compute, t_memory)
    attained  = roofline / t_measured

A program with attained >= ~60% and t_memory > t_compute is running at the
bandwidth roofline — "low MFU" is then a statement about arithmetic
intensity (the model's, not the implementation's).  Residual gaps point at
schedule overheads (small-grid kernels, layout changes, host sync).

Each configuration runs in its own subprocess (session isolation: sync-mode
timing degrades a session permanently; cost analysis is collected in the
same subprocess before the timing fetch).

Usage:  python scripts/bench_roofline.py [--report-only]
Appends the table to BENCH_NOTES.md.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12  # v5e bf16 FLOP/s
HBM_BW = 819e9  # v5e HBM bytes/s


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def run_one(kind, phi, size, b_s, b_l):
    import jax
    import jax.numpy as jnp

    from hmd_ego_pose_tpu.config import Config, ModelConfig, TrainConfig
    from hmd_ego_pose_tpu.models import hmd_ego_pose
    from hmd_ego_pose_tpu.train.step import Batch, make_train_step

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from bench_mfu import _sync_session, _timed_sync

    mc = ModelConfig(phi=phi, image_size=size, compute_dtype="bfloat16")
    rng = np.random.RandomState(0)
    row = {"kind": kind, "phi": phi, "size": size, "b_small": b_s, "b_large": b_l}

    def build(b):
        cam = jnp.tile(jnp.asarray([[572.4, 573.6, size / 2, size / 2, 1000.0, 1.0]], jnp.float32), (b, 1))
        img = jnp.asarray(rng.normal(size=(b, size, size, 3)).astype(np.float32) * 0.3)
        if kind == "predict":
            params, state = hmd_ego_pose.init(0, mc)
            fn = hmd_ego_pose.make_predict_fn(mc, score_threshold=0.5, max_detections=100)
            compiled = fn.lower(params, state, img, cam).compile()
            return compiled, (params, state, img, cam)
        cfg = Config(model=mc, train=TrainConfig(batch_size=b, freeze_backbone=False))
        step = make_train_step(cfg, (rng.normal(size=(1, 500, 3)) * 50).astype(np.float32))
        state = step.init_state(*hmd_ego_pose.init(0, mc))
        batch = Batch(
            images=img, camera_parameters=cam,
            gt_boxes=jnp.tile(jnp.asarray([[[60.0, 80.0, 160.0, 200.0]]], jnp.float32), (b, 1, 1)),
            gt_labels=jnp.zeros((b, 1), jnp.int32),
            gt_transformation=jnp.tile(jnp.asarray([[[0.1, 0.2, 0.1, 10.0, -5.0, 500.0, 0.0, 0.0]]], jnp.float32), (b, 1, 1)),
            gt_coords_3d=jnp.zeros((b, 1, 63), jnp.float32),
            gt_valid=jnp.ones((b, 1), bool),
        )
        key = jax.random.PRNGKey(0)

        def one_step(st, ba, k):
            st2, m = step(st, ba, k)
            check = jax.tree.reduce(
                lambda a, x: a + x.astype(jnp.float32).sum(),
                st2.params, jnp.float32(0.0),
            )
            return m["loss"], check

        compiled = jax.jit(one_step).lower(state, batch, key).compile()
        return compiled, (state, batch, key)

    # compile BOTH batch sizes and collect cost analysis BEFORE any fetch
    c_s, args_s = build(b_s)
    c_l, args_l = build(b_l)
    fl_s, by_s = _cost(c_s)
    fl_l, by_l = _cost(c_l)
    # per-image marginal cost from the batch delta (cancels fixed overheads)
    row["gflops_per_img"] = (fl_l - fl_s) / (b_l - b_s) / 1e9
    row["mbytes_per_img"] = (by_l - by_s) / (b_l - b_s) / 1e6
    row["flops_total_l"] = fl_l
    row["bytes_total_l"] = by_l

    # now the timing (trips the session into sync mode)
    tiny = _sync_session()
    rtt = _timed_sync(tiny, jnp.ones((64, 64)))
    t_s = _timed_sync(lambda *a: c_s(*a), *args_s)
    t_l = _timed_sync(lambda *a: c_l(*a), *args_l)
    per_img_ms = (t_l - t_s) / (b_l - b_s)
    row.update(rtt_ms=rtt, t_small_ms=t_s, t_large_ms=t_l, per_image_ms=per_img_ms)

    t_compute_ms = row["gflops_per_img"] * 1e9 / PEAK_BF16 * 1e3
    t_memory_ms = row["mbytes_per_img"] * 1e6 / HBM_BW * 1e3
    roof = max(t_compute_ms, t_memory_ms)
    row.update(
        t_compute_ms=t_compute_ms,
        t_memory_ms=t_memory_ms,
        bound="memory" if t_memory_ms > t_compute_ms else "compute",
        attained_pct=(100.0 * roof / per_img_ms) if per_img_ms > 0 else float("nan"),
        intensity_flop_per_byte=(row["gflops_per_img"] * 1e9)
        / max(row["mbytes_per_img"] * 1e6, 1.0),
    )
    return row


CASES = [
    ("predict", 0, 256, 128, 512),
    ("predict", 3, 896, 4, 16),
    ("train", 0, 256, 16, 64),
    ("train", 3, 896, 2, 4),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", help="internal: 'kind,phi,size,b_s,b_l'")
    ap.add_argument("--out", default="BENCH_NOTES.md")
    args = ap.parse_args()

    if args.one:
        kind, phi, size, b_s, b_l = args.one.split(",")
        row = run_one(kind, int(phi), int(size), int(b_s), int(b_l))
        print("ROW " + json.dumps(row), flush=True)
        return

    rows = []
    for case in CASES:
        cmd = [sys.executable, os.path.abspath(__file__), "--one", ",".join(map(str, case))]
        proc = subprocess.run(
            cmd, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("ROW ")]
        if proc.returncode != 0 or not line:
            print(f"FAILED {case}: {proc.stderr[-500:]}", flush=True)
            continue
        rows.append(json.loads(line[0][4:]))
        print(rows[-1], flush=True)

    if not rows:
        return
    lines = [
        "## Roofline analysis (XLA cost model x sync-mode calibrated times)",
        "",
        "Marginal per-image flops/bytes from the XLA compiler's own cost",
        "analysis (batch-delta of two compiles, cancelling fixed costs);",
        "per-image time from sync-mode batch deltas.  v5e: 197 TFLOP/s bf16,",
        "819 GB/s HBM.",
        "",
        "| program | phi | input | GFLOP/img | MB/img | FLOP/byte | t_comp ms | t_mem ms | bound | t_meas ms | % of roofline |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['kind']} | {r['phi']} | {r['size']} | {r['gflops_per_img']:.2f} | "
            f"{r['mbytes_per_img']:.1f} | {r['intensity_flop_per_byte']:.1f} | "
            f"{r['t_compute_ms']:.3f} | {r['t_memory_ms']:.3f} | {r['bound']} | "
            f"{r['per_image_ms']:.3f} | {r['attained_pct']:.0f}% |"
        )
    text = "\n".join(lines) + "\n"
    with open(args.out, "a") as f:
        f.write("\n" + text)
    print(text)


if __name__ == "__main__":
    main()
