"""A/B: fused decode-after-top-k vs legacy decode-everything-then-filter.

Measures what the round-4 predict rewrite (ops/nms.py
``filter_detections_fused``) actually buys on the TPU (VERDICT r3 #8 asked
for a measured delta or a documented negative result).  The two programs are
bit-identical in outputs (tests/test_ops.py::test_fused_filter_matches_legacy);
they differ only in WHERE the anchor decode runs:

  * legacy: decode all N anchors' boxes (N,4) + translations (N,3) to HBM,
    then threshold/top-k/NMS (the reference's layer order,
    pytorch-sandbox/hmdegopose/layers.py:260-530),
  * fused:  threshold/top-k FIRST, decode only the k survivors — the full
    decoded tensors never materialize.

Per variant this collects, in one subprocess each (session isolation: the
sync-mode fetch degrades a relay session permanently):
  * XLA cost analysis (flops / bytes accessed) at both batch sizes — the
    compiler's own count of the HBM traffic the fusion removes, and
  * sync-mode batch-delta per-image device time (scripts/bench_mfu.py
    methodology: async block_until_ready acks dispatch on this relay; the
    delta between two batch sizes of one program cancels the RTT).

Usage:  python scripts/bench_fused_decode.py [--batches 16,128]
Prints one ROW json line per variant and a markdown table for BENCH_NOTES.md.
Run this ONLY when the TPU is otherwise idle (no training shift in flight).
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


def _make_fns(config):
    import jax.numpy as jnp

    from hmd_ego_pose_tpu.models import hmd_ego_pose
    from hmd_ego_pose_tpu.ops.nms import filter_detections_batch

    kw = dict(score_threshold=0.5, iou_threshold=0.5, max_detections=100)

    def predict_fused(params, state, images, cams):
        return hmd_ego_pose.predict(params, state, images, cams, config, **kw)

    def predict_legacy(params, state, images, cams):
        outputs, _ = hmd_ego_pose.apply(
            params, state, images, config, training=False
        )
        boxes, translation = hmd_ego_pose.decode_outputs(outputs, cams, config)
        return filter_detections_batch(
            boxes, outputs.classification, outputs.rotation,
            translation.astype(jnp.float32), outputs.hand, **kw,
        )

    return {"fused": predict_fused, "legacy": predict_legacy}


def run_one(variant, b_small, b_large):
    import jax
    import jax.numpy as jnp

    from hmd_ego_pose_tpu.config import ModelConfig
    from hmd_ego_pose_tpu.models import hmd_ego_pose

    config = ModelConfig(phi=0, image_size=256, compute_dtype="bfloat16")
    params, state = hmd_ego_pose.init(0, config)
    fn = jax.jit(_make_fns(config)[variant])
    rng = np.random.RandomState(0)

    row = {"variant": variant, "b_small": b_small, "b_large": b_large}

    def args_for(b):
        img = jnp.asarray(rng.normal(size=(b, 256, 256, 3)).astype(np.float32) * 0.3)
        cam = jnp.tile(
            jnp.asarray([[572.4114, 573.57043, 128.0, 128.0, 1000.0, 1.0]], jnp.float32),
            (b, 1),
        )
        return img, cam

    # cost analysis first (no device read, no degrade)
    compiled = {}
    for b in (b_small, b_large):
        img, cam = args_for(b)
        compiled[b] = fn.lower(params, state, img, cam).compile()
        fl, by = _cost(compiled[b])
        row[f"gflops_b{b}"] = fl / 1e9
        row[f"mbytes_b{b}"] = by / 1e6
    row["mbytes_per_img"] = (
        (row[f"mbytes_b{b_large}"] - row[f"mbytes_b{b_small}"]) / (b_large - b_small)
    )

    # sync-mode batch-delta device time (bench_mfu methodology)
    tiny = jax.jit(lambda v: (v * v).sum(axis=0))
    w = tiny(jnp.ones((64, 64)))
    jax.block_until_ready(w)
    np.asarray(w)  # first fetch: session synchronous from here on

    def timed(b, it=8):
        img, cam = args_for(b)
        jax.block_until_ready(compiled[b](params, state, img, cam))
        ts = []
        for _ in range(it):
            t0 = time.perf_counter()
            jax.block_until_ready(compiled[b](params, state, img, cam))
            ts.append((time.perf_counter() - t0) * 1e3)
        return float(np.percentile(ts, 50))

    t_s = timed(b_small)
    t_l = timed(b_large)
    row.update(
        t_small_ms=t_s,
        t_large_ms=t_l,
        per_image_ms=(t_l - t_s) / (b_large - b_small),
    )
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,128")
    ap.add_argument("--one", help="internal: 'variant,b_small,b_large'")
    args = ap.parse_args()

    if args.one:
        variant, b_s, b_l = args.one.split(",")
        print("ROW " + json.dumps(run_one(variant, int(b_s), int(b_l))), flush=True)
        return

    b_s, b_l = (int(x) for x in args.batches.split(","))
    rows = []
    for variant in ("legacy", "fused"):
        cmd = [sys.executable, os.path.abspath(__file__), "--one",
               f"{variant},{b_s},{b_l}"]
        proc = subprocess.run(
            cmd, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("ROW ")]
        if proc.returncode != 0 or not line:
            print(f"FAILED {variant}: {proc.stderr[-800:]}", flush=True)
            continue
        rows.append(json.loads(line[0][4:]))
        print(rows[-1], flush=True)

    if len(rows) == 2:
        lines = [
            "| variant | XLA GFLOPs (b%d) | XLA MB (b%d) | MB/img (delta) | per-image ms | img/s |" % (b_l, b_l),
            "|---|---|---|---|---|---|",
        ]
        for r in rows:
            per = r["per_image_ms"]
            lines.append(
                f"| {r['variant']} | {r[f'gflops_b{b_l}']:.2f} | "
                f"{r[f'mbytes_b{b_l}']:.1f} | {r['mbytes_per_img']:.2f} | "
                + (f"{per:.3f} | {1000.0 / per:.0f} |" if per > 0 else "n/a | n/a |")
            )
        print("\n".join(lines))


if __name__ == "__main__":
    main()
