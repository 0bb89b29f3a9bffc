"""Serving-engine latency/throughput bench (VERDICT r2 #8 before/after).

Drives the InferenceEngine in-process with a closed-loop client at several
concurrency levels and reports per-stage stats (queue/execute/fetch/total)
plus sustained throughput.  Run on the real chip:

    python scripts/bench_serving.py [--frames 300] [--concurrency 1 4 16]

NOTE (relay): the engine's resolver thread fetches every result, so the
session is in sync mode from the first frame — all numbers are honest
end-to-end times.  ``total`` stats are comparable with round-2's engine
stats; the per-stage ``execute`` stat measures dispatch-complete ->
device-ready, which under double buffering includes waiting behind the
previous batch, so compare it with round 2's upload->ready split only at
concurrency 1.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--concurrency", type=int, nargs="+", default=[1, 4, 16])
    ap.add_argument("--frame-size", type=int, default=480)
    args = ap.parse_args()

    from hmd_ego_pose_tpu.config import ModelConfig, ServingConfig
    from hmd_ego_pose_tpu.models import hmd_ego_pose
    from hmd_ego_pose_tpu.serving.engine import InferenceEngine

    mc = ModelConfig(phi=0, image_size=256, compute_dtype="bfloat16")
    params, bn = hmd_ego_pose.init(0, mc)
    h = w = args.frame_size
    engine = InferenceEngine(
        params, bn, mc, ServingConfig(max_batch_size=16, score_threshold=0.0),
        frame_shape=(h, w),
    )
    t0 = time.time()
    engine.warmup()
    print(f"warmup (AOT compile) {time.time() - t0:.1f}s", flush=True)
    engine.start()

    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (h, w, 3), np.uint8) for _ in range(8)]

    results = {}
    for conc in args.concurrency:
        for s in (engine.queue_stats, engine.device_stats, engine.execute_stats,
                  engine.fetch_stats, engine.total_stats):
            s.__init__()
        lat = []
        t0 = time.time()
        inflight = []
        done = 0
        i = 0
        while done < args.frames:
            while len(inflight) < conc and i < args.frames:
                inflight.append((time.perf_counter(), engine.submit(frames[i % 8])))
                i += 1
            t_sub, fut = inflight.pop(0)
            fut.result(timeout=60)
            lat.append((time.perf_counter() - t_sub) * 1e3)
            done += 1
        wall = time.time() - t0
        results[conc] = {
            "throughput_fps": round(args.frames / wall, 1),
            "client_p50_ms": round(float(np.percentile(lat, 50)), 3),
            "client_p95_ms": round(float(np.percentile(lat, 95)), 3),
            "stages": {k: {kk: round(vv, 3) for kk, vv in v.items()}
                       for k, v in engine.stats().items()},
        }
        print(f"concurrency {conc}: {results[conc]['throughput_fps']} fps, "
              f"p50 {results[conc]['client_p50_ms']} ms, "
              f"p95 {results[conc]['client_p95_ms']} ms", flush=True)

    engine.stop()
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
