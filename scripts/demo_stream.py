"""Streaming-serving demo: N simulated HMD clients against the pose server.

Spins up the InferenceEngine + TCP PoseServer, then runs concurrent clients
each streaming synthetic camera frames over the wire protocol, and reports
end-to-end (client-side) and per-stage (engine-side) latency.  The software
equivalent of the reference's webcam-before-HoloLens bring-up flow
(README.md:201-244).
"""

import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(num_clients=4, frames_per_client=50, frame_size=480, backend="default"):
    import jax

    if backend == "cpu":
        # must happen before any device query (CLAUDE.md: the env var alone
        # is consumed by sitecustomize's preimport)
        jax.config.update("jax_platforms", "cpu")

    # NOTE: do NOT enable the persistent compilation cache here — on the
    # axon remote-compile tunnel, cache-loaded large executables execute ~30x
    # slower than freshly compiled (server-resident) ones.

    from hmd_ego_pose_tpu.config import ModelConfig, ServingConfig
    from hmd_ego_pose_tpu.models import hmd_ego_pose
    from hmd_ego_pose_tpu.serving.engine import InferenceEngine
    from hmd_ego_pose_tpu.serving.server import PoseClient, PoseServer

    cfg = ModelConfig(phi=0, image_size=256, compute_dtype="bfloat16")
    params, state = hmd_ego_pose.init(0, cfg)

    engine = InferenceEngine(
        params, state, cfg,
        ServingConfig(max_batch_size=16, score_threshold=0.0),
        frame_shape=(frame_size, frame_size),
    )
    print("warming up (compiles every batch-size variant)...")
    engine.warmup()
    server = PoseServer(engine, port=0).start()
    host, port = server.address
    print(f"server on {host}:{port}, {num_clients} clients x {frames_per_client} frames")

    latencies = [[] for _ in range(num_clients)]
    detections = [0] * num_clients

    def client(i):
        rng = np.random.RandomState(i)
        # pre-generate frames so the timed loop measures the serving path,
        # not client-side frame synthesis
        frames = [
            rng.randint(0, 255, size=(frame_size, frame_size, 3)).astype(np.uint8)
            for _ in range(8)
        ]
        c = PoseClient(host, port)
        for k in range(frames_per_client):
            t0 = time.perf_counter()
            result = c.infer(frames[k % len(frames)])
            latencies[i].append((time.perf_counter() - t0) * 1000)
            if result is not None:
                detections[i] += 1
        c.close()

    threads = [threading.Thread(target=client, args=(i,)) for i in range(num_clients)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    all_lat = np.concatenate(latencies)
    total = num_clients * frames_per_client
    print(f"\n{total} frames in {wall:.2f}s -> {total / wall:.0f} fps aggregate")
    print(f"client-side e2e latency: p50 {np.percentile(all_lat, 50):.2f} ms, "
          f"p90 {np.percentile(all_lat, 90):.2f} ms, p99 {np.percentile(all_lat, 99):.2f} ms")
    print(f"detections returned: {sum(detections)}/{total}")
    print("engine stage stats:", engine.stats())
    server.stop()


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--num-clients", type=int, default=4)
    ap.add_argument("--frames-per-client", type=int, default=50)
    ap.add_argument("--frame-size", type=int, default=480)
    ap.add_argument("--backend", choices=["cpu", "default"], default="default",
                    help="cpu: run without the TPU (e.g. during a relay outage)")
    a = ap.parse_args()
    main(a.num_clients, a.frames_per_client, a.frame_size, a.backend)
