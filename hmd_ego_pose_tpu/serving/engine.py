"""Batched streaming inference engine.

Replaces the reference's per-frame ONNX Runtime + OpenCV + NMS host pipeline
(unity-sandbox/WebRTCNetCoreSandbox/Program.cs:128-297) with a TPU-resident
path:

* raw uint8 frames are shipped to the device; resize + ImageNet normalization
  + pad fuse into the same XLA program as the forward pass, decode, and NMS
  (the reference spends ~6-8 ms/frame on host preprocessing alone,
  Program.cs:24);
* requests from any number of clients are batched adaptively: the dispatcher
  drains the queue, pads to the next compiled batch size (powers of two up to
  ``max_batch_size``), and runs one program for all of them;
* per-stage latency is recorded (queue wait / device time / total) for the
  observability story (SURVEY.md §5: the reference has only ad-hoc Stopwatch
  prints).

Output contract preserved: 6-float pose packet per frame — axis-angle
radians (net output x pi) + translation meters (net output mm / 1000)
(Program.cs:279-297).
"""

from __future__ import annotations

import math
import queue
import threading
import time
from concurrent.futures import Future
from typing import Dict, List, Optional, Tuple

import numpy as np

from hmd_ego_pose_tpu.config import ModelConfig, ServingConfig


def _tree_on_host(tree) -> bool:
    """True if every leaf is host-resident (numpy, or CPU-committed jax).

    Gates the const-closure AOT fast path: reading a leaf's value at trace
    time is free for host leaves but is a device->host fetch for
    accelerator leaves — the permanent sync-mode degrade trigger on
    relay-attached TPUs (BENCH_NOTES.md; CLAUDE.md landmine #4)."""
    import jax

    def leaf_on_host(x):
        if isinstance(x, np.ndarray) or np.isscalar(x):
            return True
        devices = getattr(x, "devices", None)
        if devices is None:
            return True
        try:
            return all(d.platform == "cpu" for d in x.devices())
        except Exception:
            return False

    return all(leaf_on_host(x) for x in jax.tree.leaves(tree))


class _Request:
    __slots__ = ("frame", "camera", "future", "t_enqueue")

    def __init__(self, frame, camera):
        self.frame = frame
        self.camera = camera
        self.future: Future = Future()
        self.t_enqueue = time.perf_counter()


class LatencyStats:
    """Streaming percentile tracker (fixed-size reservoir)."""

    def __init__(self, capacity: int = 2048):
        self.capacity = capacity
        self.samples: List[float] = []
        self.count = 0
        self._lock = threading.Lock()

    def record(self, value_ms: float):
        with self._lock:
            self.count += 1
            if len(self.samples) < self.capacity:
                self.samples.append(value_ms)
            else:
                # reservoir sampling keeps percentiles unbiased
                j = np.random.randint(0, self.count)
                if j < self.capacity:
                    self.samples[j] = value_ms

    def percentile(self, p: float) -> float:
        with self._lock:
            if not self.samples:
                return float("nan")
            return float(np.percentile(self.samples, p))

    def summary(self) -> Dict[str, float]:
        return {
            "p50_ms": self.percentile(50),
            "p90_ms": self.percentile(90),
            "p99_ms": self.percentile(99),
            "count": self.count,
        }


class InferenceEngine:
    """Multi-client adaptive-batching pose inference on one (or more) chips."""

    def __init__(
        self,
        params,
        bn_state,
        model_config: ModelConfig,
        serving_config: ServingConfig = ServingConfig(),
        frame_shape: Tuple[int, int] = (480, 480),
        mesh=None,
        default_camera=None,
        fold_bn: bool = True,
    ):
        """``mesh``: optional jax.sharding.Mesh — frames shard over the data
        axis for multi-chip throughput; params replicate.
        ``default_camera``: optional (6,) [fx, fy, px, py, tz_scale,
        image_scale] used for requests without explicit intrinsics — same
        layout as the reference's camera_params*.txt files.
        ``fold_bn``: fold eval-mode BatchNorms into conv weights for
        deployment (models/folding.py)."""
        import jax
        import jax.numpy as jnp

        from hmd_ego_pose_tpu.models import hmd_ego_pose
        from hmd_ego_pose_tpu.ops.preprocess import preprocess_uint8_batch

        if fold_bn:
            from hmd_ego_pose_tpu.models.folding import fold_batch_norms

            if _tree_on_host((params, bn_state)) and jax.default_backend() != "cpu":
                # keep host-resident trees host-resident: folding under the
                # accelerator default would move every leaf onto the device,
                # which forecloses warmup()'s const-closure fast path (see
                # warmup — closing device arrays into a jit traces a
                # device->host fetch, the permanent relay degrade trigger)
                try:
                    cpu = jax.devices("cpu")[0]
                except RuntimeError:
                    cpu = None
                if cpu is not None:
                    with jax.default_device(cpu):
                        params, bn_state = fold_batch_norms(params, bn_state, model_config)
                else:
                    params, bn_state = fold_batch_norms(params, bn_state, model_config)
            else:
                params, bn_state = fold_batch_norms(params, bn_state, model_config)

        self.model_config = model_config
        self.cfg = serving_config
        self.frame_shape = frame_shape
        self.mesh = mesh
        if mesh is not None:
            from hmd_ego_pose_tpu.parallel.mesh import (
                batch_sharding, image_sharding, replicated_sharding,
            )

            # frames: batch over 'data', image HEIGHT over 'space' — a
            # spatial mesh lets k chips cooperate on ONE frame (batch-1
            # latency scale-out); cameras only carry a batch dim
            self._frame_sharding = image_sharding(mesh)
            self._camera_sharding = batch_sharding(mesh)
            params = jax.device_put(params, replicated_sharding(mesh))
            bn_state = jax.device_put(bn_state, replicated_sharding(mesh))
        else:
            self._frame_sharding = self._camera_sharding = None
        self.params = params
        self.bn_state = bn_state
        self._default_camera_override = (
            np.asarray(default_camera, np.float32) if default_camera is not None else None
        )

        self._queue: "queue.Queue[_Request]" = queue.Queue(maxsize=serving_config.queue_depth)
        self._stop = threading.Event()
        self.queue_stats = LatencyStats()
        self.device_stats = LatencyStats()  # upload+execute+fetch combined
        self.execute_stats = LatencyStats()  # dispatch + on-device compute
        self.fetch_stats = LatencyStats()  # device->host result read
        self.total_stats = LatencyStats()

        # ONE fixed batch size: the chip is latency-bound at these model
        # sizes (batch 16 costs the same wall time as batch 1 — see
        # BENCH_NOTES.md), so padding every dispatch to max_batch_size is
        # free and keeps exactly two XLA programs resident.  Many resident
        # programs measurably degrade per-call latency on remote-attached
        # TPUs (program cache thrash).
        min_b = 1 if mesh is None else mesh.shape[mesh.axis_names[0]]
        self.batch_sizes = [max(serving_config.max_batch_size, min_b)]

        cfgm = model_config

        # Two chained XLA programs (device arrays flow between them without
        # touching the host): fusing the uint8 preprocess into the same
        # program as the conv stack provokes a pathological XLA:TPU schedule,
        # while separate dispatches cost only ~50us.
        self._preprocess = jax.jit(
            lambda frames_u8: preprocess_uint8_batch(frames_u8, cfgm.image_size)
        )
        self._predict_core = jax.jit(
            lambda params, state, images, cameras: hmd_ego_pose.predict(
                params, state, images, cameras, cfgm,
                score_threshold=serving_config.score_threshold,
                iou_threshold=0.5,
                max_detections=1,  # streaming contract: best pose only
            )
        )

        def predict_raw(params, state, frames_u8, cameras):
            return self._predict_core(params, state, self._preprocess(frames_u8), cameras)

        self._predict = predict_raw
        self._jnp = jnp
        self._dispatcher: Optional[threading.Thread] = None
        self._resolver: Optional[threading.Thread] = None
        # double buffer: at most 2 batches in flight (one executing on device,
        # one being packed/dispatched by the host).  The resolver thread pays
        # the block+fetch; the dispatcher never waits on the device, so host
        # packing overlaps device execution (VERDICT r2 #8).
        self._inflight: "queue.Queue" = queue.Queue(maxsize=2)
        # AOT executables keyed by batch size (warmup() fills this)
        self._aot: dict = {}

    # -- public API -----------------------------------------------------------------
    def start(self):
        self._dispatcher = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._resolver = threading.Thread(target=self._resolve_loop, daemon=True)
        self._resolver.start()
        self._dispatcher.start()
        return self

    def stop(self):
        self._stop.set()
        if self._dispatcher is not None:
            self._dispatcher.join(timeout=5)
        if self._resolver is not None:
            self._resolver.join(timeout=5)

    def warmup(self):
        """AOT-compile the fixed-batch programs before serving traffic.

        ``jax.jit(...).lower(...).compile()`` pins the executables up front
        and the compiled objects skip per-call jit dispatch overhead
        (argument canonicalization + trace-cache lookup) — measurable at the
        sub-millisecond batch-1 latencies this engine runs at."""
        import jax

        h, w = self.frame_shape
        params, state = self.params, self.bn_state
        mc, sc = self.model_config, self.cfg
        from hmd_ego_pose_tpu.models import hmd_ego_pose

        for b in self.batch_sizes:
            frames = self._jnp.asarray(np.zeros((b, h, w, 3), np.uint8))
            cams = self._jnp.asarray(np.tile(self._default_camera()[None], (b, 1)))
            if self._frame_sharding is not None:
                frames = jax.device_put(frames, self._frame_sharding)
                cams = jax.device_put(cams, self._camera_sharding)
            pre_exec = self._preprocess.lower(frames).compile()
            images = pre_exec(frames)
            # Close over params/state instead of passing them: jit lifts the
            # captured arrays into executable-held consts supplied to every
            # call WITHOUT re-flattening the ~600-leaf parameter pytree — at
            # sub-ms batch-1 latency the per-call tree traversal is a
            # measurable slice of the dispatch floor (VERDICT r3 #7;
            # before/after in BENCH_NOTES.md).
            #
            # ONLY when the tree lives on the HOST: embedding a closure
            # constant requires reading its VALUE at trace time, and for an
            # accelerator-resident leaf that read is a device->host fetch —
            # the PERMANENT sync-mode degrade trigger on relay-attached TPUs
            # (measured: one such closure lowered every subsequent exec of
            # this process from ~0.7 ms to ~30 ms RTT-bound).  Device-
            # resident trees (e.g. a mesh deployment's device_put above)
            # use arg-passing executables instead.
            if _tree_on_host((params, state)):
                core_exec = jax.jit(
                    lambda imgs, cms: hmd_ego_pose.predict(
                        params, state, imgs, cms, mc,
                        score_threshold=sc.score_threshold,
                        iou_threshold=0.5,
                        max_detections=1,
                    )
                ).lower(images, cams).compile()
                call = core_exec
            else:
                arg_exec = jax.jit(
                    lambda p, s, imgs, cms: hmd_ego_pose.predict(
                        p, s, imgs, cms, mc,
                        score_threshold=sc.score_threshold,
                        iou_threshold=0.5,
                        max_detections=1,
                    )
                ).lower(params, state, images, cams).compile()
                call = lambda imgs, cms: arg_exec(self.params, self.bn_state, imgs, cms)  # noqa: E731
            jax.block_until_ready(call(images, cams))
            self._aot[b] = (pre_exec, call)

    def _predict_aot(self, frames, cams):
        """Fixed-batch AOT path; falls back to jit for unexpected shapes."""
        aot = getattr(self, "_aot", {}).get(frames.shape[0])
        if aot is not None:
            pre_exec, call = aot
            return call(pre_exec(frames), cams)
        return self._predict(self.params, self.bn_state, frames, cams)

    def submit(self, frame: np.ndarray, camera: Optional[np.ndarray] = None) -> Future:
        """Enqueue one RGB8 frame; resolves to (rotation_rad, translation_m) or None."""
        if camera is None:
            camera = self._default_camera()
        req = _Request(frame, camera)
        self._queue.put(req)
        return req.future

    def infer_blocking(self, frame: np.ndarray, camera: Optional[np.ndarray] = None):
        return self.submit(frame, camera).result()

    def stats(self) -> Dict[str, Dict[str, float]]:
        return {
            "queue": self.queue_stats.summary(),
            "device": self.device_stats.summary(),
            "execute": self.execute_stats.summary(),
            "fetch": self.fetch_stats.summary(),
            "total": self.total_stats.summary(),
        }

    # -- internals ------------------------------------------------------------------
    def _default_camera(self) -> np.ndarray:
        if getattr(self, "_default_camera_override", None) is not None:
            return self._default_camera_override
        h, w = self.frame_shape
        scale = self.model_config.image_size / max(h, w)
        # desktop default intrinsics as shipped in the reference's
        # onnx-models/camera_params.txt (480/480/128/128 at 256 net input)
        return np.array([480.0, 480.0, w / 2, h / 2, 1000.0, scale], np.float32)

    def _run_device(self, frames_u8: np.ndarray, cameras: np.ndarray):
        """Blocking upload -> execute -> fetch (warmup / direct callers).

        The serving path itself uses the ASYNC split: _dispatch_loop
        dispatches without waiting and _resolve_loop blocks + fetches, so
        host packing of batch N+1 overlaps device execution of batch N."""
        import time

        import jax

        t0 = time.perf_counter()
        det = self._dispatch_device(frames_u8, cameras)
        jax.block_until_ready(det)
        t1 = time.perf_counter()
        out = jax.device_get(det)
        self.execute_stats.record((t1 - t0) * 1000)
        self.fetch_stats.record((time.perf_counter() - t1) * 1000)
        return out

    def _dispatch_device(self, frames_u8: np.ndarray, cameras: np.ndarray):
        """Upload + enqueue the device programs; returns device arrays
        WITHOUT waiting (jax dispatch is asynchronous)."""
        import jax

        frames = self._jnp.asarray(frames_u8)
        cams = self._jnp.asarray(cameras)
        if self._frame_sharding is not None:
            frames = jax.device_put(frames, self._frame_sharding)
            cams = jax.device_put(cams, self._camera_sharding)
        return self._predict_aot(frames, cams)

    def _dispatch_loop(self):
        """Stage 1: batch formation + host packing + async dispatch."""
        h, w = self.frame_shape
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.05)
            except queue.Empty:
                continue
            reqs = [first]
            while len(reqs) < self.cfg.max_batch_size:
                try:
                    reqs.append(self._queue.get_nowait())
                except queue.Empty:
                    break

            t_start = time.perf_counter()
            for r in reqs:
                self.queue_stats.record((t_start - r.t_enqueue) * 1000)

            try:
                b = next(s for s in self.batch_sizes if s >= len(reqs))
                frames = np.zeros((b, h, w, 3), np.uint8)
                cams = np.zeros((b, 6), np.float32)
                for i, r in enumerate(reqs):
                    frames[i] = r.frame
                    cams[i] = r.camera
                for i in range(len(reqs), b):
                    cams[i] = reqs[0].camera  # pad rows with valid intrinsics

                det = self._dispatch_device(frames, cams)
            except Exception as exc:  # device/shape failure: fail the batch, keep serving
                for r in reqs:
                    r.future.set_exception(exc)
                continue
            # hand to the resolver; maxsize=2 gives backpressure (double
            # buffer): at most one batch executing + one being packed
            self._inflight.put((reqs, det, t_start, time.perf_counter()))

        # requests still queued at shutdown resolve with an error instead of
        # leaving their futures hanging forever
        while True:
            try:
                r = self._queue.get_nowait()
            except queue.Empty:
                break
            r.future.set_exception(RuntimeError("engine stopped"))
        # sentinel: the resolver exits ONLY on this (or on dispatcher death),
        # never on a momentarily-empty queue — a stop() racing a batch that
        # is packed but not yet handed over must not abandon its futures
        self._inflight.put(None)

    def _resolve_loop(self):
        """Stage 2: wait for device completion, fetch, resolve futures."""
        import jax

        while True:
            try:
                item = self._inflight.get(timeout=0.05)
            except queue.Empty:
                # exit only when no more batches CAN arrive: the dispatcher
                # always enqueues its sentinel before exiting, so an empty
                # queue with a dead dispatcher is terminal (the is_alive
                # check also covers a dispatcher that crashed pre-sentinel)
                d = self._dispatcher
                if self._stop.is_set() and (d is None or not d.is_alive()):
                    return
                continue
            if item is None:
                return
            reqs, det, t_start, t_dispatched = item
            try:
                t0 = time.perf_counter()
                jax.block_until_ready(det)
                t1 = time.perf_counter()
                det = jax.device_get(det)
                # dispatch-complete -> device-ready.  Under double buffering
                # this includes any wait behind the PREVIOUS batch still
                # executing; round 2's single-threaded engine recorded pure
                # upload->ready (no pipelining), so the two are comparable
                # only at concurrency <= 1.
                self.execute_stats.record((t1 - t_dispatched) * 1000)
                self.fetch_stats.record((time.perf_counter() - t1) * 1000)
            except Exception as exc:
                for r in reqs:
                    r.future.set_exception(exc)
                continue

            t_done = time.perf_counter()
            self.device_stats.record((t_done - t_start) * 1000)

            for i, r in enumerate(reqs):
                if int(det.num_valid[i]) > 0:
                    rotation = np.asarray(det.rotation[i, 0]) * math.pi
                    translation = np.asarray(det.translation[i, 0]) / 1000.0
                    r.future.set_result((rotation, translation))
                else:
                    r.future.set_result(None)
                self.total_stats.record((t_done - r.t_enqueue) * 1000)
