"""Serving-path tests: protocol, native frame ingest, engine, TCP server."""

import json
import math
import threading

import numpy as np
import pytest
import jax

from hmd_ego_pose_tpu.config import ModelConfig, ServingConfig
from hmd_ego_pose_tpu.models import hmd_ego_pose
from hmd_ego_pose_tpu.serving import protocol
from hmd_ego_pose_tpu.serving.engine import InferenceEngine, LatencyStats
from hmd_ego_pose_tpu.serving.frameio import FrameRing, get_lib, i420_to_rgb
from hmd_ego_pose_tpu.serving.server import PoseClient, PoseServer


def test_pose_packet_roundtrip():
    rot = np.array([0.1, -0.2, 0.3], np.float32)
    trans = np.array([0.05, -0.01, 0.6], np.float32)
    pkt = protocol.encode_pose_packet(rot, trans)
    assert len(pkt) == protocol.POSE_PACKET_BYTES == 24
    r2, t2 = protocol.decode_pose_packet(pkt)
    np.testing.assert_allclose(r2, rot)
    np.testing.assert_allclose(t2, trans)


def test_frame_message_roundtrip():
    rng = np.random.RandomState(0)
    frame = rng.randint(0, 255, size=(48, 64, 3)).astype(np.uint8)
    msg = protocol.encode_frame_message(frame)
    out = protocol.decode_frame_message(msg)
    np.testing.assert_array_equal(out, frame)


def test_native_library_builds():
    lib = get_lib()
    assert lib is not None, "native frameio library failed to build"


def test_i420_conversion_gray():
    # Y=128, U=V=128 -> mid gray (BT.601: (298*(128-16)+128)>>8 = 130)
    h = w = 16
    payload = np.concatenate(
        [np.full(h * w, 128, np.uint8), np.full(h * w // 2, 128, np.uint8)]
    )
    rgb = i420_to_rgb(payload, h, w)
    assert rgb.shape == (16, 16, 3)
    assert np.all(np.abs(rgb.astype(int) - 130) <= 1)


def test_i420_native_matches_numpy_fallback():
    rng = np.random.RandomState(1)
    h = w = 32
    payload = rng.randint(0, 255, size=(h * w * 3 // 2,)).astype(np.uint8)
    native = i420_to_rgb(payload, h, w)

    # force the numpy path
    import hmd_ego_pose_tpu.serving.frameio as fio

    lib = fio._lib
    fio._lib, fio._build_failed = None, True
    try:
        fallback = i420_to_rgb(payload, h, w)
    finally:
        fio._lib, fio._build_failed = lib, False
    np.testing.assert_allclose(native.astype(int), fallback.astype(int), atol=1)


def test_nv12_matches_i420():
    """NV12 and I420 of the same YUV content must decode identically."""
    from hmd_ego_pose_tpu.serving.frameio import nv12_to_rgb

    rng = np.random.RandomState(4)
    h = w = 32
    y = rng.randint(0, 255, size=(h * w,)).astype(np.uint8)
    u = rng.randint(0, 255, size=(h * w // 4,)).astype(np.uint8)
    v = rng.randint(0, 255, size=(h * w // 4,)).astype(np.uint8)

    i420 = np.concatenate([y, u, v])
    uv_interleaved = np.empty(h * w // 2, np.uint8)
    uv_interleaved[0::2] = u
    uv_interleaved[1::2] = v
    nv12 = np.concatenate([y, uv_interleaved])

    np.testing.assert_allclose(
        nv12_to_rgb(nv12, h, w).astype(int), i420_to_rgb(i420, h, w).astype(int), atol=1
    )
    # protocol roundtrip
    msg = protocol.encode_frame_message(nv12.reshape(-1, 1, 1), kind=protocol.KIND_NV12)
    # encode expects (h, w, ...) shaped frame; craft header manually instead
    import struct

    msg = struct.pack(protocol.HEADER_FMT, protocol.MAGIC, protocol.KIND_NV12, h, w) + nv12.tobytes()
    out = protocol.decode_frame_message(msg)
    np.testing.assert_array_equal(out, nv12_to_rgb(nv12, h, w))


def test_native_warp_matches_numpy():
    """C++ warp_affine must be pixel-exact vs the numpy reference (the
    training augmentation hot loop runs through it)."""
    import hmd_ego_pose_tpu.serving.frameio as fio
    from hmd_ego_pose_tpu.data.image import get_rotation_matrix_2d, warp_affine

    if fio.get_lib() is None:
        pytest.skip("native library unavailable")

    rng = np.random.RandomState(5)
    img = rng.randint(0, 255, size=(96, 128, 3)).astype(np.uint8)
    m = get_rotation_matrix_2d((64, 48), -37.0, 1.15)

    native_bl = warp_affine(img, m, (128, 96), "bilinear")
    native_nn = warp_affine(img[:, :, 0], m, (128, 96), "nearest")

    lib = fio._lib
    fio._lib, fio._build_failed = None, True
    try:
        np_bl = warp_affine(img, m, (128, 96), "bilinear")
        np_nn = warp_affine(img[:, :, 0], m, (128, 96), "nearest")
    finally:
        fio._lib, fio._build_failed = lib, False

    np.testing.assert_array_equal(native_bl, np_bl)
    np.testing.assert_array_equal(native_nn, np_nn)

    # native resize path (clamp border): exact on downscale, <=1 LSB on the
    # rare exact-.5 rounding ties when upscaling
    from hmd_ego_pose_tpu.data.image import resize_bilinear

    big = rng.randint(0, 255, size=(200, 240, 3)).astype(np.uint8)
    native_down = resize_bilinear(big, (100, 120))
    native_up = resize_bilinear(img, (192, 256))
    fio._lib, fio._build_failed = None, True
    try:
        np_down = resize_bilinear(big, (100, 120))
        np_up = resize_bilinear(img, (192, 256))
    finally:
        fio._lib, fio._build_failed = lib, False
    np.testing.assert_array_equal(native_down, np_down)
    np.testing.assert_allclose(native_up.astype(int), np_up.astype(int), atol=1)


def test_frame_ring():
    ring = FrameRing(frame_bytes=12, capacity=4)
    frames = [np.full((12,), i, np.uint8) for i in range(6)]
    results = [ring.push(f) for f in frames]
    # two oldest dropped
    assert results == [True, True, True, True, False, False]
    assert len(ring) == 4
    out = ring.pop(10)
    assert out.shape == (4, 12)
    np.testing.assert_array_equal(out[:, 0], [2, 3, 4, 5])
    assert len(ring) == 0


def test_latency_stats():
    s = LatencyStats()
    for v in range(100):
        s.record(float(v))
    assert 45 <= s.percentile(50) <= 55
    assert s.summary()["count"] == 100


@pytest.fixture(scope="module")
def small_engine():
    cfg = ModelConfig(phi=0, image_size=128)
    params, state = hmd_ego_pose.init(jax.random.PRNGKey(0), cfg)
    engine = InferenceEngine(
        params, state, cfg,
        ServingConfig(max_batch_size=4, score_threshold=0.0),
        frame_shape=(96, 96),
    )
    engine.start()
    yield engine
    engine.stop()


def test_engine_single_and_batched(small_engine):
    rng = np.random.RandomState(2)
    frame = rng.randint(0, 255, size=(96, 96, 3)).astype(np.uint8)

    result = small_engine.infer_blocking(frame)
    # score_threshold 0: random-weights model always yields some detection
    assert result is not None
    rotation, translation = result
    assert rotation.shape == (3,) and translation.shape == (3,)

    # concurrent clients exercise adaptive batching
    futures = [small_engine.submit(frame) for _ in range(7)]
    results = [f.result(timeout=120) for f in futures]
    assert all(r is not None for r in results)
    stats = small_engine.stats()
    assert stats["total"]["count"] >= 8


def test_engine_stop_resolves_all_inflight_futures():
    """Shutdown-race regression: stop() racing a batch that the dispatcher
    has packed but not yet handed to the resolver must not abandon its
    futures.  The resolver exits only on the dispatcher's sentinel (or
    dispatcher death), so every submitted future resolves."""
    cfg = ModelConfig(phi=0, image_size=128)
    params, state = hmd_ego_pose.init(jax.random.PRNGKey(0), cfg)
    engine = InferenceEngine(
        params, state, cfg,
        ServingConfig(max_batch_size=2, score_threshold=0.0),
        frame_shape=(96, 96),
    ).start()
    rng = np.random.RandomState(3)
    frame = rng.randint(0, 255, size=(96, 96, 3)).astype(np.uint8)
    engine.infer_blocking(frame)  # warm compile so stop() races real work
    futures = [engine.submit(frame) for _ in range(9)]
    engine.stop()
    resolved = 0
    for f in futures:
        try:
            f.result(timeout=60)
            resolved += 1
        except Exception:
            resolved += 1  # an exception is a resolution, not a hang
    assert resolved == len(futures)


def test_engine_on_8_device_mesh():
    """Multi-chip DP serving: frames shard over the data axis."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from hmd_ego_pose_tpu.parallel.mesh import make_mesh

    cfg = ModelConfig(phi=0, image_size=128)
    params, state = hmd_ego_pose.init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh()
    engine = InferenceEngine(
        params, state, cfg,
        ServingConfig(max_batch_size=8, score_threshold=0.0),
        frame_shape=(96, 96),
        mesh=mesh,
    )
    assert engine.batch_sizes[0] == 8
    engine.start()
    try:
        rng = np.random.RandomState(7)
        frame = rng.randint(0, 255, size=(96, 96, 3)).astype(np.uint8)
        futures = [engine.submit(frame) for _ in range(8)]
        results = [f.result(timeout=300) for f in futures]
        assert all(r is not None for r in results)
    finally:
        engine.stop()


def test_tcp_server_end_to_end(small_engine):
    server = PoseServer(small_engine, port=0)
    server.start()
    try:
        host, port = server.address
        client = PoseClient(host, port)
        rng = np.random.RandomState(3)
        frame = rng.randint(0, 255, size=(96, 96, 3)).astype(np.uint8)
        for _ in range(3):
            result = client.infer(frame)
            assert result is not None
            rotation, translation = result
            assert np.isfinite(rotation).all() and np.isfinite(translation).all()
        client.close()
    finally:
        server._server.shutdown()
        server._server.server_close()


def _rgb_to_i420(rgb: np.ndarray) -> bytes:
    """BT.601 limited-range RGB -> planar I420 (test encoder)."""
    r = rgb[..., 0].astype(np.int32)
    g = rgb[..., 1].astype(np.int32)
    b = rgb[..., 2].astype(np.int32)
    y = ((66 * r + 129 * g + 25 * b + 128) >> 8) + 16
    u = ((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128
    v = ((112 * r - 94 * g - 18 * b + 128) >> 8) + 128
    y = np.clip(y, 16, 235).astype(np.uint8)
    u = np.clip(u[::2, ::2], 16, 240).astype(np.uint8)
    v = np.clip(v[::2, ::2], 16, 240).astype(np.uint8)
    return y.tobytes() + u.tobytes() + v.tobytes()


def test_signaling_bootstrap_i420_pose_loopback(small_engine):
    """The reference's session shape end-to-end: node-dss signaling
    handshake (offer -> answer with the media endpoint), then I420 frames
    in -> 24-byte pose packets out (NodeDssSignaler.cs + Program.cs:100-290,
    with the RTP leg carried by the framed TCP transport)."""
    from hmd_ego_pose_tpu.serving.signaling import SignalingServer
    from hmd_ego_pose_tpu.serving.signaling_client import (
        ANSWER, OFFER, Message, NodeDssSignalerClient, PoseEndpointResponder,
    )

    sig = SignalingServer(port=0)
    sig.start()
    pose_server = PoseServer(small_engine, port=0)
    pose_server.start()
    responder = None
    try:
        host, port = sig.address
        url = f"http://{host}:{port}/"

        # workstation side: answer offers with the pose endpoint
        ws_signaler = NodeDssSignalerClient(url, "ws", "hmd", poll_interval=0.02)
        ph, pp = pose_server.address
        responder = PoseEndpointResponder(ws_signaler, ph, pp)
        responder.start()

        # HMD side: offer -> poll for the answer -> dial the endpoint
        hmd = NodeDssSignalerClient(url, "hmd", "ws", poll_interval=0.02)
        hmd.send(Message(OFFER, "pseudo-sdp"))
        answer = hmd.wait_for(ANSWER, timeout=10.0)
        assert answer is not None, "no answer from the endpoint responder"
        endpoint = json.loads(answer.data)
        assert "i420" in endpoint["frame_kinds"]

        client = PoseClient(endpoint["host"], endpoint["port"])
        try:
            rng = np.random.RandomState(5)
            rgb = rng.randint(0, 255, size=(96, 96, 3)).astype(np.uint8)
            payload = _rgb_to_i420(rgb)
            for _ in range(2):  # stream two frames
                result = client.infer_encoded(payload, protocol.KIND_I420, 96, 96)
                assert result is not None
                rotation, translation = result
                assert rotation.shape == (3,) and translation.shape == (3,)
        finally:
            client.close()
    finally:
        if responder is not None:
            responder.stop()
        # shut down the TCP server only — the engine is a module fixture
        pose_server._server.shutdown()
        pose_server._server.server_close()
        sig.stop()


def test_engine_separates_execute_and_fetch_stats(small_engine):
    rng = np.random.RandomState(9)
    frame = rng.randint(0, 255, size=(96, 96, 3)).astype(np.uint8)
    small_engine.infer_blocking(frame)
    s = small_engine.stats()
    assert s["execute"]["count"] >= 1 and s["fetch"]["count"] >= 1
    # execute + fetch <= combined device time (upload adds the remainder)
    assert s["execute"]["p50_ms"] + s["fetch"]["p50_ms"] <= s["device"]["p50_ms"] * 1.5


def test_engine_aot_const_path_matches_jit(small_engine):
    """warmup() builds closure-const AOT executables — params lifted into
    executable-held consts so per-call dispatch skips flattening the ~600-leaf
    parameter tree (VERDICT r3 #7 dispatch-floor shave).  The AOT path must
    compute the jit path's function (to last-ulp tolerance: embedding params
    as consts changes XLA fusion, so bit-identity is not guaranteed)."""
    import jax.numpy as jnp

    small_engine.warmup()
    assert small_engine._aot, "warmup populated no AOT executables"
    rng = np.random.RandomState(7)
    b = small_engine.batch_sizes[0]
    frames = jnp.asarray(rng.randint(0, 255, size=(b, 96, 96, 3)).astype(np.uint8))
    cams = jnp.asarray(np.tile(small_engine._default_camera()[None], (b, 1)))
    via_aot = small_engine._predict_aot(frames, cams)
    via_jit = small_engine._predict(
        small_engine.params, small_engine.bn_state, frames, cams
    )
    for got, want in zip(
        jax.tree_util.tree_leaves(via_aot), jax.tree_util.tree_leaves(via_jit)
    ):
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=1e-4, atol=1e-3,
        )
    # engine traffic now rides the AOT path end-to-end
    frame = rng.randint(0, 255, size=(96, 96, 3)).astype(np.uint8)
    assert small_engine.infer_blocking(frame) is not None


def test_engine_device_resident_params_use_arg_passing_aot(small_engine, monkeypatch):
    """The const-closure fast path is gated on HOST-resident params: closing
    an accelerator-resident leaf into a jit reads its value at trace time —
    a device->host fetch, the permanent ~30x sync-mode degrade trigger on
    relay-attached TPUs (BENCH_NOTES.md).  When the tree is device-resident
    (e.g. a mesh deployment), warmup must build ARG-PASSING executables that
    compute the same function."""
    from hmd_ego_pose_tpu.serving import engine as engine_mod

    assert engine_mod._tree_on_host({"w": np.ones(3)})
    monkeypatch.setattr(engine_mod, "_tree_on_host", lambda tree: False)
    small_engine._aot = {}
    small_engine.warmup()
    assert small_engine._aot, "warmup populated no AOT executables"
    rng = np.random.RandomState(11)
    b = small_engine.batch_sizes[0]
    frames = np.ascontiguousarray(
        rng.randint(0, 255, size=(b, 96, 96, 3)).astype(np.uint8)
    )
    cams = np.tile(small_engine._default_camera()[None], (b, 1))
    import jax
    import jax.numpy as jnp

    via_aot = small_engine._predict_aot(jnp.asarray(frames), jnp.asarray(cams))
    via_jit = small_engine._predict(
        small_engine.params, small_engine.bn_state,
        jnp.asarray(frames), jnp.asarray(cams),
    )
    for got, want in zip(
        jax.tree_util.tree_leaves(via_aot), jax.tree_util.tree_leaves(via_jit)
    ):
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=1e-4, atol=1e-3,
        )
