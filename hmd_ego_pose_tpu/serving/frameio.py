"""ctypes bindings for the native frame-ingest library (with numpy fallback).

Builds hmd_ego_pose_tpu/native/frameio.cpp on first use (g++ -O3 -shared) and
caches the .so next to the source.  Every entry point has a pure-numpy
fallback so the framework stays functional without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "frameio.cpp")
_SO = os.path.join(_NATIVE_DIR, "libframeio.so")

_lib: Optional[ctypes.CDLL] = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None on failure."""
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None

        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.i420_to_rgb.argtypes = [u8p, u8p, u8p, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_int, u8p]
        lib.nv12_to_rgb.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_int, u8p]
        lib.ring_create.restype = ctypes.c_void_p
        lib.ring_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
        lib.ring_destroy.argtypes = [ctypes.c_void_p]
        lib.ring_push.restype = ctypes.c_int
        lib.ring_push.argtypes = [ctypes.c_void_p, u8p]
        lib.ring_pop.restype = ctypes.c_int64
        lib.ring_pop.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int64]
        lib.ring_size.restype = ctypes.c_int64
        lib.ring_size.argtypes = [ctypes.c_void_p]
        dp = ctypes.POINTER(ctypes.c_double)
        lib.warp_affine_bilinear_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                                ctypes.c_int, dp, u8p,
                                                ctypes.c_int, ctypes.c_int,
                                                ctypes.c_int]
        lib.warp_affine_nearest_u8.argtypes = lib.warp_affine_bilinear_u8.argtypes[:-1]
        _lib = lib
        return _lib


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def i420_to_rgb(payload: np.ndarray, height: int, width: int) -> np.ndarray:
    """Planar I420 bytes -> RGB8 (H, W, 3); BT.601 limited range."""
    y_size = height * width
    uv_size = y_size // 4
    y = np.ascontiguousarray(payload[:y_size])
    u = np.ascontiguousarray(payload[y_size: y_size + uv_size])
    v = np.ascontiguousarray(payload[y_size + uv_size: y_size + 2 * uv_size])

    lib = get_lib()
    out = np.empty((height, width, 3), np.uint8)
    if lib is not None:
        lib.i420_to_rgb(_u8ptr(y), _u8ptr(u), _u8ptr(v), height, width,
                        width, width // 2, _u8ptr(out))
        return out

    # numpy fallback
    yf = y.reshape(height, width).astype(np.int32)
    uf = u.reshape(height // 2, width // 2).astype(np.int32)
    vf = v.reshape(height // 2, width // 2).astype(np.int32)
    uf = np.repeat(np.repeat(uf, 2, 0), 2, 1)[:height, :width]
    vf = np.repeat(np.repeat(vf, 2, 0), 2, 1)[:height, :width]
    c = yf - 16
    d = uf - 128
    e = vf - 128
    r = (298 * c + 409 * e + 128) >> 8
    g = (298 * c - 100 * d - 208 * e + 128) >> 8
    b = (298 * c + 516 * d + 128) >> 8
    return np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)


def warp_affine_u8(
    image: np.ndarray, inv_matrix: np.ndarray, out_size, interpolation: str,
    border: str = "zero",
) -> Optional[np.ndarray]:
    """Native affine warp of a uint8 image (cv2 semantics).

    ``inv_matrix``: INVERSE (dst->src) 2x3 affine.  ``border``: "zero"
    (cv2.warpAffine default) or "clamp" (edge replicate, the resize
    convention).  Returns None when the native library is unavailable
    (caller falls back to numpy).
    """
    lib = get_lib()
    if lib is None or image.dtype != np.uint8:
        return None
    squeeze = image.ndim == 2
    img = image[:, :, None] if squeeze else image
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    ow, oh = out_size
    out = np.empty((oh, ow, c), np.uint8)
    m = np.ascontiguousarray(inv_matrix.reshape(6).astype(np.float64))
    mp = m.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    if interpolation == "nearest":
        lib.warp_affine_nearest_u8(_u8ptr(img), h, w, c, mp, _u8ptr(out), oh, ow)
    else:
        lib.warp_affine_bilinear_u8(_u8ptr(img), h, w, c, mp, _u8ptr(out), oh, ow,
                                    1 if border == "clamp" else 0)
    return out[:, :, 0] if squeeze else out


def nv12_to_rgb(payload: np.ndarray, height: int, width: int) -> np.ndarray:
    """Semi-planar NV12 bytes (Y plane + interleaved UV) -> RGB8 (H, W, 3).

    The reference's HoloLens video arrives as NV12
    (unity-sandbox/WebRTCNetCoreSandbox/Program.cs:136-160).
    """
    y_size = height * width
    y = np.ascontiguousarray(payload[:y_size])
    uv = np.ascontiguousarray(payload[y_size: y_size + y_size // 2])

    lib = get_lib()
    if lib is not None:
        out = np.empty((height, width, 3), np.uint8)
        lib.nv12_to_rgb(_u8ptr(y), _u8ptr(uv), height, width, width, width, _u8ptr(out))
        return out

    # numpy fallback: de-interleave UV then reuse the I420 math
    uv2 = uv.reshape(-1, 2)
    planar = np.concatenate([y, np.ascontiguousarray(uv2[:, 0]), np.ascontiguousarray(uv2[:, 1])])
    return i420_to_rgb(planar, height, width)


class FrameRing:
    """SPSC frame ring over the native buffer (threading.Queue fallback)."""

    def __init__(self, frame_bytes: int, capacity: int = 64):
        self.frame_bytes = frame_bytes
        self.capacity = capacity
        lib = get_lib()
        self._lib = lib
        if lib is not None:
            self._handle = lib.ring_create(frame_bytes, capacity)
            if not self._handle:
                self._lib = None
        if self._lib is None:
            import collections

            self._deque = collections.deque(maxlen=capacity)
            self._dq_lock = threading.Lock()

    def push(self, frame: np.ndarray) -> bool:
        """Returns False when the oldest frame was dropped to make room."""
        data = np.ascontiguousarray(frame.reshape(-1).view(np.uint8))
        assert data.nbytes == self.frame_bytes
        if self._lib is not None:
            return bool(self._lib.ring_push(self._handle, _u8ptr(data)))
        with self._dq_lock:
            dropped = len(self._deque) == self.capacity
            self._deque.append(np.array(data, copy=True))
            return not dropped

    def pop(self, max_frames: int) -> np.ndarray:
        """(n, frame_bytes) uint8 array of up to max_frames frames."""
        if self._lib is not None:
            out = np.empty((max_frames, self.frame_bytes), np.uint8)
            n = self._lib.ring_pop(self._handle, _u8ptr(out), max_frames)
            return out[:n]
        with self._dq_lock:
            n = min(len(self._deque), max_frames)
            frames = [self._deque.popleft() for _ in range(n)]
        return np.stack(frames) if frames else np.empty((0, self.frame_bytes), np.uint8)

    def __len__(self):
        if self._lib is not None:
            return int(self._lib.ring_size(self._handle))
        with self._dq_lock:
            return len(self._deque)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_handle", None):
            self._lib.ring_destroy(self._handle)
