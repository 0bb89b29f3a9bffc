"""Wire protocol for the pose-streaming service.

The reference returns a 24-byte packet of six little-endian float32
[rvec_x, rvec_y, rvec_z, tvec_x, tvec_y, tvec_z] over a WebRTC data channel
(unity-sandbox/WebRTCNetCoreSandbox/Program.cs:279-297): rotation in radians
(net output x pi), translation in meters (net output mm / 1000).  That pose
packet format is preserved byte-for-byte; the transport here is a framed TCP
stream (the WebRTC/RTP stack is out of scope for a TPU-serving host — the
signaling/SDP layer of the reference is replaced by a plain socket).

Frame message layout (little-endian):
    magic   u32  0x48454750  ("HEGP")
    kind    u8   0 = RGB8, 1 = I420
    height  u16
    width   u16
    payload h*w*3 bytes (RGB8) or h*3//2 * w bytes (I420)

Response: one pose packet per frame, or 24 bytes of NaN when no detection
cleared the score threshold.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

MAGIC = 0x48454750
HEADER_FMT = "<IBHH"
HEADER_BYTES = struct.calcsize(HEADER_FMT)
POSE_PACKET_BYTES = 24

KIND_RGB8 = 0
KIND_I420 = 1
KIND_NV12 = 2


def encode_frame_message(frame: np.ndarray, kind: int = KIND_RGB8) -> bytes:
    h, w = frame.shape[:2]
    return struct.pack(HEADER_FMT, MAGIC, kind, h, w) + frame.tobytes()


def encode_raw_frame_message(payload: bytes, kind: int, height: int, width: int) -> bytes:
    """Frame message from an already-encoded payload (I420/NV12 planes)."""
    if len(payload) != payload_size(kind, height, width):
        raise ValueError(
            f"payload is {len(payload)} bytes, kind {kind} at {height}x{width} "
            f"needs {payload_size(kind, height, width)}"
        )
    return struct.pack(HEADER_FMT, MAGIC, kind, height, width) + payload


def payload_size(kind: int, height: int, width: int) -> int:
    if kind == KIND_RGB8:
        return height * width * 3
    if kind in (KIND_I420, KIND_NV12):
        return height * width * 3 // 2
    raise ValueError(f"unknown frame kind {kind}")


def decode_frame_header(header: bytes) -> Tuple[int, int, int]:
    magic, kind, h, w = struct.unpack(HEADER_FMT, header)
    if magic != MAGIC:
        raise ValueError(f"bad magic {magic:#x}")
    return kind, h, w


def decode_frame_message(data: bytes) -> np.ndarray:
    kind, h, w = decode_frame_header(data[:HEADER_BYTES])
    payload = np.frombuffer(data[HEADER_BYTES:], np.uint8)
    if kind == KIND_RGB8:
        return payload.reshape(h, w, 3)
    if kind == KIND_I420:
        from hmd_ego_pose_tpu.serving.frameio import i420_to_rgb

        return i420_to_rgb(payload, h, w)
    if kind == KIND_NV12:
        from hmd_ego_pose_tpu.serving.frameio import nv12_to_rgb

        return nv12_to_rgb(payload, h, w)
    raise ValueError(f"unknown frame kind {kind}")


def encode_pose_packet(rotation_rad: np.ndarray, translation_m: np.ndarray) -> bytes:
    """Six little-endian float32: axis-angle radians + translation meters."""
    vals = np.concatenate([np.asarray(rotation_rad), np.asarray(translation_m)]).astype("<f4")
    assert vals.shape == (6,)
    return vals.tobytes()


def decode_pose_packet(data: bytes) -> Tuple[np.ndarray, np.ndarray]:
    vals = np.frombuffer(data, "<f4")
    return vals[:3].copy(), vals[3:].copy()


def no_detection_packet() -> bytes:
    return np.full((6,), np.nan, "<f4").tobytes()
