"""TCP pose-streaming server.

Fills the role of the reference's workstation serving process
(unity-sandbox/WebRTCNetCoreSandbox/Program.cs): clients stream video frames
in, the server returns one 24-byte pose packet per frame.  The WebRTC
RTP/SCTP/signaling stack (node-dss mailboxes, NodeDssSignaler 500 ms HTTP
polls) is replaced by a framed TCP protocol — the pose-packet payload format
is preserved exactly (Program.cs:279-297) so a client-side adapter is
mechanical.

Concurrency model: one receive thread per connection pushing into the shared
InferenceEngine queue; the engine's dispatcher batches across clients.
"""

from __future__ import annotations

import socket
import socketserver
import threading
from typing import Optional

import numpy as np

from hmd_ego_pose_tpu.serving.engine import InferenceEngine
from hmd_ego_pose_tpu.serving import protocol


def _recv_exact(sock: socket.socket, n: int) -> Optional[bytes]:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf.extend(chunk)
    return bytes(buf)


class _Handler(socketserver.BaseRequestHandler):
    def handle(self):
        engine: InferenceEngine = self.server.engine  # type: ignore[attr-defined]
        sock = self.request
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        while True:
            header = _recv_exact(sock, protocol.HEADER_BYTES)
            if header is None:
                return
            kind, h, w = protocol.decode_frame_header(header)
            payload = _recv_exact(sock, protocol.payload_size(kind, h, w))
            if payload is None:
                return
            frame = protocol.decode_frame_message(header + payload)
            result = engine.infer_blocking(frame)
            if result is None:
                sock.sendall(protocol.no_detection_packet())
            else:
                rotation, translation = result
                sock.sendall(protocol.encode_pose_packet(rotation, translation))


class _ThreadingServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


class PoseServer:
    """Lifecycle wrapper: engine + TCP acceptor."""

    def __init__(self, engine: InferenceEngine, host: str = "127.0.0.1", port: int = 0):
        self.engine = engine
        self._server = _ThreadingServer((host, port), _Handler)
        self._server.engine = engine  # type: ignore[attr-defined]
        self._thread: Optional[threading.Thread] = None

    @property
    def address(self):
        return self._server.server_address

    def start(self):
        self.engine.start()
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._server.shutdown()
        self._server.server_close()
        self.engine.stop()


class PoseClient:
    """Minimal blocking client (tests / tooling)."""

    def __init__(self, host: str, port: int):
        self.sock = socket.create_connection((host, port))
        self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)

    def infer(self, frame: np.ndarray):
        return self._roundtrip(protocol.encode_frame_message(frame))

    def infer_encoded(self, payload: bytes, kind: int, height: int, width: int):
        """Send an I420/NV12 payload (the reference HMD's frame formats)."""
        return self._roundtrip(
            protocol.encode_raw_frame_message(payload, kind, height, width)
        )

    def _roundtrip(self, message: bytes):
        self.sock.sendall(message)
        packet = _recv_exact(self.sock, protocol.POSE_PACKET_BYTES)
        if packet is None:
            raise ConnectionError("server closed")
        rotation, translation = protocol.decode_pose_packet(packet)
        if np.isnan(rotation).any():
            return None
        return rotation, translation

    def close(self):
        self.sock.close()
