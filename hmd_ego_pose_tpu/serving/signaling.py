"""Dead-simple signaling server: in-memory per-peer FIFO mailboxes over HTTP.

Functional equivalent of the reference's node-dss signaling service
(unity-sandbox/node-dss/index.js:37-67), used by WebRTC peers to exchange
SDP offers/answers/ICE candidates before the media path exists:

    POST /data/<peer-id>   enqueue a message for <peer-id>  -> 200
    GET  /data/<peer-id>   dequeue the oldest message       -> 200 body | 404

Mailboxes are in-memory and lossy by design (matching the reference).  The
TCP pose transport (serving/server.py) does not require signaling, but HMD
clients that keep a WebRTC-style bootstrap can point at this endpoint
unchanged.
"""

from __future__ import annotations

import collections
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Deque, Optional, Tuple


class _Mailboxes:
    def __init__(self):
        self._boxes: Dict[str, Deque[bytes]] = collections.defaultdict(collections.deque)
        self._lock = threading.Lock()

    def push(self, peer: str, data: bytes):
        with self._lock:
            self._boxes[peer].append(data)

    def pop(self, peer: str) -> Optional[bytes]:
        with self._lock:
            box = self._boxes.get(peer)
            if not box:
                return None
            return box.popleft()


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def _peer(self) -> Optional[str]:
        parts = self.path.strip("/").split("/")
        if len(parts) == 2 and parts[0] == "data" and parts[1]:
            return parts[1]
        return None

    def do_POST(self):
        peer = self._peer()
        if peer is None:
            self.send_error(404)
            return
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        self.server.mailboxes.push(peer, body)  # type: ignore[attr-defined]
        self.send_response(200)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def do_GET(self):
        peer = self._peer()
        data = self.server.mailboxes.pop(peer) if peer else None  # type: ignore[attr-defined]
        if data is None:
            self.send_error(404)
            return
        self.send_response(200)
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, fmt, *args):  # quiet
        pass


class SignalingServer:
    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._server = ThreadingHTTPServer((host, port), _Handler)
        self._server.mailboxes = _Mailboxes()  # type: ignore[attr-defined]
        self._thread: Optional[threading.Thread] = None

    @property
    def address(self) -> Tuple[str, int]:
        return self._server.server_address

    def start(self):
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._server.shutdown()
        self._server.server_close()
