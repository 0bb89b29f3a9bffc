"""node-dss signaling CLIENT: polling GET loop + POST sends.

Python twin of the reference HMD/workstation signaler
(unity-sandbox/WebRTCNetCoreSandbox/NodeDssSignaler.cs:180-470):

* messages are JSON ``{"MessageType": 1|2|3, "Data": "...",
  "IceDataSeparator": "|"}`` (Offer=1, Answer=2, Ice=3);
* the client POSTs to ``{server}/data/{remote_peer_id}`` and polls
  ``{server}/data/{local_peer_id}`` every ``poll_interval`` seconds with at
  most one request in flight (NodeDssSignaler.cs PollTimeMs semantics);
* ``on_connect`` fires once, on the first successfully transmitted message
  (node-dss has no connection concept — NodeDssSignaler.cs:436-447);
* 404 means "mailbox empty", not an error.

With it, the session bootstrap the reference performs over node-dss
(offer/answer before the media path opens) works against
serving/signaling.py end-to-end; ``PoseEndpointResponder`` is the
workstation-side half that answers offers with the TCP pose endpoint.
"""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request
from dataclasses import dataclass
from typing import Callable, Optional

OFFER = 1
ANSWER = 2
ICE = 3

_TYPE_FROM_STRING = {"offer": OFFER, "answer": ANSWER, "ice": ICE}


@dataclass
class Message:
    """node-dss wire message (NodeDssSignaler.cs:33-130)."""

    message_type: int
    data: str
    ice_data_separator: str = "|"

    def to_json(self) -> bytes:
        return json.dumps(
            {
                "MessageType": self.message_type,
                "Data": self.data,
                "IceDataSeparator": self.ice_data_separator,
            }
        ).encode()

    @classmethod
    def from_json(cls, raw: bytes) -> "Message":
        obj = json.loads(raw.decode())
        mtype = obj.get("MessageType", 0)
        if isinstance(mtype, str):
            mtype = _TYPE_FROM_STRING.get(mtype.lower(), 0)
        return cls(
            message_type=int(mtype),
            data=obj.get("Data", ""),
            ice_data_separator=obj.get("IceDataSeparator", "|"),
        )


class NodeDssSignalerClient:
    """Polling signaler against a node-dss-compatible server."""

    def __init__(
        self,
        server_url: str,
        local_peer_id: str,
        remote_peer_id: str,
        poll_interval: float = 0.5,
        timeout: float = 5.0,
    ):
        if not server_url.endswith("/"):
            # the reference requires the trailing slash; be forgiving here
            server_url += "/"
        self.server_url = server_url
        self.local_peer_id = local_peer_id
        self.remote_peer_id = remote_peer_id
        self.poll_interval = poll_interval
        self.timeout = timeout

        self.on_message: Optional[Callable[[Message], None]] = None
        self.on_connect: Optional[Callable[[], None]] = None
        self.on_failure: Optional[Callable[[Exception], None]] = None

        self._connected_fired = False
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    # -- send ---------------------------------------------------------------------
    def send(self, message: Message) -> None:
        req = urllib.request.Request(
            f"{self.server_url}data/{self.remote_peer_id}",
            data=message.to_json(),
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout):
                pass
        except Exception as exc:  # noqa: BLE001 - reported via callback
            if self.on_failure:
                self.on_failure(exc)
            raise
        if not self._connected_fired:
            self._connected_fired = True
            if self.on_connect:
                self.on_connect()

    # -- poll ---------------------------------------------------------------------
    def poll_once(self) -> Optional[Message]:
        """One GET; Message on 200, None on empty mailbox (404)."""
        try:
            with urllib.request.urlopen(
                f"{self.server_url}data/{self.local_peer_id}", timeout=self.timeout
            ) as resp:
                return Message.from_json(resp.read())
        except urllib.error.HTTPError as exc:
            if exc.code == 404:
                return None
            if self.on_failure:
                self.on_failure(exc)
            return None
        except Exception as exc:  # noqa: BLE001
            if self.on_failure:
                self.on_failure(exc)
            return None

    def start_polling(self) -> bool:
        """Start the background poll loop; False if already polling."""
        if self._thread is not None and self._thread.is_alive():
            return False
        self._stop.clear()

        def loop():
            # one request in flight at a time, ~poll_interval apart
            while not self._stop.is_set():
                msg = self.poll_once()
                if msg is not None and self.on_message:
                    self.on_message(msg)
                    continue  # drain the mailbox without waiting
                self._stop.wait(self.poll_interval)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return True

    def stop_polling(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self.timeout)
            self._thread = None

    def wait_for(self, message_type: int, timeout: float = 10.0) -> Optional[Message]:
        """Blocking poll until a message of the given type arrives."""
        import time

        deadline = time.time() + timeout
        while time.time() < deadline:
            msg = self.poll_once()
            if msg is not None:
                if msg.message_type == message_type:
                    return msg
                if self.on_message:
                    self.on_message(msg)
                continue
            time.sleep(min(self.poll_interval, deadline - time.time()))
        return None


class PoseEndpointResponder:
    """Workstation-side bootstrap: answers OFFERs with the pose endpoint.

    The reference's offer/answer carries SDP for an RTP media path; this
    framework's media path is the framed TCP pose stream, so the ANSWER's
    ``Data`` is JSON ``{"host", "port", "frame_kinds"}`` the client dials.
    The signaling flow (poll -> offer -> answer) is byte-compatible with a
    node-dss deployment either way.
    """

    def __init__(self, signaler: NodeDssSignalerClient, host: str, port: int):
        self.signaler = signaler
        self.endpoint = {"host": host, "port": port, "frame_kinds": ["rgb8", "i420", "nv12"]}
        signaler.on_message = self._handle

    def _handle(self, msg: Message) -> None:
        if msg.message_type == OFFER:
            self.signaler.send(Message(ANSWER, json.dumps(self.endpoint)))

    def start(self) -> None:
        self.signaler.start_polling()

    def stop(self) -> None:
        self.signaler.stop_polling()
