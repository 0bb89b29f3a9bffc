"""Signaling mailbox semantics (mirrors node-dss test/basic.js behaviours)."""

import urllib.error
import urllib.request

import pytest

from hmd_ego_pose_tpu.serving.signaling import SignalingServer


@pytest.fixture()
def server():
    s = SignalingServer().start()
    yield s
    s.stop()


def _url(server, peer):
    host, port = server.address
    return f"http://{host}:{port}/data/{peer}"


def test_get_before_post_is_404(server):
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(_url(server, "alice"))
    assert exc.value.code == 404


def test_post_then_get_then_404(server):
    req = urllib.request.Request(_url(server, "bob"), data=b"offer-sdp", method="POST")
    assert urllib.request.urlopen(req).status == 200

    resp = urllib.request.urlopen(_url(server, "bob"))
    assert resp.read() == b"offer-sdp"

    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(_url(server, "bob"))
    assert exc.value.code == 404


def test_fifo_order_and_peer_isolation(server):
    for i in range(3):
        urllib.request.urlopen(
            urllib.request.Request(_url(server, "carol"), data=f"m{i}".encode(), method="POST")
        )
    urllib.request.urlopen(
        urllib.request.Request(_url(server, "dave"), data=b"other", method="POST")
    )
    got = [urllib.request.urlopen(_url(server, "carol")).read() for _ in range(3)]
    assert got == [b"m0", b"m1", b"m2"]
    assert urllib.request.urlopen(_url(server, "dave")).read() == b"other"


def test_bad_path_404(server):
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(_url(server, "x") + "/extra")
    assert exc.value.code == 404


# ---------------------------------------------------------------------------
# Signaling CLIENT (NodeDssSignaler twin) + full bootstrap loopback
# ---------------------------------------------------------------------------


def test_signaler_client_send_poll_roundtrip(server):
    from hmd_ego_pose_tpu.serving.signaling_client import (
        ANSWER, OFFER, Message, NodeDssSignalerClient,
    )

    host, port = server.address
    url = f"http://{host}:{port}/"
    hmd = NodeDssSignalerClient(url, "hmd", "ws", poll_interval=0.02)
    ws = NodeDssSignalerClient(url, "ws", "hmd", poll_interval=0.02)

    connects = []
    hmd.on_connect = lambda: connects.append(1)

    assert hmd.poll_once() is None  # empty mailbox -> 404 -> None, no error

    hmd.send(Message(OFFER, "sdp-offer-payload"))
    hmd.send(Message(OFFER, "second"))
    assert connects == [1]  # on_connect fires once, on first send

    got = ws.poll_once()
    assert got is not None and got.message_type == OFFER
    assert got.data == "sdp-offer-payload"
    assert ws.poll_once().data == "second"  # FIFO

    ws.send(Message(ANSWER, "sdp-answer"))
    back = hmd.wait_for(ANSWER, timeout=5.0)
    assert back is not None and back.data == "sdp-answer"


def test_signaler_client_background_polling(server):
    from hmd_ego_pose_tpu.serving.signaling_client import (
        ICE, Message, NodeDssSignalerClient,
    )
    import time

    host, port = server.address
    url = f"http://{host}:{port}/"
    a = NodeDssSignalerClient(url, "a", "b", poll_interval=0.02)
    b = NodeDssSignalerClient(url, "b", "a", poll_interval=0.02)

    received = []
    b.on_message = received.append
    assert b.start_polling()
    assert not b.start_polling()  # no overlapping pollers
    try:
        for i in range(3):
            a.send(Message(ICE, f"candidate-{i}|0|data"))
        deadline = time.time() + 5
        while len(received) < 3 and time.time() < deadline:
            time.sleep(0.02)
    finally:
        b.stop_polling()
    assert [m.data for m in received] == [f"candidate-{i}|0|data" for i in range(3)]


def test_wire_format_matches_node_dss_schema():
    """JSON schema must match NodeDssSignaler.cs Message (PascalCase keys,
    integer MessageType enum, IceDataSeparator)."""
    import json

    from hmd_ego_pose_tpu.serving.signaling_client import ICE, Message

    raw = Message(ICE, "cand|0|mid").to_json()
    obj = json.loads(raw)
    assert set(obj) == {"MessageType", "Data", "IceDataSeparator"}
    assert obj["MessageType"] == 3 and obj["IceDataSeparator"] == "|"

    # string-typed MessageType from other peers is accepted (WireMessageTypeFromString)
    m = Message.from_json(b'{"MessageType": "offer", "Data": "x"}')
    assert m.message_type == 1
