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
