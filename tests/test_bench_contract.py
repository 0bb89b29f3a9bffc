"""bench.py's driver contract: exactly ONE JSON line, even when the TPU
relay is dead (observed 2026-08-17: tunnel process exits on stdin EOF and
PJRT then retries connecting forever) or the measurement raises."""

import json

import bench


def test_bench_timeout_emits_error_json(capsys, monkeypatch):
    monkeypatch.setattr(bench, "BENCH_TIMEOUT_S", 0.2)
    monkeypatch.setattr(bench, "_bench",
                        lambda done=None: __import__("time").sleep(5))
    # the deadline path exits the process hard; intercept os._exit
    exits = []
    monkeypatch.setattr(__import__("os"), "_exit", lambda code: exits.append(code))
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec["value"] is None and "error" in rec
    assert rec["metric"] == "single_frame_p50_latency_256px_phi0"
    assert exits == [1]


def test_bench_success_single_line_exit_zero(capsys, monkeypatch):
    # success path: exactly one stdout line, exit 0 once (the BENCH_VERBOSE
    # calibration tail must not add lines or a second exit code)
    def fake_bench(done=None):
        print(json.dumps({"metric": "single_frame_p50_latency_256px_phi0",
                          "value": 1.0, "unit": "ms", "vs_baseline": 30.0}),
              flush=True)
        if done is not None:
            done.set()

    monkeypatch.setattr(bench, "_bench", fake_bench)
    exits = []
    monkeypatch.setattr(__import__("os"), "_exit", lambda code: exits.append(code))
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    assert json.loads(out[0])["value"] == 1.0
    assert exits == [0]


def test_bench_exception_emits_error_json(capsys, monkeypatch):
    def boom(done=None):
        raise RuntimeError("device exploded")

    monkeypatch.setattr(bench, "_bench", boom)
    exits = []
    monkeypatch.setattr(__import__("os"), "_exit", lambda code: exits.append(code))
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec["value"] is None
    assert "device exploded" in rec["error"]
    assert exits == [1]
