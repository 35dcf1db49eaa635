"""Unit coverage for bench.py's contention gate (r4 VERDICT task 2) —
the end-to-end bench exercises only the pass-immediately path, so the
retry and give-up behaviors are pinned here with a fake loadavg clock
(no sleeping, no Spark)."""

import bench


def test_gate_passes_immediately_when_idle(monkeypatch):
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (0.2, 1.0, 2.0))
    out = bench.wait_for_idle()
    assert out == {"enabled": True, "passed": True, "waited_sec": 0.0}


def test_gate_retries_until_idle(monkeypatch):
    loads = iter([5.0, 3.0, 0.5])
    monkeypatch.setattr(bench.os, "getloadavg",
                        lambda: (next(loads), 0, 0))
    clock = {"t": 0.0}
    monkeypatch.setattr(bench.time, "time", lambda: clock["t"])

    def fake_sleep(s):
        clock["t"] += s

    monkeypatch.setattr(bench.time, "sleep", fake_sleep)
    out = bench.wait_for_idle(poll_sec=15.0)
    assert out["passed"] and out["waited_sec"] == 30.0


def test_gate_gives_up_but_labels_the_run(monkeypatch):
    """A host that never settles must NOT block the bench forever — it
    proceeds, but the artifact says passed=false with the load it saw,
    so a reader discounts the numbers instead of reading a regression."""
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (9.9, 0, 0))
    clock = {"t": 0.0}
    monkeypatch.setattr(bench.time, "time", lambda: clock["t"])
    monkeypatch.setattr(bench.time, "sleep",
                        lambda s: clock.__setitem__("t", clock["t"] + s))
    out = bench.wait_for_idle(max_wait_sec=60.0, poll_sec=15.0)
    assert out["passed"] is False
    assert out["load1_at_giveup"] == 9.9
    assert out["waited_sec"] >= 60.0


def test_gate_env_disable(monkeypatch):
    monkeypatch.setenv("JIO_BENCH_LOAD_GATE", "0")
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (99.0, 0, 0))
    out = bench.wait_for_idle()
    assert out == {"enabled": False, "passed": True, "waited_sec": 0.0}
