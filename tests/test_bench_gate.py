"""bench.py host-load gate (VERDICT r4 #2): the measurement must not start
under load, and a never-idle host proceeds with a warning rather than
hanging forever."""

from __future__ import annotations

import os

import bench


def test_idle_host_passes_immediately(monkeypatch):
    monkeypatch.setattr(os, "getloadavg", lambda: (0.2, 0.5, 0.5))
    assert bench.wait_for_idle_host(max_load=1.0, max_wait_sec=0.1) == 0.2


def test_loaded_host_waits_then_proceeds_with_flagged_load(monkeypatch):
    calls = {"n": 0}

    def fake_load():
        calls["n"] += 1
        return (5.0, 5.0, 5.0)

    slept = []
    monkeypatch.setattr(os, "getloadavg", fake_load)
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
    load = bench.wait_for_idle_host(max_load=1.0, max_wait_sec=0.0)
    assert load == 5.0  # recorded as-is so bench_compare can flag the run
    assert calls["n"] >= 1 and not slept  # deadline already past: no sleep


def test_load_drop_releases_the_gate(monkeypatch):
    seq = iter([(3.0,) * 3, (2.0,) * 3, (0.4,) * 3])
    monkeypatch.setattr(os, "getloadavg", lambda: next(seq))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.wait_for_idle_host(max_load=1.0, max_wait_sec=60.0) == 0.4
