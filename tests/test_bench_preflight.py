"""bench.py backend pre-flight: the probe loop must answer True on a healthy
backend and give up (False) by the deadline on a dead one, so the driver's
round-end bench either measures or emits its JSON error line — never hangs
(the relay outage this round left in-process device calls stuck in C++)."""

import time

import bench


def test_preflight_healthy_backend(monkeypatch):
    monkeypatch.setenv("BENCH_PROBE_PLATFORM", "cpu")
    assert bench._wait_for_backend(time.monotonic() + 120) is True


def test_preflight_dead_backend_times_out(monkeypatch):
    # a nonsense platform makes the probe subprocess fail fast, exercising
    # the retry loop without waiting out a real 240 s connection hang
    monkeypatch.setenv("BENCH_PROBE_PLATFORM", "no_such_platform")
    t0 = time.monotonic()
    assert bench._wait_for_backend(t0 + 8) is False
    assert time.monotonic() - t0 >= 7.5
