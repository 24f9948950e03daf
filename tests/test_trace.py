"""Opt-in tracing hooks (xcurl_debug analogue + throughput counters)."""

import logging

import pytest

from deciphon_tpu.utils import trace


def test_scan_counters_math(caplog):
    c = trace.ScanCounters()
    # seqs of total length 30 x profiles of total core 12
    c.consume(30, 12)
    assert c.cells == 3 * 30 * 12
    with caplog.at_level(logging.INFO, logger="deciphon_tpu"):
        rate = c.report("unit")
    assert rate > 0
    assert any("GCUPS" in r.message for r in caplog.records)


def test_device_trace_noop_without_env(monkeypatch):
    monkeypatch.delenv("DCP_PROFILE_DIR", raising=False)
    with trace.device_trace("x"):
        pass  # must not require jax or a profiler


def test_http_debug_logs(monkeypatch, caplog):
    monkeypatch.setenv("DCP_DEBUG_HTTP", "1")
    assert trace.http_debug_enabled()
    with caplog.at_level(logging.DEBUG, logger="deciphon_tpu"):
        trace.log_http("GET", "/jobs/next_pend", 200, 0, 42)
    assert any(
        "GET /jobs/next_pend -> 200" in r.message for r in caplog.records
    )


def test_http_debug_via_real_client(monkeypatch, caplog, tmp_path):
    """The REST client emits wire lines through the fake scheduler."""
    from deciphon_tpu.server.api import SchedAPI
    from deciphon_tpu.server.fake_sched import FakeScheduler

    monkeypatch.setenv("DCP_DEBUG_HTTP", "1")
    fake = FakeScheduler(spool_dir=str(tmp_path / "spool"))
    url = fake.serve()
    try:
        api = SchedAPI(url)
        with caplog.at_level(logging.DEBUG, logger="deciphon_tpu"):
            assert api.is_reachable()
    finally:
        fake.shutdown()
    assert any("http GET" in r.message for r in caplog.records)
