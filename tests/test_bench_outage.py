"""bench.py outage handling: retry-until-deadline + stale-headline fallback.

VERDICT r3 (missing #2 / weak #1): a single 120 s probe emitted a hard 0.0
headline (BENCH_r03.json) during a transient tunnel outage — a trend line an
automated consumer misreads as a catastrophic regression. The contract under
test: (a) the probe loop retries until the deadline, (b) a hard failure
emits the most recent healthy measurement marked ``stale`` with provenance,
(c) 0.0 is only possible when no prior measurement exists anywhere.
"""

import json

import bench


def test_probe_retries_until_success():
    calls = []

    def flaky(timeout_s):
        calls.append(timeout_s)
        return len(calls) >= 3

    assert bench._device_reachable(
        deadline_s=10.0, interval_s=0.0, probe=flaky
    )
    assert len(calls) == 3


def test_probe_gives_up_at_deadline():
    calls = []

    def dead(timeout_s):
        calls.append(timeout_s)
        return False

    assert not bench._device_reachable(
        deadline_s=0.05, interval_s=0.01, probe=dead
    )
    assert len(calls) >= 2  # retried at least once past the first failure


def _write(path, obj):
    path.write_text(json.dumps(obj) if isinstance(obj, dict) else obj)


def test_stale_fallback_prefers_cache(tmp_path):
    (tmp_path / "data").mkdir()
    _write(
        tmp_path / "data" / "bench_headline_last.json",
        {"metric": bench._HEADLINE_METRIC, "value": 123.4,
         "unit": "audio-seconds/sec/chip", "vs_baseline": 2.468},
    )
    _write(
        tmp_path / "BENCH_r02.json",
        {"parsed": {"metric": bench._HEADLINE_METRIC, "value": 99.0}},
    )
    rec = bench.emit_unreachable(tmp_path)
    assert rec["stale"] is True
    assert rec["value"] == 123.4
    assert rec["stale_source"] == "bench_headline_last.json"
    assert "error" in rec


def test_stale_fallback_scans_driver_records(tmp_path):
    # r3 recorded a 0.0 (outage); r2 holds the newest healthy number.
    _write(
        tmp_path / "BENCH_r02.json",
        {"parsed": {"metric": bench._HEADLINE_METRIC, "value": 22227.0,
                    "unit": "audio-seconds/sec/chip"}},
    )
    _write(
        tmp_path / "BENCH_r03.json",
        {"parsed": {"metric": bench._HEADLINE_METRIC, "value": 0.0}},
    )
    rec = bench.emit_unreachable(tmp_path)
    assert rec["stale"] is True
    assert rec["value"] == 22227.0
    assert rec["stale_source"] == "BENCH_r02.json"


def test_stale_fallback_uses_battery_line(tmp_path):
    _write(
        tmp_path / "BENCH_ALL_r03.json",
        json.dumps({"link_health": {"degraded": True}}) + "\n"
        + json.dumps({"metric": "moving render, batched 12 sources",
                      "value": 19689.94,
                      "unit": "audio-seconds/sec/chip"}) + "\n",
    )
    rec = bench.emit_unreachable(tmp_path)
    assert rec["stale"] is True
    assert rec["value"] == 19689.94
    assert rec["metric"] == bench._HEADLINE_METRIC  # relabeled
    assert rec["stale_source"] == "BENCH_ALL_r03.json"


def test_no_prior_measurement_emits_error_zero(tmp_path):
    rec = bench.emit_unreachable(tmp_path)
    assert rec["value"] == 0.0
    assert "no prior healthy headline" in rec["error"]


def test_real_repo_always_has_a_fallback():
    # The committed repo must never again produce a bare 0.0: r1/r2
    # records are committed, so the fallback always finds a number.
    rec = bench.emit_unreachable()
    assert rec.get("value", 0) > 0
    assert rec.get("stale") is True


def test_link_classification_thresholds():
    """The degraded stamp means "numbers are meaningless, retry later":
    its RTT trigger is the transient 10-100x collapse (>100 ms), not the
    tunnel's persistent ~25-32 ms floor (disclosed separately via
    rtt_above_r2_baseline); the download trigger (15 MB/s) splits the
    observed healthy (~23-30) vs collapsed (<=8.8) bandwidth clusters."""
    from bench_all import _classify_link

    # r4's best observed windows: floor RTT, healthy bandwidth -> clean
    h = _classify_link(rtt_ms=28.0, down_mbps=27.0)
    assert h == {"degraded": False, "degraded_reason": [],
                 "rtt_above_r2_baseline": True}
    # r2-era ideal link
    h = _classify_link(rtt_ms=5.0, down_mbps=23.0)
    assert not h["degraded"] and not h["rtt_above_r2_baseline"]
    # transient RTT collapse
    h = _classify_link(rtt_ms=450.0, down_mbps=25.0)
    assert h["degraded"] and h["degraded_reason"] == ["rtt"]
    # bandwidth collapse (the 2026-08-19 8.8 MB/s window)
    h = _classify_link(rtt_ms=44.0, down_mbps=8.8)
    assert h["degraded"] and h["degraded_reason"] == ["download"]
    # both collapsed
    h = _classify_link(rtt_ms=2000.0, down_mbps=1.0)
    assert h["degraded_reason"] == ["rtt", "download"]
