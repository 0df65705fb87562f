"""scripts/roofline.py pure helpers: floor math + battery-file parsing."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from roofline import V5E_PEAK_HBM_BPS, _floors, _measured_ms


def test_floor_math_bandwidth_bound():
    # 1 GFLOP over 1 GB: compute floor ~5us, bandwidth floor ~1.2ms
    f = _floors(1e9, 1e9, peak_flops=197e12)
    assert f["bound"] == "bandwidth"
    assert abs(f["bandwidth_floor_ms"] - 1e9 / V5E_PEAK_HBM_BPS * 1e3) < 1e-3
    assert f["sol_ms"] == f["bandwidth_floor_ms"]
    assert f["intensity_flops_per_byte"] == 1.0


def test_floor_math_compute_bound():
    f = _floors(1e15, 1e9, peak_flops=197e12)
    assert f["bound"] == "compute"
    assert f["sol_ms"] == f["compute_floor_ms"] > f["bandwidth_floor_ms"]


def test_measured_ms_parses_battery_lines(tmp_path):
    p = tmp_path / "bench.json"
    lines = [
        {"link_health": {"rtt_ms": 1.0}},  # non-metric line skipped
        {"metric": "moving render, batched 12 sources", "value": 19210.63,
         "unit": "audio-seconds/sec/chip"},
        {"metric": "unknown config", "value": 5.0},  # unmapped -> skipped
    ]
    p.write_text("\n".join(json.dumps(x) for x in lines))
    out = _measured_ms(p)
    # 12 sources x 60 s / (audio-s/s) -> ms per call
    assert abs(out["moving render, batched 12 sources"]
               - 12 * 60 / 19210.63 * 1e3) < 1e-6
    assert "unknown config" not in out
    assert _measured_ms(tmp_path / "absent.json") == {}
