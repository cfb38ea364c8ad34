"""Unit tests for bench.py's self-calibration machinery (round 10).

No SparkSession needed: the probe itself is exercised by running bench,
while these tests pin the pure logic — host/tree jiffy accounting and
the regression/contended/transient classification — so a refactor can't
silently break the host-drift defense (r9: six runs, fully rotating
phantom flag sets from co-tenant load).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_host_busy_jiffies_monotonic():
    a = bench._host_busy_jiffies()
    # burn a little CPU so the counter must advance
    sum(i * i for i in range(2_000_000))
    b = bench._host_busy_jiffies()
    assert b >= a
    assert b > 0


def test_our_tree_jiffies_counts_self():
    a = bench._our_tree_jiffies()
    sum(i * i for i in range(5_000_000))
    b = bench._our_tree_jiffies()
    assert a > 0
    assert b >= a


def test_contention_meter_window_bounded_by_host():
    m = bench._ContentionMeter()
    m.start()
    sum(i * i for i in range(2_000_000))
    ext = m.stop()
    # our own burn must NOT count as external load; co-tenants may add
    # real load, so only bound it by the machine size
    assert 0.0 <= ext <= os.cpu_count()


def test_regressions_classification(monkeypatch):
    prev = {"q_slow": 1.0, "q_fine": 1.0, "q_contended": 1.0, "q_small": 0.1}
    monkeypatch.setattr(bench, "_prev_timings", lambda sf: prev)
    timings = {
        "q_slow": 2.0,        # 2x, +1.0s, quiet window -> regression
        "q_fine": 1.2,        # under both thresholds -> clean
        "q_contended": 2.0,   # 2x but 5 ext cores -> contended
        "q_small": 0.14,      # 1.4x ratio but 0.04s delta -> clean
        "q_new": 3.0,         # no baseline -> clean
    }
    ext = {"q_slow": 0.1, "q_fine": 0.0, "q_contended": 5.0,
           "q_small": 0.0, "q_new": 0.0}
    v = bench._regressions(timings, 0.1, host_factor=1.0, ext_load=ext)
    assert set(v["regressions"]) == {"q_slow"}
    assert set(v["contended"]) == {"q_contended"}
    assert v["transient"] == {}


def test_regressions_host_factor_divides_but_never_masks(monkeypatch):
    prev = {"q": 1.0}
    monkeypatch.setattr(bench, "_prev_timings", lambda sf: prev)
    # 1.8x raw on a 1.7x-slow host: normalized 1.06x -> clean
    v = bench._regressions({"q": 1.8}, 0.1, host_factor=1.7,
                           ext_load={"q": 0.0})
    assert v["regressions"] == {}
    # a FASTER-than-baseline host (factor < 1) must not scale times UP:
    # 1.2x raw stays 1.2x, still clean — and a real 2x stays flagged
    v = bench._regressions({"q": 2.1}, 0.1, host_factor=0.8,
                           ext_load={"q": 0.0})
    assert set(v["regressions"]) == {"q"}
    assert v["regressions"]["q"]["normalized_sec"] == 2.1

def test_prev_timings_prefers_repo_baseline():
    # BENCH_BASELINE.json (r11) is the guard's source of truth at its
    # recorded sf; BENCH_r*.json wrappers are fallback only
    import json
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_BASELINE.json")) as f:
        base = json.load(f)
    got = bench._prev_timings(base["sf"])
    assert got == base["queries"]
    assert base["ref_sec"] == bench._CALIBRATION_REF_SEC, (
        "baseline and calibration ref must be re-recorded TOGETHER")


def test_looks_like_timings_rejects_mangled_recovery():
    known = {"item_info_flagship", "exact_dedup"}
    assert bench._looks_like_timings(
        {"item_info_flagship": 1.2, "exact_dedup": 0.5}, known)
    # truncation artifacts: nested dicts, unknown keys, empties
    assert not bench._looks_like_timings({"item_info_flagship": {}}, known)
    assert not bench._looks_like_timings({"mangled_key": 1.0}, known)
    assert not bench._looks_like_timings({}, known)
    assert not bench._looks_like_timings(None, known)


def test_record_baseline_refuses_dirty_run(tmp_path, monkeypatch, capsys):
    import json
    monkeypatch.setattr(bench.os.path, "dirname", lambda p: str(tmp_path))
    clean = {
        "sf": 0.1, "value": 1.0, "core_16_sec": 1.0, "streaming": {},
        "queries": {"q": 1.0},
        "calibration": {"host_factor": 1.0, "probe_pre_sec": 1.0,
                        "probe_post_sec": 1.0},
        "regressions": {}, "contended": {}, "transient": {},
    }
    # flagged run -> refused
    dirty = dict(clean, regressions={"q": {"factor": 2.0}})
    bench._record_baseline(dirty)
    assert not os.path.exists(tmp_path / "BENCH_BASELINE.json")
    # slowed host -> refused (stricter than the 1.6x drift warning)
    slowed = dict(clean, calibration=dict(clean["calibration"],
                                          host_factor=1.3))
    bench._record_baseline(slowed)
    assert not os.path.exists(tmp_path / "BENCH_BASELINE.json")
    # clean quiet run -> recorded with the CURRENT ref
    bench._record_baseline(clean)
    with open(tmp_path / "BENCH_BASELINE.json") as f:
        rec = json.load(f)
    assert rec["queries"] == {"q": 1.0}
    assert rec["ref_sec"] == bench._CALIBRATION_REF_SEC
