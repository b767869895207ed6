"""bench.py's clobber guard: a contended capture must never overwrite
a committed solo bench_summary.json (VERDICT r11 item 3)."""

import importlib.util
import json
import os

_spec = importlib.util.spec_from_file_location(
    "bench_mod", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench_mod)


def _write(path, contended):
    with open(path, "w") as f:
        json.dump({"contended": contended}, f)


def test_solo_run_always_writes_canonical(tmp_path):
    assert bench_mod._summary_path(False, str(tmp_path)) == str(
        tmp_path / "bench_summary.json"
    )
    _write(tmp_path / "bench_summary.json", False)
    assert bench_mod._summary_path(False, str(tmp_path)) == str(
        tmp_path / "bench_summary.json"
    )


def test_contended_run_diverts_from_solo_record(tmp_path):
    _write(tmp_path / "bench_summary.json", False)
    assert bench_mod._summary_path(True, str(tmp_path)) == str(
        tmp_path / "bench_summary.contended.json"
    )


def test_contended_run_may_replace_contended_record(tmp_path):
    _write(tmp_path / "bench_summary.json", True)
    assert bench_mod._summary_path(True, str(tmp_path)) == str(
        tmp_path / "bench_summary.json"
    )


def test_contended_run_writes_when_no_record(tmp_path):
    assert bench_mod._summary_path(True, str(tmp_path)) == str(
        tmp_path / "bench_summary.json"
    )


def test_loadavg_boundary_is_contended(monkeypatch):
    """r13 regression: a capture launched at loadavg exactly 2.0 passed
    the old strict-> test as 'solo' and clobbered the committed record
    (140.9s over a 125.1s clean baseline). The bar is now >= 1.0 —
    this host idles near 0, so sustained 1.0+ at launch is foreign
    load, and 2.0 demonstrably inflated timings 1.13x."""
    monkeypatch.setattr(bench_mod, "_loadavg", lambda: 2.0)
    assert bench_mod._is_contended(bench_mod._loadavg()) is True
    assert bench_mod._is_contended(1.0) is True
    assert bench_mod._is_contended(0.99) is False
    assert bench_mod._is_contended(None) is False


def _write_solo(path, queries):
    with open(path, "w") as f:
        json.dump({"contended": False, "queries": queries}, f)


def test_inflated_capture_diverts_even_when_loadavg_clean(tmp_path, capsys):
    """Second line of defense: loadavg can miss contention (short
    spikes, steal time). A 'solo' capture whose common-row sum is >10%
    slower than the committed solo record diverts instead of
    clobbering."""
    _write_solo(tmp_path / "bench_summary.json", {"q1": 10.0, "q2": 10.0})
    got = bench_mod._summary_path(
        False, str(tmp_path), {"q1": 12.0, "q2": 11.0, "q_new": 5.0}
    )
    assert got == str(tmp_path / "bench_summary.contended.json")
    assert "undetected contention" in capsys.readouterr().err


def test_faster_or_in_band_capture_replaces_solo_record(tmp_path):
    """Contention only inflates: a faster capture is a better solo
    record, and <=10% drift is the host's normal noise band."""
    _write_solo(tmp_path / "bench_summary.json", {"q1": 10.0, "q2": 10.0})
    for new in ({"q1": 8.0, "q2": 9.0}, {"q1": 10.5, "q2": 10.4}):
        assert bench_mod._summary_path(False, str(tmp_path), new) == str(
            tmp_path / "bench_summary.json"
        )


def test_drift_guard_ignores_disjoint_query_sets(tmp_path):
    """No common rows (e.g. SPARK_GRAFT_BENCH_ONLY subset debugging
    against a full record) -> nothing comparable, write canonical."""
    _write_solo(tmp_path / "bench_summary.json", {"q1": 10.0})
    assert bench_mod._summary_path(False, str(tmp_path), {"qx": 99.0}) == str(
        tmp_path / "bench_summary.json"
    )
