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
