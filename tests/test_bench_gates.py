"""Artifact-integrity gates in bench.py (VERDICT r4 #6a).

The fenced ess_per_sec_chees_d24 row must never quietly read as
"tracked, null": on failure the emitted JSON carries the previous
successful value flagged stale PLUS the failure reason, and the
persisted last-good record never lets a failed phase overwrite the
field's last success.
"""

import importlib.util
import json
import os
import sys

import pytest

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
bench = importlib.util.module_from_spec(_spec)
sys.modules["bench"] = bench
_spec.loader.exec_module(bench)


def _base_result():
    return {"value": 1.0, "ess_per_sec_chees_d24": None}


def test_d24_failure_emits_last_good_and_error(tmp_path):
    path = str(tmp_path / "last_good.json")
    with open(path, "w") as f:
        json.dump({"ess_per_sec_chees_d24": 132600.0,
                   "measured_at": "2026-08-01T00:00:00"}, f)
    result = _base_result()
    record = bench._apply_d24_field_gate(result, "RuntimeError: wedged",
                                         last_good_path=path)
    assert result["ess_per_sec_chees_d24"] == 132600.0
    assert result["ess_per_sec_chees_d24_stale"] is True
    assert result["ess_per_sec_chees_d24_error"] == "RuntimeError: wedged"
    # the persisted record carries the last SUCCESS, never the failure,
    # WITH the field's true age (not this run's measured_at)
    assert record["ess_per_sec_chees_d24"] == 132600.0
    assert record["ess_per_sec_chees_d24_measured_at"] == \
        "2026-08-01T00:00:00"
    assert "ess_per_sec_chees_d24_stale" not in record
    assert "ess_per_sec_chees_d24_error" not in record


def test_d24_failure_without_history_still_carries_error(tmp_path):
    result = _base_result()
    record = bench._apply_d24_field_gate(
        result, "skipped via BENCH_SKIP_HIGHD",
        last_good_path=str(tmp_path / "missing.json"))
    assert result["ess_per_sec_chees_d24"] is None
    assert "ess_per_sec_chees_d24_stale" not in result
    assert result["ess_per_sec_chees_d24_error"] == \
        "skipped via BENCH_SKIP_HIGHD"
    assert record["ess_per_sec_chees_d24"] is None


def test_d24_success_passes_through_untouched(tmp_path):
    result = {"value": 1.0, "ess_per_sec_chees_d24": 99.5}
    record = bench._apply_d24_field_gate(
        result, None, last_good_path=str(tmp_path / "missing.json"))
    assert result == {"value": 1.0, "ess_per_sec_chees_d24": 99.5}
    assert record["ess_per_sec_chees_d24"] == pytest.approx(99.5)
    # fresh success stamps its own provenance
    assert record["ess_per_sec_chees_d24_measured_at"]


def test_d24_failure_never_overwrites_success_on_disk(tmp_path):
    """Round-trip: success -> failure -> the persisted record still
    holds the success (the scenario the verdict flagged: a persistent
    failure must not decay the record to null)."""
    path = str(tmp_path / "last_good.json")
    with open(path, "w") as f:
        json.dump({"ess_per_sec_chees_d24": 132600.0,
                   "measured_at": "2026-08-01T00:00:00"}, f)
    for _ in range(3):
        result = _base_result()
        record = bench._apply_d24_field_gate(result, "boom",
                                             last_good_path=path)
        with open(path, "w") as f:
            json.dump(record, f)
    final = json.load(open(path))
    assert final["ess_per_sec_chees_d24"] == 132600.0
    # ...and the field's true age survives repeated failures
    assert final["ess_per_sec_chees_d24_measured_at"] == \
        "2026-08-01T00:00:00"
