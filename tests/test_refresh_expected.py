"""tools/refresh_expected.py — the scripted bench-expectation refresh
(r13, VERDICT r12 item 7): expected = per-key min over the input
detail records, stable keys get the tightened factor, and a >1.5x
drift vs the committed file fails without --force."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

import refresh_expected as rx  # noqa: E402


def _detail(path, med):
    path.write_text(json.dumps({"queries": med, "queries_med": med}))
    return str(path)


def test_build_takes_min_and_tightens_stable_keys(tmp_path):
    a = _detail(
        tmp_path / "a.json",
        {"stable": 1.0, "noisy": 1.0, "feature_pipeline_1m": 1.5,
         "rows_per_sec_5m": 1_000_000.0},
    )
    b = _detail(
        tmp_path / "b.json",
        {"stable": 1.2, "noisy": 2.0, "feature_pipeline_1m": 1.4,
         "only_b": 0.5},
    )
    payload = rx.build([a, b])
    exp, fac = payload["expected"], payload["factors"]
    assert exp["stable"] == 1.0 and exp["noisy"] == 1.0
    assert exp["only_b"] == 0.5
    # 1.2x spread <= STABLE_RATIO -> tightened; 2x spread -> default
    assert fac.get("stable") == rx.STABLE_FACTOR
    assert "noisy" not in fac
    # single-record keys are never tightened
    assert "only_b" not in fac
    # headline family and throughput keys are excluded from factors
    assert "feature_pipeline_1m" not in fac
    assert "rows_per_sec_5m" not in fac


def test_drift_guard_flags_large_moves(tmp_path, monkeypatch):
    committed = tmp_path / "bench_expected.json"
    committed.write_text(
        json.dumps({"expected": {"k1": 1.0, "k2": 1.0}})
    )
    monkeypatch.setattr(rx, "EXPECTED_PATH", str(committed))
    bad = rx.drift_report({"k1": 0.5, "k2": 1.2, "k_new": 9.0})
    assert len(bad) == 1 and bad[0].startswith("k1:")  # 2x move flagged
    # new keys never drift; in-band moves pass
    assert not rx.drift_report({"k2": 1.3, "k_new": 9.0})


def test_main_exits_nonzero_on_drift_without_force(tmp_path, monkeypatch, capsys):
    committed = tmp_path / "bench_expected.json"
    committed.write_text(json.dumps({"expected": {"k1": 1.0}}))
    monkeypatch.setattr(rx, "EXPECTED_PATH", str(committed))
    d = _detail(tmp_path / "d.json", {"k1": 0.3})
    monkeypatch.setattr(sys, "argv", ["refresh_expected.py", d])
    assert rx.main() == 1
    # --force writes, records the source, and keeps valid JSON
    monkeypatch.setattr(
        sys, "argv", ["refresh_expected.py", d, "--write", "--force"]
    )
    assert rx.main() == 0
    out = json.loads(committed.read_text())
    assert out["expected"]["k1"] == 0.3
    assert "d.json" in out["source"]
