"""Bench fault isolation: one dead Python worker must not zero the
round's bench record.

Round 9's driver bench died with a single Arrow-stream "Connection
reset" (a Python worker was killed mid-batch on a loaded host) and
BENCH_r09.json recorded ``rc: 1, parsed: null`` — the whole round's
headline evidence was lost. These tests pin the structural fixes in
bench.py: per-query ``safe()`` isolation, session liveness recovery,
and a final line that is always emitted and always parseable.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_safe_records_error_and_continues():
    errors: dict[str, str] = {}

    def boom():
        raise RuntimeError("worker died")

    assert bench.safe("q1", boom, errors) is None
    assert "worker died" in errors["q1"]
    assert bench.safe("q2", lambda: 42, errors) == 42
    assert "q2" not in errors


def test_safe_truncates_huge_errors():
    errors: dict[str, str] = {}
    bench.safe("q", lambda: (_ for _ in ()).throw(ValueError("x" * 10_000)), errors)
    assert len(errors["q"]) <= 300


def test_build_result_with_failures_is_parseable():
    st = bench._State("0.01")
    st.timings["feature_pipeline_1m"] = None  # headline itself failed
    st.timings["q_ok"] = 1.23456
    st.timings["q_dead"] = None
    st.med["q_ok"] = 1.2
    st.med["q_dead"] = None
    st.errors["q_dead"] = "Py4JJavaError(...)"
    result = bench.build_result(st)
    line = json.dumps(result)  # must not raise
    back = json.loads(line)
    assert back["value"] is None
    assert back["rows_per_sec_1m"] is None
    assert back["queries"]["q_ok"] == 1.2
    assert back["queries"]["q_dead"] is None
    assert back["errors"] == 1


def test_emit_final_line_parseable_with_partial_state(tmp_path, capsys, monkeypatch):
    # even a state captured mid-crash (half-filled dicts) must emit a
    # valid final line and a bench_detail.json
    monkeypatch.setattr(
        bench, "DETAIL_PATH", str(tmp_path / "bench_detail.json")
    )
    st = bench._State("0.1")
    st.timings["feature_pipeline_1m"] = 1.5
    st.timings["q_dead"] = None
    st.cold["q_dead"] = None
    st.errors["q_dead"] = "ConnectionReset"
    st.errors["__fatal__"] = "SparkContext stopped"
    bench.emit(st)
    out = capsys.readouterr().out.strip().splitlines()
    final = json.loads(out[-1])
    assert final["value"] == 1.5
    assert final["queries"]["q_dead"] is None
    detail = json.loads((tmp_path / "bench_detail.json").read_text())
    assert detail["errors_detail"]["__fatal__"] == "SparkContext stopped"


def test_ensure_spark_returns_live_session(spark):
    errors: dict[str, str] = {}
    assert bench.ensure_spark(spark, errors) is spark
    assert not errors


def test_worker_death_is_isolated_and_session_survives(spark):
    """The exact r9 failure shape: a Python worker dies abruptly
    mid-stream (os._exit bypasses all Python cleanup → the JVM sees
    the socket reset). safe() must swallow it, and the SAME session
    must then run the next query normally."""

    def kill_worker(batches):
        for _ in batches:
            os._exit(1)  # simulate OOM-killed worker
        yield  # pragma: no cover

    df = spark.range(100).repartition(2)
    victim = df.mapInPandas(kill_worker, schema="id long")

    errors: dict[str, str] = {}
    got = bench.safe("victim", lambda: bench.materialize(victim), errors)
    assert got is None
    assert "victim" in errors

    # session is still alive and subsequent queries run
    alive = bench.ensure_spark(spark, errors)
    assert alive.range(10).count() == 10
    assert "__session_restart__" not in errors


@pytest.mark.full
def test_bench_main_emits_final_line_despite_injected_failure(
    monkeypatch, capsys, tmp_path
):
    """End-to-end: run bench.main() at the tiny tier with a registry
    entry that kills its worker; the run must finish rc-clean with a
    parseable final line where the victim is null and real queries
    have numbers. bench_detail.json is redirected to tmp so this
    sf0.001 fault-injection run cannot clobber the repo's real
    sf0.1 record (it did once, r10)."""
    monkeypatch.setattr(
        bench, "DETAIL_PATH", str(tmp_path / "bench_detail.json")
    )
    import marketdatapipeline_spark.catalog_corpus  # noqa: F401
    import marketdatapipeline_spark.catalog_multimodal  # noqa: F401
    import marketdatapipeline_spark.catalog_operators  # noqa: F401
    import marketdatapipeline_spark.catalog_pipeline  # noqa: F401
    from marketdatapipeline_spark.catalog import REGISTRY, QuerySpec

    def victim_fn(spark, sf_dir):
        def kill(batches):
            for _ in batches:
                os._exit(1)
            yield  # pragma: no cover

        return spark.range(10).mapInPandas(kill, schema="id long")

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("MDP_BENCH_SKIP_SCALING", "1")
    monkeypatch.setitem(
        REGISTRY,
        "zz_injected_worker_kill",
        QuerySpec(fn=victim_fn, sql=None),
    )
    try:
        bench.main()
    finally:
        REGISTRY.pop("zz_injected_worker_kill", None)
    out = capsys.readouterr().out.strip().splitlines()
    final = json.loads(out[-1])
    assert final["queries"]["zz_injected_worker_kill"] is None
    assert final["errors"] >= 1
    numbers = [v for v in final["queries"].values() if v is not None]
    assert len(numbers) > 30  # the rest of the suite still measured


def test_watchdog_cancels_hung_unit_and_run_continues(spark):
    """r11: a WEDGED worker (hang, not death — observed live as both
    loopback socket queues full at the 50M decade) must be cancelled
    by the unit watchdog and recorded as an ordinary per-query error,
    with the next unit unaffected."""
    import time

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    old_spark, old_timeout = bench._WATCHDOG["spark"], bench._WATCHDOG["timeout"]
    bench._WATCHDOG["spark"] = spark
    bench._WATCHDOG["timeout"] = 10.0
    errors: dict[str, str] = {}
    try:
        @F.udf(LongType())
        def stall(x):
            time.sleep(1800)
            return x

        def hung_unit():
            return spark.range(4).select(stall("id")).collect()

        t0 = time.monotonic()
        assert bench.safe("hung", hung_unit, errors) is None
        assert time.monotonic() - t0 < 120  # cancelled, not 1800s
        assert "hung__watchdog" in errors
        assert "hung" in errors  # the cancellation surfaced as an error
        # the session survives and the next unit runs clean
        assert bench.safe("next", lambda: spark.range(5).count(), errors) == 5
        assert "next" not in errors
    finally:
        bench._WATCHDOG["spark"] = old_spark
        bench._WATCHDOG["timeout"] = old_timeout
