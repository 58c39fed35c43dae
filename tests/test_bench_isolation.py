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


def test_remeasure_series_keeps_best_attempt(monkeypatch):
    """r12: a key whose warm median reads > OUTLIER_FACTOR x its
    committed expectation is re-measured post-GC, best attempt wins;
    in-band keys never re-run."""
    st = bench._State("0.1")
    monkeypatch.setitem(bench._WATCHDOG, "spark", None)
    attempts = {"n": 0}

    def make_fn(sp):
        attempts["n"] += 1
        return (0.5, [0.45, 0.46, 0.47])  # quiet-host series

    # first measurement was a 5x outlier vs expected 0.4
    got = bench.remeasure_series(
        "k", make_fn, (2.0, [2.1, 2.2, 2.3]), {"k": 0.4}, st
    )
    assert attempts["n"] == 1  # one re-measure brought it in band
    assert sorted(got[1])[1] == 0.46
    assert st.remeasured["k"] == 1
    # in-band result: no re-measure at all
    st2 = bench._State("0.1")
    attempts["n"] = 0
    got2 = bench.remeasure_series(
        "k", make_fn, (0.41, [0.41, 0.42, 0.43]), {"k": 0.4}, st2
    )
    assert attempts["n"] == 0 and st2.remeasured == {}
    assert got2[1] == [0.41, 0.42, 0.43]
    # no expectation on file: never re-run, value stands
    st3 = bench._State("0.1")
    got3 = bench.remeasure_series(
        "unknown", make_fn, (9.0, [9.0, 9.1, 9.2]), {}, st3
    )
    assert got3[1] == [9.0, 9.1, 9.2] and st3.remeasured == {}


def test_remeasure_gives_up_after_max_attempts(monkeypatch):
    """A genuinely-slow key (every attempt out of band) records its
    best attempt after MAX_REMEASURES — a real regression must not
    retry forever or get masked."""
    st = bench._State("0.1")
    monkeypatch.setitem(bench._WATCHDOG, "spark", None)
    calls = {"n": 0}

    def make_fn(sp):
        calls["n"] += 1
        return (3.0, [3.0 - 0.1 * calls["n"]] * 3)

    got = bench.remeasure_series(
        "slow", make_fn, (3.5, [3.5, 3.6, 3.7]), {"slow": 0.4}, st
    )
    assert calls["n"] == bench.MAX_REMEASURES
    assert st.remeasured["slow"] == bench.MAX_REMEASURES
    assert sorted(got[1])[1] == pytest.approx(3.0 - 0.1 * calls["n"])


def test_safe_unit_retries_on_uds_after_watchdog_wedge(spark, monkeypatch):
    """r12 (verdict item 5): a watchdog-cancelled unit — a WEDGE, not
    an ordinary failure — must trigger one UDS-channel session restart
    and a retry, so the unit records a NUMBER instead of a null. The
    restart itself is stubbed (a real stop would kill the shared test
    session); its contract is covered by ensure_spark/get_spark tests."""
    import time

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    monkeypatch.setitem(bench._WATCHDOG, "spark", spark)
    monkeypatch.setitem(bench._WATCHDOG, "timeout", 8.0)
    monkeypatch.delenv("MDP_PY_UDS", raising=False)
    restarts = {"n": 0}

    def fake_restart(errors):
        restarts["n"] += 1
        os.environ["MDP_PY_UDS"] = "1"
        errors["__uds_recovery__"] = "stubbed"
        return spark

    monkeypatch.setattr(bench, "restart_with_uds", fake_restart)
    state = {"calls": 0}

    @F.udf(LongType())
    def stall_once(x):
        time.sleep(600)
        return x

    def unit(sp):
        state["calls"] += 1
        if state["calls"] == 1:  # the wedge: hangs until cancelled
            return sp.range(4).select(stall_once("id")).collect()
        return 42

    errors: dict[str, str] = {}
    try:
        val, _ = bench.safe_unit("wedgy", unit, errors)
    finally:
        monkeypatch.delenv("MDP_PY_UDS", raising=False)
    assert val == 42  # the retry recorded a number, not a null
    assert restarts["n"] == 1
    assert "wedgy__watchdog" in errors  # evidence retained
    assert "wedgy" not in errors  # the unit itself is not an error


def test_remeasure_budget_caps_global_attempts(monkeypatch):
    """r12: on a uniformly-slow host every key would read out of band;
    the GLOBAL budget stops re-measuring once spent so the run cannot
    triple in length — later keys record as measured."""
    monkeypatch.setitem(bench._WATCHDOG, "spark", None)
    monkeypatch.setitem(bench._REMEASURE_SPENT, "n", 0)
    monkeypatch.setattr(bench, "REMEASURE_BUDGET", 3)
    st = bench._State("0.1")
    calls = {"n": 0}

    def slow(sp):
        calls["n"] += 1
        return (9.0, [9.0, 9.0, 9.0])  # never comes in band

    exp = {f"k{i}": 0.1 for i in range(10)}
    for i in range(10):
        bench.remeasure_series(
            f"k{i}", slow, (9.0, [9.0, 9.0, 9.0]), exp, st
        )
    assert calls["n"] == 3  # budget, not 10 keys x MAX_REMEASURES
    assert bench._REMEASURE_SPENT["n"] == 3
    assert sum(st.remeasured.values()) == 3


def test_slim_line_stays_inside_driver_capture_window(tmp_path, capsys, monkeypatch):
    """r12: the driver parses only the LAST ~2000 stdout chars. With
    the REAL registry's key-name budget (57 slim keys, the longest
    real names) plus the r12 additions (errors + remeasured counters),
    the slim line must stay under the window; and a failure-heavy run
    (many nulls) must trigger the null-omission escalation rather
    than overflow."""
    import marketdatapipeline_spark.catalog_pipeline  # noqa: F401
    from marketdatapipeline_spark.catalog import REGISTRY

    monkeypatch.setattr(
        bench, "DETAIL_PATH", str(tmp_path / "bench_detail.json")
    )
    st = bench._State("0.1")
    st.timings["feature_pipeline_1m"] = 1.481
    st.timings["feature_pipeline_1m_1sym"] = 12.345
    st.timings["feature_pipeline_sf"] = 12.345
    for name in REGISTRY:
        st.timings[name] = 12.345
        st.med[name] = 12.345
    for i in range(30):
        st.errors[f"errkey_{i}"] = "boom"
    st.remeasured = {f"k{i}": 2 for i in range(20)}
    bench.emit(st)
    final = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(final) < 1950, len(final)
    parsed = json.loads(final)
    assert parsed["errors"] == 30 and parsed["remeasured"] == 20

    # failure-heavy variant: half the series null -> escalation drops
    # nulls and records the count, line still inside the window
    st2 = bench._State("0.1")
    st2.timings["feature_pipeline_1m"] = 1.481
    for j, name in enumerate(REGISTRY):
        st2.timings[name] = None if j % 2 else 12.345
        st2.med[name] = st2.timings[name]
        if j % 2:
            st2.errors[name] = "dead"
    # inflate with long synthetic keys to force past both guards
    for i in range(40):
        st2.timings[f"synthetic_failure_heavy_extended_key_{i:03d}"] = None
    bench.emit(st2)
    final2 = capsys.readouterr().out.strip().splitlines()[-1]
    parsed2 = json.loads(final2)
    assert len(final2) < 1950, len(final2)
    assert parsed2.get("nulls_omitted", 0) > 0
    assert all(v is not None for v in parsed2["queries"].values())


def test_emit_scaling_keys_land_last_in_detail_and_on_slim_line(
    tmp_path, capsys, monkeypatch
):
    """r13 (VERDICT r12 item 1): the driver captures only the LAST
    ~2000 stdout chars — r12's host telemetry, appended after
    st.scaling, pushed rows_per_sec_5m..100m out of the captured
    tail. The scaling keys must now be the FINAL keys of the detail
    line, and the largest decades must ride the slim line itself
    when the char budget allows."""
    monkeypatch.setattr(bench, "DETAIL_PATH", str(tmp_path / "d.json"))
    st = bench._State("0.1")
    st.timings["feature_pipeline_1m"] = 1.4
    st.scaling = {
        "rows_per_sec_5m": 1_530_000,
        "rows_per_sec_10m": 2_170_000,
        "rows_per_sec_50m": 2_770_000,
        "rows_per_sec_100m": 2_820_000,
    }
    st.host["decades_channel"] = "uds from 50M (proactive)"
    st.errors["some_unit"] = "boom " * 40  # long error must not displace scaling
    bench.emit(st)
    out = capsys.readouterr().out.strip().splitlines()
    detail_line, slim_line = out[-2], out[-1]
    # the four scaling keys are the last keys of the detail line: all
    # inside the final 200 chars, AFTER host/errors_detail
    tail = detail_line[-200:]
    for k in st.scaling:
        assert k in tail, f"{k} not in detail tail"
    assert detail_line.index('"host"') < detail_line.index("rows_per_sec_5m")
    # slim line carries at least the 100M decade (greedy from largest)
    slim = json.loads(slim_line)
    assert slim["rows_per_sec_100m"] == 2_820_000
    assert len(slim_line) <= 1900


def test_emit_slim_decade_carry_respects_char_budget(
    tmp_path, capsys, monkeypatch
):
    """A slim line already near the window must not be pushed past
    1900 by the decade carry — greedy add stops at the budget."""
    monkeypatch.setattr(bench, "DETAIL_PATH", str(tmp_path / "d.json"))
    st = bench._State("0.1")
    st.timings["feature_pipeline_1m"] = 1.4
    # inflate the slim queries dict to just under the 1900 budget so
    # the base line fits but a full decade carry would not
    i = 0
    while len(json.dumps(bench.build_result(st))) < 1870:
        st.timings[f"padding_query_with_a_rather_long_name_{i:03d}"] = 1.234
        i += 1
    st.scaling = {"rows_per_sec_100m": 2_820_000, "rows_per_sec_5m": 1}
    bench.emit(st)
    slim_line = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(slim_line) <= 1900
    slim = json.loads(slim_line)  # still parseable
    # the greedy carry added at most what fits (100m first if any)
    if "rows_per_sec_5m" in slim:
        assert "rows_per_sec_100m" in slim


def test_remeasure_records_first_attempt_alongside_best(monkeypatch):
    """r13 (ADVICE r12): best-attempt-wins is min-biased — the record
    must keep the first reading too, for both series and scalar."""
    monkeypatch.setitem(bench._WATCHDOG, "spark", None)
    monkeypatch.setitem(bench._REMEASURE_SPENT, "n", 0)
    st = bench._State("0.1")
    exp = {"k": 0.5, "s": 0.5}

    got = bench.remeasure_series(
        "k", lambda sp: (0.6, [0.6, 0.6, 0.6]), (2.0, [2.0, 2.0, 2.0]), exp, st
    )
    assert sorted(got[1])[1] == 0.6
    assert st.first_attempt["k"] == 2.0
    assert st.remeasured["k"] >= 1

    val = bench.remeasure_scalar("s", lambda sp: 0.55, 3.0, exp, st)
    assert val == 0.55
    assert st.first_attempt["s"] == 3.0
    # in-band keys record no first_attempt entry
    bench.remeasure_scalar("s2", lambda sp: 0.1, 0.6, {"s2": 0.5}, st)
    assert "s2" not in st.first_attempt


def test_per_key_factor_override_tightens_band(monkeypatch, tmp_path):
    """r13 (VERDICT r12 item 2): stable keys get a 1.5x band via
    bench_expected.json's "factors" map; unlisted keys keep the
    default 2.0x."""
    monkeypatch.setitem(bench._WATCHDOG, "spark", None)
    monkeypatch.setitem(bench._REMEASURE_SPENT, "n", 0)
    p = tmp_path / "expected.json"
    p.write_text(json.dumps({
        "expected": {"stable_key": 1.0, "noisy_key": 1.0},
        "factors": {"stable_key": 1.5},
    }))
    monkeypatch.setattr(bench, "EXPECTED_PATH", str(p))
    exp = bench.load_expected()
    assert bench._FACTORS == {"stable_key": 1.5}

    st = bench._State("0.1")
    # 1.8x the expectation: over the 1.5 band -> re-measured
    bench.remeasure_scalar("stable_key", lambda sp: 1.7, 1.8, exp, st)
    assert st.remeasured.get("stable_key", 0) >= 1
    # same reading on a default-band key: inside 2.0 -> untouched
    bench.remeasure_scalar("noisy_key", lambda sp: 1.7, 1.8, exp, st)
    assert "noisy_key" not in st.remeasured


def test_bench_expectations_cover_full_catalog_registry():
    """r14 (VERDICT r13 item 1): `dedup_duplicate_spans` landed after
    the r13 round-closing bench, so it had no committed median and no
    expectation entry — the re-measure band was blind to it. This
    invariant makes that failure mode a red test: every key in the
    full catalog registry (REGISTRY + EXTENDED_REGISTRY — exactly the
    set bench.py iterates) must carry an expectation in the committed
    bench_expected.json. An operator that ships without re-running
    the closing bench (tools/refresh_expected.py --write on a detail
    record that includes it) fails here instead of silently skipping
    the record."""
    import marketdatapipeline_spark.catalog_corpus  # noqa: F401
    import marketdatapipeline_spark.catalog_multimodal  # noqa: F401
    import marketdatapipeline_spark.catalog_operators  # noqa: F401
    import marketdatapipeline_spark.catalog_pipeline  # noqa: F401
    from marketdatapipeline_spark.catalog import EXTENDED_REGISTRY, REGISTRY

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "bench_expected.json")) as f:
        expected = set(json.load(f)["expected"])
    registry = set(REGISTRY) | set(EXTENDED_REGISTRY)
    missing = sorted(registry - expected)
    assert not missing, (
        f"bench_expected.json lacks expectations for {missing}; run the "
        "closing bench at HEAD and tools/refresh_expected.py --write"
    )


def test_committed_bench_detail_has_nonnull_median_for_every_key():
    """r15 (VERDICT r14 item 2): the r14 coverage invariant guarded
    *expectations* only, so `dedup_near_removal` shipped with a seeded
    expectation but a null median in the committed detail record —
    the exact r13 hole with a new key. This closes it: every key in
    the full catalog registry must carry a NON-NULL median in the
    newest committed BENCH_DETAIL_r*.json. A code-touching commit
    that lands after the round-closing bench (without re-running it)
    fails here instead of leaving an unmeasured key in the record."""
    import re

    import marketdatapipeline_spark.catalog_corpus  # noqa: F401
    import marketdatapipeline_spark.catalog_multimodal  # noqa: F401
    import marketdatapipeline_spark.catalog_operators  # noqa: F401
    import marketdatapipeline_spark.catalog_pipeline  # noqa: F401
    from marketdatapipeline_spark.catalog import EXTENDED_REGISTRY, REGISTRY

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    records = []
    for name in os.listdir(repo):
        m = re.match(r"BENCH_DETAIL_r(\d+)(?:_run(\d+))?\.json$", name)
        if m:
            records.append(
                (int(m.group(1)), int(m.group(2) or 99), name)
            )
    assert records, "no committed BENCH_DETAIL_r*.json record found"
    newest = max(records)[2]
    with open(os.path.join(repo, newest)) as f:
        med = json.load(f).get("queries_med", {})
    registry = set(REGISTRY) | set(EXTENDED_REGISTRY)
    holes = sorted(k for k in registry if med.get(k) is None)
    assert not holes, (
        f"{newest} has null/missing medians for {holes}; re-run the "
        "closing bench at HEAD so every registry key has a committed "
        "median (the bench+sweep must be the round's last "
        "code-affecting act)"
    )
