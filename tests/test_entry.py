"""Driver-contract smoke: entry(), queries(), oracle_sql() consistency."""

from __future__ import annotations

import os

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def test_entry_runs_and_has_stable_schema(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    cols = set(df.columns)
    assert {"symbol", "datetime", "close", "rsi", "macd", "target"} <= cols


def test_queries_and_oracles_align(spark):
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 18


def test_every_query_runs_on_smoke_tier(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name


def test_gate_coverage_invariant():
    """The external correctness gate checks only the first GATE_LIMIT
    registered queries (r4 lesson: similarity_* silently fell off at
    positions 50-53). ordered_registry() must keep every non-tail query
    inside the gate window and place exactly the documented trivial
    GATE_TAIL last, so registry growth past the cap fails HERE instead
    of silently dropping oracle coverage."""
    import marketdatapipeline_spark.catalog_multimodal  # noqa: F401
    import marketdatapipeline_spark.catalog_operators  # noqa: F401
    import marketdatapipeline_spark.catalog_pipeline  # noqa: F401
    from marketdatapipeline_spark.catalog import GATE_LIMIT, GATE_TAIL, ordered_registry

    names = list(ordered_registry())
    gated = set(names[:GATE_LIMIT])
    ungated = names[GATE_LIMIT:]
    # anything outside the gate must be a documented tail query
    assert set(ungated) <= set(GATE_TAIL), (
        f"non-tail queries fell outside the {GATE_LIMIT}-query gate: "
        f"{sorted(set(ungated) - set(GATE_TAIL))}"
    )
    # the never-gated-before and novel families must sit inside the gate
    critical = [n for n in names if n.startswith(("similarity_", "approx_", "streaming_"))]
    assert critical, "critical query families missing from registry"
    assert set(critical) <= gated, sorted(set(critical) - gated)


def test_ordered_registry_failure_modes():
    """ordered_registry must refuse (not silently reorder) when a tail
    query is missing or when non-tail queries would overflow the gate."""
    import pytest

    import marketdatapipeline_spark.catalog_multimodal  # noqa: F401
    import marketdatapipeline_spark.catalog_operators  # noqa: F401
    import marketdatapipeline_spark.catalog_pipeline  # noqa: F401
    from marketdatapipeline_spark import catalog
    from marketdatapipeline_spark.catalog import QuerySpec, ordered_registry

    saved_registry = dict(catalog.REGISTRY)
    saved_limit = catalog.GATE_LIMIT
    try:
        missing_tail = catalog.GATE_TAIL[0]
        del catalog.REGISTRY[missing_tail]
        with pytest.raises(KeyError, match=missing_tail):
            ordered_registry()
        catalog.REGISTRY.update(saved_registry)

        catalog.GATE_LIMIT = 3
        with pytest.raises(RuntimeError, match="exceed"):
            ordered_registry()
    finally:
        catalog.GATE_LIMIT = saved_limit
        catalog.REGISTRY.clear()
        catalog.REGISTRY.update(saved_registry)
        assert isinstance(next(iter(catalog.REGISTRY.values())), QuerySpec)


def test_approx_bound_formula(spark):
    """The approx-certification bound formula must reject known-off
    sketch values — shared constants + Column formula live in
    catalog_operators so the gate rows cannot self-certify through a
    broken multiplier or misplaced abs() (ADVICE r5)."""
    from pyspark.sql import functions as F

    from marketdatapipeline_spark.catalog_operators import (
        APPROX_CD_BOUND,
        APPROX_CD_RSD,
        APPROX_PCT_REL_BOUND,
        approx_within_rel_bound,
    )

    assert APPROX_CD_BOUND == 3.0 * APPROX_CD_RSD  # documented 3-sigma contract

    def check(cases, bound):
        df = spark.createDataFrame(
            [(float(a), float(e)) for a, e, _ in cases],
            "approx double, exact double",
        )
        got = [
            r["ok"]
            for r in df.select(
                approx_within_rel_bound(
                    F.col("approx"), F.col("exact"), bound
                ).alias("ok")
            ).collect()
        ]
        assert got == [x for *_, x in cases], (bound, got)

    check(
        [
            (114.9, 100.0, True),   # just inside 15%
            (115.1, 100.0, False),  # just past it
            (85.1, 100.0, True),    # symmetric low side
            (84.9, 100.0, False),
        ],
        APPROX_CD_BOUND,
    )
    check(
        [
            (-104.9, -100.0, True),   # negative exact: abs on BOTH sides
            (-105.1, -100.0, False),
            (0.0, 0.0, True),         # degenerate zero group
            (1.0, 0.0, False),
        ],
        APPROX_PCT_REL_BOUND,
    )


def test_scoped_persist_released_between_catalog_queries(spark):
    """Catalog invocations must free the previous query's scoped
    caches (ADVICE r5: persists accumulated in long sessions)."""
    from pyspark.sql import functions as F

    from marketdatapipeline_spark import caching
    from marketdatapipeline_spark.catalog import REGISTRY

    caching.release_caches()
    df = caching.scoped_persist(spark.range(10).select(F.col("id")))
    assert df.count() == 10
    assert df.storageLevel.useMemory
    assert len(caching._LIVE) == 1
    # any catalog invocation triggers the release of prior caches
    REGISTRY["bars_source"].fn(spark, "/root/testdata/sf0.001")
    assert len(caching._LIVE) == 0
    assert not df.storageLevel.useMemory  # actually unpersisted


def test_extended_surface_complete_in_fresh_interpreter():
    """r9 VERDICT item 5: extended_queries()/extended_oracle_sql() used
    to omit the catalog_operators import and only worked because
    catalog_corpus transitively imported it — one refactor away from
    silently dropping every operators-module extended entry. Run in a
    fresh interpreter (no conftest imports to mask the hole) and check
    the entry module's own surface matches the union of all four
    catalog modules' registrations."""
    import json
    import subprocess
    import sys

    code = (
        "import json, __spark_entry__ as e\n"
        "got = set(e.extended_queries())\n"
        "import marketdatapipeline_spark.catalog_corpus\n"
        "import marketdatapipeline_spark.catalog_multimodal\n"
        "import marketdatapipeline_spark.catalog_operators\n"
        "import marketdatapipeline_spark.catalog_pipeline\n"
        "from marketdatapipeline_spark.catalog import EXTENDED_REGISTRY\n"
        "print(json.dumps({'got': len(got),"
        " 'want': len(EXTENDED_REGISTRY),"
        " 'missing': sorted(set(EXTENDED_REGISTRY) - got)[:5]}))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-1000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["got"] == res["want"], res["missing"]
    assert res["want"] >= 176
