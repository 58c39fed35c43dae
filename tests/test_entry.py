"""Driver-contract smoke: entry(), queries(), oracle_sql() consistency."""

from __future__ import annotations

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
