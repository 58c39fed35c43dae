"""Automated value checks for the four gate-exempt GATE_TAIL queries.

The external driver gate hash-checks only the first GATE_LIMIT
registered queries; the four GATE_TAIL queries sit outside it by
documented design (catalog.py). Until r6 their cell-exact DuckDB
comparison only ran when a human invoked tools/check_oracle.py — this
test closes that hole: any semantic drift in union_align / pivot /
unpivot / topk now fails the ordinary pytest run.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_oracle import compare  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TAIL_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def registry():
    import marketdatapipeline_spark.catalog_multimodal  # noqa: F401
    import marketdatapipeline_spark.catalog_operators  # noqa: F401
    import marketdatapipeline_spark.catalog_pipeline  # noqa: F401
    from marketdatapipeline_spark.catalog import REGISTRY

    return REGISTRY


@pytest.fixture(scope="module")
def oracle_con():
    from marketdatapipeline_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _tail_names():
    from marketdatapipeline_spark.catalog import GATE_TAIL

    return list(GATE_TAIL)


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata tier absent")
@pytest.mark.parametrize("name", _tail_names())
def test_gate_tail_cell_exact(name, registry, oracle_con, spark):
    spec = registry[name]
    assert spec.sql is not None, f"{name} is gate-exempt AND oracle-less"
    sdf = spec.fn(spark, SF_DIR).toPandas()
    odf = oracle_con.sql(spec.sql).df()
    problems = [p for p in compare(name, sdf, odf) if not p.endswith("(warn)")]
    assert not problems, f"{name} diverged from oracle: {problems}"
    assert len(sdf) > 0, f"{name} returned no rows at {SF_DIR}"
