"""Cell-exact DuckDB oracle checks for the EXTENDED (post-gate)
catalog (catalog_corpus.py).

These queries sit outside the driver's 50-query gate by necessity —
the gate is full and its exempt tail is frozen — so this test holds
them to a STRICTER standard on every pytest run: cell-exact value
comparison after canonical sorting (tools/check_oracle.py), the same
machinery test_gate_tail.py uses for the gate-exempt tail.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from check_oracle import compare  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TAIL_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def extended_registry():
    import marketdatapipeline_spark.catalog_corpus  # noqa: F401 — registers
    from marketdatapipeline_spark.catalog import EXTENDED_REGISTRY

    return EXTENDED_REGISTRY


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


def _extended_names():
    import marketdatapipeline_spark.catalog_corpus  # noqa: F401 — registers
    from marketdatapipeline_spark.catalog import EXTENDED_REGISTRY

    return list(EXTENDED_REGISTRY)


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata tier absent")
@pytest.mark.parametrize("name", _extended_names())
def test_extended_cell_exact(name, extended_registry, oracle_con, spark):
    spec = extended_registry[name]
    assert spec.sql is not None, f"{name} registered without an oracle"
    sdf = spec.fn(spark, SF_DIR).toPandas()
    odf = oracle_con.sql(spec.sql).df()
    problems = [p for p in compare(name, sdf, odf) if not p.endswith("(warn)")]
    assert not problems, f"{name} diverged from oracle: {problems}"
    assert len(sdf) > 0, f"{name} returned no rows at {SF_DIR}"
