"""Arrow engine vs SQL engine: same 56-column output, same values."""

from __future__ import annotations

import numpy as np

from marketdatapipeline_spark.features import compute_all_features


def test_engines_agree(spark, bars_df):
    a = (
        compute_all_features(bars_df, engine="arrow", target_horizon=1)
        .orderBy("symbol", "datetime")
        .toPandas()
    )
    s = (
        compute_all_features(bars_df, engine="sql", target_horizon=1)
        .orderBy("symbol", "datetime")
        .toPandas()
    )
    assert list(sorted(a.columns)) == list(sorted(s.columns))
    assert len(a) == len(s)
    for c in a.columns:
        if a[c].dtype.kind == "f":
            assert np.allclose(
                a[c].to_numpy("float64"),
                s[c].to_numpy("float64"),
                rtol=1e-9,
                atol=1e-9,
                equal_nan=True,
            ), c
        else:
            assert (a[c].to_numpy() == s[c].to_numpy()).all(), c


def test_chunked_engine_matches_arrow(spark):
    """Halo-overlap blocked execution == single-task arrow kernel on a
    one-symbol series spanning many blocks (including block boundaries
    and the forward-target tail)."""
    import pandas as pd

    n = 30000
    pdf = pd.DataFrame(
        {
            "symbol": ["X"] * n,
            "datetime": pd.date_range("2024-01-01", periods=n, freq="1min"),
            "bar_id": range(n),
            "open": 100.0 + np.cos(np.arange(n) * 0.21),
            "high": 101.0 + np.sin(np.arange(n) * 0.13),
            "low": 99.0 - np.sin(np.arange(n) * 0.17),
            "close": 100.0 + np.sin(np.arange(n) * 0.37) * 5 + np.arange(n) * 0.001,
            "volume": (np.arange(n) % 1000 + 1).astype("int64"),
        }
    )
    df = spark.createDataFrame(pdf)
    from marketdatapipeline_spark.features.arrow_engine import (
        compute_all_features_chunked,
    )

    a = (
        compute_all_features(
            df, engine="arrow", order_cols=("datetime", "bar_id"), target_horizon=1
        )
        .orderBy("datetime")
        .toPandas()
    )
    c = (
        compute_all_features_chunked(
            df,
            order_cols=("datetime", "bar_id"),
            target_horizon=1,
            block_rows=8192,  # small blocks: several boundaries in 30k rows
        )
        .orderBy("datetime")
        .toPandas()
    )
    assert sorted(a.columns) == sorted(c.columns)
    assert len(a) == len(c) == n - 1
    for col in a.columns:
        if a[col].dtype.kind == "f":
            assert np.allclose(
                a[col].to_numpy("float64"),
                c[col].to_numpy("float64"),
                rtol=1e-9,
                atol=1e-12,
                equal_nan=True,
            ), col
        else:
            assert (a[col].to_numpy() == c[col].to_numpy()).all(), col


def test_arrow_engine_column_contract(spark, bars_df):
    out = compute_all_features(bars_df, engine="arrow", target_horizon=1)
    assert len(out.columns) == 57  # reference's 56 + symbol (SURVEY.md §2.8)
    assert "target" in out.columns and dict(out.dtypes)["target"] == "tinyint"


def test_arrow_engine_regression_target(spark, bars_df):
    out = compute_all_features(
        bars_df, engine="arrow", target_horizon=3, target_type="regression"
    )
    assert dict(out.dtypes)["target"] == "double"
    n_syms = bars_df.select("symbol").distinct().count()
    assert out.count() == bars_df.count() - 3 * n_syms


def test_chunked_engine_multi_symbol_boundaries(spark):
    """Range-blocked execution with SEVERAL symbols whose runs start
    and end inside partitions: the halo handoff must respect symbol
    contiguity (a symbol's antecedents are always the previous
    partition's tail for that symbol, or its own global start)."""
    import pandas as pd

    frames = []
    for i, (sym, n) in enumerate([("A", 9000), ("B", 4000), ("C", 11000)]):
        frames.append(
            pd.DataFrame(
                {
                    "symbol": [sym] * n,
                    "datetime": pd.date_range("2024-01-01", periods=n, freq="1min"),
                    "bar_id": range(n),
                    "open": 100.0 + np.cos(np.arange(n) * (0.11 + i * 0.07)),
                    "high": 101.0 + np.sin(np.arange(n) * 0.13),
                    "low": 99.0 - np.sin(np.arange(n) * 0.17),
                    "close": 100.0
                    + np.sin(np.arange(n) * (0.29 + i * 0.05)) * 5
                    + np.arange(n) * 0.001,
                    "volume": (np.arange(n) % 1000 + 1).astype("int64"),
                }
            )
        )
    df = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    from marketdatapipeline_spark.features.arrow_engine import (
        compute_all_features_chunked,
    )

    a = (
        compute_all_features(
            df, engine="arrow", order_cols=("datetime", "bar_id"), target_horizon=1
        )
        .orderBy("symbol", "datetime")
        .toPandas()
    )
    c = (
        compute_all_features_chunked(
            df,
            order_cols=("datetime", "bar_id"),
            target_horizon=1,
            block_rows=8192,  # 24k rows over ~5 blocks: every symbol crosses
        )
        .orderBy("symbol", "datetime")
        .toPandas()
    )
    assert len(a) == len(c) == 24000 - 3
    for col in a.columns:
        if a[col].dtype.kind == "f":
            assert np.allclose(
                a[col].to_numpy("float64"),
                c[col].to_numpy("float64"),
                rtol=1e-9,
                atol=1e-12,
                equal_nan=True,
            ), col
        else:
            assert (a[col].to_numpy() == c[col].to_numpy()).all(), col


def test_chunked_engine_randomized_shapes(spark):
    """Randomized sweep over symbol counts, row counts, block sizes,
    and forward horizons — the JVM block tagger (r6) must stay
    bit-compatible with the arrow engine for every layout the range
    sampler produces, including symbols straddling partitions and
    multi-copy halo/lead duplication. atol 1e-7: pandas' rolling-std
    carries state from the series start, so block-offset differences
    produce ~1e-10-scale float residue on drifting data (measured) —
    a property of blocked execution itself, not the tagger."""
    import pandas as pd

    from marketdatapipeline_spark.features.arrow_engine import (
        compute_all_features_chunked,
    )

    rng = np.random.default_rng(20260814)
    for trial in range(3):
        n_sym = int(rng.integers(1, 4))
        rows = int(rng.integers(17_000, 30_000))
        fwd = int(rng.integers(1, 4))
        frames = []
        for i in range(n_sym):
            walk = np.cumsum(rng.normal(0, 1, rows)) + 200
            frames.append(
                pd.DataFrame(
                    {
                        "symbol": f"S{i}",
                        "datetime": pd.date_range(
                            "2023-01-01", periods=rows, freq="1min"
                        ),
                        "bar_id": range(rows),
                        "open": walk + rng.normal(0, 0.1, rows),
                        "high": walk + np.abs(rng.normal(0, 0.5, rows)),
                        "low": walk - np.abs(rng.normal(0, 0.5, rows)),
                        "close": walk,
                        "volume": rng.integers(1, 1000, rows).astype("float64"),
                    }
                )
            )
        df = spark.createDataFrame(pd.concat(frames, ignore_index=True))
        kwargs = dict(order_cols=("datetime", "bar_id"), target_horizon=fwd)
        a = (
            compute_all_features(df, engine="arrow", **kwargs)
            .orderBy("symbol", "bar_id")
            .toPandas()
        )
        c = (
            compute_all_features_chunked(df, block_rows=8192, **kwargs)
            .orderBy("symbol", "bar_id")
            .toPandas()
        )
        assert len(a) == len(c) == n_sym * (rows - fwd), (trial, len(a), len(c))
        for col in a.columns:
            if a[col].dtype.kind == "f":
                x = a[col].to_numpy("float64")
                y = c[col].to_numpy("float64")
                ok = np.isclose(x, y, rtol=1e-9, atol=1e-7) | (
                    np.isnan(x) & np.isnan(y)
                )
                assert ok.all(), (trial, col, int((~ok).sum()))
            else:
                assert (a[col].to_numpy() == c[col].to_numpy()).all(), (trial, col)


def test_arrow_engine_rows_per_task_cap(spark, bars_df):
    """The kernel exchange widens with the declared input size (one
    hash exchange either way — only its width changes), and values are
    identical on the widened route. Small inputs keep the plain
    groupBy exchange so AQE coalescing stays available."""
    import re

    from marketdatapipeline_spark.features.arrow_engine import (
        TARGET_ROWS_PER_TASK,
        compute_all_features_arrow,
    )

    kwargs = dict(order_cols=("datetime",))

    def symbol_repartitions(df):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        return re.findall(
            r"RepartitionByExpression \[symbol[^\]]*\], (\d+)", plan
        )

    small = compute_all_features_arrow(
        bars_df, n_rows=TARGET_ROWS_PER_TASK, **kwargs
    )
    assert symbol_repartitions(small) == []

    n_big = TARGET_ROWS_PER_TASK * 100
    big = compute_all_features_arrow(bars_df, n_rows=n_big, **kwargs)
    assert symbol_repartitions(big) == ["100"]

    base = (
        compute_all_features_arrow(bars_df, **kwargs)
        .orderBy("symbol", "datetime")
        .toPandas()
    )
    wide = big.orderBy("symbol", "datetime").toPandas()
    assert base.columns.tolist() == wide.columns.tolist()
    for col in base.columns:
        x, y = base[col], wide[col]
        if x.dtype.kind == "f":
            import numpy as _np

            ok = (x.to_numpy("float64") == y.to_numpy("float64")) | (
                _np.isnan(x.to_numpy("float64"))
                & _np.isnan(y.to_numpy("float64"))
            )
            assert ok.all(), col
        else:
            assert (x.to_numpy() == y.to_numpy()).all(), col


def test_range_block_layout_identity_placement(spark):
    """r15: the plan-time-boundary layout must (a) place block i in
    physical partition i (the tagger's adjacency contract), (b) keep
    every partition a contiguous range of the key order, and (c) keep
    partitions non-empty — the properties repartitionByRange gave,
    now without its per-action sampling pass."""
    import pandas as pd
    from pyspark.sql import functions as F

    from marketdatapipeline_spark.features.arrow_engine import (
        _range_block_layout,
    )

    n, nb = 50_000, 8
    pdf = pd.DataFrame(
        {
            "symbol": ["X"] * n,
            "datetime": pd.date_range("2024-01-01", periods=n, freq="1min"),
            "bar_id": range(n),
            "close": 100.0 + np.sin(np.arange(n) * 0.37),
        }
    )
    df = spark.createDataFrame(pdf).repartition(16)  # scrambled input
    out = _range_block_layout(df, ["symbol", "datetime", "bar_id"], nb, n)
    got = (
        out.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(
            F.count("*").alias("cnt"),
            F.min("bar_id").alias("lo"),
            F.max("bar_id").alias("hi"),
        )
        .orderBy("_pid")
        .collect()
    )
    assert len(got) == nb and [r["_pid"] for r in got] == list(range(nb))
    assert all(r["cnt"] > 0 for r in got)
    assert sum(r["cnt"] for r in got) == n
    # contiguous, ordered, non-overlapping ranges in partition order
    for a, b in zip(got, got[1:]):
        assert a["hi"] + 1 == b["lo"], (a, b)
    # the layout is deterministic across actions (plan-time literals):
    again = (
        out.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.min("bar_id").alias("lo"))
        .orderBy("_pid")
        .collect()
    )
    assert [r["lo"] for r in again] == [r["lo"] for r in got]


def test_range_block_layout_fallbacks(spark):
    """nb=1 and nb>MAX_LITERAL_BLOCKS take the repartitionByRange
    fallback; duplicate composite keys (non-strict boundaries) must
    also fall back rather than emit an unbalanced literal tree."""
    import pandas as pd

    from marketdatapipeline_spark.features.arrow_engine import (
        MAX_LITERAL_BLOCKS,
        _range_block_layout,
    )

    n = 4_000
    pdf = pd.DataFrame(
        {
            "symbol": ["X"] * n,
            "bar_id": [7] * n,  # every composite key identical
            "close": np.arange(n, dtype="float64"),
        }
    )
    df = spark.createDataFrame(pdf)
    dup = _range_block_layout(df, ["symbol", "bar_id"], 4, n)
    assert dup.count() == n  # fallback path, values intact
    one = _range_block_layout(df, ["symbol", "bar_id"], 1, n)
    assert one.rdd.getNumPartitions() == 1
    big = _range_block_layout(df, ["symbol", "bar_id"], MAX_LITERAL_BLOCKS + 1, n)
    assert big.count() == n
