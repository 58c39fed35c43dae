"""Rolling helpers: Polars min_periods semantics (SURVEY.md trap T1)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from marketdatapipeline_spark.features.windows import (
    rolling_mean,
    rolling_std,
    rolling_sum,
)


def _w():
    return Window.partitionBy("symbol").orderBy("datetime")


def _collect(df, col):
    out = df.orderBy("symbol", "datetime").select(col).toPandas().iloc[:, 0]
    return out.to_numpy(dtype="float64")


def test_rolling_mean_masks_warmup(spark, bars_df, bars_pdf):
    got = _collect(
        bars_df.select("symbol", "datetime", rolling_mean(F.col("close"), 5, _w()).alias("m")),
        "m",
    )
    exp = (
        bars_pdf.sort_values(["symbol", "datetime"])
        .groupby("symbol")["close"]
        .rolling(5, min_periods=5)
        .mean()
        .to_numpy()
    )
    assert np.allclose(got, exp, equal_nan=True)
    # warm-up rows are NULL, not partial aggregates
    assert np.isnan(got[:4]).all() and not np.isnan(got[4])


def test_rolling_std_is_sample_std(spark, bars_df, bars_pdf):
    got = _collect(
        bars_df.select("symbol", "datetime", rolling_std(F.col("close"), 10, _w()).alias("s")),
        "s",
    )
    exp = (
        bars_pdf.sort_values(["symbol", "datetime"])
        .groupby("symbol")["close"]
        .rolling(10, min_periods=10)
        .std(ddof=1)  # Polars default ddof=1
        .to_numpy()
    )
    assert np.allclose(got, exp, equal_nan=True)


def test_rolling_sum(spark, bars_df, bars_pdf):
    got = _collect(
        bars_df.select("symbol", "datetime", rolling_sum(F.col("volume"), 7, _w()).alias("s")),
        "s",
    )
    exp = (
        bars_pdf.sort_values(["symbol", "datetime"])
        .groupby("symbol")["volume"]
        .rolling(7, min_periods=7)
        .sum()
        .to_numpy()
    )
    assert np.allclose(got, exp, equal_nan=True)


def test_min_periods_counts_non_null_values(spark):
    """A NULL inside the frame delays emission — count() counts non-nulls."""
    pdf = pd.DataFrame(
        {
            "symbol": ["X"] * 6,
            "datetime": pd.date_range("2024-01-01", periods=6, freq="1min"),
            "v": [1.0, None, 3.0, 4.0, 5.0, 6.0],
        }
    )
    df = spark.createDataFrame(pdf)
    got = _collect(df.select("symbol", "datetime", rolling_mean(F.col("v"), 3, _w()).alias("m")), "m")
    # frames: [1],[1,N],[1,N,3],[N,3,4],[3,4,5],[4,5,6] -> non-null counts 1,1,2,2,3,3
    assert np.isnan(got[:4]).all()
    assert got[4] == (3 + 4 + 5) / 3 and got[5] == 5.0


def test_rolling_plan_matches_sliding_on_random_data(spark):
    """Randomized equivalence: the O(rows) prefix-sum RollingPlan must
    agree with the exact sliding-frame aggregates (to float tolerance)
    on adversarial data — nulls, constant stretches, negative values,
    multiple symbols, windows larger than some partitions."""
    from marketdatapipeline_spark.features.windows import RollingPlan

    rng = np.random.default_rng(20260814)
    rows = []
    for sym in ("a", "b", "c"):
        n = int(rng.integers(5, 400))
        vals = rng.normal(100.0, 15.0, n)
        vals[rng.random(n) < 0.1] = np.nan  # nulls inside windows
        vals[n // 2 : n // 2 + 10] = 42.0   # constant stretch (std=0)
        for i, v in enumerate(vals):
            rows.append((sym, i, None if np.isnan(v) else float(v)))
    df = spark.createDataFrame(rows, ["symbol", "seq", "x"])
    w = Window.partitionBy("symbol").orderBy("seq")
    plan = RollingPlan(w)
    x = F.col("x")
    for n in (3, 20, 120):
        out = plan.apply(
            df,
            {
                "p_mean": plan.mean(x, n, "x"),
                "p_std": plan.std(x, n, "x"),
                "p_sum": plan.sum(x, n, "x"),
            },
        ).select(
            "symbol",
            "seq",
            "p_mean",
            "p_std",
            "p_sum",
            rolling_mean(x, n, w).alias("s_mean"),
            rolling_std(x, n, w).alias("s_std"),
            rolling_sum(x, n, w).alias("s_sum"),
        ).toPandas()
        for a, b in (("p_mean", "s_mean"), ("p_std", "s_std"), ("p_sum", "s_sum")):
            ga = out[a].to_numpy(dtype="float64")
            gb = out[b].to_numpy(dtype="float64")
            assert (np.isnan(ga) == np.isnan(gb)).all(), (n, a, "null mask")
            assert np.allclose(ga, gb, atol=1e-7, equal_nan=True), (n, a)


def test_exact_frame_sums_bit_identical_to_sliding(spark):
    """r9: dec_sum/long_sum/count must match the direct sliding-frame
    aggregation BIT-EXACTLY (decimal/integer prefix differences are
    associative-exact) — this is what lets the five slow catalog
    rolling queries switch plans without touching their oracles.
    Nulls included; comparison is on the masked (count>=n) region the
    catalog queries consume, where the empty-frame NULL-vs-0 corner
    cannot appear."""
    from marketdatapipeline_spark.features.windows import RollingPlan

    rng = np.random.default_rng(20260815)
    rows = []
    for sym in ("a", "b"):
        cnt = int(rng.integers(30, 300))
        vals = rng.normal(0.0, 0.01, cnt)
        vals[rng.random(cnt) < 0.08] = np.nan
        ints = rng.integers(-50_000, 50_000, cnt)
        for i in range(cnt):
            rows.append(
                (
                    sym,
                    i,
                    None if np.isnan(vals[i]) else float(vals[i]),
                    int(ints[i]),
                )
            )
    df = spark.createDataFrame(rows, ["symbol", "seq", "x", "k"])
    w = Window.partitionBy("symbol").orderBy("seq")
    n = 20
    t = w.rowsBetween(-(n - 1), 0)
    plan = RollingPlan(w)
    x, k = F.col("x"), F.col("k")
    out = plan.apply(
        df,
        {
            "p_cnt": plan.count(x, n, "x"),
            "p_dec": plan.dec_sum(x, n, "x").cast("double"),
            "p_long": plan.long_sum(k, n, "k"),
        },
    ).select(
        "symbol",
        "seq",
        "p_cnt",
        "p_dec",
        "p_long",
        F.count(x).over(t).alias("s_cnt"),
        F.sum(x.cast("decimal(38,18)")).over(t).cast("double").alias("s_dec"),
        F.sum(k).over(t).alias("s_long"),
    ).toPandas()
    assert (out["p_cnt"] == out["s_cnt"]).all()
    assert (out["p_long"] == out["s_long"]).all()  # never-null ints
    masked = out[out["p_cnt"] >= n]
    assert len(masked) > 50
    # bit-exact on the consumed region, including the double cast
    assert (
        masked["p_dec"].to_numpy() == masked["s_dec"].to_numpy()
    ).all()
