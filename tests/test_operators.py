"""Relational operator extensions: as-of join, sessionization,
multi-granularity rollup (operators/)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from marketdatapipeline_spark.operators import (
    asof_join,
    point_in_interval_join,
    rollup_bars,
    sessionize,
)
from marketdatapipeline_spark.operators.sessions import session_stats


def _ts(minute, second=0):
    return datetime(2024, 1, 1, 10, minute, second)


@pytest.fixture()
def trades(spark):
    rows = [
        (1, "A", _ts(0), 100.0),   # before any quote -> null
        (2, "A", _ts(5), 101.0),   # matches quote at 10:05 (equal ts)
        (3, "A", _ts(30), 102.0),  # matches latest quote 10:06
        (4, "B", _ts(7), 200.0),   # matches B quote 10:02
    ]
    return spark.createDataFrame(rows, ["trade_id", "symbol", "ts", "price"])


@pytest.fixture()
def quotes(spark):
    rows = [
        ("A", _ts(5), 100.5),
        ("A", _ts(6), 100.7),
        ("B", _ts(2), 199.5),
    ]
    return spark.createDataFrame(rows, ["symbol", "ts", "quote"])


def test_asof_backward_semantics(trades, quotes):
    out = {r.trade_id: r.quote for r in asof_join(trades, quotes).collect()}
    assert out[1] is None            # no quote yet
    assert out[2] == 100.5           # equal timestamp matches (<=)
    assert out[3] == 100.7           # latest preceding, not first
    assert out[4] == 199.5           # per-key isolation


def test_asof_forward_and_tolerance(trades, quotes):
    fwd = {
        r.trade_id: r.quote
        for r in asof_join(trades, quotes, direction="forward").collect()
    }
    assert fwd[1] == 100.5           # next quote at-or-after 10:00
    assert fwd[2] == 100.5           # equal ts matches forward too
    assert fwd[3] is None            # nothing after 10:30
    tol = {
        r.trade_id: r.quote
        for r in asof_join(
            trades, quotes, tolerance=F.expr("INTERVAL 10 MINUTES")
        ).collect()
    }
    assert tol[3] is None            # 10:06 quote is 24 min stale
    assert tol[2] == 100.5 and tol[4] == 199.5


def test_asof_rejects_colliding_payload(trades, quotes):
    with pytest.raises(ValueError, match="already exist"):
        asof_join(trades, quotes.withColumnRenamed("quote", "price"))
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, direction="sideways")


def test_asof_rejects_reserved_internal_names(trades, quotes):
    """_side/_pay/_r_on are internal to the tagged-union plan; an input
    column with one of those names would silently corrupt the carry."""
    for bad in ("_side", "_pay", "_r_on"):
        with pytest.raises(ValueError, match="reserved"):
            asof_join(trades, quotes.withColumnRenamed("quote", bad))
    with pytest.raises(ValueError, match="reserved"):
        asof_join(trades.withColumn("_side", trades["price"]), quotes)


def test_asof_null_payload_comes_from_matched_row(spark):
    """Regression: with per-column last(ignorenulls) carries, a right
    row whose payload column is legitimately NULL had that column
    filled from an OLDER right row (frankenrow). The matched row's
    NULL must surface as NULL, and all payload columns must come from
    the same (newest) right row."""
    trades = spark.createDataFrame(
        [(1, "A", _ts(10), 100.0)], ["trade_id", "symbol", "ts", "price"]
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts(1), 99.0, 10.0),
            ("A", _ts(5), None, 20.0),  # newest at-or-before: bid is NULL
        ],
        ["symbol", "ts", "bid", "ask"],
    )
    row = asof_join(trades, quotes).collect()[0]
    assert row.ask == 20.0            # matched row is the 10:05 quote
    assert row.bid is None            # its NULL bid must NOT fall back to 99.0


def test_asof_wide_payload_plan_stays_flat(spark):
    """The union construction is two selects, not a withColumn per
    payload column — the analyzed plan's Project depth must not scale
    with payload width (a withColumn loop stacks one Project per
    column)."""
    trades = spark.createDataFrame(
        [(1, "A", _ts(10), 100.0)], ["trade_id", "symbol", "ts", "price"]
    )
    wide = spark.range(3).select(
        F.lit("A").alias("symbol"),
        F.to_timestamp(F.lit("2024-01-01 10:00:00")).alias("ts"),
        *[(F.col("id") + i).cast("double").alias(f"pay_{i}") for i in range(60)],
    ).groupBy("symbol", "ts").agg(
        *[F.max(f"pay_{i}").alias(f"pay_{i}") for i in range(60)]
    )
    out = asof_join(trades, wide)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("Project") < 10, analyzed.count("Project")
    row = out.collect()[0]
    assert row.pay_0 == 2.0


def test_range_join_left_null_column_not_duplicated(spark):
    """Regression: the left-recovery anti-join compared all point
    columns with null-UNSAFE equality, so a matched point row carrying
    a NULL in any column never equaled itself and was emitted twice
    (matched + null-padded). NULL-safe comparison keeps exactly one."""
    points = spark.createDataFrame(
        [(1, _ts(5), None), (2, _ts(50), "x")],
        ["pid", "ts", "note"],
    )
    intervals = spark.createDataFrame(
        [(_ts(0), _ts(10), "s1")], ["start", "end", "interval_id"]
    )
    out = point_in_interval_join(
        points, intervals, point_col="ts", bin_width="10 minutes", how="left"
    ).collect()
    assert len(out) == 2
    by_pid = {r.pid: r for r in out}
    assert by_pid[1].interval_id == "s1"   # matched once, not duplicated
    assert by_pid[2].interval_id is None   # genuinely unmatched, null-padded


def test_sessionize_gap_boundaries(spark):
    rows = [
        (1, _ts(0)),
        (1, _ts(30)),      # exactly 30 min later -> SAME session
        #                    (session_window merges events exactly gap
        #                    apart; its per-event window [t, t+gap] is
        #                    end-inclusive — verified empirically and by
        #                    the randomized parity test below)
        (1, _ts(30, 1)),   # 1 s later -> same
        (2, _ts(0)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = sessionize(df, F.expr("INTERVAL 30 MINUTES"))
    got = {
        (r.user_id, r.ts): r.session_id for r in out.collect()
    }
    assert got[(1, _ts(0))] == 1
    assert got[(1, _ts(30))] == 1       # exact-gap boundary merges
    assert got[(1, _ts(30, 1))] == 1
    assert got[(2, _ts(0))] == 1        # per-user numbering

    out2 = sessionize(df, F.expr("INTERVAL 10 MINUTES"))
    got2 = {(r.user_id, r.ts): r.session_id for r in out2.collect()}
    # 30 min > 10 min gap -> split; the 1 s follow-up stays attached
    assert got2[(1, _ts(30))] == 2 and got2[(1, _ts(30, 1))] == 2

    stats = session_stats(df, F.expr("INTERVAL 10 MINUTES"))
    rows1 = {
        r.session_id: r for r in stats.filter("user_id = 1").collect()
    }
    assert rows1[1].n_events == 1
    assert rows1[1].duration_us == 0
    assert rows1[2].n_events == 2
    assert rows1[2].duration_us == 1_000_000


def test_range_join_inclusive_bounds_and_bins(spark):
    """Intervals spanning multiple bins, inclusive endpoints, and a
    point outside every interval (inner drops it, left keeps it)."""
    points = spark.createDataFrame(
        [
            (1, "u", _ts(0)),    # == start of I1 (inclusive)
            (2, "u", _ts(30)),   # inside I1, different hour-bin than start
            (3, "u", _ts(45)),   # == end of I1 (inclusive)
            (4, "u", _ts(50)),   # in no interval
            (5, "v", _ts(30)),   # other key, interval I2
        ],
        ["pid", "user", "ts"],
    )
    # I1 spans 10:00-10:45 (3 ten-minute bins x key u), I2 for key v
    intervals = spark.createDataFrame(
        [("u", _ts(0), _ts(45), "I1"), ("v", _ts(29), _ts(31), "I2")],
        ["user", "start", "end", "label"],
    )
    inner = point_in_interval_join(
        points, intervals, by=("user",), bin_width="10 minutes"
    )
    got = {r.pid: r.label for r in inner.collect()}
    assert got == {1: "I1", 2: "I1", 3: "I1", 5: "I2"}
    left = point_in_interval_join(
        points, intervals, by=("user",), bin_width="10 minutes", how="left"
    )
    lgot = {r.pid: r.label for r in left.collect()}
    assert lgot[4] is None and len(lgot) == 5
    with pytest.raises(ValueError, match="already exist"):
        point_in_interval_join(
            points, intervals.withColumnRenamed("label", "pid"), by=("user",)
        )
    with pytest.raises(ValueError, match="unsupported how"):
        point_in_interval_join(points, intervals, by=("user",), how="full")


def test_range_join_overlapping_intervals_multiplicity(spark):
    points = spark.createDataFrame([(1, _ts(15))], ["pid", "ts"])
    intervals = spark.createDataFrame(
        [(_ts(0), _ts(30), "A"), (_ts(10), _ts(20), "B"), (_ts(16), _ts(59), "C")],
        ["start", "end", "label"],
    )
    got = sorted(
        r.label
        for r in point_in_interval_join(
            points, intervals, bin_width="1 hour"
        ).collect()
    )
    assert got == ["A", "B"]  # one output row per containing interval


def test_rollup_deterministic_first_last(spark):
    # insert rows out of chronological order: first/last must follow
    # (datetime, bar_id), not arrival order
    rows = [
        ("A", _ts(45), 2, 11.0, 15.0, 9.0, 12.0, 5.0),
        ("A", _ts(5), 1, 10.0, 14.0, 8.0, 11.0, 3.0),
        ("A", _ts(50), 3, 12.0, 16.0, 10.0, 13.0, 2.0),
    ]
    cols = ["symbol", "datetime", "bar_id", "open", "high", "low", "close", "volume"]
    bars = spark.createDataFrame(rows, cols).repartition(4)
    out = rollup_bars(bars, grains=("hour",)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.open == 10.0 and r.close == 13.0
    assert r.high == 16.0 and r.low == 8.0
    assert r.volume == 10.0 and r.n_bars == 3 and r.grain == "hour"
    with pytest.raises(ValueError, match="unknown grain"):
        rollup_bars(bars, grains=("fortnight",))


def test_salted_collect_list_matches_plain(spark):
    from marketdatapipeline_spark.operators import salted_collect_list

    rows = [("hot", i % 7) for i in range(500)] + [("cold", 1), ("cold", 2)]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        r.k: r.vs
        for r in salted_collect_list(df, ("k",), "v", salt=8).collect()
    }
    want = {
        r.k: sorted(r.vs)
        for r in df.groupBy("k").agg(F.collect_list("v").alias("vs")).collect()
    }
    assert got == want
    with pytest.raises(ValueError, match="salt"):
        salted_collect_list(df, ("k",), "v", salt=0)


def test_salted_join_matches_plain_join(spark):
    from marketdatapipeline_spark.operators import salted_join_left_hot

    left = spark.createDataFrame(
        [("hot", i) for i in range(300)] + [("rare", 0)], ["k", "i"]
    )
    right = spark.createDataFrame(
        [("hot", "H"), ("rare", "R"), ("unmatched", "U")], ["k", "tag"]
    )
    got = salted_join_left_hot(left, right, on="k", salt=4)
    want = left.join(right, on="k")
    assert got.count() == want.count() == 301
    g = {(r.k, r.i, r.tag) for r in got.collect()}
    w = {(r.k, r.i, r.tag) for r in want.collect()}
    assert g == w


def test_json_roundtrip(spark, tmp_path):
    from marketdatapipeline_spark.data import load_dataframe, save_dataframe

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], ["id", "name", "x"]
    )
    path = str(tmp_path / "docs.jsonl")
    save_dataframe(df, path, format="json", partition_by=None)
    back = load_dataframe(spark, path, schema=df.schema)  # suffix-inferred json
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


def test_asof_matches_pandas_merge_asof_on_random_data(spark):
    """Randomized equivalence: the union-and-carry as-of join must
    agree with pandas merge_asof (the reference semantics family) on
    random multi-key data with duplicate left timestamps, unmatched
    heads, and equal-timestamp collisions."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(20260814)
    base = pd.Timestamp("2024-01-01")
    lrows, rrows = [], []
    for sym in ("a", "b", "c"):
        lt = np.sort(rng.integers(0, 5000, 200))
        for i, t in enumerate(lt):
            lrows.append((sym, base + pd.Timedelta(seconds=int(t)), i))
        rt = np.unique(rng.integers(0, 5000, 80))
        for t in rt:
            rrows.append(
                (sym, base + pd.Timedelta(seconds=int(t)), float(t) / 10.0)
            )
    lpdf = pd.DataFrame(lrows, columns=["symbol", "ts", "lid"])
    rpdf = pd.DataFrame(rrows, columns=["symbol", "ts", "quote"])
    got = (
        asof_join(
            spark.createDataFrame(lpdf),
            spark.createDataFrame(rpdf),
            on="ts",
            by=("symbol",),
        )
        .toPandas()
        .sort_values(["symbol", "lid"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        lpdf.sort_values("ts", kind="mergesort"),
        rpdf.sort_values("ts", kind="mergesort"),
        on="ts",
        by="symbol",
        direction="backward",
    ).sort_values(["symbol", "lid"]).reset_index(drop=True)
    assert len(got) == len(want)
    ga = got["quote"].to_numpy(dtype="float64")
    wa = want["quote"].to_numpy(dtype="float64")
    assert (np.isnan(ga) == np.isnan(wa)).all()
    assert np.allclose(ga, wa, equal_nan=True)

    # forward direction and inclusive tolerance, same random data
    for direction, tol in (("forward", None), ("backward", "90 seconds")):
        got_d = (
            asof_join(
                spark.createDataFrame(lpdf),
                spark.createDataFrame(rpdf),
                on="ts",
                by=("symbol",),
                direction=direction,
                tolerance=None if tol is None else F.expr(f"INTERVAL {tol}"),
            )
            .toPandas()
            .sort_values(["symbol", "lid"])
            .reset_index(drop=True)
        )
        want_d = pd.merge_asof(
            lpdf.sort_values("ts", kind="mergesort"),
            rpdf.sort_values("ts", kind="mergesort"),
            on="ts",
            by="symbol",
            direction=direction,
            tolerance=None if tol is None else pd.Timedelta(tol),
        ).sort_values(["symbol", "lid"]).reset_index(drop=True)
        gd = got_d["quote"].to_numpy(dtype="float64")
        wd = want_d["quote"].to_numpy(dtype="float64")
        assert (np.isnan(gd) == np.isnan(wd)).all(), (direction, tol)
        assert np.allclose(gd, wd, equal_nan=True), (direction, tol)


def test_sessionize_matches_session_window_on_random_data(spark):
    """Randomized equivalence: the explicit lag + running-sum
    composition must draw the same session boundaries as the engine's
    session_window on random data that includes duplicate timestamps
    and gaps exactly equal to the threshold (the >= boundary)."""
    import numpy as np
    import pandas as pd

    from marketdatapipeline_spark.streaming.sessions import sessionize_batch

    rng = np.random.default_rng(20260814)
    base = pd.Timestamp("2024-01-01")
    rows = []
    for uid in range(20):
        t = 0
        for _ in range(int(rng.integers(2, 60))):
            # steps of exactly 300s (the gap) probe the boundary rule
            t += int(rng.choice([0, 1, 60, 300, 301, 900]))
            rows.append((uid, base + pd.Timedelta(seconds=t)))
    ev = spark.createDataFrame(pd.DataFrame(rows, columns=["user_id", "ts"]))
    composed = (
        session_stats(ev, F.expr("INTERVAL 5 MINUTES"))
        .select("user_id", "session_start", "session_end", "n_events")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    native = (
        sessionize_batch(ev, gap="5 minutes")
        .select("user_id", "session_start", "session_end", "n_events")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(composed, native, check_exact=True)


def test_range_join_matches_naive_inequality_join(spark):
    """Randomized equivalence: the bin-bucketed range join must return
    exactly the rows of the naive BETWEEN join — including points on
    interval boundaries and bins much narrower/wider than intervals."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(20260814)
    base = pd.Timestamp("2024-01-01")
    points = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 300),
            "pid": np.arange(300),
            "ts": [base + pd.Timedelta(seconds=int(s)) for s in rng.integers(0, 7200, 300)],
        }
    )
    starts = rng.integers(0, 7200, 60)
    ivals = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 60),
            "iid": np.arange(60),
            "start": [base + pd.Timedelta(seconds=int(s)) for s in starts],
            "end": [
                base + pd.Timedelta(seconds=int(s + d))
                for s, d in zip(starts, rng.integers(0, 3600, 60))
            ],
        }
    )
    pdf, idf = spark.createDataFrame(points), spark.createDataFrame(ivals)
    for width in ("37 seconds", "10 minutes", "3 hours"):
        got = (
            point_in_interval_join(
                pdf, idf, point_col="ts", start_col="start", end_col="end",
                by=("k",), bin_width=width,
            )
            .select("pid", "iid")
            .toPandas()
            .sort_values(["pid", "iid"])
            .reset_index(drop=True)
        )
        naive = (
            pdf.join(idf.withColumnsRenamed({}), "k")
            .filter((F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end")))
            .select("pid", "iid")
            .toPandas()
            .sort_values(["pid", "iid"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, naive, check_exact=True), width


def test_rollup_matches_pandas_reference_on_random_data(spark):
    """Randomized equivalence: rollup_bars vs a pandas reference, with
    duplicate timestamps inside buckets (tie-broken by bar_id) and
    bars exactly on bucket boundaries."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(20260814)
    base = pd.Timestamp("2024-01-01")
    n = 800
    pdf = pd.DataFrame(
        {
            "symbol": rng.choice(["a", "b"], n),
            # minute-aligned so many rows land exactly on hour boundaries
            "datetime": [
                base + pd.Timedelta(minutes=int(m))
                for m in rng.integers(0, 60 * 48, n)
            ],
            "bar_id": np.arange(n),
            "open": rng.normal(100, 5, n),
            "high": rng.normal(105, 5, n),
            "low": rng.normal(95, 5, n),
            "close": rng.normal(100, 5, n),
            "volume": rng.integers(1, 1000, n).astype("float64"),
        }
    )
    got = (
        rollup_bars(spark.createDataFrame(pdf), grains=("hour", "day"))
        .toPandas()
        .sort_values(["grain", "symbol", "bucket"])
        .reset_index(drop=True)
    )
    refs = []
    for grain, freq in (("hour", "h"), ("day", "D")):
        r = pdf.copy()
        r["bucket"] = r["datetime"].dt.floor(freq)
        r = r.sort_values(["datetime", "bar_id"], kind="mergesort")
        g = r.groupby(["symbol", "bucket"])
        refs.append(
            pd.DataFrame(
                {
                    "open": g["open"].first(),
                    "high": g["high"].max(),
                    "low": g["low"].min(),
                    "close": g["close"].last(),
                    "volume": g["volume"].sum(),
                    "n_bars": g["open"].size(),
                }
            ).assign(grain=grain).reset_index()
        )
    want = (
        pd.concat(refs)
        .sort_values(["grain", "symbol", "bucket"])
        .reset_index(drop=True)[got.columns]
    )
    want["n_bars"] = want["n_bars"].astype(got["n_bars"].dtype)
    pd.testing.assert_frame_equal(got, want, check_exact=False, rtol=1e-12)


def test_anchored_vwap_resets_at_day_boundary(spark):
    from datetime import datetime

    from marketdatapipeline_spark.operators.vwap import anchored_vwap

    rows = [
        # day 1: prices 10, 20 with volumes 1, 3 -> vwap 10, then 17.5
        ("A", datetime(2024, 1, 1, 10), 1, 10.0, 1.0),
        ("A", datetime(2024, 1, 1, 11), 2, 20.0, 3.0),
        # day 2 restarts the anchor: first bar's vwap is its own price
        ("A", datetime(2024, 1, 2, 10), 3, 50.0, 2.0),
        # other symbol isolated
        ("B", datetime(2024, 1, 1, 10), 4, 7.0, 5.0),
    ]
    df = spark.createDataFrame(
        rows, ["symbol", "datetime", "bar_id", "close", "volume"]
    )
    out = {
        r["bar_id"]: r
        for r in anchored_vwap(df, anchor="day").collect()
    }
    assert out[1]["vwap"] == pytest.approx(10.0)
    assert out[2]["vwap"] == pytest.approx((10 * 1 + 20 * 3) / 4)
    assert out[3]["vwap"] == pytest.approx(50.0)  # new day, fresh anchor
    assert out[4]["vwap"] == pytest.approx(7.0)
    assert out[2]["vwap_dev"] == pytest.approx(20.0 - 17.5)
    with pytest.raises(ValueError, match="anchor"):
        anchored_vwap(df, anchor="year")


def test_resample_ffill_fills_gaps(spark):
    from datetime import datetime

    from marketdatapipeline_spark.operators.resample import resample_ffill

    rows = [
        # hours 10 and 13 observed; 11 and 12 must be filled with the
        # hour-10 close; two bars inside hour 10 -> last one wins
        ("A", datetime(2024, 1, 1, 10, 5), 1, 100.0),
        ("A", datetime(2024, 1, 1, 10, 45), 2, 105.0),
        ("A", datetime(2024, 1, 1, 13, 30), 3, 130.0),
        ("B", datetime(2024, 1, 1, 10, 0), 4, 7.0),
    ]
    df = spark.createDataFrame(rows, ["symbol", "datetime", "bar_id", "close"])
    out = resample_ffill(df, every="hour").collect()
    a = sorted(
        (r for r in out if r["symbol"] == "A"), key=lambda r: r["bucket"]
    )
    assert [r["bucket"].hour for r in a] == [10, 11, 12, 13]
    assert [r["observed"] for r in a] == [True, False, False, True]
    assert [r["close_ffill"] for r in a] == [105.0, 105.0, 105.0, 130.0]
    b = [r for r in out if r["symbol"] == "B"]
    assert len(b) == 1 and b[0]["close_ffill"] == 7.0
    with pytest.raises(ValueError, match="every"):
        resample_ffill(df, every="fortnight")


def test_ohlc_volatility_matches_numpy(spark):
    import math
    from datetime import datetime, timedelta

    import numpy as np

    from marketdatapipeline_spark.operators.ohlc_vol import (
        GK_COEF,
        LN2,
        ohlc_volatility,
    )

    rng = np.random.RandomState(7)
    rows = []
    base = datetime(2024, 1, 1)
    closes = 100.0 + np.cumsum(rng.randn(30))
    for i, c in enumerate(closes):
        h, l, o = c + abs(rng.randn()), c - abs(rng.randn()) - 0.01, c + 0.1
        rows.append(("A", base + timedelta(hours=i), i, float(o), float(h),
                     float(l), float(c)))
    df = spark.createDataFrame(
        rows, ["symbol", "datetime", "bar_id", "open", "high", "low", "close"]
    )
    w = 5
    out = sorted(
        ohlc_volatility(df, window=w).collect(), key=lambda r: r["bar_id"]
    )
    # null until the frame fills
    assert all(r["vol_parkinson"] is None for r in out[: w - 1])
    # numpy oracle at a middle row
    i = 17
    sub = rows[i - w + 1 : i + 1]
    pk = np.mean([math.log(r[4] / r[5]) ** 2 for r in sub]) / (4 * LN2)
    gk = np.mean(
        [0.5 * math.log(r[4] / r[5]) ** 2
         - GK_COEF * math.log(r[6] / r[3]) ** 2 for r in sub]
    )
    rs = np.mean(
        [math.log(r[4] / r[6]) * math.log(r[4] / r[3])
         + math.log(r[5] / r[6]) * math.log(r[5] / r[3]) for r in sub]
    )
    assert out[i]["vol_parkinson"] == pytest.approx(math.sqrt(pk))
    assert out[i]["vol_garman_klass"] == pytest.approx(math.sqrt(max(gk, 0)))
    assert out[i]["vol_rogers_satchell"] == pytest.approx(
        math.sqrt(max(rs, 0))
    )


def test_cross_sectional_zscore_and_rank(spark):
    from datetime import datetime

    from marketdatapipeline_spark.operators.cross_section import (
        cross_sectional,
    )

    rows = [
        # one 10:00 bucket with values 1, 2, 3, 6 -> mean 3, std sqrt(14/3)
        ("A", datetime(2024, 1, 1, 10, 1), 1, 1.0),
        ("B", datetime(2024, 1, 1, 10, 2), 2, 2.0),
        ("C", datetime(2024, 1, 1, 10, 3), 3, 3.0),
        ("D", datetime(2024, 1, 1, 10, 4), 4, 6.0),
        # singleton bucket: zscore null, rank 1
        ("A", datetime(2024, 1, 1, 11, 0), 5, 9.0),
    ]
    df = spark.createDataFrame(rows, ["symbol", "datetime", "bar_id", "close"])
    out = {
        r["bar_id"]: r
        for r in cross_sectional(df, value_col="close", bucket="hour").collect()
    }
    import math

    std = math.sqrt(14.0 / 3.0)
    assert out[1]["cs_n"] == 4 and out[1]["cs_rank"] == 1
    assert out[4]["cs_rank"] == 4
    assert out[1]["cs_mean"] == pytest.approx(3.0)
    assert out[4]["cs_demean"] == pytest.approx(3.0)
    assert out[4]["cs_zscore"] == pytest.approx(3.0 / std)
    assert out[5]["cs_zscore"] is None and out[5]["cs_rank"] == 1
    # integer-exact accumulation path agrees with the decimal path
    out2 = {
        r["bar_id"]: r
        for r in cross_sectional(
            df, value_col="close", bucket="hour", value_decimals=2
        ).collect()
    }
    assert out2[4]["cs_zscore"] == pytest.approx(out[4]["cs_zscore"])


def test_running_drawdown(spark):
    from datetime import datetime

    from marketdatapipeline_spark.operators.drawdown import running_drawdown

    rows = [
        ("A", datetime(2024, 1, 1, 10), 1, 100.0),
        ("A", datetime(2024, 1, 1, 11), 2, 80.0),   # -20% off the peak
        ("A", datetime(2024, 1, 1, 12), 3, 120.0),  # new peak -> 0.0
        ("A", datetime(2024, 1, 1, 13), 4, 90.0),   # -25% off 120
    ]
    df = spark.createDataFrame(rows, ["symbol", "datetime", "bar_id", "close"])
    out = {r["bar_id"]: r for r in running_drawdown(df).collect()}
    assert out[1]["drawdown"] == 0.0
    assert out[2]["drawdown"] == pytest.approx(-0.2)
    assert out[3]["drawdown"] == 0.0 and out[3]["peak"] == 120.0
    assert out[4]["drawdown"] == pytest.approx(-0.25)


def test_pairwise_return_correlation(spark):
    from datetime import datetime, timedelta

    from marketdatapipeline_spark.operators.correlation import (
        pairwise_return_correlation,
    )

    base = datetime(2024, 1, 1)
    rows = []
    # A and B move in lockstep (corr 1), C is exactly inverse of A's
    # returns (corr -1); B is one bar shorter than A (length alignment)
    a_prices = [100.0, 110.0, 99.0, 108.9, 120.0]
    c_prices = [100.0]
    for p0, p1 in zip(a_prices, a_prices[1:]):
        r = p1 / p0 - 1.0
        c_prices.append(c_prices[-1] * (1.0 - r))
    for i, p in enumerate(a_prices):
        rows.append(("A", base + timedelta(hours=i), i, p))
    for i, p in enumerate([x * 2 for x in a_prices[:-1]]):
        rows.append(("B", base + timedelta(hours=i), i, p))
    for i, p in enumerate(c_prices):
        rows.append(("C", base + timedelta(hours=i), i, p))
    df = spark.createDataFrame(rows, ["symbol", "datetime", "bar_id", "close"])
    out = {
        (r["symbol_a"], r["symbol_b"]): r
        for r in pairwise_return_correlation(df).collect()
    }
    assert out[("A", "B")]["corr"] == pytest.approx(1.0)
    assert out[("A", "B")]["n_obs"] == 3  # shorter series bounds the pair
    assert out[("A", "C")]["corr"] == pytest.approx(-1.0)
    assert out[("A", "C")]["n_obs"] == 4


def test_interval_overlap_join(spark):
    from datetime import datetime

    from marketdatapipeline_spark.operators import interval_overlap_join

    t = lambda h, m=0: datetime(2024, 1, 1, h, m)  # noqa: E731
    left = spark.createDataFrame(
        [
            ("u1", 1, t(1), t(3)),    # overlaps r1 (touching) and r2
            ("u1", 2, t(10), t(11)),  # disjoint from everything
            ("u2", 3, t(1), t(3)),    # same span, other key: only r3
        ],
        ["user", "lid", "ls", "le"],
    )
    right = spark.createDataFrame(
        [
            ("u1", 1, t(0), t(1)),    # touches left 1 at 1:00 -> match
            ("u1", 2, t(2, 30), t(9)),
            ("u2", 3, t(2), t(2, 30)),
        ],
        ["user", "rid", "rs", "re"],
    )
    out = interval_overlap_join(
        left, right,
        left_bounds=("ls", "le"), right_bounds=("rs", "re"),
        by=("user",), bin_width="30 minutes",
    )
    pairs = sorted((r["lid"], r["rid"]) for r in out.collect())
    assert pairs == [(1, 1), (1, 2), (3, 3)]
    # responsibility-bin dedup: a pair spanning many shared bins is
    # emitted exactly once even at a tiny bin width
    wide = interval_overlap_join(
        left, right,
        left_bounds=("ls", "le"), right_bounds=("rs", "re"),
        by=("user",), bin_width="1 minute",
    )
    pairs2 = sorted((r["lid"], r["rid"]) for r in wide.collect())
    assert pairs2 == pairs
    with pytest.raises(ValueError, match="rename"):
        interval_overlap_join(
            left, left.withColumnRenamed("lid", "x"),
            left_bounds=("ls", "le"), right_bounds=("ls", "le"),
            by=("user",),
        )


def test_rolling_beta_vs_numpy(spark):
    from datetime import datetime, timedelta

    import numpy as np

    from marketdatapipeline_spark.operators.beta import rolling_beta

    rng = np.random.RandomState(3)
    base = datetime(2024, 1, 1)
    n = 40
    mret = rng.randn(n) * 0.01
    rows = []
    # A has true beta 2 vs the market-mover pair, B beta ~0 (noiseless
    # construction: market = mean of A's and B's returns)
    pa, pb = 100.0, 100.0
    a_rets, b_rets = [], []
    for i in range(n):
        ra = 2.0 * mret[i]
        rb = rng.randn() * 0.001
        a_rets.append(ra)
        b_rets.append(rb)
        rows.append(("A", base + timedelta(hours=i), i, float(pa)))
        rows.append(("B", base + timedelta(hours=i), i, float(pb)))
        pa *= 1.0 + ra
        pb *= 1.0 + rb
    rows.append(("A", base + timedelta(hours=n), n, float(pa)))
    rows.append(("B", base + timedelta(hours=n), n, float(pb)))
    df = spark.createDataFrame(rows, ["symbol", "datetime", "bar_id", "close"])
    w = 20
    out = rolling_beta(df, window=w).collect()
    a = sorted(
        (r for r in out if r["symbol"] == "A"), key=lambda r: r["bar_index"]
    )
    # null until the window fills
    assert all(r["beta"] is None for r in a[: w - 1])
    # numpy oracle at the last row: beta of A's returns vs the
    # equal-weight market over the trailing window
    ra = np.array([r["ret"] for r in a[-w:]])
    rm = np.array([r["mkt_ret"] for r in a[-w:]])
    expect = np.cov(ra, rm, ddof=1)[0, 1] / np.var(rm, ddof=1)
    assert a[-1]["beta"] == pytest.approx(expect, rel=1e-9)
    # construction: market = (rA + rB)/2 with rA = 2*m dominating ->
    # beta of A vs market close to 2 within the noise scale
    assert 1.5 < a[-1]["beta"] < 2.5


def test_cross_sectional_null_values(spark):
    """Nulls are excluded from n/mean/std, rank null, non-null ranks
    NULLS-LAST stable — the any-engine convention."""
    from datetime import datetime

    from marketdatapipeline_spark.operators.cross_section import (
        cross_sectional,
    )

    rows = [
        ("A", datetime(2024, 1, 1, 10, 1), 1, 1.0),
        ("B", datetime(2024, 1, 1, 10, 2), 2, None),
        ("C", datetime(2024, 1, 1, 10, 3), 3, 3.0),
    ]
    df = spark.createDataFrame(rows, "symbol string, datetime timestamp, bar_id long, close double")
    out = {
        r["bar_id"]: r
        for r in cross_sectional(df, value_col="close", bucket="hour").collect()
    }
    assert out[1]["cs_n"] == 2 and out[1]["cs_mean"] == pytest.approx(2.0)
    assert out[2]["cs_rank"] is None and out[2]["cs_zscore"] is None
    assert out[1]["cs_rank"] == 1 and out[3]["cs_rank"] == 2


def test_ohlc_volatility_null_term_blocks_window(spark):
    """A bar whose ln-term is null (non-positive low here) must null
    every window containing it — not bias the mean over fewer terms."""
    from datetime import datetime, timedelta

    from marketdatapipeline_spark.operators.ohlc_vol import ohlc_volatility

    base = datetime(2024, 1, 1)
    rows = []
    for i in range(8):
        low = -1.0 if i == 3 else 99.0  # ln(high/low) null at i=3
        rows.append(
            ("A", base + timedelta(hours=i), i, 100.0, 101.0, low, 100.0)
        )
    df = spark.createDataFrame(
        rows, ["symbol", "datetime", "bar_id", "open", "high", "low", "close"]
    )
    out = sorted(
        ohlc_volatility(df, window=3).collect(), key=lambda r: r["bar_id"]
    )
    # windows covering index 3 (rows 3,4,5) have only 2 valid terms
    assert out[2]["vol_parkinson"] is not None
    for i in (3, 4, 5):
        assert out[i]["vol_parkinson"] is None
    assert out[7]["vol_parkinson"] is not None


def test_interval_overlap_join_left(spark):
    from datetime import datetime

    from marketdatapipeline_spark.operators import interval_overlap_join

    t = lambda h: datetime(2024, 1, 1, h)  # noqa: E731
    left = spark.createDataFrame(
        [("u1", 1, t(1), t(2)), ("u1", 2, t(10), t(11))],
        ["user", "lid", "ls", "le"],
    )
    right = spark.createDataFrame(
        [("u1", 7, t(1), t(3))], ["user", "rid", "rs", "re"]
    )
    out = interval_overlap_join(
        left, right,
        left_bounds=("ls", "le"), right_bounds=("rs", "re"),
        by=("user",), how="left",
    ).collect()
    got = {r["lid"]: r["rid"] for r in out}
    assert got == {1: 7, 2: None}
    with pytest.raises(ValueError, match="how"):
        interval_overlap_join(
            left, right, left_bounds=("ls", "le"),
            right_bounds=("rs", "re"), by=("user",), how="outer",
        )


def test_pairwise_correlation_lead_lag(spark):
    from datetime import datetime, timedelta

    from marketdatapipeline_spark.operators import (
        pairwise_return_correlation,
    )

    base = datetime(2024, 1, 1)
    rows = []
    # B's returns replay A's returns one bar later: corr(a_t, b_{t+1})
    # must be exactly 1 while the contemporaneous corr is the shifted
    # overlap (not 1)
    a_prices = [100.0, 110.0, 99.0, 113.85, 102.465, 117.83475]
    b_prices = [50.0]
    a_rets = [p1 / p0 - 1.0 for p0, p1 in zip(a_prices, a_prices[1:])]
    for r in [0.5] + a_rets[:-1]:  # b_1 differs, then replays a
        b_prices.append(b_prices[-1] * (1.0 + r))
    for i, p in enumerate(a_prices):
        rows.append(("A", base + timedelta(hours=i), i, p))
    for i, p in enumerate(b_prices):
        rows.append(("B", base + timedelta(hours=i), i, p))
    df = spark.createDataFrame(rows, ["symbol", "datetime", "bar_id", "close"])
    lagged = {
        (r["symbol_a"], r["symbol_b"]): r
        for r in pairwise_return_correlation(df, lag=1).collect()
    }
    assert lagged[("A", "B")]["corr"] == pytest.approx(1.0)
    # the reverse direction is a DIFFERENT series pairing, not 1
    assert lagged[("B", "A")]["corr"] != pytest.approx(1.0)
    assert lagged[("A", "B")]["n_obs"] == 4

    # ADVICE r8 (medium): the prefix decomposition silently dropped
    # every pair at lag < 0. corr at -k must equal the swapped-symbol
    # corr at +k, row for row.
    neg = {
        (r["symbol_a"], r["symbol_b"]): r
        for r in pairwise_return_correlation(df, lag=-1).collect()
    }
    assert set(neg) == {("A", "B"), ("B", "A")}
    for (sa, sb), row in neg.items():
        twin = lagged[(sb, sa)]
        assert row["n_obs"] == twin["n_obs"]
        assert row["corr"] == pytest.approx(twin["corr"], rel=1e-12)
    assert neg[("B", "A")]["corr"] == pytest.approx(1.0)


def test_realized_moments_vs_numpy(spark, bars_df, bars_pdf):
    import numpy as np

    from marketdatapipeline_spark.operators.moments import realized_moments

    got = {r["symbol"]: r for r in realized_moments(bars_df, order_cols=("datetime",)).collect()}
    for sym, grp in bars_pdf.sort_values(["symbol", "datetime"]).groupby("symbol"):
        r = grp["close"].to_numpy()
        rets = r[1:] / r[:-1] - 1.0
        n = len(rets)
        mean = rets.mean()
        m2 = ((rets - mean) ** 2).mean()
        m3 = ((rets - mean) ** 3).mean()
        m4 = ((rets - mean) ** 4).mean()
        row = got[sym]
        assert row["n_obs"] == n
        assert row["ret_mean"] == pytest.approx(mean, rel=1e-9)
        assert row["ret_std"] == pytest.approx(rets.std(ddof=1), rel=1e-9)
        assert row["ret_skew"] == pytest.approx(m3 / m2**1.5, rel=1e-7)
        assert row["ret_kurt"] == pytest.approx(m4 / m2**2 - 3.0, rel=1e-7)


def test_realized_moments_constant_price_null_not_nan(spark):
    """ADVICE r7: a constant-price symbol's s2 - s1²/n can round to a
    tiny negative double; sqrt of it would be NaN Spark-side while the
    oracle errors/diverges. The var_s >= 0 guard (mirrored in the
    oracle SQL) makes every degenerate moment NULL on both sides."""
    from datetime import datetime, timedelta

    from marketdatapipeline_spark.operators.moments import realized_moments

    base = datetime(2024, 1, 1)
    rows = [("C", base + timedelta(hours=i), i, 101.3) for i in range(6)]
    df = spark.createDataFrame(rows, ["symbol", "datetime", "bar_id", "close"])
    row = realized_moments(df, order_cols=("datetime",)).collect()[0]
    assert row["n_obs"] == 5 and row["ret_mean"] == 0.0
    # zero-variance: std is exactly 0 (decimal sums are exact here);
    # skew/kurt are NULL (m2 == 0), never NaN
    assert row["ret_std"] == 0.0
    assert row["ret_skew"] is None and row["ret_kurt"] is None
    # the var_s >= 0 guard itself: a synthetic tiny-negative variance
    # must null out, not surface as sqrt(negative) = NaN
    import math

    from pyspark.sql import functions as F

    neg = spark.createDataFrame([(5, -1e-30)], ["n_obs", "var_s"]).select(
        F.when(
            (F.col("n_obs") >= 2) & (F.col("var_s") >= 0),
            F.sqrt(F.col("var_s")),
        ).alias("ret_std")
    ).collect()[0]
    assert neg["ret_std"] is None and not (
        isinstance(neg["ret_std"], float) and math.isnan(neg["ret_std"])
    )


def test_return_autocorrelation_vs_numpy(spark, bars_df, bars_pdf):
    import numpy as np

    from marketdatapipeline_spark.operators.moments import (
        return_autocorrelation,
    )

    for lag in (1, 3):
        got = {
            r["symbol"]: r
            for r in return_autocorrelation(
                bars_df, lag=lag, order_cols=("datetime",)
            ).collect()
        }
        for sym, grp in bars_pdf.sort_values(["symbol", "datetime"]).groupby(
            "symbol"
        ):
            r = grp["close"].to_numpy()
            rets = r[1:] / r[:-1] - 1.0
            x, y = rets[:-lag], rets[lag:]
            # Spark pairs a (later return) with b (lag earlier): x is the
            # lagged side, y the current — corrcoef is symmetric anyway
            rho = np.corrcoef(x, y)[0, 1]
            row = got[sym]
            assert row["n_obs"] == len(x)
            assert row["autocorr"] == pytest.approx(rho, rel=1e-9)
            if 0 < rho < 1:
                assert row["half_life"] == pytest.approx(
                    -np.log(2.0) / np.log(rho), rel=1e-9
                )
            else:
                assert row["half_life"] is None


def test_candlestick_flags_hand_cases(spark):
    from datetime import datetime, timedelta

    from marketdatapipeline_spark.operators.candles import candlestick_flags

    base = datetime(2024, 1, 1)
    #               open   high   low    close
    bars = [
        ("doji",    100.0, 105.0, 95.0, 100.4),   # body 0.4 <= range/10 1.0
        ("hammer",  100.0, 100.5, 97.0, 100.3),   # lower 3.0 >= 2*0.3, upper 0.2 <= 0.3
        ("red",     102.0, 103.0, 99.0, 100.0),   # plain down bar
        ("bull",     99.8, 104.0, 99.0, 103.0),   # engulfs the red body
        ("bear",    103.5, 104.0, 99.0,  99.5),   # engulfs the bull body
    ]
    rows = [
        ("X", base + timedelta(hours=i), i, o, h, lo, c)
        for i, (_, o, h, lo, c) in enumerate(bars)
    ]
    df = spark.createDataFrame(
        rows, ["symbol", "datetime", "bar_id", "open", "high", "low", "close"]
    )
    out = candlestick_flags(df).orderBy("bar_id").collect()
    flags = [
        (r["is_doji"], r["is_hammer"], r["is_bull_engulf"], r["is_bear_engulf"])
        for r in out
    ]
    assert flags[0][0] == 1  # doji
    assert flags[1][1] == 1  # hammer
    assert flags[3][2] == 1 and flags[3][3] == 0  # bullish engulfing
    assert flags[4][3] == 1 and flags[4][2] == 0  # bearish engulfing
    # first bar can never be an engulfing (no previous body)
    assert flags[0][2] == 0 and flags[0][3] == 0


def test_amihud_vs_numpy(spark, bars_df, bars_pdf):
    import numpy as np

    from marketdatapipeline_spark.operators.liquidity import (
        amihud_illiquidity,
    )

    got = {r["symbol"]: r for r in amihud_illiquidity(bars_df, order_cols=("datetime",)).collect()}
    for sym, grp in bars_pdf.sort_values(["symbol", "datetime"]).groupby("symbol"):
        p = grp["close"].to_numpy()
        v = grp["volume"].to_numpy()
        rets = p[1:] / p[:-1] - 1.0
        dv = (p * v)[1:]
        keep = dv > 0
        want = 1e6 * np.mean(np.abs(rets[keep]) / dv[keep])
        row = got[sym]
        assert row["n_obs"] == int(keep.sum())
        assert row["amihud"] == pytest.approx(want, rel=1e-9)
        assert row["dollar_volume"] == pytest.approx(dv[keep].sum(), rel=1e-9)


def test_variance_ratio_vs_numpy(spark, bars_df, bars_pdf):
    import numpy as np

    from marketdatapipeline_spark.operators.variance_ratio import (
        variance_ratio,
    )

    k = 5
    got = {
        r["symbol"]: r
        for r in variance_ratio(
            bars_df, k=k, order_cols=("datetime",)
        ).collect()
    }
    for sym, grp in bars_pdf.sort_values(["symbol", "datetime"]).groupby(
        "symbol"
    ):
        p = grp["close"].to_numpy()
        r1 = np.log(p[1:] / p[:-1])
        rk = np.log(p[k:] / p[:-k])
        row = got[sym]
        assert row["n_obs_1"] == len(r1) and row["n_obs_k"] == len(rk)
        want = rk.var(ddof=1) / (k * r1.var(ddof=1))
        assert row["vr"] == pytest.approx(want, rel=1e-9)
    with pytest.raises(ValueError, match="k must"):
        variance_ratio(bars_df, k=1)


def test_variance_ratio_detects_regime(spark):
    """Construction check: a perfectly trending series has VR(k) well
    above 1 (k-period variance compounds), an alternating
    mean-reverting series well below 1."""
    from datetime import datetime, timedelta

    from marketdatapipeline_spark.operators.variance_ratio import (
        variance_ratio,
    )

    base = datetime(2024, 1, 1)
    rows = []
    trend, revert = 100.0, 100.0
    for i in range(80):
        # momentum: 10-bar up regimes alternating with 10-bar down
        # regimes — 4-period returns mostly compound within a regime,
        # so Var(r_4) ~ 16*Var(r_1) and VR(4) >> 1
        trend *= 1.02 if (i // 10) % 2 == 0 else 1 / 1.02
        # mean reversion: every 4-period window of +- alternation
        # telescopes to ~0, so VR(4) ~ 0
        revert *= 1.02 if i % 2 == 0 else 1 / 1.02
        rows.append(("T", base + timedelta(hours=i), i, trend))
        rows.append(("R", base + timedelta(hours=i), i, revert))
    df = spark.createDataFrame(rows, ["symbol", "datetime", "bar_id", "close"])
    got = {
        r["symbol"]: r["vr"]
        for r in variance_ratio(df, k=4, order_cols=("datetime",)).collect()
    }
    assert got["T"] > 1.5  # momentum
    assert got["R"] < 0.2  # strong mean reversion


def test_anchored_twap_vs_pandas(spark, bars_df, bars_pdf):
    from marketdatapipeline_spark.operators.vwap import anchored_twap

    got = (
        anchored_twap(bars_df, anchor="day", order_cols=("datetime",))
        .toPandas()
        .sort_values(["symbol", "datetime"])
        .reset_index(drop=True)
    )
    pdf = bars_pdf.sort_values(["symbol", "datetime"]).reset_index(drop=True)
    grp = [pdf["symbol"], pdf["datetime"].dt.floor("D")]
    want = pdf["close"].groupby(grp).transform(
        lambda s: s.expanding().mean()
    )
    import numpy as np

    np.testing.assert_allclose(
        got["twap"].to_numpy(), want.to_numpy(), rtol=1e-12
    )
    np.testing.assert_allclose(
        got["twap_dev"].to_numpy(),
        (pdf["close"] - want).to_numpy(),
        rtol=1e-9, atol=1e-12,
    )
    with pytest.raises(ValueError, match="anchor"):
        anchored_twap(bars_df, anchor="year")


def test_pair_spread_zscore_vs_pandas(spark, bars_df, bars_pdf):
    import numpy as np

    from marketdatapipeline_spark.operators.pairs import pair_spread_zscore

    w = 7
    got = (
        pair_spread_zscore(
            bars_df, "A", "B", window=w, order_cols=("datetime",)
        )
        .toPandas()
        .sort_values("bar_index")
        .reset_index(drop=True)
    )
    pdf = bars_pdf.sort_values(["symbol", "datetime"])
    pa = pdf[pdf["symbol"] == "A"]["close"].reset_index(drop=True)
    pb = pdf[pdf["symbol"] == "B"]["close"].reset_index(drop=True)
    n = min(len(pa), len(pb))
    spread = np.log(pa[:n].to_numpy()) - np.log(pb[:n].to_numpy())
    import pandas as pd

    s = pd.Series(spread)
    mean = s.rolling(w, min_periods=w).mean()
    std = s.rolling(w, min_periods=w).std(ddof=1)
    assert got["bar_index"].tolist() == list(range(1, n + 1))
    np.testing.assert_allclose(got["spread"].to_numpy(), spread, rtol=1e-12)
    np.testing.assert_allclose(
        got["spread_mean"].to_numpy(), mean.to_numpy(), rtol=1e-9
    )
    np.testing.assert_allclose(
        got["spread_std"].to_numpy(), std.to_numpy(), rtol=1e-9
    )
    np.testing.assert_allclose(
        got["zscore"].to_numpy(),
        ((s - mean) / std).to_numpy(),
        rtol=1e-9,
    )
    with pytest.raises(ValueError, match="differ"):
        pair_spread_zscore(bars_df, "A", "A")


def test_tick_rule_flow_semantics(spark):
    """Tick rule: uptick buy, downtick sell, zero tick carries the
    previous sign, leading unchanged prices unsigned (excluded)."""
    from datetime import datetime, timedelta

    from marketdatapipeline_spark.operators import tick_rule_flow

    base = datetime(2024, 1, 1, 9, 0)
    # prices: 100 (no sign), 100 (no sign, nothing to carry), 101 buy,
    # 101 carry->buy, 100 sell, 100 carry->sell, 102 buy
    prices = [100.0, 100.0, 101.0, 101.0, 100.0, 100.0, 102.0]
    vols = [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0]
    rows = [
        ("A", base + timedelta(minutes=i), i, p, v)
        for i, (p, v) in enumerate(zip(prices, vols))
    ]
    df = spark.createDataFrame(
        rows, ["symbol", "datetime", "bar_id", "close", "volume"]
    )
    out = tick_rule_flow(df, bucket="hour").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_buys"] == 3 and r["n_sells"] == 2
    assert r["buy_volume"] == 30.0 + 40.0 + 70.0
    assert r["sell_volume"] == 50.0 + 60.0
    tot = r["buy_volume"] + r["sell_volume"]
    assert r["imbalance"] == pytest.approx(
        (r["buy_volume"] - r["sell_volume"]) / tot
    )


def test_kyle_lambda_recovers_planted_slope(spark):
    """A noise-free linear impact dp = lam * signed_volume must
    recover lam exactly; regression vs numpy lstsq on a noisy series
    agrees to 1e-9."""
    from datetime import datetime, timedelta

    import numpy as np

    from marketdatapipeline_spark.operators import kyle_lambda

    base = datetime(2024, 1, 1)
    lam = 0.0025
    rng = np.random.RandomState(11)
    rows = []
    p = 100.0
    prices, vols = [p], [1.0]
    for i in range(1, 50):
        v = float(rng.randint(1, 100))
        sgn = 1.0 if rng.rand() < 0.5 else -1.0
        p = p + lam * sgn * v
        prices.append(p)
        vols.append(v)
    rows = [
        ("A", base + timedelta(hours=i), i, prices[i], vols[i])
        for i in range(len(prices))
    ]
    df = spark.createDataFrame(
        rows, ["symbol", "datetime", "bar_id", "close", "volume"]
    )
    out = kyle_lambda(df).collect()[0]
    # dp is EXACTLY lam*sv by construction and the tick sign recovers
    # sgn (every move is nonzero), so the slope is exact
    assert out["n_obs"] == 49
    assert out["lam"] == pytest.approx(lam, rel=1e-9)
    # degenerate: constant price -> no signed obs -> no row or null
    flat = spark.createDataFrame(
        [("B", base + timedelta(hours=i), i, 50.0, 5.0) for i in range(20)],
        ["symbol", "datetime", "bar_id", "close", "volume"],
    )
    res = kyle_lambda(flat).collect()
    assert res == [] or res[0]["lam"] is None


def test_profile_columns_semantics(spark):
    """Table profiler: nulls / exact distincts / numeric range + mean,
    non-numerics carry null numeric metrics, one agg job."""
    from datetime import datetime

    from marketdatapipeline_spark.profiling import profile_columns

    rows = [
        ("a", datetime(2024, 1, 1), 1.0, None),
        ("b", datetime(2024, 1, 2), 3.0, 10),
        (None, datetime(2024, 1, 2), None, 30),
        ("a", datetime(2024, 1, 3), 5.0, 20),
    ]
    df = spark.createDataFrame(rows, "s STRING, ts TIMESTAMP, x DOUBLE, k INT")
    out = {r["column"]: r for r in profile_columns(df).collect()}
    assert set(out) == {"s", "ts", "x", "k"}
    assert all(r["n_rows"] == 4 for r in out.values())
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_value"] is None and out["s"]["mean_value"] is None
    assert out["ts"]["n_distinct"] == 3
    assert out["x"]["n_nulls"] == 1
    assert out["x"]["min_value"] == 1.0 and out["x"]["max_value"] == 5.0
    assert out["x"]["mean_value"] == pytest.approx(3.0)
    assert out["k"]["mean_value"] == pytest.approx(20.0)
    with pytest.raises(ValueError, match="not present"):
        profile_columns(df, ["nope"])
    # subset selection
    sub = profile_columns(df, ["x"]).collect()
    assert len(sub) == 1 and sub[0]["column"] == "x"


def test_portfolio_returns_vs_numpy(spark):
    from datetime import datetime, timedelta

    import numpy as np

    from marketdatapipeline_spark.operators import portfolio_returns

    base = datetime(2024, 1, 1)
    rng = np.random.RandomState(5)
    rows = []
    series = {}
    for si, sym in enumerate(["A", "B", "C"]):
        n = 8 + si * 3  # ragged lengths
        p = 100.0 + np.cumsum(rng.randn(n))
        series[sym] = p
        rows += [
            (sym, base + timedelta(hours=i), i, float(p[i]))
            for i in range(n)
        ]
    df = spark.createDataFrame(rows, ["symbol", "datetime", "bar_id", "close"])
    weights = spark.createDataFrame(
        [("A", 0.5), ("B", 0.3), ("C", 0.2)], ["symbol", "weight"]
    )
    got = {
        r["bar_index"]: r for r in portfolio_returns(df, weights).collect()
    }
    rets = {s: p[1:] / p[:-1] - 1.0 for s, p in series.items()}
    w = {"A": 0.5, "B": 0.3, "C": 0.2}
    max_idx = max(len(r) for r in rets.values())
    for i in range(1, max_idx + 1):
        present = [s for s, r in rets.items() if len(r) >= i]
        mass = sum(w[s] for s in present)
        want = sum(w[s] * rets[s][i - 1] for s in present) / mass
        row = got[i]
        assert row["n_symbols"] == len(present)
        assert row["weight_mass"] == pytest.approx(mass)
        assert row["port_ret"] == pytest.approx(want, rel=1e-9)
    # renormalize=False divides by the FULL weight mass
    got2 = {
        r["bar_index"]: r
        for r in portfolio_returns(df, weights, renormalize=False).collect()
    }
    last = max(got2)
    present = [s for s, r in rets.items() if len(r) >= last]
    want = sum(w[s] * rets[s][last - 1] for s in present) / 1.0
    assert got2[last]["port_ret"] == pytest.approx(want, rel=1e-9)


def test_detect_gaps_semantics(spark):
    from datetime import datetime

    from marketdatapipeline_spark.operators import detect_gaps

    rows = [
        ("A", datetime(2024, 1, 1, 9), 1, 1.0),
        ("A", datetime(2024, 1, 1, 10), 2, 1.0),   # on grid
        ("A", datetime(2024, 1, 1, 13), 3, 1.0),   # 3h gap -> 2 missing
        ("A", datetime(2024, 1, 1, 14, 30), 4, 1.0),  # 1.5h -> 0 missing? floor(1.5)-1=0 but >1h IS a gap
        ("B", datetime(2024, 1, 1, 9), 5, 1.0),    # single bar: no pair
    ]
    df = spark.createDataFrame(rows, ["symbol", "datetime", "bar_id", "close"])
    got = {
        (r["symbol"], r["gap_start"]): r
        for r in detect_gaps(df, expected="1 hour").collect()
    }
    assert set(got) == {
        ("A", datetime(2024, 1, 1, 10)),
        ("A", datetime(2024, 1, 1, 13)),
    }
    g1 = got[("A", datetime(2024, 1, 1, 10))]
    assert g1["gap_s"] == 3 * 3600.0 and g1["n_missing"] == 2
    g2 = got[("A", datetime(2024, 1, 1, 13))]
    assert g2["gap_s"] == 1.5 * 3600.0 and g2["n_missing"] == 0


def test_detect_gaps_rejects_calendar_and_accepts_fixed_units(spark):
    """ADVICE r8: the anchor-date interval trick evaluated '1 month'
    as 31 January days. Calendar units now raise; fixed-length units
    parse driver-side, so '90 minutes' == '1.5 hours' exactly."""
    from datetime import datetime

    from marketdatapipeline_spark.operators import detect_gaps
    from marketdatapipeline_spark.operators.resample import (
        _fixed_interval_seconds,
    )

    assert _fixed_interval_seconds("90 minutes") == 5400.0
    assert _fixed_interval_seconds("1 week") == 604800.0
    assert _fixed_interval_seconds("2 days") == 2 * 86400.0
    for bad in ("1 month", "3 months", "1 year", "", "h 1", "-2 hours"):
        with pytest.raises(ValueError, match="fixed-length"):
            _fixed_interval_seconds(bad)
    rows = [
        ("A", datetime(2024, 1, 1, 9), 1, 1.0),
        ("A", datetime(2024, 1, 1, 12, 1), 2, 1.0),
    ]
    df = spark.createDataFrame(rows, ["symbol", "datetime", "bar_id", "close"])
    with pytest.raises(ValueError, match="fixed-length"):
        detect_gaps(df, expected="1 month")
    got = detect_gaps(df, expected="90 minutes").collect()
    assert len(got) == 1 and got[0]["n_missing"] == 1


def test_drawdown_summary_vs_pandas(spark):
    from datetime import datetime, timedelta

    from marketdatapipeline_spark.operators import drawdown_summary

    base = datetime(2024, 1, 1)
    # A: peak 110 at t1 (prints again at t5 AFTER the trough), trough 88 at t3
    pa = [100.0, 110.0, 95.0, 88.0, 104.0, 110.0]
    # B: monotone rise -> drawdown 0 at first row
    pb = [50.0, 51.0, 52.0, 53.0, 54.0, 55.0]
    rows = []
    for i, (a, b) in enumerate(zip(pa, pb)):
        rows.append(("A", base + timedelta(hours=i), i, a))
        rows.append(("B", base + timedelta(hours=i), i, b))
    df = spark.createDataFrame(rows, ["symbol", "datetime", "bar_id", "close"])
    out = {r["symbol"]: r for r in drawdown_summary(df).collect()}
    a = out["A"]
    assert a["max_drawdown"] == pytest.approx(88.0 / 110.0 - 1.0)
    assert a["trough_ts"] == base + timedelta(hours=3)
    assert a["peak_ts"] == base + timedelta(hours=1)  # not the later reprint
    assert a["peak_value"] == 110.0 and a["trough_value"] == 88.0
    b = out["B"]
    assert b["max_drawdown"] == 0.0
    # trough ties at every row (all drawdown 0): earliest wins
    assert b["trough_ts"] == base
    assert b["peak_ts"] == base and b["peak_value"] == 50.0


def test_validate_rules_semantics(spark):
    """Planted-violation frame: every check kind counts exactly the
    rows planted to violate it, in one aggregation pass."""
    import pandas as pd

    from marketdatapipeline_spark.profiling import validate_rules

    pdf = pd.DataFrame(
        {
            "id": [1, 2, 2, 3, None],
            "score": [0.5, 1.5, -0.5, 0.7, 0.9],
            "grade": ["a", "b", "z", "a", "b"],
            "name": ["alpha", "Beta", "9bad", "gamma", "delta"],
            "n": [5, 4, 4, 5, 5],
            "s": ["abcde", "abcd", "abcd", "abcde", "abc"],
        }
    )
    rules = [
        {"name": "id_not_null", "check": "not_null", "column": "id"},
        {"name": "id_unique", "check": "unique", "column": "id"},
        {"name": "score_01", "check": "range", "column": "score",
         "min": 0.0, "max": 1.0},
        {"name": "score_min_only", "check": "range", "column": "score",
         "min": 0.0},
        {"name": "grade_ab", "check": "in_set", "column": "grade",
         "values": ["a", "b"]},
        {"name": "name_alpha", "check": "matches", "column": "name",
         "pattern": "^[A-Za-z]"},
        {"name": "len_match", "check": "expr", "expr": "n = length(s)"},
    ]
    out = {
        r["rule"]: r
        for r in validate_rules(spark.createDataFrame(pdf), rules).collect()
    }
    assert len(out) == len(rules)
    want = {
        "id_not_null": 1,     # the None id
        "id_unique": 1,       # one extra occurrence of id=2
        "score_01": 2,        # 1.5 and -0.5
        "score_min_only": 1,  # -0.5
        "grade_ab": 1,        # z
        "name_alpha": 1,      # 9bad
        "len_match": 1,       # abc has length 3, n=5
    }
    for rule, v in want.items():
        row = out[rule]
        assert row["n_rows"] == 5
        assert row["n_violations"] == v, rule
        assert row["passed"] == (v == 0)
        assert row["violation_rate"] == v / 5.0
    assert out["len_match"]["column_name"] is None
    assert out["id_unique"]["check_type"] == "unique"


def test_validate_rules_rejects_bad_rules(spark):
    import pandas as pd
    import pytest as _pt

    from marketdatapipeline_spark.profiling import validate_rules

    df = spark.createDataFrame(pd.DataFrame({"x": [1]}))
    with _pt.raises(ValueError, match="unknown check kind"):
        validate_rules(df, [{"name": "r", "check": "nope", "column": "x"}])
    with _pt.raises(ValueError, match="needs min and/or max"):
        validate_rules(df, [{"name": "r", "check": "range", "column": "x"}])


def test_funnel_strict_sequencing(spark):
    """Hand-built sequences: out-of-order steps don't convert; strict
    ordering requires the NEXT step after the previous arrival."""
    import datetime as dt

    from marketdatapipeline_spark.operators.events import funnel

    t0 = dt.datetime(2024, 1, 1)

    def ev(u, typ, minutes):
        return (u, typ, t0 + dt.timedelta(minutes=minutes))

    rows = [
        # user 1: clean A -> B -> C
        ev(1, "A", 0), ev(1, "B", 1), ev(1, "C", 2),
        # user 2: B before A — never converts past step A
        ev(2, "B", 0), ev(2, "A", 1),
        # user 3: A -> B, C BEFORE B -> stops at B
        ev(3, "C", 0), ev(3, "A", 1), ev(3, "B", 2),
        # user 4: only A
        ev(4, "A", 5),
        # user 5: no A at all — not in funnel
        ev(5, "B", 0), ev(5, "C", 1),
    ]
    df = spark.createDataFrame(rows, "user_id LONG, event_type STRING, ts TIMESTAMP")
    out = {r["step"]: r for r in funnel(df, steps=("A", "B", "C")).collect()}
    assert out[1]["n_users"] == 4          # users 1-4 have an A
    assert out[2]["n_users"] == 2          # users 1, 3
    assert out[3]["n_users"] == 1          # user 1 only
    assert abs(out[2]["conv_from_prev"] - 0.5) < 1e-12
    assert abs(out[3]["conv_from_first"] - 0.25) < 1e-12
    # median A->B gap: users 1 (60s) and 3 (60s)
    assert abs(out[2]["median_seconds_from_prev"] - 60.0) < 1e-9
    assert out[1]["conv_from_prev"] is None

    import pytest as _pytest

    with _pytest.raises(ValueError, match="funnel steps"):
        funnel(df, steps=("A",))


def test_cohort_retention_hand_computed(spark):
    import datetime as dt

    from marketdatapipeline_spark.operators.events import cohort_retention

    mon = dt.datetime(2024, 1, 1)  # a Monday

    def ev(u, days):
        return (u, mon + dt.timedelta(days=days))

    rows = [
        ev(1, 0), ev(1, 7),   # week 0 cohort, active weeks 0 and 1
        ev(2, 1),             # week 0 cohort, week 0 only
        ev(3, 8), ev(3, 22),  # week 1 cohort, offsets 0 and 2
    ]
    df = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP")
    out = {
        (r["cohort"], r["period_offset"]): r
        for r in cohort_retention(df, period="week").collect()
    }
    w0, w1 = mon, mon + dt.timedelta(days=7)
    assert out[(w0, 0)]["n_active"] == 2 and out[(w0, 0)]["cohort_size"] == 2
    assert out[(w0, 1)]["n_active"] == 1
    assert abs(out[(w0, 1)]["retention"] - 0.5) < 1e-12
    assert out[(w1, 0)]["n_active"] == 1
    assert out[(w1, 2)]["n_active"] == 1
    assert (w1, 1) not in out  # no activity that week

    import pytest as _pytest

    with _pytest.raises(ValueError, match="period"):
        cohort_retention(df, period="month")


def test_underwater_spells_hand_computed(spark):
    """Crafted price path with known spell structure: peaks at 10,
    spells of length 2 and 3, the longest spell carries the worst dd."""
    import datetime as dt

    from marketdatapipeline_spark.operators.drawdown import underwater_spells

    t0 = dt.datetime(2024, 1, 1)
    closes = [10.0, 9.0, 9.5, 10.0, 11.0, 10.0, 8.0, 9.0, 11.0, 12.0]
    # drawdowns: 0, -.1, -.05, 0, 0, -1/11, -3/11, -2/11, 0, 0
    # spells: [1,2] (len 2, dd -.1), [5,6,7] (len 3, dd -3/11)
    rows = [
        ("A", t0 + dt.timedelta(minutes=i), i, c) for i, c in enumerate(closes)
    ]
    df = spark.createDataFrame(rows, "symbol STRING, datetime TIMESTAMP, bar_id LONG, close DOUBLE")
    r = underwater_spells(df).collect()[0]
    assert r["n_spells"] == 2
    assert r["longest_spell"] == 3
    assert abs(r["mean_spell"] - 2.5) < 1e-12
    assert abs(r["worst_spell_dd"] - (8.0 / 11.0 - 1.0)) < 1e-12
    assert abs(r["pct_underwater"] - 0.5) < 1e-12


def test_realized_kernel_vs_numpy(spark, bars_df, bars_pdf):
    import numpy as np

    from marketdatapipeline_spark.operators.moments import (
        realized_kernel_volatility,
    )

    H = 5
    got = {
        r["symbol"]: r
        for r in realized_kernel_volatility(
            bars_df, n_lags=H, order_cols=("datetime",)
        ).collect()
    }
    for sym, grp in bars_pdf.sort_values(["symbol", "datetime"]).groupby("symbol"):
        p = grp["close"].to_numpy()
        r = p[1:] / p[:-1] - 1.0
        g0 = float((r * r).sum())
        rk = g0
        for h in range(1, H + 1):
            gh = float((r[h:] * r[:-h]).sum())
            rk += (1.0 - h / (H + 1.0)) * 2.0 * gh
        row = got[sym]
        assert row["n_obs"] == len(r)
        assert row["rv"] == pytest.approx(g0, rel=1e-9)
        assert row["rk_var"] == pytest.approx(rk, rel=1e-9)
        if rk > 0:
            assert row["rk_vol"] == pytest.approx(rk**0.5, rel=1e-9)
    from marketdatapipeline_spark.operators.moments import (
        realized_kernel_volatility as rkv,
    )

    with pytest.raises(ValueError, match="n_lags"):
        rkv(bars_df, n_lags=0)


def test_dual_beta_vs_numpy(spark, bars_df, bars_pdf):
    import numpy as np

    from marketdatapipeline_spark.operators.beta import dual_beta

    got = {
        r["symbol"]: r
        for r in dual_beta(
            bars_df, order_cols=("datetime",), min_obs=5
        ).collect()
    }
    # rebuild the aligned return/market series the operator defines
    per = {}
    for sym, grp in bars_pdf.sort_values(["symbol", "datetime"]).groupby("symbol"):
        p = grp["close"].to_numpy()
        per[sym] = p[1:] / p[:-1] - 1.0
    max_len = max(len(v) for v in per.values())
    for sym, r in per.items():
        ups, downs = [], []
        for i in range(len(r)):
            present = [s for s, v in per.items() if len(v) > i]
            m = float(np.mean([per[s][i] for s in present]))
            (ups if m > 0 else downs if m < 0 else []).append((r[i], m))
        row = got[sym]
        assert row["n_up"] == len(ups) and row["n_down"] == len(downs)
        for tag, pairs in (("beta_up", ups), ("beta_down", downs)):
            if len(pairs) >= 5:
                x = np.array([a for a, _ in pairs])
                mm = np.array([b for _, b in pairs])
                denom = len(pairs) * (mm * mm).sum() - mm.sum() ** 2
                if denom > 0:
                    want = (
                        len(pairs) * (x * mm).sum() - x.sum() * mm.sum()
                    ) / denom
                    assert row[tag] == pytest.approx(want, rel=1e-9), (sym, tag)


def test_pairwise_correlation_randomized_lags_vs_numpy(spark):
    """Randomized parity across lags 0 / +1 / +2 / -2 with UNEQUAL
    series lengths — the prefix boundary lookups (a at m, b at m+k
    and k) are only right if every length/lag combination aligns
    exactly; the r8 negative-lag defect lived precisely here."""
    from datetime import datetime, timedelta

    import numpy as np

    from marketdatapipeline_spark.operators.correlation import (
        pairwise_return_correlation,
    )

    rng = np.random.default_rng(42)
    base = datetime(2024, 1, 1)
    lengths = {"A": 37, "B": 52, "C": 23, "D": 44}
    prices = {
        s: 100.0 * np.cumprod(1.0 + rng.normal(0, 0.01, n))
        for s, n in lengths.items()
    }
    rows = [
        (s, base + timedelta(hours=i), i, float(p))
        for s, ps in prices.items()
        for i, p in enumerate(ps)
    ]
    df = spark.createDataFrame(rows, ["symbol", "datetime", "bar_id", "close"])
    rets = {s: ps[1:] / ps[:-1] - 1.0 for s, ps in prices.items()}

    def want(a, b, k):
        ra, rb = rets[a], rets[b]
        if k >= 0:
            m = min(len(ra), len(rb) - k)
            x, y = ra[:m], rb[k : m + k]
        else:
            return want(b, a, -k)
        if m < 2:
            return None
        return m, float(np.corrcoef(x, y)[0, 1])

    for lag in (0, 1, 2, -2):
        got = {
            (r["symbol_a"], r["symbol_b"]): r
            for r in pairwise_return_correlation(df, lag=lag).collect()
        }
        syms = sorted(lengths)
        expected_pairs = (
            {(a, b) for a in syms for b in syms if a < b}
            if lag == 0
            else {(a, b) for a in syms for b in syms if a != b}
        )
        assert set(got) == expected_pairs, f"lag={lag}"
        for (a, b), row in got.items():
            m, rho = want(a, b, lag)  # want() handles the negative-lag swap
            assert row["n_obs"] == m, f"lag={lag} pair={a},{b}"
            assert row["corr"] == pytest.approx(rho, rel=1e-9), (
                f"lag={lag} pair={a},{b}"
            )


def test_global_row_number_matches_single_task_window(spark):
    """r10 distributed rank: range-partitioned row_number + prefix
    offsets must be bit-identical to the lit(1) global window it
    replaces — including duplicate order keys resolved by the
    tiebreak, descending order, and the free total column."""
    import random

    from pyspark.sql import Window as W

    from marketdatapipeline_spark.operators.ranking import global_row_number

    rng = random.Random(7)
    rows = [(i, rng.choice([0.0, 1.5, 2.5, 7.25])) for i in range(2003)]
    df = spark.createDataFrame(rows, ["k", "v"]).repartition(7)

    # threshold=0 pins the DISTRIBUTED path; the default routing
    # (single-task window at this size) is checked by the same
    # assertions afterwards — both must match the window exactly
    got = {
        r["k"]: (r["rk"], r["n"])
        for r in global_row_number(
            df, F.desc("v"), F.col("k"), out_col="rk", total_col="n",
            single_task_threshold=0,
        ).collect()
    }
    got_auto = {
        r["k"]: (r["rk"], r["n"])
        for r in global_row_number(
            df, F.desc("v"), F.col("k"), out_col="rk", total_col="n"
        ).collect()
    }
    assert got_auto == got
    wall = W.partitionBy(F.lit(1)).orderBy(F.desc("v"), "k")
    want = {
        r["k"]: r["rk"]
        for r in df.select("k", F.row_number().over(wall).alias("rk")).collect()
    }
    assert len(got) == 2003
    for k, (rk, n) in got.items():
        assert n == 2003
        assert rk == want[k], k


def test_global_row_number_spreads_across_partitions(spark):
    """The point of the operator: no single task sees the whole
    table. With enough input rows the range partitioner must produce
    more than one non-empty partition."""
    from marketdatapipeline_spark.operators.ranking import global_row_number

    df = spark.range(10_000).select(F.col("id").alias("k"))
    out = global_row_number(
        df, F.col("k"), out_col="rk", single_task_threshold=0
    )
    npart = (
        out.select(F.spark_partition_id().alias("p")).distinct().count()
    )
    assert npart > 1
    # dense 1..N
    agg = out.agg(F.min("rk"), F.max("rk"), F.count(F.lit(1))).first()
    assert tuple(agg) == (1, 10_000, 10_000)


def test_global_row_number_requires_order():
    import pytest as _pytest

    from marketdatapipeline_spark.operators.ranking import global_row_number

    with _pytest.raises(ValueError, match="order column"):
        global_row_number(None)


def test_global_row_number_cumsum_matches_window(spark):
    """Distributed running sums (integer-exact) must match the
    single-task sum() OVER (ORDER BY) bit-for-bit, including the free
    grand-total column."""
    import random

    from pyspark.sql import Window as W

    from marketdatapipeline_spark.operators.ranking import global_row_number

    rng = random.Random(11)
    rows = [(i, rng.choice([0.0, 3.5, 9.25]), rng.randint(0, 1)) for i in range(1501)]
    df = spark.createDataFrame(rows, ["k", "v", "t"]).repartition(5)
    got = {
        r["k"]: (r["rk"], r["tp"], r["tp_tot"])
        for r in global_row_number(
            df, F.desc("v"), F.col("k"),
            out_col="rk", cumsum={"tp": "t"}, cumsum_totals={"tp_tot": "tp"},
            single_task_threshold=0,
        ).collect()
    }
    wall = W.partitionBy(F.lit(1)).orderBy(F.desc("v"), "k")
    wrun = wall.rowsBetween(W.unboundedPreceding, W.currentRow)
    want = {
        r["k"]: (r["rk"], r["tp"], r["tp_tot"])
        for r in df.select(
            "k",
            F.row_number().over(wall).alias("rk"),
            F.sum("t").over(wrun).alias("tp"),
            F.sum("t").over(W.partitionBy(F.lit(1))).alias("tp_tot"),
        ).collect()
    }
    assert got == want


def test_global_row_number_rejects_float_cumsum(spark):
    import pytest as _pytest

    from marketdatapipeline_spark.operators.ranking import global_row_number

    df = spark.range(10).select(F.col("id"), F.rand(1).alias("x"))
    with _pytest.raises(ValueError, match="exact"):
        global_row_number(df, F.col("id"), cumsum={"cx": "x"})


def test_global_row_number_empty_input(spark):
    from marketdatapipeline_spark.operators.ranking import global_row_number

    df = spark.range(0).select(F.col("id").alias("k"), F.lit(0).alias("t"))
    out = global_row_number(
        df, F.col("k"), out_col="rk", total_col="n", cumsum={"ct": "t"}
    )
    assert out.count() == 0


def test_global_row_number_null_cumsum_matches_window(spark):
    """r11 (ADVICE): nullable cumsum inputs must reproduce the
    window's null-skipping semantics exactly — NULL only while every
    value so far (across partition boundaries) is null, carrying the
    preceding partitions' total after a null, and an all-null column's
    grand total staying NULL."""
    import random

    from pyspark.sql import Window as W

    from marketdatapipeline_spark.operators.ranking import global_row_number

    rng = random.Random(23)
    rows = [
        (
            i,
            # leading all-null run so early range partitions have
            # NULL partition sums (offset must stay NULL there)
            None if i < 400 else rng.choice([None, 1, 3, 7]),
            None,  # all-null column: totals must be NULL, not 0
        )
        for i in range(2201)
    ]
    df = spark.createDataFrame(
        rows, "k int, t int, z int"
    ).repartition(6)
    got = {
        r["k"]: (r["ct"], r["ct_tot"], r["cz"], r["cz_tot"])
        for r in global_row_number(
            df, F.col("k"), out_col="rk",
            cumsum={"ct": "t", "cz": "z"},
            cumsum_totals={"ct_tot": "ct", "cz_tot": "cz"},
            single_task_threshold=0,
        ).collect()
    }
    wall = W.partitionBy(F.lit(1)).orderBy("k")
    wrun = wall.rowsBetween(W.unboundedPreceding, W.currentRow)
    want = {
        r["k"]: (r["ct"], r["ct_tot"], r["cz"], r["cz_tot"])
        for r in df.select(
            "k",
            F.sum("t").over(wrun).alias("ct"),
            F.sum("t").over(W.partitionBy(F.lit(1))).alias("ct_tot"),
            F.sum("z").over(wrun).alias("cz"),
            F.sum("z").over(W.partitionBy(F.lit(1))).alias("cz_tot"),
        ).collect()
    }
    assert got == want
    # the all-null column's cumulative and total really are NULL
    assert all(v[2] is None and v[3] is None for v in got.values())


def test_global_row_number_decimal_cumsum_total_type(spark):
    """r11 (ADVICE): decimal cumsum totals must keep the window-sum
    decimal dtype (no silent cast to long truncating fractions), on
    BOTH routes."""
    from decimal import Decimal

    from marketdatapipeline_spark.operators.ranking import global_row_number

    rows = [(i, Decimal(f"{i}.25")) for i in range(9)]
    df = spark.createDataFrame(rows, "k int, v decimal(10,2)")
    for thr in (0, 10_000):  # distributed, then single-task
        out = global_row_number(
            df, F.col("k"), out_col="rk",
            cumsum={"cv": "v"}, cumsum_totals={"tv": "cv"},
            single_task_threshold=thr,
        )
        kinds = dict(out.dtypes)
        assert kinds["cv"] == "decimal(20,2)", (thr, kinds)
        assert kinds["tv"] == "decimal(20,2)", (thr, kinds)
        rs = {r["k"]: (r["cv"], r["tv"]) for r in out.collect()}
        assert rs[8] == (Decimal("38.25"), Decimal("38.25")), (thr, rs[8])
        assert rs[0] == (Decimal("0.25"), Decimal("38.25")), (thr, rs[0])


def test_global_row_number_size_hint_skips_probe(spark):
    """size_hint routes without the persist+count probe; values
    (including the exact total columns) must be identical to the
    probed routing on both sides of the threshold."""
    from marketdatapipeline_spark.operators.ranking import global_row_number

    df = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("int").alias("t")
    )
    base = {
        r["k"]: (r["rk"], r["n"], r["ct"], r["tt"])
        for r in global_row_number(
            df, F.col("k"), out_col="rk", total_col="n",
            cumsum={"ct": "t"}, cumsum_totals={"tt": "ct"},
        ).collect()
    }
    for hint, thr in ((500, 1000), (500, 10)):  # small route, big route
        got = {
            r["k"]: (r["rk"], r["n"], r["ct"], r["tt"])
            for r in global_row_number(
                df, F.col("k"), out_col="rk", total_col="n",
                cumsum={"ct": "t"}, cumsum_totals={"tt": "ct"},
                size_hint=hint, single_task_threshold=thr,
            ).collect()
        }
        assert got == base, thr
    # an approximate hint still yields exact totals (routing is
    # physical; values never come from the hint)
    got = {
        r["k"]: (r["n"], r["tt"])
        for r in global_row_number(
            df, F.col("k"), out_col="rk", total_col="n",
            cumsum={"ct": "t"}, cumsum_totals={"tt": "ct"},
            size_hint=99_999,
        ).collect()
    }
    want_tt = sum(i % 3 for i in range(500))
    assert all(v == (500, want_tt) for v in got.values())


def test_scoped_persist_pin_survives_max_live(spark):
    """r11 (ADVICE medium): pinned frames (ranking's range layout,
    whose recompute is NOT value-safe) must never be evicted by the
    MAX_LIVE pop-oldest backstop; unpinned frames still rotate."""
    from marketdatapipeline_spark import caching
    from marketdatapipeline_spark.caching import release_caches, scoped_persist

    release_caches()
    pinned = scoped_persist(spark.range(5), pin=True)
    frames = [scoped_persist(spark.range(i + 10)) for i in range(caching.MAX_LIVE + 4)]
    assert pinned.storageLevel.useMemory  # still persisted
    assert not frames[0].storageLevel.useMemory  # oldest unpinned evicted
    n = release_caches()
    assert n >= 1
    assert not pinned.storageLevel.useMemory  # release still frees pins
