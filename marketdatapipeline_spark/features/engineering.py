"""Feature engineering: ~50 technical-indicator columns, Spark-native.

Re-expresses reference src/features/engineering.py on one multi-symbol
DataFrame. The reference holds one eager frame per symbol and loops in
Python (reference src/main.py:63-87); here every sequence operator is a
window over ``Window.partitionBy(symbol).orderBy(datetime)`` — a single
hash exchange on ``symbol``, after which all ~50 columns compute in one
whole-stage-codegen'd Window stage, embarrassingly parallel across
symbols and spill-safe at any data size.

Semantics faithfully preserved (SURVEY.md §2 traps):
  T1  rolling aggregates NULL until the window is full (windows.py)
  T2  cyclic encodings use the literal 3.14159, not pi
      (reference src/features/engineering.py:187-192)
  F6  day_of_week is Monday=1..Sunday=7 (Polars convention,
      reference engineering.py:180) — Spark's ``weekday()`` is
      Monday=0, hence the +1
  eps all guarded divisions use + 1e-10, never nullif/try_divide
      (reference engineering.py:45,96,105,114)
Within one Polars ``with_columns`` batch, expressions see the *input*
frame; a Spark ``select("*", ...)`` has identical semantics, so derived
expressions are inlined rather than chained.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from marketdatapipeline_spark.features.ewm import (
    add_technical_ewm_features,
    add_technical_ewm_features_native,
)


def _ewm_features(df, impl: str, **kwargs) -> DataFrame:
    """Dispatch RSI/MACD EWMA implementation.

    ``native`` (default): all-JVM blocked scan — deterministic,
    Python-free, the scale path. ``pandas``: one applyInPandas pass —
    the exactness reference (bit-equal to pandas/Polars ewm).
    """
    if impl == "native":
        return add_technical_ewm_features_native(df, **kwargs)
    if impl == "pandas":
        return add_technical_ewm_features(df, **kwargs)
    raise ValueError(f"Unknown ewm_impl: {impl}")
from marketdatapipeline_spark.features.windows import (
    RollingPlan,
    rolling_mean,
    rolling_std,
    rolling_sum,
)

EPS = 1e-10
#: Reference uses this literal, not math.pi (engineering.py:187-192).
PI_LITERAL = 3.14159


def _base_window(symbol_col: str, order_cols: tuple[str, ...]) -> WindowSpec:
    return Window.partitionBy(symbol_col).orderBy(*[F.col(c) for c in order_cols])


def _require(df: DataFrame, cols: tuple[str, ...]) -> None:
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"Required column(s) {missing} not present")


def compute_technical_features(
    df: DataFrame,
    rsi_period: int = 14,
    macd_fast: int = 12,
    macd_slow: int = 26,
    macd_signal: int = 9,
    bb_period: int = 20,
    bb_std: float = 2.0,
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime",),
    ewm_impl: str = "native",
) -> DataFrame:
    """RSI, MACD, Bollinger Bands (reference engineering.py:7-70).

    Bollinger is pure rolling mean/std → native windows; RSI/MACD need
    EWMA → the native blocked scan (default) or an applyInPandas pass
    (see features/ewm.py).
    """
    _require(df, ("close",))
    w = _base_window(symbol_col, order_cols)

    out = _ewm_features(
        df,
        ewm_impl,
        rsi_period=rsi_period,
        macd_fast=macd_fast,
        macd_slow=macd_slow,
        macd_signal=macd_signal,
        symbol_col=symbol_col,
        order_cols=order_cols,
    )

    plan = RollingPlan(w)
    return plan.apply(out, _bollinger_outputs(bb_period, bb_std, plan))


def _bollinger_outputs(
    bb_period: int, bb_std: float, plan: RollingPlan
) -> dict[str, Column]:
    close = F.col("close")
    sma = plan.mean(close, bb_period, "close")
    std = plan.std(close, bb_period, "close")
    upper = sma + (std * bb_std)
    lower = sma - (std * bb_std)
    return {
        "bb_middle": sma,
        "bb_upper": upper,
        "bb_lower": lower,
        "bb_width": (upper - lower) / sma,
    }


def momentum_expressions(
    periods: tuple[int, ...],
    w: WindowSpec,
    close: Column = None,
) -> dict[str, Column]:
    """return/momentum/roc/sma/distance_sma per period
    (reference engineering.py:73-117), as self-contained expressions.

    Prefer :func:`compute_momentum_features` in pipelines — it
    materializes each window primitive once (Catalyst does NOT
    deduplicate repeated window expressions, so the inline form
    evaluates every ``lag``/``avg`` several times per period).
    """
    close = close if close is not None else F.col("close")
    exprs: dict[str, Column] = {}
    for p in periods:
        shifted = F.lag(close, p).over(w)
        ret = (close - shifted) / (shifted + F.lit(EPS))
        sma = rolling_mean(close, p, w)
        exprs[f"return_{p}"] = ret
        exprs[f"momentum_{p}"] = close - shifted
        exprs[f"roc_{p}"] = ret * 100
        exprs[f"sma_{p}"] = sma
        exprs[f"distance_sma_{p}"] = (close - sma) / (sma + F.lit(EPS)) * 100
    return exprs


def _momentum_offsets(periods: tuple[int, ...], w: WindowSpec) -> dict[str, Column]:
    close = F.col("close")
    return {f"_lag_close_{p}": F.lag(close, p).over(w) for p in periods}


def _momentum_outputs(
    periods: tuple[int, ...], plan: RollingPlan
) -> dict[str, Column]:
    """Derivations over materialized offsets + prefix-sum aggregates."""
    close = F.col("close")
    out: dict[str, Column] = {}
    for p in periods:
        shifted = F.col(f"_lag_close_{p}")
        sma = plan.mean(close, p, "close")
        ret = (close - shifted) / (shifted + F.lit(EPS))
        out[f"return_{p}"] = ret
        out[f"momentum_{p}"] = close - shifted
        out[f"roc_{p}"] = ret * 100
        out[f"sma_{p}"] = sma
        out[f"distance_sma_{p}"] = (close - sma) / (sma + F.lit(EPS)) * 100
    return out


def compute_momentum_features(
    df: DataFrame,
    periods: tuple[int, ...] = (5, 10, 20, 50),
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime",),
) -> DataFrame:
    _require(df, ("close",))
    periods = tuple(periods)
    w = _base_window(symbol_col, order_cols)
    plan = RollingPlan(w)
    offsets = _momentum_offsets(periods, w)
    outputs = _momentum_outputs(periods, plan)
    return plan.apply(df.withColumns(offsets), outputs).drop(*offsets.keys())


def volatility_expressions(
    windows: tuple[int, ...],
    w: WindowSpec,
    has_hl: bool,
) -> dict[str, Column]:
    """returns + volatility/realized_vol/hl_range per window
    (reference engineering.py:120-157), as self-contained expressions.
    ``returns`` is pct_change: (x - lag x) / lag x, NULL on each
    symbol's first row. Prefer :func:`compute_volatility_features`
    in pipelines (single evaluation per window primitive)."""
    close = F.col("close")
    prev = F.lag(close, 1).over(w)
    returns = (close - prev) / prev
    exprs: dict[str, Column] = {"returns": returns}
    for n in windows:
        exprs[f"volatility_{n}"] = rolling_std(returns, n, w)
        exprs[f"realized_vol_{n}"] = rolling_sum(F.pow(returns, 2), n, w)
        if has_hl:
            hl = (F.col("high") - F.col("low")) / close
            exprs[f"hl_range_{n}"] = rolling_mean(hl, n, w)
    return exprs


def _volatility_outputs(
    windows: tuple[int, ...],
    has_hl: bool,
    hl_plan: RollingPlan,
    ret_plan: RollingPlan,
) -> dict[str, Column]:
    """hl aggregates come from the close-stage plan (hl is plain
    arithmetic over the input row); returns aggregates come from the
    second-stage plan (returns is itself a window output).
    realized_vol is the rolling sum of returns^2 — the same running
    sum-of-squares the rolling std needs, shared via the plan."""
    hl = (F.col("high") - F.col("low")) / F.col("close")
    ret = F.col("returns")
    out: dict[str, Column] = {}
    for n in windows:
        out[f"volatility_{n}"] = ret_plan.std(ret, n, "ret")
        out[f"realized_vol_{n}"] = ret_plan.sum_of_squares(ret, n, "ret")
        if has_hl:
            out[f"hl_range_{n}"] = hl_plan.mean(hl, n, "hl")
    return out


def compute_volatility_features(
    df: DataFrame,
    windows: tuple[int, ...] = (10, 20, 60),
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime",),
) -> DataFrame:
    _require(df, ("close",))
    windows = tuple(windows)
    w = _base_window(symbol_col, order_cols)
    has_hl = "high" in df.columns and "low" in df.columns
    close = F.col("close")
    prev = F.lag(close, 1).over(w)
    hl_plan = RollingPlan(w, tag="h")
    ret_plan = RollingPlan(w, tag="t")
    outputs = _volatility_outputs(windows, has_hl, hl_plan, ret_plan)
    step = hl_plan.materialize(df.withColumn("returns", (close - prev) / prev))
    step = ret_plan.materialize(step)
    return step.withColumns(outputs).drop(
        *hl_plan.temp_columns, *ret_plan.temp_columns
    )


def temporal_expressions(datetime_col: str = "datetime") -> dict[str, Column]:
    """Calendar + cyclic-encoded features (reference engineering.py:160-195).

    day_of_week follows Polars (Mon=1..Sun=7): Spark weekday() is Mon=0.
    Cyclic encodings reuse the *output* integer columns in the reference
    (second with_columns batch) — same here via direct expressions.
    """
    ts = F.col(datetime_col)
    cal = {
        "hour": F.hour(ts),
        "minute": F.minute(ts),
        "day_of_week": F.weekday(ts) + F.lit(1),
        "day": F.dayofmonth(ts),
        "month": F.month(ts),
    }
    two_pi = 2 * PI_LITERAL
    cyc = {}
    for name, period in (("hour", 24), ("day_of_week", 7), ("month", 12)):
        angle = cal[name] * two_pi / period
        cyc[f"{name}_sin"] = F.sin(angle)
        cyc[f"{name}_cos"] = F.cos(angle)
    return {**cal, **cyc}


def compute_temporal_features(
    df: DataFrame, datetime_col: str = "datetime"
) -> DataFrame:
    _require(df, (datetime_col,))
    return df.withColumns(temporal_expressions(datetime_col))


def compute_all_features(
    df: DataFrame,
    datetime_col: str = "datetime",
    momentum_periods: tuple[int, ...] | None = None,
    volatility_windows: tuple[int, ...] | None = None,
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] | None = None,
    rsi_period: int = 14,
    macd_fast: int = 12,
    macd_slow: int = 26,
    macd_signal: int = 9,
    bb_period: int = 20,
    bb_std: float = 2.0,
    ewm_impl: str = "native",
    target_horizon: int | None = None,
    target_type: str = "classification",
    engine: str = "arrow",
) -> DataFrame:
    """All feature families (reference engineering.py:198-226): 7 input
    columns (symbol + OHLCV + datetime) -> 55; generate_targets adds the
    56th (or pass ``target_horizon`` to fuse it).

    ``engine="arrow"`` (default): one groupBy(symbol).applyInPandas
    pass — single exchange, vectorized per-symbol kernels, the fastest
    strategy for the full 56-column derivation (see
    features/arrow_engine.py for the measured rationale).
    ``engine="chunked"``: the arrow kernel over halo-overlap blocks of
    each symbol — the scale path for monster single-symbol series
    (per-symbol history no longer bound to one task).
    ``engine="auto"``: one cheap aggregation probe (count +
    approx_count_distinct) routes to ``chunked`` when the average
    per-symbol history exceeds ~200k rows, else ``arrow``.
    ``engine="sql"``: pure window-operator plan — every feature as a
    native Catalyst expression (prefix-sum rolling aggregates, blocked
    EWMA scan). Composable with further relational ops, but the 10+
    chained Window nodes cost more for the full batch derivation.

    ``target_horizon`` fuses target generation (reference
    targets.py:30-43) into the same stage; in the SQL engine the
    lead(close) primitive computes while the frame is still narrow, so
    the wide 56-column result never passes through a window buffer —
    windows copy every buffered row, so row width inside them is the
    dominant cost at scale.
    """
    probed_n: int | None = None
    if engine == "auto":
        n, syms = df.agg(
            F.count("*"), F.approx_count_distinct(symbol_col)
        ).first()
        probed_n = n
        engine = "chunked" if syms and n / syms > 200_000 else "arrow"
    if engine in ("arrow", "chunked"):
        from marketdatapipeline_spark.features.arrow_engine import (
            compute_all_features_arrow,
            compute_all_features_chunked,
        )

        impl = (
            compute_all_features_arrow if engine == "arrow"
            else compute_all_features_chunked
        )
        # both engines use the probed size: chunked for block layout,
        # arrow to widen the kernel exchange past the session default
        # (rows-per-task cap — see arrow_engine.TARGET_ROWS_PER_TASK)
        extra = {"n_rows": probed_n} if probed_n is not None else {}
        return impl(
            df,
            **extra,
            datetime_col=datetime_col,
            momentum_periods=momentum_periods,
            volatility_windows=volatility_windows,
            symbol_col=symbol_col,
            order_cols=order_cols,
            rsi_period=rsi_period,
            macd_fast=macd_fast,
            macd_slow=macd_slow,
            macd_signal=macd_signal,
            bb_period=bb_period,
            bb_std=bb_std,
            target_horizon=target_horizon,
            target_type=target_type,
        )
    if engine != "sql":
        raise ValueError(f"Unknown engine: {engine}")
    momentum_periods = tuple(momentum_periods or (5, 10, 20, 50))
    volatility_windows = tuple(volatility_windows or (10, 20, 60))
    order_cols = tuple(order_cols or (datetime_col,))
    _require(df, ("close", datetime_col))

    # 1) EWMA pass: rsi/macd/macd_signal/macd_histogram on the narrow
    #    input frame, before the window stage.
    kwargs = dict(
        rsi_period=rsi_period,
        macd_fast=macd_fast,
        macd_slow=macd_slow,
        macd_signal=macd_signal,
        symbol_col=symbol_col,
        order_cols=order_cols,
    )
    if ewm_impl == "native":
        # keep the blocked scan's _blk column so every window below can
        # order by (_blk, *order) — same results (monotone _blk), one
        # shared physical sort across the EWMA and rolling stages.
        df = add_technical_ewm_features_native(df, keep_block_columns=True, **kwargs)
        window_order = ("_blk", *order_cols)
    else:
        df = _ewm_features(df, ewm_impl, **kwargs)
        window_order = order_cols

    # 2) Native window stage, O(n) per column: offsets (lag) and
    #    running prefix sums materialize once per distinct primitive
    #    (Catalyst does not deduplicate repeated window expressions),
    #    rolling aggregates derive from prefix-sum differences
    #    (RollingPlan — Spark's sliding frames are O(rows x window)),
    #    and every feature is a plain codegen'd projection over them.
    #    All window nodes share one partitioning and order: ONE
    #    exchange + sort for the whole stage.
    w = _base_window(symbol_col, window_order)
    has_hl = "high" in df.columns and "low" in df.columns
    close = F.col("close")
    prev = F.lag(close, 1).over(w)

    base_plan = RollingPlan(w)  # close + hl aggregates
    ret_plan = RollingPlan(w, tag="t")  # aggregates over `returns`

    offsets = {
        **_momentum_offsets(momentum_periods, w),
        "returns": (close - prev) / prev,
    }
    outputs = {
        **_bollinger_outputs(bb_period, bb_std, base_plan),
        **_momentum_outputs(momentum_periods, base_plan),
        **_volatility_outputs(volatility_windows, has_hl, base_plan, ret_plan),
        **temporal_expressions(datetime_col),
    }
    if target_horizon is not None:
        offsets["_lead_close"] = F.lead(close, target_horizon).over(w)
        fwd = (F.col("_lead_close") - close) / close
        if target_type == "classification":
            outputs["target"] = (fwd > 0).cast("tinyint")
        elif target_type == "regression":
            outputs["target"] = fwd
        else:
            raise ValueError(f"Unsupported target type: {target_type}")
    step = base_plan.materialize(df.withColumns(offsets))
    step = ret_plan.materialize(step)
    out = step.withColumns(outputs).drop(
        *base_plan.temp_columns,
        *ret_plan.temp_columns,
        *[c for c in offsets if c.startswith("_")],
    )
    if ewm_impl == "native":
        from marketdatapipeline_spark.features.ewm import drop_block_columns

        out = drop_block_columns(out)
    if target_horizon is not None:
        out = out.drop("_lead_close").filter(F.col("target").isNotNull())
    return out
