"""Dataset preparation (reference src/ml/training.py:17-69).

The reference projects features, drops any-null rows, exports numpy
and splits chronologically with ``train_test_split(shuffle=False)``.
Here the split is a distributed ``row_number`` cut — no driver
collect — and numpy export is an explicit, optional last step.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Columns the reference never treats as features
#: (reference src/ml/training.py:39-41).
NON_FEATURE_COLUMNS = ("target", "datetime", "open", "high", "low", "close", "volume")


def feature_columns(
    df: DataFrame,
    target_col: str = "target",
    exclude: tuple[str, ...] = NON_FEATURE_COLUMNS,
) -> list[str]:
    """Exclusion-based feature selection (P13)."""
    drop = set(exclude) | {target_col, "symbol"}
    return [c for c in df.columns if c not in drop]


#: Above this row count the "auto" split method switches from the
#: global-window row_number cut to the distributed cut-key split.
ROWNUMBER_MAX_ROWS = 2_000_000


def chronological_split(
    df: DataFrame,
    test_size: float = 0.2,
    order_cols: tuple[str, ...] = ("datetime",),
    tie_break_cols: tuple[str, ...] | None = None,
    method: str = "auto",
) -> tuple[DataFrame, DataFrame]:
    """Chronological train/test split (M1, reference training.py:60-62:
    ``train_test_split(shuffle=False)``): exactly the first
    ``floor(n * (1 - test_size))`` rows in time order go to train.

    ``tie_break_cols`` (default: every column not in ``order_cols``, in
    frame order) makes membership at equal-timestamp boundaries
    deterministic across runs and methods.

    Methods — both produce identical membership and exact counts:

    - ``"rownumber"``: a global ``row_number`` cut. Correct and
      one-pass, but the un-partitioned window is a single-task sort —
      fine to a few million rows, the textbook scale-killer beyond.
    - ``"cutkey"`` (the 100 TB path): aggregate per-timestamp counts
      (one map-side-combined shuffle on the small distinct-key table),
      locate the boundary key with a running sum over that *tiny*
      table, then split the data by key comparison — no global sort of
      the data ever happens; only the boundary key's own rows (one
      timestamp's worth) get a per-key row_number to split residual
      ties. Two extra tiny jobs (count + 1-row collect), both
      aggregation-shaped.
    - ``"auto"``: ``rownumber`` below ``ROWNUMBER_MAX_ROWS`` (skips
      the extra jobs), ``cutkey`` at scale.

    NULL order keys: ``rownumber``'s window sort is NULLS FIRST, so
    null-keyed rows land in train (until train is full). ``cutkey``
    replicates that explicitly — struct comparisons against the
    boundary key would otherwise evaluate to NULL and silently drop
    those rows from both halves.
    """
    if method not in ("auto", "rownumber", "cutkey"):
        raise ValueError(f"unknown split method: {method}")
    if tie_break_cols is None:
        tie_break_cols = tuple(c for c in df.columns if c not in order_cols)
    order = [F.col(c) for c in order_cols]
    ties = [F.col(c) for c in tie_break_cols]

    n: int | None = None
    if method == "auto":
        # count ONCE; the cutkey branch reuses it (a second count would
        # be another full job and could disagree on a nondeterministic
        # source).
        n = df.count()
        method = "rownumber" if n <= ROWNUMBER_MAX_ROWS else "cutkey"

    if method == "rownumber":
        w = Window.orderBy(*order, *ties)
        counted = df.withColumn("_rn", F.row_number().over(w)).withColumn(
            "_total", F.count("*").over(Window.partitionBy())
        )
        cut = F.floor(F.col("_total") * (1.0 - test_size)).cast("long")
        train = counted.filter(F.col("_rn") <= cut).drop("_rn", "_total")
        test = counted.filter(F.col("_rn") > cut).drop("_rn", "_total")
        return train, test

    # Per-key counts (one map-side-combined shuffle over the tiny
    # distinct-key table). NULL-keyed groups are split off and handled
    # first — they sort before every real key (NULLS FIRST).
    null_key = None
    for c in order_cols:
        cond = F.col(c).isNull()
        null_key = cond if null_key is None else (null_key | cond)
    counts = df.groupBy(*order_cols).agg(F.count("*").alias("_cnt"))
    # r15 (guide §1.2 fewer passes): ONE shuffle-free scan aggregation
    # yields BOTH the total row count and the null-keyed row count
    # (map-side combined, key columns only). The r14 shape ran two
    # jobs: df.count() plus a filtered agg over the per-key count
    # table — at sf0.1 these split-fitting queries are job-launch-
    # bound, and at 100 TB the two probes were two scheduler round
    # trips over the same scan. (A first r15 attempt fused the two
    # into ONE agg over `counts` instead — interleaved A/B showed it
    # +10% on chronological_split_cutkey, because it forces the full
    # groupBy shuffle where the old count() was parquet-metadata-
    # backed and the old null-agg pruned to nothing via filter
    # pushdown below the groupBy; this scan-level fusion keeps both
    # cheap paths AND drops a job.)
    tot = df.agg(
        F.count(F.lit(1)).alias("_n"),
        F.count(F.when(null_key, F.lit(1))).alias("_nn"),
    ).collect()[0]
    if n is None:
        n = int(tot["_n"])
    n_null = int(tot["_nn"])
    n_train = int(math.floor(n * (1.0 - test_size)))
    if n == 0 or n_train >= n:
        return df, df.limit(0)
    if n_train <= 0:
        return df.limit(0), df
    if n_null:
        nulls, nonnull = df.filter(null_key), df.filter(~null_key)
        if n_null >= n_train:
            # degenerate: train is entirely null-keyed rows; order them
            # by tie-break like rownumber would (n_null rows only).
            wn = Window.orderBy(*order, *ties)
            nrn = nulls.withColumn("_rn", F.row_number().over(wn))
            train = nrn.filter(F.col("_rn") <= n_train).drop("_rn")
            rest = nrn.filter(F.col("_rn") > n_train).drop("_rn")
            return train, rest.unionByName(nonnull)
        head, tail = _cutkey_split(
            nonnull, counts.filter(~null_key), n_train - n_null, order, ties,
            order_cols, size_hint=n,
        )
        return nulls.unionByName(head), tail
    return _cutkey_split(df, counts, n_train, order, ties, order_cols, size_hint=n)


def _cutkey_split(
    df: DataFrame,
    counts: DataFrame,
    n_train: int,
    order: list,
    ties: list,
    order_cols: tuple[str, ...],
    size_hint: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Cut-key boundary location + key-comparison split for a frame
    with NO null order keys: find the boundary key on the tiny
    per-key count table, split the data by struct comparison, and
    row_number ONLY the boundary key's own rows to divide residual
    ties. ``n_train`` is the exact number of rows that must land in
    the first half."""
    # distributed cumulative (r10): the per-key count table scales
    # with distinct order keys — no single-task ORDER BY window
    from marketdatapipeline_spark.operators.ranking import global_row_number

    # size_hint: the caller's already-computed total row count upper-
    # bounds the distinct-key table — skips the operator's probe job
    boundary = (
        global_row_number(
            counts, *order, out_col="_gr", cumsum={"_cum": "_cnt"},
            size_hint=size_hint,
        )
        .filter(F.col("_cum") >= n_train)
        .orderBy(*order)
        .limit(1)
        .collect()[0]
    )
    residual = n_train - (boundary["_cum"] - boundary["_cnt"])  # boundary rows -> train
    key = F.struct(*order)
    # Cast each boundary literal to the column's actual type: a Python
    # datetime literal resolves as TIMESTAMP, but the column may be
    # TIMESTAMP_NTZ (parquet default) — struct comparison requires
    # identical field types on both sides. The lookup is case-folded
    # because Spark resolves column names case-insensitively by
    # default while df.schema[...] is exact-match only.
    types = {f.name.lower(): f.dataType for f in df.schema.fields}
    k_star = F.struct(
        *[F.lit(boundary[c]).cast(types[c.lower()]) for c in order_cols]
    )
    below, at, above = df.filter(key < k_star), df.filter(key == k_star), df.filter(key > k_star)
    if residual <= 0:
        return below, at.unionByName(above)
    if residual >= boundary["_cnt"]:
        return below.unionByName(at), above
    wb = Window.partitionBy(*order).orderBy(*(ties or [F.lit(1)]))
    at_rn = at.withColumn("_rn", F.row_number().over(wb))
    at_train = at_rn.filter(F.col("_rn") <= residual).drop("_rn")
    at_test = at_rn.filter(F.col("_rn") > residual).drop("_rn")
    return below.unionByName(at_train), at_test.unionByName(above)


def assign_time_segments(
    df: DataFrame,
    n_segments: int,
    order_cols: tuple[str, ...] = ("datetime",),
    tie_break_cols: tuple[str, ...] | None = None,
    segment_col: str = "segment",
) -> DataFrame:
    """Add ``segment_col``: which of ``n_segments`` equal-row-count
    time-ordered segments each row falls in (0-based; segment s holds
    global ranks r with ``floor((r-1) * k / n) == s`` — the exact
    row_number definition, so an oracle can pin every assignment).

    Distributed like ``chronological_split(method="cutkey")``: global
    rank is assembled as (cumulative count of strictly-earlier keys) +
    (row_number within the row's own key by the tie-break), so no
    global sort of the DATA ever runs — the only ordered window is
    over the per-key count table, and the per-key tie window is
    bounded by key multiplicity. One count job; NULL order keys rank
    first (NULLS FIRST), matching the split's convention."""
    if n_segments < 1:
        raise ValueError("n_segments must be >= 1")
    if tie_break_cols is None:
        tie_break_cols = tuple(c for c in df.columns if c not in order_cols)
    order = [F.col(c).asc_nulls_first() for c in order_cols]
    ties = [F.col(c) for c in tie_break_cols]
    n = df.count()
    if n == 0:
        return df.withColumn(segment_col, F.lit(0))

    counts = df.groupBy(*order_cols).agg(F.count("*").alias("_cnt"))
    # rename the key columns on the count side so the join is
    # unambiguous (self-referencing attributes through a join +
    # window otherwise trip Catalyst's resolver)
    from marketdatapipeline_spark.operators.ranking import global_row_number

    # distributed cumulative (r10): inclusive running count minus own
    # count, exact integers — no single-task ORDER BY window over the
    # per-key table
    cum = global_row_number(
        counts, *order, out_col="_gr", cumsum={"_ci": "_cnt"},
        size_hint=n,  # total rows upper-bound the distinct-key table
    ).withColumn(
        "_cum_before", (F.col("_ci") - F.col("_cnt")).cast("long")
    ).select(
        *[F.col(c).alias(f"_k_{i}") for i, c in enumerate(order_cols)],
        "_cum_before",
    )
    # join on the order key; <=> so NULL keys pair up too
    cond = None
    for i, c in enumerate(order_cols):
        eq = F.col(c).eqNullSafe(F.col(f"_k_{i}"))
        cond = eq if cond is None else (cond & eq)
    wt = Window.partitionBy(*order_cols).orderBy(*(ties or [F.lit(1)]))
    joined = df.join(cum, cond, "inner")
    rank = F.col("_cum_before") + F.row_number().over(wt)
    # integer DIV, not double /: at boundary ranks a double quotient can
    # round up to the next integer before floor and misplace one row
    seg = joined.withColumn("_rank", rank).withColumn(
        segment_col,
        F.expr(f"CAST(((_rank - 1) * {int(n_segments)}) DIV {int(n)} AS INT)"),
    )
    return seg.drop(
        "_cum_before", "_rank", *[f"_k_{i}" for i in range(len(order_cols))]
    )


def walk_forward_folds(
    df: DataFrame,
    n_folds: int,
    order_cols: tuple[str, ...] = ("datetime",),
    tie_break_cols: tuple[str, ...] | None = None,
) -> list[tuple[DataFrame, DataFrame]]:
    """Expanding-window (walk-forward) cross-validation: the frame is
    cut into ``n_folds + 1`` equal time segments; fold i (1-based)
    trains on segments [0, i) and validates on segment i — the only
    leakage-free CV scheme for serially-dependent market data (random
    K-fold trains on the future).

    Returns ``n_folds`` (train, validation) pairs sharing ONE
    segment-assignment plan — materialize the assignment (cache or
    write) before iterating if the folds run as separate jobs."""
    if n_folds < 1:
        raise ValueError("n_folds must be >= 1")
    seg = assign_time_segments(
        df, n_folds + 1, order_cols, tie_break_cols, segment_col="_seg"
    )
    folds = []
    for i in range(1, n_folds + 1):
        train = seg.filter(F.col("_seg") < i).drop("_seg")
        val = seg.filter(F.col("_seg") == i).drop("_seg")
        folds.append((train, val))
    return folds


def prepare_dataset(
    df: DataFrame,
    feature_cols: list[str] | None = None,
    target_col: str = "target",
    test_size: float = 0.2,
    datetime_col: str = "datetime",
    as_numpy: bool = False,
    random_state: int | None = 42,
    split_method: str = "auto",
):
    """Project -> drop any-null rows -> chronological split
    (reference training.py:17-69).

    Returns ``(train_df, test_df, feature_cols)`` by default. With
    ``as_numpy=True`` returns ``(X_train, X_test, y_train, y_test,
    feature_cols)`` — the reference's exact contract — by collecting
    through Arrow; only sensible when the result fits the driver.

    ``random_state`` exists for signature parity with the reference
    (training.py passes it to ``train_test_split``) but is unused:
    the split is chronological (``shuffle=False``), so no RNG is ever
    consulted — same as in the reference.
    """
    del random_state  # signature parity only; chronological split uses no RNG
    if target_col not in df.columns:
        raise ValueError(f"Target column '{target_col}' not present")
    feature_cols = feature_cols or feature_columns(df, target_col)
    missing = [c for c in feature_cols if c not in df.columns]
    if missing:
        raise ValueError(f"Feature column(s) {missing} not present")

    projected = df.select(datetime_col, *feature_cols, target_col)
    clean = projected.na.drop("any", subset=[*feature_cols, target_col])
    train, test = chronological_split(
        clean, test_size, order_cols=(datetime_col,), method=split_method
    )
    if not as_numpy:
        return train, test, feature_cols

    train_pdf = train.toPandas()
    test_pdf = test.toPandas()
    return (
        train_pdf[feature_cols].to_numpy("float64"),
        test_pdf[feature_cols].to_numpy("float64"),
        train_pdf[target_col].to_numpy("float64"),
        test_pdf[target_col].to_numpy("float64"),
        feature_cols,
    )
