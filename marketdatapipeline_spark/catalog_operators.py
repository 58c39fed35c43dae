"""Catalog entries for the relational operator extensions
(as-of join, sessionization, multi-granularity rollup, quality
filtering, quantiles) over the ``events`` and derived ``bars`` tables.

Every oracle replays the operator in ANSI SQL — DuckDB's native
``ASOF JOIN`` checks the distributed union-and-carry implementation,
windowed prefix sums check sessionization, and rank-window first/last
check the deterministic rollup aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from marketdatapipeline_spark.caching import scoped_persist
from marketdatapipeline_spark.catalog import (
    _EWM_SQL,
    _ORD_SQL,
    _bars_sql,
    _r6,
    register,
)
from marketdatapipeline_spark.operators import asof_join, rollup_bars
from marketdatapipeline_spark.operators.sessions import session_stats
from marketdatapipeline_spark.sources.tables import bars_from_events, load_table
from marketdatapipeline_spark.textops.dedup import MERSENNE_P, hash_coeffs


@register(
    "asof_join_trades_quotes",
    """
    WITH trades AS (
        SELECT event_id, user_id % 10 AS symbol, ts, value + 100.0 AS price
        FROM events WHERE event_id % 2 = 1
    ),
    quotes AS (
        SELECT user_id % 10 AS symbol, ts,
               arg_max(value + 99.5, event_id) AS quote_price
        FROM events WHERE event_id % 2 = 0
        GROUP BY symbol, ts
    )
    SELECT t.event_id, t.symbol, t.ts, t.price, q.quote_price,
           t.price - q.quote_price AS spread
    FROM trades t
    ASOF LEFT JOIN quotes q
      ON t.symbol = q.symbol AND q.ts <= t.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: odd events play trades, even events play
    quotes (deduplicated per (symbol, ts) by max event_id — as-of
    needs a unique right time series); each trade picks up the latest
    quote at-or-before it per symbol. The Spark side is the
    union-and-carry window composition (operators/asof.py — one
    shuffle, no range explosion); the oracle is DuckDB's NATIVE
    ASOF LEFT JOIN, so the semantics check is engine-grade."""
    ev = load_table(spark, sf_dir, "events")
    sym = (F.col("user_id") % 10).alias("symbol")
    trades = ev.filter(F.col("event_id") % 2 == 1).select(
        "event_id", sym, "ts", (F.col("value") + 100.0).alias("price")
    )
    quotes = (
        ev.filter(F.col("event_id") % 2 == 0)
        .select(sym, "ts", "value", "event_id")
        .groupBy("symbol", "ts")
        .agg(
            F.max_by(F.col("value") + 99.5, F.col("event_id")).alias("quote_price")
        )
    )
    out = asof_join(trades, quotes, on="ts", by=("symbol",))
    return out.select(
        "event_id", "symbol", "ts", "price", "quote_price",
        (F.col("price") - F.col("quote_price")).alias("spread"),
    )


def session_numbering_sql(
    gap_sql: str, flagged: str = "flagged", numbered: str = "numbered"
) -> str:
    """The session-numbering CTE chain, parameterized by gap and CTE
    names — ONE definition of the boundary convention (session_window
    semantics: STRICTLY beyond last + gap starts a new session, events
    exactly gap apart merge; ties broken by event_id) feeds every
    session oracle in the catalog (here and catalog_corpus.py)."""
    return f"""
    {flagged} AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts > lag(ts) OVER w + {gap_sql}
                    THEN 1 ELSE 0 END AS st
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    {numbered} AS (
        SELECT user_id, ts,
               sum(st) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
        FROM {flagged}
    )
"""


#: the main catalog's 30-minute instantiation
_SESSIONS_CTE = session_numbering_sql("INTERVAL 30 MINUTE")


@register(
    "sessionize_events",
    f"""
    WITH {_SESSIONS_CTE}
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           min(ts) AS session_start, max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS duration_us
    FROM numbered GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity closes a
    session) summarized per (user, session). lag + running-sum share
    one window exchange (operators/sessions.py)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    return session_stats(
        ev, F.expr("INTERVAL 30 MINUTES"), tie_break=("event_id",)
    )


@register(
    "streaming_sessions_batch_parity",
    f"""
    WITH {_SESSIONS_CTE}
    SELECT user_id,
           min(ts) AS window_start,
           max(ts) + INTERVAL 30 MINUTE AS window_end,
           min(ts) AS session_start,
           max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM numbered GROUP BY user_id, session_id
    """,
)
def q_streaming_sessions_batch_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver row for the STREAMING sessionization semantics: the
    streaming path (streaming/sessions.py sessionize_stream) and this
    batch twin share the identical ``F.session_window`` aggregation —
    tests/test_streaming.py pins stream==batch on the same input, and
    this entry pins batch==oracle, so the engine-managed session
    boundaries get a hard oracle row by transitivity. The oracle
    replays session_window's convention in SQL: a session's window
    extends to last-event + gap (where the next event could still have
    joined it)."""
    from marketdatapipeline_spark.streaming.sessions import sessionize_batch

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    return sessionize_batch(ev, gap="30 minutes")


@register("streaming_indicators_batch_parity", _EWM_SQL)
def q_streaming_indicators_batch_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Driver row for the STATEFUL streaming RSI/MACD operator
    (streaming/stateful.py online_indicators): the batch twin runs
    the IDENTICAL state-handler recurrence (_scan_closes — Wilder
    gains/losses seeded at the first delta, adjust=True EMAs in
    numerator/denominator form) from fresh state over each symbol's
    history. tests/test_streaming.py pins stream == batch-twin on
    the same feed (including state carry across micro-batches), and
    this entry pins batch-twin == the per-symbol recursive-CTE
    oracle — so the applyInPandasWithState handler's arithmetic is
    oracle-checked by transitivity, same pattern as
    streaming_sessions_batch_parity."""
    from marketdatapipeline_spark.streaming.stateful import (
        online_indicators_batch,
    )

    bars = bars_from_events(spark, sf_dir).select(
        "symbol", "datetime", "bar_id", "close"
    )
    out = online_indicators_batch(bars)
    return out.select(
        "symbol",
        "bar_id",
        _r6(F.col("rsi")).alias("rsi"),
        _r6(F.col("macd")).alias("macd"),
        _r6(F.col("macd_signal")).alias("macd_signal"),
        _r6(F.col("macd_histogram")).alias("macd_histogram"),
    )


@register(
    "range_join_events_sessions",
    f"""
    WITH {_SESSIONS_CTE},
    sessions AS (
        SELECT user_id, min(ts) AS session_start, max(ts) AS session_end
        FROM numbered GROUP BY user_id, session_id
    )
    SELECT e.event_id, e.user_id, e.ts, s.session_start, s.session_end
    FROM events e
    JOIN sessions s
      ON e.user_id = s.user_id
     AND e.ts BETWEEN s.session_start AND s.session_end
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join: every event joined to the session
    interval(s) containing it. Spark gets no native range join — the
    operator bins intervals and points onto a shared grid so the match
    becomes a plain equi-join on (user, bin) plus an exact BETWEEN
    filter (operators/range_join.py); the oracle is the naive
    inequality join. Sessions are disjoint per user, so the result is
    exactly one row per event — the join must neither drop nor
    duplicate."""
    from marketdatapipeline_spark.operators import point_in_interval_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    sessions = session_stats(
        ev, F.expr("INTERVAL 30 MINUTES"), tie_break=("event_id",)
    ).select("user_id", "session_start", "session_end")
    out = point_in_interval_join(
        ev,
        sessions,
        point_col="ts",
        start_col="session_start",
        end_col="session_end",
        by=("user_id",),
        bin_width="1 hour",
    )
    return out.select("event_id", "user_id", "ts", "session_start", "session_end")


def _rollup_grain_sql(grain: str) -> str:
    return f"""
    SELECT symbol, bucket,
           max(CASE WHEN rn_a = 1 THEN open END) AS open,
           max(high) AS high, min(low) AS low,
           max(CASE WHEN rn_d = 1 THEN close END) AS close,
           sum(volume) AS volume,
           CAST(count(*) AS BIGINT) AS n_bars,
           '{grain}' AS grain
    FROM (
        SELECT symbol, date_trunc('{grain}', datetime) AS bucket,
               open, high, low, close, volume,
               row_number() OVER (
                   PARTITION BY symbol, date_trunc('{grain}', datetime)
                   ORDER BY {_ORD_SQL}) AS rn_a,
               row_number() OVER (
                   PARTITION BY symbol, date_trunc('{grain}', datetime)
                   ORDER BY datetime DESC, bar_id DESC) AS rn_d
        FROM bars
    ) GROUP BY symbol, bucket
    """


_ROLLUP_SQL = _bars_sql(
    _rollup_grain_sql("hour") + " UNION ALL " + _rollup_grain_sql("day")
)


@register("rollup_bars_multi", _ROLLUP_SQL)
def q_rollup_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity OHLCV rollup (hour + day).
    open/close are min_by/max_by on the (datetime, bar_id) struct —
    deterministic under parallel aggregation, checked against the
    oracle's rank-window first/last. Volume is integer-valued, so the
    sum is order-independent exact."""
    bars = bars_from_events(spark, sf_dir)
    return rollup_bars(bars, grains=("hour", "day"))


@register(
    "cube_event_counts",
    """
    SELECT event_type, user_id % 10 AS user_bucket,
           CAST(GROUPING(event_type, user_id % 10) AS INT) AS gid,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor_value,
           min(value) AS min_value, max(value) AS max_value
    FROM events
    GROUP BY CUBE (event_type, user_id % 10)
    """,
)
def q_cube_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional rollup in ONE aggregation pass:
    CUBE(event_type, user_bucket) emits per-cell, per-dimension, and
    grand totals together, with grouping_id disambiguating rolled-up
    nulls. At scale this is one shuffle (partial aggregation covers
    all grouping sets map-side) instead of four separate groupBys +
    union. Aggregates are exact: counts, integer-floored sums, and
    min/max — no float-summation association to round away."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 10).alias("user_bucket"), "value"
    )
    return ev.cube("event_type", "user_bucket").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count("*").alias("n_events"),
        F.sum(F.floor(F.col("value")).cast("bigint")).alias("sum_floor_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@register(
    "set_ops_customer_segments",
    """
    WITH even_k AS (
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderkey % 2 = 0
    ),
    odd_k AS (
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderkey % 2 = 1
    )
    SELECT 'both' AS kind, o_custkey FROM (
        SELECT o_custkey FROM even_k INTERSECT SELECT o_custkey FROM odd_k)
    UNION ALL
    SELECT 'only_even', o_custkey FROM (
        SELECT o_custkey FROM even_k EXCEPT SELECT o_custkey FROM odd_k)
    UNION ALL
    SELECT 'only_odd', o_custkey FROM (
        SELECT o_custkey FROM odd_k EXCEPT SELECT o_custkey FROM even_k)
    """,
)
def q_set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set algebra: customers present in both
    deterministic order segments vs only one. Spark plans these as
    left-semi/anti joins over the distinct inputs — same shuffle shape
    as the semi_anti_join query — checked against DuckDB's native set
    operators.

    r15 negative result (guide §7.2/§1.1): each key set feeds THREE
    set operations and differing expression ids defeat ReusedExchange,
    so the plan holds six orders scans and six distinct exchanges.
    Scoped-persisting the two distinct-key tables (scans 6 -> 2) was
    built and interleaved-A/B'd at sf0.1: 0.543 -> 0.729 s median —
    the cache-materialization barrier costs more than the cheap
    parallel scans it saves, at this tier and at any tier where
    orders fits page cache. REVERTED; do not retry without a
    cluster-scale measurement."""
    orders = load_table(spark, sf_dir, "orders")
    even_k = (
        orders.filter(F.col("o_orderkey") % 2 == 0).select("o_custkey").distinct()
    )
    odd_k = (
        orders.filter(F.col("o_orderkey") % 2 == 1).select("o_custkey").distinct()
    )
    return (
        even_k.intersect(odd_k).select(F.lit("both").alias("kind"), "o_custkey")
        .unionByName(
            even_k.exceptAll(odd_k).select(
                F.lit("only_even").alias("kind"), "o_custkey"
            )
        )
        .unionByName(
            odd_k.exceptAll(even_k).select(
                F.lit("only_odd").alias("kind"), "o_custkey"
            )
        )
    )


#: Pivot output columns are pinned explicitly: letting Spark discover
#: them adds an extra distinct job AND makes the schema data-dependent
#: (schema drift when a type vanishes from a partition of the data).
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "pivot_event_type_counts",
    f"""
    SELECT user_id % 10 AS user_bucket,
           {', '.join(
               f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
               f" AS n_{t}"
               for t in _EVENT_TYPES
           )},
           CAST(count(*) AS BIGINT) AS n_total
    FROM events GROUP BY user_id % 10
    """,
)
def q_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): per-bucket event counts, one column per
    event type. One hash aggregation — Spark's pivot compiles to the
    same conditional-aggregate plan the oracle spells out, no extra
    shuffle vs a plain groupBy."""
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 10).alias("user_bucket"), "event_type"
    )
    wide = (
        ev.groupBy("user_bucket")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    total = ev.groupBy("user_bucket").agg(F.count("*").alias("n_total"))
    out = wide.join(total, "user_bucket")
    return out.select(
        "user_bucket",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}")
            for t in _EVENT_TYPES
        ],
        "n_total",
    )


@register(
    "unpivot_ohlc",
    _bars_sql(
        """
        SELECT bar_id, symbol, field, value FROM (
            SELECT bar_id, symbol, 'open' AS field, open AS value FROM bars
            UNION ALL SELECT bar_id, symbol, 'high', high FROM bars
            UNION ALL SELECT bar_id, symbol, 'low', low FROM bars
            UNION ALL SELECT bar_id, symbol, 'close', close FROM bars
        ) WHERE bar_id < 1000
        """
    ),
)
def q_unpivot_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide -> long): OHLC columns to (field, value)
    rows via the native unpivot operator — a narrow 4x row expansion
    inside the scan stage, not a union of four scans (the oracle's
    UNION ALL form is the portable equivalent, semantically identical)."""
    bars = bars_from_events(spark, sf_dir).filter(F.col("bar_id") < 1000)
    return bars.unpivot(
        ids=["bar_id", "symbol"],
        values=["open", "high", "low", "close"],
        variableColumnName="field",
        valueColumnName="value",
    )


@register(
    "rank_bars_by_volume",
    _bars_sql(
        """
        SELECT symbol, bar_id,
               CAST(rank() OVER w AS INT) AS rnk,
               CAST(dense_rank() OVER w AS INT) AS drnk,
               CAST(ntile(4) OVER w AS INT) AS quartile,
               CAST(row_number() OVER w AS INT) AS rn
        FROM bars
        WHERE symbol IN ('0', '1')
        WINDOW w AS (PARTITION BY symbol ORDER BY volume DESC, bar_id)
        """
    ),
)
def q_rank_bars_by_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL ranking-function family (rank / dense_rank / ntile /
    row_number) over a per-symbol volume ordering with a
    deterministic tie-break. One window exchange serves all four
    functions. Volume repeats by construction (event_id % 1000), so
    rank-vs-dense_rank gap semantics are actually exercised."""
    bars = bars_from_events(spark, sf_dir).filter(F.col("symbol").isin("0", "1"))
    w = Window.partitionBy("symbol").orderBy(F.desc("volume"), "bar_id")
    return bars.select(
        "symbol",
        "bar_id",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.row_number().over(w).cast("int").alias("rn"),
    )


#: Quality-filter thresholds (Gopher-style bounds, simplified). All
#: comparisons are on ratios of exact integer counts, so keep/drop
#: decisions are bit-identical across engines.
_QF = {
    "min_tokens": 30,
    "max_tokens": 50_000,
    "max_punct_ratio": 0.2,
    "min_stopword_ratio": 0.02,
    "min_mwl": 2.0,
    "max_mwl": 12.0,
}

_QF_SQL = rf"""
    WITH sig AS (
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
               (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))
                   / CAST(length(text) AS DOUBLE) AS punct_ratio,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                   w -> list_contains(['the','and','of','to','a','in','is','it','that','for'], lower(w))))
                   / CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE)
                   AS stopword_ratio,
               length(regexp_replace(text, '\s+', '', 'g'))
                   / CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE)
                   AS mean_word_len
        FROM documents
    )
    SELECT doc_id,
           CAST(n_tokens AS INT) AS n_tokens,
           n_tokens >= {_QF["min_tokens"]} AND n_tokens <= {_QF["max_tokens"]}
               AS ok_length,
           punct_ratio <= {_QF["max_punct_ratio"]} AS ok_punct,
           stopword_ratio >= {_QF["min_stopword_ratio"]} AS ok_stopwords,
           mean_word_len >= {_QF["min_mwl"]} AND mean_word_len <= {_QF["max_mwl"]}
               AS ok_word_len,
           (n_tokens >= {_QF["min_tokens"]} AND n_tokens <= {_QF["max_tokens"]})
               AND punct_ratio <= {_QF["max_punct_ratio"]}
               AND stopword_ratio >= {_QF["min_stopword_ratio"]}
               AND (mean_word_len >= {_QF["min_mwl"]} AND mean_word_len <= {_QF["max_mwl"]})
               AS keep
    FROM sig
"""


@register("documents_quality_filter", _QF_SQL)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite pre-training quality filter: length, punctuation,
    stopword-density, and word-length gates composed into a keep
    decision, with per-rule flags for filter-rate observability.
    Pure scan-side expressions over the quality signals."""
    from marketdatapipeline_spark.catalog_pipeline import _docs
    from marketdatapipeline_spark.textops import add_quality_signals, add_token_count

    sig = add_quality_signals(add_token_count(_docs(spark, sf_dir)))
    nt = F.col("n_tokens")
    ok_length = (nt >= _QF["min_tokens"]) & (nt <= _QF["max_tokens"])
    ok_punct = F.col("punct_ratio") <= _QF["max_punct_ratio"]
    ok_stop = F.col("stopword_ratio") >= _QF["min_stopword_ratio"]
    ok_mwl = (F.col("mean_word_len") >= _QF["min_mwl"]) & (
        F.col("mean_word_len") <= _QF["max_mwl"]
    )
    return sig.select(
        "doc_id",
        nt.cast("int").alias("n_tokens"),
        ok_length.alias("ok_length"),
        ok_punct.alias("ok_punct"),
        ok_stop.alias("ok_stopwords"),
        ok_mwl.alias("ok_word_len"),
        (ok_length & ok_punct & ok_stop & ok_mwl).alias("keep"),
    )


def _curation_sql(num_hashes: int = 16, bands: int = 4, tau: float = 0.5) -> str:
    """Full curation pipeline as one SQL statement: exact dedup ->
    quality gate -> MinHash-LSH near-dup removal -> per-doc verdict."""
    h = "CAST(CAST(('0x' || substr(md5(shingle), 1, 8)) AS UBIGINT) AS BIGINT)"
    rows = num_hashes // bands
    mins = ", ".join(
        f"min(({a} * h + {b}) % {MERSENNE_P}) AS mh_{i}"
        for i, (a, b) in enumerate(hash_coeffs(num_hashes))
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, '{b}_' || "
        + " || '_' || ".join(
            f"CAST(mh_{i} AS VARCHAR)" for i in range(b * rows, (b + 1) * rows)
        )
        + " AS band_key FROM sigs"
        for b in range(bands)
    )
    qf = (
        f"n_tokens >= {_QF['min_tokens']} AND n_tokens <= {_QF['max_tokens']} "
        f"AND punct_ratio <= {_QF['max_punct_ratio']} "
        f"AND stopword_ratio >= {_QF['min_stopword_ratio']} "
        f"AND mean_word_len >= {_QF['min_mwl']} "
        f"AND mean_word_len <= {_QF['max_mwl']}"
    )
    return rf"""
    WITH ex AS (
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ),
    sig AS (
        SELECT d.doc_id, d.text,
               len(regexp_split_to_array(trim(d.text), '\s+')) AS n_tokens,
               (length(d.text) - length(regexp_replace(d.text, '[^\w\s]', '', 'g')))
                   / CAST(length(d.text) AS DOUBLE) AS punct_ratio,
               len(list_filter(regexp_split_to_array(trim(d.text), '\s+'),
                   w -> list_contains(['the','and','of','to','a','in','is','it','that','for'], lower(w))))
                   / CAST(len(regexp_split_to_array(trim(d.text), '\s+')) AS DOUBLE)
                   AS stopword_ratio,
               length(regexp_replace(d.text, '\s+', '', 'g'))
                   / CAST(len(regexp_split_to_array(trim(d.text), '\s+')) AS DOUBLE)
                   AS mean_word_len
        FROM documents d JOIN ex ON ex.doc_id = d.doc_id
    ),
    q AS (SELECT doc_id, text FROM sig WHERE {qf}),
    tokens AS (
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, greatest(len(words) - 1, 1)),
                       i -> words[i] || ' ' || words[i + 1] || ' ' || words[i + 2]
                   )) AS shingle
            FROM (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
                FROM q
            )
        )
    ),
    th AS (SELECT DISTINCT doc_id, {h} AS h FROM tokens),
    sigs AS (SELECT doc_id, {mins} FROM th GROUP BY doc_id),
    bands AS ({band_selects}),
    cands AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM th GROUP BY doc_id),
    near AS (
        SELECT DISTINCT id_b FROM (
            SELECT t1.doc_id AS id_a, t2.doc_id AS id_b, count(*) AS inter
            FROM th t1
            JOIN th t2 ON t1.h = t2.h AND t1.doc_id < t2.doc_id
            JOIN cands c ON c.id_a = t1.doc_id AND c.id_b = t2.doc_id
            GROUP BY t1.doc_id, t2.doc_id
        ) i
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE inter / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) >= {tau}
    )
    SELECT d.doc_id,
           CASE WHEN e.doc_id IS NULL THEN 'exact_dup'
                WHEN qq.doc_id IS NULL THEN 'quality'
                WHEN nd.id_b IS NOT NULL THEN 'near_dup'
                ELSE 'kept' END AS reason,
           (e.doc_id IS NOT NULL AND qq.doc_id IS NOT NULL AND nd.id_b IS NULL)
               AS kept
    FROM documents d
    LEFT JOIN ex e ON e.doc_id = d.doc_id
    LEFT JOIN q qq ON qq.doc_id = d.doc_id
    LEFT JOIN near nd ON nd.id_b = d.doc_id
    """


@register("documents_curation", _curation_sql())
def q_documents_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation — the pipeline a pre-training data
    run actually executes, composed from the audited stages: exact
    dedup (keep-min-id per md5), quality gate (length/punct/stopword/
    word-length bounds), MinHash-LSH near-dup removal on 3-gram
    shingles (drop the larger id of each verified pair >= tau), and a
    per-document verdict with the eliminating stage. Stages chain —
    each operates only on the previous stage's survivors — and every
    stage stays a shuffle-bounded composition (hash agg, scan-side
    expressions, band-key equi-join)."""
    from marketdatapipeline_spark.catalog_pipeline import _docs
    from marketdatapipeline_spark.textops import add_quality_signals, add_token_count
    from marketdatapipeline_spark.textops.dedup import minhash_near_duplicates

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    # Exact-dedup and quality verdicts as FLAGS computed in one scan:
    # the quality signals (the regex-heavy part) and md5 are projected
    # SCAN-SIDE, so the keep-min-id window shuffles only
    # (doc_id, md5, flag) — never document text. The resulting flags
    # frame is a few dozen bytes per row; it feeds two consumers (the
    # near-dup branch and the final verdict join), so it is persisted —
    # without it Spark would recompute the window exchange and the full
    # signal scan per consumer (the r4 5.2 s regression). The near-dup
    # branch re-reads text by joining survivors back to the parquet
    # scan: at 100 TB a second columnar scan of two columns is far
    # cheaper than caching (or shuffling) the corpus text.
    #
    # Cold-run note (r6 measurement): the first materialization pays
    # ~10 s of Janino codegen (~6 s for the fused MinHash stage, ~3 s
    # for the signal scan) at ANY data size; Spark's generated-code
    # cache brings an identical rebuild to ~1.2 s and warm runs are
    # 1.1-1.7 s. On a long-lived cluster the compile happens once per
    # JVM — this is startup cost, not a scale term, so the plan is
    # deliberately left unfused-no-further.
    sig = add_quality_signals(add_token_count(docs))
    nt = F.col("n_tokens")
    q_ok = (
        (nt >= _QF["min_tokens"]) & (nt <= _QF["max_tokens"])
        & (F.col("punct_ratio") <= _QF["max_punct_ratio"])
        & (F.col("stopword_ratio") >= _QF["min_stopword_ratio"])
        & (F.col("mean_word_len") >= _QF["min_mwl"])
        & (F.col("mean_word_len") <= _QF["max_mwl"])
    )
    narrow = sig.select(
        "doc_id", F.md5(F.col("text")).alias("_h"), q_ok.alias("_qok")
    )
    md5w = Window.partitionBy("_h")
    ex = F.min("doc_id").over(md5w) == F.col("doc_id")
    flags = scoped_persist(
        narrow.select("doc_id", ex.alias("_ex"), "_qok")
        .select("doc_id", "_ex", (F.col("_ex") & F.col("_qok")).alias("_q"))
    )
    q = docs.join(flags.filter(F.col("_q")).select("doc_id"), "doc_id").select(
        "doc_id", "text"
    )
    pairs = minhash_near_duplicates(q, threshold=0.5, num_hashes=16, bands=4, n=3)
    drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    out = flags.join(
        drop.withColumn("_nd", F.lit(1)), "doc_id", "left"
    )
    reason = (
        F.when(~F.col("_ex"), "exact_dup")
        .when(~F.col("_q"), "quality")
        .when(F.col("_nd").isNotNull(), "near_dup")
        .otherwise("kept")
    )
    return out.select(
        "doc_id", reason.alias("reason"), (reason == "kept").alias("kept")
    )


@register(
    "stats_aggregates_by_symbol",
    _bars_sql(
        """
        SELECT symbol,
               round(corr(close, volume), 6) + 0.0 AS corr_close_vol,
               round(covar_samp(close, volume), 6) + 0.0 AS covar_close_vol,
               round(stddev_samp(close), 6) + 0.0 AS std_close,
               round(regr_slope(close, volume), 6) + 0.0 AS beta_close_vol,
               round(regr_intercept(close, volume), 6) + 0.0 AS alpha_close_vol,
               round(quantile_cont(volume, 0.25), 6) + 0.0 AS p25_volume,
               round(quantile_cont(volume, 0.5), 6) + 0.0 AS p50_volume,
               round(quantile_cont(volume, 0.9), 6) + 0.0 AS p90_volume,
               CAST(count(*) AS BIGINT) AS n
        FROM bars GROUP BY symbol
        """
    ),
)
def q_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family: Pearson correlation, sample
    covariance, sample stddev, the linear-regression aggregates
    (slope/intercept), and exact grouped percentiles (linear
    interpolation at rank p*(n-1), the numpy/DuckDB quantile_cont
    definition, which Spark's ``percentile`` shares) per symbol — one
    hash aggregation; the moment family keeps map-side co-moment
    partials, the percentiles are a per-group sort of one column
    (``approx_percentile_volume`` is the sketch knob at scale).
    Rounded: accumulation/interpolation order differs across engines.
    Subsumes the former ``quantile_volume_by_symbol`` entry."""
    bars = bars_from_events(spark, sf_dir).select("symbol", "close", "volume")
    g = bars.groupBy("symbol").agg(
        F.corr("close", "volume").alias("_c"),
        F.covar_samp("close", "volume").alias("_cv"),
        F.stddev_samp("close").alias("_s"),
        F.regr_slope("close", "volume").alias("_b"),
        F.regr_intercept("close", "volume").alias("_a"),
        F.percentile("volume", 0.25).alias("_p25"),
        F.percentile("volume", 0.5).alias("_p50"),
        F.percentile("volume", 0.9).alias("_p90"),
        F.count("*").alias("n"),
    )
    return g.select(
        "symbol",
        _r6(F.col("_c")).alias("corr_close_vol"),
        _r6(F.col("_cv")).alias("covar_close_vol"),
        _r6(F.col("_s")).alias("std_close"),
        _r6(F.col("_b")).alias("beta_close_vol"),
        _r6(F.col("_a")).alias("alpha_close_vol"),
        _r6(F.col("_p25")).alias("p25_volume"),
        _r6(F.col("_p50")).alias("p50_volume"),
        _r6(F.col("_p90")).alias("p90_volume"),
        "n",
    )


#: Shared bound constants + formula for the approx-sketch
#: certification rows, in ONE definition used by both catalog queries
#: and the pytest that exercises the formula on known-off sketch
#: values (tests/test_entry.py::test_approx_bound_formula) — so a bug
#: in the multiplier or abs() placement cannot self-certify green.
APPROX_CD_RSD = 0.05  # requested HLL++ relative standard deviation
APPROX_CD_BOUND = 3.0 * APPROX_CD_RSD  # 3-sigma contract on the sketch
APPROX_PCT_ACCURACY = 10000  # GK rank-error knob (1/accuracy)
APPROX_PCT_REL_BOUND = 0.05  # value-space bound (see query docstring)


def approx_within_rel_bound(approx_col, exact_col, bound: float):
    """|approx - exact| <= bound * |exact| as a Column expression."""
    return F.abs(approx_col - exact_col) <= F.lit(bound) * F.abs(exact_col)


@register(
    "approx_count_distinct_users",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events,
           TRUE AS approx_within_bounds
    FROM events GROUP BY event_type
    """,
)
def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++, rsd=0.05) — the one-pass,
    fixed-memory cardinality sketch that replaces the two-stage exact
    count(DISTINCT) expansion at 100 TB. A sketch value is not
    oracle-comparable bit-for-bit, so the row certifies it instead:
    the Spark side computes BOTH the sketch and the exact count in the
    same aggregation and emits ``approx_within_bounds`` = relative
    error <= 3x the requested rsd (0.15); the oracle emits the exact
    count and literal TRUE. HLL++ is deterministic for a given value
    set, so a green hash here is a hard check that the sketch landed
    inside its contract on this data."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).alias("n_users"),
        F.approx_count_distinct("user_id", rsd=APPROX_CD_RSD).alias("_approx"),
        F.count("*").alias("n_events"),
    )
    return g.select(
        "event_type",
        "n_users",
        "n_events",
        approx_within_rel_bound(
            F.col("_approx"), F.col("n_users"), APPROX_CD_BOUND
        ).alias("approx_within_bounds"),
    )


@register(
    "approx_percentile_volume",
    _bars_sql(
        """
        SELECT symbol,
               round(quantile_cont(volume, 0.5), 6) + 0.0 AS p50_volume,
               TRUE AS approx_within_bounds
        FROM bars GROUP BY symbol
        """
    ),
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch, accuracy=10000 ->
    rank error <= 1/10000) — the knob that replaces the per-group
    column sort of the exact percentile when that sort dominates at
    scale. Same certification pattern as approx_count_distinct_users:
    Spark computes sketch + exact in one aggregation and emits
    ``approx_within_bounds`` = sketch within 5% relative value error
    of the exact interpolated median. The rank bound is 1/10000, but
    the VALUE gap it translates to depends on local data density (GK
    returns a real data point, quantile_cont interpolates between
    two): measured max relative gap is 2.8% at ~100 rows/group
    (sf0.001) and 0.1% at ~10k rows/group (sf0.1), so 5% holds across
    the test tiers with margin. The sketch is deterministic, so
    green == the sketch honored its bound on this data."""
    bars = bars_from_events(spark, sf_dir).select("symbol", "volume")
    g = bars.groupBy("symbol").agg(
        F.percentile("volume", 0.5).alias("_exact"),
        F.percentile_approx("volume", 0.5, APPROX_PCT_ACCURACY).alias("_approx"),
    )
    return g.select(
        "symbol",
        _r6(F.col("_exact")).alias("p50_volume"),
        approx_within_rel_bound(
            F.col("_approx"), F.col("_exact"), APPROX_PCT_REL_BOUND
        ).alias("approx_within_bounds"),
    )
