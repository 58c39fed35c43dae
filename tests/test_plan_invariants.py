"""Mechanical scale invariant (r11, VERDICT item 2): NO catalog query
may plan a single-task global window over a data-scaled frame.

A global ordered window (``Window.partitionBy(lit(1)).orderBy(...)``
or bare ``Window.orderBy(...)``) funnels its whole input through ONE
task — correct at catalog scale, a wall at 100 TB. The engine's
size-routed operators (operators/ranking.py global_row_number,
operators/pairs.py) deliberately CHOOSE that plan below a threshold,
so this scan forces every routing threshold to 0 first: whatever
global window remains in an optimized plan is either (a) an audited,
by-contract-tiny aggregate frame listed in ``ALLOWED_TINY`` below, or
(b) a regression — exactly how r10's ``corpus_vocab_growth`` slipped
through SURVEY's "remaining lit(1) windows are all tiny" claim.

Detection is on the OPTIMIZED LOGICAL plan (no execution): Catalyst
folds a ``lit(1)`` partition away entirely, so both forms print as a
``Window`` node whose partition-spec bracket group is absent — i.e.
exactly two top-level ``[...]`` groups where the second carries sort
directions. Partition-only windows print two groups WITHOUT sort
directions; keyed windows print three.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"

#: queries whose optimized plan legitimately keeps a global ordered
#: window — every input frame here is an aggregate of BOUNDED
#: cardinality (the bound, and why it does not grow with data volume):
ALLOWED_TINY = {
    # cumulative shares over fixed histogram buckets (≤ ~40 rows)
    "corpus_length_histogram": "fixed log-scale length buckets",
    "corpus_df_histogram": "fixed doc-frequency buckets",
    "dedup_cluster_size_histogram": "fixed cluster-size buckets",
    "embeddings_distance_histogram": "fixed distance buckets",
    # cumulative over a fixed calendar/decile grain
    "ml_decile_lift": "10 score deciles",
    "bars_advance_decline": "24 hours",
    "tpch_monthly_revenue_trend": "bounded month count",
    # rank/min over a bounded category dimension
    "corpus_domain_mix": "bounded domain count (source dimension)",
    "corpus_lang_source_mix": "lang x source cells",
    "tpch_q19_bracketed_revenue": "part brand dimension",
    "events_usage_independence": "user-tier x event-type cells",
    # top-k cut happens BEFORE the window (TakeOrderedAndProject):
    # the window ranks only the k=1000 survivors
    "corpus_zipf_fit": "top-1000 terms post TakeOrderedAndProject",
}

#: the r11 conversions this pin exists to protect: these must never
#: re-grow a global window even though they are NOT tiny
CONVERTED = {
    "corpus_vocab_growth",
    "bars_pair_spread_zscore",
    "bars_rolling_pair_correlation",
    "ml_roc_auc",
    "tpch_customer_ltv",
}


def _groups(s: str) -> list[str]:
    """Top-level ``[...]`` groups of a plan line."""
    out: list[str] = []
    depth, cur = 0, ""
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = ""
            else:
                cur += ch
        elif ch == "]":
            depth -= 1
            if depth == 0:
                out.append(cur)
            else:
                cur += ch
        elif depth >= 1:
            cur += ch
    return out


def global_ordered_window_lines(plan: str) -> list[str]:
    """Window nodes with no partition columns but an ORDER — the
    single-task global-sort shape."""
    hits = []
    for ln in plan.splitlines():
        s = ln.strip(" +-:*")
        if not s.startswith("Window "):
            continue
        g = _groups(s)
        if len(g) >= 3 and g[1].strip():
            continue  # keyed window
        if len(g) == 2 and not (" ASC" in g[1] or " DESC" in g[1]):
            continue  # partition-only window (no global sort)
        hits.append(s[:160])
    return hits


def test_no_global_window_on_data_scaled_frames(spark):
    """Force every size-routing threshold to 0, build every catalog
    query's optimized plan, and require every surviving global
    ordered window to be on an audited bounded-cardinality frame."""
    import marketdatapipeline_spark.catalog_corpus  # noqa: F401
    import marketdatapipeline_spark.catalog_multimodal  # noqa: F401
    import marketdatapipeline_spark.catalog_operators  # noqa: F401
    import marketdatapipeline_spark.catalog_pipeline  # noqa: F401
    from marketdatapipeline_spark.caching import release_caches
    from marketdatapipeline_spark.catalog import EXTENDED_REGISTRY, REGISTRY
    from marketdatapipeline_spark.operators import pairs, ranking
    from marketdatapipeline_spark.textops import corpus as corpus_mod
    from marketdatapipeline_spark.textops import graph as graph_mod

    old_rank, old_pair = (
        ranking.SINGLE_TASK_THRESHOLD,
        pairs.PAIR_SINGLE_TASK_THRESHOLD,
    )
    old_graph, old_cc = (
        graph_mod.DRIVER_ROUTE_MAX_EDGES,
        corpus_mod.DRIVER_ROUTE_MAX_EDGES,
    )
    ranking.SINGLE_TASK_THRESHOLD = 0
    pairs.PAIR_SINGLE_TASK_THRESHOLD = 0
    graph_mod.DRIVER_ROUTE_MAX_EDGES = 0
    corpus_mod.DRIVER_ROUTE_MAX_EDGES = 0
    offenders: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    try:
        for name, spec in {**REGISTRY, **EXTENDED_REGISTRY}.items():
            try:
                df = spec.fn(spark, SF)
                plan = df._jdf.queryExecution().optimizedPlan().toString()
                hits = global_ordered_window_lines(plan)
            except Exception as e:  # noqa: BLE001
                errors[name] = repr(e)[:160]
                continue
            finally:
                release_caches()
            if hits and name not in ALLOWED_TINY:
                offenders[name] = hits
    finally:
        ranking.SINGLE_TASK_THRESHOLD = old_rank
        pairs.PAIR_SINGLE_TASK_THRESHOLD = old_pair
        graph_mod.DRIVER_ROUTE_MAX_EDGES = old_graph
        corpus_mod.DRIVER_ROUTE_MAX_EDGES = old_cc
    assert not errors, errors
    assert not offenders, (
        "global ordered window over a non-allowlisted frame — either "
        "route it through operators/ranking.py or audit the input as "
        f"by-contract-tiny and allowlist it: {offenders}"
    )
    # the protected conversions really were scanned
    scanned = set(REGISTRY) | set(EXTENDED_REGISTRY)
    assert CONVERTED <= scanned


def test_detector_fires_on_global_window_shapes(spark):
    """The scan must actually catch both offending forms (lit(1)
    partition and bare orderBy) and stay quiet on keyed and
    partition-only windows — otherwise the catalog scan above could
    go green by detector breakage, not by clean plans."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 3).alias("k")
    )

    def hits(frame):
        return global_ordered_window_lines(
            frame._jdf.queryExecution().optimizedPlan().toString()
        )

    w_lit = Window.partitionBy(F.lit(1)).orderBy("id")
    w_bare = Window.orderBy("id")
    w_key = Window.partitionBy("k").orderBy("id")
    w_part_only = Window.partitionBy("k")
    assert hits(df.withColumn("r", F.row_number().over(w_lit)))
    assert hits(df.withColumn("r", F.row_number().over(w_bare)))
    assert hits(df.withColumn("c", F.sum("id").over(
        w_lit.rowsBetween(Window.unboundedPreceding, 0)
    )))
    assert not hits(df.withColumn("r", F.row_number().over(w_key)))
    assert not hits(df.withColumn("s", F.sum("id").over(w_part_only)))
