"""Graph analytics over document-similarity graphs.

The near-dup pair graph (``jaccard_similar_pairs`` /
``lsh_candidate_pairs`` output) is a graph, and two classic graph
measures answer curation questions no per-pair threshold can:

* :func:`pagerank` — which document is the *canonical* member of a
  duplicate neighborhood?  Within a dup cluster the highest-PageRank
  node is the one most-connected to the rest — the natural "keep"
  representative (dedup keep-policies usually take min-id; PageRank
  gives a content-aware alternative).
* :func:`triangle_stats` — triangle counts + local clustering
  coefficients.  Dense triangle neighborhoods are *template families*
  (boilerplate instantiated many times) as opposed to chains of
  pairwise-similar revisions; the distinction matters because template
  families are usually dropped wholesale while revision chains keep
  one member.

Both are fixed-plan DataFrame computations (no driver-side iteration
state beyond a bounded Python ``for`` over a constant iteration
count), so they compose with the rest of the catalog and restate
exactly in SQL for the DuckDB value oracles.

Scale notes (100 TB):

* PageRank is the textbook distributed shape: per iteration ONE
  equi-join of the edge list against the rank table (shuffle on node
  id) and ONE aggregation — both map-side combinable.  Contributions
  accumulate as ``decimal(28,18)`` so every iteration's rank vector is
  bit-identical regardless of partitioning (float sums would drift
  between engines and between runs).
* Triangle enumeration joins the canonical (a < b) edge list with
  itself on the shared endpoint and semi-joins the closing edge — the
  standard edge-iterator algorithm, cost O(sum of deg^2) bounded by
  the similarity threshold's sparsity, never all-triples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marketdatapipeline_spark.caching import scoped_persist

__all__ = [
    "adamic_adar",
    "pagerank",
    "triangle_stats",
    "weighted_pagerank",
]

#: contribution accumulator type — association-insensitive exact sums
_DEC = "decimal(28,18)"


def _symmetrize(edges: DataFrame, id_a: str, id_b: str) -> DataFrame:
    """Both directions of an undirected edge list: (a, b) ∪ (b, a)."""
    return edges.select(
        F.col(id_a).alias("_src"), F.col(id_b).alias("_dst")
    ).unionAll(
        edges.select(F.col(id_b).alias("_src"), F.col(id_a).alias("_dst"))
    )


#: at or below this many DIRECTED edges the whole graph collects to
#: the driver and the power iteration runs as exact scalar arithmetic
#: in-process — a fixture-scale graph pays ~20 Spark jobs (persists,
#: broadcast materializations, one join + one agg per iteration) for
#: sub-millisecond real work, so the driver twin wins by an order of
#: magnitude; above it the distributed join+agg loop is the only
#: shape that survives. Both routes are BIT-identical (the driver
#: twin reproduces Spark's double->decimal(28,18) cast — shortest
#: decimal repr, HALF_UP at 18 — and exact decimal sums as scaled
#: integers; pinned by the forced-route parity tests).
DRIVER_ROUTE_MAX_EDGES = 100_000


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    id_a: str = "id_a",
    id_b: str = "id_b",
    partitions: int | None = None,
    driver_route_max_edges: int | None = None,
) -> DataFrame:
    """(node, degree, pagerank) over the undirected graph of ``edges``.

    Standard damped PageRank restricted to the non-isolated node set,
    uniform ``1/N`` start, a FIXED number of power iterations (so the
    computation — and its SQL restatement — is a finite plan, not a
    convergence loop):

        pr_{k+1}(v) = (1 - d) / N  +  d * sum_{u ~ v} pr_k(u) / deg(u)

    Every neighbor-contribution sum accumulates as ``decimal(28,18)``
    and the scalar assembly is ordered identically in the SQL oracle,
    so the full rank vector is engine-identical at every iteration.
    Per iteration: one shuffle join (edges x ranks on the source id) +
    one map-side-combinable aggregation — the distributed-PageRank
    plan shape that holds at any graph size.
    """
    # the weight-1 case of the shared iteration core: strength ==
    # degree exactly (decimal sums of 1.0), pr/strength is the same
    # double division as pr/deg, and 1.0 * x is an IEEE identity —
    # bit-identical to a dedicated unweighted loop (asserted by the
    # equal-weights parity test)
    und = _symmetrize(edges, id_a, id_b).withColumn("_w", F.lit(1.0))
    pr = _damped_rank(
        und, iterations, damping, partitions, driver_route_max_edges
    )
    return pr.select("node", "degree", "pr")


def weighted_pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    id_a: str = "id_a",
    id_b: str = "id_b",
    weight_col: str = "weight",
    partitions: int | None = None,
    driver_route_max_edges: int | None = None,
) -> DataFrame:
    """(node, strength, pr): PageRank where each neighbor's vote is
    proportional to EDGE WEIGHT (e.g. the cosine similarity that
    created the edge) instead of split uniformly:

        pr_{k+1}(v) = (1-d)/N + d * sum_{u~v} w(u,v) * pr_k(u) / s(u)

    with ``s(u)`` = u's total incident weight (strength).  On a
    similarity graph this is the more faithful canonical-document
    rank: a 0.9-cosine neighbor endorses harder than a 0.2 one.
    Degenerates to :func:`pagerank` when all weights are equal.

    Exactness contract: weights must be engine-identical doubles
    (cosine folds are — the similarity_cosine_pairs pin).  Strengths
    and contribution sums accumulate as ``decimal(28,18)``; each
    per-edge contribution ``w * (pr / s)`` is IEEE-ordered scalar
    double math.  Same plan shape as the unweighted operator: one
    persisted symmetrized edge list, one join + one agg per
    iteration.
    """
    und = edges.select(
        F.col(id_a).alias("_src"),
        F.col(id_b).alias("_dst"),
        F.col(weight_col).alias("_w"),
    ).unionAll(
        edges.select(
            F.col(id_b).alias("_src"),
            F.col(id_a).alias("_dst"),
            F.col(weight_col).alias("_w"),
        )
    )
    pr = _damped_rank(
        und, iterations, damping, partitions, driver_route_max_edges
    )
    return pr.select("node", "strength", "pr")


def _damped_rank(
    und: DataFrame,
    iterations: int,
    damping: float,
    partitions: int | None,
    driver_route_max_edges: int | None = None,
) -> DataFrame:
    """Shared damped power-iteration core over a weighted directed
    edge list ``(_src, _dst, _w)`` (callers symmetrize): returns
    (node, degree, strength, pr).

    The symmetrized edge list is persisted — it is read 2 + iterations
    times (stats, node count, every power iteration) and without the
    pin the edge-GENERATION subplan (often an expensive similarity
    join) re-executes per consumer and the plan tree blows up
    combinatorially. ``partitions`` additionally hash-clusters the
    cached edges by source node, which (a) lets the stats groupBy and
    every iteration's contribution join reuse the cached partitioning
    instead of re-exchanging the edge list, and (b) right-sizes task
    counts when the graph is a bounded sample (the catalog's case);
    leave None at cluster scale to inherit the upstream layout.
    """
    if partitions is not None:
        und = und.repartition(partitions, "_src")
    und = scoped_persist(und)
    threshold = (
        DRIVER_ROUTE_MAX_EDGES
        if driver_route_max_edges is None
        else driver_route_max_edges
    )
    if threshold > 0:
        # the count is the action that materializes the persisted edge
        # list — work BOTH routes need before their first real pass, so
        # the probe costs one extra scan of cached rows, not a rebuild
        if und.count() <= threshold:
            return _damped_rank_driver(und, iterations, damping)
    stats = und.groupBy(F.col("_src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree"),
        F.sum(F.col("_w").cast(_DEC)).cast("double").alias("strength"),
    )
    n_row = stats.agg(F.count(F.lit(1)).alias("_n"))
    # node table with degree/strength + the global node count on every
    # row (1-row broadcast — the having-a-global-scalar shape)
    base = scoped_persist(stats.crossJoin(F.broadcast(n_row)))

    pr = base.withColumn("pr", F.lit(1.0) / F.col("_n").cast("double"))
    for _ in range(iterations):
        src = pr.select(
            F.col("node").alias("_src"),
            # try_divide: a zero-strength node (weights summing to
            # exactly 0) gets a NULL per-edge rate instead of an ANSI
            # DIVIDE_BY_ZERO crash; the NULL propagates through the
            # contribution product and the null-skipping sum, so such
            # nodes surface with pr NULL (r12, ADVICE parity fix —
            # the driver twin mirrors this exactly)
            F.try_divide(F.col("pr"), F.col("strength")).alias("_ps"),
        )
        contrib = (
            und.join(src, "_src")
            .groupBy(F.col("_dst").alias("node"))
            .agg(
                F.sum((F.col("_w") * F.col("_ps")).cast(_DEC)).alias("_s")
            )
        )
        # every non-isolated node of a symmetric graph receives at
        # least one contribution, so the inner join is total
        pr = base.join(contrib, "node").withColumn(
            "pr",
            F.lit(1.0 - damping) / F.col("_n").cast("double")
            + F.lit(damping) * F.col("_s").cast("double"),
        )
    return pr


def _dec18_scaled(x: float) -> int:
    """``x`` as an integer of 1e-18 units, reproducing Spark's
    ``cast(double AS decimal(28,18))`` exactly: the SHORTEST decimal
    representation of the double (``repr`` — same value contract as
    Java's ``Double.toString``, verified against the live cast for
    the r11 routing work), rounded HALF_UP at 18 fractional digits.
    Summing the scaled integers in Python is then the exact
    decimal(38,18) accumulation, association-free by construction."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        Decimal(repr(x)).scaleb(18).to_integral_value(ROUND_HALF_UP)
    )


def _unscale18(total: int) -> float:
    """decimal(38,18) -> double, Spark's cast: correctly-rounded
    nearest double of the exact decimal value."""
    from decimal import Decimal

    return float(Decimal(total).scaleb(-18))


def _damped_rank_driver(
    und: DataFrame, iterations: int, damping: float
) -> DataFrame:
    """Driver-side exact twin of the distributed power iteration, for
    graphs at or below ``DRIVER_ROUTE_MAX_EDGES`` directed edges.

    Every arithmetic step mirrors the distributed plan op-for-op:
    strengths and per-node contribution sums are exact decimal(_,18)
    accumulations (scaled integers — addition order cannot matter);
    ``pr / strength``, ``w * ps`` and the teleport assembly
    ``(1-d)/n + d * s`` are scalar IEEE doubles in the same order the
    Column expressions evaluate; decimal->double edges are correctly
    rounded in both engines. Bit-identity is pinned by the
    forced-route parity tests (randomized weighted graphs compared
    float-for-float against the distributed route)."""
    from pyspark.sql import types as T

    rows = und.collect()
    deg: dict = {}
    st_scaled: dict = {}
    for r in rows:
        s = r["_src"]
        deg[s] = deg.get(s, 0) + 1
        # non-finite weights raise here (OverflowError) just as the
        # plan's ANSI cast(w AS decimal) raises — weights are
        # data-contract finite cosines in every caller
        st_scaled[s] = st_scaled.get(s, 0) + _dec18_scaled(r["_w"])
    strength = {v: _unscale18(t) for v, t in st_scaled.items()}
    n = len(deg)
    spark = und.sparkSession
    id_type = und.schema["_src"].dataType
    out_schema = T.StructType(
        [
            T.StructField("node", id_type),
            T.StructField("degree", T.LongType()),
            T.StructField("strength", T.DoubleType()),
            T.StructField("pr", T.DoubleType()),
        ]
    )
    if n == 0:
        return spark.createDataFrame([], out_schema)
    nf = float(n)
    pr = {v: 1.0 / nf for v in deg}
    for _ in range(iterations):
        # pr / strength is try_divide in the plan: NULL on a zero
        # divisor or NULL operand, never a crash (r12 ADVICE fix —
        # the twin used to raise ZeroDivisionError, the plan used to
        # raise ANSI DIVIDE_BY_ZERO).
        ps: dict = {}
        for u, p in pr.items():
            s = strength[u]
            ps[u] = None if (p is None or s == 0.0) else p / s
        # contribution agg: cast((w * ps) AS decimal) nulls non-finite
        # terms, sum() skips them but the groupBy still emits a group
        # (NULL sum) for every _dst reached through the join — mirror
        # with a seen-set so such nodes keep a NULL rank row instead
        # of vanishing.
        acc: dict = {}
        seen: set = set()
        for r in rows:
            u = r["_src"]
            if u not in ps:  # mirrors the inner joins' row drops
                continue
            d = r["_dst"]
            seen.add(d)
            if ps[u] is None:
                continue
            term = r["_w"] * ps[u]
            acc[d] = acc.get(d, 0) + _dec18_scaled(term)
        # base JOIN contrib is inner: only nodes that received a
        # contribution row carry a rank into the next round (total on
        # any symmetrized graph — every non-isolated node has an
        # in-edge)
        pr = {}
        for v in seen:
            if v not in deg:
                continue
            t = acc.get(v)
            pr[v] = (
                None
                if t is None
                else (1.0 - damping) / nf + damping * _unscale18(t)
            )
    return spark.createDataFrame(
        [
            (v, deg[v], strength[v], p)
            for v, p in sorted(pr.items())
        ],
        out_schema,
    )


def triangle_stats(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    partitions: int | None = None,
) -> DataFrame:
    """(node, degree, n_triangles, clustering) for the undirected
    graph of canonical (``id_a < id_b``) ``edges``.

    Edge-iterator triangle enumeration: wedges (a < b < c) from
    joining the canonical edge list with itself on the shared middle
    endpoint, closed by a left-semi join against the (a, c) edge.
    Each triangle is enumerated exactly once and credited to all
    three corners; the local clustering coefficient is

        2 * triangles(v) / (deg(v) * (deg(v) - 1))     for deg >= 2

    (null for degree-1 nodes — a single edge has no closable wedge).
    Integer counts are exact; the coefficient rounds at 6.
    """
    e = edges.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    if partitions is not None:
        # bounded-sample graphs (the catalog's case): right-size task
        # counts for the wedge/closing joins; leave None at scale
        e = e.repartition(partitions, "b")
    e = scoped_persist(e)
    # NO driver route here, deliberately (r11): a measured same-session
    # A/B showed the single-pass wedge/semi-join plan consistently
    # BEATING a collect-and-enumerate driver twin on the fixture graph
    # — the route only pays when it replaces an ITERATIVE loop's jobs
    # (PageRank, connected components), not a one-shot join tree.
    # wedges a-b-c with a < b < c: (a,b) joined to (b,c)
    ab = e
    bc = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedges = ab.join(bc, "b").select("a", "b", "c")
    ac = e.select(F.col("a").alias("a"), F.col("b").alias("c"))
    tri = wedges.join(ac, ["a", "c"], "left_semi")
    corners = tri.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    ).groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))

    # symmetrize from the PERSISTED canonical list so the degree pass
    # re-reads cached edges instead of re-running edge generation
    und = _symmetrize(e, "a", "b")
    deg = und.groupBy(F.col("_src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    out = deg.join(corners, "node", "left").withColumn(
        "n_triangles", F.coalesce(F.col("n_triangles"), F.lit(0))
    )
    d = F.col("degree").cast("double")
    clustering = F.when(
        F.col("degree") >= 2,
        F.round(
            F.lit(2.0) * F.col("n_triangles").cast("double")
            / (d * (d - F.lit(1.0))),
            6,
        )
        + F.lit(0.0),
    )
    return out.select(
        "node", "degree", "n_triangles", clustering.alias("clustering")
    )


def adamic_adar(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    partitions: int | None = None,
) -> DataFrame:
    """(id_a, id_b, n_common, aa_score): Adamic-Adar link prediction
    over the undirected graph of canonical ``edges`` — for every
    NON-adjacent pair sharing at least one neighbor,

        aa_score = sum over common neighbors m of 1 / ln(deg(m))

    (rare shared neighbors count more than promiscuous hubs).  On a
    similarity graph these are the *missed edges*: pairs the pairwise
    threshold didn't connect but whose shared neighborhood says it
    probably should have — the review queue a dedup pipeline drains
    before lowering a global threshold blindly.

    A wedge's middle always has degree >= 2, so ln(deg) > 0 by
    construction.  Per-wedge terms accumulate as ``decimal(28,18)``;
    integer common-neighbor counts are exact.  Plan: one wedge
    self-join of the persisted symmetrized edge list on the middle
    node + one degree join + one pair aggregation + one left-anti
    join against the existing edges — O(sum deg^2) wedge rows, never
    all-pairs.
    """
    # NO driver route here, deliberately (r11): unlike PageRank /
    # triangle_stats, this operator's OUTPUT is wedge-pair-scaled
    # (Σ deg² candidate pairs — 19k rows already on the sf0.1 fixture
    # graph), and a measured A/B showed collect-compute-createDataFrame
    # round-tripping that output costs ~2x the distributed joins it
    # replaced. Small-graph overhead here is bounded by the plan
    # (one wedge self-join + one agg), not by iteration count.
    und = _symmetrize(edges, id_a, id_b)
    if partitions is not None:
        und = und.repartition(partitions, "_src")
    und = scoped_persist(und)
    deg = und.groupBy(F.col("_src").alias("_m")).agg(
        F.count(F.lit(1)).alias("_deg")
    )
    wa = und.select(F.col("_src").alias("_m"), F.col("_dst").alias("_x"))
    wb = und.select(F.col("_src").alias("_m"), F.col("_dst").alias("_z"))
    cand = (
        wa.join(wb, "_m")
        .filter(F.col("_x") < F.col("_z"))
        .join(deg, "_m")
    )
    term = (F.lit(1.0) / F.log(F.col("_deg").cast("double"))).cast(_DEC)
    sc = cand.groupBy(
        F.col("_x").alias(id_a), F.col("_z").alias(id_b)
    ).agg(
        F.count(F.lit(1)).alias("n_common"),
        F.sum(term).cast("double").alias("aa_score"),
    )
    # anti-join against the CACHED symmetrized list, not the raw
    # `edges` DataFrame: referencing `edges` here would re-execute the
    # whole edge-generation subplan (the expensive similarity join)
    # a second time per run.  und's _src < _dst half IS the canonical
    # edge set (callers pass id_a < id_b pairs).
    canon = und.filter(F.col("_src") < F.col("_dst")).select(
        F.col("_src").alias(id_a), F.col("_dst").alias(id_b)
    )
    return sc.join(canon, [id_a, id_b], "left_anti")
