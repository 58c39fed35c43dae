"""Graph analytics (textops/graph.py) against hand-computed answers.

The catalog's graph_pagerank / graph_triangle_stats entries are
value-oracled against DuckDB on the real similarity graph
(test_corpus_oracle.py); these tests pin the operator SEMANTICS on a
tiny graph whose answers are computable by hand / a few lines of pure
Python — independent of both engines.
"""

from __future__ import annotations

import pytest

from marketdatapipeline_spark.textops.graph import pagerank, triangle_stats

# triangle {1,2,3} with a pendant 4 hanging off node 3
EDGES = [(1, 2), (1, 3), (2, 3), (3, 4)]


@pytest.fixture()
def edges_df(spark):
    return spark.createDataFrame(EDGES, ["id_a", "id_b"])


def _reference_pagerank(edges, iterations=3, damping=0.85):
    nbrs: dict[int, list[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    n = len(nbrs)
    pr = {v: 1.0 / n for v in nbrs}
    for _ in range(iterations):
        pr = {
            v: (1.0 - damping) / n
            + damping * sum(pr[u] / len(nbrs[u]) for u in nbrs[v])
            for v in nbrs
        }
    return pr


def test_triangle_stats_hand_graph(edges_df):
    rows = {
        r["node"]: r for r in triangle_stats(edges_df).collect()
    }
    assert {n: rows[n]["degree"] for n in rows} == {1: 2, 2: 2, 3: 3, 4: 1}
    assert {n: rows[n]["n_triangles"] for n in rows} == {
        1: 1, 2: 1, 3: 1, 4: 0,
    }
    assert rows[1]["clustering"] == 1.0
    assert rows[2]["clustering"] == 1.0
    assert rows[3]["clustering"] == pytest.approx(1 / 3, abs=1e-6)
    assert rows[4]["clustering"] is None  # degree-1: no closable wedge


def test_pagerank_hand_graph(edges_df):
    got = {r["node"]: r["pr"] for r in pagerank(edges_df).collect()}
    want = _reference_pagerank(EDGES)
    assert set(got) == set(want)
    for v in want:
        # decimal-summed contributions vs pure-float reference: the
        # only difference is sub-ulp association noise
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    # the triangle hub (3) outranks its pendant and the rank vector
    # sums to ~1 (undirected connected graph, no dangling mass)
    assert got[3] > got[1] > got[4] or got[3] > got[2] > got[4]
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_uniform_on_regular_graph(spark):
    # a 4-cycle is 2-regular: PageRank must stay exactly uniform
    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], ["id_a", "id_b"]
    )
    got = {r["node"]: r["pr"] for r in pagerank(cyc).collect()}
    for v, p in got.items():
        assert p == pytest.approx(0.25, abs=1e-15)


# ---------------------------------------------------------------------------
# randomized parity vs a pure-Python reference
# ---------------------------------------------------------------------------

def _random_edges(seed: int, n_nodes: int = 12, n_edges: int = 18):
    import random

    rng = random.Random(seed)
    edges = set()
    while len(edges) < n_edges:
        a, b = rng.sample(range(1, n_nodes + 1), 2)
        edges.add((min(a, b), max(a, b)))
    return sorted(edges)


def _reference_triangles(edges):
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    tri = {v: 0 for v in nbrs}
    for a, b in edges:
        for c in nbrs[a] & nbrs[b]:
            if c > b:  # count each triangle once at its max corner
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    return {v: (len(nbrs[v]), tri[v]) for v in nbrs}


@pytest.mark.parametrize("seed", [7, 23, 101])
def test_graph_ops_match_python_reference_on_random_graphs(spark, seed):
    edges = _random_edges(seed)
    df = spark.createDataFrame(edges, ["id_a", "id_b"])

    want_tri = _reference_triangles(edges)
    got_tri = {
        r["node"]: (r["degree"], r["n_triangles"])
        for r in triangle_stats(df).collect()
    }
    assert got_tri == want_tri

    want_pr = _reference_pagerank(edges)
    got_pr = {r["node"]: r["pr"] for r in pagerank(df).collect()}
    assert set(got_pr) == set(want_pr)
    for v in want_pr:
        assert got_pr[v] == pytest.approx(want_pr[v], abs=1e-12)


def test_weighted_pagerank_degenerates_and_discriminates(spark):
    from marketdatapipeline_spark.textops.graph import weighted_pagerank

    # equal weights ==> identical to the unweighted operator
    eq = spark.createDataFrame(
        [(a, b, 1.0) for a, b in EDGES], ["id_a", "id_b", "weight"]
    )
    got_w = {r["node"]: r["pr"] for r in weighted_pagerank(eq).collect()}
    got_u = {
        r["node"]: r["pr"]
        for r in pagerank(spark.createDataFrame(EDGES, ["id_a", "id_b"])).collect()
    }
    assert set(got_w) == set(got_u)
    for v in got_u:
        assert got_w[v] == pytest.approx(got_u[v], abs=1e-12)

    # skewing all weight onto the 3-4 edge must pull rank toward 4
    # relative to the equal-weight ranking
    sk = spark.createDataFrame(
        [(1, 2, 0.1), (1, 3, 0.1), (2, 3, 0.1), (3, 4, 10.0)],
        ["id_a", "id_b", "weight"],
    )
    got_s = {r["node"]: r["pr"] for r in weighted_pagerank(sk).collect()}
    assert got_s[4] > got_w[4]
    # strengths are the decimal-exact incident-weight sums
    st = {r["node"]: r["strength"] for r in weighted_pagerank(sk).collect()}
    assert st[3] == pytest.approx(10.2, abs=1e-12)
    assert st[4] == pytest.approx(10.0, abs=1e-12)


def _reference_adamic_adar(edges):
    import math

    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    es = {(min(a, b), max(a, b)) for a, b in edges}
    out = {}
    for x in nbrs:
        for z in nbrs:
            if x < z and (x, z) not in es:
                common = nbrs[x] & nbrs[z]
                if common:
                    out[(x, z)] = (
                        len(common),
                        sum(1.0 / math.log(len(nbrs[m])) for m in common),
                    )
    return out


@pytest.mark.parametrize("seed", [5, 77])
def test_adamic_adar_matches_python_reference(spark, seed):
    from marketdatapipeline_spark.textops.graph import adamic_adar

    edges = _random_edges(seed)
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["aa_score"])
        for r in adamic_adar(df).collect()
    }
    want = _reference_adamic_adar(edges)
    assert set(got) == set(want)
    for k, (nc, aa) in want.items():
        assert got[k][0] == nc
        assert got[k][1] == pytest.approx(aa, abs=1e-12)


def _reference_weighted_pagerank(wedges, iterations=3, damping=0.85):
    nbrs: dict[int, list[tuple[int, float]]] = {}
    for a, b, w in wedges:
        nbrs.setdefault(a, []).append((b, w))
        nbrs.setdefault(b, []).append((a, w))
    strength = {v: sum(w for _, w in es) for v, es in nbrs.items()}
    n = len(nbrs)
    pr = {v: 1.0 / n for v in nbrs}
    for _ in range(iterations):
        pr = {
            v: (1.0 - damping) / n
            + damping
            * sum(w * (pr[u] / strength[u]) for u, w in nbrs[v])
            for v in nbrs
        }
    return pr


@pytest.mark.parametrize("seed", [13, 59])
def test_weighted_pagerank_matches_python_reference(spark, seed):
    import random

    from marketdatapipeline_spark.textops.graph import weighted_pagerank

    rng = random.Random(seed)
    wedges = [
        (a, b, round(rng.uniform(0.1, 2.0), 6))
        for a, b in _random_edges(seed)
    ]
    df = spark.createDataFrame(wedges, ["id_a", "id_b", "weight"])
    got = {r["node"]: r["pr"] for r in weighted_pagerank(df).collect()}
    want = _reference_weighted_pagerank(wedges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


@pytest.mark.parametrize("seed", [7, 21, 404])
def test_weighted_pagerank_driver_route_bit_identical(spark, seed):
    """r11 size routing: the driver-side exact-decimal twin must match
    the distributed join+agg loop FLOAT-FOR-FLOAT (not approximately —
    the DuckDB oracle hashes these doubles), on randomized weighted
    graphs with awkward float weights."""
    import random

    from marketdatapipeline_spark.textops.graph import weighted_pagerank

    rng = random.Random(seed)
    # raw uniform doubles, NOT rounded: exercises the shortest-repr
    # HALF_UP decimal cast on full-entropy mantissas
    wedges = [
        (a, b, rng.uniform(0.05, 2.0)) for a, b in _random_edges(seed)
    ]
    df = spark.createDataFrame(wedges, ["id_a", "id_b", "weight"])
    dist = {
        r["node"]: (r["strength"], r["pr"])
        for r in weighted_pagerank(df, driver_route_max_edges=0).collect()
    }
    drv = {
        r["node"]: (r["strength"], r["pr"])
        for r in weighted_pagerank(
            df, driver_route_max_edges=10**9
        ).collect()
    }
    assert set(dist) == set(drv)
    for v in dist:
        assert dist[v] == drv[v], (v, dist[v], drv[v])


@pytest.mark.parametrize("seed", [11, 31])
def test_pagerank_driver_route_bit_identical(spark, seed):
    from marketdatapipeline_spark.textops.graph import pagerank

    df = spark.createDataFrame(_random_edges(seed), ["id_a", "id_b"])
    dist = {
        r["node"]: (r["degree"], r["pr"])
        for r in pagerank(df, driver_route_max_edges=0).collect()
    }
    drv = {
        r["node"]: (r["degree"], r["pr"])
        for r in pagerank(df, driver_route_max_edges=10**9).collect()
    }
    assert dist == drv


def test_pagerank_driver_route_empty_graph(spark):
    from marketdatapipeline_spark.textops.graph import pagerank

    df = spark.createDataFrame([], "id_a BIGINT, id_b BIGINT")
    assert pagerank(df, driver_route_max_edges=10**9).collect() == []


def test_weighted_pagerank_zero_strength_routes_agree(spark):
    """r12 (ADVICE): a node whose incident weights sum to exactly 0.0
    used to crash BOTH routes — ZeroDivisionError in the size-routed
    driver twin, ANSI DIVIDE_BY_ZERO in the distributed plan. The
    rate division is now try_divide (NULL on zero strength, rank
    surfaces as NULL) and the twin mirrors it; both routes must
    return identical rows."""
    import math

    from marketdatapipeline_spark.textops.graph import weighted_pagerank

    # node 1-2 carry a zero-weight edge (strength 0 for node 2's only
    # edge); nodes 3-4-5 are an ordinary weighted triangle
    wedges = [
        (1, 2, 0.0),
        (3, 4, 0.5),
        (4, 5, 1.5),
        (3, 5, 0.25),
    ]
    df = spark.createDataFrame(wedges, ["id_a", "id_b", "weight"])

    def snap(route_max):
        return {
            r["node"]: (r["strength"], r["pr"])
            for r in weighted_pagerank(
                df, driver_route_max_edges=route_max
            ).collect()
        }

    dist = snap(0)       # forced distributed
    drv = snap(10**9)    # forced driver twin
    assert set(dist) == set(drv)
    for v in dist:
        for a, b in zip(dist[v], drv[v]):
            if a is None or b is None:
                assert a is b, (v, dist[v], drv[v])
            elif isinstance(a, float) and math.isnan(a):
                assert isinstance(b, float) and math.isnan(b), (v, dist[v], drv[v])
            else:
                assert a == b, (v, dist[v], drv[v])
