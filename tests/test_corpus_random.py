"""Randomized parity for the corpus operators against independent
pure-Python references (union-find, Counter, hashlib) — the oracle
suite checks the synthetic corpus; these sweep random shapes the
fixtures never produce (empty docs, newline runs, skewed sizes,
random pair graphs). Fixed seeds, no RNG state across runs.
"""

from __future__ import annotations

import hashlib
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from marketdatapipeline_spark.textops.corpus import (
    SPLIT_BUCKETS,
    assign_splits,
    duplicate_clusters,
    pack_shards,
    top_bigram_stats,
)

WORDS = ["data", "spark", "join", "the", "a", "row", "batch", "merge", "x"]


def _random_docs(seed: int, n: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        k = rng.randint(0, 30)
        words = [rng.choice(WORDS) for _ in range(k)]
        # sprinkle newlines so line- and token-level ops both exercise
        text = " ".join(words).replace(" ", "\n", rng.randint(0, 2))
        docs.append((i, text))
    return docs


def _md5_bucket(i: int) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % SPLIT_BUCKETS


def _md5_int(i: int) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_assign_splits_matches_hashlib_reference(spark, seed):
    docs = _random_docs(seed, 120)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["split_bucket"], r["split"])
        for r in assign_splits(df, train=900, val=950).collect()
    }
    for i, _ in docs:
        b = _md5_bucket(i)
        want = "train" if b < 900 else "val" if b < 950 else "test"
        assert got[i] == (b, want), i


@pytest.mark.parametrize("seed", [0, 1])
def test_top_bigram_matches_counter_reference(spark, seed):
    docs = _random_docs(seed, 80)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in top_bigram_stats(df).collect()}
    for i, text in docs:
        ws = text.strip().lower().split()
        bigrams = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        if not bigrams:
            assert i not in got
            continue
        c = Counter(bigrams)
        assert got[i]["n_bigrams"] == len(bigrams)
        assert got[i]["top_bigram_n"] == max(c.values())


@pytest.mark.parametrize("seed", [0, 1])
def test_pack_shards_matches_prefix_sum_reference(spark, seed):
    rng = random.Random(seed)
    rows = [(i, rng.randint(0, 900)) for i in range(150)]
    df = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    target, n_buckets = 2500, 8
    got = {
        r["doc_id"]: r["shard"]
        for r in pack_shards(
            df, target_chars=target, n_buckets=n_buckets
        ).collect()
    }
    # reference: global order (bucket, hash, id), running char total
    order = sorted(rows, key=lambda r: (_md5_int(r[0]) % n_buckets, _md5_int(r[0]), r[0]))
    cum = 0
    for i, size in order:
        assert got[i] == cum // target, i
        cum += size


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_duplicate_clusters_matches_union_find(spark, seed):
    rng = random.Random(seed)
    n = 60
    pairs = sorted(
        {
            tuple(sorted(rng.sample(range(n), 2)))
            for _ in range(rng.randint(0, 45))
        }
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    if pairs:
        pairs_df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    else:
        pairs_df = spark.createDataFrame([], "id_a BIGINT, id_b BIGINT")
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in duplicate_clusters(nodes, pairs_df, max_iter=n).collect()
    }

    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = [find(i) for i in range(n)]
    # canonical label = min member id; union-by-min keeps roots minimal
    sizes = Counter(roots)
    for i in range(n):
        assert got[i] == (roots[i], sizes[roots[i]]), i


@pytest.mark.parametrize("seed", [5, 17, 29])
def test_duplicate_clusters_driver_route_matches_distributed(spark, seed):
    """r11 size routing: driver union-find vs distributed min-label
    propagation — integer outputs, so exact equality, including pairs
    that reference ids OUTSIDE the node table (the distributed loop's
    inner joins ignore them; the driver route must too)."""
    from marketdatapipeline_spark.textops.corpus import duplicate_clusters

    rng = random.Random(seed)
    n = 40
    pairs = sorted(
        {
            tuple(sorted(rng.sample(range(n + 10), 2)))  # some ids > n
            for _ in range(rng.randint(1, 50))
        }
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    pairs_df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    dist = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in duplicate_clusters(
            nodes, pairs_df, max_iter=n, driver_route_max_edges=0
        ).collect()
    }
    drv = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in duplicate_clusters(
            nodes, pairs_df, max_iter=n, driver_route_max_edges=10**9
        ).collect()
    }
    assert dist == drv
