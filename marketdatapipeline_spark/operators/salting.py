"""Skew mitigation by key salting.

Where it matters: for ALGEBRAIC aggregates (sum/count/min/max/avg)
Spark's map-side partial aggregation already neutralizes key skew —
do NOT salt those. The problem case is holistic aggregates
(``collect_list``, exact percentiles) and hot-key joins, where one
reducer receives a hot key's entire value set. Salting splits the hot
key across ``salt`` reducers and recombines:

  stage 1: groupBy(key, hash(row) % salt) -> partial state
  stage 2: groupBy(key)                   -> merge partials

Two shuffles instead of one, but the largest single task shrinks by
~``salt``x — the difference between a straggler pinning the stage (or
OOMing) and even progress. AQE's skew handling covers sort-merge
JOINS; aggregation skew on holistic functions still needs this.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_collect_list(
    df: DataFrame,
    key_cols: tuple[str, ...],
    value_col: str,
    salt: int = 16,
    sort_result: bool = True,
) -> DataFrame:
    """``groupBy(keys).collect_list(value)`` that survives hot keys.

    The salt is derived from the VALUE (xxhash64 % salt), so the same
    row always lands in the same salt bucket — deterministic retries.
    With ``sort_result`` the final array is ``array_sort``-ed, making
    the output independent of bucket interleaving (holistic list
    aggregation without an order contract is nondeterministic under
    ANY distributed execution, salted or not).
    """
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    bucket = F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt))
    partial = (
        df.groupBy(*key_cols, bucket.alias("_salt"))
        .agg(F.collect_list(value_col).alias("_part"))
    )
    merged = partial.groupBy(*key_cols).agg(
        F.flatten(F.collect_list("_part")).alias(value_col + "s")
    )
    if sort_result:
        merged = merged.withColumn(
            value_col + "s", F.array_sort(F.col(value_col + "s"))
        )
    return merged


def salted_join_left_hot(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
) -> DataFrame:
    """Inner equi-join where ``left`` has hot keys and ``right`` is
    NOT broadcastable: replicate each right row to every salt bucket
    (explode, ``salt``x the small-side volume) and spread left rows
    across buckets, so a hot key's probe work lands on ``salt`` tasks
    instead of one. Prefer ``F.broadcast`` when the right side fits in
    memory; prefer AQE skew-join for sort-merge plans — this is the
    manual tool for the cases between."""
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    l_salted = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l_salted.join(r_salted, on=[on, "_salt"]).drop("_salt")
