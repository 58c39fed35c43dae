"""Scoped DataFrame caching for multi-consumer plan fragments.

Several operators persist an intermediate frame because two or three
plan branches consume it (e.g. the hashed-shingle table feeding both
sides of the Jaccard self-join, or the curation flags frame). The
frames are lazy — the persist only materializes under the caller's
action — so the operator itself can never unpersist. Left alone, a
long-lived session running the full catalog repeatedly accumulates
cached frames in storage memory (ADVICE r5).

``scoped_persist`` therefore registers every such frame, pins it at
MEMORY_AND_DISK (spill, never recompute-under-pressure), and
``release_caches()`` runs (a) at every catalog-query invocation
(catalog.py ``register`` wrapper) and (b) at the end of the bench and
check_oracle harnesses. Library callers invoking the textops/curation
APIs directly in a loop should call it at their own stage boundaries;
as a backstop, the registry is capped at ``MAX_LIVE`` frames — when
exceeded, the OLDEST frame is unpersisted (recompute-safe: a consumer
that still needs it just recomputes), so storage memory is bounded
even for callers that never release. On a real cluster the same call
sits at pipeline-stage boundaries.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_LIVE: list[tuple[DataFrame, bool]] = []

#: backstop bound on registered-but-unreleased frames; generous —
#: a single query registers at most a handful.
MAX_LIVE = 16


def scoped_persist(df: DataFrame, *, pin: bool = False) -> DataFrame:
    """Persist at MEMORY_AND_DISK and register for later release.

    ``pin=True`` exempts the frame from the MAX_LIVE pop-oldest
    backstop. Use it ONLY for frames whose recomputation is NOT
    value-safe — e.g. the range-partitioned layout inside
    ``operators/ranking.py``, where RangePartitioner's boundary
    sampling is seeded per execution, so an evicted-and-recomputed
    frame could place rows in different partitions than the offsets
    were computed for (silently wrong ranks). Pinned frames are still
    released by :func:`release_caches` — their owners' contract is
    that the returned plan is fully consumed within the same
    query/stage scope (every catalog consumer materializes before the
    next ``release_caches``)."""
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    while len(_LIVE) >= MAX_LIVE:
        idx = next(
            (i for i, (_, pinned) in enumerate(_LIVE) if not pinned), None
        )
        if idx is None:  # everything pinned — never evict a pinned frame
            break
        try:
            _LIVE.pop(idx)[0].unpersist()
        except Exception:
            pass
    _LIVE.append((out, pin))
    return out


def release_caches() -> int:
    """Unpersist every registered frame; returns how many were released."""
    n = 0
    while _LIVE:
        df, _ = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n
