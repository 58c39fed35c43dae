"""Scoped DataFrame caching for multi-consumer plan fragments.

Several operators persist an intermediate frame because two or three
plan branches consume it (e.g. the hashed-shingle table feeding both
sides of the Jaccard self-join, or the curation flags frame). The
frames are lazy — the persist only materializes under the caller's
action — so the operator itself can never unpersist. Left alone, a
long-lived session running the full catalog repeatedly accumulates
cached frames in storage memory (ADVICE r5).

``scoped_persist`` therefore registers every such frame, pins it at
MEMORY_AND_DISK (spill, never recompute-under-pressure), and harnesses
call ``release_caches()`` once the query's actions are done. On a real
cluster the same call sits at pipeline-stage boundaries.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """Persist at MEMORY_AND_DISK and register for later release."""
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    _LIVE.append(out)
    return out


def release_caches() -> int:
    """Unpersist every registered frame; returns how many were released."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n
