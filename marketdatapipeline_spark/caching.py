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

_LIVE: list[DataFrame] = []

#: backstop bound on registered-but-unreleased frames; generous —
#: a single query registers at most a handful.
MAX_LIVE = 16


def scoped_persist(df: DataFrame) -> DataFrame:
    """Persist at MEMORY_AND_DISK and register for later release."""
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    while len(_LIVE) >= MAX_LIVE:
        try:
            _LIVE.pop(0).unpersist()
        except Exception:
            pass
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
