"""Bounded registry for operator-level persist() frames.

Several operators persist an intermediate that multiple plan branches
read (shingle tables, SRP band keys, quantized-vector attach tables,
range-bucket inputs). The persist must outlive PLAN CONSTRUCTION — the
branches read it at action time — so the operator cannot unpersist its
own frame, and without a bound every call leaks a cached DataFrame for
the session's lifetime (the r8 ADVICE finding on range_bucket,
generalized here to the whole operator surface in r9).

Unpersisting is always SAFE for correctness: a consumer that still
references the frame just recomputes its lineage (same reason the
blocks are evictable under memory pressure). So a small FIFO keeps the
steady-state cache footprint bounded — the current query's frames (and
a few neighbors) stay warm, everything older is dropped — and
``release_tracked_caches()`` drops everything now (sweeps, tests,
long-lived sessions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Operators persist 1-3 frames per query; 16 keeps a handful of recent
# queries warm without letting a long session accumulate one cache per
# call forever.
_MAX_CACHED = 16
_PERSISTED: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """persist() the frame and register it in the bounded FIFO; returns
    the persisted frame so call sites read ``track_persist(df)`` where
    they used to read ``df.persist()``."""
    df = df.persist()
    _PERSISTED.append(df)
    while len(_PERSISTED) > _MAX_CACHED:
        try:
            _PERSISTED.pop(0).unpersist(blocking=False)
        except Exception:
            pass  # session already stopped; nothing to release
    return df


def release_tracked_caches() -> None:
    """Unpersist every tracked frame. Safe at any time (consumers
    recompute from lineage)."""
    while _PERSISTED:
        try:
            _PERSISTED.pop().unpersist(blocking=False)
        except Exception:
            pass
