"""Small shared execution utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


_PINNED: dict[str, DataFrame] = {}


def pin_result(out: DataFrame, *intermediates: DataFrame,
               key: str | None = None) -> DataFrame:
    """Materialize a (small) result DataFrame into the cache, then release
    the persisted upstream intermediates that fed it.

    Queries that persist join inputs (signature tables, cluster
    assignments, shingle sets) would otherwise leak them into executor
    storage memory for the lifetime of the session — each repeated call
    stacking another copy. Pinning the result first keeps laziness safe:
    the caller's later actions read the cached result, never re-running the
    released intermediates.

    ``key`` bounds the RESULT cache too: at most one pinned result lives
    per key (one per call site) — the previous result under the same key is
    unpersisted (non-blocking) before the new one is registered, so
    repeated calls hold O(call sites) cached results, not O(calls). A
    caller that still iterates an old result after re-calling the same
    query simply recomputes it (unpersist never breaks correctness).
    """
    out = out.persist()
    out.count()
    for df in intermediates:
        df.unpersist()
    if key is not None:
        prev = _PINNED.pop(key, None)
        if prev is not None:
            try:
                prev.unpersist(blocking=False)
            except Exception:
                pass  # e.g. its SparkSession is already stopped
        _PINNED[key] = out
    return out
