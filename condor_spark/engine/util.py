"""Small shared execution utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def pin_result(out: DataFrame, *intermediates: DataFrame) -> DataFrame:
    """Materialize a (small) result DataFrame into the cache, then release
    the persisted upstream intermediates that fed it.

    Queries that persist join inputs (signature tables, cluster
    assignments, shingle sets) would otherwise leak them into executor
    storage memory for the lifetime of the session — each repeated call
    stacking another copy. Pinning the result first keeps laziness safe:
    the caller's later actions read the cached result, never re-running the
    released intermediates.
    """
    out = out.persist()
    out.count()
    for df in intermediates:
        df.unpersist()
    return out
