"""Explicit skew handling: salted repartitioning + two-level tree merge.

The fixture (and any real audio corpus) is heavily skewed on the north-rule
hot keys: ~80% of clips are ``codec='pcm_s16le'`` and ~70% are
``sr_hz=16000`` (fixtures.py). Two distinct skew surfaces exist in this
engine and each gets its own remedy:

1. **Raw-row shuffles keyed by a hot column** (e.g. ``repartition(codec)``
   before a per-codec pass, or sessionization by stratum). A plain hash
   repartition sends 80% of all rows — including multi-KB audio blobs — to
   one task. ``salted_repartition`` spreads each key over ``buckets`` salt
   lanes so every task gets ~|rows|/P regardless of key distribution. The
   salt is derived JVM-side from a uniform column (round-robin over the
   partition-local row index), never from ``rand()`` (non-deterministic
   under task retry — breaks exactly-once).

2. **The final synopsis merge fan-in.** The two-phase build shuffles only
   sketch blobs, so row-level skew can't hurt it, but at 1000 executors a
   single ``groupBy(window, stratum)`` merge task receives 1000 partials
   per hot (window, stratum) — a driver-style fan-in. ``tree_merge``
   inserts an intermediate combine level keyed by
   ``(window, stratum, pid % fanout)`` — the treeReduce pattern — so no
   task ever reduces more than max(fanout, P/fanout) blobs.
   (Condor has the same single-task funnel by design — ``windowAll``
   ``setParallelism(1)``, ``SynopsisBuilder.java:288`` — and accepts it;
   we defuse it because 1000-executor scale is the design point here.)

Reference analogue: Condor's pre-aggregation key is the subtask index
(``AddParallelismIndex``, ``SynopsisBuilder.java:365-371``) which is uniform
by construction; the salted key plays that role for key-partitioned work.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..synopsis.base import Synopsis
from .builder import (_FINAL_SCHEMA, _PARTIAL_SCHEMA, SynopsisSpec,
                      _merge_group, _final_merger, _normalize, _partial_builder)
from .windows import Sliding, Tumbling


def with_salt(df: DataFrame, buckets: int, col_name: str = "__salt") -> DataFrame:
    """Add a deterministic uniform salt column in [0, buckets).

    Round-robin over the partition-local row index: uniform for any input
    distribution, no data-dependent hashing, stable under task retry
    (unlike ``F.rand()``). Stays JVM-side (window-function-free: a
    monotonically increasing id mod buckets is uniform per partition
    because ids are consecutive within a partition).
    """
    return df.withColumn(
        col_name, F.pmod(F.monotonically_increasing_id(), F.lit(buckets)).cast("int"))


def salted_repartition(df: DataFrame, key_cols: list[str], buckets: int,
                       num_partitions: int | None = None) -> DataFrame:
    """Repartition by (key, salt) so a hot key spreads over ``buckets`` tasks.

    Use when a downstream pass needs key-partitioned (not key-complete)
    placement — e.g. per-codec decode passes over the 80%-pcm_s16le corpus.
    Operators that need ALL rows of a key in one task (sessionization)
    must instead aggregate partially per salt lane and merge across lanes
    (see ``tree_merge`` / the two-phase build, which never key-shuffle raw
    rows at all).
    """
    salted = with_salt(df, buckets)
    cols = [F.col(c) for c in key_cols] + [F.col("__salt")]
    if num_partitions:
        return salted.repartition(num_partitions, *cols).drop("__salt")
    return salted.repartition(*cols).drop("__salt")


def partition_histogram(df: DataFrame) -> list[int]:
    """Rows per task after the current partitioning — the skew measurement
    used by tests and bench (tiny result: P longs)."""
    counts = (df.withColumn("__pid", F.spark_partition_id())
                .groupBy("__pid").count().collect())
    by_pid = {r["__pid"]: r["count"] for r in counts}
    return [by_pid.get(i, 0) for i in range(max(by_pid) + 1 if by_pid else 0)]


def tree_merge(partials: DataFrame, spec: SynopsisSpec, size_us: int,
               fanout: int = 32) -> DataFrame:
    """Two-level treeReduce-style combine of partial synopses.

    Level 1 merges each (window, stratum)'s partials within ``fanout``
    salt lanes (lane = pid % fanout — deterministic, so merge order and
    therefore sampler output is stable across cluster sizes); level 2
    merges the ≤fanout lane results. Shuffle volume is unchanged (sketch
    blobs only); per-task fan-in drops from P to max(fanout, P/fanout).
    """
    lanes = partials.withColumn(
        "__lane", F.pmod(F.col("__pid"), F.lit(fanout)).cast("long"))

    def lane_merger(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        if spec is not None:
            spec.ensure_registered()
        syn = _merge_group(pdf)
        return pd.DataFrame({
            "__w": [int(key[0])], "__st": [key[1]],
            # lane id becomes the pid for the deterministic level-2 sort
            "__pid": [int(key[2])],
            "state": [syn.to_bytes()], "n": [int(syn.n_processed)]})

    level1 = (lanes.groupBy("__w", "__st", "__lane")
              .applyInPandas(lane_merger,
                             schema="__w long, __st string, __pid long, "
                                    "state binary, n long")
              .withColumnRenamed("__w", "__slice"))
    # level 2 reuses the standard final merger (sorts by pid = lane id)
    level1 = level1.withColumn("__w", F.col("__slice"))
    return (level1.groupBy("__w", "__st")
            .applyInPandas(_final_merger(size_us, spec), schema=_FINAL_SCHEMA))


def build_batch_tree(df: DataFrame, spec: SynopsisSpec,
                     fanout: int = 32) -> DataFrame:
    """``build_batch`` with the two-level tree merge (tumbling/sliding only).

    Identical output rows to ``build_batch`` (deterministic lane → pid
    ordering); use when partition count × windows makes the single-level
    merge fan-in the bottleneck (≳256 partials per window×stratum).
    """
    win = spec.window
    if isinstance(win, Tumbling):
        slice_us, size_us = win.slice_us, win.size_us
    elif isinstance(win, Sliding):
        slice_us, size_us = win.slice_us, win.size_us
    else:
        raise ValueError("tree merge supports tumbling/sliding windows")

    work = _normalize(df, spec, slice_us)
    partials = work.mapInPandas(_partial_builder(spec), schema=_PARTIAL_SCHEMA)

    if isinstance(win, Sliding):
        slide, size, sl = win.slide_us, win.size_us, win.slice_us
        first_w = (-F.floor((F.lit(size) - F.lit(sl) - F.col("__slice"))
                            / F.lit(slide)) * F.lit(slide)).cast("long")
        last_w = (F.floor(F.col("__slice") / F.lit(slide)) * F.lit(slide)).cast("long")
        wins = F.when(first_w <= last_w,
                      F.sequence(first_w, last_w, F.lit(slide).cast("long"))
                      ).otherwise(F.array().cast("array<long>"))
        partials = partials.withColumn("__w", F.explode(wins))
    else:
        partials = partials.withColumn("__w", F.col("__slice"))

    return tree_merge(partials, spec, size_us, fanout)
