"""Stateful stream-stream join: audio clips ⋈ transcripts.

North-rule surface: the engine must support a *stateful join* between two
live streams. The canonical workload is the input table split at the
producer into an audio stream (clip_id, bytes, sr_hz, dur_ms, codec,
audio_ts) and a transcription stream (clip_id, transcript, txt_ts) — the
transcription service lags the audio by a bounded, variable delay — joined
back into the synopsis pipeline's input shape.

Spark-first: a watermarked stream-stream inner equi-join on ``clip_id``
with an event-time range predicate bounding the transcript lag::

    audio.withWatermark(audio_ts, d₁)
      .join(text.withWatermark(txt_ts, d₂),
            [clip_id equal, txt_ts ∈ [audio_ts, audio_ts + max_lag]], "inner")

The range predicate is what makes the join *bounded*-stateful: Spark's
symmetric hash join keeps each audio row only until
watermark > audio_ts + max_lag + d and each transcript row until its match
window closes, then evicts from the state store — state is
O(in-flight clips), independent of stream length. Without it, both sides
would be retained forever (unbounded state — the classic 10^12-row
failure). Left-outer variant emits audio rows whose transcript never
arrived (transcript NULL) after the lag bound expires, so clips are never
silently lost.

Join-key skew: clip_id is unique per row, so the equi-join key is uniform
by construction — no salting needed here (contrast codec/sr_hz in
skew.py). The state-store shuffle partitions by clip_id hash.

Reference analogue: Condor's only join is the broadcast query-join
(``evaluator/ApproximateDataAnalytics.java:39-51``); the stateful data-data
join is new surface required by the north rule, expressed entirely with
built-in operators (whole-stage codegen; no Python in the hot path).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

AUDIO_COLS = ("clip_id", "bytes", "sr_hz", "dur_ms", "codec")


def split_streams(clips: DataFrame, lag: str = "5 seconds",
                  lag_seed_col: str = "dur_ms"):
    """Deterministically split the fixture table into the two producer
    streams (for tests/bench): transcript events lag audio events by
    0..lag, derived from a stable column so any cluster size regenerates
    the same streams."""
    audio = clips.select(*AUDIO_COLS, F.col("ts").alias("audio_ts"))
    max_lag_us = int(pd.Timedelta(lag).total_seconds() * 1e6)
    text = clips.select(
        "clip_id", "transcript",
        F.timestamp_micros(
            F.unix_micros(F.col("ts"))
            + F.pmod(F.col(lag_seed_col).cast("long") * 7919, F.lit(max_lag_us))
        ).alias("txt_ts"))
    return audio, text


def lag_bounded_join(left: DataFrame, right: DataFrame, key: str,
                     left_ts: str, right_ts: str,
                     max_lag: str = "5 seconds",
                     watermark_delay: str = "10 seconds",
                     how: str = "inner") -> DataFrame:
    """Watermarked, state-bounded stream-stream equi-join on ``key`` with
    the event-time range predicate ``right_ts ∈ [left_ts, left_ts+max_lag]``.

    The range predicate is what bounds the join state (module docstring);
    works identically on batch DataFrames (Catalyst plans a regular join;
    the range predicate then only asserts the lag bound), so batch oracles
    can validate the same plan the stream runs.
    """
    is_streaming = left.isStreaming or right.isStreaming
    l = left.withWatermark(left_ts, watermark_delay) if is_streaming else left
    r = right.withWatermark(right_ts, watermark_delay) if is_streaming else right
    r_key = f"__r_{key}"
    r = r.withColumnsRenamed({key: r_key})
    cond = ((l[key] == r[r_key])
            & (r[right_ts] >= l[left_ts])
            & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {max_lag}")))
    return l.join(r, cond, how).drop(r_key)


def clip_transcript_join(audio: DataFrame, text: DataFrame,
                         max_lag: str = "5 seconds",
                         watermark_delay: str = "10 seconds",
                         how: str = "inner") -> DataFrame:
    """Watermarked, state-bounded stream-stream join on clip_id."""
    joined = lag_bounded_join(audio, text, key="clip_id",
                              left_ts="audio_ts", right_ts="txt_ts",
                              max_lag=max_lag, watermark_delay=watermark_delay,
                              how=how)
    return joined.select(*AUDIO_COLS, "transcript", "audio_ts", "txt_ts")


def asof_join(left: DataFrame, right: DataFrame, on,
              left_ts: str = "ts", right_ts: str = "ts",
              direction: str = "backward", tolerance=None,
              strict: bool = False, how: str = "left") -> DataFrame:
    """As-of join: for each left row, the single right row with the nearest
    ``right_ts`` at-or-before (``backward``) / at-or-after (``forward``)
    ``left_ts``, per join key — the time-series lookup Spark has no builtin
    for (pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics; the
    reference has no data-data join at all, its only join is the broadcast
    query-join in ``evaluator/ApproximateDataAnalytics.java:39-51``).

    Spark-first plan — a union merge, not a join: both sides are unioned
    with a side marker, shuffled ONCE on the key, sorted within partitions
    by (ts, side), and each left row picks up the running
    ``last(right row, ignorenulls)`` window value. That is exactly a
    merge-join as-of: one Exchange + one sort, no range-join explosion, no
    per-row Python, state streamed by the sort (never materialized per
    key), so a 10^12-row side costs the same shuffle a groupBy on the key
    would. A hot key serializes into one task's sort — pre-aggregate the
    right side or split the key upstream if that bites (skew.py patterns).
    The right payload travels as ONE struct so the match is row-wise, like
    ``merge_asof``: a matched right row whose payload column is NULL yields
    NULL (``last(ignorenulls)`` per column would instead fill through to an
    older right row's value for just that column).

    ``on`` may be a column name or list of names; right payload columns
    must not collide with left columns. The matched right timestamp is
    emitted under its ``right_ts`` name — or ``{right_ts}_right`` when
    both sides name it the same (the defaults), merge_asof-style.
    ``tolerance`` (an INTERVAL string for timestamps, or
    a numeric for numeric ts columns) nulls out matches farther than the
    bound; ``strict=True`` excludes ties (``<`` instead of ``<=``).
    ``how='inner'`` drops unmatched left rows instead of keeping them with
    null payload.
    """
    from pyspark.sql.types import StructField, StructType
    from pyspark.sql.window import Window

    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left/inner: {how}")
    payload = [c for c in right.columns if c not in (*keys, right_ts)]
    rts_out = right_ts if right_ts != left_ts else f"{right_ts}_right"
    clash = set(payload + [rts_out]) & set(left.columns)
    if clash:
        raise ValueError(f"right columns collide with left: {sorted(clash)} "
                         "— rename before joining")
    left_only = [c for c in left.columns if c not in keys and c != left_ts]

    # side ordering at equal ts decides tie semantics: the window scans
    # rows ≤ current, so a right row sorting BEFORE the left row is
    # visible to it (inclusive match) and one sorting AFTER is not
    r_side, l_side = (2, 1) if strict else (0, 1)
    match_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in payload]
        + [StructField("__rts", right.schema[right_ts].dataType)])
    l2 = left.select(
        *keys, F.col(left_ts).alias("__ts"), F.lit(l_side).alias("__side"),
        F.col(left_ts).alias("__lts"), *left_only,
        F.lit(None).cast(match_type).alias("__match"))
    r2 = right.select(
        *keys, F.col(right_ts).alias("__ts"), F.lit(r_side).alias("__side"),
        F.lit(None).cast(left.schema[left_ts].dataType).alias("__lts"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_only],
        F.struct(*[F.col(c) for c in payload],
                 F.col(right_ts).alias("__rts")).alias("__match"))
    ts_ord = F.col("__ts").asc() if direction == "backward" \
        else F.col("__ts").desc()
    w = (Window.partitionBy(*keys).orderBy(ts_ord, F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = l2.unionByName(r2).select(
        *keys, "__ts", "__side", "__lts", *left_only,
        F.last("__match", ignorenulls=True).over(w).alias("__match"))
    out = matched.filter(F.col("__side") == l_side)
    if tolerance is not None:
        tol = (F.expr(f"INTERVAL {tolerance}") if isinstance(tolerance, str)
               else F.lit(tolerance))
        gap = (F.col("__ts") - F.col("__match.__rts")
               if direction == "backward"
               else F.col("__match.__rts") - F.col("__ts"))
        ok = F.col("__match.__rts").isNotNull() & (gap <= tol)
        out = out.withColumn("__match", F.when(ok, F.col("__match")))
    if how == "inner":
        out = out.filter(F.col("__match.__rts").isNotNull())
    return out.select(*keys, F.col("__lts").alias(left_ts), *left_only,
                      *[F.col(f"__match.{c}").alias(c) for c in payload],
                      F.col("__match.__rts").alias(rts_out))


def run_join_to_parquet(spark, audio_dir: str, text_dir: str, out_dir: str,
                        checkpoint_dir: str, max_lag: str = "5 seconds",
                        watermark_delay: str = "10 seconds",
                        max_files_per_trigger: int = 2):
    """Wire the join from two parquet stream sources to an append sink."""
    a_schema = spark.read.parquet(audio_dir).schema
    t_schema = spark.read.parquet(text_dir).schema
    audio = (spark.readStream.schema(a_schema)
             .option("maxFilesPerTrigger", max_files_per_trigger)
             .parquet(audio_dir))
    text = (spark.readStream.schema(t_schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(text_dir))
    joined = clip_transcript_join(audio, text, max_lag, watermark_delay)
    return (joined.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())
