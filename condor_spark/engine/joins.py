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
