"""applyInPandasWithState streaming path + stateful stream-stream join."""

import glob
import os

import pandas as pd
import pyspark.sql.functions as F
import pytest

from condor_spark import fixtures
from condor_spark.engine import evaluate as ev
from condor_spark.engine.builder import SynopsisSpec, build_batch
from condor_spark.engine.joins import (clip_transcript_join,
                                       run_join_to_parquet, split_streams)
from condor_spark.engine.stateful import StatefulSynopsisStream
from condor_spark.engine.windows import Tumbling

SF = "/root/testdata/sf0.001"


def _spec():
    return SynopsisSpec(kind="countmin", params=dict(width=4096, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling("1 day"))


def _flush_file(spark, src, name, ts):
    (spark.createDataFrame(
        pd.DataFrame({"event_id": [0], "ts": [pd.Timestamp(ts)],
                      "user_id": [0], "event_type": ["flush"],
                      "value": [0.0], "props": ["{}"]}),
        schema=spark.read.parquet(src).schema)
     .coalesce(1).write.mode("append").parquet(src))


def _replay_in_order(spark, df, src: str, n_chunks: int) -> None:
    """Write df as n_chunks parquet files in event-time order with strictly
    increasing mtimes. FileStreamSource replays files mtime-ordered; a single
    bulk write gives identical mtimes (arbitrary replay order), which makes
    early events late w.r.t. the watermark — a replay-harness artifact, not
    an engine property."""
    import numpy as np
    pdf = df.toPandas().sort_values("ts").reset_index(drop=True)
    chunks = np.array_split(pdf, n_chunks)
    base = 1_000_000_000
    for i, chunk in enumerate(chunks):
        before = set(glob.glob(os.path.join(src, "*.parquet")))
        (spark.createDataFrame(chunk, schema=df.schema)
         .coalesce(1).write.mode("append").parquet(src))
        for f in set(glob.glob(os.path.join(src, "*.parquet"))) - before:
            os.utime(f, (base + i, base + i))


def test_stateful_matches_batch(spark, tmp_path):
    """Closed windows emitted by the applyInPandasWithState path carry the
    same synopsis content as a batch build over the same rows, each window
    exactly once."""
    src = str(tmp_path / "src")
    events = spark.read.parquet(f"{SF}/events.parquet")
    os.makedirs(src, exist_ok=True)
    _replay_in_order(spark, events, src, 5)

    job = StatefulSynopsisStream(_spec(), watermark_delay="1 hour")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = job.start(spark, src, out_dir, ckpt, max_files_per_trigger=1)
    q.awaitTermination(300)

    # resume with two far-future flush batches: the first fires everything
    # pending at the old watermark, the second fires the rest (watermark now
    # past every real window end + delay)
    _flush_file(spark, src, "flush1", "2024-06-01")
    _flush_file(spark, src, "flush2", "2024-07-01")
    q = job.start(spark, src, out_dir, ckpt, max_files_per_trigger=1)
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir).filter("window_start < '2024-05-01'")
    # exactly once per (window, stratum)
    dup = (got.groupBy("window_start", "stratum").count()
           .filter("count > 1").count())
    assert dup == 0

    keys = list(range(100))
    s = sorted((str(r["window_start"]), r["key"], r["est_count"])
               for r in ev.frequency_estimates(got, keys).collect())
    b = sorted((str(r["window_start"]), r["key"], r["est_count"])
               for r in ev.frequency_estimates(build_batch(events, _spec()),
                                               keys).collect())
    assert s == b


def test_stateful_resume_from_checkpoint(spark, tmp_path):
    """Kill after the first files, resume with the rest: the union of emitted
    windows still matches batch, no duplicates (checkpointed state store)."""
    src1 = str(tmp_path / "a")
    events = spark.read.parquet(f"{SF}/events.parquet")
    os.makedirs(src1, exist_ok=True)
    _replay_in_order(spark, events.filter(F.col("ts") < "2024-01-16"), src1, 3)

    job = StatefulSynopsisStream(_spec(), watermark_delay="1 hour")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = job.start(spark, src1, out_dir, ckpt, max_files_per_trigger=1)
    q.awaitTermination(300)  # "crash" here: stream stopped mid-input

    _replay_in_order(spark, events.filter(F.col("ts") >= "2024-01-16"), src1, 3)
    _flush_file(spark, src1, "flush1", "2024-06-01")
    _flush_file(spark, src1, "flush2", "2024-07-01")
    q = job.start(spark, src1, out_dir, ckpt, max_files_per_trigger=1)
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir).filter("window_start < '2024-05-01'")
    assert (got.groupBy("window_start", "stratum").count()
            .filter("count > 1").count()) == 0
    keys = list(range(100))
    s = sorted((str(r["window_start"]), r["key"], r["est_count"])
               for r in ev.frequency_estimates(got, keys).collect())
    b = sorted((str(r["window_start"]), r["key"], r["est_count"])
               for r in ev.frequency_estimates(build_batch(events, _spec()),
                                               keys).collect())
    assert s == b


def test_stateful_sessions_match_batch(spark, tmp_path):
    """Streaming session windows (gap-merged in applyInPandasWithState)
    emit exactly the batch sessionization result once all sessions close."""
    from condor_spark.engine.stateful import StatefulSessionStream
    from condor_spark.engine.windows import Session
    from condor_spark import fixtures

    events = spark.read.parquet(f"{SF}/events.parquet")
    spec = SynopsisSpec(kind="hll", params=dict(log_reg_num=4, seed=7),
                        column="event_id", ts_column="ts",
                        window=Session("30 minutes"), stratify_by="user_id")

    src = str(tmp_path / "src")
    fixtures.replay_in_order(spark, events, src, 5,
                             flush_ts=["2024-06-01", "2024-07-01"])
    job = StatefulSessionStream(spec, gap="30 minutes",
                                watermark_delay="1 hour")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = job.start(spark, src, out_dir, ckpt, max_files_per_trigger=1)
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir).filter("window_start < '2024-05-01'")
    s = sorted((str(r["window_start"]), str(r["window_end"]), r["stratum"], r["n"])
               for r in got.collect())
    b = sorted((str(r["window_start"]), str(r["window_end"]), r["stratum"], r["n"])
               for r in build_batch(events, spec).collect())
    assert s == b
    # no duplicate emissions
    assert len(s) == len({x[:3] for x in s})


def test_stateful_count_windows_match_batch(spark, tmp_path):
    """Streaming count windows emit the same full windows as the batch
    global-order build (single stratum → sequential semantics, matching the
    reference's par=1 OrderAndIndex route)."""
    from condor_spark.engine.builder import build_count_windows
    from condor_spark.engine.stateful import StatefulCountWindowStream
    from condor_spark.engine.windows import CountTumbling
    from condor_spark import fixtures

    events = spark.read.parquet(f"{SF}/events.parquet")
    spec = SynopsisSpec(kind="hll", params=dict(log_reg_num=8, seed=7),
                        column="event_id", ts_column="ts",
                        window=CountTumbling(300), tiebreak_column="event_id")

    src = str(tmp_path / "src")
    fixtures.replay_in_order(spark, events, src, 5)
    job = StatefulCountWindowStream(spec, count=300)
    q = job.start(spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt"),
                  max_files_per_trigger=1)
    q.awaitTermination(300)

    from condor_spark.engine import evaluate as ev
    got = spark.read.parquet(str(tmp_path / "out"))
    batch = build_count_windows(events, spec).filter(F.col("n") == 300)
    s = sorted((r["window_id"], r["lo_idx"], r["hi_idx"], r["n"],
                bytes(r["state"]))
               for r in got.collect())
    b = sorted((r["window_id"], r["lo_idx"], r["hi_idx"], r["n"],
                bytes(r["state"]))
               for r in batch.collect())
    assert [x[:4] for x in s] == [x[:4] for x in b]
    assert s == b  # byte-identical synopsis content (same row→window routing)


def test_stateful_ordered_wavelet_matches_exact(spark, tmp_path):
    """Streaming order-based wavelet build: slices emitted every N elements
    (trailing partial flushed by the cutoff sentinel) answer range sums
    exactly like the batch order; stratified keys slice independently."""
    from condor_spark.engine.stateful import StatefulOrderedStream

    events = spark.read.parquet(f"{SF}/events.parquet")
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    cutoff = pd.Timestamp(max_ts) + pd.Timedelta(days=1)

    src = str(tmp_path / "src")
    fixtures.replay_in_order(spark, events, src, 5,
                             flush_ts=[cutoff + pd.Timedelta(days=1),
                                       cutoff + pd.Timedelta(days=2)])
    # 700 does NOT divide any stratum's row count → every stratum's final
    # partial slice must be timer-flushed or totals come back short
    spec = SynopsisSpec(kind="wavelet", params=dict(size=1 << 14),
                        column="value", ts_column="ts",
                        tiebreak_column="event_id", stratify_by="event_type")
    job = StatefulOrderedStream(spec, slice_count=700,
                                flush_cutoff_us=int(cutoff.value // 1000))
    q = job.start(spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt"),
                  max_files_per_trigger=1)
    q.awaitTermination(300)

    slices = spark.read.parquet(str(tmp_path / "out"))
    n_total = events.count()
    assert slices.groupBy().sum("length").collect()[0][0] == n_total

    ranges = [(0, 137), (100, 450), (0, 1 << 40)]
    got = {(r["stratum"], r["lo_idx"], r["hi_idx"]): r["range_sum"]
           for r in ev.wavelet_range_sums_stratified(slices, ranges).collect()}
    exact = (events.select(
        "event_type", "value",
        F.row_number().over(
            __import__("pyspark").sql.Window.partitionBy("event_type")
            .orderBy("ts", "event_id")).alias("rn")).toPandas())
    for (st, lo, hi), v in got.items():
        sub = exact[(exact["event_type"] == st)
                    & (exact["rn"] - 1 >= lo) & (exact["rn"] - 1 < hi)]
        assert abs(v - sub["value"].sum()) < 1e-6, (st, lo, hi)


N_CLIPS = 300


def test_stream_stream_join(spark, tmp_path):
    """Watermarked clip⋈transcript join recovers every pair with the right
    transcript; state is bounded by the lag predicate."""
    clips = fixtures.audio_clips(spark, N_CLIPS, num_partitions=4).cache()
    audio, text = split_streams(clips, lag="5 seconds")
    a_dir, t_dir = str(tmp_path / "audio"), str(tmp_path / "text")
    audio.repartitionByRange(3, "audio_ts").write.parquet(a_dir)
    text.repartitionByRange(3, "txt_ts").write.parquet(t_dir)

    out, ckpt = str(tmp_path / "joined"), str(tmp_path / "ckpt")
    q = run_join_to_parquet(spark, a_dir, t_dir, out, ckpt,
                            max_lag="5 seconds", watermark_delay="60 seconds")
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    assert got.count() == N_CLIPS
    # transcript equality per clip vs the source of truth
    mismatch = (got.alias("g")
                .join(clips.alias("c"), "clip_id")
                .filter("g.transcript <> c.transcript").count())
    assert mismatch == 0


def test_join_batch_parity(spark):
    """The same join plan on batch inputs returns identical pairs — batch
    oracle for the streaming join."""
    clips = fixtures.audio_clips(spark, 200, num_partitions=4)
    audio, text = split_streams(clips, lag="5 seconds")
    joined = clip_transcript_join(audio, text, max_lag="5 seconds")
    assert joined.count() == 200
    assert joined.select("clip_id").distinct().count() == 200


def test_stateful_ordered_reorder_buffer_repairs_disorder(spark, tmp_path):
    """Cross-batch bounded disorder is repaired EXACTLY by the watermark
    reorder buffer (the priority-queue analogue of
    NonMergeableSynopsisAggregator.java:114-128): the same data replayed
    in order and with bounded disorder produce byte-identical slices."""
    from condor_spark.engine.stateful import StatefulOrderedStream

    events = spark.read.parquet(f"{SF}/events.parquet")
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    cutoff = pd.Timestamp(max_ts) + pd.Timedelta(days=1)
    flush = [cutoff + pd.Timedelta(days=1), cutoff + pd.Timedelta(days=2)]
    spec = SynopsisSpec(kind="wavelet", params=dict(size=1 << 14),
                        column="value", ts_column="ts",
                        tiebreak_column="event_id", stratify_by="event_type")

    outs = []
    for tag, writer in (
            ("ord", lambda s: fixtures.replay_in_order(
                spark, events, s, 5, flush_ts=flush)),
            ("dis", lambda s: fixtures.replay_unordered(
                spark, events, s, 5, max_delay="1 hour", flush_ts=flush))):
        src = str(tmp_path / f"src_{tag}")
        writer(src)
        job = StatefulOrderedStream(spec, slice_count=700,
                                    flush_cutoff_us=int(cutoff.value // 1000),
                                    watermark_delay="2 hours")
        q = job.start(spark, src, str(tmp_path / f"out_{tag}"),
                      str(tmp_path / f"ckpt_{tag}"), max_files_per_trigger=1)
        q.awaitTermination(300)
        rows = sorted((r["stratum"], r["slice_idx"], r["length"],
                       bytes(r["state"]))
                      for r in spark.read.parquet(
                          str(tmp_path / f"out_{tag}")).collect())
        outs.append(rows)
    assert outs[0] == outs[1]
    assert sum(r[2] for r in outs[0]) == events.count()


def test_stateful_ordered_unwatermarked_disorder_raises(spark, tmp_path):
    """Without a watermark there is no reorder buffer; cross-batch disorder
    must fail loudly (on_disorder='error' default) instead of silently
    building slices out of order."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from condor_spark.engine.stateful import StatefulOrderedStream

    events = spark.read.parquet(f"{SF}/events.parquet").limit(3000)
    src = str(tmp_path / "src")
    fixtures.replay_unordered(spark, events, src, 4, max_delay="6 hours")
    spec = SynopsisSpec(kind="wavelet", params=dict(size=1 << 14),
                        column="value", ts_column="ts",
                        tiebreak_column="event_id")
    job = StatefulOrderedStream(spec, slice_count=500)  # no cutoff
    q = job.start(spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt"),
                  max_files_per_trigger=1)
    with pytest.raises(StreamingQueryException,
                       match="older than a previous batch"):
        q.awaitTermination(300)


def test_stateful_ordered_disorder_count_is_observable(spark, tmp_path):
    """on_disorder='count' must surface the disorder, not just park it in
    state: every emitted slice row carries the stratum's cumulative
    n_disordered, so the sinked output is queryable for it."""
    from condor_spark.engine.stateful import StatefulOrderedStream

    events = spark.read.parquet(f"{SF}/events.parquet").limit(3000)
    src = str(tmp_path / "src")
    fixtures.replay_unordered(spark, events, src, 4, max_delay="6 hours")
    spec = SynopsisSpec(kind="wavelet", params=dict(size=1 << 14),
                        column="value", ts_column="ts",
                        tiebreak_column="event_id")
    job = StatefulOrderedStream(spec, slice_count=500, on_disorder="count")
    q = job.start(spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt"),
                  max_files_per_trigger=1)
    q.awaitTermination(300)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert "n_disordered" in out.columns
    assert out.agg(F.max("n_disordered")).first()[0] > 0


def test_stateful_kmv_matches_batch_bytes(spark, tmp_path):
    """KMV through the applyInPandasWithState closed-window path unchanged
    (commutative kind, one tree of state per window): closed-window blobs
    are BYTE-identical to the batch build — KMV's canonical sorted min-k
    state makes the stateful-vs-batch law checkable at the byte level."""
    src = str(tmp_path / "src")
    events = spark.read.parquet(f"{SF}/events.parquet")
    os.makedirs(src, exist_ok=True)
    _replay_in_order(spark, events, src, 5)
    spec = SynopsisSpec(kind="kmv", params=dict(k=256, seed=7),
                        column="user_id", ts_column="ts",
                        window=Tumbling("1 day"))
    job = StatefulSynopsisStream(spec, watermark_delay="1 hour")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = job.start(spark, src, out_dir, ckpt, max_files_per_trigger=1)
    q.awaitTermination(300)
    _flush_file(spark, src, "flush1", "2024-06-01")
    _flush_file(spark, src, "flush2", "2024-07-01")
    q = job.start(spark, src, out_dir, ckpt, max_files_per_trigger=1)
    q.awaitTermination(300)

    got = {str(r["window_start"]): bytes(r["state"])
           for r in spark.read.parquet(out_dir)
           .filter("window_start < '2024-05-01'").collect()}
    want = {str(r["window_start"]): bytes(r["state"])
            for r in build_batch(events, spec).collect()
            if str(r["window_start"]) < "2024-05-01"}
    assert got == want and got
