"""Keyed streaming synopsis state via ``applyInPandasWithState``.

The second streaming execution strategy (alongside the ``foreachBatch``
snapshot sink in ``streaming.py``): the two-phase treeReduce-style combine
runs *inside* Spark's state store —

  phase 1 (stateless, per micro-batch): ``mapInPandas`` partial — one sketch
    blob per (slice, stratum) per input partition; raw rows never shuffle,
    exactly the batch engine's property (builder.py). Slices are expanded
    into their sliding windows JVM-side before the shuffle.
  phase 2 (stateful): ``groupBy(window, stratum).applyInPandasWithState`` —
    each key's ``GroupState`` holds one running sketch blob; arriving
    partials merge into it (treeReduce: the state is the reduction root,
    partials are already partition-local reductions). On event-time timeout
    (watermark ≥ window_end + delay) the finished ``WindowedSynopsis`` row
    is emitted exactly once and the state removed.

This is the engine's analogue of Condor's incremental window accumulation
(``SynopsisAggregator`` add/merge inside Flink windows,
``flinkScottyConnector/.../compute/flink/SynopsisAggregator.java:66-140``)
— but with Spark's checkpointed state store giving fault-tolerant resume
for free (the foreachBatch path manages its own ledger instead; both are
exposed because the snapshot sink supports ad-hoc queries over *open*
windows, while this path emits only *closed* windows downstream).

State size is O(open windows × strata × sketch bytes), independent of row
count; shuffle volume is O(partitions × slices × strata) blobs per batch —
the 10^12-row posture holds.

Late data: rows later than the watermark delay arrive as partials whose
window already fired; ``GroupState.getCurrentWatermarkMs`` identifies them
and they are dropped (counted per-key before drop), matching the
reference's watermark-drop semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType, TimestampType)

from ..synopsis.base import Synopsis
from .builder import (_PARTIAL_SCHEMA, SynopsisSpec, _normalize,
                      _partial_builder, _update)
from .windows import Sliding, Tumbling, duration_us

_OUT_SCHEMA = StructType([
    StructField("window_start", TimestampType()),
    StructField("window_end", TimestampType()),
    StructField("stratum", StringType()),
    StructField("state", BinaryType()),
    StructField("n", LongType()),
])
_STATE_SCHEMA = StructType([
    StructField("blob", BinaryType()),
    StructField("n", LongType()),
])


@dataclass
class StatefulSynopsisStream:
    """Builds the streaming plan; ``transform(stream_df)`` returns the
    closed-window synopsis stream (append mode)."""
    spec: SynopsisSpec
    watermark_delay: str = "10 seconds"

    def transform(self, stream_df: DataFrame) -> DataFrame:
        spec, win = self.spec, self.spec.window
        if isinstance(win, (Tumbling, Sliding)):
            slice_us, size_us = win.slice_us, win.size_us
        else:
            raise ValueError("stateful path supports tumbling/sliding windows")
        delay = self.watermark_delay
        delay_us = duration_us(delay)

        # phase-1 partials are stateless, so the query's single watermark is
        # defined downstream on the partials' slice time (redefining a
        # watermark twice in one query is disallowed). wm = max(slice_start)
        # − delay ≤ raw watermark, i.e. strictly conservative: windows fire
        # no earlier than with a raw-row watermark.
        work = _normalize(stream_df, spec, slice_us)
        partials = work.mapInPandas(_partial_builder(spec), schema=_PARTIAL_SCHEMA)

        if isinstance(win, Sliding):
            slide, size, sl = win.slide_us, win.size_us, win.slice_us
            first_w = (-F.floor((F.lit(size) - F.lit(sl) - F.col("__slice"))
                                / F.lit(slide)) * F.lit(slide)).cast("long")
            last_w = (F.floor(F.col("__slice") / F.lit(slide))
                      * F.lit(slide)).cast("long")
            wins = F.when(first_w <= last_w,
                          F.sequence(first_w, last_w, F.lit(slide).cast("long"))
                          ).otherwise(F.array().cast("array<long>"))
            partials = partials.withColumn("__w", F.explode(wins))
        else:
            partials = partials.withColumn("__w", F.col("__slice"))

        # re-anchor the watermark for the stateful operator on the partials'
        # event time (max ts of a slice = slice end − 1µs ≤ raw max, so the
        # computed watermark is never ahead of the raw one)
        partials = (partials
                    .withColumn("__evt", (F.col("__slice") / 1e6).cast("timestamp"))
                    .withWatermark("__evt", delay))

        def update(key: tuple, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
            spec.ensure_registered()
            w_us, stratum = int(key[0]), key[1]
            if state.hasTimedOut:
                blob, n = state.get
                state.remove()
                yield pd.DataFrame({
                    "window_start": [pd.Timestamp(w_us, unit="us")],
                    "window_end": [pd.Timestamp(w_us + size_us, unit="us")],
                    "stratum": [stratum], "state": [blob], "n": [int(n)]})
                return

            wm_us = state.getCurrentWatermarkMs() * 1000
            if not state.exists and wm_us > 0 and w_us + size_us + delay_us <= wm_us:
                return  # late partial for an already-emitted window: drop

            rows = [pdf for pdf in pdfs if not pdf.empty]
            if not rows:
                return
            pdf = (pd.concat(rows, ignore_index=True)
                   .sort_values(["__pid", "__slice"], kind="stable"))
            syn = None
            if state.exists:
                blob, _n = state.get
                syn = Synopsis.from_bytes(blob)
            for b in pdf["state"]:
                nxt = Synopsis.from_bytes(b)
                syn = nxt if syn is None else syn.merge(nxt)
            state.update((syn.to_bytes(), int(syn.n_processed)))
            # fire once the watermark passes window_end (+delay slack for
            # stragglers admitted by the raw watermark); Spark requires the
            # timeout to sit strictly beyond the current watermark
            fire_us = max(w_us + size_us + delay_us, wm_us + 1_000)
            state.setTimeoutTimestamp(fire_us // 1000)
            return

        return partials.groupBy("__w", "__st").applyInPandasWithState(
            update, _OUT_SCHEMA, _STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout)

    def start(self, spark, source_dir: str, out_dir: str, checkpoint_dir: str,
              schema=None, max_files_per_trigger: int = 1,
              available_now: bool = True, transform=None):
        """Wire source → transform → parquet append sink (exactly-once via
        Spark's own file-sink transaction log + checkpointed state).
        ``transform`` optionally rewrites the raw stream first (e.g. audio
        decode → feature rows, executor-side per micro-batch)."""
        if schema is None:
            schema = spark.read.parquet(source_dir).schema
        reader = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", max_files_per_trigger)
                  .parquet(source_dir))
        if transform is not None:
            reader = transform(reader)
        out = self.transform(reader)
        writer = (out.writeStream.format("parquet")
                  .option("path", out_dir)
                  .option("checkpointLocation", checkpoint_dir)
                  .outputMode("append"))
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


@dataclass
class StatefulSessionStream:
    """Streaming session windows with synopsis state (the trickiest
    streaming-state piece per SURVEY.md §7.3; Scotty supports sessions,
    ``SynopsisBuilder.java:335-337`` — here per-key session state lives in
    Spark's checkpointed state store).

    Two-phase like everything else in this engine:

      phase 1 (stateless ``mapInPandas``): partition-local *mini-sessions*
        per stratum — rows sorted by ts, split where the gap exceeds
        ``gap``; each mini-session is (stratum, first_ts, last_ts, sketch
        blob, n). Only these blobs shuffle, never raw rows — hot strata
        (codec skew) cannot pile raw rows onto one task.
      phase 2 (``applyInPandasWithState`` keyed by stratum): gap-merge of
        mini-sessions into the per-key open-session list (interval merge:
        two sessions coalesce iff their ts-span gap ≤ ``gap``; synopsis
        blobs merge — associative, so partition boundaries and batch
        boundaries are invisible in the result). A session closes when the
        watermark passes last_ts + gap + delay; closed sessions are emitted
        (append) and dropped from state. Event-time timeout flushes
        sessions for keys that stop receiving data.

    Session semantics match the batch path (builder._build_session) and
    Spark's ``session_window``: window = [first_ts, last_ts + gap).
    """
    spec: SynopsisSpec
    gap: str = "30 minutes"
    watermark_delay: str = "10 seconds"

    def transform(self, stream_df: DataFrame) -> DataFrame:
        import pickle

        spec = self.spec
        gap_us = duration_us(self.gap)
        delay_us = duration_us(self.watermark_delay)

        work = _normalize(stream_df, spec, None)

        def mini_sessions(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import numpy as np
            parts = [pdf for pdf in batches if not pdf.empty]
            if not parts:
                return
            pdf = pd.concat(parts, ignore_index=True)
            rows = []
            for st, sub in pdf.groupby("__st", sort=False, dropna=False):
                sub = sub.sort_values("__ts", kind="stable")
                ts = sub["__ts"].to_numpy()
                breaks = np.flatnonzero(np.diff(ts) > gap_us) + 1
                bounds = np.concatenate([[0], breaks, [ts.shape[0]]])
                for i in range(bounds.size - 1):
                    lo, hi = int(bounds[i]), int(bounds[i + 1])
                    syn = spec.make_synopsis()
                    _update(syn, spec, sub.iloc[lo:hi])
                    rows.append((None if pd.isna(st) else st, int(ts[lo]),
                                 int(ts[hi - 1]), syn.to_bytes(),
                                 int(syn.n_processed)))
            if rows:
                yield pd.DataFrame(rows, columns=["__st", "first_us", "last_us",
                                                  "state", "n"])

        minis = work.mapInPandas(
            mini_sessions,
            schema="__st string, first_us long, last_us long, state binary, n long")
        minis = (minis
                 .withColumn("__evt", (F.col("last_us") / 1e6).cast("timestamp"))
                 .withWatermark("__evt", self.watermark_delay))

        def update(key: tuple, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
            spec.ensure_registered()
            stratum = key[0]
            sessions: list = []  # [first_us, last_us, blob, n], sorted
            if state.exists:
                sessions = pickle.loads(state.get[0])

            if not state.hasTimedOut:
                rows = [pdf for pdf in pdfs if not pdf.empty]
                if rows:
                    pdf = pd.concat(rows, ignore_index=True)
                    incoming = [[int(r.first_us), int(r.last_us), r.state, int(r.n)]
                                for r in pdf.itertuples(index=False)]
                    sessions = _gap_merge(sessions + incoming, gap_us)

            wm_us = state.getCurrentWatermarkMs() * 1000
            closed = [s for s in sessions if s[1] + gap_us + delay_us <= wm_us]
            kept = [s for s in sessions if s[1] + gap_us + delay_us > wm_us]
            if kept:
                state.update((pickle.dumps(kept),))
                fire_us = max(min(s[1] for s in kept) + gap_us + delay_us,
                              wm_us + 1_000)
                state.setTimeoutTimestamp(fire_us // 1000)
            elif state.exists:
                state.remove()
            if closed:
                yield pd.DataFrame({
                    "window_start": [pd.Timestamp(s[0], unit="us") for s in closed],
                    "window_end": [pd.Timestamp(s[1] + gap_us, unit="us")
                                   for s in closed],
                    "stratum": [stratum] * len(closed),
                    "state": [s[2] for s in closed],
                    "n": [int(s[3]) for s in closed]})

        return minis.groupBy("__st").applyInPandasWithState(
            update, _OUT_SCHEMA, StructType([StructField("blob", BinaryType())]),
            "append", GroupStateTimeout.EventTimeTimeout)

    def start(self, spark, source_dir: str, out_dir: str, checkpoint_dir: str,
              schema=None, max_files_per_trigger: int = 1,
              available_now: bool = True):
        if schema is None:
            schema = spark.read.parquet(source_dir).schema
        reader = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", max_files_per_trigger)
                  .parquet(source_dir))
        out = self.transform(reader)
        writer = (out.writeStream.format("parquet")
                  .option("path", out_dir)
                  .option("checkpointLocation", checkpoint_dir)
                  .outputMode("append"))
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


_COUNT_OUT_SCHEMA = StructType([
    StructField("window_id", LongType()),
    StructField("lo_idx", LongType()),
    StructField("hi_idx", LongType()),
    StructField("stratum", StringType()),
    StructField("state", BinaryType()),
    StructField("n", LongType()),
])


@dataclass
class StatefulCountWindowStream:
    """Streaming count-based tumbling windows (the reference's
    ``keyBy.countWindow``, ``SynopsisBuilder.java:219-221``): per stratum,
    a synopsis over every ``count`` consecutive elements, emitted as soon
    as the window fills.

    Count windows are inherently sequential per key — the reference routes
    them through a parallelism-1 ``OrderAndIndex`` stage
    (``processor/divide/OrderAndIndex.java:41-67``); here each stratum is
    one state-store key (parallel across strata, sequential within, which
    strictly dominates the reference's single global task). Rows are
    mini-batch-ordered by (ts, tiebreak) inside each micro-batch — the
    analogue of the reference's priority-queue miniBatch reordering
    (``NonMergeableSynopsisAggregator.java:114-128``); cross-batch order
    is the replay order. State = the currently-open window's sketch +
    running index; full windows leave state immediately (append mode), the
    trailing partial window stays open until more data arrives.
    """
    spec: SynopsisSpec
    count: int

    def transform(self, stream_df: DataFrame) -> DataFrame:
        spec, count = self.spec, int(self.count)

        work = _normalize(stream_df, spec, None)
        if "__tb" not in work.columns:
            work = work.withColumn("__tb", F.lit(0).cast("long"))

        def update(key: tuple, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
            spec.ensure_registered()
            stratum = key[0]
            if state.exists:
                blob, open_n, next_idx = state.get
                syn = Synopsis.from_bytes(blob) if blob is not None else None
            else:
                syn, open_n, next_idx = None, 0, 0

            out = []
            for pdf in pdfs:
                if pdf.empty:
                    continue
                pdf = pdf.sort_values(["__ts", "__tb"], kind="stable")
                pos = 0
                while pos < len(pdf):
                    take = min(count - open_n, len(pdf) - pos)
                    chunk = pdf.iloc[pos:pos + take]
                    if syn is None:
                        syn = spec.make_synopsis()
                    _update(syn, spec, chunk)
                    open_n += take
                    pos += take
                    if open_n == count:
                        wid = next_idx // count
                        out.append((wid, wid * count, (wid + 1) * count,
                                    stratum, syn.to_bytes(), count))
                        next_idx += count
                        syn, open_n = None, 0

            state.update((syn.to_bytes() if syn is not None else None,
                          int(open_n), int(next_idx)))
            if out:
                yield pd.DataFrame(out, columns=["window_id", "lo_idx", "hi_idx",
                                                 "stratum", "state", "n"])

        return work.groupBy("__st").applyInPandasWithState(
            update, _COUNT_OUT_SCHEMA,
            StructType([StructField("blob", BinaryType()),
                        StructField("open_n", LongType()),
                        StructField("next_idx", LongType())]),
            "append", GroupStateTimeout.NoTimeout)

    def start(self, spark, source_dir: str, out_dir: str, checkpoint_dir: str,
              schema=None, max_files_per_trigger: int = 1,
              available_now: bool = True):
        if schema is None:
            schema = spark.read.parquet(source_dir).schema
        reader = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", max_files_per_trigger)
                  .parquet(source_dir))
        out = self.transform(reader)
        writer = (out.writeStream.format("parquet")
                  .option("path", out_dir)
                  .option("checkpointLocation", checkpoint_dir)
                  .outputMode("append"))
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


_ORDERED_OUT_SCHEMA = StructType([
    StructField("stratum", StringType()),
    StructField("slice_idx", LongType()),
    StructField("length", LongType()),
    StructField("state", BinaryType()),
    StructField("n_disordered", LongType()),
])


@dataclass
class StatefulOrderedStream:
    """Streaming build for ORDER-BASED (non-mergeable) synopses — the
    ``NonMergeableSynopsisFunction`` /
    ``StratifiedNonMergeableSynopsisFunction`` analogue
    (``flinkScottyConnector/.../compute/scotty/NonMergeableSynopsisFunction
    .java``, ``StratifiedNonMergeableSynopsisFunction.java:50-66``): per
    stratum, values accumulate IN ORDER into the open slice; every
    ``slice_count`` elements the slice is finalized and emitted as
    (stratum, slice_idx, length, state). Emitted slices unify by
    concatenation (``SliceWaveletsManager`` /
    ``evaluate.wavelet_range_sums[_stratified]``), never merge — matching
    the batch ``build_ordered`` contract, so a full replay answers range
    queries identically to the batch build.

    Ordering — the analogue of the reference's priority-queue miniBatch
    reordering (``NonMergeableSynopsisAggregator.java:114-128``): when a
    watermark exists (``flush_cutoff_us`` set), rows BUFFER in state until
    the watermark passes them — only rows with ts strictly below the
    current watermark enter the open slice (Spark guarantees no later
    arrival can precede them), so any cross-batch disorder within the
    ``watermark_delay`` bound is repaired exactly (rows later than the
    bound are dropped by Spark's own watermark filter, the standard
    late-data semantics). Without a cutoff there is no watermark and rows
    are consumed in (batch, ts, tiebreak) order; cross-batch disorder is
    then DETECTED against the previous batch's max ts and handled per
    ``on_disorder``: "error" (default — order-based synopses are silently
    wrong under disorder, so fail loudly and tell the caller to set a
    cutoff/watermark) or "count" (proceed, and stamp the stratum's
    cumulative disorder count on every emitted slice row's
    ``n_disordered`` column — sinked with the slices, so the count is
    queryable, not just parked in state).

    ``flush_cutoff_us``: a finite replay declares its logical end of
    stream; rows at/after the cutoff are watermark-pushing sentinels
    (``fixtures.replay_in_order`` ``flush_ts`` rows), excluded from the
    data. Every key registers an event-time timer at the cutoff — when the
    sentinels drive the watermark past it, EVERY stratum's open partial
    slice flushes (a per-key sentinel row could only ever flush its own
    stratum). Without a cutoff the stream is treated as endless and the
    trailing partial slice stays open in state.

    CHECKPOINT COMPATIBILITY: the reorder buffer widened the GroupState
    row from 3 fields (blob, open_n, next_slice) to 6 (+ pending, max_ts,
    n_disordered). Spark state rows carry no version tag, so a checkpoint
    written by the 3-field schema CANNOT be resumed by this code (the
    first batch fails on the state unpack) — restart such jobs with a
    fresh checkpoint directory and replay the source (the sink is
    idempotent, so a replay converges to the same output).
    """
    spec: SynopsisSpec
    slice_count: int
    flush_cutoff_us: int | None = None
    watermark_delay: str = "1 hour"
    on_disorder: str = "error"

    def transform(self, stream_df: DataFrame) -> DataFrame:
        spec, count = self.spec, int(self.slice_count)
        cutoff = self.flush_cutoff_us
        on_disorder = self.on_disorder
        if on_disorder not in ("error", "count"):
            raise ValueError(f"on_disorder {on_disorder!r}")

        work = _normalize(stream_df, spec, None)
        if "__tb" not in work.columns:
            work = work.withColumn("__tb", F.lit(0).cast("long"))
        if cutoff is not None:
            # sentinels must REACH the watermark operator (a pre-group filter
            # would be pushed below it and the watermark would never pass the
            # cutoff); they are dropped per-key inside update() instead
            work = (work
                    .withColumn("__evt", (F.col("__ts") / 1e6).cast("timestamp"))
                    .withWatermark("__evt", self.watermark_delay))

        def update(key: tuple, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
            import pickle

            spec.ensure_registered()
            stratum = key[0]
            if state.exists:
                blob, open_n, next_slice, pending, max_ts, n_dis = state.get
                syn = Synopsis.from_bytes(blob) if blob is not None else None
            else:
                syn, open_n, next_slice = None, 0, 0
                pending, max_ts, n_dis = None, -(1 << 62), 0

            out = []

            def emit(pdf: pd.DataFrame) -> None:
                """Feed ORDERED rows into the open slice, sealing every
                ``count`` elements."""
                nonlocal syn, open_n, next_slice
                pos = 0
                while pos < len(pdf):
                    take = min(count - open_n, len(pdf) - pos)
                    chunk = pdf.iloc[pos:pos + take]
                    if syn is None:
                        syn = spec.make_synopsis()
                    _update(syn, spec, chunk)
                    open_n += take
                    pos += take
                    if open_n == count:
                        if hasattr(syn, "finalize"):
                            syn.finalize()
                        out.append((stratum, next_slice, count, syn.to_bytes()))
                        next_slice += 1
                        syn, open_n = None, 0

            if state.hasTimedOut:
                # watermark passed the cutoff: drain the reorder buffer,
                # then flush the trailing partial
                if pending is not None:
                    rest = pd.DataFrame(pickle.loads(pending))
                    if len(rest):
                        emit(rest.sort_values(["__ts", "__tb"], kind="stable"))
                if syn is not None and open_n > 0:
                    if hasattr(syn, "finalize"):
                        syn.finalize()
                    out.append((stratum, next_slice, open_n, syn.to_bytes()))
                state.remove()
                if out:
                    pdf_out = pd.DataFrame(out, columns=["stratum",
                                                         "slice_idx",
                                                         "length", "state"])
                    pdf_out["n_disordered"] = int(n_dis)
                    yield pdf_out
                return

            frames = []
            if pending is not None:
                rest = pd.DataFrame(pickle.loads(pending))
                if len(rest):
                    frames.append(rest)
            batch_min = None
            for pdf in pdfs:
                if pdf.empty:
                    continue
                if cutoff is not None:
                    pdf = pdf[pdf["__ts"].to_numpy() < cutoff]  # drop sentinels
                    if pdf.empty:
                        continue
                    pdf = pdf.drop(columns=["__evt"], errors="ignore")
                ts = pdf["__ts"].to_numpy()
                lo = int(ts.min())
                batch_min = lo if batch_min is None else min(batch_min, lo)
                frames.append(pdf)

            if frames:
                if cutoff is None and batch_min is not None \
                        and batch_min < max_ts:
                    # no watermark → no reorder buffer; disorder would build
                    # slices out of order (silently wrong for order-based
                    # synopses)
                    late = sum(int((f["__ts"].to_numpy() < max_ts).sum())
                               for f in frames)
                    if on_disorder == "error":
                        raise ValueError(
                            f"StatefulOrderedStream: {late} row(s) in stratum "
                            f"{stratum!r} arrived older than a previous "
                            "batch's max ts and there is no watermark to "
                            "reorder under — set flush_cutoff_us (enables "
                            "the watermark reorder buffer) or "
                            "on_disorder='count'")
                    n_dis += late
                allr = (pd.concat(frames, ignore_index=True)
                        if len(frames) > 1 else frames[0])
                allr = allr.sort_values(["__ts", "__tb"], kind="stable")
                ts = allr["__ts"].to_numpy()
                max_ts = max(max_ts, int(ts.max()))
                if cutoff is not None:
                    # only rows STRICTLY below the watermark are safe to
                    # consume: Spark has already dropped any later arrival
                    # below it, so nothing can ever sort before them
                    wm_us = state.getCurrentWatermarkMs() * 1000
                    ready = allr.iloc[: int((ts < wm_us).sum())]
                    hold = allr.iloc[int((ts < wm_us).sum()):]
                else:
                    ready, hold = allr, allr.iloc[0:0]
                if len(ready):
                    emit(ready)
                pending = (pickle.dumps(
                    {c: hold[c].to_numpy() for c in hold.columns})
                    if len(hold) else None)

            state.update((syn.to_bytes() if syn is not None else None,
                          int(open_n), int(next_slice), pending,
                          int(max_ts), int(n_dis)))
            if cutoff is not None:
                wm_us = state.getCurrentWatermarkMs() * 1000
                state.setTimeoutTimestamp(max(cutoff, wm_us + 1_000) // 1000)
            if out:
                pdf_out = pd.DataFrame(out, columns=["stratum", "slice_idx",
                                                     "length", "state"])
                pdf_out["n_disordered"] = int(n_dis)
                yield pdf_out

        return work.groupBy("__st").applyInPandasWithState(
            update, _ORDERED_OUT_SCHEMA,
            StructType([StructField("blob", BinaryType()),
                        StructField("open_n", LongType()),
                        StructField("next_slice", LongType()),
                        StructField("pending", BinaryType()),
                        StructField("max_ts", LongType()),
                        StructField("n_disordered", LongType())]),
            "append",
            GroupStateTimeout.EventTimeTimeout if cutoff is not None
            else GroupStateTimeout.NoTimeout)

    def start(self, spark, source_dir: str, out_dir: str, checkpoint_dir: str,
              schema=None, max_files_per_trigger: int = 1,
              available_now: bool = True):
        if schema is None:
            schema = spark.read.parquet(source_dir).schema
        reader = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", max_files_per_trigger)
                  .parquet(source_dir))
        out = self.transform(reader)
        writer = (out.writeStream.format("parquet")
                  .option("path", out_dir)
                  .option("checkpointLocation", checkpoint_dir)
                  .outputMode("append"))
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def _gap_merge(sessions: list, gap_us: int) -> list:
    """Interval-merge sessions whose ts-span gap ≤ gap_us; synopsis blobs
    merge pairwise (associative/commutative per the trait contract, so any
    merge order yields the same synopsis content)."""
    sessions = sorted(sessions, key=lambda s: (s[0], s[1]))
    out = []
    for s in sessions:
        if out and s[0] - out[-1][1] <= gap_us:
            prev = out[-1]
            syn = Synopsis.from_bytes(prev[2]).merge(Synopsis.from_bytes(s[2]))
            prev[1] = max(prev[1], s[1])
            prev[2] = syn.to_bytes()
            prev[3] = prev[3] + s[3]
        else:
            out.append(list(s))
    return out
