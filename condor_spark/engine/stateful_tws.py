"""Keyed streaming synopsis state via ``transformWithStateInPandas``.

Spark 4's successor to ``applyInPandasWithState`` (SPARK-46815,
"Arbitrary State API v2"): a ``StatefulProcessor`` with typed value state
and first-class event-time *timers*, running on the RocksDB state store.
Semantically this is the same operator as ``stateful.StatefulSynopsisStream``
— phase-1 stateless partials (one sketch blob per (partition, slice,
stratum); raw rows never shuffle), phase-2 keyed merge into checkpointed
state, emit-on-watermark — re-expressed on the newer API, which brings:

  * explicit timers (``handle.registerTimer`` / ``handleExpiredTimer``)
    instead of the single implicit GroupStateTimeout, so a window's fire
    time is registered once rather than re-armed on every batch;
  * RocksDB state backing (changelog-checkpointed), the scale posture for
    10^12-clip state: open-window state spills to disk instead of executor
    heap;
  * state-schema evolution support (value state is a typed struct).

Like the v1 path, this mirrors Condor's incremental window accumulation
(``flinkScottyConnector/.../SynopsisAggregator.java:66-140``) with the
two-phase divide-and-conquer of ``SynopsisBuilder.java:224-242``.

Sandbox note: the v2 API's Python<->JVM state protocol is protobuf-based;
``google.protobuf`` is not installed in this container, so the end-to-end
streaming test is skipped here (``TWS_AVAILABLE``). The processor's merge /
timer / late-drop logic is identical either way and is unit-tested against
stub handles in ``tests/test_stateful_tws.py``; on a real cluster (protobuf
ships with any Spark distro that enables connect/TWS) ``start()`` runs
as-is.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType, TimestampType)

from ..synopsis.base import Synopsis
from .builder import (_PARTIAL_SCHEMA, SynopsisSpec, _normalize,
                      _partial_builder)
from .windows import Sliding, Tumbling, duration_us

try:  # the TWS wire protocol needs google.protobuf at runtime
    import google.protobuf  # noqa: F401
    TWS_AVAILABLE = True
except ImportError:  # pragma: no cover - sandbox has no protobuf
    TWS_AVAILABLE = False

try:
    from pyspark.sql.streaming import StatefulProcessor
except ImportError:  # pragma: no cover - pyspark < 4
    StatefulProcessor = object  # type: ignore[assignment,misc]

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

ROCKSDB_PROVIDER = ("org.apache.spark.sql.execution.streaming."
                    "state.RocksDBStateStoreProvider")


class WindowMergeProcessor(StatefulProcessor):
    """Per-(window, stratum) synopsis accumulator.

    State: one running sketch blob + count. Input rows are phase-1 partials
    (already partition-local reductions), so ``handleInputRows`` is the
    treeReduce root: O(partials) merges, no raw data. One event-time timer
    per key, registered at window_end + delay on first sight; the timer
    callback emits the closed window exactly once and clears state.
    """

    def __init__(self, spec: SynopsisSpec, size_us: int, delay_us: int):
        self.spec = spec
        self.size_us = int(size_us)
        self.delay_us = int(delay_us)

    # -- StatefulProcessor contract -------------------------------------
    def init(self, handle) -> None:
        self.handle = handle
        self.state = handle.getValueState("syn", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        self.spec.ensure_registered()
        w_us = int(key[0])
        fire_us = w_us + self.size_us + self.delay_us
        wm_us = timerValues.getCurrentWatermarkInMs() * 1000
        exists = self.state.exists()
        if not exists and wm_us > 0 and fire_us <= wm_us:
            # late partial for an already-emitted window: drop (matches the
            # reference's watermark-drop and the v1 path in stateful.py)
            return iter(())

        syn = None
        if exists:
            syn = Synopsis.from_bytes(self.state.get()[0])
        merged_any = False
        for pdf in rows:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["__pid", "__slice"], kind="stable")
            for b in pdf["state"]:
                nxt = Synopsis.from_bytes(b)
                syn = nxt if syn is None else syn.merge(nxt)
                merged_any = True
        if syn is None:
            return iter(())
        if merged_any or not exists:
            self.state.update((syn.to_bytes(), int(syn.n_processed)))
        if not exists:
            # one timer per key for its life — the v2 improvement over
            # re-arming GroupStateTimeout every batch. Timers must sit
            # beyond the current watermark; late-but-admitted partials
            # (wm < fire) keep the original fire time.
            self.handle.registerTimer(max(fire_us, wm_us + 1_000) // 1000)
        return iter(())

    def handleExpiredTimer(self, key, timerValues,
                           expiredTimerInfo) -> Iterator[pd.DataFrame]:
        self.spec.ensure_registered()
        if not self.state.exists():
            return
        w_us = int(key[0])
        blob, n = self.state.get()
        self.state.clear()
        yield pd.DataFrame({
            "window_start": [pd.Timestamp(w_us, unit="us")],
            "window_end": [pd.Timestamp(w_us + self.size_us, unit="us")],
            "stratum": [key[1]], "state": [blob], "n": [int(n)]})

    def close(self) -> None:
        pass


@dataclass
class TransformWithStateSynopsisStream:
    """``transformWithStateInPandas`` twin of ``StatefulSynopsisStream``:
    same plan shape (stateless ``mapInPandas`` partials → keyed stateful
    merge → append on window close), same output schema, RocksDB-backed
    typed state + explicit timers instead of GroupState."""
    spec: SynopsisSpec
    watermark_delay: str = "10 seconds"

    def transform(self, stream_df: DataFrame) -> DataFrame:
        spec, win = self.spec, self.spec.window
        if isinstance(win, (Tumbling, Sliding)):
            slice_us, size_us = win.slice_us, win.size_us
        else:
            raise ValueError("stateful path supports tumbling/sliding windows")
        delay_us = duration_us(self.watermark_delay)

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

        partials = (partials
                    .withColumn("__evt", (F.col("__slice") / 1e6).cast("timestamp"))
                    .withWatermark("__evt", self.watermark_delay))

        proc = WindowMergeProcessor(spec, size_us, delay_us)
        return partials.groupBy("__w", "__st").transformWithStateInPandas(
            statefulProcessor=proc, outputStructType=_OUT_SCHEMA,
            outputMode="append", timeMode="eventTime")

    def start(self, spark, source_dir: str, out_dir: str, checkpoint_dir: str,
              schema=None, max_files_per_trigger: int = 1,
              available_now: bool = True):
        if not TWS_AVAILABLE:  # pragma: no cover
            raise RuntimeError(
                "transformWithStateInPandas needs the google.protobuf "
                "package (ships with full Spark distros); use "
                "stateful.StatefulSynopsisStream in this environment")
        # transformWithState requires the RocksDB provider, but the provider
        # class is SESSION-global and frozen into every streaming query's
        # checkpoint at start — silently flipping it here would break any
        # other query in this session restoring an HDFSBackedStateStore
        # checkpoint (e.g. the applyInPandasWithState paths). Require the
        # caller to choose it at session build time instead.
        if spark.conf.get("spark.sql.streaming.stateStore.providerClass",
                          "") != ROCKSDB_PROVIDER:
            raise RuntimeError(
                "transformWithStateInPandas requires the RocksDB state "
                "store; set spark.sql.streaming.stateStore.providerClass="
                f"{ROCKSDB_PROVIDER} when BUILDING the session (it is "
                "session-global and frozen into streaming checkpoints, so "
                "this engine will not mutate it mid-session)")
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
