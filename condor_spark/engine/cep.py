"""CEP patterns per key, each with a batch form and a streaming twin.

North-rule surface ("structured-streaming / CEP engine"). The reference has
no CEP operator (Condor is a synopsis engine); this is new surface required
by the north rule, expressed Spark-first. Five patterns:

  sequence   — "A followed by B within T" (`sequence_matches`, all pairs or
               earliest-only) and n-step chains (`sequence_chain`) —
               relaxed contiguity (Flink `followedBy`).
  negation   — "A with NO B within T" (`absence_matches`).
  Kleene-plus— "A B+ C within T" with the B count (`kleene_matches`).
  adjacency  — "A IMMEDIATELY followed by B" (`adjacent_matches`) —
               strict contiguity (Flink `next()`), one window lead, no join.

Batch forms are filtered projections joined on the key with event-time
range predicates: Catalyst pushes the kind filters into the scan, the join
shuffles only matching-kind rows, and the range predicates evaluate inside
whole-stage codegen — no Python anywhere. At 10^12 rows each is one keyed
shuffle of the (small) filtered sides, same shape as any big equi-join.

The streaming twins are keyed ``applyInPandasWithState`` with
watermark-pruned state, one per distinct emission discipline:
  in-band        (`StatefulSequenceStream`) — a pair emits when its later
                 element arrives;
  timer-driven   (`StatefulAbsenceStream`)  — a first emits when the
                 watermark clears first_ts + within, uncancelled (decided
                 by the passage of time, via event-time timeouts);
  watermark-gated count (`StatefulKleeneStream`) — a pair's mid count
                 finalizes when the watermark clears second_ts (no
                 admissible mid can still arrive);
  order-finality (`StatefulAdjacentStream`) — a pair emits when the
                 watermark clears its LATER element's ts (nothing can
                 still sort between the two).

Exactness: every streaming twin replays to exactly its batch form's rows
for the same input, which is also the DuckDB oracle — these are exact
operators, not synopses.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (BinaryType, LongType, StructField, StructType,
                               TimestampType)

from .windows import duration_us

_NTZ = "timestamp_ntz"


def sequence_matches(df: DataFrame, key_col: str = "user_id",
                     ts_col: str = "ts", event_col: str = "event_type",
                     first: str = "signup", second: str = "purchase",
                     within: str = "7 days",
                     earliest_only: bool = False) -> DataFrame:
    """All (key, first_ts, second_ts) with ``first_ts < second_ts <=
    first_ts + within``; with ``earliest_only`` each first event keeps only
    its earliest qualifying second (MATCH_RECOGNIZE-flavored)."""
    w_us = duration_us(within)
    ts = F.col(ts_col).cast("timestamp")
    a = (df.filter(F.col(event_col) == first)
           .select(F.col(key_col).alias("key"), ts.alias("first_ts")))
    b = (df.filter(F.col(event_col) == second)
           .select(F.col(key_col).alias("__bk"), ts.alias("second_ts")))
    pairs = a.join(
        b, (F.col("key") == F.col("__bk"))
           & (F.col("second_ts") > F.col("first_ts"))
           & (F.unix_micros("second_ts")
              <= F.unix_micros("first_ts") + F.lit(w_us)))
    if earliest_only:
        pairs = pairs.groupBy("key", "first_ts").agg(
            F.min("second_ts").alias("second_ts"))
    return pairs.select("key",
                        F.col("first_ts").cast(_NTZ).alias("first_ts"),
                        F.col("second_ts").cast(_NTZ).alias("second_ts"))


def absence_matches(df: DataFrame, key_col: str = "user_id",
                    ts_col: str = "ts", event_col: str = "event_type",
                    first: str = "signup", second: str = "purchase",
                    within: str = "7 days") -> DataFrame:
    """CEP negation — every *first* event with NO *second* event of the same
    key in ``(first_ts, first_ts + within]`` (the "absence within timeout"
    pattern, the complement of ``sequence_matches``).

    Spark-first: a LEFT ANTI join of the two filtered projections — the
    event-kind filters push to the scan, the anti join shuffles only the
    filtered sides on the key, and the time-range predicate evaluates as the
    join's secondary condition in codegen. Same single-keyed-shuffle shape
    as the sequence join, so the 10^12-row posture is identical.
    """
    w_us = duration_us(within)
    ts = F.col(ts_col).cast("timestamp")
    a = (df.filter(F.col(event_col) == first)
           .select(F.col(key_col).alias("key"), ts.alias("first_ts")))
    b = (df.filter(F.col(event_col) == second)
           .select(F.col(key_col).alias("__bk"), ts.alias("second_ts")))
    out = a.join(
        b, (F.col("key") == F.col("__bk"))
           & (F.col("second_ts") > F.col("first_ts"))
           & (F.unix_micros("second_ts")
              <= F.unix_micros("first_ts") + F.lit(w_us)),
        "left_anti")
    return out.select("key", F.col("first_ts").cast(_NTZ).alias("first_ts"))


def kleene_matches(df: DataFrame, key_col: str = "user_id",
                   ts_col: str = "ts", event_col: str = "event_type",
                   first: str = "signup", mid: str = "view",
                   second: str = "purchase",
                   within: str = "7 days") -> DataFrame:
    """Kleene-plus — the ``A B+ C`` pattern: every (first, second) pair
    within the chain bound that has at least one *mid* event strictly
    between them, with the match count ``n_mid`` (CEP ``oneOrMore``
    semantics under, in Flink terms, skip-till-any-match: B occurrences are
    counted per (A, C) endpoint pair, not enumerated as subsets).

    Spark-first: the sequence join produces the endpoint pairs, then one
    more keyed equi-join attaches mids (the time predicates stay codegen
    secondary conditions) and a groupBy over the pair counts them —
    Kleene-plus's ≥1 constraint is the inner join itself. Three shuffles
    total, all on the key / pair columns, never an all-pairs product.
    """
    ts = F.col(ts_col).cast("timestamp")
    pairs = sequence_matches(df, key_col, ts_col, event_col, first, second,
                             within)
    m = (df.filter(F.col(event_col) == mid)
           .select(F.col(key_col).alias("__mk"), ts.cast(_NTZ).alias("mid_ts")))
    j = pairs.join(
        m, (F.col("key") == F.col("__mk"))
           & (F.col("mid_ts") > F.col("first_ts"))
           & (F.col("mid_ts") < F.col("second_ts")))
    return (j.groupBy("key", "first_ts", "second_ts")
             .agg(F.count(F.lit(1)).alias("n_mid"))
             .select("key", "first_ts", "second_ts", "n_mid"))


def adjacent_matches(df: DataFrame, key_col: str = "user_id",
                     ts_col: str = "ts", event_col: str = "event_type",
                     first: str = "signup", second: str = "purchase",
                     within: str | None = None,
                     tiebreak_col: str | None = None) -> DataFrame:
    """STRICT contiguity (Flink CEP ``next()``): every *first* event whose
    key's IMMEDIATELY following event — next in (ts, tiebreak) order over
    ALL event kinds, nothing in between — is a *second* event, optionally
    within a time bound. Contrast ``sequence_matches`` (relaxed
    ``followedBy``: any second later in the window qualifies).

    Spark-first: ONE hash shuffle on the key + a codegen window ``lead``.
    The kind filter cannot push below the window (adjacency is defined
    over the full event stream), so the key's whole stream sorts once —
    the same single-Exchange shape as any keyed window aggregation, no
    join, no Python. Pass ``tiebreak_col`` when timestamps can tie
    (ordering — and therefore adjacency — is otherwise nondeterministic
    under ties).
    """
    from pyspark.sql.window import Window

    ts = F.col(ts_col).cast("timestamp")
    base = df.select(F.col(key_col).alias("key"), ts.alias("__evt"),
                     F.col(event_col).alias("__kind"),
                     *([F.col(tiebreak_col).alias("__tb")]
                       if tiebreak_col else []))
    order = [F.col("__evt").asc()] + ([F.col("__tb").asc()]
                                      if tiebreak_col else [])
    w = Window.partitionBy("key").orderBy(*order)
    paired = base.select(
        "key", F.col("__evt").alias("first_ts"), "__kind",
        F.lead("__kind").over(w).alias("__nk"),
        F.lead("__evt").over(w).alias("second_ts"))
    cond = (F.col("__kind") == F.lit(first)) & (F.col("__nk") == F.lit(second))
    if within is not None:
        cond = cond & (F.unix_micros("second_ts")
                       <= F.unix_micros("first_ts")
                       + F.lit(duration_us(within)))
    return paired.filter(cond).select(
        "key", F.col("first_ts").cast(_NTZ).alias("first_ts"),
        F.col("second_ts").cast(_NTZ).alias("second_ts"))


def sequence_chain(df: DataFrame, key_col: str = "user_id",
                   ts_col: str = "ts", event_col: str = "event_type",
                   steps: tuple = ("signup", "view", "purchase"),
                   within: str = "1 day") -> DataFrame:
    """n-step CEP chain: ts1 < ts2 < ... < tsn with tsn ≤ ts1 + within.

    A cascade of keyed equi-joins, one per step — each join also applies
    the WHOLE-chain bound (ts_{i+1} ≤ ts1 + within), so partial chains
    that can no longer complete are pruned before the next shuffle. Every
    step's event-kind filter pushes to the scan, like the 2-step form.
    """
    if len(steps) < 2:
        raise ValueError("a chain needs at least 2 steps")
    w_us = duration_us(within)
    ts = F.col(ts_col).cast("timestamp")
    out = None
    for i, kind in enumerate(steps, start=1):
        side = (df.filter(F.col(event_col) == kind)
                  .select(F.col(key_col).alias("key" if i == 1 else "__k"),
                          ts.alias(f"ts{i}")))
        if out is None:
            out = side
        else:
            cond = ((F.col("key") == F.col("__k"))
                    & (F.col(f"ts{i}") > F.col(f"ts{i - 1}"))
                    & (F.unix_micros(f"ts{i}")
                       <= F.unix_micros("ts1") + F.lit(w_us)))
            out = out.join(side, cond).drop("__k")
    return out.select("key", *[F.col(f"ts{i}").cast(_NTZ).alias(f"ts{i}")
                               for i in range(1, len(steps) + 1)])


_OUT_SCHEMA = StructType([
    StructField("key", LongType()),
    StructField("first_ts", TimestampType()),
    StructField("second_ts", TimestampType()),
])
_ABS_OUT_SCHEMA = StructType([
    StructField("key", LongType()),
    StructField("first_ts", TimestampType()),
])
_KLEENE_OUT_SCHEMA = StructType([
    StructField("key", LongType()),
    StructField("first_ts", TimestampType()),
    StructField("second_ts", TimestampType()),
    StructField("n_mid", LongType()),
])
_STATE_SCHEMA = StructType([StructField("blob", BinaryType())])


def _start_parquet_stream(pattern, spark, source_dir: str, out_dir: str,
                          checkpoint_dir: str, schema=None,
                          max_files_per_trigger: int = 1,
                          available_now: bool = True, transform=None):
    """Shared stream wiring for every CEP pattern: parquet file-replay
    source → optional pre-transform → ``pattern.transform`` → append
    parquet sink (the same reader/sink shape as the synopsis stream jobs)."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    reader = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(source_dir))
    if transform is not None:
        reader = transform(reader)
    out = pattern.transform(reader)
    writer = (out.writeStream.format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


@dataclass
class StatefulSequenceStream:
    """Streaming twin of ``sequence_matches`` (all-pairs semantics).

    Per-key state holds the pending first/second event times still inside
    the watermark horizon (µs lists, pickled). A pair emits exactly once —
    in the batch where its later element arrives: new-firsts pair with every
    known second, new-seconds with every known first, and the new×new
    overlap is subtracted by pairing new-seconds against pre-batch firsts
    only. Firsts evict once the watermark passes first_ts + within (no
    admissible second can still match); seconds evict once the watermark
    passes second_ts (no admissible first can still precede them).
    """
    key_col: str = "user_id"
    ts_col: str = "ts"
    event_col: str = "event_type"
    first: str = "signup"
    second: str = "purchase"
    within: str = "7 days"
    watermark_delay: str = "10 seconds"

    def transform(self, stream_df: DataFrame) -> DataFrame:
        w_us = duration_us(self.within)
        first_kind, second_kind = self.first, self.second

        work = (stream_df
                .filter(F.col(self.event_col).isin(first_kind, second_kind))
                .select(F.col(self.key_col).cast("long").alias("key"),
                        F.col(self.ts_col).cast("timestamp").alias("__evt"),
                        F.col(self.event_col).alias("kind"))
                .withWatermark("__evt", self.watermark_delay))

        def update(key: tuple, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
            firsts: list[int] = []
            seconds: list[int] = []
            if state.exists:
                firsts, seconds = pickle.loads(state.get[0])

            out: list[tuple[int, int]] = []
            if not state.hasTimedOut:
                rows = [p for p in pdfs if not p.empty]
                if rows:
                    pdf = pd.concat(rows, ignore_index=True)
                    us = (pdf["__evt"].astype("datetime64[us]").astype("int64")
                          .to_numpy())
                    is_first = (pdf["kind"] == first_kind).to_numpy()
                    new_f = sorted(int(t) for t in us[is_first])
                    new_s = sorted(int(t) for t in us[~is_first])
                    # new seconds × pre-batch firsts
                    for s in new_s:
                        out.extend((f, s) for f in firsts
                                   if f < s <= f + w_us)
                    # new firsts × (old + new) seconds — covers new×new once
                    all_s = seconds + new_s
                    for f in new_f:
                        out.extend((f, s) for s in all_s
                                   if f < s <= f + w_us)
                    firsts.extend(new_f)
                    seconds.extend(new_s)

            wm_us = state.getCurrentWatermarkMs() * 1000
            firsts = [f for f in firsts if f + w_us >= wm_us]
            seconds = [s for s in seconds if s >= wm_us]
            if firsts or seconds:
                state.update((pickle.dumps((firsts, seconds)),))
                horizon = min([f + w_us for f in firsts] + seconds)
                state.setTimeoutTimestamp(max(horizon, wm_us + 1_000) // 1000)
            elif state.exists:
                state.remove()

            if out:
                yield pd.DataFrame({
                    "key": [int(key[0])] * len(out),
                    "first_ts": [pd.Timestamp(f, unit="us") for f, _ in out],
                    "second_ts": [pd.Timestamp(s, unit="us") for _, s in out]})

        return work.groupBy("key").applyInPandasWithState(
            update, _OUT_SCHEMA, _STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout)

    def start(self, spark, source_dir: str, out_dir: str, checkpoint_dir: str,
              schema=None, max_files_per_trigger: int = 1,
              available_now: bool = True, transform=None):
        return _start_parquet_stream(
            self, spark, source_dir, out_dir, checkpoint_dir, schema=schema,
            max_files_per_trigger=max_files_per_trigger,
            available_now=available_now, transform=transform)


@dataclass
class StatefulAbsenceStream:
    """Streaming twin of ``absence_matches`` — the timer-driven CEP shape.

    Unlike the sequence stream (which emits in-band, at the later element's
    arrival), an absence can only be decided by the PASSAGE OF TIME: a first
    event emits exactly once, in the micro-batch whose watermark first
    exceeds ``first_ts + within`` with no admissible second having cancelled
    it (event-time timeouts make that batch happen even with no new data —
    Spark's no-data micro-batches fire the pending timers).

    Per-key state holds (pending first µs, remembered second µs) lists.
    Cancellation is permanent and vectorized (binary search of each pending
    first against the sorted seconds). Retention mirrors the sequence
    stream's horizon: a first lives until the watermark passes
    ``first_ts + within`` (then it EMITS instead of evicting); a second
    lives until the watermark passes ``second_ts`` (an admissibly-late first
    it could still cancel must carry ``first_ts < second_ts``, and anything
    older than the watermark is dropped upstream).
    """
    key_col: str = "user_id"
    ts_col: str = "ts"
    event_col: str = "event_type"
    first: str = "signup"
    second: str = "purchase"
    within: str = "7 days"
    watermark_delay: str = "10 seconds"

    def transform(self, stream_df: DataFrame) -> DataFrame:
        import numpy as np

        w_us = duration_us(self.within)
        first_kind, second_kind = self.first, self.second

        work = (stream_df
                .filter(F.col(self.event_col).isin(first_kind, second_kind))
                .select(F.col(self.key_col).cast("long").alias("key"),
                        F.col(self.ts_col).cast("timestamp").alias("__evt"),
                        F.col(self.event_col).alias("kind"))
                .withWatermark("__evt", self.watermark_delay))

        def update(key: tuple, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
            firsts: list[int] = []
            seconds: list[int] = []
            if state.exists:
                firsts, seconds = pickle.loads(state.get[0])

            if not state.hasTimedOut:
                rows = [p for p in pdfs if not p.empty]
                if rows:
                    pdf = pd.concat(rows, ignore_index=True)
                    us = (pdf["__evt"].astype("datetime64[us]").astype("int64")
                          .to_numpy())
                    is_first = (pdf["kind"] == first_kind).to_numpy()
                    firsts.extend(int(t) for t in us[is_first])
                    seconds.extend(int(t) for t in us[~is_first])
                    seconds.sort()
            if firsts and seconds:
                fa = np.asarray(firsts, dtype=np.int64)
                sa = np.asarray(seconds, dtype=np.int64)
                idx = np.searchsorted(sa, fa, side="right")
                nxt = sa[np.minimum(idx, len(sa) - 1)]
                cancelled = (idx < len(sa)) & (nxt <= fa + w_us)
                firsts = [int(f) for f in fa[~cancelled]]

            wm_us = state.getCurrentWatermarkMs() * 1000
            emit = sorted(f for f in firsts if f + w_us < wm_us)
            firsts = [f for f in firsts if f + w_us >= wm_us]
            seconds = [s for s in seconds if s >= wm_us]

            if firsts or seconds:
                state.update((pickle.dumps((firsts, seconds)),))
                horizon = min([f + w_us for f in firsts] + seconds)
                state.setTimeoutTimestamp(max(horizon, wm_us + 1_000) // 1000)
            elif state.exists:
                state.remove()

            if emit:
                yield pd.DataFrame({
                    "key": [int(key[0])] * len(emit),
                    "first_ts": [pd.Timestamp(f, unit="us") for f in emit]})

        return work.groupBy("key").applyInPandasWithState(
            update, _ABS_OUT_SCHEMA, _STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout)

    def start(self, spark, source_dir: str, out_dir: str, checkpoint_dir: str,
              schema=None, max_files_per_trigger: int = 1,
              available_now: bool = True, transform=None):
        return _start_parquet_stream(
            self, spark, source_dir, out_dir, checkpoint_dir, schema=schema,
            max_files_per_trigger=max_files_per_trigger,
            available_now=available_now, transform=transform)


@dataclass
class StatefulKleeneStream:
    """Streaming twin of ``kleene_matches`` (A B+ C with match count).

    A pair's mid count is only final once no admissible mid can still
    arrive, i.e. once the watermark clears ``second_ts`` — so, like the
    absence stream, emission is watermark-gated, but the state buffers all
    THREE kinds: pending firsts (alive until the watermark clears
    ``first_ts + within``), pending seconds (finalized and dropped when the
    watermark clears their ts), and mids (alive until the watermark clears
    ``mid_ts + within`` — a mid can only be counted by firsts within
    ``within`` before a qualifying second, so that horizon is safe and
    bounded). Duplicate timestamps reproduce the batch GROUP BY exactly:
    an emitted (first_ts, second_ts) row's count is
    mult(first) × mult(second) × (mids strictly between, with
    multiplicity) — one row per distinct pair, like the batch aggregate.
    """
    key_col: str = "user_id"
    ts_col: str = "ts"
    event_col: str = "event_type"
    first: str = "signup"
    mid: str = "view"
    second: str = "purchase"
    within: str = "7 days"
    watermark_delay: str = "10 seconds"

    def transform(self, stream_df: DataFrame) -> DataFrame:
        import numpy as np
        from collections import Counter

        w_us = duration_us(self.within)
        kinds = (self.first, self.mid, self.second)

        work = (stream_df
                .filter(F.col(self.event_col).isin(*kinds))
                .select(F.col(self.key_col).cast("long").alias("key"),
                        F.col(self.ts_col).cast("timestamp").alias("__evt"),
                        F.col(self.event_col).alias("kind"))
                .withWatermark("__evt", self.watermark_delay))

        def update(key: tuple, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
            firsts: list[int] = []
            mids: list[int] = []
            seconds: list[int] = []
            if state.exists:
                firsts, mids, seconds = pickle.loads(state.get[0])

            if not state.hasTimedOut:
                rows = [p for p in pdfs if not p.empty]
                if rows:
                    pdf = pd.concat(rows, ignore_index=True)
                    us = (pdf["__evt"].astype("datetime64[us]").astype("int64")
                          .to_numpy())
                    kind = pdf["kind"].to_numpy()
                    firsts.extend(int(t) for t in us[kind == kinds[0]])
                    mids.extend(int(t) for t in us[kind == kinds[1]])
                    seconds.extend(int(t) for t in us[kind == kinds[2]])

            wm_us = state.getCurrentWatermarkMs() * 1000
            fin = [s for s in seconds if s < wm_us]
            seconds = [s for s in seconds if s >= wm_us]

            out: list[tuple[int, int, int]] = []
            if fin:
                cf = Counter(firsts)
                cs = Counter(fin)
                ma = np.sort(np.asarray(mids, dtype=np.int64))
                for s, s_mult in sorted(cs.items()):
                    hi = int(np.searchsorted(ma, s, side="left"))  # m < s
                    for f, f_mult in sorted(cf.items()):
                        if f < s <= f + w_us:
                            lo = int(np.searchsorted(ma, f, side="right"))
                            n = hi - lo                            # f < m < s
                            if n > 0:
                                out.append((f, s, f_mult * s_mult * n))

            # evict AFTER finalization (a pending second's firsts/mids are
            # retained by construction: s <= f + within and m < s)
            firsts = [f for f in firsts if f + w_us >= wm_us]
            mids = [m for m in mids if m + w_us >= wm_us]

            if firsts or mids or seconds:
                state.update((pickle.dumps((firsts, mids, seconds)),))
                horizon = min([f + w_us for f in firsts]
                              + [m + w_us for m in mids] + seconds)
                state.setTimeoutTimestamp(max(horizon, wm_us + 1_000) // 1000)
            elif state.exists:
                state.remove()

            if out:
                out.sort()
                yield pd.DataFrame({
                    "key": [int(key[0])] * len(out),
                    "first_ts": [pd.Timestamp(f, unit="us") for f, _, _ in out],
                    "second_ts": [pd.Timestamp(s, unit="us") for _, s, _ in out],
                    "n_mid": [int(n) for _, _, n in out]})

        return work.groupBy("key").applyInPandasWithState(
            update, _KLEENE_OUT_SCHEMA, _STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout)

    def start(self, spark, source_dir: str, out_dir: str, checkpoint_dir: str,
              schema=None, max_files_per_trigger: int = 1,
              available_now: bool = True, transform=None):
        return _start_parquet_stream(
            self, spark, source_dir, out_dir, checkpoint_dir, schema=schema,
            max_files_per_trigger=max_files_per_trigger,
            available_now=available_now, transform=transform)


@dataclass
class StatefulAdjacentStream:
    """Streaming twin of ``adjacent_matches`` (strict contiguity).

    Adjacency is decided by ORDER FINALITY, a fourth emission discipline:
    the pair (e_i, e_{i+1}) is known final exactly when the watermark
    clears e_{i+1}'s event time — no admissible arrival can still sort
    between them (Spark drops anything older than the watermark upstream).
    Per-key state buffers the events not yet final-ordered (every kind —
    adjacency is defined over the full stream) plus the last final event,
    which is the only possible predecessor of the next arrival. With
    ``within`` set the retained tail expires once the watermark passes
    ``tail_ts + within`` (no admissible successor can beat the bound), so
    state fully drains; tiebreak column required for deterministic order
    under timestamp ties (same contract as the batch form).
    """
    key_col: str = "user_id"
    ts_col: str = "ts"
    event_col: str = "event_type"
    tiebreak_col: str = "event_id"
    first: str = "signup"
    second: str = "purchase"
    within: str = "7 days"
    watermark_delay: str = "10 seconds"

    def transform(self, stream_df: DataFrame) -> DataFrame:
        w_us = duration_us(self.within)
        first_kind, second_kind = self.first, self.second

        work = (stream_df
                .select(F.col(self.key_col).cast("long").alias("key"),
                        F.col(self.ts_col).cast("timestamp").alias("__evt"),
                        F.col(self.event_col).alias("kind"),
                        F.col(self.tiebreak_col).cast("long").alias("__tb"))
                .withWatermark("__evt", self.watermark_delay))

        def update(key: tuple, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
            buf: list[tuple[int, int, str]] = []
            if state.exists:
                buf = pickle.loads(state.get[0])

            if not state.hasTimedOut:
                rows = [p for p in pdfs if not p.empty]
                if rows:
                    pdf = pd.concat(rows, ignore_index=True)
                    us = (pdf["__evt"].astype("datetime64[us]")
                          .astype("int64").to_numpy())
                    tb = pdf["__tb"].to_numpy()
                    kind = pdf["kind"].to_numpy()
                    buf.extend((int(t), int(b), str(k))
                               for t, b, k in zip(us, tb, kind))
            buf.sort()

            wm_us = state.getCurrentWatermarkMs() * 1000
            cut = sum(1 for t, _, _ in buf if t < wm_us)
            out = []
            for i in range(cut - 1):  # pairs whose LATER element is final
                (ft, _, fk), (st, _, sk) = buf[i], buf[i + 1]
                if fk == first_kind and sk == second_kind and st <= ft + w_us:
                    out.append((ft, st))
            # evict consumed predecessors; keep the last final event (sole
            # possible predecessor of the next arrival) + the hold region
            if cut >= 1:
                buf = buf[cut - 1:]
            # the retained tail can no longer match once the watermark
            # passes its within-horizon
            if len(buf) == 1 and buf[0][0] + w_us < wm_us:
                buf = []

            if buf:
                state.update((pickle.dumps(buf),))
                horizon = buf[0][0] + w_us
                state.setTimeoutTimestamp(max(horizon, wm_us + 1_000) // 1000)
            elif state.exists:
                state.remove()

            if out:
                yield pd.DataFrame({
                    "key": [int(key[0])] * len(out),
                    "first_ts": [pd.Timestamp(f, unit="us") for f, _ in out],
                    "second_ts": [pd.Timestamp(s, unit="us") for _, s in out]})

        return work.groupBy("key").applyInPandasWithState(
            update, _OUT_SCHEMA, _STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout)

    def start(self, spark, source_dir: str, out_dir: str, checkpoint_dir: str,
              schema=None, max_files_per_trigger: int = 1,
              available_now: bool = True, transform=None):
        return _start_parquet_stream(
            self, spark, source_dir, out_dir, checkpoint_dir, schema=schema,
            max_files_per_trigger=max_files_per_trigger,
            available_now=available_now, transform=transform)


_CHAIN_OUT_SCHEMA = StructType([
    StructField("key", LongType()),
    StructField("ts1", TimestampType()),
    StructField("ts2", TimestampType()),
    StructField("ts3", TimestampType()),
])


@dataclass
class StatefulChainStream:
    """Streaming twin of ``sequence_chain`` for 3 steps (A → B → C with
    ``ts3 <= ts1 + within``), in-band emission generalized to triples: a
    chain emits in the micro-batch where it FIRST becomes complete — when
    its latest-ARRIVING element lands (which, under admissible disorder,
    need not be C). Exactly-once by construction: each batch enumerates
    valid triples over (buffered ∪ new) elements and skips those whose
    three elements are all pre-batch (they emitted earlier).

    Retention mirrors the chain arithmetic: an A lives until the watermark
    clears ``ts1 + within`` (no admissible C can complete it after that),
    a B until ``ts2 + within`` (its C must satisfy ts3 <= ts1 + within <
    ts2 + within), a C until the watermark clears ``ts3`` (a later-arriving
    admissible A or B must carry ts >= watermark and still sort before
    ts3). Per-key state is O(events inside the within horizon).
    """
    key_col: str = "user_id"
    ts_col: str = "ts"
    event_col: str = "event_type"
    steps: tuple = ("signup", "view", "purchase")
    within: str = "1 day"
    watermark_delay: str = "10 seconds"

    def transform(self, stream_df: DataFrame) -> DataFrame:
        import numpy as np

        if len(self.steps) != 3:
            raise ValueError("StatefulChainStream supports exactly 3 steps "
                             "(the batch sequence_chain handles any n)")
        w_us = duration_us(self.within)
        kinds = tuple(self.steps)

        work = (stream_df
                .filter(F.col(self.event_col).isin(*kinds))
                .select(F.col(self.key_col).cast("long").alias("key"),
                        F.col(self.ts_col).cast("timestamp").alias("__evt"),
                        F.col(self.event_col).alias("kind"))
                .withWatermark("__evt", self.watermark_delay))

        def update(key: tuple, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
            a: list = []
            b: list = []
            c: list = []
            if state.exists:
                a, b, c = pickle.loads(state.get[0])
            # elements are (ts_us, is_new) — old ones re-enter with False
            elems = [[(t, False) for t in a], [(t, False) for t in b],
                     [(t, False) for t in c]]

            if not state.hasTimedOut:
                rows = [p for p in pdfs if not p.empty]
                if rows:
                    pdf = pd.concat(rows, ignore_index=True)
                    us = (pdf["__evt"].astype("datetime64[us]")
                          .astype("int64").to_numpy())
                    kind = pdf["kind"].to_numpy()
                    for j in range(3):
                        elems[j].extend((int(t), True)
                                        for t in us[kind == kinds[j]])
            for j in range(3):
                elems[j].sort()
            ea, eb, ec = elems
            ats = np.array([t for t, _ in ea], dtype=np.int64)
            bts = np.array([t for t, _ in eb], dtype=np.int64)
            cts = np.array([t for t, _ in ec], dtype=np.int64)

            out: list[tuple[int, int, int]] = []
            for ta, a_new in ea:
                hi_b = int(np.searchsorted(bts, ta + w_us, side="left"))
                for ib in range(int(np.searchsorted(bts, ta, side="right")),
                                hi_b):
                    tb, b_new = eb[ib]
                    lo_c = int(np.searchsorted(cts, tb, side="right"))
                    hi_c = int(np.searchsorted(cts, ta + w_us, side="right"))
                    for ic in range(lo_c, hi_c):
                        tc, c_new = ec[ic]
                        if a_new or b_new or c_new:
                            out.append((ta, tb, tc))

            wm_us = state.getCurrentWatermarkMs() * 1000
            a = [t for t, _ in ea if t + w_us >= wm_us]
            b = [t for t, _ in eb if t + w_us >= wm_us]
            c = [t for t, _ in ec if t >= wm_us]
            if a or b or c:
                state.update((pickle.dumps((a, b, c)),))
                horizon = min([t + w_us for t in a] + [t + w_us for t in b]
                              + c)
                state.setTimeoutTimestamp(max(horizon, wm_us + 1_000) // 1000)
            elif state.exists:
                state.remove()

            if out:
                out.sort()
                yield pd.DataFrame({
                    "key": [int(key[0])] * len(out),
                    "ts1": [pd.Timestamp(x, unit="us") for x, _, _ in out],
                    "ts2": [pd.Timestamp(x, unit="us") for _, x, _ in out],
                    "ts3": [pd.Timestamp(x, unit="us") for _, _, x in out]})

        return work.groupBy("key").applyInPandasWithState(
            update, _CHAIN_OUT_SCHEMA, _STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout)

    def start(self, spark, source_dir: str, out_dir: str, checkpoint_dir: str,
              schema=None, max_files_per_trigger: int = 1,
              available_now: bool = True, transform=None):
        return _start_parquet_stream(
            self, spark, source_dir, out_dir, checkpoint_dir, schema=schema,
            max_files_per_trigger=max_files_per_trigger,
            available_now=available_now, transform=transform)
