"""Two-phase distributed synopsis build — the engine core.

Re-expresses the reference's build pipeline (``flinkScottyConnector/.../
processor/SynopsisBuilder.java:55-73,193-245``) in Spark's execution model:

  reference                              this engine
  -----------------------------------    ------------------------------------
  rescale + AddParallelismIndex          Spark's input partitioning as-is
  keyBy(subtask) + window + aggregate    Phase 1: ``mapInPandas`` partial — one
    (partial synopses, communication-      synopsis per (slice, stratum) per
    free pre-aggregation :224-229)         input partition; raw rows never
                                           shuffle
  windowAll + reduce(MergeSynopsis)      Phase 2: ``groupBy(window, stratum)
    (final merge :232-242)                 .applyInPandas(merge)`` — only
                                           sketch blobs cross the shuffle
  Scotty general stream slicing          slices of gcd(size, slide) expanded
    (:298-342, slice sharing)              into their windows JVM-side
                                           (sequence+explode) before the merge

Shuffle volume is O(partitions × slices × strata) sketch blobs, independent
of row count — the property that makes the plan survive a 100× scale-up.
Merge order is made deterministic by sorting partials on (partition id,
slice) before reducing, so N-vs-4N parallelism produces identical output rows
for order-sensitive samplers too.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..synopsis.base import Synopsis, Trait, make
from .windows import CountTumbling, GlobalWindow, Session, Sliding, Tumbling

_PARTIAL_SCHEMA = ("__slice long, __st string, __pid long, state binary, n long")
# session-build chain lookup: inline a literal map up to this many chained
# edge sessions; past it (many-thousand-partition builds) use a broadcast
# join so the Catalyst plan stays bounded. Tests shrink it to force the
# join branch on small fixtures.
_CHAIN_MAP_INLINE_MAX = 2048

_FINAL_SCHEMA = ("window_start timestamp, window_end timestamp, stratum string, "
                 "state binary, n long")


@dataclass
class SynopsisSpec:
    """Analogue of the reference's BuildConfiguration
    (``processor/configs/BuildConfiguration.java:20-32``)."""
    kind: str                      # registry key: countmin, hll, bloom, ...
    params: dict = field(default_factory=dict)
    column: str = "value"          # the summarized field (ExtractKeyField analogue)
    ts_column: str | None = None   # event-time column (TimestampType)
    window: object = None          # Tumbling/Sliding/Session/CountTumbling/GlobalWindow
    stratify_by: str | None = None  # StratifiedSynopsis partition key
    priority_column: str | None = None  # for bottomk: precomputed orderable priority
    tiebreak_column: str | None = None  # for fifo: deterministic tie-break
    #: user-defined synopsis class (the reference's reflective extension
    #: point, SynopsisAggregator.java:66-86). The class ships to executors
    #: inside this spec; make it importable there (--py-files) or, from an
    #: interactive session, `pyspark.cloudpickle.register_pickle_by_value`.
    synopsis_cls: type | None = None

    def ensure_registered(self) -> None:
        if self.synopsis_cls is not None:
            from ..synopsis.base import register
            register(self.synopsis_cls)  # so from_bytes resolves on this worker

    def make_synopsis(self) -> Synopsis:
        if self.synopsis_cls is not None:
            self.ensure_registered()
            return self.synopsis_cls(**self.params)
        return make(self.kind, **self.params)


def _normalize(df: DataFrame, spec: SynopsisSpec, slice_us: int | None) -> DataFrame:
    """Project to the worker columns; all expressions JVM-side (codegen)."""
    cols = [F.col(spec.column).alias("__v")]
    if spec.ts_column:
        # NTZ → LTZ is identity under the UTC session timezone; unix_micros
        # stays JVM-side (codegen). Microseconds: full parquet ts precision.
        cols.append(F.unix_micros(F.col(spec.ts_column).cast("timestamp")).alias("__ts"))
    else:
        cols.append(F.lit(0).cast("long").alias("__ts"))
    if spec.stratify_by:
        cols.append(F.col(spec.stratify_by).cast("string").alias("__st"))
    else:
        cols.append(F.lit("").alias("__st"))
    if spec.priority_column:
        cols.append(F.col(spec.priority_column).alias("__prio"))
    if spec.tiebreak_column:
        cols.append(F.col(spec.tiebreak_column).cast("long").alias("__tb"))
    out = df.select(*cols)
    if slice_us is not None:
        out = out.withColumn(
            "__slice", (F.floor(F.col("__ts") / F.lit(slice_us)) * F.lit(slice_us)))
    else:
        out = out.withColumn("__slice", F.lit(0).cast("long"))
    return out


def _update_arrays(syn: Synopsis, spec: SynopsisSpec, vals, ts=None,
                   prio=None, tb=None) -> None:
    """Array-level update hot path (no pandas objects — session builds call
    this once per session, so per-call overhead matters)."""
    if not syn.NEEDS_TIMESTAMPS:
        ts = None
    if spec.kind == "bottomk" and prio is not None:
        syn.update_batch(vals, ts=ts, priorities=prio)
    elif spec.kind == "fifo" and tb is not None:
        syn.update_batch(vals, ts=ts, tiebreak=tb)
    elif ts is not None:
        syn.update_batch(vals, ts=ts)
    else:
        syn.update_batch(vals)


def _update(syn: Synopsis, spec: SynopsisSpec, sub: pd.DataFrame) -> None:
    _update_arrays(syn, spec, sub["__v"].to_numpy(),
                   ts=sub["__ts"].to_numpy(),
                   prio=sub["__prio"].to_numpy() if "__prio" in sub else None,
                   tb=sub["__tb"].to_numpy() if "__tb" in sub else None)


def _partial_builder(spec: SynopsisSpec):
    """Phase 1: per input partition, one synopsis per (slice, stratum).

    Kernels exposing the whole-batch fast path (``precompute`` /
    ``update_precomputed``: CM, HLL, AMS, DDSketch) hash/bucket the ENTIRE
    Arrow batch once, then each (slice, stratum) group scatters its
    contiguous sorted view — per-element cost stays flat as windows shrink,
    where the per-group path pays fixed numpy dispatch per tiny group
    (measured ~3x on the 1-day-window events throughput job). Everything
    else (timestamps, priorities, tiebreaks, order-dependent kernels) takes
    the general per-group path.
    """
    from pyspark import TaskContext

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, Synopsis] = {}
        proto: Synopsis | None = None
        fast: bool | None = None
        for pdf in batches:
            if pdf.empty:
                continue
            if fast is None:
                proto = spec.make_synopsis()
                fast = (hasattr(proto, "precompute")
                        and not spec.priority_column
                        and not spec.tiebreak_column
                        and not proto.NEEDS_TIMESTAMPS)
            if not fast:
                for key, sub in pdf.groupby(["__slice", "__st"], sort=False,
                                            dropna=False):
                    syn = acc.get(key)
                    if syn is None:
                        syn = acc[key] = spec.make_synopsis()
                    _update(syn, spec, sub)
                continue
            sl = pdf["__slice"].to_numpy()
            codes, cats = pd.factorize(pdf["__st"], use_na_sentinel=False)
            if len(cats) == 1:
                order = np.argsort(sl, kind="stable")
            else:
                order = np.lexsort((codes, sl))
            sl_s, codes_s = sl[order], codes[order]
            pre = proto.precompute(pdf["__v"].to_numpy()[order])
            change = np.flatnonzero((np.diff(sl_s) != 0)
                                    | (np.diff(codes_s) != 0)) + 1
            bounds = np.concatenate([[0], change, [sl_s.shape[0]]])
            for i in range(bounds.size - 1):
                lo, hi = int(bounds[i]), int(bounds[i + 1])
                stv = cats[codes_s[lo]]
                key = (sl_s[lo], None if pd.isna(stv) else stv)
                syn = acc.get(key)
                if syn is None:
                    syn = acc[key] = spec.make_synopsis()
                syn.update_precomputed(pre, lo, hi)
        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        if not acc:
            return
        rows = [(int(sl), None if pd.isna(st) else st, pid, syn.to_bytes(),
                 int(syn.n_processed))
                for (sl, st), syn in acc.items()]
        yield pd.DataFrame(rows, columns=["__slice", "__st", "__pid", "state", "n"])

    return fn


def _merge_group(pdf: pd.DataFrame) -> Synopsis:
    """Deterministic final merge: sort partials by (pid, slice) then reduce."""
    pdf = pdf.sort_values(["__pid", "__slice"], kind="stable")
    blobs = pdf["state"].tolist()
    syn = Synopsis.from_bytes(blobs[0])
    for b in blobs[1:]:
        syn = syn.merge(Synopsis.from_bytes(b))
    return syn


def _final_merger(size_us: int, spec: SynopsisSpec | None = None):
    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        if spec is not None:
            spec.ensure_registered()
        syn = _merge_group(pdf)
        w = int(key[0])
        return pd.DataFrame({
            "window_start": [pd.Timestamp(w, unit="us")],
            "window_end": [pd.Timestamp(w + size_us, unit="us") if size_us else
                           pd.Timestamp(w, unit="us")],
            "stratum": [key[1]],
            "state": [syn.to_bytes()],
            "n": [int(syn.n_processed)],
        })

    return fn


def _shuffle_width(spark) -> int:
    """The session's shuffle width as an int, tolerating platforms where
    ``spark.sql.shuffle.partitions`` is non-numeric (e.g. "auto" under
    auto-optimized shuffle) — falls back to the cluster default parallelism."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


def _rescale_degenerate(work: DataFrame) -> DataFrame:
    """Round-robin rebalance a degenerate scan (Condor's ``rescale()`` after
    the source, ``SynopsisBuilder.java:197``): a small parquet table scans as
    1-4 partitions, which would serialize the partial-build phase. Only
    fires when the scan is far narrower than the session's shuffle width AND
    tiny in absolute terms — a real 100 TB scan has thousands of partitions
    and must NOT pay a raw-row shuffle here."""
    p_in = work.rdd.getNumPartitions()
    width = _shuffle_width(work.sparkSession)
    if p_in <= 8 and p_in * 4 <= width:
        return work.repartition(width)
    return work


def build_batch(df: DataFrame, spec: SynopsisSpec) -> DataFrame:
    """Build windowed synopses over a batch DataFrame.

    Returns DataFrame(window_start ts, window_end ts, stratum string,
    state binary, n long) — the WindowedSynopsis analogue
    (``core/.../synopsis/WindowedSynopsis.java:3-30``).
    """
    win = spec.window or GlobalWindow()
    if isinstance(win, Session):
        return _build_session(df, spec, win)
    if isinstance(win, CountTumbling):
        raise ValueError("use build_count_windows() for count windows")
    if spec.kind == "wavelet":
        raise ValueError("use build_ordered() for order-based synopses")

    if isinstance(win, GlobalWindow):
        slice_us, size_us = None, 0
    elif isinstance(win, Tumbling):
        slice_us, size_us = win.slice_us, win.size_us
    elif isinstance(win, Sliding):
        slice_us, size_us = win.slice_us, win.size_us
    else:
        raise ValueError(f"unsupported window {win}")

    work = _rescale_degenerate(_normalize(df, spec, slice_us))
    partials = work.mapInPandas(_partial_builder(spec), schema=_PARTIAL_SCHEMA)

    if isinstance(win, Sliding):
        slide, size, sl = win.slide_us, win.size_us, win.slice_us
        # windows (multiples of slide) containing slice [s, s+sl):
        #   w in [s + sl - size, s], w ≡ 0 (mod slide)   — JVM-side expansion
        first_w = (-F.floor((F.lit(size) - F.lit(sl) - F.col("__slice")) / F.lit(slide))
                   * F.lit(slide)).cast("long")
        last_w = (F.floor(F.col("__slice") / F.lit(slide)) * F.lit(slide)).cast("long")
        # slide > size leaves gaps: slices outside every window explode to nothing
        wins = F.when(first_w <= last_w,
                      F.sequence(first_w, last_w, F.lit(slide).cast("long"))
                      ).otherwise(F.array().cast("array<long>"))
        partials = partials.withColumn("__w", F.explode(wins))
    else:
        partials = partials.withColumn("__w", F.col("__slice"))

    return (partials.groupBy("__w", "__st")
            .applyInPandas(_final_merger(size_us, spec), schema=_FINAL_SCHEMA))


def build_sliding_bucketing(df: DataFrame, spec: SynopsisSpec,
                            win: Sliding) -> DataFrame:
    """Per-element BUCKETING baseline for the slice-sharing comparison —
    the evaluation strategy Condor's general stream slicing replaces
    (``benchmark/.../windowing/Bucketing.java:57-60``: Flink-native
    sliding windows, slide = size/n, every element updates all ~n
    concurrent window buckets).

    Each RAW ROW is replicated into every window containing it BEFORE the
    partial build, so the Python kernel processes each element once per
    window — O(n) per-element cost, vs ``build_batch``'s O(1) (elements
    update one gcd-slice synopsis; only the slice→window expansion, which
    ships sketch blobs, grows with n). Output is row-for-row identical to
    ``build_batch`` with the same ``Sliding`` window (byte-identical for
    deterministic kinds — window boundaries align to gcd slices, so both
    paths emit exactly the windows containing data). Exists to MEASURE
    the slicing win (bench.py concurrent-windows block), not for
    production use."""
    slide, size = win.slide_us, win.size_us
    work = _rescale_degenerate(_normalize(df, spec, None))
    # windows (multiples of slide) containing the point __ts:
    #   w in (ts - size, ts], w ≡ 0 (mod slide) — the build_batch slice
    #   formula with a 1-µs slice
    first_w = (-F.floor((F.lit(size) - 1 - F.col("__ts")) / F.lit(slide))
               * F.lit(slide)).cast("long")
    last_w = (F.floor(F.col("__ts") / F.lit(slide)) * F.lit(slide)).cast("long")
    wins = F.when(first_w <= last_w,
                  F.sequence(first_w, last_w, F.lit(slide).cast("long"))
                  ).otherwise(F.array().cast("array<long>"))
    work = work.withColumn("__slice", F.explode(wins))
    partials = work.mapInPandas(_partial_builder(spec), schema=_PARTIAL_SCHEMA)
    return (partials.withColumn("__w", F.col("__slice"))
            .groupBy("__w", "__st")
            .applyInPandas(_final_merger(size, spec), schema=_FINAL_SCHEMA))


def build_batch_multi(df: DataFrame, spec: SynopsisSpec,
                      windows: list) -> DataFrame:
    """N concurrent tumbling/sliding windows from ONE pass over the data —
    the Scotty general-stream-slicing property (``SynopsisBuilder.java:
    335-337`` ``addWindow`` loop; concurrent-window sweep n ∈ {1,5,10,20,40}
    in ``benchmark/.../windowing/``).

    Slices are built once at gcd granularity of every window's size and
    slide, then each slice's partial synopsis is expanded (JVM-side
    sequence+explode of (window_id, window_start) structs) into all windows
    of all specs that contain it. Per-element update cost is O(1) regardless
    of window count; only the slice→window merge fan-out grows with N, and
    that shuffles sketch blobs, not rows.

    Returns the ``build_batch`` schema plus a leading ``window_id`` int
    column (index into ``windows``).
    """
    from math import gcd

    sizes, slides = [], []
    for w in windows:
        if isinstance(w, Tumbling):
            sizes.append(w.size_us); slides.append(w.size_us)
        elif isinstance(w, Sliding):
            sizes.append(w.size_us); slides.append(w.slide_us)
        else:
            raise ValueError(f"multi-window supports Tumbling/Sliding, got {w}")
    slice_us = 0
    for v in sizes + slides:
        slice_us = gcd(slice_us, v)

    work = _rescale_degenerate(_normalize(df, spec, slice_us))
    partials = work.mapInPandas(_partial_builder(spec), schema=_PARTIAL_SCHEMA)

    per_spec = []
    for wid, (size, slide) in enumerate(zip(sizes, slides)):
        first_w = (-F.floor((F.lit(size) - F.lit(slice_us) - F.col("__slice"))
                            / F.lit(slide)) * F.lit(slide)).cast("long")
        last_w = (F.floor(F.col("__slice") / F.lit(slide)) * F.lit(slide)).cast("long")
        wins = F.when(first_w <= last_w,
                      F.sequence(first_w, last_w, F.lit(slide).cast("long"))
                      ).otherwise(F.array().cast("array<long>"))
        per_spec.append(F.transform(
            wins, lambda w: F.struct(F.lit(wid).alias("wid"), w.alias("w"))))
    exploded = (partials
                .withColumn("__ww", F.explode(F.concat(*per_spec)))
                .withColumn("__wid", F.col("__ww.wid"))
                .withColumn("__w", F.col("__ww.w"))
                .drop("__ww"))

    size_by_id = dict(enumerate(sizes))

    def merger(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        if spec is not None:
            spec.ensure_registered()
        syn = _merge_group(pdf)
        wid, w = int(key[0]), int(key[1])
        return pd.DataFrame({
            "window_id": [wid],
            "window_start": [pd.Timestamp(w, unit="us")],
            "window_end": [pd.Timestamp(w + size_by_id[wid], unit="us")],
            "stratum": [key[2]],
            "state": [syn.to_bytes()],
            "n": [int(syn.n_processed)],
        })

    return (exploded.groupBy("__wid", "__w", "__st")
            .applyInPandas(merger, schema="window_id int, " + _FINAL_SCHEMA))


def build_batch_many(df: DataFrame, specs: list[SynopsisSpec]) -> DataFrame:
    """N different synopses (kinds and/or value columns) from ONE shared
    pass over the data — the analogue of registering several
    ``SynopsisBuilder.build()`` pipelines on one Flink stream in a single
    job graph (the reference's jobs share the source/env exactly this way).

    The scan, normalization projection, Arrow transfer, and group
    sort/boundary computation are paid ONCE; each spec then updates its own
    per-(slice, stratum) synopsis from the shared sorted batch (whole-batch
    ``precompute`` fast path where the kernel offers it). At 100 TB the
    scan+transfer dominates a narrow-table build, so K synopses cost ~1
    pass instead of K.

    Constraints: all specs share ``ts_column``/``window``/``stratify_by``
    and use no priority/tiebreak columns (those kernels are order-sensitive
    and keep their dedicated paths). Returns the ``build_batch`` schema
    plus a leading ``spec_id`` int column (index into ``specs``).
    """
    from pyspark import TaskContext

    win = specs[0].window or GlobalWindow()
    for s in specs:
        if (s.window or GlobalWindow()) != win or s.ts_column != specs[0].ts_column \
                or s.stratify_by != specs[0].stratify_by:
            raise ValueError("build_batch_many specs must share window/ts/strata")
        if s.priority_column or s.tiebreak_column:
            raise ValueError("build_batch_many does not support priority/tiebreak")
    if isinstance(win, (Session, CountTumbling)):
        raise ValueError("build_batch_many supports tumbling/sliding/global windows")
    if isinstance(win, GlobalWindow):
        slice_us, size_us = None, 0
    else:
        slice_us, size_us = win.slice_us, win.size_us

    s0 = specs[0]
    cols = [F.col(s.column).alias(f"__v{i}") for i, s in enumerate(specs)]
    if s0.ts_column:
        cols.append(F.unix_micros(F.col(s0.ts_column).cast("timestamp")).alias("__ts"))
    else:
        cols.append(F.lit(0).cast("long").alias("__ts"))
    if s0.stratify_by:
        cols.append(F.col(s0.stratify_by).cast("string").alias("__st"))
    else:
        cols.append(F.lit("").alias("__st"))
    work = df.select(*cols)
    if slice_us is not None:
        work = work.withColumn(
            "__slice", (F.floor(F.col("__ts") / F.lit(slice_us)) * F.lit(slice_us)))
    else:
        work = work.withColumn("__slice", F.lit(0).cast("long"))
    work = _rescale_degenerate(work)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, Synopsis] = {}
        protos: list[Synopsis | None] = [None] * len(specs)
        fasts: list[bool | None] = [None] * len(specs)
        for pdf in batches:
            if pdf.empty:
                continue
            sl = pdf["__slice"].to_numpy()
            codes, cats = pd.factorize(pdf["__st"], use_na_sentinel=False)
            if len(cats) == 1:
                order = np.argsort(sl, kind="stable")
            else:
                order = np.lexsort((codes, sl))
            sl_s, codes_s = sl[order], codes[order]
            ts_s = pdf["__ts"].to_numpy()[order]
            change = np.flatnonzero((np.diff(sl_s) != 0)
                                    | (np.diff(codes_s) != 0)) + 1
            bounds = np.concatenate([[0], change, [sl_s.shape[0]]])
            keys = []
            for i in range(bounds.size - 1):
                stv = cats[codes_s[int(bounds[i])]]
                keys.append((sl_s[int(bounds[i])],
                             None if pd.isna(stv) else stv))
            for si, spec in enumerate(specs):
                if fasts[si] is None:
                    protos[si] = spec.make_synopsis()
                    fasts[si] = hasattr(protos[si], "precompute") \
                        and not protos[si].NEEDS_TIMESTAMPS
                vals = pdf[f"__v{si}"].to_numpy()[order]
                pre = protos[si].precompute(vals) if fasts[si] else None
                for i in range(bounds.size - 1):
                    lo, hi = int(bounds[i]), int(bounds[i + 1])
                    key = (si, *keys[i])
                    syn = acc.get(key)
                    if syn is None:
                        syn = acc[key] = spec.make_synopsis()
                    if fasts[si]:
                        syn.update_precomputed(pre, lo, hi)
                    else:
                        _update_arrays(
                            syn, spec, vals[lo:hi],
                            ts=ts_s[lo:hi] if syn.NEEDS_TIMESTAMPS else None)
        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        if not acc:
            return
        rows = [(si, int(sl), st, pid, syn.to_bytes(), int(syn.n_processed))
                for (si, sl, st), syn in acc.items()]
        yield pd.DataFrame(rows, columns=["__spec", "__slice", "__st", "__pid",
                                          "state", "n"])

    partials = work.mapInPandas(fn, schema="__spec int, " + _PARTIAL_SCHEMA)

    if isinstance(win, Sliding):
        slide, size, sl_ = win.slide_us, win.size_us, win.slice_us
        first_w = (-F.floor((F.lit(size) - F.lit(sl_) - F.col("__slice"))
                            / F.lit(slide)) * F.lit(slide)).cast("long")
        last_w = (F.floor(F.col("__slice") / F.lit(slide)) * F.lit(slide)).cast("long")
        wins = F.when(first_w <= last_w,
                      F.sequence(first_w, last_w, F.lit(slide).cast("long"))
                      ).otherwise(F.array().cast("array<long>"))
        partials = partials.withColumn("__w", F.explode(wins))
    else:
        partials = partials.withColumn("__w", F.col("__slice"))

    def merger(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        for s in specs:
            s.ensure_registered()
        syn = _merge_group(pdf)
        w = int(key[1])
        return pd.DataFrame({
            "spec_id": [int(key[0])],
            "window_start": [pd.Timestamp(w, unit="us")],
            "window_end": [pd.Timestamp(w + size_us, unit="us") if size_us
                           else pd.Timestamp(w, unit="us")],
            "stratum": [key[2]],
            "state": [syn.to_bytes()],
            "n": [int(syn.n_processed)],
        })

    return (partials.groupBy("__spec", "__w", "__st")
            .applyInPandas(merger, schema="spec_id int, " + _FINAL_SCHEMA))


def _build_session(df: DataFrame, spec: SynopsisSpec, win: Session) -> DataFrame:
    """Session windows via a two-phase gaps-and-islands build that never
    funnels raw rows of one stratum (or, unstratified, the whole table)
    through a single task:

      phase 1 — ``repartitionByRange(__st, __ts)`` + per-partition sort:
        every partition holds a contiguous (stratum, time) range, so
        partition-local sessions (vectorized ``np.diff > gap`` splits) are
        exact EXCEPT possibly at the two partition edges. A hot stratum
        spreads over many range partitions instead of hash-landing on one;
        with no strata the time range alone balances the table.
      phase 2 — only each partition's FIRST and LAST mini-session can
        straddle an edge. Their metadata (O(partitions) rows, no blobs) is
        collected, cross-edge chains (same stratum, gap ≤ threshold) are
        identified, and just the chained sessions are re-merged in an
        ``applyInPandas`` group per chain; everything else passes through
        untouched. Merge order inside a chain is (first_us, pid) —
        deterministic, so N-vs-4N parallelism yields identical rows.

    Matches the streaming path's mini-session + gap-merge semantics
    (stateful.py) and Spark's ``session_window``: window =
    [first_ts, last_ts + gap)."""
    from pyspark import StorageLevel, TaskContext

    gap = win.gap_us
    work = _normalize(df, spec, None)
    p = max(df.rdd.getNumPartitions(), _shuffle_width(df.sparkSession))
    work = (work.repartitionByRange(p, "__st", "__ts")
                .sortWithinPartitions("__st", "__ts"))

    def minis(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        parts = [pdf for pdf in batches if not pdf.empty]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        rows = []
        for st, sub in pdf.groupby("__st", sort=False, dropna=False):
            ts = sub["__ts"].to_numpy()
            vals = sub["__v"].to_numpy()
            prio = sub["__prio"].to_numpy() if "__prio" in sub else None
            tb = sub["__tb"].to_numpy() if "__tb" in sub else None
            breaks = np.flatnonzero(np.diff(ts) > gap) + 1
            bounds = np.concatenate([[0], breaks, [ts.shape[0]]])
            st_out = None if pd.isna(st) else st
            for i in range(bounds.size - 1):
                lo, hi = int(bounds[i]), int(bounds[i + 1])
                syn = spec.make_synopsis()
                _update_arrays(syn, spec, vals[lo:hi], ts=ts[lo:hi],
                               prio=None if prio is None else prio[lo:hi],
                               tb=None if tb is None else tb[lo:hi])
                rows.append((pid, len(rows), st_out, int(ts[lo]),
                             int(ts[hi - 1]), syn.to_bytes(),
                             int(syn.n_processed)))
        n_sess = len(rows)
        yield pd.DataFrame(
            [(r[0], r[1], r[1] == 0 or r[1] == n_sess - 1, *r[2:])
             for r in rows],
            columns=["__pid", "__sidx", "__edge", "__st", "first_us",
                     "last_us", "state", "n"])

    mini_schema = ("__pid long, __sidx long, __edge boolean, __st string, "
                   "first_us long, last_us long, state binary, n long")
    mini_df = (work.mapInPandas(minis, schema=mini_schema)
               .persist(StorageLevel.MEMORY_AND_DISK))

    # driver sees only edge-session metadata: ≤ 2 rows per partition
    edges = (mini_df.filter("__edge")
             .select("__pid", "__sidx", "__st", "first_us", "last_us")
             .collect())
    by_pid: dict[int, list] = {}
    for r in edges:
        by_pid.setdefault(r["__pid"], []).append(r)
    chain_of: dict[tuple, int] = {}
    n_chains = 0
    cur = None          # open chain id carried across single-session partitions
    prev = None         # last edge-session Row of the previous non-empty pid
    for pid in sorted(by_pid):
        rows = sorted(by_pid[pid], key=lambda r: r["__sidx"])
        first, last = rows[0], rows[-1]
        if (prev is not None and prev["__st"] == first["__st"]
                and first["first_us"] - prev["last_us"] <= gap):
            if cur is None:
                cur = n_chains
                n_chains += 1
                chain_of[(prev["__pid"], prev["__sidx"])] = cur
            chain_of[(pid, first["__sidx"])] = cur
            if first["__sidx"] != last["__sidx"]:
                cur = None  # chain ends inside this partition
        else:
            cur = None
        prev = last

    def finalize_row(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "window_start": pd.to_datetime(pdf["first_us"], unit="us"),
            "window_end": pd.to_datetime(pdf["last_us"] + gap, unit="us"),
            "stratum": pdf["__st"],
            "state": pdf["state"],
            "n": pdf["n"].astype("int64"),
        })

    if not chain_of:
        out = mini_df.mapInPandas(
            lambda it: (finalize_row(pdf) for pdf in it if not pdf.empty),
            schema=_FINAL_SCHEMA)
        out = out.persist(StorageLevel.MEMORY_AND_DISK)
        out.count()
        mini_df.unpersist()
        return out

    # chain membership attached JVM-side: chain_of is O(partitions) small
    # (only edge sessions chain), so a (pid, sidx) lookup replaces the
    # former mapInPandas tagging pass — one full Arrow round-trip +
    # persist over every blob row saved (r5). Small maps inline as a
    # literal (no join in the plan); past a few thousand entries (a
    # many-thousand-partition cluster build) a literal that size strains
    # Catalyst, so the lookup becomes a broadcast hash join instead.
    if len(chain_of) <= _CHAIN_MAP_INLINE_MAX:
        key_expr = F.col("__pid") * F.lit(1 << 40) + F.col("__sidx")
        mapping = F.create_map(*[
            F.lit(v) for (pid_, sidx_), cid in chain_of.items()
            for v in ((pid_ << 40) + sidx_, cid)])
        tagged = mini_df.withColumn(
            "__chain", F.coalesce(F.try_element_at(mapping, key_expr),
                                  F.lit(-1)))
    else:
        chain_df = mini_df.sparkSession.createDataFrame(
            [(pid_, sidx_, cid) for (pid_, sidx_), cid in chain_of.items()],
            "__pid long, __sidx long, __cid long")
        tagged = (mini_df.join(F.broadcast(chain_df), ["__pid", "__sidx"],
                               "left")
                  .withColumn("__chain", F.coalesce("__cid", F.lit(-1)))
                  .drop("__cid"))
    plain = tagged.filter("__chain < 0").mapInPandas(
        lambda it: (finalize_row(pdf) for pdf in it if not pdf.empty),
        schema=_FINAL_SCHEMA)

    def merge_chain(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        spec.ensure_registered()
        pdf = pdf.sort_values(["first_us", "__pid"], kind="stable")
        syn = Synopsis.from_bytes(pdf["state"].iloc[0])
        for b in pdf["state"].iloc[1:]:
            syn = syn.merge(Synopsis.from_bytes(b))
        return pd.DataFrame({
            "window_start": [pd.Timestamp(int(pdf["first_us"].min()), unit="us")],
            "window_end": [pd.Timestamp(int(pdf["last_us"].max()) + gap, unit="us")],
            "stratum": [pdf["__st"].iloc[0]],
            "state": [syn.to_bytes()],
            "n": [int(syn.n_processed)],
        })

    merged = (tagged.filter("__chain >= 0")
              .groupBy("__chain").applyInPandas(merge_chain, schema=_FINAL_SCHEMA))
    out = plain.unionByName(merged).persist(StorageLevel.MEMORY_AND_DISK)
    out.count()  # materialize before dropping the upstream cache
    mini_df.unpersist()
    return out


def _global_order(df: DataFrame, spec: SynopsisSpec, num_partitions: int | None,
                  with_offsets: bool = True, by_stratum: bool = False):
    """Deterministic global order by (ts, tiebreak): range partition + local
    sort + per-partition offsets (the OrderAndIndex analogue,
    ``processor/divide/OrderAndIndex.java:41-67`` — but parallel, not par=1).

    ``by_stratum=True`` prepends the stratum to the order keys: each
    stratum's rows become a contiguous, internally (ts, tiebreak)-ordered
    run across the range partitions — the order-based analogue of
    ``StratifiedNonMergeableSynopsisFunction.java:50-66``, but partitioned
    by range instead of keyBy-hash so one hot stratum spans many tasks.

    ``with_offsets=False`` skips the offsets pre-job AND the persist:
    consumers that derive positions from slice order alone (the wavelet
    slice-manager path) then run one single job, so there is no
    cross-job partitioning-stability concern and nothing to pin.
    """
    from pyspark import StorageLevel

    work = _normalize(df, spec, None)
    if "__tb" not in work.columns:
        work = work.withColumn("__tb", F.lit(0).cast("long"))
    p = num_partitions or max(work.rdd.getNumPartitions(),
                              _shuffle_width(df.sparkSession))
    keys = ["__st", "__ts", "__tb"] if by_stratum else ["__ts", "__tb"]
    work = (work.repartitionByRange(p, *keys)
                .sortWithinPartitions(*keys))
    if not with_offsets:
        return work, None, None
    # persist pins the (sampled) range partitioning so the offsets job and
    # the build job see identical partitions
    work = work.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = (work.withColumn("__pid", F.spark_partition_id())
                 .groupBy("__pid").count().collect())  # P rows only
    counts = {r["__pid"]: r["count"] for r in sizes}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    return work, offsets, acc


def build_count_windows(df: DataFrame, spec: SynopsisSpec,
                        num_partitions: int | None = None) -> DataFrame:
    """Count-based tumbling windows (keyBy.countWindow analogue,
    ``SynopsisBuilder.java:219-221``): window id = global index // count."""
    from pyspark import TaskContext

    count = spec.window.count
    work, offsets, _total = _global_order(df, spec, num_partitions)
    b_offsets = offsets  # tiny dict, shipped in the closure

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        idx = b_offsets.get(pid, 0)
        acc: dict[tuple, Synopsis] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            gidx = idx + np.arange(len(pdf), dtype=np.int64)
            idx += len(pdf)
            pdf = pdf.assign(__wid=gidx // count)
            for key, sub in pdf.groupby(["__wid", "__st"], sort=False, dropna=False):
                syn = acc.get(key)
                if syn is None:
                    syn = acc[key] = spec.make_synopsis()
                _update(syn, spec, sub)
        if not acc:
            return
        rows = [(int(wid), None if pd.isna(st) else st, pid, syn.to_bytes(),
                 int(syn.n_processed))
                for (wid, st), syn in acc.items()]
        yield pd.DataFrame(rows, columns=["__slice", "__st", "__pid", "state", "n"])

    partials = work.mapInPandas(partial, schema=_PARTIAL_SCHEMA)

    def merger(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        syn = _merge_group(pdf)
        wid = int(key[0])
        return pd.DataFrame({
            "window_id": [wid], "lo_idx": [wid * count], "hi_idx": [(wid + 1) * count],
            "stratum": [key[1]], "state": [syn.to_bytes()], "n": [int(syn.n_processed)],
        })

    return (partials.groupBy("__slice", "__st").applyInPandas(
        merger, schema=("window_id long, lo_idx long, hi_idx long, "
                        "stratum string, state binary, n long")))


def build_ordered(df: DataFrame, spec: SynopsisSpec,
                  num_partitions: int | None = None) -> DataFrame:
    """Order-based build (wavelet): one slice per range partition, unified by
    concatenation — the NonMergeableSynopsisManager path
    (``core/.../synopsis/NonMergeableSynopsisManager.java:5-35``,
    ``Wavelets/SliceWaveletsManager.java:40-49``).

    Returns DataFrame(stratum string, slice_idx long, length long,
    state binary); element offsets are the running sum of lengths in
    slice_idx order *within a stratum* (computed by the consumer from this
    single job's output, so they are consistent with the build by
    construction). With ``spec.stratify_by`` set, each stratum is ordered
    independently (``StratifiedNonMergeableSynopsisFunction.java:50-66``
    semantics) — the range partitioning keeps strata contiguous, so a
    (partition, stratum) pair is one contiguous ordered slice and
    ``slice_idx = partition id`` is monotone within every stratum.
    """
    from pyspark import TaskContext

    # offsets skipped: slice offsets are recomputed by the consumer from the
    # returned lengths in slice_idx order, so this is one single job — no
    # persist, no pre-count (saves a full pass over the sorted data)
    work, _offsets, _total = _global_order(df, spec, num_partitions,
                                           with_offsets=False,
                                           by_stratum=bool(spec.stratify_by))

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        acc: dict = {}  # stratum -> (synopsis, n); insertion = (st, ts) order
        for pdf in batches:
            if pdf.empty:
                continue
            for st, sub in pdf.groupby("__st", sort=False, dropna=False):
                st = None if pd.isna(st) else st
                pair = acc.get(st)
                if pair is None:
                    pair = acc[st] = [spec.make_synopsis(), 0]
                pair[0].update_batch(sub["__v"].to_numpy())
                pair[1] += len(sub)
        if not acc:
            return
        for syn, _n in acc.values():
            if hasattr(syn, "finalize"):
                syn.finalize()
        yield pd.DataFrame({
            "stratum": list(acc.keys()),
            "slice_idx": [pid] * len(acc),
            "length": [n for _, n in acc.values()],
            "state": [syn.to_bytes() for syn, _ in acc.values()]})

    out = work.mapInPandas(
        build, schema="stratum string, slice_idx long, length long, state binary")
    work.unpersist()
    return out


def build_ordered_round_robin(df: DataFrame, spec: SynopsisSpec,
                              parallelism: int) -> DataFrame:
    """Order-based build with round-robin division: global order-index i is
    routed to wavelet i % parallelism at local index i // parallelism — the
    ``OrderAndIndex`` + ``DistributedWaveletsManager`` path
    (``processor/divide/OrderAndIndex.java:58-66``,
    ``Wavelets/DistributedWaveletsManager.java:21-29``).

    Shuffles (route key, local idx, value) rows once — the same volume the
    reference moves through its keyBy after OrderAndIndex. Returns
    DataFrame(slice_idx long, length long, state binary) with slice_idx =
    the round-robin residue; consume via
    ``synopsis.wavelet.DistributedWaveletsManager``.
    """
    work, offsets, _total = _global_order(df, spec, None)
    P = int(parallelism)

    from pyspark import TaskContext

    def index_and_route(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        seen = offsets.get(pid, 0)
        for pdf in batches:
            if pdf.empty:
                continue
            gidx = np.arange(seen, seen + len(pdf), dtype=np.int64)
            seen += len(pdf)
            yield pd.DataFrame({"__rr": gidx % P, "__lidx": gidx // P,
                                "__v": pdf["__v"].to_numpy()})

    routed = work.mapInPandas(index_and_route,
                              schema="__rr long, __lidx long, __v double")

    def build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        spec.ensure_registered()
        pdf = pdf.sort_values("__lidx", kind="stable")
        syn = spec.make_synopsis()
        syn.update_batch(pdf["__v"].to_numpy())
        if hasattr(syn, "finalize"):
            syn.finalize()
        return pd.DataFrame({"slice_idx": [int(key[0])], "length": [len(pdf)],
                             "state": [syn.to_bytes()]})

    out = (routed.groupBy("__rr")
           .applyInPandas(build, schema="slice_idx long, length long, state binary"))
    out = out.cache()
    out.count()  # materialize before unpersisting the ordered input
    work.unpersist()
    return out


def build_equidepth_exact(df: DataFrame, column: str, num_buckets: int,
                          tiebreak_column: str | None = None) -> DataFrame:
    """Exact equi-depth histogram from fully sorted input — the
    ``EquiDepthHistBuilder`` path (core/.../Histograms/
    EquiDepthHistBuilder.java:19-49: boundaries at rank i·n/B over a sorted
    array).

    Distributed total order, never a single-task sort: range partition +
    per-partition sort, global ranks from per-partition row-count offsets
    (the ``_global_order`` machinery), ntile-compatible bucket assignment
    from the rank (first n%B buckets hold ⌈n/B⌉ rows, the rest ⌊n/B⌋ —
    byte-identical to SQL ``ntile`` under the same total order, so the
    DuckDB oracle stays valid), then per-partition partial (bucket, lo, hi,
    count) and a B-row final merge. Only the offsets pre-count and the tiny
    final aggregate shuffle; pass ``tiebreak_column`` when ``column`` has
    ties so the order (hence bucket mins/maxes at boundaries) is total.

    This is the exact/reference path and costs a full sort; the streaming
    scale paths are BASH (``kind='bash'``) and DDSketch quantile boundaries
    (``evaluate.equidepth_from_ddsketch``), which never sort.
    """
    from pyspark import StorageLevel, TaskContext

    spark = df.sparkSession
    tb = (F.col(tiebreak_column).cast("long") if tiebreak_column
          else F.lit(0).cast("long"))
    work = df.select(F.col(column).cast("double").alias("__v"), tb.alias("__tb"))
    p = max(work.rdd.getNumPartitions(), _shuffle_width(spark))
    work = (work.repartitionByRange(p, "__v", "__tb")
                .sortWithinPartitions("__v", "__tb")
                .persist(StorageLevel.MEMORY_AND_DISK))  # pin sampled ranges
    sizes = (work.withColumn("__pid", F.spark_partition_id())
                 .groupBy("__pid").count().collect())    # P rows only
    counts = {r["__pid"]: r["count"] for r in sizes}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    n, B = acc, int(num_buckets)
    q, r = divmod(n, B)
    cut = r * (q + 1)  # ranks below cut → big buckets of q+1 rows

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        idx = offsets.get(pid, 0)
        for pdf in batches:
            if pdf.empty:
                continue
            g = idx + np.arange(len(pdf), dtype=np.int64)
            idx += len(pdf)
            bucket = np.where(g < cut, g // max(q + 1, 1),
                              r + (g - cut) // max(q, 1))
            sub = pd.DataFrame({"bucket": bucket, "v": pdf["__v"].to_numpy()})
            agg = (sub.groupby("bucket")["v"]
                   .agg(["min", "max", "count"]).reset_index())
            yield pd.DataFrame({"bucket": agg["bucket"].astype("int64"),
                                "lo": agg["min"], "hi": agg["max"],
                                "cnt": agg["count"].astype("int64")})

    partials = work.mapInPandas(
        partial, schema="bucket long, lo double, hi double, cnt long")
    out = (partials.groupBy("bucket")
           .agg(F.min("lo").alias("lo"), F.max("hi").alias("hi"),
                F.sum("cnt").alias("depth"))
           .orderBy("bucket"))
    out = out.cache()
    out.count()  # materialize the B-row result before dropping the sort
    work.unpersist()
    return out
