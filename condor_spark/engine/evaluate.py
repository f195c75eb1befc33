"""Evaluation layer — Condor's canonical synopsis queries as DataFrame ops.

Re-expresses ``flinkScottyConnector/.../evaluator/ApproximateDataAnalytics.java``:
  * ``query_latest``       (:39-51)  — evaluate against the newest window
  * ``query_timestamped``  (:64-76)  — evaluate against the window containing
                                       each query's timestamp (interval join)
  * stratified variants    (:79-117) — stratum joins the key
  * ``QueryFunction`` hook (evaluator/utils/QueryFunction.java:16-19) — the
    per-kind kernels below.

Everything is a join + ``applyInPandas`` over the synopsis table: the blob is
decoded once per (window, stratum) group and the whole query batch is
answered vectorized.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..synopsis.base import Synopsis


def apply_per_window(syn_df: DataFrame, fn: Callable[[Synopsis, pd.Series], pd.DataFrame],
                     schema: str) -> DataFrame:
    """Run ``fn(synopsis, row)`` for every windowed-synopsis row.

    fn returns a small pd.DataFrame; window/stratum columns are prefixed
    automatically when present in the schema.
    """

    def mapper(batches):
        for pdf in batches:
            outs = []
            for _, row in pdf.iterrows():
                syn = Synopsis.from_bytes(row["state"])
                out = fn(syn, row)
                if out is None or out.empty:
                    continue
                for c in ("window_start", "window_end", "stratum"):
                    if c in pdf.columns and c not in out.columns and c in schema:
                        out[c] = row[c]
                outs.append(out)
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return syn_df.mapInPandas(mapper, schema=schema)


def latest(syn_df: DataFrame, per_stratum: bool = True) -> DataFrame:
    """Newest windowed synopsis (per stratum), the queryLatest target."""
    keys = ["stratum"] if per_stratum else []
    w = syn_df.groupBy(*keys).agg(F.max("window_end").alias("window_end"))
    return syn_df.join(F.broadcast(w), keys + ["window_end"], "inner")


def query_timestamped(syn_df: DataFrame, queries_df: DataFrame,
                      fn: Callable[[Synopsis, pd.DataFrame], pd.DataFrame],
                      schema: str, stratified: bool = False) -> DataFrame:
    """Answer each (q_ts, ...) query with the synopsis of the window that
    contains it (QueryTimestampedFunction.java:50-96 floor-lookup semantics:
    window_start <= q_ts < window_end)."""
    cond = [(queries_df["q_ts"] >= syn_df["window_start"]),
            (queries_df["q_ts"] < syn_df["window_end"])]
    if stratified:
        cond.append(queries_df["stratum"] == syn_df["stratum"])
        joined = F.broadcast(queries_df).join(
            syn_df, cond, "inner").drop(queries_df["stratum"])
    else:
        joined = F.broadcast(queries_df).join(syn_df, cond, "inner")

    def grouped(key, pdf: pd.DataFrame) -> pd.DataFrame:
        syn = Synopsis.from_bytes(pdf["state"].iloc[0])
        out = fn(syn, pdf)
        for c in ("window_start", "window_end", "stratum"):
            if c in schema and c not in out.columns:
                out[c] = pdf[c].iloc[0]
        return out

    return joined.groupBy("window_start", "stratum").applyInPandas(grouped, schema=schema)


# ---------------------------------------------------------------------------
# canonical per-kind query kernels (SURVEY.md §2.3 canonical query set)
# ---------------------------------------------------------------------------

def frequency_estimates(syn_df: DataFrame, keys: list) -> DataFrame:
    """Count-Min frequency per key per window (CountMinSketch.query:96-113).

    ``keys`` must have the same type as the built column (hash inputs must
    match); they are stringified only for the output schema.
    """
    def fn(syn, row):
        est = syn.query(pd.Series(keys))
        return pd.DataFrame({"key": [str(k) for k in keys],
                             "est_count": est.astype("int64")})

    return apply_per_window(
        syn_df, fn,
        "window_start timestamp, window_end timestamp, stratum string, "
        "key string, est_count long")


def distinct_estimates(syn_df: DataFrame) -> DataFrame:
    """HLL distinct count per window (HyperLogLogSketch.distinctItemsEstimator)."""
    def fn(syn, row):
        return pd.DataFrame({"est_distinct": [int(syn.estimate())]})

    return apply_per_window(
        syn_df, fn,
        "window_start timestamp, window_end timestamp, stratum string, est_distinct long")


def membership(syn_df: DataFrame, keys: list) -> DataFrame:
    """Bloom/Cuckoo membership per key per window (BloomFilter.query:72-86)."""
    def fn(syn, row):
        member = syn.query(pd.Series(keys))
        return pd.DataFrame({"key": [str(k) for k in keys],
                             "member": member.astype(bool)})

    return apply_per_window(
        syn_df, fn,
        "window_start timestamp, window_end timestamp, stratum string, "
        "key string, member boolean")


def quantile_estimates(syn_df: DataFrame, qs: list[float]) -> DataFrame:
    """DDSketch quantiles per window (DDSketch.getValueAtQuantile:198-239)."""
    def fn(syn, row):
        return pd.DataFrame({"q": qs, "est_value": syn.quantiles(qs)})

    return apply_per_window(
        syn_df, fn,
        "window_start timestamp, window_end timestamp, stratum string, "
        "q double, est_value double")


def heavy_hitter_estimates(syn_df: DataFrame, min_count: int) -> DataFrame:
    """Misra-Gries heavy hitters per window: every summarized key whose
    estimate reaches ``min_count``, ordered (-est, key) inside the blob
    (synopsis/mg.py) — key enumeration over unbounded domains, the query
    Count-Min cannot answer without an external key list."""
    def fn(syn, row):
        keys, cnts = syn.heavy_hitters(min_count)
        return pd.DataFrame({"key": [str(k) for k in keys],
                             "est_count": cnts.astype("int64")})

    return apply_per_window(
        syn_df, fn,
        "window_start timestamp, window_end timestamp, stratum string, "
        "key string, est_count long")


def topk_estimates(syn_df: DataFrame, k: int) -> DataFrame:
    """Misra-Gries top-k keys per window, deterministic (-est, key) order;
    ``rank`` disambiguates ties for the SQL twin (row_number over the same
    ordering)."""
    def fn(syn, row):
        keys, cnts = syn.topk(k)
        return pd.DataFrame({"rank": np.arange(1, len(keys) + 1, dtype="int64"),
                             "key": [str(x) for x in keys],
                             "est_count": cnts.astype("int64")})

    return apply_per_window(
        syn_df, fn,
        "window_start timestamp, window_end timestamp, stratum string, "
        "rank long, key string, est_count long")


def decayed_weights(syn_df: DataFrame) -> DataFrame:
    """Per-key exponentially time-decayed weights as of each window's
    newest event (synopsis/decay.py) — the trending query: a key's weight
    halves per half_life of inactivity. Emits every surviving counter,
    (-weight, key) ordered; callers threshold on the ROUNDED weight so
    the engine and its SQL oracle agree at the cut."""
    def fn(syn, row):
        keys, wts = syn.topk(len(syn.keys))
        return pd.DataFrame({"key": [str(k) for k in keys],
                             "est_weight": wts.astype("float64")})

    return apply_per_window(
        syn_df, fn,
        "window_start timestamp, window_end timestamp, stratum string, "
        "key string, est_weight double")


def entropy_estimates(syn_df: DataFrame) -> DataFrame:
    """Shannon entropy (nats) of the per-window key distribution, computed
    from the Misra-Gries count table — the diversity/skew monitor a
    training-data pipeline runs per window (a collapsing entropy flags a
    stuck or spamming source). Exact in the oversized-capacity regime
    (the counts ARE the distribution); the plug-in estimator over the
    surviving counters when undersized."""
    def fn(syn, row):
        c = syn.cnts.astype(np.float64)
        n = float(c.sum())
        if n <= 0:
            return pd.DataFrame({"entropy": [0.0]})
        p = c / n
        return pd.DataFrame({"entropy": [float(-(p * np.log(p)).sum())]})

    return apply_per_window(
        syn_df, fn,
        "window_start timestamp, window_end timestamp, stratum string, "
        "entropy double")


def f2_estimates(syn_df: DataFrame) -> DataFrame:
    """AMS F2 (self-join size) per window (FastAGMS.estimateF2)."""
    def fn(syn, row):
        return pd.DataFrame({"est_f2": [float(syn.estimate_f2())]})

    return apply_per_window(
        syn_df, fn,
        "window_start timestamp, window_end timestamp, stratum string, est_f2 double")


def _blob_pair_apply(syn_a: DataFrame, syn_b: DataFrame,
                     pair_fn: Callable[[Synopsis, Synopsis], dict],
                     schema: str) -> DataFrame:
    """Join ONE synopsis blob per (window, stratum) from each side and
    apply ``pair_fn(sa, sb) -> result-column dict``. Shared scaffolding for
    every two-blob evaluator (join size, overlap, ...).

    Scale: the join carries one sketch blob per (window, stratum) side —
    row counts are window counts, not event counts — so the equi-join
    shuffles O(windows×strata) short rows regardless of input size; both
    sides were already reduced by the distributed build. Windows missing
    from either side are OMITTED (inner join), not emitted as zeros —
    callers averaging over a fixed window set must outer-join a window
    spine themselves.

    Output columns are emitted in DECLARED SCHEMA ORDER, so the result is
    correct whether the pandas-to-Arrow bridge assigns by name or by
    position (spark.sql.legacy.execution.pandas.groupedMap.assignColumnsByName)."""
    b = syn_b.select("window_start", "window_end", "stratum",
                     F.col("state").alias("state_b"))
    joined = syn_a.join(b, ["window_start", "window_end", "stratum"], "inner")
    names = [f.strip().split(" ")[0] for f in schema.split(",")]

    def mapper(batches):
        for pdf in batches:
            outs = []
            for _, row in pdf.iterrows():
                o = {"window_start": row["window_start"],
                     "window_end": row["window_end"],
                     "stratum": row["stratum"]}
                o.update(pair_fn(Synopsis.from_bytes(row["state"]),
                                 Synopsis.from_bytes(row["state_b"])))
                outs.append({k: o[k] for k in names})
            if outs:
                yield pd.DataFrame(outs)

    return joined.mapInPandas(mapper, schema=schema)


def join_size_estimates(syn_a: DataFrame, syn_b: DataFrame) -> DataFrame:
    """AGMS equi-join size |A ⋈ B| per window: each (window, stratum) blob
    pair answers via ``FastAGMS.estimate_join`` (median row inner product).

    The reference only ships the self-join case (FastAGMS.estimateF2,
    core/.../Sketches/FastAGMS.java:219); this is the two-stream
    generalization. Scale + omitted-window semantics: ``_blob_pair_apply``."""
    return _blob_pair_apply(
        syn_a, syn_b,
        lambda sa, sb: {"est_join": float(sa.estimate_join(sb))},
        "window_start timestamp, window_end timestamp, "
        "stratum string, est_join double")


def overlap_estimates(syn_a: DataFrame, syn_b: DataFrame) -> DataFrame:
    """KMV set-operation estimates between two corpora per window: each
    (window, stratum) blob pair answers via ``KMVSketch.overlap`` (Beyer
    et al. 2007 — union / intersection / Jaccard from the merged min-k
    set). This is the train/test-contamination query: "how much of corpus
    B is already in corpus A?" answered without joining the raw corpora.
    Scale + omitted-window semantics: ``_blob_pair_apply``."""
    return _blob_pair_apply(
        syn_a, syn_b, lambda sa, sb: sa.overlap(sb),
        "window_start timestamp, window_end timestamp, "
        "stratum string, est_a long, est_b long, "
        "est_union long, est_intersection long, jaccard double")


def overlap_strata(built: DataFrame, stratum_a: str,
                   stratum_b: str) -> DataFrame:
    """Overlap between two strata of ONE stratified build — the common
    call shape (one shared-scan build, then pairwise reports). Erases the
    stratum label so the blob join pairs windows across the two corpora;
    implemented here once rather than at every call site."""
    pick = lambda s: (built.filter(F.col("stratum") == s)
                      .withColumn("stratum", F.lit("")))
    return overlap_estimates(pick(stratum_a), pick(stratum_b))


def histogram_counts(syn_df: DataFrame) -> DataFrame:
    """Equi-width bucket counts per window (EquiWidthHistogramAccuracy.java:72-80)."""
    def fn(syn, row):
        return pd.DataFrame({"bucket": range(syn.num_buckets),
                             "cnt": syn.frequency.astype("int64")})

    return apply_per_window(
        syn_df, fn,
        "window_start timestamp, window_end timestamp, stratum string, "
        "bucket int, cnt long")


def sample_rows(syn_df: DataFrame, value_type: str = "double") -> DataFrame:
    """Explode sampler contents per window (ReservoirSamplingAccuracy.java:66-77)."""
    def fn(syn, row):
        if hasattr(syn, "sorted_sample"):
            vals = syn.sorted_sample()[0]
        else:
            vals = syn.sample
        return pd.DataFrame({"value": list(vals)})

    return apply_per_window(
        syn_df, fn,
        f"window_start timestamp, window_end timestamp, stratum string, value {value_type}")


def equidepth_buckets(syn_df: DataFrame) -> DataFrame:
    """BASH finalized equi-depth boundaries per window
    (BarSplittingHistogram.buildEquiDepthHistogram:270-311)."""
    def fn(syn, row):
        bounds, depth = syn.build_equidepth()
        return pd.DataFrame({"bucket": range(len(bounds) - 1),
                             "lo": bounds[:-1], "hi": bounds[1:],
                             "depth": depth})

    return apply_per_window(
        syn_df, fn,
        "window_start timestamp, window_end timestamp, stratum string, "
        "bucket int, lo double, hi double, depth double")


def equidepth_from_ddsketch(syn_df: DataFrame, num_buckets: int) -> DataFrame:
    """Equi-depth boundaries from a windowed DDSketch
    (SplitAndMergeWithDDSketch analogue)."""
    def fn(syn, row):
        bounds = syn.equidepth_bounds(num_buckets)
        return pd.DataFrame({"bucket": range(num_buckets),
                             "lo": bounds[:-1], "hi": bounds[1:]})

    return apply_per_window(
        syn_df, fn,
        "window_start timestamp, window_end timestamp, stratum string, "
        "bucket int, lo double, hi double")


def sliding_via_inversion(syn_slices: DataFrame, size_slices: int) -> DataFrame:
    """Sliding windows for INVERTIBLE synopses via prefix differences:
    window ending at slice k = prefix(k) − prefix(k − size) — the relational
    analogue of Scotty's invertible slide-eviction
    (``processor/compute/scotty/InvertibleSynopsisFunction.java:64-114``):
    each slice is merged into the running prefix exactly once, and expired
    slices leave via ``invert`` instead of a rebuild.

    ``syn_slices``: per-slice synopses (window_start == slice start), any
    number of strata. Prefix accumulation is inherently sequential *within*
    a stratum but independent *across* strata, so each stratum's slice list
    is differenced executor-side in one ``applyInPandas`` group — strata run
    in parallel and nothing is collected to the driver (the reference is
    parallelism-1 here; at a year of 6-hour slices × strata that serial
    driver merge is exactly the plan that dies at 100×).
    """
    size = int(size_slices)

    def grouped(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("window_start", kind="stable")
        prefixes: list[bytes] = []          # snapshot per step, as bytes
        acc = None
        for b in pdf["state"]:
            s = Synopsis.from_bytes(b)
            acc = s if acc is None else acc.merge(s)
            prefixes.append(acc.to_bytes())
        starts = pdf["window_start"].tolist()
        ends = pdf["window_end"].tolist()
        rows = []
        for k in range(len(prefixes)):
            win = Synopsis.from_bytes(prefixes[k])
            if k - size >= 0:
                win = win.invert(Synopsis.from_bytes(prefixes[k - size]))
            rows.append((starts[max(0, k - size + 1)], ends[k], key[0],
                         win.to_bytes(), int(win.n_processed)))
        return pd.DataFrame(rows, columns=["window_start", "window_end",
                                           "stratum", "state", "n"])

    return syn_slices.groupBy("stratum").applyInPandas(
        grouped,
        schema="window_start timestamp, window_end timestamp, stratum string, "
               "state binary, n long")


def wavelet_range_sums(slices_df: DataFrame, ranges: list[tuple[int, int]]) -> DataFrame:
    """Range-sum queries over the unified slice manager
    (HaarWaveletsAccuracy.java:69-84; DistributedWaveletsManager.java:42-76).

    Unification runs EXECUTOR-side: the unstratified case is the
    single-stratum case of ``wavelet_range_sums_stratified`` (one constant
    group), so only sketch blobs move through one ``applyInPandas`` task
    and nothing is collected to the driver — the reference's parallelism-1
    ``UnifyToManager`` placed on an executor instead of the coordinator
    (at 10^5 input partitions the slice blobs are 100s of MB; the driver
    must not hold them).
    """
    from pyspark.sql import functions as F

    tagged = slices_df.withColumn("stratum", F.lit(""))
    return (wavelet_range_sums_stratified(tagged, ranges)
            .select("lo_idx", "hi_idx", "range_sum"))


def wavelet_range_sums_stratified(slices_df: DataFrame,
                                  ranges: list[tuple[int, int]]) -> DataFrame:
    """Per-stratum range sums over stratified ordered slices (the
    StratifiedNonMergeableSynopsisFunction query surface): one
    SliceWaveletsManager per stratum, unified executor-side in one
    ``applyInPandas`` group per stratum — strata evaluate in parallel and
    only sketch blobs move (cf. ``NonMergeableSynopsisUnifier`` /
    ``UnifyToManager``, which the reference runs at parallelism 1)."""
    from ..synopsis.wavelet import SliceWaveletsManager

    def grouped(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("slice_idx", kind="stable")
        triples, off = [], 0
        for ln, blob in zip(pdf["length"], pdf["state"]):
            triples.append((off, int(ln), Synopsis.from_bytes(blob)))
            off += int(ln)
        mgr = SliceWaveletsManager(triples)
        return pd.DataFrame({
            "stratum": [key[0]] * len(ranges),
            "lo_idx": [int(lo) for lo, _ in ranges],
            "hi_idx": [int(hi) for _, hi in ranges],
            "range_sum": [float(mgr.range_sum_query(lo, hi))
                          for lo, hi in ranges]})

    return slices_df.groupBy("stratum").applyInPandas(
        grouped, schema="stratum string, lo_idx long, hi_idx long, "
                        "range_sum double")
