"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship: the north-star audio pipeline (synth clips →
vectorized decode → per-codec windowed DDSketch quantiles) on sf0.001 scale.

`queries()` — one entry per implemented operator from SURVEY.md §2 plus the
training-data pipeline ops; `oracle_sql()` — exact DuckDB equivalents for
every deterministic query (approximate-by-nature estimates are rows-only,
as the contract allows).

Engine design notes live in condor_spark/; reference file:line citations in
each module's docstring.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from condor_spark.engine import evaluate as ev
from condor_spark.engine import similarity, text
from condor_spark.engine.builder import (SynopsisSpec, build_batch,
                                         build_batch_multi,
                                         build_count_windows, build_ordered)
from condor_spark.engine.sqlbuild import build_kmv_sql, build_sketch_sql
from condor_spark.engine.windows import (CountTumbling, GlobalWindow, Session,
                                         Sliding, Tumbling)

DAY = "1 day"
NTZ = "timestamp_ntz"

def _fresh_tmp(name: str, sf_dir: str) -> str:
    """One deterministic scratch dir per (query, scale factor), WIPED on
    entry: streaming queries need virgin checkpoint/sink/ledger state (a
    stale exactly-once ledger would replay-short-circuit their batches),
    but a fresh mkdtemp per call leaks an events-sized directory into /tmp
    on every driver/bench/test run — wipe-and-reuse bounds the footprint
    to one live copy per query. Assumes one runner at a time per (query,
    sf): two concurrent executions of the SAME query at the SAME scale
    would wipe each other's live stream state (the driver, pytest and
    bench never overlap in this harness)."""
    import os
    import shutil

    path = f"/tmp/condor_q_{name}_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


def _await(q, secs: int = 600) -> None:
    """Block until the streaming query terminates; a timeout is an error,
    never a partial read (the sink dir would be incomplete and the orphan
    stream would keep writing into a path the next run wipes)."""
    if not q.awaitTermination(secs):
        q.stop()
        raise TimeoutError(f"streaming query did not finish within {secs}s")



def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _user_keys(df) -> list[int]:
    return sorted(r[0] for r in df.select("user_id").distinct().collect())


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Audio-clip stream → decode+features (mapInPandas) → per-codec
    1-minute tumbling DDSketch(1%) RMS quantiles. Runs on 2,000
    deterministic synthetic clips (the sf0.001-scale smoke)."""
    from condor_spark import fixtures
    from condor_spark.engine.audio import decode_features_arrow

    clips = fixtures.audio_clips(spark, 2000, num_partitions=8)
    feats = decode_features_arrow(clips, passthrough=("ts",))
    spec = SynopsisSpec(kind="ddsketch", params=dict(relative_accuracy=0.01),
                        column="rms", ts_column="ts",
                        window=Tumbling("1 minute"), stratify_by="codec")
    syn = build_batch(feats, spec)
    return (ev.quantile_estimates(syn, [0.5, 0.95])
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    "stratum", "q", F.round("est_value", 6).alias("est_value"))
            .orderBy("window_start", "stratum", "q"))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_cm_user_frequency(spark, sf_dir):
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="countmin", params=dict(width=8192, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    syn = build_batch(df, spec)
    res = ev.frequency_estimates(syn, _user_keys(df))
    return res.select(F.col("window_start").cast(NTZ).alias("window_start"),
                      "key", "est_count")


def q_bloom_membership(spark, sf_dir):
    df = _events(spark, sf_dir)
    present = sorted(r[0] for r in df.select("event_type").distinct().collect())
    keys = present + ["zzz_absent_a", "zzz_absent_b", "zzz_absent_c"]
    spec = SynopsisSpec(kind="bloom",
                        params=dict(n_bits=4096, max_elements=256, seed=7,
                                    merge_mode="union"),
                        column="event_type", ts_column="ts", window=Tumbling(DAY))
    syn = build_batch(df, spec)
    return (ev.membership(syn, keys)
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    "key", "member"))


def q_equiwidth_hist(spark, sf_dir):
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="equiwidth",
                        params=dict(lower=0.0, upper=500.0, num_buckets=20),
                        column="value", ts_column="ts", window=Tumbling(DAY))
    syn = build_batch(df, spec)
    return (ev.histogram_counts(syn)
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    F.col("bucket").cast("long").alias("bucket"), "cnt"))


def q_hist4lt_ranges(spark, sf_dir):
    # 4LT-compressed equi-width histogram (EquiWidthHistogram4LT.java:9-45):
    # per-window range estimates read through the lossy 8-bins-per-32-bit view
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="equiwidth4lt",
                        params=dict(lower=0.0, upper=500.0, num_buckets=16),
                        column="value", ts_column="ts", window=Tumbling(DAY))
    syn = build_batch(df, spec)
    ranges = [(0.0, 125.0), (100.0, 300.0), (250.0, 500.0)]

    def fn(s, row):
        return pd.DataFrame({
            "lo": [a for a, _ in ranges],
            "hi": [b for _, b in ranges],
            "est": [s.range_query_compressed(a, b) for a, b in ranges],
        })

    out = ev.apply_per_window(syn, fn, "window_start timestamp, lo double, "
                                       "hi double, est double")
    # round JVM-side: HALF_UP, bit-matching the DuckDB oracle's ROUND
    return out.select(F.col("window_start").cast(NTZ).alias("window_start"),
                      "lo", "hi", F.round("est", 4).alias("est"))


def q_ddsketch_quantiles(spark, sf_dir):
    df = _events(spark, sf_dir).filter(F.col("value") > 0)
    spec = SynopsisSpec(kind="ddsketch",
                        params=dict(relative_accuracy=0.01, max_num_bins=4096),
                        column="value", ts_column="ts", window=Tumbling(DAY))
    syn = build_batch(df, spec)
    return (ev.quantile_estimates(syn, [0.5, 0.95, 0.99])
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    "q", F.round("est_value", 6).alias("est_value")))


def q_fifo_latest(spark, sf_dir):
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="fifo", params=dict(sample_size=20),
                        column="event_id", ts_column="ts", window=Tumbling(DAY),
                        tiebreak_column="event_id")
    syn = build_batch(df, spec)
    return (ev.sample_rows(syn, value_type="long")
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    F.col("value").alias("event_id")))


def q_bottomk_sample(spark, sf_dir):
    df = (_events(spark, sf_dir)
          .withColumn("__prio", F.md5(F.col("event_id").cast("string"))))
    spec = SynopsisSpec(kind="bottomk", params=dict(sample_size=20, seed=7),
                        column="event_id", ts_column="ts", window=Tumbling(DAY),
                        priority_column="__prio")
    syn = build_batch(df, spec)
    return (ev.sample_rows(syn, value_type="long")
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    F.col("value").alias("event_id")))


def q_session_windows(spark, sf_dir):
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="hll", params=dict(log_reg_num=4, seed=7),
                        column="event_id", ts_column="ts",
                        window=Session("30 minutes"), stratify_by="user_id")
    syn = build_batch(df, spec)
    return syn.select(F.col("stratum"),
                      F.col("window_start").cast(NTZ).alias("window_start"),
                      F.col("window_end").cast(NTZ).alias("window_end"),
                      F.col("n"))


def q_sliding_counts(spark, sf_dir):
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="hll", params=dict(log_reg_num=4, seed=7),
                        column="event_id", ts_column="ts",
                        window=Sliding(DAY, "6 hours"))
    syn = build_batch(df, spec)
    return syn.select(F.col("window_start").cast(NTZ).alias("window_start"),
                      F.col("n").alias("cnt"))


def q_concurrent_windows(spark, sf_dir):
    # Scotty's N-concurrent-windows from one slice pass (multi-addWindow);
    # exact per-window counts via synopsis n (count is exact in every kind)
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="hll", params=dict(log_reg_num=4, seed=7),
                        column="event_id", ts_column="ts")
    syn = build_batch_multi(df, spec, [Tumbling(DAY),
                                       Sliding("2 days", DAY),
                                       Sliding(DAY, "6 hours")])
    return syn.select(F.col("window_id").cast("long").alias("window_id"),
                      F.col("window_start").cast(NTZ).alias("window_start"),
                      F.col("n").alias("cnt"))


def q_count_windows(spark, sf_dir):
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="hll", params=dict(log_reg_num=4, seed=7),
                        column="event_id", ts_column="ts",
                        window=CountTumbling(1000), tiebreak_column="event_id")
    return build_count_windows(df, spec).select("window_id", "n")


def q_wavelet_range_sums(spark, sf_dir):
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="wavelet", params=dict(size=1 << 15), column="value",
                        ts_column="ts", tiebreak_column="event_id")
    slices = build_ordered(df, spec, num_partitions=8)
    res = ev.wavelet_range_sums(slices, [(0, 1000), (1000, 5000), (0, 1 << 40)])
    return res.select("lo_idx", F.round("range_sum", 3).alias("range_sum"))


def q_wavelet_stratified(spark, sf_dir):
    """Stratified order-based build (StratifiedNonMergeableSynopsisFunction
    .java:50-66 analogue): each stratum ordered independently, per-stratum
    slice managers answer range sums in parallel; exact under budget."""
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="wavelet", params=dict(size=1 << 15), column="value",
                        ts_column="ts", tiebreak_column="event_id",
                        stratify_by="event_type")
    slices = build_ordered(df, spec, num_partitions=8)
    res = ev.wavelet_range_sums_stratified(
        slices, [(0, 1000), (1000, 5000), (0, 1 << 40)])
    return res.select("stratum", "lo_idx", "hi_idx",
                      F.round("range_sum", 3).alias("range_sum"))


def q_stream_wavelet(spark, sf_dir):
    """Streaming order-based (wavelet) build — NonMergeableSynopsisFunction
    analogue: per-key ordered state slices the live stream every 1000
    elements; emitted slices unify by concatenation, so a full replay
    answers range sums identically to the batch build (shares the
    wavelet_range_sums oracle)."""

    from condor_spark import fixtures
    from condor_spark.engine.stateful import StatefulOrderedStream

    df = _events(spark, sf_dir)
    max_ts = df.agg(F.max("ts")).collect()[0][0]
    cutoff = pd.Timestamp(max_ts) + pd.Timedelta(days=1)
    tmp = _fresh_tmp("ow", sf_dir)
    fixtures.replay_in_order(spark, df, f"{tmp}/src", n_chunks=5,
                             flush_ts=[cutoff + pd.Timedelta(days=1),
                                       cutoff + pd.Timedelta(days=2)])
    spec = SynopsisSpec(kind="wavelet", params=dict(size=1 << 15), column="value",
                        ts_column="ts", tiebreak_column="event_id")
    job = StatefulOrderedStream(spec, slice_count=1000,
                                flush_cutoff_us=int(cutoff.value // 1000))
    q = job.start(spark, f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt",
                  max_files_per_trigger=1)
    _await(q)
    slices = spark.read.parquet(f"{tmp}/out")
    res = ev.wavelet_range_sums(slices, [(0, 1000), (1000, 5000), (0, 1 << 40)])
    return res.select("lo_idx", F.round("range_sum", 3).alias("range_sum"))


def q_sliding_inversion(spark, sf_dir):
    """Invertible slide-eviction path (InvertibleSynopsisFunction.java:64-114
    analogue): per-slice CountMin prefixes differenced into 1-day windows at
    6-hour slide; exact-count oracle over the same slice-position semantics
    (windows span the 4 newest *present* slices, leading windows partial)."""
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="countmin", params=dict(width=2048, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling("6 hours"))
    slices = build_batch(df, spec)
    inv = ev.sliding_via_inversion(slices, size_slices=4)
    return inv.select(F.col("window_start").cast(NTZ).alias("window_start"),
                      F.col("window_end").cast(NTZ).alias("window_end"),
                      F.col("n"))


def q_sliding_inversion_stratified(spark, sf_dir):
    """Multi-stratum invertible slide-eviction: per-stratum slice prefixes
    differenced executor-side in parallel (one applyInPandas group per
    stratum, no driver collect)."""
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="countmin", params=dict(width=2048, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling("6 hours"),
                        stratify_by="event_type")
    slices = build_batch(df, spec)
    inv = ev.sliding_via_inversion(slices, size_slices=4)
    return inv.select("stratum",
                      F.col("window_start").cast(NTZ).alias("window_start"),
                      F.col("window_end").cast(NTZ).alias("window_end"),
                      F.col("n"))


def q_query_latest_stratified(spark, sf_dir):
    """queryLatestStratified (ApproximateDataAnalytics.java:79-92): newest
    window per stratum, histogram read per stratum."""
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="equiwidth",
                        params=dict(lower=0.0, upper=500.0, num_buckets=10),
                        column="value", ts_column="ts", window=Tumbling(DAY),
                        stratify_by="event_type")
    syn = build_batch(df, spec)
    latest = ev.latest(syn, per_stratum=True)
    return (ev.histogram_counts(latest)
            .select("stratum", F.col("bucket").cast("long").alias("bucket"), "cnt"))


def q_stratified_hist(spark, sf_dir):
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="equiwidth",
                        params=dict(lower=0.0, upper=500.0, num_buckets=10),
                        column="value", stratify_by="event_type",
                        window=GlobalWindow())
    syn = build_batch(df, spec)
    return (ev.histogram_counts(syn)
            .select("stratum", F.col("bucket").cast("long").alias("bucket"), "cnt"))


def q_tumbling_counts(spark, sf_dir):
    # exact windowed aggregation (window semantics demo; Spark-builtin path)
    df = _events(spark, sf_dir)
    return (df.groupBy(F.window("ts", DAY).alias("win"))
            .agg(F.count("*").alias("cnt"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select(F.col("win.start").cast(NTZ).alias("window_start"),
                    "cnt", "sum_value"))


Q_TS = ["2024-01-03 12:00:00", "2024-01-10 00:30:00", "2024-01-20 18:45:00"]
Q_KEYS = [1, 2, 3]


def q_query_timestamped(spark, sf_dir):
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="countmin", params=dict(width=8192, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    syn = build_batch(df, spec)
    queries = spark.createDataFrame([(t,) for t in Q_TS], "q_ts_s string") \
        .select(F.col("q_ts_s").cast("timestamp").alias("q_ts"))

    def fn(synopsis, pdf):
        outs = []
        for qts in pdf["q_ts"]:
            est = synopsis.query(pd.Series(Q_KEYS))
            outs.append(pd.DataFrame({"q_ts": [qts] * len(Q_KEYS),
                                      "key": [str(k) for k in Q_KEYS],
                                      "est_count": est.astype("int64")}))
        return pd.concat(outs, ignore_index=True)

    res = ev.query_timestamped(syn, queries, fn,
                               "q_ts timestamp, key string, est_count long")
    return res.select(F.col("q_ts").cast(NTZ).alias("q_ts"), "key", "est_count")


def q_query_timestamped_stratified(spark, sf_dir):
    """queryTimestampedStratified (ApproximateDataAnalytics.java:93-117):
    (q_ts, stratum) queries answered by the stratum's window containing
    q_ts; histogram read per hit. Exact oracle (counts are exact)."""
    df = _events(spark, sf_dir)
    strata = sorted(r[0] for r in df.select("event_type").distinct().collect())
    spec = SynopsisSpec(kind="equiwidth",
                        params=dict(lower=0.0, upper=500.0, num_buckets=10),
                        column="value", ts_column="ts", window=Tumbling(DAY),
                        stratify_by="event_type")
    syn = build_batch(df, spec)
    queries = spark.createDataFrame(
        [(t, s) for t in Q_TS for s in strata], "q_ts_s string, stratum string"
    ).select(F.col("q_ts_s").cast("timestamp").alias("q_ts"), "stratum")

    def fn(synopsis, pdf):
        counts = synopsis.frequency.astype("int64")
        outs = []
        for qts in pdf["q_ts"]:
            outs.append(pd.DataFrame({
                "q_ts": [qts] * synopsis.num_buckets,
                "bucket": range(synopsis.num_buckets), "cnt": counts}))
        return pd.concat(outs, ignore_index=True)

    res = ev.query_timestamped(syn, queries, fn,
                               "q_ts timestamp, stratum string, bucket long, "
                               "cnt long", stratified=True)
    return res.select(F.col("q_ts").cast(NTZ).alias("q_ts"), "stratum",
                      "bucket", "cnt")


def q_query_latest_hist(spark, sf_dir):
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="equiwidth",
                        params=dict(lower=0.0, upper=500.0, num_buckets=10),
                        column="value", ts_column="ts", window=Tumbling(DAY))
    syn = build_batch(df, spec)
    latest = ev.latest(syn, per_stratum=False)
    return (ev.histogram_counts(latest)
            .select(F.col("bucket").cast("long").alias("bucket"), "cnt"))


def q_query_latest_sql(spark, sf_dir):
    """``queryLatest`` answered entirely JVM-side (the QueryLatest.java:60-65
    per-core query path): the newest window's CM cell grid rides a one-row
    broadcast, each query key's buckets come from the constant-folded H3
    byte-LUT expressions (sqlbuild.h3_bucket_exprs), and the estimate is a
    codegen gather+least — zero Python per query. CM at width 8192 is exact
    at this scale, so answers equal the newest window's true counts."""
    from condor_spark.engine import pointquery

    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="countmin", params=dict(width=8192, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    syn = build_batch(df, spec)
    keys = df.select(F.col("user_id").alias("key")).distinct()
    out = pointquery.query_latest_frequency(syn, keys, key_col="key")
    return out.select(F.col("key").cast("string").alias("key"), "est_count")


def q_bucketed_join(spark, sf_dir):
    """Co-located bucketed equi-join — the 100 TB shuffle-elimination
    primitive (Catalog.write_bucketed/read_bucketed): both sides are
    bucketed by user_id, so the join + keyed aggregation plan with ZERO
    Exchange (asserted in tests/test_catalog.py; plan in PLANS.md §10).
    Per-user rollup joined to a derived user dim; exact-count oracle."""
    import os

    from condor_spark.engine.catalog import Catalog

    df = _events(spark, sf_dir)
    # deterministic warehouse dir per scale factor: write_bucketed mode
    # 'overwrite' replaces the tables in place, so repeated runs (driver,
    # bench reps) keep exactly ONE bucketed copy instead of leaking a fresh
    # mkdtemp per call
    wh = f"/tmp/condor_bj_{os.path.basename(sf_dir.rstrip('/'))}"
    os.makedirs(wh, exist_ok=True)
    cat = Catalog(spark, wh, namespace="condorq", force_parquet=True)
    dim = (df.select("user_id").distinct()
             .withColumn("segment", F.pmod(F.col("user_id"), F.lit(5))))
    cat.write_bucketed(df, "events_b", ["user_id"], 8, sort_cols=["user_id"])
    cat.write_bucketed(dim, "users_b", ["user_id"], 8, sort_cols=["user_id"])
    out = (cat.read_bucketed("events_b")
           .join(cat.read_bucketed("users_b"), "user_id")
           .groupBy("user_id", "segment")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 6).alias("sum_value")))
    return out.select(F.col("user_id").cast("long").alias("user_id"),
                      F.col("segment").cast("long").alias("segment"),
                      "n_events", "sum_value")


# ---- documents / embeddings pipeline ops ----------------------------------

def q_dedup_exact(spark, sf_dir):
    return text.dedup_exact(_docs(spark, sf_dir))


def q_token_counts(spark, sf_dir):
    out = text.token_counts(_docs(spark, sf_dir))
    return out.select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
                      F.col("n_chars_text").cast("long").alias("n_chars_text"))


def q_quality_scores(spark, sf_dir):
    out = text.quality_scores(_docs(spark, sf_dir))
    return out.select("doc_id",
                      F.col("n_chars_q").cast("long").alias("n_chars_q"),
                      F.col("n_tokens").cast("long").alias("n_tokens"),
                      "punct_ratio", "stopword_ratio", "avg_token_len")


def q_pii_scrub(spark, sf_dir):
    """PII redaction + per-kind counts (training-data curation): emails,
    IPv4s, international phone numbers and long id-like digit runs
    replaced by tokens via ordered JVM regexp chains (engine/text.py
    PII_RULES — patterns restricted to the regex subset Java and RE2
    evaluate identically). Deterministic PII is PLANTED per doc_id so the
    ground truth is known; the oracle replays plant + scrub verbatim in
    DuckDB and the md5 of the scrubbed text must match byte-for-byte."""
    from condor_spark.engine.text import pii_scrub

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    d = F.col("doc_id")
    planted = F.concat(
        F.col("text"), F.lit(" contact user"), d.cast("string"),
        F.lit("@example.com or 10."), (d % 250).cast("string"),
        F.lit(".0.1 tel +1 555 010 "), (F.lit(1000) + d % 9000).cast("string"),
        F.lit(" ssn 123-45-"), (F.lit(1000) + d % 9000).cast("string"),
        F.lit(" card 4111 1111 1111 "), (F.lit(1000) + d % 9000).cast("string"),
        F.lit(" acct "), (F.lit(100000000) + d).cast("string"))
    out = pii_scrub(docs.withColumn("text", planted), "text")
    from condor_spark.engine.text import PII_RULES
    return out.select("doc_id", *[f"n_{name}" for name, _, _ in PII_RULES],
                      F.md5("text").alias("scrubbed_md5"))


def q_lang_id(spark, sf_dir):
    return text.lang_id(_docs(spark, sf_dir))


def q_fingerprints(spark, sf_dir):
    return text.fingerprints(_docs(spark, sf_dir))


def q_ngram_jaccard(spark, sf_dir):
    return text.ngram_jaccard_pairs(_docs(spark, sf_dir), shingle=3, threshold=0.6)


def q_ann_topk(spark, sf_dir):
    out = similarity.brute_force_topk(_emb(spark, sf_dir), list(range(10)), k=5)
    return out.select("query_id", F.col("rank").cast("long").alias("rank"),
                      "neighbor_id", "cosine")


def q_dedup_cosine(spark, sf_dir):
    return similarity.cosine_near_dup_pairs(_emb(spark, sf_dir), threshold=0.4)


# ---- approximate / randomized: rows-only checks ----------------------------

def q_hll_distinct(spark, sf_dir):
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="hll", params=dict(log_reg_num=14, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    return (ev.distinct_estimates(build_batch(df, spec))
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    "est_distinct"))


def q_ams_f2(spark, sf_dir):
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="ams", params=dict(width=1024, height=7, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    return (ev.f2_estimates(build_batch(df, spec))
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    F.round("est_f2", 2).alias("est_f2")))


def _two_stream_builds(spark, sf_dir, spec, type_a, type_b):
    """ONE stratified build over both event types, split into the two
    per-stream synopsis frames join_size_estimates expects (a first cut
    ran build_batch twice — two full scans; per-stratum synopses from one
    scan are identical since merge is commutative counter addition)."""
    import dataclasses

    from condor_spark.engine.util import pin_result

    df = _events(spark, sf_dir).filter(
        F.col("event_type").isin(type_a, type_b))
    built = pin_result(
        build_batch(df, dataclasses.replace(spec, stratify_by="event_type")),
        key=f"two_stream_builds_{spec.kind}")  # bounded: one cached per kind
    split = lambda t: (built.filter(F.col("stratum") == t)
                       .withColumn("stratum", F.lit("")))
    return split(type_a), split(type_b)


def q_ams_join_size(spark, sf_dir):
    """AGMS equi-join size estimate between two event streams: 'click' vs
    'view' events sketched on user_id with the SAME hash family, per
    tumbling day — |A ⋈ B| ≈ median row inner product. The reference ships
    only the self-join case (FastAGMS.java:219); the two-stream estimator
    is the classic AGMS generalization, replayed exactly in SQL by the
    same EH3/H3 oracle as ams_f2."""
    spec = SynopsisSpec(kind="ams", params=dict(width=1024, height=7, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    a, b = _two_stream_builds(spark, sf_dir, spec, "click", "view")
    return (ev.join_size_estimates(a, b)
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    F.round("est_join", 2).alias("est_join")))


def q_cm_join_size(spark, sf_dir):
    """Count-Min inner-product join-size estimate (Cormode–Muthukrishnan
    §4.2: MIN over rows of the grid inner product, one-sided) between the
    'click' and 'view' event streams per tumbling day — the upper-biased
    twin of ams_join_size, sharing evaluate.join_size_estimates and the
    relational H3 cell replay of the CM oracles."""
    spec = SynopsisSpec(kind="countmin",
                        params=dict(width=2048, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    a, b = _two_stream_builds(spark, sf_dir, spec, "click", "view")
    return (ev.join_size_estimates(a, b)
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    F.round("est_join", 2).alias("est_join")))


def q_kmv_distinct(spark, sf_dir):
    """KMV (k-minimum-values) distinct count per tumbling day — the
    deterministic distinct sketch (synopsis/kmv.py): splitmix64 hash, keep
    the k smallest distinct values, estimate (k-1)/h_(k) in EXACT integer
    arithmetic. The oracle replays hash + rank + floor division in SQL
    bit-for-bit (_kmv_distinct_oracle_sql). Extension beyond the
    reference's HLL (HyperLogLogSketch.java) — KMV also supports the set
    operations kmv_overlap exercises."""
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="kmv", params=dict(k=1024, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    return (ev.distinct_estimates(build_batch(df, spec))
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    "est_distinct"))


def q_kmv_overlap(spark, sf_dir):
    """Corpus-overlap estimation between the 'click' and 'view' event
    streams per tumbling day from two independently built KMV sketches
    (Beyer et al. 2007 set operations): per-corpus distinct, union,
    intersection and Jaccard — the train/test-contamination question
    answered from two <= 8 KB blobs per window instead of a raw-corpus
    join. ONE stratified build (shared scan), blob-level window join;
    every figure is exact integer / int-ratio math so the SQL oracle is
    bit-identical."""
    spec = SynopsisSpec(kind="kmv", params=dict(k=1024, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    a, b = _two_stream_builds(spark, sf_dir, spec, "click", "view")
    return (ev.overlap_estimates(a, b)
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    "est_a", "est_b", "est_union", "est_intersection",
                    "jaccard"))


def q_kmv_sql_distinct(spark, sf_dir):
    """KMV built by the pure-JVM SQL path (sqlbuild.build_kmv_sql: staged
    splitmix64 limb hash -> DISTINCT -> WindowGroupLimit rank <= k, zero
    Python before blob assembly). Blob byte-parity with build_batch is
    asserted in tests, so this shares kmv_distinct's exact oracle."""
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="kmv", params=dict(k=1024, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    return (ev.distinct_estimates(build_kmv_sql(df, spec))
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    "est_distinct"))


def q_stream_kmv_overlap(spark, sf_dir):
    """Continuous contamination monitoring: per-corpus KMV sketches
    maintained as STRATIFIED streaming state through the exactly-once
    manifest sink (one <= 8 KB blob per (window, corpus), merged across
    micro-batches), overlap answered from the committed state table. KMV
    merge is canonical (sorted min-k), so the final streamed blobs are
    byte-identical to the batch build — this shares kmv_overlap's exact
    oracle."""
    from condor_spark import fixtures
    from condor_spark.engine.streaming import StreamingSynopsisJob

    df = _events(spark, sf_dir).filter(
        F.col("event_type").isin("click", "view"))
    tmp = _fresh_tmp("kmvstream", sf_dir)
    fixtures.replay_in_order(spark, df, f"{tmp}/src", n_chunks=5)
    spec = SynopsisSpec(kind="kmv", params=dict(k=1024, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling(DAY),
                        stratify_by="event_type")
    job = StreamingSynopsisJob(spec, sink_dir=f"{tmp}/sink",
                               watermark_delay="40 days")
    _await(job.start(spark, f"{tmp}/src", f"{tmp}/ckpt",
                     max_files_per_trigger=1))
    return (ev.overlap_strata(job.read_state_df(spark), "click", "view")
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    "est_a", "est_b", "est_union", "est_intersection",
                    "jaccard"))


def q_decontaminate(spark, sf_dir):
    """Doc-level benchmark decontamination (GPT-3 appendix-C n-gram rule):
    documents split by id parity into train (even) / eval (odd); each eval
    doc scored by the fraction of its distinct 5-grams present anywhere in
    the train corpus, flagged at ratio >= 0.2. n=5 on the fixture (the API
    default is 13) so the planted cross-corpus duplicates actually share
    grams; one hit-marking hash join on the gram key, no all-pairs."""
    docs = _docs(spark, sf_dir)
    out = text.contamination_scores(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0), n=5, threshold=0.2)
    return out.select("doc_id", "n_grams", "n_hits",
                      "contamination_ratio", "contaminated")


def q_stream_decontaminate(spark, sf_dir):
    """Decontamination-on-INGEST: the eval docs (odd ids) arrive as 3
    micro-batches and each batch scores against the ONCE-materialized
    train gram set (even ids) through the exactly-once ledger. A doc's
    verdict depends only on the doc + the static gram set, so the union
    of per-batch outputs equals the batch run exactly — shares
    decontaminate's oracle."""
    from condor_spark.engine.dedup_stream import StreamDecontaminate

    docs = _docs(spark, sf_dir)
    ev_docs = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    tmp = _fresh_tmp("decontam", sf_dir)
    src = f"{tmp}/docs"
    # 3 chronological chunks by doc_id band
    n_max = ev_docs.agg(F.max("doc_id")).first()[0] or 0
    step = (n_max + 3) // 3 + 1
    for c in range(3):
        (ev_docs.filter((F.col("doc_id") >= c * step)
                        & (F.col("doc_id") < (c + 1) * step))
         .coalesce(1).write.mode("append").parquet(src))
    job = StreamDecontaminate(sink_dir=f"{tmp}/sink", n=5, threshold=0.2)
    job.prepare(spark, docs.filter(F.col("doc_id") % 2 == 0))
    job.run(spark, src, f"{tmp}/ckpt")
    return job.read_scores(spark).select(
        "doc_id", "n_grams", "n_hits", "contamination_ratio", "contaminated")


def q_mg_sql_hh(spark, sf_dir):
    """Misra-Gries built by the pure-JVM SQL path (sqlbuild.build_mg_sql:
    the exact-regime summary IS a partially-aggregated GROUP BY count
    table, zero Python before blob assembly). Blob byte-parity with
    build_batch is pytest-asserted, so this shares mg_heavy_hitters'
    exact oracle."""
    from condor_spark.engine.sqlbuild import build_mg_sql

    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="mg", params=dict(capacity=1024),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    return (ev.heavy_hitter_estimates(build_mg_sql(df, spec), min_count=5)
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    "key", "est_count"))


def q_decay_trending(spark, sf_dir):
    """Trending (recency-weighted) heavy users per tumbling day from the
    exponentially time-decayed counts synopsis (synopsis/decay.py — the
    counting twin of the reference's BiasedReservoirSampler recency
    bias): each event weighs 0.5^((window_max_ts - ts)/6h), so a key's
    weight halves per 6 idle hours. Oversized capacity => no trim, and
    both sides threshold on the 6-decimal-ROUNDED weight, where the
    engine's ~1e-15 partial-rescale float noise cannot reach — the oracle
    recomputes the direct decayed sum per key in SQL."""
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="decay",
                        params=dict(half_life="6 hours", capacity=1024),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    out = (ev.decayed_weights(build_batch(df, spec))
           .select(F.col("window_start").cast(NTZ).alias("window_start"),
                   "key", F.round("est_weight", 6).alias("est_weight")))
    return out.filter(F.col("est_weight") >= 1.2)


def q_stream_decay_trending(spark, sf_dir):
    """Continuously-maintained trending state: the decayed-counts summary
    merged across micro-batches through the exactly-once sink. Exponential
    decay is merge-rescalable, so the streamed weights equal the batch
    build to the same ~1e-15 float noise the 6-decimal rounding absorbs —
    shares decay_trending's oracle."""
    from condor_spark import fixtures
    from condor_spark.engine.streaming import StreamingSynopsisJob

    df = _events(spark, sf_dir)
    tmp = _fresh_tmp("decaystream", sf_dir)
    fixtures.replay_in_order(spark, df, f"{tmp}/src", n_chunks=5)
    spec = SynopsisSpec(kind="decay",
                        params=dict(half_life="6 hours", capacity=1024),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    job = StreamingSynopsisJob(spec, sink_dir=f"{tmp}/sink",
                               watermark_delay="40 days")
    _await(job.start(spark, f"{tmp}/src", f"{tmp}/ckpt",
                     max_files_per_trigger=1))
    out = (ev.decayed_weights(job.read_state_df(spark))
           .select(F.col("window_start").cast(NTZ).alias("window_start"),
                   "key", F.round("est_weight", 6).alias("est_weight")))
    return out.filter(F.col("est_weight") >= 1.2)


def q_stream_decay_querylatest(spark, sf_dir):
    """Continuous "how hot is this key NOW" stream: the decayed-counts
    snapshot is maintained by the exactly-once sink and a 3-batch key
    stream is answered per micro-batch against the newest committed
    window (float-valued QueryLatestStream branch — the generic integer
    fallback would truncate weights). Oracle: the direct decayed sum for
    the newest window per key, 6-decimal-rounded on both sides."""
    from condor_spark import fixtures
    from condor_spark.engine.streaming import (QueryLatestStream,
                                               StreamingSynopsisJob)

    df = _events(spark, sf_dir)
    tmp = _fresh_tmp("decayqls", sf_dir)
    fixtures.replay_in_order(spark, df, f"{tmp}/src", n_chunks=5)
    spec = SynopsisSpec(kind="decay",
                        params=dict(half_life="6 hours", capacity=1024),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    job = StreamingSynopsisJob(spec, sink_dir=f"{tmp}/sink",
                               watermark_delay="1 hour")
    _await(job.start(spark, f"{tmp}/src", f"{tmp}/ckpt"))

    keys = _user_keys(df)
    qdf = spark.createDataFrame([(b, k) for b in range(3) for k in keys],
                                "q_batch long, key long")
    fixtures.replay_in_order(spark, qdf, f"{tmp}/qsrc", n_chunks=3,
                             ts_col="q_batch")
    ql = QueryLatestStream(job, out_dir=f"{tmp}/answers", key_column="key")
    _await(ql.start(spark, f"{tmp}/qsrc", f"{tmp}/qckpt"))

    return ql.read_answers(spark).select(
        F.col("batch").cast("long").alias("q_batch"), "key",
        F.round("est_value", 6).alias("est_weight"))


def q_mg_entropy(spark, sf_dir):
    """Per-window Shannon entropy (nats) of the user-activity distribution
    from the Misra-Gries count table — source-diversity monitoring (a
    collapsing entropy flags a stuck/spamming source). Exact counts at
    this capacity (mg_heavy_hitters' promotion); the float sum is ordered
    canonically ascending-by-key on the engine side and rounded to 6
    places, where the <= 1e-12 cross-engine summation-order noise cannot
    reach."""
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="mg", params=dict(capacity=1024),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    return (ev.entropy_estimates(build_batch(df, spec))
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    F.round("entropy", 6).alias("entropy")))


def q_repetition_scores(spark, sf_dir):
    """Within-document repetition signals (Gopher curation rules): top-2/3
    gram character-coverage fraction and duplicated-3-gram fraction per
    document — the boilerplate detector a curation pipeline runs next to
    quality_scores. dup_n=3 here (the API default is Gopher's 5) because
    the synthetic fixture has no repeated 5-grams — a uniformly-zero
    column would verify nothing. Pure relational plan (one explode + two
    keyed aggregations), replayed exactly in DuckDB."""
    return text.repetition_scores(_docs(spark, sf_dir), dup_n=3).select(
        "doc_id", "top_2gram_frac", "top_3gram_frac", "dup_3gram_frac")


def q_mg_heavy_hitters(spark, sf_dir):
    """Misra-Gries heavy hitters per tumbling day: every user with >= 5
    events, enumerated straight from the O(capacity) summary — the
    unbounded-key-domain frequent-items query the reference's Count-Min
    cannot answer without an external key list (CountMinSketch.java:96-113
    needs the key) and the dyadic family only answers for bounded integer
    domains. Exact at this sizing (capacity 1024 >= distinct users per
    window, so no decrement ever fires and the summary IS the count table
    — same promotion argument as the dyadic family's oversampled levels;
    the undersized regime's Agarwal-merge deficit bound is asserted by
    tests/test_mg.py)."""
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="mg", params=dict(capacity=1024),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    return (ev.heavy_hitter_estimates(build_batch(df, spec), min_count=5)
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    "key", "est_count"))


def q_mg_topk_tokens(spark, sf_dir):
    """Top-20 tokens per language from per-stratum Misra-Gries summaries
    over the exploded token stream (string keys — the domain no sketch in
    the reference can enumerate). Deterministic (-count, token) order with
    an explicit rank column; capacity 4096 >= per-language vocabulary, so
    the summary is exact and the oracle is the plain token GROUP BY with
    the same row_number ordering."""
    df = (_docs(spark, sf_dir)
          .select(F.col("lang"), F.explode(text.tokens_col("text")).alias("token"))
          .filter(F.col("token") != ""))
    spec = SynopsisSpec(kind="mg", params=dict(capacity=4096),
                        column="token", window=GlobalWindow(),
                        stratify_by="lang")
    return (ev.topk_estimates(build_batch(df, spec), k=20)
            .select("stratum", "rank", "key", "est_count"))


def q_stream_mg_hh(spark, sf_dir):
    """Streamed twin of mg_heavy_hitters: the MG summary maintained as
    streaming state through the exactly-once manifest sink, merged across
    micro-batches. In the exact regime no decrement fires on any partial,
    and the canonical sorted-key state makes the streamed blobs
    byte-identical to the batch build — so this shares mg_heavy_hitters'
    exact oracle."""
    from condor_spark import fixtures
    from condor_spark.engine.streaming import StreamingSynopsisJob

    df = _events(spark, sf_dir)
    tmp = _fresh_tmp("mgstream", sf_dir)
    fixtures.replay_in_order(spark, df, f"{tmp}/src", n_chunks=5)
    spec = SynopsisSpec(kind="mg", params=dict(capacity=1024),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    job = StreamingSynopsisJob(spec, sink_dir=f"{tmp}/sink",
                               watermark_delay="40 days")
    _await(job.start(spark, f"{tmp}/src", f"{tmp}/ckpt",
                     max_files_per_trigger=1))
    return (ev.heavy_hitter_estimates(job.read_state_df(spark), min_count=5)
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    "key", "est_count"))


def q_cm_sql_frequency(spark, sf_dir):
    """Count-Min built by the pure-JVM SQL path (sqlbuild.build_sketch_sql:
    H3 as byte-LUT expressions, scatter/merge as SQL aggregation). Blob
    byte-parity with build_batch is asserted in tests, so this shares
    cm_user_frequency's exact oracle."""
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="countmin", params=dict(width=8192, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    syn = build_sketch_sql(df, spec)
    res = ev.frequency_estimates(syn, _user_keys(df))
    return res.select(F.col("window_start").cast(NTZ).alias("window_start"),
                      "key", "est_count")


def q_ams_sql_f2(spark, sf_dir):
    """Fast-AGMS built by the pure-JVM SQL path (EH3 signs as bit_count
    parity expressions); byte parity with build_batch means the estimator
    replay oracle for ams_f2 applies unchanged."""
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="ams", params=dict(width=1024, height=7, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    return (ev.f2_estimates(build_sketch_sql(df, spec))
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    F.round("est_f2", 2).alias("est_f2")))


def q_equiwidth_sql_hist(spark, sf_dir):
    """Equi-width histogram built by the pure-JVM SQL path (np.histogram's
    uniform-bin fast path replicated as double expressions with baked-in
    linspace edges); byte parity with build_batch means equiwidth_hist's
    exact oracle applies unchanged."""
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="equiwidth",
                        params=dict(lower=0.0, upper=500.0, num_buckets=20),
                        column="value", ts_column="ts", window=Tumbling(DAY))
    syn = build_sketch_sql(df, spec)
    return (ev.histogram_counts(syn)
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    F.col("bucket").cast("long").alias("bucket"), "cnt"))


def q_hist4lt_sql_ranges(spark, sf_dir):
    """4LT-compressed equi-width histogram via the SQL build path (4LT keeps
    exact fine bins as state and compresses at serialization, so it shares
    the equiwidth cell model); byte parity → shares hist4lt_ranges' exact
    oracle."""
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="equiwidth4lt",
                        params=dict(lower=0.0, upper=500.0, num_buckets=16),
                        column="value", ts_column="ts", window=Tumbling(DAY))
    syn = build_sketch_sql(df, spec)
    ranges = [(0.0, 125.0), (100.0, 300.0), (250.0, 500.0)]

    def fn(s, row):
        return pd.DataFrame({
            "lo": [a for a, _ in ranges],
            "hi": [b for _, b in ranges],
            "est": [s.range_query_compressed(a, b) for a, b in ranges],
        })

    out = ev.apply_per_window(syn, fn, "window_start timestamp, lo double, "
                                       "hi double, est double")
    return out.select(F.col("window_start").cast(NTZ).alias("window_start"),
                      "lo", "hi", F.round("est", 4).alias("est"))


def q_fifo_sql_latest(spark, sf_dir):
    """FiFo sampler as a rank-limited SQL window query (newest-k by event
    time, WindowGroupLimit pushdown); byte parity with build_batch on
    trimmed windows means fifo_latest's exact oracle applies unchanged."""
    from condor_spark.engine.sqlbuild import build_fifo_sql
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="fifo", params=dict(sample_size=20),
                        column="event_id", ts_column="ts", window=Tumbling(DAY),
                        tiebreak_column="event_id")
    syn = build_fifo_sql(df, spec)
    return (ev.sample_rows(syn, value_type="long")
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    F.col("value").alias("event_id")))


def q_bottomk_sql_sample(spark, sf_dir):
    """Bottom-k sampler as a rank-limited window query
    (sqlbuild.build_bottomk_sql): WindowGroupLimit keeps each task's local
    top-k before the shuffle. Byte parity with build_batch means
    bottomk_sample's exact oracle applies unchanged."""
    from condor_spark.engine.sqlbuild import build_bottomk_sql
    df = (_events(spark, sf_dir)
          .withColumn("__prio", F.md5(F.col("event_id").cast("string"))))
    spec = SynopsisSpec(kind="bottomk", params=dict(sample_size=20, seed=7),
                        column="event_id", ts_column="ts", window=Tumbling(DAY),
                        priority_column="__prio")
    syn = build_bottomk_sql(df, spec)
    return (ev.sample_rows(syn, value_type="long")
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    F.col("value").alias("event_id")))


def q_bloom_sql_membership(spark, sf_dir):
    """Bloom filter built by the pure-JVM SQL path (k H3 bit positions as
    byte-LUT expressions, distributed bit-OR via cell counts). Sized so the
    FP bound is ≈1e-9 over this key set → membership is exact. Integer keys
    (the SQL path's domain); three negative ids are the guaranteed-absent
    probes."""
    df = _events(spark, sf_dir)
    present = sorted(r[0] for r in df.select("user_id").distinct().collect())
    keys = present + [-1, -2, -3]
    spec = SynopsisSpec(kind="bloom",
                        params=dict(n_bits=65536, max_elements=2048, seed=7,
                                    merge_mode="union"),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    syn = build_sketch_sql(df, spec)
    return (ev.membership(syn, keys)
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    "key", "member"))


def q_hll_sql_distinct(spark, sf_dir):
    """HyperLogLog built by the pure-JVM SQL path (SplitMix64 via ANSI-safe
    limb arithmetic, rank via bit_count); byte parity with build_batch means
    the register-replay oracle for hll_distinct applies unchanged."""
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="hll", params=dict(log_reg_num=14, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    return (ev.distinct_estimates(build_sketch_sql(df, spec))
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    "est_distinct"))


def q_cuckoo_membership(spark, sf_dir):
    df = _events(spark, sf_dir)
    present = sorted(r[0] for r in df.select("event_type").distinct().collect())
    keys = present + ["zzz_absent_a", "zzz_absent_b"]
    spec = SynopsisSpec(kind="cuckoo",
                        params=dict(bucket_size=4, num_buckets=1024, seed=7),
                        column="event_type", window=GlobalWindow())
    return ev.membership(build_batch(df, spec), keys).select("key", "member")


def q_dd_quantile_pointquery(spark, sf_dir):
    """``queryLatest`` quantile stream answered in whole-stage codegen
    (``pointquery.quantile_point_queries`` — unrolled binary search over the
    broadcast cumulative-rank array, no Python / no higher-order functions
    in the plan). Oracle: the DD estimator replayed in SQL exactly as in
    ``ddsketch_quantiles`` — rank = max(1, ceil(q·n)), representative
    2·γ^ceil(ln(v)/ln(γ))/(γ+1) of the rank-th value."""
    from condor_spark.engine import pointquery as pq

    df = _events(spark, sf_dir).filter(F.col("value") > 0)
    spec = SynopsisSpec(kind="ddsketch",
                        params=dict(relative_accuracy=0.01, max_num_bins=4096),
                        column="value", window=GlobalWindow())
    syn = build_batch(df, spec)
    qs = [0.001, 0.01, 0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99,
          0.999, 1.0]
    qdf = spark.createDataFrame([(q,) for q in qs], "q double")
    return (pq.query_latest_quantile(syn, qdf)
            .select("q", F.round("quantile", 6).alias("quantile")))


def q_cuckoo_pointquery(spark, sf_dir):
    """Cuckoo membership answered in whole-stage codegen
    (``pointquery.cuckoo_point_queries`` — splitmix64 + constant alt-bucket
    LUT + two-bucket fingerprint probes). Key domain is floor(value/100):
    5 distinct int keys in 1024×4 slots — no kicks and empirically zero
    false positives on the fixture, so membership is exact (same promotion
    argument as ``cuckoo_membership``)."""
    from condor_spark.engine import pointquery as pq

    df = _events(spark, sf_dir).withColumn(
        "vkey", F.floor(F.col("value") / F.lit(100.0)).cast("long"))
    spec = SynopsisSpec(kind="cuckoo",
                        params=dict(bucket_size=4, num_buckets=1024, seed=7),
                        column="vkey", window=GlobalWindow())
    syn = build_batch(df, spec)
    qdf = spark.createDataFrame([(k,) for k in range(-3, 10)], "key long")
    return pq.query_latest_membership(syn, qdf).select("key", "member")


def q_equiwidth_rangequery(spark, sf_dir):
    """Equi-width range estimates answered in whole-stage codegen in O(1)
    per query (``pointquery.range_point_queries`` — prefix-sum interior +
    boundary fractions). Every range endpoint is a multiple of 3.125, so
    all bin fractions are exact dyadic rationals and Spark and DuckDB agree
    bit-for-bit; ranges cover aligned, fractional, clipped, inverted and
    out-of-domain cases (EquiWidthHistogram.java:102-138 semantics)."""
    from condor_spark.engine import pointquery as pq

    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="equiwidth",
                        params=dict(lower=0.0, upper=500.0, num_buckets=20),
                        column="value", window=GlobalWindow())
    syn = build_batch(df, spec)
    ranges = [(0.0, 500.0), (12.5, 237.5), (31.25, 31.25), (3.125, 496.875),
              (-125.0, 250.0), (250.0, 1000.0), (400.0, 100.0),
              (600.0, 700.0), (43.75, 68.75), (0.0, 3.125)]
    qdf = spark.createDataFrame(ranges, "lo double, hi double")
    return (pq.query_latest_range(syn, qdf)
            .select("lo", "hi", F.round("est_count", 6).alias("est_count")))


def q_reservoir_sample(spark, sf_dir):
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="reservoir", params=dict(sample_size=100, seed=7),
                        column="value", ts_column="ts", window=Tumbling(DAY))
    syn = build_batch(df, spec)

    def fn(s, row):
        import numpy as np
        vals = np.asarray(s.sample, dtype=float)
        return pd.DataFrame({"n_sample": [len(vals)],
                             "sample_mean": [round(float(vals.mean()), 4)]})

    return (ev.apply_per_window(syn, fn,
            "window_start timestamp, n_sample long, sample_mean double")
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    "n_sample", "sample_mean"))


def q_reservoir_audit(spark, sf_dir):
    """Sampler audit (VERDICT r3 #4): the REAL distributed reservoir build
    — per-partition partial reservoirs, weighted cross-partition merge
    (ReservoirSampler.java:93-140) — run in the LOSSLESS regime where
    sample_size >= the largest window's row count, so every accept/fill
    branch that could drop a row is provably un-taken and the kept sample
    must equal the window's input multiset exactly, for any random choice
    sequence and any partitioning. That lets DuckDB replay the sample as
    the multiset itself — the same exact-regime promotion pattern as the
    Misra-Gries driver queries. The evicting regime stays distribution-
    checked: bench.py asserts KS uniformity through this same build."""
    df = _events(spark, sf_dir)
    cap = (df.groupBy(F.window("ts", DAY)).count()
           .agg(F.max("count")).collect()[0][0])
    spec = SynopsisSpec(kind="reservoir",
                        params=dict(sample_size=int(cap or 1), seed=7),
                        column="event_id", ts_column="ts",
                        window=Tumbling(DAY))
    syn = build_batch(df, spec)
    return (ev.sample_rows(syn, value_type="long")
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    F.col("value").alias("event_id")))


def q_biased_reservoir_audit(spark, sf_dir):
    """Component #7's audit, same lossless-regime promotion as
    reservoir_audit: with sample_size >= the largest window's row count the
    biased reservoir's while-not-full insert path takes EVERY row
    (BiasedReservoirSampler.java:57-70 — the probabilistic replacement
    branch is unreachable) and the merge keeps the globally newest
    sample_size of <= sample_size rows, i.e. everything — so the kept
    sample equals the window's input multiset for any RNG draw and any
    partitioning, and DuckDB replays it directly. The recency-bias
    property in the evicting regime stays pytest-asserted."""
    df = _events(spark, sf_dir)
    cap = (df.groupBy(F.window("ts", DAY)).count()
           .agg(F.max("count")).collect()[0][0])
    spec = SynopsisSpec(kind="biased_reservoir",
                        params=dict(sample_size=int(cap or 1), seed=7),
                        column="event_id", ts_column="ts",
                        window=Tumbling(DAY))
    syn = build_batch(df, spec)

    def fn(s, row):
        return pd.DataFrame({"value": list(s.values)})

    return (ev.apply_per_window(syn, fn, "window_start timestamp, value long")
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    F.col("value").alias("event_id")))


def q_biased_reservoir(spark, sf_dir):
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="biased_reservoir", params=dict(sample_size=100, seed=7),
                        column="value", ts_column="ts", window=Tumbling(DAY))
    syn = build_batch(df, spec)

    def fn(s, row):
        import numpy as np
        return pd.DataFrame({"n_sample": [len(s.values)],
                             "newest_ts": [int(max(s.ts)) if s.ts else 0]})

    return (ev.apply_per_window(syn, fn,
            "window_start timestamp, n_sample long, newest_ts long")
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    "n_sample", "newest_ts"))


def q_bash_equidepth(spark, sf_dir):
    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="bash", params=dict(precision=7, num_buckets=10),
                        column="value", window=GlobalWindow())
    syn = build_batch(df, spec)
    return (ev.equidepth_buckets(syn)
            .select(F.col("bucket").cast("long").alias("bucket"),
                    F.round("lo", 4).alias("lo"), F.round("hi", 4).alias("hi"),
                    F.round("depth", 4).alias("depth")))


def q_equidepth_exact(spark, sf_dir):
    """EquiDepthHistBuilder parity (exact boundaries from sorted input) —
    the deterministic counterpart of bash_equidepth / equidepth_from_ddsketch."""
    from condor_spark.engine.builder import build_equidepth_exact

    df = _events(spark, sf_dir)
    out = build_equidepth_exact(df, "value", 10, tiebreak_column="event_id")
    return out.select(F.col("bucket").cast("long").alias("bucket"),
                      F.round("lo", 4).alias("lo"), F.round("hi", 4).alias("hi"),
                      F.col("depth").cast("long").alias("depth"))


def q_equidepth_dd(spark, sf_dir):
    """DDSketch-backed streaming equi-depth (SplitAndMergeWithDDSketch.java:15-37
    analogue): bucket boundaries = quantiles at i/B read from the mergeable
    sketch — fully partition-parallel, unlike the reference's parallelism-1
    recommendation."""
    df = _events(spark, sf_dir).filter(F.col("value") > 0)
    spec = SynopsisSpec(kind="ddsketch",
                        params=dict(relative_accuracy=0.01, max_num_bins=4096),
                        column="value", window=GlobalWindow())
    syn = build_batch(df, spec)
    return (ev.equidepth_from_ddsketch(syn, 10)
            .select(F.col("bucket").cast("long").alias("bucket"),
                    F.round("lo", 4).alias("lo"), F.round("hi", 4).alias("hi")))


def q_splitmerge_dd_hist(spark, sf_dir):
    """Split-and-merge equi-depth (the real SplitAndMergeWithDDSketch
    algorithm, paper-correct; see synopsis/histograms.py docstring). The
    partition partials' final merge recomputes boundaries from the
    MERGEABLE DDSketch, so windowed builds are deterministic: boundaries =
    exact min + sketch quantiles at i/B with chain-merge of non-increasing
    boundaries — replayed exactly in the oracle."""
    df = _events(spark, sf_dir).filter(F.col("value") > 0)
    spec = SynopsisSpec(kind="splitmerge_dd",
                        params=dict(num_buckets=10, relative_accuracy=0.01),
                        column="value", window=GlobalWindow())
    syn = build_batch(df, spec)

    def fn(s, row):
        bounds, freqs = s.bounds()
        return pd.DataFrame({"bucket": range(len(freqs)),
                             "lo": bounds[:-1], "freq": freqs})

    out = ev.apply_per_window(
        syn, fn, "window_start timestamp, bucket long, lo double, freq double")
    return (out.select(F.col("bucket"), F.round("lo", 4).alias("lo"),
                       F.round("freq", 4).alias("freq"))
            .orderBy("bucket"))


def q_ann_topk_ivf(spark, sf_dir):
    out = similarity.ann_topk_ivf(_emb(spark, sf_dir), list(range(10)), k=5,
                                  num_centroids=16, nprobe=4)
    return out.select("query_id", F.col("rank").cast("long").alias("rank"),
                      "neighbor_id", "cosine")


def q_media_features(spark, sf_dir):
    """Multimodal pipeline: opaque binary media + typed metadata → Arrow-
    batched decode (raw codecs real, compressed stubbed) → visual features."""
    from condor_spark.engine import multimodal as mm

    imgs = mm.synth_media_df(spark, 150, "image", num_partitions=8)
    vids = mm.synth_media_df(spark, 50, "video", num_partitions=8)
    out = mm.media_features(imgs.unionByName(vids))
    return out.select("media_id", F.round("mean_lum", 4).alias("mean_lum"),
                      F.round("std_lum", 4).alias("std_lum"),
                      F.round("edge_energy", 4).alias("edge_energy"),
                      F.col("n_frames").cast("long").alias("n_frames"))


def q_media_features_exact(spark, sf_dir):
    """Multimodal pipeline under the EXACT-oracle gate: noise-free synthetic
    media make every pixel a closed-form function of (i, t, x, y), so DuckDB
    replays encode→binary→decode→luminance→features end to end (the noisy
    twin `media_features` stays rows-only — PCG64 noise has no SQL replay).
    Videos synthesize at an id offset so image/video media_ids are disjoint."""
    from condor_spark.engine import multimodal as mm

    imgs = mm.synth_media_df(spark, 120, "image", num_partitions=8,
                             noise_amp=0)
    vids = mm.synth_media_df(spark, 40, "video", num_partitions=8,
                             start=1000, noise_amp=0)
    out = mm.media_features(imgs.unionByName(vids))
    return out.select("media_id", F.round("mean_lum", 4).alias("mean_lum"),
                      F.round("std_lum", 4).alias("std_lum"),
                      F.round("edge_energy", 4).alias("edge_energy"),
                      F.col("n_frames").cast("long").alias("n_frames"))


def q_minhash_pairs(spark, sf_dir):
    # verify_mode pinned: the exact oracle replays the EXHAUSTIVE verify
    # path; the shuffle path's 4σ signature pre-filter is a documented
    # recall trade for scale that the oracle deliberately does not model
    return text.minhash_dedup_pairs(_docs(spark, sf_dir), threshold=0.6,
                                    verify_mode="broadcast")


def q_simhash_pairs(spark, sf_dir):
    out = text.simhash_near_pairs(_docs(spark, sf_dir), max_hamming=10)
    return out.select("doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming"))


def q_dedup_cosine_lsh(spark, sf_dir):
    return similarity.cosine_near_dup_pairs_lsh(_emb(spark, sf_dir), threshold=0.4,
                                                bands=8, rows_per_band=2)


def q_ann_topk_lsh(spark, sf_dir):
    out = similarity.ann_topk_lsh(_emb(spark, sf_dir), list(range(10)), k=5,
                                  num_planes=8)
    return out.select("query_id", F.col("rank").cast("long").alias("rank"),
                      "neighbor_id", "cosine")


def q_ann_topk_ivf_exact(spark, sf_dir):
    """IVF ANN under the EXACT-oracle gate: the md5 init sample and both
    unrolled Lloyd iterations replay in SQL (per-dimension unnest + argmax
    row_number), so DuckDB reproduces the index, the nprobe cluster probes
    and the cosine top-k end to end (xxhash64-init twin `ann_topk_ivf`
    stays rows-only — DuckDB has no Spark-compatible xxhash64)."""
    out = similarity.ann_topk_ivf(_emb(spark, sf_dir), list(range(10)), k=5,
                                  num_centroids=16, nprobe=4, iters=2,
                                  init_mode="md5")
    return out.select("query_id", F.col("rank").cast("long").alias("rank"),
                      "neighbor_id", "cosine")


def q_dedup_cosine_lsh_exact(spark, sf_dir):
    """Banded cosine-LSH dedup under the EXACT-oracle gate (md5-Rademacher
    planes — SQL replays signatures → per-band buckets → candidate join →
    cosine verify; the Gaussian twin `dedup_cosine_lsh` stays rows-only)."""
    return similarity.cosine_near_dup_pairs_lsh(
        _emb(spark, sf_dir), threshold=0.4, bands=8, rows_per_band=2,
        plane_mode="rademacher_md5")


def q_ann_topk_lsh_exact(spark, sf_dir):
    """LSH ANN under the EXACT-oracle gate: md5-Rademacher planes are
    regenerable in SQL, so DuckDB replays signatures → bucket equi-join →
    cosine verify → top-k, proving the BUCKETING math, not just recall
    (the Gaussian-plane twin `ann_topk_lsh` stays rows-only — PCG64)."""
    out = similarity.ann_topk_lsh(_emb(spark, sf_dir), list(range(10)), k=5,
                                  num_planes=8,
                                  plane_mode="rademacher_md5")
    return out.select("query_id", F.col("rank").cast("long").alias("rank"),
                      "neighbor_id", "cosine")


def q_audio_rms_quantiles(spark, sf_dir):
    from condor_spark import fixtures
    from condor_spark.engine.audio import decode_features_arrow

    clips = fixtures.audio_clips(spark, 1000, num_partitions=8)
    feats = decode_features_arrow(clips, passthrough=("ts",))
    spec = SynopsisSpec(kind="ddsketch", params=dict(relative_accuracy=0.01),
                        column="rms", stratify_by="codec", window=GlobalWindow())
    syn = build_batch(feats, spec)
    return (ev.quantile_estimates(syn, [0.5, 0.95])
            .select("stratum", "q", F.round("est_value", 6).alias("est_value")))


def q_audio_spectral(spark, sf_dir):
    """Spectral-shape features (whole-clip rfft: centroid / bandwidth /
    rolloff / flatness) → per-codec DDSketch centroid quantiles. Rows-only:
    the FFT has no SQL replay; the analytic invariants (tone centroid = f0,
    noise flatness ≈ 1) are asserted in tests/test_audio.py."""
    from condor_spark import fixtures
    from condor_spark.engine.audio import spectral_features

    clips = fixtures.audio_clips(spark, 1000, num_partitions=8)
    feats = spectral_features(clips, passthrough=("ts",))
    spec = SynopsisSpec(kind="ddsketch", params=dict(relative_accuracy=0.01),
                        column="centroid_hz", stratify_by="codec",
                        window=GlobalWindow())
    syn = build_batch(feats, spec)
    return (ev.quantile_estimates(syn, [0.5, 0.95])
            .select("stratum", "q", F.round("est_value", 4).alias("est_value")))


def q_audio_rms_exact(spark, sf_dir):
    """The audio payload under the EXACT-oracle gate: closed-form clips
    (fixtures.clip_row_exact — no RNG) make every pcm16 sample replayable
    in SQL, so DuckDB reruns synth → peak-normalize → float32 → encode →
    decode → per-clip RMS → DDSketch quantile (rank-picked value's bin
    representative, the ddsketch_quantiles oracle pattern) end to end.
    The RNG-parameterized all-codec twin `audio_rms_quantiles` stays
    rows-only for breadth."""
    from condor_spark import fixtures
    from condor_spark.engine.audio import decode_features_arrow

    clips = fixtures.audio_clips_exact(spark, 400, num_partitions=8)
    feats = decode_features_arrow(clips, passthrough=("ts",))
    spec = SynopsisSpec(kind="ddsketch", params=dict(relative_accuracy=0.01),
                        column="rms", stratify_by="codec",
                        window=GlobalWindow())
    syn = build_batch(feats, spec)
    return (ev.quantile_estimates(syn, [0.5, 0.95])
            .select("stratum", "q", F.round("est_value", 6).alias("est_value")))


def q_audio_fp_exact(spark, sf_dir):
    """Audio near-duplicate detection under the EXACT-oracle gate:
    gated closed-form clips (fixtures.clip_row_exact(i, param_mod=120,
    gate=True) — params fold onto i%120, so rows i and i+120 are TRUE
    content duplicates under distinct ids) → integer-exact band-energy
    shingle fingerprints (audio.clip_fp_band: per-frame int64 energy →
    bit_length*4+mantissa-bits level → packed 4-shingles) → stop-fp cap →
    fp equi-join → shared-count + Jaccard. DuckDB replays every step —
    synth, int gate hash, pcm16 encode/decode, frame sums, bit-length
    quantize, shingle pack, df<=64 cap, pair join, Jaccard — bit-for-bit;
    expected answer: exactly the 120 planted duplicate pairs at
    jaccard 1.0 (false pairs top out at 0.42 on this input). The
    FFT-landmark twin `audio_fp_landmarks` is the robustness path
    (rows-only: no SQL replay for the rfft)."""
    from condor_spark import fixtures
    from condor_spark.engine.audio import (band_energy_fingerprints,
                                           fingerprint_pairs)

    clips = fixtures.audio_clips_exact(spark, 240, num_partitions=8,
                                       param_mod=120, gate=True)
    fps = band_energy_fingerprints(clips, frame=128, shingle=4)
    return fingerprint_pairs(fps, min_matches=3, max_df=64,
                             min_jaccard=0.6)


def q_audio_spectral_exact(spark, sf_dir):
    """Spectral-shape features under the EXACT-oracle gate (VERDICT r4
    next-round #3 — the FFT family's first driver-checkable query): tiny
    closed-form clips (fixtures.audio_clips_exact(n_samples=64): sr
    pinned 8000, 64 samples) flow through the REAL spectral operator
    (audio.spectral_features → clip_spectral: whole-clip np.fft.rfft
    power spectrum → power-weighted centroid/bandwidth, 85% rolloff,
    geometric/arithmetic flatness), and DuckDB replays the whole chain —
    synth → peak-normalize → float32 → pcm16 encode/decode (the
    audio_rms_exact lattice) → an explicit 64-point DFT
    (sum of x_k·cos/sin(2π·m·k/64), m = 0..32) → the four estimators.
    A 64-point rfft and the direct DFT agree to ~1e-15 relative (both
    correctly-rounded elementary ops over the same doubles; only the
    summation order differs), so 4-decimal rounding on BOTH sides
    absorbs it — same pinned-rounding promotion as decay/entropy.
    The full-size rfft queries (audio_spectral, audio_fp_landmarks,
    audio_ann_topk) stay rows-only: at 38k samples the direct-DFT
    replay is O(n²) per clip and genuinely infeasible in SQL."""
    from condor_spark import fixtures
    from condor_spark.engine import audio

    clips = fixtures.audio_clips_exact(spark, 240, num_partitions=8,
                                       n_samples=64)
    feats = audio.spectral_features(clips)
    return feats.select(
        "clip_id",
        F.round("centroid_hz", 4).alias("centroid_hz"),
        F.round("bandwidth_hz", 4).alias("bandwidth_hz"),
        F.round("rolloff_hz", 4).alias("rolloff_hz"),
        F.round("flatness", 4).alias("flatness"))


def q_audio_fp_hh(spark, sf_dir):
    """HOT-CONTENT detection on the audio payload: Misra-Gries heavy
    hitters over the band-energy fingerprint stream — fingerprints shared
    by >= 4 clips mark repeated content (jingles/ads/silence patterns) a
    curation pipeline down-weights before the pair-level dedup even runs.
    Same closed-form clips + integer-exact fingerprint chain as
    audio_fp_exact; MG capacity 65536 >= distinct fingerprints, so the
    summary is exact and the oracle is the fingerprint GROUP BY over the
    same replayed lattice."""
    from condor_spark import fixtures
    from condor_spark.engine.audio import band_energy_fingerprints

    clips = fixtures.audio_clips_exact(spark, 240, num_partitions=8,
                                       param_mod=120, gate=True)
    fps = band_energy_fingerprints(clips, frame=128, shingle=4)
    spec = SynopsisSpec(kind="mg", params=dict(capacity=65536),
                        column="fp", window=GlobalWindow())
    return (ev.heavy_hitter_estimates(build_batch(fps, spec), min_count=4)
            .select("key", "est_count"))


def q_audio_fp_landmarks(spark, sf_dir):
    """Spectral-landmark audio fingerprints (Wang's Shazam constellation,
    ISMIR'03) over the all-codec RNG fixture — the ROBUST near-dup path:
    top-k salient peak bins of dominant partials survive lossy companding
    and hop-aligned shifts (all 200 planted mulaw re-encodes detected at
    fingerprint-Jaccard 1.0; the only other reported pairs are genuine
    bin-coincident tone twins, e.g. clips 45/96 at 605.1/607.3 Hz +
    3350.6/3356.3 Hz, same sr). Rows-only (FFT has no SQL replay); the
    invariants — codec invariance, shift invariance, distinct-clip
    separation — are asserted in tests/test_audio.py, and the shared
    pair-join plumbing is exact-verified via audio_fp_exact."""
    from condor_spark import fixtures
    from condor_spark.engine.audio import (fingerprint_pairs,
                                           landmark_fingerprints)

    clips = fixtures.audio_clips(spark, 400, num_partitions=8)
    # duplicate half the clips under a different LOSSY codec: re-encode
    # rows 0..199 as mulaw with new ids
    dups = fixtures.reencode_dups(
        clips.filter(F.col("clip_id") < "clip-000000000200"))
    fps = landmark_fingerprints(clips.unionByName(dups))
    return fingerprint_pairs(fps, min_matches=3, max_df=64,
                             min_jaccard=0.35)


def q_audio_prep_exact(spark, sf_dir):
    """The audio PREPROCESSING pipeline (training-data prep: silence trim
    → linear-interp resample to 16 kHz → RMS gain normalization → 100 ms /
    50 ms-hop segmentation) under the EXACT-oracle gate. Closed-form gated
    clips with PLANTED zero pads (fixtures.clip_row_exact(gate=True,
    pad=True)) make every stage integer/IEEE-replayable: DuckDB reruns
    synth → int gate → pad → pcm16 encode → per-128-sample int64 frame
    energies → e*1000 >= max(e) trim rule → exact-rational (k*sr) divmod
    16000 interp positions with a + frac*(b-a) float64 interpolation →
    round-half-even requantize → g = 3276.7/sqrt(e/n) gain → per-segment
    int64 energies, bit-for-bit (audio_prep.py kernel docstrings state
    the IEEE argument per stage). One mapInPandas over the scan — no
    decoded sample ever shuffles (PLANS.md §23)."""
    from condor_spark import fixtures
    from condor_spark.engine.audio_prep import prep_segments

    clips = fixtures.audio_clips_exact(spark, 120, num_partitions=8,
                                       gate=True, pad=True)
    return prep_segments(clips, target_sr=16000, seg_ms=100, hop_ms=50,
                         trim_frame=128, trim_rel=1000, target_rms=3276.7)


def q_audio_quality_exact(spark, sf_dir):
    """Per-clip audio quality stats (audio_prep.clip_quality — the audio
    analogue of text quality_scores: silence trim counts, active ratio,
    clipping ratio, RMS, transcript tokens/sec) under the EXACT-oracle
    gate: the same padded gated closed-form clips as audio_prep_exact;
    DuckDB recomputes every stat from the replayed int16 lattice —
    integer trim rule, exact int64 energy, ratio divisions ordered
    identically and round-half-even to 6 places on both sides."""
    from condor_spark import fixtures
    from condor_spark.engine.audio_prep import clip_quality

    clips = fixtures.audio_clips_exact(spark, 120, num_partitions=8,
                                       gate=True, pad=True)
    return clip_quality(clips, trim_frame=128, trim_rel=1000)


def q_stream_fp_dedup(spark, sf_dir):
    """Streaming dedup-on-INGEST (engine/dedup_stream.py): the 240 gated
    exact clips arrive as 3 chronological micro-batches; each batch's
    band-energy fingerprints join the accumulating committed store, so
    every planted pair (i, i+120) surfaces in the batch where the second
    member lands. max_df=4096 sits above this fixture's global max
    fingerprint df (88), so no fingerprint is ever hot and the streamed
    pair set equals the batch scorer EXACTLY — the oracle is the
    audio_fp_exact replay with the cap lifted to 4096 (still exactly the
    120 planted pairs at Jaccard 1.0; the loudest false pair scores 0.418,
    under the 0.6 gate). Exactly-once: deterministic per-batch paths + an
    atomic ledger commit; replay/crash behavior is pytest-covered
    (tests/test_dedup_stream.py)."""
    import pandas as pd

    from condor_spark import fixtures
    from condor_spark.engine.audio import band_energy_fingerprints
    from condor_spark.engine.dedup_stream import StreamFpDedup

    tmp = _fresh_tmp("fpdedup", sf_dir)
    src = f"{tmp}/clips"
    for f in range(3):
        pdf = pd.DataFrame([fixtures.clip_row_exact(i, param_mod=120,
                                                    gate=True)
                            for i in range(f * 80, (f + 1) * 80)])
        (spark.createDataFrame(pdf).coalesce(1)
         .write.mode("append").parquet(src))
    job = StreamFpDedup(
        sink_dir=f"{tmp}/sink",
        fingerprint_fn=lambda df: band_energy_fingerprints(
            df, frame=128, shingle=4),
        min_matches=3, max_df=4096, min_jaccard=0.6)
    job.run(spark, src, f"{tmp}/ckpt")
    return (job.read_pairs(spark)
            .select(F.col("clip_id_a").alias("id_a"),
                    F.col("clip_id_b").alias("id_b"),
                    "n_match", "jaccard"))


def q_audio_ann_topk(spark, sf_dir):
    """Audio → similarity-family bridge: per-clip log-band spectral
    embeddings (audio.clip_embedding — 64 geometric bands of the mean
    Hann/rfft power shape, log-compressed, unit L2) flow UNCHANGED into
    similarity.brute_force_topk. 200 RNG clips + 100 mulaw re-encodes
    under new ids; each dup queries for its top-1 neighbor — the
    invariant (asserted in tests/test_audio.py and visible in the rows:
    neighbor_id == the source clip at cosine ≥ 0.989) is the check.
    Rows-only: the rfft has no SQL replay; the consuming ANN plumbing
    carries its own exact oracles on the embeddings table (ann_topk,
    ann_topk_lsh_exact, ann_topk_ivf_exact)."""
    from condor_spark import fixtures
    from condor_spark.engine.audio import audio_embeddings
    from condor_spark.engine.similarity import brute_force_topk

    clips = fixtures.audio_clips(spark, 200, num_partitions=8)
    dups = fixtures.reencode_dups(
        clips.filter(F.col("clip_id") < "clip-000000000100"))
    emb = audio_embeddings(clips.unionByName(dups))
    return brute_force_topk(emb, [f"dup-{i:012d}" for i in range(100)],
                            k=1, id_col="clip_id")


def q_stream_text_dedup(spark, sf_dir):
    """Streaming EXACT dedup-on-ingest over the driver's own documents
    table (the text twin of stream_fp_dedup, same engine): the originals
    arrive as batch 0, then an upper-cased / whitespace-mangled copy of
    every doc under doc_id+10000 arrives as batch 1 — content-identical
    under the md5(lower(normalized-whitespace)) fingerprint
    (text.fingerprints), so each planted pair surfaces in batch 1 with
    n_match=1, jaccard=1.0. One whole-doc fingerprint per row and no df
    cap, so stream == batch holds unconditionally and DuckDB replays the
    union + mutation + normalization + md5 self-join directly against
    the same parquet. The near-dup streaming variant is stream_fp_dedup
    (shingle fps need the stop-fp cap; 3-gram text shingles are hot by
    construction, so the text near-dup scale path stays MinHash/LSH)."""
    from condor_spark.engine.dedup_stream import StreamFpDedup
    from condor_spark.engine.text import fingerprints

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    mutated = docs.select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.lit("  "), F.upper("text"), F.lit("   ")).alias("text"))
    tmp = _fresh_tmp("textdedup", sf_dir)
    src = f"{tmp}/docs"
    docs.coalesce(1).write.mode("append").parquet(src)
    mutated.coalesce(1).write.mode("append").parquet(src)
    job = StreamFpDedup(
        sink_dir=f"{tmp}/sink",
        fingerprint_fn=lambda df: fingerprints(df).select("doc_id",
                                                          "fingerprint"),
        min_matches=1, max_df=None, id_col="doc_id")
    job.run(spark, src, f"{tmp}/ckpt")
    return (job.read_pairs(spark)
            .select(F.col("doc_id_a").alias("id_a"),
                    F.col("doc_id_b").alias("id_b"),
                    "n_match", "jaccard"))


def q_cm_frequency_tree(spark, sf_dir):
    """Two-level treeReduce merge topology — byte-identical synopses to the
    flat merge, so it shares cm_user_frequency's exact oracle."""
    from condor_spark.engine.skew import build_batch_tree

    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="countmin", params=dict(width=8192, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    syn = build_batch_tree(df, spec, fanout=4)
    res = ev.frequency_estimates(syn, _user_keys(df))
    return res.select(F.col("window_start").cast(NTZ).alias("window_start"),
                      "key", "est_count")


_DYADIC_RANGES = [(0, 15), (16, 63), (0, 127), (37, 201), (100, 421),
                  (200, 200), (480, 600), (0, 1023)]
_DYADIC_QS = [0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _dyadic_events(spark, sf_dir):
    """floor(value) as the integer key in [0, 1024) for the dyadic family
    (events.value spans ~[0, 561) across scale factors)."""
    from condor_spark.engine import dyadic

    df = _events(spark, sf_dir).withColumn(
        "vkey", F.floor("value").cast("long"))
    return dyadic.build_dyadic_latest(
        df, "vkey", bits=10, height=5, seed=7,
        ts_column="ts", window=Tumbling(DAY))


def q_dyadic_range_count(spark, sf_dir):
    """Dyadic CM range counts over the latest 1-day window — answers
    count(lo <= floor(value) <= hi) from sketch node lookups alone, no key
    scan (engine/dyadic.py; CM paper §4.2). EXACT at this sizing: every
    level is oversampled 64x its key domain, so all touched node estimates
    equal true counts (promotion asserted by tests/test_dyadic.py)."""
    from condor_spark.engine import dyadic

    dy = _dyadic_events(spark, sf_dir)
    qdf = spark.createDataFrame(_DYADIC_RANGES, "lo long, hi long")
    return (dyadic.range_count_queries(qdf, "lo", "hi", dy)
            .select("lo", "hi", "est_count"))


def q_dyadic_heavy_hitters(spark, sf_dir):
    """Dyadic CM heavy hitters over user_id (global window): every user
    with >= ceil(0.8% of N) events, found by prefix-tree descent without
    enumerating the user universe (CM paper §4.2). Exact at this sizing:
    descent never drops a true heavy hitter (CM overestimates only) and
    level-0 estimates are exact, so output == the true HH set. bits=12
    leaves ~2.7x headroom over sf0.1's max user_id (1499); a bigger
    fixture fails LOUDLY via the build's domain guard, never silently."""
    from condor_spark.engine import dyadic

    df = _events(spark, sf_dir)
    dy = dyadic.build_dyadic_latest(df, "user_id", bits=12, height=5, seed=7)
    thr = (dy.n * 8 + 999) // 1000
    return dyadic.heavy_hitters(spark, dy, thr).select("key", "est_count")


def q_dyadic_quantile(spark, sf_dir):
    """Dyadic CM rank quantiles of floor(value) over the latest 1-day
    window: binary descent over prefix counts (CM paper §4.3) — the
    large-domain rank twin of ddsketch_quantiles. Exact at this sizing."""
    from condor_spark.engine import dyadic

    dy = _dyadic_events(spark, sf_dir)
    qdf = spark.createDataFrame([(x,) for x in _DYADIC_QS], "q double")
    return dyadic.quantile_queries(qdf, "q", dy).select("q", "est_key")


def q_stream_dyadic_range(spark, sf_dir):
    """The dyadic hierarchy maintained as STREAMING state: because the
    whole tree is one registered kernel (synopsis.countmin.DyadicSketch),
    the applyInPandasWithState path (StatefulSynopsisStream) takes it
    unchanged — ordered file replay → watermark → keyed tree state →
    event-time-timeout emission. The latest closed window's blob answers
    the same range set as dyadic_range_count; closed-window state must
    equal the batch build exactly, so they share the exact oracle."""
    from condor_spark import fixtures
    from condor_spark.engine import dyadic
    from condor_spark.engine.stateful import StatefulSynopsisStream
    from condor_spark.synopsis.base import Synopsis

    df = _events(spark, sf_dir).withColumn("vkey", F.floor("value").cast("long"))
    max_ts = df.agg(F.max("ts")).collect()[0][0]
    cutoff = pd.Timestamp(max_ts) + pd.Timedelta(days=1)
    tmp = _fresh_tmp("dyadicstream", sf_dir)
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    fixtures.replay_in_order(
        spark, df, src, n_chunks=5,
        flush_ts=[cutoff + pd.Timedelta(days=40), cutoff + pd.Timedelta(days=80)])

    spec = dyadic.dyadic_spec("vkey", bits=10, height=5, seed=7,
                              ts_column="ts", window=Tumbling(DAY))
    job = StatefulSynopsisStream(spec, watermark_delay="1 hour")
    q = job.start(spark, src, out, ckpt, max_files_per_trigger=1)
    _await(q)

    row = (spark.read.parquet(out)
           .filter(F.col("window_end") <= F.lit(cutoff))
           .orderBy(F.col("window_end").desc()).limit(1).collect())[0]
    dy = dyadic.snapshot_from(Synopsis.from_bytes(bytes(row["state"])),
                              row["window_start"], row["window_end"])
    qdf = spark.createDataFrame(_DYADIC_RANGES, "lo long, hi long")
    return (dyadic.range_count_queries(qdf, "lo", "hi", dy)
            .select("lo", "hi", "est_count"))


def q_stream_dyadic_querylatest(spark, sf_dir):
    """Continuous RANGE-query stream over the dyadic hierarchy: the
    snapshot is maintained by the exactly-once streaming sink (kind=dyadic
    — one tree blob per window), then a 3-batch (lo, hi) query stream is
    answered per micro-batch against the newest committed window via the
    vectorized Arrow kernel (per-batch snapshot broadcast, released after
    the answers are durable). Exact at this sizing, so every batch's
    answers equal the newest window's true range counts."""
    from condor_spark import fixtures
    from condor_spark.engine import dyadic
    from condor_spark.engine.streaming import (QueryLatestStream,
                                               StreamingSynopsisJob)

    df = _events(spark, sf_dir).withColumn("vkey", F.floor("value").cast("long"))
    tmp = _fresh_tmp("dyql", sf_dir)
    fixtures.replay_in_order(spark, df, f"{tmp}/src", n_chunks=5)
    spec = dyadic.dyadic_spec("vkey", bits=10, height=5, seed=7,
                              ts_column="ts", window=Tumbling(DAY))
    job = StreamingSynopsisJob(spec, sink_dir=f"{tmp}/sink",
                               watermark_delay="1 hour")
    _await(job.start(spark, f"{tmp}/src", f"{tmp}/ckpt"))

    qdf = spark.createDataFrame(
        [(b, lo, hi) for b in range(3) for lo, hi in _DYADIC_RANGES],
        "q_batch long, lo long, hi long")
    fixtures.replay_in_order(spark, qdf, f"{tmp}/qsrc", n_chunks=3,
                             ts_col="q_batch")
    ql = QueryLatestStream(job, out_dir=f"{tmp}/answers",
                           key_column=("lo", "hi"))
    _await(ql.start(spark, f"{tmp}/qsrc", f"{tmp}/qckpt"))
    res = ql.read_answers(spark)
    return res.select(F.col("batch").cast("long").alias("q_batch"),
                      "key", "est_count")


def q_audio_corpus_overlap(spark, sf_dir):
    """Corpus-level audio contamination rate under the EXACT-oracle gate:
    KMV sketches over band-energy fingerprint shingles of two clip corpora
    (gated closed-form clips, param_mod=120 so contents fold onto i%120;
    corpus A = clips 0-59, corpus B = clips 60-239 — B contains a re-encode
    of every A content, so est_intersection ~= est_a and jaccard ~= the
    fingerprint share of the duplicated contents). The oracle replays the
    ENTIRE pipeline in SQL: synth -> pcm16 lattice -> frame energies ->
    levels -> shingle fingerprints (the audio_fp_exact CTE chain) -> KMV
    splitmix64 min-k -> exact integer estimators — bit-for-bit. This is
    the dataset-curation question ("what fraction of the new audio corpus
    is already in the training set?") answered from two <= 8 KB blobs."""
    from condor_spark import fixtures
    from condor_spark.engine.audio import band_energy_fingerprints

    clips = fixtures.audio_clips_exact(spark, 240, num_partitions=8,
                                       param_mod=120, gate=True)
    fps = band_energy_fingerprints(clips, frame=128, shingle=4)
    idx = F.regexp_extract("clip_id", r"(\d+)$", 1).cast("long")
    df = (fps.withColumn("corpus", F.when(idx < 60, "a").otherwise("b"))
          .withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp")))
    spec = SynopsisSpec(kind="kmv", params=dict(k=1024, seed=7),
                        column="fp", ts_column="ts", window=Tumbling(DAY),
                        stratify_by="corpus")
    return (ev.overlap_strata(build_batch(df, spec), "a", "b")
            .select("est_a", "est_b", "est_union", "est_intersection",
                    "jaccard"))


def q_cep_sequence(spark, sf_dir):
    """CEP batch: every signup followed by a purchase of the same user
    within 3 days (JVM equi-join + event-time range predicate)."""
    from condor_spark.engine.cep import sequence_matches
    return sequence_matches(_events(spark, sf_dir), within="3 days")


def q_cep_sequence_first(spark, sf_dir):
    """CEP batch, earliest-match-only (MATCH_RECOGNIZE-flavored)."""
    from condor_spark.engine.cep import sequence_matches
    return sequence_matches(_events(spark, sf_dir), within="3 days",
                            earliest_only=True)


def q_cep_chain3(spark, sf_dir):
    """3-step CEP chain: signup -> view -> purchase within 1 day."""
    from condor_spark.engine.cep import sequence_chain
    return sequence_chain(_events(spark, sf_dir),
                          steps=("signup", "view", "purchase"), within="1 day")


def q_stream_cep_sequence(spark, sf_dir):
    """CEP streaming: keyed pending-event state; pairs emit exactly once at
    the later element's arrival, so a full replay equals the batch join."""

    from condor_spark import fixtures
    from condor_spark.engine.cep import StatefulSequenceStream

    df = _events(spark, sf_dir)
    tmp = _fresh_tmp("cep", sf_dir)
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    fixtures.replay_in_order(spark, df, src, n_chunks=5)

    job = StatefulSequenceStream(within="3 days", watermark_delay="1 hour")
    q = job.start(spark, src, out, ckpt, max_files_per_trigger=1)
    _await(q)
    res = spark.read.parquet(out)
    return res.select("key",
                      F.col("first_ts").cast(NTZ).alias("first_ts"),
                      F.col("second_ts").cast(NTZ).alias("second_ts"))


def q_cep_absence(spark, sf_dir):
    """CEP negation batch: every signup with NO purchase of the same user
    within 3 days (pushed-filter anti-join, codegen range predicate)."""
    from condor_spark.engine.cep import absence_matches
    return absence_matches(_events(spark, sf_dir), within="3 days")


def q_cep_kleene(spark, sf_dir):
    """CEP Kleene-plus batch: signup → view+ → purchase within 3 days,
    with the view count per endpoint pair."""
    from condor_spark.engine.cep import kleene_matches
    return kleene_matches(_events(spark, sf_dir), within="3 days")


def q_stream_cep_absence(spark, sf_dir):
    """CEP negation streaming: timer-driven emission — a signup emits in
    the micro-batch whose watermark first passes signup_ts + within,
    uncancelled; full replay equals the batch anti-join exactly. The flush
    sentinels are far-future purchases of key -1 (they survive the kind
    filter ahead of the watermark node without touching real keys)."""

    from condor_spark import fixtures
    from condor_spark.engine.cep import StatefulAbsenceStream

    df = _events(spark, sf_dir)
    max_ts = df.agg(F.max("ts")).collect()[0][0]
    cutoff = pd.Timestamp(max_ts) + pd.Timedelta(days=1)
    tmp = _fresh_tmp("cepabs", sf_dir)
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    fixtures.replay_in_order(
        spark, df, src, n_chunks=5,
        flush_ts=[cutoff + pd.Timedelta(days=40), cutoff + pd.Timedelta(days=80)],
        flush_mutate=lambda r: r.assign(event_type="purchase", user_id=-1))

    job = StatefulAbsenceStream(within="3 days", watermark_delay="1 hour")
    q = job.start(spark, src, out, ckpt, max_files_per_trigger=1)
    _await(q)
    return (spark.read.parquet(out)
            .select("key", F.col("first_ts").cast(NTZ).alias("first_ts")))


def q_stream_cep_kleene(spark, sf_dir):
    """CEP Kleene-plus streaming: a pair's mid count finalizes when the
    watermark clears its second_ts (all admissible mids have arrived), so a
    full replay reproduces the batch pair+count aggregate exactly."""

    from condor_spark import fixtures
    from condor_spark.engine.cep import StatefulKleeneStream

    df = _events(spark, sf_dir)
    max_ts = df.agg(F.max("ts")).collect()[0][0]
    cutoff = pd.Timestamp(max_ts) + pd.Timedelta(days=1)
    tmp = _fresh_tmp("cepkln", sf_dir)
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    fixtures.replay_in_order(
        spark, df, src, n_chunks=5,
        flush_ts=[cutoff + pd.Timedelta(days=40), cutoff + pd.Timedelta(days=80)],
        flush_mutate=lambda r: r.assign(event_type="purchase", user_id=-1))

    job = StatefulKleeneStream(within="3 days", watermark_delay="1 hour")
    q = job.start(spark, src, out, ckpt, max_files_per_trigger=1)
    _await(q)
    return (spark.read.parquet(out)
            .select("key", F.col("first_ts").cast(NTZ).alias("first_ts"),
                    F.col("second_ts").cast(NTZ).alias("second_ts"), "n_mid"))


def q_cep_adjacent(spark, sf_dir):
    """CEP strict contiguity (Flink `next()`): signup IMMEDIATELY followed
    by a purchase — the key's next event in (ts, event_id) order over ALL
    kinds — within 3 days. One keyed shuffle + codegen window lead."""
    from condor_spark.engine.cep import adjacent_matches
    return adjacent_matches(_events(spark, sf_dir), within="3 days",
                            tiebreak_col="event_id")


def q_stream_cep_adjacent(spark, sf_dir):
    """CEP strict contiguity streaming: order-finality emission — a pair
    emits when the watermark clears its later element's ts (nothing can
    still sort between them), so a full replay equals the batch window."""

    from condor_spark import fixtures
    from condor_spark.engine.cep import StatefulAdjacentStream

    df = _events(spark, sf_dir)
    max_ts = df.agg(F.max("ts")).collect()[0][0]
    cutoff = pd.Timestamp(max_ts) + pd.Timedelta(days=1)
    tmp = _fresh_tmp("cepadj", sf_dir)
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    fixtures.replay_in_order(
        spark, df, src, n_chunks=5,
        flush_ts=[cutoff + pd.Timedelta(days=40), cutoff + pd.Timedelta(days=80)],
        flush_mutate=lambda r: r.assign(event_type="click", user_id=-1))

    job = StatefulAdjacentStream(within="3 days", watermark_delay="1 hour")
    q = job.start(spark, src, out, ckpt, max_files_per_trigger=1)
    _await(q)
    return (spark.read.parquet(out)
            .select("key", F.col("first_ts").cast(NTZ).alias("first_ts"),
                    F.col("second_ts").cast(NTZ).alias("second_ts")))


def q_stream_cep_chain3(spark, sf_dir):
    """CEP 3-step chain streaming: in-band triple emission — a chain emits
    when its latest-arriving element lands, so a full replay equals the
    batch 3-way join exactly."""

    from condor_spark import fixtures
    from condor_spark.engine.cep import StatefulChainStream

    df = _events(spark, sf_dir)
    max_ts = df.agg(F.max("ts")).collect()[0][0]
    cutoff = pd.Timestamp(max_ts) + pd.Timedelta(days=1)
    tmp = _fresh_tmp("cepchn", sf_dir)
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    fixtures.replay_in_order(
        spark, df, src, n_chunks=5,
        flush_ts=[cutoff + pd.Timedelta(days=40), cutoff + pd.Timedelta(days=80)],
        flush_mutate=lambda r: r.assign(event_type="click", user_id=-1))

    job = StatefulChainStream(steps=("signup", "view", "purchase"),
                              within="1 day", watermark_delay="1 hour")
    q = job.start(spark, src, out, ckpt, max_files_per_trigger=1)
    _await(q)
    return (spark.read.parquet(out)
            .select("key", F.col("ts1").cast(NTZ).alias("ts1"),
                    F.col("ts2").cast(NTZ).alias("ts2"),
                    F.col("ts3").cast(NTZ).alias("ts3")))


def q_stream_stateful_frequency(spark, sf_dir):
    """The applyInPandasWithState streaming path, end-to-end: ordered file
    replay → watermark → keyed sketch state → event-time-timeout emission.
    Closed windows must match the exact batch oracle (cm_user_frequency)."""

    from condor_spark import fixtures
    from condor_spark.engine.stateful import StatefulSynopsisStream

    df = _events(spark, sf_dir)
    max_ts = df.agg(F.max("ts")).collect()[0][0]
    cutoff = pd.Timestamp(max_ts) + pd.Timedelta(days=1)
    tmp = _fresh_tmp("stateful", sf_dir)
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    fixtures.replay_in_order(
        spark, df, src, n_chunks=5,
        flush_ts=[cutoff + pd.Timedelta(days=40), cutoff + pd.Timedelta(days=80)])

    spec = SynopsisSpec(kind="countmin", params=dict(width=8192, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    job = StatefulSynopsisStream(spec, watermark_delay="1 hour")
    q = job.start(spark, src, out, ckpt, max_files_per_trigger=1)
    _await(q)

    syn = spark.read.parquet(out).filter(F.col("window_end") <= F.lit(cutoff))
    res = ev.frequency_estimates(syn, _user_keys(df))
    return res.select(F.col("window_start").cast(NTZ).alias("window_start"),
                      "key", "est_count")


def q_stream_sketch_sql(spark, sf_dir):
    """Sketch maintenance as NATIVE streaming aggregation state
    (sqlbuild.StreamingSketchSQLJob): watermark → JVM hash exprs → explode →
    windowed cell counts in append mode, blobs assembled per closed window
    in foreachBatch. Closed windows are byte-identical to the batch build,
    so this shares cm_user_frequency's exact oracle."""

    from condor_spark import fixtures
    from condor_spark.engine.sqlbuild import StreamingSketchSQLJob

    df = _events(spark, sf_dir)
    max_ts = df.agg(F.max("ts")).collect()[0][0]
    cutoff = pd.Timestamp(max_ts) + pd.Timedelta(days=1)
    tmp = _fresh_tmp("sqlstream", sf_dir)
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    fixtures.replay_in_order(
        spark, df, src, n_chunks=5,
        flush_ts=[cutoff + pd.Timedelta(days=40), cutoff + pd.Timedelta(days=80)])

    spec = SynopsisSpec(kind="countmin", params=dict(width=8192, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    job = StreamingSketchSQLJob(spec, watermark_delay="1 hour")
    q = job.start(spark, src, out, ckpt, max_files_per_trigger=1)
    _await(q)

    syn = (job.read_output(spark, out).drop("spec_id")
           .filter(F.col("window_end") <= F.lit(cutoff)))
    res = ev.frequency_estimates(syn, _user_keys(df))
    return res.select(F.col("window_start").cast(NTZ).alias("window_start"),
                      "key", "est_count")


def q_stream_sessions(spark, sf_dir):
    """Streaming session windows (gap-merge in applyInPandasWithState);
    closed sessions must equal the batch sessionization → shares the exact
    session_windows oracle."""

    from condor_spark import fixtures
    from condor_spark.engine.stateful import StatefulSessionStream

    df = _events(spark, sf_dir)
    max_ts = df.agg(F.max("ts")).collect()[0][0]
    cutoff = pd.Timestamp(max_ts) + pd.Timedelta(days=1)
    tmp = _fresh_tmp("sessions", sf_dir)
    fixtures.replay_in_order(
        spark, df, f"{tmp}/src", n_chunks=5,
        flush_ts=[cutoff + pd.Timedelta(days=40), cutoff + pd.Timedelta(days=80)])
    spec = SynopsisSpec(kind="hll", params=dict(log_reg_num=4, seed=7),
                        column="event_id", ts_column="ts",
                        window=Session("30 minutes"), stratify_by="user_id")
    job = StatefulSessionStream(spec, gap="30 minutes", watermark_delay="1 hour")
    q = job.start(spark, f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt",
                  max_files_per_trigger=1)
    _await(q)
    syn = (spark.read.parquet(f"{tmp}/out")
           .filter(F.col("window_start") < F.lit(cutoff)))
    return syn.select(F.col("stratum"),
                      F.col("window_start").cast(NTZ).alias("window_start"),
                      F.col("window_end").cast(NTZ).alias("window_end"),
                      F.col("n"))


def q_stream_sliding(spark, sf_dir):
    """Streaming sliding windows on the stateful path: slice partials are
    expanded into their windows JVM-side, keyed state merges them, windows
    fire on event-time timeout. Every closed window must match the batch
    sliding build → shares the exact sliding_counts oracle."""

    from condor_spark import fixtures
    from condor_spark.engine.stateful import StatefulSynopsisStream

    df = _events(spark, sf_dir)
    max_ts = df.agg(F.max("ts")).collect()[0][0]
    cutoff = pd.Timestamp(max_ts) + pd.Timedelta(days=2)
    tmp = _fresh_tmp("sliding", sf_dir)
    fixtures.replay_in_order(
        spark, df, f"{tmp}/src", n_chunks=5,
        flush_ts=[cutoff + pd.Timedelta(days=40), cutoff + pd.Timedelta(days=80)])
    spec = SynopsisSpec(kind="hll", params=dict(log_reg_num=4, seed=7),
                        column="event_id", ts_column="ts",
                        window=Sliding(DAY, "6 hours"))
    job = StatefulSynopsisStream(spec, watermark_delay="1 hour")
    q = job.start(spark, f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt",
                  max_files_per_trigger=1)
    _await(q)
    syn = spark.read.parquet(f"{tmp}/out").filter(
        F.col("window_start") < F.lit(cutoff))
    return syn.select(F.col("window_start").cast(NTZ).alias("window_start"),
                      F.col("n").alias("cnt"))


def q_stream_count_windows(spark, sf_dir):
    """Streaming count windows (applyInPandasWithState counter); emitted
    full windows match the batch global-order routing exactly."""

    from condor_spark import fixtures
    from condor_spark.engine.stateful import StatefulCountWindowStream

    df = _events(spark, sf_dir)
    spec = SynopsisSpec(kind="hll", params=dict(log_reg_num=4, seed=7),
                        column="event_id", ts_column="ts",
                        window=CountTumbling(1000), tiebreak_column="event_id")
    tmp = _fresh_tmp("cw", sf_dir)
    fixtures.replay_in_order(spark, df, f"{tmp}/src", n_chunks=5)
    q = StatefulCountWindowStream(spec, count=1000).start(
        spark, f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt", max_files_per_trigger=1)
    _await(q)
    return spark.read.parquet(f"{tmp}/out").select("window_id", "n")


def q_stream_query_latest(spark, sf_dir):
    """Continuous query-stream evaluation (QueryLatest.java:60-65 +
    IPQuerySource analogue): the synopsis snapshot is maintained by the
    exactly-once streaming sink, then a 3-batch query stream is answered
    per micro-batch against the newest committed window (broadcast blob,
    vectorized answers, no shuffle). CM at this width is exact, so every
    answer matches the newest window's true counts."""

    from condor_spark import fixtures
    from condor_spark.engine.streaming import (QueryLatestStream,
                                               StreamingSynopsisJob)

    df = _events(spark, sf_dir)
    tmp = _fresh_tmp("qls", sf_dir)
    fixtures.replay_in_order(spark, df, f"{tmp}/src", n_chunks=5)
    spec = SynopsisSpec(kind="countmin", params=dict(width=8192, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    job = StreamingSynopsisJob(spec, sink_dir=f"{tmp}/sink",
                               watermark_delay="1 hour")
    _await(job.start(spark, f"{tmp}/src", f"{tmp}/ckpt"))

    keys = _user_keys(df)
    qdf = spark.createDataFrame([(b, k) for b in range(3) for k in keys],
                                "q_batch long, key long")
    fixtures.replay_in_order(spark, qdf, f"{tmp}/qsrc", n_chunks=3,
                             ts_col="q_batch")
    ql = QueryLatestStream(job, out_dir=f"{tmp}/answers", key_column="key")
    _await(ql.start(spark, f"{tmp}/qsrc", f"{tmp}/qckpt"))

    res = ql.read_answers(spark)
    return res.select(F.col("batch").cast("long").alias("q_batch"),
                      "key", "est_count")


def q_stream_mg_querylatest(spark, sf_dir):
    """Continuous heavy-hitter query stream: the Misra-Gries snapshot is
    maintained by the exactly-once sink; a 3-batch stream of user-key
    queries is answered per micro-batch against the newest committed
    window (broadcast blob, vectorized lower-bound estimates via
    MisraGries.query). Exact at this capacity, so it shares
    stream_query_latest's oracle — the same answers the CM stream gives,
    from an O(capacity) summary instead of a width*height grid."""
    from condor_spark import fixtures
    from condor_spark.engine.streaming import (QueryLatestStream,
                                               StreamingSynopsisJob)

    df = _events(spark, sf_dir)
    tmp = _fresh_tmp("mgqls", sf_dir)
    fixtures.replay_in_order(spark, df, f"{tmp}/src", n_chunks=5)
    spec = SynopsisSpec(kind="mg", params=dict(capacity=1024),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    job = StreamingSynopsisJob(spec, sink_dir=f"{tmp}/sink",
                               watermark_delay="1 hour")
    _await(job.start(spark, f"{tmp}/src", f"{tmp}/ckpt"))

    keys = _user_keys(df)
    qdf = spark.createDataFrame([(b, k) for b in range(3) for k in keys],
                                "q_batch long, key long")
    fixtures.replay_in_order(spark, qdf, f"{tmp}/qsrc", n_chunks=3,
                             ts_col="q_batch")
    ql = QueryLatestStream(job, out_dir=f"{tmp}/answers", key_column="key")
    _await(ql.start(spark, f"{tmp}/qsrc", f"{tmp}/qckpt"))

    return ql.read_answers(spark).select(
        F.col("batch").cast("long").alias("q_batch"), "key", "est_count")


def q_stream_compacted(spark, sf_dir):
    """Snapshot compaction end-to-end: maintain the exactly-once manifest
    sink over the full replay, bin-pack the live manifest into ONE file
    (compact_snapshots — the rewriteDataFiles analogue), then evaluate the
    canonical frequency query from the COMPACTED snapshot. Compaction is a
    pure rewrite, so this shares cm_user_frequency's exact oracle."""

    from condor_spark import fixtures
    from condor_spark.engine.streaming import StreamingSynopsisJob

    df = _events(spark, sf_dir)
    tmp = _fresh_tmp("compact", sf_dir)
    fixtures.replay_in_order(spark, df, f"{tmp}/src", n_chunks=5)
    spec = SynopsisSpec(kind="countmin", params=dict(width=8192, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    job = StreamingSynopsisJob(spec, sink_dir=f"{tmp}/sink",
                               watermark_delay="1 hour")
    _await(job.start(spark, f"{tmp}/src", f"{tmp}/ckpt"))
    info = job.compact_snapshots(spark)
    if not info["compacted"] or info["files_after"] != 1:
        raise RuntimeError(f"compaction did not pack the manifest: {info}")
    res = ev.frequency_estimates(job.read_state_df(spark), _user_keys(df))
    return res.select(F.col("window_start").cast(NTZ).alias("window_start"),
                      "key", "est_count")


def q_stream_incremental(spark, sf_dir):
    """Incremental read between snapshots (the Iceberg incremental-scan /
    changelog analogue, ``StreamingSynopsisJob.read_changes``): events
    replay in TWO deterministic phases split at the 80th-percentile
    distinct timestamp; after both batches commit, read ONLY the window
    buckets the second batch touched (insert = window born in batch 2,
    update = re-merged) and answer the canonical CM frequency query from
    that delta. Exact oracle: the changed-window set is the windows with
    any event at/after the cutoff, their counts are the full-table
    per-(window, user) counts (the delta rows are the MERGED state, not a
    diff), and CM at this sizing is exact."""

    from condor_spark import fixtures
    from condor_spark.engine.streaming import StreamingSynopsisJob

    df = _events(spark, sf_dir)
    cuts = sorted(r[0] for r in df.select("ts").distinct().collect())
    cut = cuts[int(0.8 * len(cuts))]
    tmp = _fresh_tmp("increm", sf_dir)
    fixtures.replay_in_order(spark, df.filter(F.col("ts") < F.lit(cut)),
                             f"{tmp}/src", n_chunks=1)
    fixtures.replay_in_order(spark, df.filter(F.col("ts") >= F.lit(cut)),
                             f"{tmp}/src", n_chunks=1, base=1_000_000_100)
    spec = SynopsisSpec(kind="countmin", params=dict(width=8192, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling(DAY))
    job = StreamingSynopsisJob(spec, sink_dir=f"{tmp}/sink",
                               watermark_delay="1 hour")
    _await(job.start(spark, f"{tmp}/src", f"{tmp}/ckpt"))
    v1 = next(s["version"] for s in job.snapshots() if s["batch_id"] == 0)
    delta = job.read_changes(spark, from_version=v1).select(
        (F.col("window_start").cast("double") / 1e6).cast("timestamp")
        .alias("window_start"),
        (F.col("window_end").cast("double") / 1e6).cast("timestamp")
        .alias("window_end"),
        "stratum", "state", "n",
        F.col("_change_type").alias("change_type"))
    res = ev.frequency_estimates(delta.drop("change_type"), _user_keys(df))
    ct = delta.select("window_start", "change_type").distinct()
    return (res.join(F.broadcast(ct), "window_start")
            .select(F.col("window_start").cast(NTZ).alias("window_start"),
                    "change_type", "key", "est_count"))


def q_stream_quantile_latest(spark, sf_dir):
    """Continuous QUANTILE query stream against the latest DDSketch window
    (QueryLatestStream kind dispatch → codegen unrolled binary search,
    PLANS.md §12). Oracle: the DD estimator on the newest day bucket —
    rank = max(1, ceil(q·n)), representative of the rank-th value — the
    same replay as ddsketch_quantiles restricted to the last window."""

    from condor_spark import fixtures
    from condor_spark.engine.streaming import (QueryLatestStream,
                                               StreamingSynopsisJob)

    df = _events(spark, sf_dir).filter(F.col("value") > 0)
    tmp = _fresh_tmp("qlq", sf_dir)
    fixtures.replay_in_order(spark, df, f"{tmp}/src", n_chunks=4)
    spec = SynopsisSpec(kind="ddsketch",
                        params=dict(relative_accuracy=0.01, max_num_bins=4096),
                        column="value", ts_column="ts", window=Tumbling(DAY))
    job = StreamingSynopsisJob(spec, sink_dir=f"{tmp}/sink",
                               watermark_delay="1 hour")
    _await(job.start(spark, f"{tmp}/src", f"{tmp}/ckpt"))

    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    fixtures.replay_in_order(
        spark, spark.createDataFrame([(q,) for q in qs], "q double"),
        f"{tmp}/qsrc", n_chunks=1, ts_col="q")
    ql = QueryLatestStream(job, out_dir=f"{tmp}/answers", key_column="q")
    _await(ql.start(spark, f"{tmp}/qsrc", f"{tmp}/qckpt"))
    return (ql.read_answers(spark)
            .select("key", F.round("est_value", 6).alias("est_value")))


def q_stream_join(spark, sf_dir):
    """Stateful stream-stream clip⋈transcript join (watermarks + lag-bounded
    state), availableNow over ordered file replay; rows-only check (the
    joined table's own invariants are asserted in tests/test_stateful.py)."""

    from condor_spark import fixtures
    from condor_spark.engine.joins import run_join_to_parquet, split_streams

    clips = fixtures.audio_clips(spark, 400, num_partitions=4)
    audio, txt = split_streams(clips, lag="5 seconds")
    tmp = _fresh_tmp("join", sf_dir)
    a_dir, t_dir = f"{tmp}/audio", f"{tmp}/text"
    audio.repartitionByRange(3, "audio_ts").write.parquet(a_dir)
    txt.repartitionByRange(3, "txt_ts").write.parquet(t_dir)
    q = run_join_to_parquet(spark, a_dir, t_dir, f"{tmp}/out", f"{tmp}/ckpt",
                            max_lag="5 seconds", watermark_delay="60 seconds")
    _await(q)
    got = spark.read.parquet(f"{tmp}/out")
    return (got.select("clip_id", "codec", "sr_hz",
                       F.length("transcript").alias("transcript_len"))
            .orderBy("clip_id"))


def q_stream_join_events(spark, sf_dir):
    """Stateful stream-stream join with an EXACT oracle (the north-rule
    "stateful join" surface over the driver's own table): events is split
    at the producer into a head stream (event_id, ts, user_id, event_type,
    value) and a detail stream (event_id, props) whose arrival lags the
    head by lag(event_id) = (event_id*7919 mod 8s) — deterministic, so
    DuckDB replays the whole pipeline as a relational join. The watermarked
    lag-bounded inner join (max_lag = 5s < the 8s lag domain) keeps exactly
    the rows whose derived lag fits the bound — the range predicate
    genuinely filters AND bounds the state store — and each side replays as
    4 mtime-ordered file batches (maxFilesPerTrigger=1), so unmatched rows
    carry across micro-batch boundaries in the symmetric-hash-join state."""
    from condor_spark import fixtures
    from condor_spark.engine.joins import lag_bounded_join

    df = _events(spark, sf_dir)
    # watermarks demand TIMESTAMP (not the parquet NTZ); the session TZ is
    # UTC, so the cast is lossless and the result casts back to NTZ below
    head = df.select("event_id", F.col("ts").cast("timestamp").alias("ts"),
                     "user_id", "event_type", "value")
    detail = df.select(
        "event_id", "props",
        F.timestamp_micros(F.unix_micros(F.col("ts").cast("timestamp"))
                           + F.pmod(F.col("event_id") * 7919,
                                    F.lit(8_000_000))).alias("d_ts"))
    tmp = _fresh_tmp("joinev", sf_dir)
    fixtures.replay_in_order(spark, head, f"{tmp}/head", n_chunks=4,
                             ts_col="ts")
    fixtures.replay_in_order(spark, detail, f"{tmp}/detail", n_chunks=4,
                             ts_col="d_ts")
    h = (spark.readStream.schema(head.schema)
         .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/head"))
    d = (spark.readStream.schema(detail.schema)
         .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/detail"))
    joined = lag_bounded_join(h, d, key="event_id", left_ts="ts",
                              right_ts="d_ts", max_lag="5 seconds",
                              watermark_delay="60 seconds")
    q = (joined.writeStream.format("parquet").option("path", f"{tmp}/out")
         .option("checkpointLocation", f"{tmp}/ckpt")
         .outputMode("append").trigger(availableNow=True).start())
    _await(q)
    got = spark.read.parquet(f"{tmp}/out")
    return got.select("event_id", "user_id", "event_type", "value", "props",
                      F.col("ts").cast(NTZ).alias("ts"),
                      F.col("d_ts").cast(NTZ).alias("d_ts"))


def q_skew_salted_agg(spark, sf_dir):
    """North-rule skew remedy #1 (engine/skew.py): a holistic per-key pass
    over a hot-key distribution, run as per-(key, salt-lane) applyInPandas
    partials + an algebraic merge across lanes, so no task ever receives a
    whole hot key's rows (event_type is the hot key). The per-lane partial
    sums integer cents (order-independent), so the 8-way lane split is
    bitwise-invisible and the result equals the plain GROUP BY oracle."""
    from condor_spark.engine.skew import with_salt

    df = _events(spark, sf_dir).select("event_type", "value")
    salted = with_salt(df, buckets=8)

    def lane_partial(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        # HALF_UP cents (floor(x+0.5) == DuckDB round() away from the
        # exact-.5 boundary, unreachable from 2-dp doubles)
        cents = np.floor(pdf["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        return pd.DataFrame({"event_type": [pdf["event_type"].iloc[0]],
                             "n": [len(pdf)], "cents": [int(cents.sum())]})

    partial = (salted.groupBy("event_type", "__salt")
               .applyInPandas(lane_partial,
                              schema="event_type string, n long, cents long"))
    return (partial.groupBy("event_type")
            .agg(F.sum("n").alias("n_events"),
                 (F.sum("cents") / F.lit(100.0)).alias("sum_value"))
            .orderBy("event_type"))


def q_asof_join_events(spark, sf_dir):
    """As-of join (engine/joins.py asof_join): every event picks up the
    user's most recent purchase at-or-before its own timestamp — the
    time-series lookup Spark has no builtin for, planned as ONE shuffle
    (union merge + running window), no range-join explosion. (user_id, ts)
    is unique in the fixture, so the match is deterministic and DuckDB's
    native ASOF JOIN is an exact oracle. Inner flavor here — no-match
    rows would carry NULL timestamps, which the value-hash compare can't
    order stably; the left-outer flavor is pinned by tests/test_asof.py
    against pandas merge_asof."""
    from condor_spark.engine.joins import asof_join

    df = _events(spark, sf_dir)
    left = df.select("event_id", "user_id", "event_type", "value", "ts")
    right = (df.filter(F.col("event_type") == "purchase")
             .select("user_id", F.col("ts").alias("p_ts"),
                     F.col("value").alias("last_purchase_value")))
    out = asof_join(left, right, on="user_id", left_ts="ts",
                    right_ts="p_ts", how="inner")
    return out.select("event_id", "user_id", "event_type", "value",
                      F.col("ts").cast(NTZ).alias("ts"),
                      "last_purchase_value",
                      F.col("p_ts").cast(NTZ).alias("p_ts"))


def q_dedup_clusters(spark, sf_dir):
    """Transitive near-dup clustering (engine/graph.py): ngram-Jaccard
    pairs → alternating large-star/small-star connected components → one
    canonical doc per cluster (component = min doc_id, keep = canonical).
    The oracle replays the pair pipeline and closes it transitively with a
    recursive CTE, so the distributed star contraction is checked exactly
    — including singletons, which never enter the edge set."""
    from condor_spark.engine.graph import dedup_clusters

    docs = _docs(spark, sf_dir)
    pairs = text.ngram_jaccard_pairs(docs, shingle=3, threshold=0.6)
    return dedup_clusters(docs, pairs)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver contract registry.

    ORDER MATTERS: the driver verifies the FIRST 50 entries per round.
    Rounds 1-3 banked green CORRECTNESS rows for 68 queries (the r3 window
    of 50 was fully green, CORRECTNESS_r03); round 4 ROTATES the window to
    the 44 exact-oracle queries that had never had a driver row — every
    round-3 family (dyadic CM hierarchy, KMV set ops, Misra-Gries,
    decayed counts, codegen point-query kinds, PII / repetition /
    decontamination, streaming dedup-on-ingest, snapshot sinks, stream-CEP
    variants, join-size estimators, audio quality/overlap extras, the
    ANN/LSH exact twins and simhash_pairs) — plus four anchors re-pinned
    from the r3 window so the core engine paths stay under the gate every
    round: cm_user_frequency (flagship CM build), stream_stateful_frequency
    (applyInPandasWithState + exactly-once sink), wavelet_range_sums
    (ordered non-mergeable build + unify), audio_prep_exact (payload
    preprocessing) — and the NEW r4 reservoir_audit +
    biased_reservoir_audit, the randomized-sampler families' first
    driver-checkable queries (lossless-regime builds through the real
    per-partition build + cross-partition merge: weighted draw for
    reservoir, newest-k for biased).

    Round 5 ROTATES the window once more: the 6 anchors stay pinned (the
    core engine paths under the gate every round — flagship CM build, the
    applyInPandasWithState + exactly-once sink path, the ordered
    non-mergeable wavelet build, audio payload preprocessing, and the two
    lossless-regime sampler audits), and the other 44 slots go to the
    r1-r3-banked queries whose driver rows are now the OLDEST — every
    synopsis family (Bloom/Cuckoo/HLL/AMS/DDSketch/histograms incl.
    4LT + split-merge, FiFo, stratified + inversion variants), every
    window shape (tumbling/sliding/session/count/concurrent + stream
    twins), the evaluator surface (queryLatest / queryTimestamped /
    codegen SQL), CEP base patterns, joins (stream, as-of, bucketed,
    skew-salted), and the curation/text/ANN block — plus the NEW
    `audio_spectral_exact` (VERDICT r4 #3: the FFT family's first exact
    oracle — the real rfft operator on 64-sample closed-form clips
    replayed as an explicit direct DFT in SQL). Net effect across
    r3+r4+r5: nearly every exact-oracle query carries a driver row from
    the last three rounds (the handful displaced by the 50-slot cap —
    e.g. bucketed_join, quality_scores, ann_topk — stay pytest-verified
    every run).

    Slots 51+ are the r4-verified block (CORRECTNESS_r04, 49/49 green)
    plus the remaining banked queries — each still re-verified by
    tests/test_entry.py every run — followed by the genuinely rows-only
    block (randomized samplers, LSH/IVF approximations whose exact twins
    are driver-verified, FFT-based audio features with analytic pytest
    oracles instead of SQL replays)."""
    return {
        # ---- slots 1-50 (r5 window) -------------------------------------
        # anchors: core engine paths re-pinned under the gate every round
        "cm_user_frequency": q_cm_user_frequency,
        "stream_stateful_frequency": q_stream_stateful_frequency,
        "wavelet_range_sums": q_wavelet_range_sums,
        "audio_prep_exact": q_audio_prep_exact,
        "reservoir_audit": q_reservoir_audit,
        "biased_reservoir_audit": q_biased_reservoir_audit,
        # synopsis families, oldest driver rows first (r1-r3 banked)
        "bloom_membership": q_bloom_membership,
        "cuckoo_membership": q_cuckoo_membership,
        "equiwidth_hist": q_equiwidth_hist,
        "ddsketch_quantiles": q_ddsketch_quantiles,
        "fifo_latest": q_fifo_latest,
        "hll_distinct": q_hll_distinct,
        "ams_f2": q_ams_f2,
        "equidepth_exact": q_equidepth_exact,
        "equidepth_dd": q_equidepth_dd,
        "splitmerge_dd_hist": q_splitmerge_dd_hist,
        "hist4lt_ranges": q_hist4lt_ranges,
        "stratified_hist": q_stratified_hist,
        "wavelet_stratified": q_wavelet_stratified,
        "sliding_inversion": q_sliding_inversion,
        "sliding_inversion_stratified": q_sliding_inversion_stratified,
        "cm_frequency_tree": q_cm_frequency_tree,
        # window shapes + stream twins
        "tumbling_counts": q_tumbling_counts,
        "sliding_counts": q_sliding_counts,
        "session_windows": q_session_windows,
        "count_windows": q_count_windows,
        "concurrent_windows": q_concurrent_windows,
        "stream_wavelet": q_stream_wavelet,
        "stream_sliding": q_stream_sliding,
        "stream_sessions": q_stream_sessions,
        "stream_count_windows": q_stream_count_windows,
        # evaluator surface: queryLatest / queryTimestamped / codegen SQL
        "query_latest_hist": q_query_latest_hist,
        "query_latest_stratified": q_query_latest_stratified,
        "query_timestamped": q_query_timestamped,
        "query_timestamped_stratified": q_query_timestamped_stratified,
        "query_latest_sql": q_query_latest_sql,
        "cm_sql_frequency": q_cm_sql_frequency,
        "stream_sketch_sql": q_stream_sketch_sql,
        "stream_query_latest": q_stream_query_latest,
        # CEP base patterns
        "cep_sequence": q_cep_sequence,
        "stream_cep_sequence": q_stream_cep_sequence,
        "cep_absence": q_cep_absence,
        "cep_kleene": q_cep_kleene,
        "cep_adjacent": q_cep_adjacent,
        # joins
        "stream_join_events": q_stream_join_events,
        "asof_join_events": q_asof_join_events,
        "skew_salted_agg": q_skew_salted_agg,
        # curation / text / ANN
        "dedup_exact": q_dedup_exact,
        "minhash_pairs": q_minhash_pairs,
        # NEW r5 (VERDICT r4 #3): the FFT family's first driver row — the
        # real rfft spectral operator on 64-sample clips vs an explicit
        # direct-DFT SQL replay
        "audio_spectral_exact": q_audio_spectral_exact,
        # ---- slots 51+: banked green r1-r3, re-verified by pytest -------
        "bucketed_join": q_bucketed_join,
        "quality_scores": q_quality_scores,
        "ann_topk": q_ann_topk,
        # ---- r4-verified block (CORRECTNESS_r04 green) ------------------
        "dyadic_range_count": q_dyadic_range_count,
        "dyadic_heavy_hitters": q_dyadic_heavy_hitters,
        "dyadic_quantile": q_dyadic_quantile,
        "stream_dyadic_range": q_stream_dyadic_range,
        "stream_dyadic_querylatest": q_stream_dyadic_querylatest,
        "kmv_distinct": q_kmv_distinct,
        "kmv_sql_distinct": q_kmv_sql_distinct,
        "kmv_overlap": q_kmv_overlap,
        "stream_kmv_overlap": q_stream_kmv_overlap,
        "mg_heavy_hitters": q_mg_heavy_hitters,
        "mg_topk_tokens": q_mg_topk_tokens,
        "stream_mg_hh": q_stream_mg_hh,
        "mg_sql_hh": q_mg_sql_hh,
        "mg_entropy": q_mg_entropy,
        "stream_mg_querylatest": q_stream_mg_querylatest,
        "audio_fp_hh": q_audio_fp_hh,
        "decay_trending": q_decay_trending,
        "stream_decay_trending": q_stream_decay_trending,
        "stream_decay_querylatest": q_stream_decay_querylatest,
        "dd_quantile_pointquery": q_dd_quantile_pointquery,
        "cuckoo_pointquery": q_cuckoo_pointquery,
        "equiwidth_rangequery": q_equiwidth_rangequery,
        "stream_quantile_latest": q_stream_quantile_latest,
        "pii_scrub": q_pii_scrub,
        "repetition_scores": q_repetition_scores,
        "decontaminate": q_decontaminate,
        "stream_decontaminate": q_stream_decontaminate,
        "stream_fp_dedup": q_stream_fp_dedup,
        "stream_text_dedup": q_stream_text_dedup,
        "stream_compacted": q_stream_compacted,
        "stream_incremental": q_stream_incremental,
        "stream_cep_absence": q_stream_cep_absence,
        "stream_cep_kleene": q_stream_cep_kleene,
        "stream_cep_adjacent": q_stream_cep_adjacent,
        "stream_cep_chain3": q_stream_cep_chain3,
        "cep_chain3": q_cep_chain3,
        "ams_join_size": q_ams_join_size,
        "cm_join_size": q_cm_join_size,
        "audio_quality_exact": q_audio_quality_exact,
        "audio_corpus_overlap": q_audio_corpus_overlap,
        "ann_topk_lsh_exact": q_ann_topk_lsh_exact,
        "dedup_cosine_lsh_exact": q_dedup_cosine_lsh_exact,
        "ann_topk_ivf_exact": q_ann_topk_ivf_exact,
        "simhash_pairs": q_simhash_pairs,
        # ---- remaining banked exact-oracle (green r1-r3) ----------------
        "dedup_clusters": q_dedup_clusters,
        "dedup_cosine": q_dedup_cosine,
        "lang_id": q_lang_id,
        "audio_rms_exact": q_audio_rms_exact,
        "audio_fp_exact": q_audio_fp_exact,
        "media_features_exact": q_media_features_exact,
        "ngram_jaccard": q_ngram_jaccard,
        "bottomk_sample": q_bottomk_sample,
        "token_counts": q_token_counts,
        "fingerprints": q_fingerprints,
        "hist4lt_sql_ranges": q_hist4lt_sql_ranges,
        "cep_sequence_first": q_cep_sequence_first,
        "bottomk_sql_sample": q_bottomk_sql_sample,
        "fifo_sql_latest": q_fifo_sql_latest,
        "bloom_sql_membership": q_bloom_sql_membership,
        "equiwidth_sql_hist": q_equiwidth_sql_hist,
        "ams_sql_f2": q_ams_sql_f2,
        "hll_sql_distinct": q_hll_sql_distinct,
        # ---- rows-only (genuinely randomized / approximate / media) -----
        "reservoir_sample": q_reservoir_sample,
        "biased_reservoir": q_biased_reservoir,
        "bash_equidepth": q_bash_equidepth,
        "ann_topk_lsh": q_ann_topk_lsh,
        "ann_topk_ivf": q_ann_topk_ivf,
        "dedup_cosine_lsh": q_dedup_cosine_lsh,
        "media_features": q_media_features,
        "audio_rms_quantiles": q_audio_rms_quantiles,
        "audio_spectral": q_audio_spectral,
        "audio_fp_landmarks": q_audio_fp_landmarks,
        "audio_ann_topk": q_audio_ann_topk,
        "stream_join": q_stream_join,
    }


# ---------------------------------------------------------------------------
# oracles (DuckDB SQL on the pre-registered views)
# ---------------------------------------------------------------------------

_NORM = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"
_TOKS = f"string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')"
_STOP_EN = "['the','a','of','and','to','in','is','it']"
_LANG_LISTS = {
    "de": "['der','die','das','und','ist','ein','nicht','zu']",
    "en": _STOP_EN,
    "es": "['el','la','los','y','es','un','una','no']",
    "fr": "['le','la','les','et','est','un','une','pas']",
}


def _minhash_oracle_sql(threshold: float = 0.6, num_hashes: int = 64,
                        shingle: int = 3, seed: int = 7,
                        rows_per_band: int = 8) -> str:
    """Exact SQL replay of minhash_dedup_pairs: per-doc character-shingle
    ids (the same byte polynomial), 64 SplitMix64 lanes via the (hi, lo)
    HUGEINT wrapping-multiply machinery, per-band signature-slice equality
    for LSH candidacy, then exact Jaccard over the shingle-id sets with the
    same HALF_UP rounding and threshold.

    Candidacy caveat: Spark buckets bands by murmur3 of the slice — a
    superset of slice EQUALITY only under 2^-32 hash collisions, which this
    fixture has none of (verified: 1594 pairs, zero diff) and which exact
    verification would erase unless the colliding pair were also above the
    threshold. Verification caveat: Spark intersects xxhash64'd shingles;
    the oracle intersects raw shingle ids — identical Jaccards barring
    xxhash collisions (~n² / 2^64 per pair)."""
    c_add, c1, c2 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    hilo = lambda c: ((c >> 32) & 0xFFFFFFFF, c & 0xFFFFFFFF)
    a_hi, a_lo = hilo(c_add)
    c1_hi, c1_lo = hilo(c1)
    c2_hi, c2_lo = hilo(c2)
    return f"""
WITH norm AS (
  SELECT doc_id, CASE WHEN length(t) < {shingle}
                      THEN rpad(t, {shingle}, '_') ELSE t END AS t
  FROM (SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
        FROM documents)),
sids AS (
  SELECT DISTINCT doc_id,
         unnest([ord(t[i]) + 257*ord(t[i+1]) + 66049*ord(t[i+2])
                 for i in generate_series(1, length(t)-{shingle}+1)]) AS sid
  FROM norm),
lanes AS (SELECT j, {seed}*1000003 + j AS sj
          FROM generate_series(0, {num_hashes}-1) g(j)),
s0 AS (SELECT doc_id, j, CAST(0 AS BIGINT) AS hi, xor(sid, sj) AS lo
       FROM sids CROSS JOIN lanes),
s1 AS (SELECT doc_id, j, (hi + {a_hi} + ((lo + {a_lo}) >> 32)) & 4294967295 AS hi,
              (lo + {a_lo}) & 4294967295 AS lo FROM s0),
s2 AS (SELECT doc_id, j, xor(hi, hi >> 30) AS hi,
              xor(lo, ((lo >> 30) | ((hi & 1073741823) << 2)) & 4294967295) AS lo
       FROM s1),
s3 AS (SELECT doc_id, j, CAST(CAST(lo AS HUGEINT) * {c1_lo} AS HUGEINT) AS p0,
          CAST((CAST(lo AS HUGEINT) * {c1_hi} + CAST(hi AS HUGEINT) * {c1_lo})
               % 4294967296 AS HUGEINT) AS crs FROM s2),
s3b AS (SELECT doc_id, j,
               CAST(((p0 // 4294967296) + crs) % 4294967296 AS BIGINT) AS hi,
               CAST(p0 % 4294967296 AS BIGINT) AS lo FROM s3),
s4 AS (SELECT doc_id, j, xor(hi, hi >> 27) AS hi,
              xor(lo, ((lo >> 27) | ((hi & 134217727) << 5)) & 4294967295) AS lo
       FROM s3b),
s5 AS (SELECT doc_id, j, CAST(CAST(lo AS HUGEINT) * {c2_lo} AS HUGEINT) AS p0,
          CAST((CAST(lo AS HUGEINT) * {c2_hi} + CAST(hi AS HUGEINT) * {c2_lo})
               % 4294967296 AS HUGEINT) AS crs FROM s4),
s5b AS (SELECT doc_id, j,
               CAST(((p0 // 4294967296) + crs) % 4294967296 AS BIGINT) AS hi,
               CAST(p0 % 4294967296 AS BIGINT) AS lo FROM s5),
s6 AS (SELECT doc_id, j, xor(hi, hi >> 31) AS hi,
              xor(lo, ((lo >> 31) | ((hi & 2147483647) << 1)) & 4294967295) AS lo
       FROM s5b),
mins AS (SELECT doc_id, j, min(CAST(hi AS HUGEINT) * 4294967296 + lo) AS v
         FROM s6 GROUP BY 1, 2),
sigs AS (SELECT doc_id, j,
       CAST(CASE WHEN v >= CAST(9223372036854775808 AS HUGEINT)
                 THEN v - CAST(18446744073709551616 AS HUGEINT)
                 ELSE v END AS BIGINT) AS sig
       FROM mins),
bands AS (SELECT doc_id, j // {rows_per_band} AS band,
                 list(sig ORDER BY j) AS bsig
          FROM sigs GROUP BY 1, 2),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig
         WHERE a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*) AS n FROM sids GROUP BY 1),
inter AS (SELECT c.doc_a, c.doc_b, count(*) AS i
          FROM cand c JOIN sids x ON x.doc_id = c.doc_a
                      JOIN sids y ON y.doc_id = c.doc_b AND y.sid = x.sid
          GROUP BY 1, 2),
jac AS (SELECT c.doc_a, c.doc_b,
               ROUND(COALESCE(i.i, 0)
                     / greatest(sa.n + sb.n - COALESCE(i.i, 0), 1), 6) AS jaccard
        FROM cand c LEFT JOIN inter i USING (doc_a, doc_b)
        JOIN sizes sa ON sa.doc_id = c.doc_a
        JOIN sizes sb ON sb.doc_id = c.doc_b)
SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= {threshold}
    """


def _simhash_oracle_sql(max_hamming: int = 10, seed: int = 7) -> str:
    """Exact SQL replay of simhash_near_pairs: whitespace tokens of the
    normalized text (multiplicity kept), token id = base-257 codepoint
    polynomial mod 2^64, token hash = splitmix64(id ^ seed) via the same
    (hi, lo) HUGEINT machinery as the minhash oracle, per-bit ±1 votes,
    signature bit b = (vote > 0), 4×16-bit chunk-equality candidacy, then
    hamming = bit_count(xor) ≤ max_hamming over the signed signatures.

    Every step is integer arithmetic, so parity with the engine
    (text.simhash_signatures / simhash_near_pairs) is bit-exact — no FP
    rounding caveats. Candidacy is the same chunk blocking the engine
    uses, so pairs differing in all four chunks are (identically) absent
    from both sides.
    """
    a_hi, a_lo = 0x9E3779B9, 0x7F4A7C15
    c1_hi, c1_lo = 0xBF58476D, 0x1CE4E5B9
    c2_hi, c2_lo = 0x94D049BB, 0x133111EB
    s_hi, s_lo = (seed >> 32) & 0xFFFFFFFF, seed & 0xFFFFFFFF
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                            t -> t <> '')) AS tok
  FROM documents),
ids AS (
  SELECT doc_id,
         list_reduce(list_prepend(CAST(0 AS HUGEINT),
             [CAST(ord(tok[i]) AS HUGEINT)
              for i in generate_series(1, length(tok))]),
             (a, b) -> (a * 257 + b) % 18446744073709551616) AS poly
  FROM toks),
s0 AS (SELECT doc_id,
              xor(CAST(poly // 4294967296 AS BIGINT), {s_hi}) AS hi,
              xor(CAST(poly % 4294967296 AS BIGINT), {s_lo}) AS lo
       FROM ids),
s1 AS (SELECT doc_id, (hi + {a_hi} + ((lo + {a_lo}) >> 32)) & 4294967295 AS hi,
              (lo + {a_lo}) & 4294967295 AS lo FROM s0),
s2 AS (SELECT doc_id, xor(hi, hi >> 30) AS hi,
              xor(lo, ((lo >> 30) | ((hi & 1073741823) << 2)) & 4294967295) AS lo
       FROM s1),
s3 AS (SELECT doc_id, CAST(CAST(lo AS HUGEINT) * {c1_lo} AS HUGEINT) AS p0,
          CAST((CAST(lo AS HUGEINT) * {c1_hi} + CAST(hi AS HUGEINT) * {c1_lo})
               % 4294967296 AS HUGEINT) AS crs FROM s2),
s3b AS (SELECT doc_id,
               CAST(((p0 // 4294967296) + crs) % 4294967296 AS BIGINT) AS hi,
               CAST(p0 % 4294967296 AS BIGINT) AS lo FROM s3),
s4 AS (SELECT doc_id, xor(hi, hi >> 27) AS hi,
              xor(lo, ((lo >> 27) | ((hi & 134217727) << 5)) & 4294967295) AS lo
       FROM s3b),
s5 AS (SELECT doc_id, CAST(CAST(lo AS HUGEINT) * {c2_lo} AS HUGEINT) AS p0,
          CAST((CAST(lo AS HUGEINT) * {c2_hi} + CAST(hi AS HUGEINT) * {c2_lo})
               % 4294967296 AS HUGEINT) AS crs FROM s4),
s5b AS (SELECT doc_id,
               CAST(((p0 // 4294967296) + crs) % 4294967296 AS BIGINT) AS hi,
               CAST(p0 % 4294967296 AS BIGINT) AS lo FROM s5),
s6 AS (SELECT doc_id, xor(hi, hi >> 31) AS hi,
              xor(lo, ((lo >> 31) | ((hi & 2147483647) << 1)) & 4294967295) AS lo
       FROM s5b),
bits AS (
  SELECT doc_id, b,
         CASE WHEN b < 32 THEN (lo >> b) & 1 ELSE (hi >> (b - 32)) & 1 END AS bit
  FROM s6 CROSS JOIN generate_series(0, 63) g(b)),
votes AS (SELECT doc_id, b, sum(2 * bit - 1) AS v FROM bits GROUP BY 1, 2),
sigparts AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 AND b < 32 THEN 1 << b ELSE 0 END) AS sig_lo,
         sum(CASE WHEN v > 0 AND b >= 32 THEN 1 << (b - 32) ELSE 0 END) AS sig_hi
  FROM votes GROUP BY 1),
sigs AS (  -- empty-token docs carry signature 0, same as the engine
  SELECT d.doc_id,
         COALESCE(CAST(sp.sig_hi AS HUGEINT) * 4294967296 + sp.sig_lo,
                  CAST(0 AS HUGEINT)) AS uv
  FROM documents d LEFT JOIN sigparts sp USING (doc_id)),
signed AS (
  SELECT doc_id, uv,
         CAST(CASE WHEN uv >= CAST(9223372036854775808 AS HUGEINT)
                   THEN uv - CAST(18446744073709551616 AS HUGEINT)
                   ELSE uv END AS BIGINT) AS sig
  FROM sigs),
chunks AS (
  SELECT doc_id, sig, c,
         CAST((uv // CAST(power(2, 16 * c) AS HUGEINT)) % 65536 AS BIGINT) AS val
  FROM signed CROSS JOIN generate_series(0, 3) g(c)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, a.sig AS sig_a,
                  b.doc_id AS doc_b, b.sig AS sig_b
  FROM chunks a JOIN chunks b ON a.c = b.c AND a.val = b.val
  WHERE a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= {max_hamming}
    """


def _ams_oracle_sql(width: int = 1024, height: int = 7, seed: int = 7) -> str:
    """Exact SQL replay of the Fast-AGMS estimate: the H3 q-matrix and EH3
    seeds are EMBEDDED as constants, bucket = bit_xor over selected q-words
    (masked to 31 bits) mod width, sign = s0 ⊕ parity(S&x) ⊕ f(x) via
    bit_count, then per-window cell sums, row F2s, and the median of rows —
    the full sketch simulated relationally, so the 'approximate' estimate
    is value-hash-checkable."""
    from condor_spark.synopsis.hashing import EH3Family, H3Family

    h3, e3 = H3Family(height, seed), EH3Family(height, seed)
    qvals = ", ".join(f"({r}, {j}, {int(h3.q[r, j])})"
                      for r in range(height) for j in range(32))
    evals = ", ".join(f"({r}, {int(e3.s0[r])}, {int(e3.S[r])})"
                      for r in range(height))
    return f"""
        WITH q(r, j, qv) AS (VALUES {qvals}),
             e3(r, s0, S) AS (VALUES {evals}),
             keys AS (SELECT DISTINCT user_id FROM events),
             h3 AS (SELECT k.user_id, q.r,
                           bit_xor(CASE WHEN (k.user_id >> q.j) & 1 = 1
                                        THEN q.qv ELSE 0 END) AS acc
                    FROM keys k CROSS JOIN q GROUP BY 1, 2),
             colsgn AS (SELECT h.user_id, h.r,
                               (h.acc & 2147483647) % {width} AS col,
                               CASE WHEN xor(xor(e3.s0,
                                          bit_count(e3.S & k.user_id) % 2),
                                          bit_count((k.user_id & 1431655765)
                                                    & ((k.user_id >> 1) & 1431655765)) % 2
                                         ) = 1 THEN 1 ELSE -1 END AS sgn
                        FROM h3 h JOIN e3 ON e3.r = h.r
                        JOIN keys k ON k.user_id = h.user_id),
             cells AS (SELECT time_bucket(INTERVAL '1 day', ev.ts) AS ws,
                              cs.r, cs.col, SUM(cs.sgn) AS cell
                       FROM events ev JOIN colsgn cs USING (user_id)
                       GROUP BY 1, 2, 3),
             rowsum AS (SELECT ws, r, SUM(cell * cell) AS f2
                        FROM cells GROUP BY 1, 2)
        SELECT ws AS window_start, ROUND(median(f2), 2) AS est_f2
        FROM rowsum GROUP BY 1
    """


def _ams_join_oracle_sql(width: int = 1024, height: int = 7, seed: int = 7,
                         type_a: str = "click", type_b: str = "view") -> str:
    """Exact SQL replay of the two-stream AGMS join-size estimate: both
    sketches' cells materialize relationally from the same embedded H3/EH3
    constants as ``_ams_oracle_sql``, the per-row inner product sums only
    over cells nonzero in BOTH (absent cells contribute 0), every (window,
    row) pair is kept via the window-intersection × row-domain frame, and
    the median over rows reproduces ``FastAGMS.estimate_join`` exactly."""
    from condor_spark.synopsis.hashing import EH3Family, H3Family

    h3, e3 = H3Family(height, seed), EH3Family(height, seed)
    qvals = ", ".join(f"({r}, {j}, {int(h3.q[r, j])})"
                      for r in range(height) for j in range(32))
    evals = ", ".join(f"({r}, {int(e3.s0[r])}, {int(e3.S[r])})"
                      for r in range(height))
    return f"""
        WITH q(r, j, qv) AS (VALUES {qvals}),
             e3(r, s0, S) AS (VALUES {evals}),
             keys AS (SELECT DISTINCT user_id FROM events
                      WHERE event_type IN ('{type_a}', '{type_b}')),
             h3 AS (SELECT k.user_id, q.r,
                           bit_xor(CASE WHEN (k.user_id >> q.j) & 1 = 1
                                        THEN q.qv ELSE 0 END) AS acc
                    FROM keys k CROSS JOIN q GROUP BY 1, 2),
             colsgn AS (SELECT h.user_id, h.r,
                               (h.acc & 2147483647) % {width} AS col,
                               CASE WHEN xor(xor(e3.s0,
                                          bit_count(e3.S & k.user_id) % 2),
                                          bit_count((k.user_id & 1431655765)
                                                    & ((k.user_id >> 1) & 1431655765)) % 2
                                         ) = 1 THEN 1 ELSE -1 END AS sgn
                        FROM h3 h JOIN e3 ON e3.r = h.r
                        JOIN keys k ON k.user_id = h.user_id),
             cells_a AS (SELECT time_bucket(INTERVAL '1 day', ev.ts) AS ws,
                                cs.r, cs.col, SUM(cs.sgn) AS cell
                         FROM events ev JOIN colsgn cs USING (user_id)
                         WHERE ev.event_type = '{type_a}'
                         GROUP BY 1, 2, 3),
             cells_b AS (SELECT time_bucket(INTERVAL '1 day', ev.ts) AS ws,
                                cs.r, cs.col, SUM(cs.sgn) AS cell
                         FROM events ev JOIN colsgn cs USING (user_id)
                         WHERE ev.event_type = '{type_b}'
                         GROUP BY 1, 2, 3),
             prods AS (SELECT a.ws, a.r, SUM(a.cell * b.cell) AS ip
                       FROM cells_a a
                       JOIN cells_b b ON a.ws = b.ws AND a.r = b.r
                                     AND a.col = b.col
                       GROUP BY 1, 2),
             wins AS (SELECT DISTINCT ws FROM cells_a
                      INTERSECT SELECT DISTINCT ws FROM cells_b),
             frame AS (SELECT w.ws, r.r FROM wins w
                       CROSS JOIN (SELECT DISTINCT r FROM q) r),
             rowip AS (SELECT f.ws, f.r, COALESCE(p.ip, 0) AS ip
                       FROM frame f LEFT JOIN prods p
                            ON p.ws = f.ws AND p.r = f.r)
        SELECT ws AS window_start, ROUND(median(ip), 2) AS est_join
        FROM rowip GROUP BY 1
    """


def _cm_join_oracle_sql(width: int = 2048, height: int = 5, seed: int = 7,
                        type_a: str = "click", type_b: str = "view") -> str:
    """Exact SQL replay of the CM inner-product join-size estimate: H3
    buckets from the embedded q-matrix, per-stream cell counts, per-row
    inner product over cells nonzero in both (absent cells contribute 0),
    MIN over the full row domain via the window-intersection frame."""
    from condor_spark.synopsis.hashing import H3Family

    h3 = H3Family(height, seed)
    qvals = ", ".join(f"({r}, {j}, {int(h3.q[r, j])})"
                      for r in range(height) for j in range(32))
    return f"""
        WITH q(r, j, qv) AS (VALUES {qvals}),
             keys AS (SELECT DISTINCT user_id FROM events
                      WHERE event_type IN ('{type_a}', '{type_b}')),
             buck AS (SELECT k.user_id, q.r,
                             (bit_xor(CASE WHEN (k.user_id >> q.j) & 1 = 1
                                           THEN q.qv ELSE 0 END)
                              & 2147483647) % {width} AS col
                      FROM keys k CROSS JOIN q GROUP BY 1, 2),
             cells_a AS (SELECT time_bucket(INTERVAL '1 day', ev.ts) AS ws,
                                b.r, b.col, COUNT(*) AS cell
                         FROM events ev JOIN buck b USING (user_id)
                         WHERE ev.event_type = '{type_a}'
                         GROUP BY 1, 2, 3),
             cells_b AS (SELECT time_bucket(INTERVAL '1 day', ev.ts) AS ws,
                                b.r, b.col, COUNT(*) AS cell
                         FROM events ev JOIN buck b USING (user_id)
                         WHERE ev.event_type = '{type_b}'
                         GROUP BY 1, 2, 3),
             prods AS (SELECT a.ws, a.r, SUM(a.cell * b.cell) AS ip
                       FROM cells_a a
                       JOIN cells_b b ON a.ws = b.ws AND a.r = b.r
                                     AND a.col = b.col
                       GROUP BY 1, 2),
             wins AS (SELECT DISTINCT ws FROM cells_a
                      INTERSECT SELECT DISTINCT ws FROM cells_b),
             frame AS (SELECT w.ws, r.r FROM wins w
                       CROSS JOIN (SELECT DISTINCT r FROM q) r),
             rowip AS (SELECT f.ws, f.r, COALESCE(p.ip, 0) AS ip
                       FROM frame f LEFT JOIN prods p
                            ON p.ws = f.ws AND p.r = f.r)
        SELECT ws AS window_start, ROUND(MIN(ip), 2) AS est_join
        FROM rowip GROUP BY 1
    """


def _splitmix64_stages_sql(seed: int) -> str:
    """CTE stages replaying ``hashing.hash64(x, seed)`` (the splitmix64
    finalizer of ``x ^ seed``) relationally over (hi, lo) 32-bit halves —
    wrapping 64-bit multiplies via HUGEINT hi/lo cross products because SQL
    BIGINT ops error on overflow. Expects a preceding CTE ``keys(x)`` with
    0 <= x < 2^32; produces ``s6(x, hi, lo)``. Shared by the HLL and KMV
    oracles so the hash replay is written (and audited) once."""
    c_add, c1, c2 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    hilo = lambda c: ((c >> 32) & 0xFFFFFFFF, c & 0xFFFFFFFF)
    a_hi, a_lo = hilo(c_add)
    c1_hi, c1_lo = hilo(c1)
    c2_hi, c2_lo = hilo(c2)
    s_hi, s_lo = hilo(seed)
    return f"""
          s0 AS (SELECT x, CAST({s_hi} AS BIGINT) AS hi,
                        xor(x, {s_lo}) AS lo FROM keys),
          s1 AS (SELECT x, (hi + {a_hi} + ((lo + {a_lo}) >> 32)) & 4294967295 AS hi,
                        (lo + {a_lo}) & 4294967295 AS lo FROM s0),
          s2 AS (SELECT x, hi, xor(lo, ((lo >> 30) | ((hi & 1073741823) << 2))
                                   & 4294967295) AS lo2,
                        xor(hi, hi >> 30) AS hi2 FROM s1),
          s2b AS (SELECT x, hi2 AS hi, lo2 AS lo FROM s2),
          s3 AS (SELECT x,
                    CAST(CAST(lo AS HUGEINT) * {c1_lo} AS HUGEINT) AS p0,
                    CAST((CAST(lo AS HUGEINT) * {c1_hi}
                          + CAST(hi AS HUGEINT) * {c1_lo})
                         % 4294967296 AS HUGEINT) AS crs
                 FROM s2b),
          s3b AS (SELECT x,
                    CAST(((p0 // 4294967296) + crs) % 4294967296 AS BIGINT) AS hi,
                    CAST(p0 % 4294967296 AS BIGINT) AS lo FROM s3),
          s4 AS (SELECT x, xor(hi, hi >> 27) AS hi,
                    xor(lo, ((lo >> 27) | ((hi & 134217727) << 5))
                        & 4294967295) AS lo
                 FROM s3b),
          s5 AS (SELECT x,
                    CAST(CAST(lo AS HUGEINT) * {c2_lo} AS HUGEINT) AS p0,
                    CAST((CAST(lo AS HUGEINT) * {c2_hi}
                          + CAST(hi AS HUGEINT) * {c2_lo})
                         % 4294967296 AS HUGEINT) AS crs
                 FROM s4),
          s5b AS (SELECT x,
                    CAST(((p0 // 4294967296) + crs) % 4294967296 AS BIGINT) AS hi,
                    CAST(p0 % 4294967296 AS BIGINT) AS lo FROM s5),
          s6 AS (SELECT x, xor(hi, hi >> 31) AS hi,
                    xor(lo, ((lo >> 31) | ((hi & 2147483647) << 1))
                        & 4294967295) AS lo
                 FROM s5b)"""


def _hll_oracle_sql(log_reg_num: int = 14, seed: int = 7) -> str:
    """Exact SQL replay of the HLL estimate: the splitmix64 finalizer runs
    over (hi, lo) 32-bit halves in CTE stages (``_splitmix64_stages_sql``),
    then register index / trailing-zero rank / register-max / harmonic
    estimator with the linear-counting branch — the sketch simulated
    relationally."""
    m = 1 << log_reg_num
    return f"""
        WITH keys AS (SELECT DISTINCT user_id AS x FROM events),
          {_splitmix64_stages_sql(seed)},
          hreg AS (SELECT x, hi >> {32 - log_reg_num} AS idx,
                      hi & {(1 << (32 - log_reg_num)) - 1} AS low_hi,
                      lo AS low_lo FROM s6),
          rnk AS (SELECT x, idx,
                     CASE WHEN low_lo != 0
                          THEN bit_count((low_lo & -low_lo) - 1) + 1
                          WHEN low_hi != 0
                          THEN 32 + bit_count((low_hi & -low_hi) - 1) + 1
                          ELSE {64 - log_reg_num} + 1 END AS rnk_v
                  FROM hreg),
          regs AS (SELECT time_bucket(INTERVAL '1 day', e.ts) AS ws, r.idx,
                          MAX(r.rnk_v) AS reg
                   FROM events e JOIN rnk r ON r.x = e.user_id GROUP BY 1, 2),
          agg AS (SELECT ws, SUM(power(2.0, -reg)) AS s_hit, COUNT(*) AS n_hit
                  FROM regs GROUP BY 1),
          est AS (SELECT ws,
                     0.7213 / (1 + 1.079 / {m}) * {m} * {m}
                       / (s_hit + ({m} - n_hit) * 1.0) AS raw,
                     {m} - n_hit AS zero_regs
                  FROM agg)
        SELECT ws AS window_start,
               CAST(CASE WHEN zero_regs > 0 AND raw < 2.5 * {m}
                         THEN ROUND({m} * ln({m} / CAST(zero_regs AS DOUBLE)))
                         ELSE ROUND(raw) END AS BIGINT) AS est_distinct
        FROM est
    """


_KMV_EST = ("CAST(CASE WHEN {cnt} < {k} THEN {cnt} "
            "ELSE ({km1} * CAST(18446744073709551616 AS HUGEINT)) "
            "// greatest({tau}, 1) END AS BIGINT)")


def _kmv_distinct_oracle_sql(k: int = 1024, seed: int = 7) -> str:
    """Exact SQL replay of the KMV distinct estimate per tumbling day:
    splitmix64 via the shared hi/lo stages, per-window DISTINCT hashes
    ranked ascending, tau = the k-th smallest, estimate = the SAME exact
    integer floor division the kernel computes ((k-1)*2^64 // tau on
    HUGEINTs vs Python ints — bit-identical, no float in either path);
    below k distinct hashes the count itself is exact on both sides."""
    est = _KMV_EST.format(cnt="a.cnt", k=k, km1=k - 1, tau="kth.tau")
    return f"""
        WITH keys AS (SELECT DISTINCT user_id AS x FROM events),
          {_splitmix64_stages_sql(seed)},
          hashed AS (SELECT x, CAST(hi AS HUGEINT) * 4294967296 + lo AS h FROM s6),
          wk AS (SELECT DISTINCT time_bucket(INTERVAL '1 day', ts) AS ws, user_id
                 FROM events),
          hw AS (SELECT DISTINCT wk.ws, h.h
                 FROM wk JOIN hashed h ON h.x = wk.user_id),
          rk AS (SELECT ws, h, row_number() OVER (PARTITION BY ws ORDER BY h) AS rn
                 FROM hw),
          agg AS (SELECT ws, count(*) AS cnt FROM hw GROUP BY ws),
          kth AS (SELECT ws, h AS tau FROM rk WHERE rn = {k})
        SELECT a.ws AS window_start, {est} AS est_distinct
        FROM agg a LEFT JOIN kth ON kth.ws = a.ws
    """


def _kmv_overlap_oracle_sql(k: int = 1024, seed: int = 7,
                            type_a: str = "click", type_b: str = "view") -> str:
    """Exact SQL replay of the KMV set-operation estimates between the two
    event streams per tumbling day (Beyer et al. 2007 §3, mirroring
    ``KMVSketch.overlap``): per-corpus min-k sets from the shared splitmix64
    stages, L = the k smallest of their union, K∩ = members of both min-k
    sets within L; union/intersection via the kernel's exact integer floor
    divisions and jaccard as the same int/int double ratio. Windows present
    in only one corpus are omitted (the engine's inner blob join)."""
    eu = _KMV_EST.format(cnt="l_cnt", k=k, km1=k - 1, tau="tau_u")
    ec = _KMV_EST.format(cnt="c", k=k, km1=k - 1, tau="tau")
    return f"""
        WITH keys AS (SELECT DISTINCT user_id AS x FROM events
                      WHERE event_type IN ('{type_a}', '{type_b}')),
          {_splitmix64_stages_sql(seed)},
          hashed AS (SELECT x, CAST(hi AS HUGEINT) * 4294967296 + lo AS h FROM s6),
          wk AS (SELECT DISTINCT time_bucket(INTERVAL '1 day', ts) AS ws,
                        event_type AS et, user_id
                 FROM events WHERE event_type IN ('{type_a}', '{type_b}')),
          hw AS (SELECT DISTINCT wk.ws, wk.et, h.h
                 FROM wk JOIN hashed h ON h.x = wk.user_id),
          rk AS (SELECT ws, et, h,
                    row_number() OVER (PARTITION BY ws, et ORDER BY h) AS rn
                 FROM hw),
          mk AS (SELECT * FROM rk WHERE rn <= {k}),
          pc AS (SELECT ws, et, count(*) AS c,
                        max(CASE WHEN rn = {k} THEN h END) AS tau
                 FROM mk GROUP BY ws, et),
          un AS (SELECT ws, h, bool_or(et = '{type_a}') AS in_a,
                        bool_or(et = '{type_b}') AS in_b
                 FROM mk GROUP BY ws, h),
          ur AS (SELECT ws, h, in_a, in_b,
                    row_number() OVER (PARTITION BY ws ORDER BY h) AS rn
                 FROM un),
          ls AS (SELECT ws, count(*) AS l_cnt,
                        sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS k_int,
                        max(CASE WHEN rn = {k} THEN h END) AS tau_u
                 FROM ur WHERE rn <= {k} GROUP BY ws),
          est AS (SELECT ws, l_cnt, k_int, {eu} AS est_union FROM ls),
          pa AS (SELECT ws, {ec} AS est_c FROM pc a WHERE et = '{type_a}'),
          pb AS (SELECT ws, {ec} AS est_c FROM pc a WHERE et = '{type_b}')
        SELECT e.ws AS window_start, pa.est_c AS est_a, pb.est_c AS est_b,
               e.est_union,
               CAST(CASE WHEN e.l_cnt < {k} THEN e.k_int
                         ELSE (e.k_int * CAST(e.est_union AS HUGEINT)) // {k}
                    END AS BIGINT) AS est_intersection,
               CASE WHEN e.l_cnt = 0 THEN 0.0
                    ELSE CAST(e.k_int AS DOUBLE) / e.l_cnt END AS jaccard
        FROM est e JOIN pa ON pa.ws = e.ws JOIN pb ON pb.ws = e.ws
    """


def _pii_oracle_sql() -> str:
    """Verbatim DuckDB replay of q_pii_scrub: the SAME planted-PII
    expression, then per-rule count + replace stages generated from
    engine/text.py PII_RULES (one source of truth — a pattern edit changes
    both sides). RE2 notes: 'g' flag makes regexp_replace global like
    Spark's; len(regexp_extract_all) == Spark's regexp_count for these
    backref-free patterns."""
    from condor_spark.engine.text import PII_RULES

    plant = ("text || ' contact user' || doc_id || '@example.com or 10.' || "
             "(doc_id % 250) || '.0.1 tel +1 555 010 ' || "
             "(1000 + doc_id % 9000) || ' ssn 123-45-' || "
             "(1000 + doc_id % 9000) || ' card 4111 1111 1111 ' || "
             "(1000 + doc_id % 9000) || ' acct ' || (100000000 + doc_id)")
    stages = [f"WITH s0 AS (SELECT doc_id, {plant} AS t FROM documents)"]
    for i, (name, pat, tok) in enumerate(PII_RULES, 1):
        lit = pat.replace("'", "''")
        stages.append(
            f", s{i} AS (SELECT * REPLACE (regexp_replace(t, '{lit}', "
            f"'{tok}', 'g') AS t), len(regexp_extract_all(t, '{lit}')) "
            f"AS n_{name} FROM s{i - 1})")
    names = ", ".join(f"n_{name}" for name, _, _ in PII_RULES)
    return ("".join(stages)
            + f" SELECT doc_id, {names}, md5(t) AS scrubbed_md5 "
              f"FROM s{len(PII_RULES)}")


def oracle_sql() -> dict[str, str]:
    lang_hits = ", ".join(
        f"len(list_filter(toks, x -> list_contains({lst}, x))) AS h_{lang}"
        for lang, lst in _LANG_LISTS.items())
    lang_case = " ".join(
        f"WHEN h_{lang} = greatest(h_de, h_en, h_es, h_fr) THEN '{lang}'"
        for lang in sorted(_LANG_LISTS))
    oracles = {
        "cm_user_frequency": """
            WITH w AS (SELECT DISTINCT time_bucket(INTERVAL '1 day', ts) ws FROM events),
                 u AS (SELECT DISTINCT user_id FROM events),
                 c AS (SELECT time_bucket(INTERVAL '1 day', ts) ws, user_id, count(*) cnt
                       FROM events GROUP BY 1, 2)
            SELECT w.ws AS window_start, CAST(u.user_id AS VARCHAR) AS key,
                   COALESCE(c.cnt, 0) AS est_count
            FROM w CROSS JOIN u
            LEFT JOIN c ON c.ws = w.ws AND c.user_id = u.user_id
        """,
        "bloom_membership": """
            WITH w AS (SELECT DISTINCT time_bucket(INTERVAL '1 day', ts) ws FROM events),
                 k AS (SELECT unnest(list_sort(list_distinct(list(event_type)))
                              || ['zzz_absent_a','zzz_absent_b','zzz_absent_c']) AS key
                       FROM events),
                 p AS (SELECT DISTINCT time_bucket(INTERVAL '1 day', ts) ws, event_type
                       FROM events)
            SELECT w.ws AS window_start, k.key,
                   (p.event_type IS NOT NULL) AS member
            FROM w CROSS JOIN k
            LEFT JOIN p ON p.ws = w.ws AND p.event_type = k.key
        """,
        # cuckoo at this sizing (5 distinct keys in 1024x4 slots, 16-bit
        # fingerprints) has no kicks and empirically zero false positives on
        # the fixture, so membership is exact — same promotion as bloom
        "cuckoo_membership": """
            WITH k AS (SELECT unnest(list_sort(list_distinct(list(event_type)))
                              || ['zzz_absent_a','zzz_absent_b']) AS key
                       FROM events),
                 p AS (SELECT DISTINCT event_type FROM events)
            SELECT k.key, (p.event_type IS NOT NULL) AS member
            FROM k LEFT JOIN p ON p.event_type = k.key
        """,
        "equiwidth_hist": """
            WITH w AS (SELECT DISTINCT time_bucket(INTERVAL '1 day', ts) ws FROM events),
                 b AS (SELECT i AS bucket FROM range(0, 20) t(i)),
                 c AS (SELECT time_bucket(INTERVAL '1 day', ts) ws,
                              CAST(floor(value / 25.0) AS BIGINT) bucket, count(*) cnt
                       FROM events WHERE value >= 0 AND value < 500 GROUP BY 1, 2)
            SELECT w.ws AS window_start, b.bucket, COALESCE(c.cnt, 0) AS cnt
            FROM w CROSS JOIN b LEFT JOIN c ON c.ws = w.ws AND c.bucket = b.bucket
        """,
        "ddsketch_quantiles": """
            WITH r AS (SELECT time_bucket(INTERVAL '1 day', ts) ws, value,
                              row_number() OVER (PARTITION BY time_bucket(INTERVAL '1 day', ts)
                                                 ORDER BY value) rn,
                              count(*) OVER (PARTITION BY time_bucket(INTERVAL '1 day', ts)) n
                       FROM events WHERE value > 0),
                 qs AS (SELECT unnest([0.5, 0.95, 0.99]) q)
            SELECT r.ws AS window_start, qs.q,
                   ROUND(2 * pow(1.01/0.99, ceil(ln(r.value) / ln(1.01/0.99)))
                         / (1.01/0.99 + 1), 6) AS est_value
            FROM r JOIN qs ON r.rn = greatest(1, CAST(ceil(qs.q * r.n) AS BIGINT))
        """,
        "fifo_latest": """
            WITH r AS (SELECT time_bucket(INTERVAL '1 day', ts) ws, event_id,
                              row_number() OVER (PARTITION BY time_bucket(INTERVAL '1 day', ts)
                                                 ORDER BY ts DESC, event_id DESC) rn
                       FROM events)
            SELECT ws AS window_start, event_id FROM r WHERE rn <= 20
        """,
        "bottomk_sample": """
            WITH r AS (SELECT time_bucket(INTERVAL '1 day', ts) ws, event_id,
                              row_number() OVER (PARTITION BY time_bucket(INTERVAL '1 day', ts)
                                                 ORDER BY md5(CAST(event_id AS VARCHAR))) rn
                       FROM events)
            SELECT ws AS window_start, event_id FROM r WHERE rn <= 20
        """,
        "reservoir_audit": """
            SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
                   event_id
            FROM events
        """,
        "biased_reservoir_audit": """
            SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
                   event_id
            FROM events
        """,
        "session_windows": """
            WITH s AS (SELECT user_id, ts,
                              CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                                        OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                           > INTERVAL '30 minutes'
                                   THEN 1 ELSE 0 END brk
                       FROM events),
                 g AS (SELECT user_id, ts,
                              -- RANGE (peer-inclusive), NOT ROWS: with
                              -- duplicate timestamps the brk=1 row's
                              -- position among its ts-peers is arbitrary,
                              -- and ROWS framing would split the peers
                              -- across two sessions nondeterministically
                              -- (surfaced by the sf1 stress replicas);
                              -- RANGE gives every peer the same session id
                              sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                             RANGE UNBOUNDED PRECEDING) sess
                       FROM s)
            SELECT CAST(user_id AS VARCHAR) AS stratum,
                   min(ts) AS window_start,
                   max(ts) + INTERVAL '30 minutes' AS window_end,
                   count(*) AS n
            FROM g GROUP BY user_id, sess
        """,
        "sliding_counts": """
            SELECT g.ws AS window_start, count(*) AS cnt
            FROM (SELECT TIMESTAMP '2020-01-01' + INTERVAL (i * 6) HOUR AS ws
                  FROM range(0, 20000) t(i)) g
            JOIN events e ON e.ts >= g.ws AND e.ts < g.ws + INTERVAL '24' HOUR
            GROUP BY 1
        """,
        "concurrent_windows": """
            SELECT 0 AS window_id, time_bucket(INTERVAL '1 day', ts) AS window_start,
                   count(*) AS cnt
            FROM events GROUP BY 2
            UNION ALL
            SELECT 1, g.ws, count(*)
            FROM (SELECT TIMESTAMP '2020-01-01' + INTERVAL (i) DAY AS ws
                  FROM range(0, 5000) t(i)) g
            JOIN events e ON e.ts >= g.ws AND e.ts < g.ws + INTERVAL '48' HOUR
            GROUP BY 2
            UNION ALL
            SELECT 2, g.ws, count(*)
            FROM (SELECT TIMESTAMP '2020-01-01' + INTERVAL (i * 6) HOUR AS ws
                  FROM range(0, 20000) t(i)) g
            JOIN events e ON e.ts >= g.ws AND e.ts < g.ws + INTERVAL '24' HOUR
            GROUP BY 2
        """,
        "count_windows": """
            WITH o AS (SELECT row_number() OVER (ORDER BY ts, event_id) - 1 AS idx
                       FROM events)
            SELECT idx // 1000 AS window_id, count(*) AS n FROM o GROUP BY 1
        """,
        "wavelet_range_sums": """
            WITH o AS (SELECT value, row_number() OVER (ORDER BY ts, event_id) - 1 AS idx
                       FROM events)
            SELECT 0 AS lo_idx, ROUND(COALESCE(sum(value) FILTER (idx < 1000), 0), 3)
                   AS range_sum FROM o
            UNION ALL
            SELECT 1000, ROUND(COALESCE(sum(value) FILTER (idx >= 1000 AND idx < 5000), 0), 3)
            FROM o
            UNION ALL
            SELECT 0, ROUND(COALESCE(sum(value), 0), 3) FROM o
        """,
        "wavelet_stratified": """
            WITH o AS (SELECT event_type st, value,
                              row_number() OVER (PARTITION BY event_type
                                                 ORDER BY ts, event_id) - 1 AS idx
                       FROM events),
                 r AS (SELECT * FROM (VALUES (0, 1000), (1000, 5000),
                                             (0, 1099511627776)) t(lo, hi)),
                 s AS (SELECT DISTINCT st FROM o)
            SELECT s.st AS stratum, r.lo AS lo_idx, r.hi AS hi_idx,
                   ROUND(COALESCE(sum(o.value) FILTER (o.idx >= r.lo
                                                       AND o.idx < r.hi), 0), 3)
                       AS range_sum
            FROM s CROSS JOIN r
            LEFT JOIN o ON o.st = s.st
            GROUP BY 1, 2, 3
        """,
        "equidepth_exact": """
            WITH o AS (SELECT value,
                              ntile(10) OVER (ORDER BY value, event_id) - 1 AS bucket
                       FROM events)
            SELECT bucket, ROUND(min(value), 4) AS lo, ROUND(max(value), 4) AS hi,
                   count(*) AS depth
            FROM o GROUP BY 1
        """,
        # DDSketch-boundary equi-depth is deterministic: boundaries are the
        # sketch's quantile estimator at i/B, reproduced in SQL exactly as in
        # ddsketch_quantiles (rank = max(1, ceil(q*n)); value = DD
        # representative 2*gamma^ceil(ln(v)/ln(gamma))/(gamma+1))
        "equidepth_dd": """
            WITH r AS (SELECT value, row_number() OVER (ORDER BY value) rn,
                              count(*) OVER () n
                       FROM events WHERE value > 0),
                 q AS (SELECT i FROM range(0, 11) t(i)),
                 est AS (SELECT q.i,
                            ROUND(2 * pow(1.01/0.99, ceil(ln(r.value) / ln(1.01/0.99)))
                                  / (1.01/0.99 + 1), 4) v
                         FROM q JOIN r
                           ON r.rn = greatest(1, CAST(ceil(q.i / 10.0 * r.n) AS BIGINT)))
            SELECT e1.i AS bucket, e1.v AS lo, e2.v AS hi
            FROM est e1 JOIN est e2 ON e2.i = e1.i + 1
            WHERE e1.i < 10
        """,
        # the 4LT compression is deterministic (integer quantized ratios with
        # Java-round floor(x+0.5) parity): encode true hierarchical sums,
        # quantize (6/5/5/2x4-bit ratios), decode top-down with sibling
        # subtraction, then the fractional-overlap range walk — the full
        # compress→decode→rangeQuery pipeline of EquiWidthHistogram4LT.java
        # replayed in SQL (16 bins over [0,500) → width 31.25, 2 groups of 8)
        "hist4lt_ranges": """
            WITH w AS (SELECT DISTINCT time_bucket(INTERVAL '1 day', ts) ws FROM events),
                 c AS (SELECT time_bucket(INTERVAL '1 day', ts) ws,
                              CAST(floor(value / 31.25) AS BIGINT) bin, count(*) cnt
                       FROM events WHERE value >= 0 AND value < 500 GROUP BY 1, 2),
                 bins AS (SELECT i AS bin FROM range(0, 16) t(i)),
                 f AS (SELECT w.ws, bins.bin, CAST(COALESCE(c.cnt, 0) AS DOUBLE) cnt
                       FROM w CROSS JOIN bins
                       LEFT JOIN c ON c.ws = w.ws AND c.bin = bins.bin),
                 g AS (SELECT ws, bin // 8 AS grp, list(cnt ORDER BY bin) fs
                       FROM f GROUP BY 1, 2),
                 e AS (SELECT ws, grp, fs,
                              fs[1]+fs[2] AS c31, fs[5]+fs[6] AS c33,
                              fs[1]+fs[2]+fs[3]+fs[4] AS c21,
                              fs[1]+fs[2]+fs[3]+fs[4]+fs[5]+fs[6]+fs[7]+fs[8] AS root
                       FROM g),
                 q AS (SELECT ws, grp, fs, root, c21, c31, c33,
                          CASE WHEN root > 0 THEN floor(c21/root*63 + 0.5) ELSE 0 END q2,
                          CASE WHEN c21 > 0 THEN floor(c31/c21*31 + 0.5) ELSE 0 END q3a,
                          CASE WHEN root-c21 > 0 THEN floor(c33/(root-c21)*31 + 0.5) ELSE 0 END q3b,
                          CASE WHEN c31 > 0 THEN floor(fs[1]/c31*15 + 0.5) ELSE 0 END q4a,
                          CASE WHEN c21-c31 > 0 THEN floor(fs[3]/(c21-c31)*15 + 0.5) ELSE 0 END q4b,
                          CASE WHEN c33 > 0 THEN floor(fs[5]/c33*15 + 0.5) ELSE 0 END q4c,
                          CASE WHEN root-c21-c33 > 0 THEN floor(fs[7]/(root-c21-c33)*15 + 0.5) ELSE 0 END q4d
                       FROM e),
                 d2 AS (SELECT *, floor(q2/64.0*root + 0.5) l20 FROM q),
                 d2b AS (SELECT *, root - l20 AS l21 FROM d2),
                 d3 AS (SELECT *, floor(q3a/32.0*l20 + 0.5) l30,
                               floor(q3b/32.0*l21 + 0.5) l32 FROM d2b),
                 d3b AS (SELECT *, l20 - l30 AS l31, l21 - l32 AS l33 FROM d3),
                 d4 AS (SELECT *, floor(q4a/16.0*l30 + 0.5) d0,
                               floor(q4b/16.0*l31 + 0.5) d2_,
                               floor(q4c/16.0*l32 + 0.5) d4_,
                               floor(q4d/16.0*l33 + 0.5) d6 FROM d3b),
                 dec AS (SELECT ws, grp,
                                [d0, l30 - d0, d2_, l31 - d2_,
                                 d4_, l32 - d4_, d6, l33 - d6] ds
                         FROM d4),
                 leaf AS (SELECT ws, grp * 8 + (j - 1) AS bin, ds[j] AS dcnt
                          FROM dec, range(1, 9) t(j)),
                 ranges AS (SELECT * FROM (VALUES (0.0, 125.0), (100.0, 300.0),
                                                  (250.0, 500.0)) t(lo, hi)),
                 est AS (SELECT l.ws, r.lo, r.hi,
                                ROUND(SUM(l.dcnt * greatest(0.0,
                                    least(r.hi, (l.bin + 1) * 31.25)
                                    - greatest(r.lo, l.bin * 31.25)) / 31.25), 4) est
                         FROM leaf l CROSS JOIN ranges r GROUP BY 1, 2, 3)
            SELECT ws AS window_start, lo, hi, est FROM est
        """,
        "sliding_inversion": """
            WITH s AS (SELECT time_bucket(INTERVAL '6 hours', ts) sl, count(*) c
                       FROM events GROUP BY 1)
            SELECT min(sl) OVER w AS window_start,
                   sl + INTERVAL '6 hours' AS window_end,
                   CAST(sum(c) OVER w AS BIGINT) AS n
            FROM s
            WINDOW w AS (ORDER BY sl ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        """,
        "sliding_inversion_stratified": """
            WITH s AS (SELECT event_type st, time_bucket(INTERVAL '6 hours', ts) sl,
                              count(*) c
                       FROM events GROUP BY 1, 2)
            SELECT st AS stratum, min(sl) OVER w AS window_start,
                   sl + INTERVAL '6 hours' AS window_end,
                   CAST(sum(c) OVER w AS BIGINT) AS n
            FROM s
            WINDOW w AS (PARTITION BY st ORDER BY sl
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        """,
        "query_latest_stratified": """
            WITH last AS (SELECT event_type, max(time_bucket(INTERVAL '1 day', ts)) ws
                          FROM events GROUP BY 1),
                 b AS (SELECT i AS bucket FROM range(0, 10) t(i)),
                 c AS (SELECT event_type, time_bucket(INTERVAL '1 day', ts) ws,
                              CAST(floor(value / 50.0) AS BIGINT) bucket, count(*) cnt
                       FROM events WHERE value >= 0 AND value < 500 GROUP BY 1, 2, 3)
            SELECT last.event_type AS stratum, b.bucket, COALESCE(c.cnt, 0) AS cnt
            FROM last CROSS JOIN b
            LEFT JOIN c ON c.event_type = last.event_type AND c.ws = last.ws
                       AND c.bucket = b.bucket
        """,
        "stratified_hist": """
            WITH st AS (SELECT DISTINCT event_type FROM events),
                 b AS (SELECT i AS bucket FROM range(0, 10) t(i)),
                 c AS (SELECT event_type, CAST(floor(value / 50.0) AS BIGINT) bucket,
                              count(*) cnt
                       FROM events WHERE value >= 0 AND value < 500 GROUP BY 1, 2)
            SELECT st.event_type AS stratum, b.bucket, COALESCE(c.cnt, 0) AS cnt
            FROM st CROSS JOIN b
            LEFT JOIN c ON c.event_type = st.event_type AND c.bucket = b.bucket
        """,
        "tumbling_counts": """
            SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
                   count(*) AS cnt, ROUND(sum(value), 4) AS sum_value
            FROM events GROUP BY 1
        """,
        "query_timestamped": f"""
            WITH q AS (SELECT unnest([{", ".join(f"TIMESTAMP '{t}'" for t in Q_TS)}]) q_ts),
                 k AS (SELECT unnest([{", ".join(str(k) for k in Q_KEYS)}]) user_id),
                 c AS (SELECT time_bucket(INTERVAL '1 day', ts) ws, user_id, count(*) cnt
                       FROM events GROUP BY 1, 2)
            SELECT q.q_ts, CAST(k.user_id AS VARCHAR) AS key,
                   COALESCE(c.cnt, 0) AS est_count
            FROM q CROSS JOIN k
            LEFT JOIN c ON c.ws = time_bucket(INTERVAL '1 day', q.q_ts)
                       AND c.user_id = k.user_id
        """,
        "query_timestamped_stratified": f"""
            WITH q AS (SELECT unnest([{", ".join(f"TIMESTAMP '{t}'" for t in Q_TS)}]) q_ts),
                 b AS (SELECT i AS bucket FROM range(0, 10) t(i)),
                 p AS (SELECT DISTINCT event_type,
                              time_bucket(INTERVAL '1 day', ts) ws FROM events),
                 c AS (SELECT event_type, time_bucket(INTERVAL '1 day', ts) ws,
                              CAST(floor(value / 50.0) AS BIGINT) bucket, count(*) cnt
                       FROM events WHERE value >= 0 AND value < 500 GROUP BY 1, 2, 3)
            SELECT q.q_ts, p.event_type AS stratum, b.bucket,
                   COALESCE(c.cnt, 0) AS cnt
            FROM q JOIN p ON p.ws = time_bucket(INTERVAL '1 day', q.q_ts)
            CROSS JOIN b
            LEFT JOIN c ON c.event_type = p.event_type AND c.ws = p.ws
                       AND c.bucket = b.bucket
        """,
        "query_latest_hist": """
            WITH last AS (SELECT max(time_bucket(INTERVAL '1 day', ts)) ws FROM events),
                 b AS (SELECT i AS bucket FROM range(0, 10) t(i)),
                 c AS (SELECT CAST(floor(value / 50.0) AS BIGINT) bucket, count(*) cnt
                       FROM events, last
                       WHERE time_bucket(INTERVAL '1 day', ts) = last.ws
                         AND value >= 0 AND value < 500
                       GROUP BY 1)
            SELECT b.bucket, COALESCE(c.cnt, 0) AS cnt
            FROM b LEFT JOIN c USING (bucket)
        """,
        "dedup_exact": f"""
            SELECT md5({_NORM}) AS fingerprint, min(doc_id) AS keep_id,
                   count(*) AS n_dups
            FROM documents GROUP BY 1
        """,
        "token_counts": f"""
            SELECT doc_id, len({_TOKS}) AS n_tokens,
                   length(text) AS n_chars_text
            FROM documents
        """,
        "quality_scores": f"""
            WITH t AS (SELECT doc_id, text, {_TOKS} toks FROM documents)
            SELECT doc_id,
                   length(text) AS n_chars_q,
                   len(toks) AS n_tokens,
                   ROUND((length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
                         / greatest(length(text), 1), 6) AS punct_ratio,
                   ROUND(len(list_filter(toks, x -> list_contains({_STOP_EN}, x)))
                         / greatest(len(toks), 1), 6) AS stopword_ratio,
                   ROUND((length(text) + 1) / greatest(len(toks), 1) - 1, 6)
                       AS avg_token_len
            FROM t
        """,
        "lang_id": f"""
            WITH t AS (SELECT doc_id, {_TOKS} toks FROM documents),
                 h AS (SELECT doc_id, {lang_hits} FROM t)
            SELECT doc_id,
                   CASE WHEN greatest(h_de, h_en, h_es, h_fr) <= 0 THEN 'unknown'
                        {lang_case} END AS lang_pred
            FROM h
        """,
        "fingerprints": f"""
            SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents
        """,
        "ngram_jaccard": f"""
            WITH sh AS (SELECT doc_id,
                   list_distinct([substring({_NORM}, i, 3)
                                  for i in range(1, greatest(length({_NORM}) - 2, 1) + 1)]) s
                        FROM documents)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   ROUND(len(list_intersect(a.s, b.s))
                         / greatest(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)), 1),
                         6) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s))
                  / greatest(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)), 1) >= 0.6
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id qid, embedding::DOUBLE[] qv FROM embeddings
                       WHERE vec_id < 10),
                 c AS (SELECT vec_id nid, embedding::DOUBLE[] cv FROM embeddings),
                 s AS (SELECT qid AS query_id, nid AS neighbor_id,
                              ROUND(list_cosine_similarity(qv, cv), 6) AS cosine
                       FROM q, c WHERE qid != nid),
                 r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                                    ORDER BY cosine DESC, neighbor_id) rank
                       FROM s)
            SELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= 5
        """,
        "dedup_cosine": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 6) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]) >= 0.4
        """,
        # the deterministic producer split (lag = event_id*7919 mod 8s) makes
        # the stream-stream join a pure relational join: inner matches are
        # exactly the rows whose lag fits the 5s bound
        "stream_join_events": """
            WITH d AS (SELECT event_id, props,
                              ts + to_microseconds((event_id * 7919) % 8000000)
                                AS d_ts
                       FROM events)
            SELECT h.event_id, h.user_id, h.event_type, h.value,
                   d.props, h.ts, d.d_ts
            FROM events h JOIN d ON h.event_id = d.event_id
            WHERE d.d_ts >= h.ts AND d.d_ts <= h.ts + INTERVAL 5 SECOND
        """,
        # the salted two-phase pass is bitwise-invisible: integer-cent sums
        # are order-independent, so lanes == plain GROUP BY
        "skew_salted_agg": """
            SELECT event_type, count(*) AS n_events,
                   sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
            FROM events GROUP BY event_type
        """,
        # (user_id, ts) is unique in the fixture → the as-of match is
        # deterministic and DuckDB's native ASOF JOIN is an exact oracle
        # for the union-merge window plan
        "asof_join_events": """
            WITH p AS (SELECT user_id, ts AS p_ts,
                              value AS last_purchase_value
                       FROM events WHERE event_type = 'purchase')
            SELECT e.event_id, e.user_id, e.event_type, e.value, e.ts,
                   p.last_purchase_value, p.p_ts
            FROM events e ASOF JOIN p
              ON e.user_id = p.user_id AND e.ts >= p.p_ts
        """,
        # replay the ngram-Jaccard pair pipeline, then close it
        # transitively: reach enumerates (node, reachable anc) over the
        # symmetric edge set, min(anc) is the component's min id — exactly
        # what star contraction converges to; singletons come from the
        # documents base rows
        "dedup_clusters": f"""
            WITH RECURSIVE sh AS (SELECT doc_id,
                   list_distinct([substring({_NORM}, i, 3)
                                  for i in range(1, greatest(length({_NORM}) - 2, 1) + 1)]) s
                                  FROM documents),
            pr AS (SELECT a.doc_id da, b.doc_id db
                   FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                   WHERE len(list_intersect(a.s, b.s))
                         / greatest(len(a.s) + len(b.s)
                                    - len(list_intersect(a.s, b.s)), 1) >= 0.6),
            e AS (SELECT da s, db d FROM pr
                  UNION ALL SELECT db da, da d FROM pr),
            reach(id, anc) AS (SELECT doc_id, doc_id FROM documents
                               UNION
                               SELECT r.id, e.d FROM reach r
                               JOIN e ON e.s = r.anc)
            SELECT id AS doc_id, min(anc) AS component,
                   CAST(id = min(anc) AS BIGINT) AS keep
            FROM reach GROUP BY id
        """,
    }
    # alternate execution strategies over the same logical query share its
    # exact oracle: the tree merge is byte-identical to the flat merge, and
    # the stateful streaming path must emit every closed window with the
    # same synopsis content as the batch build
    oracles["cm_frequency_tree"] = oracles["cm_user_frequency"]
    oracles["stream_stateful_frequency"] = oracles["cm_user_frequency"]
    # the pure-JVM SQL build is blob-byte-identical to build_batch
    # (tests/test_sqlbuild.py), so its estimates share the same oracles
    oracles["cm_sql_frequency"] = oracles["cm_user_frequency"]
    oracles["stream_sketch_sql"] = oracles["cm_user_frequency"]
    # compaction is a pure rewrite of the live manifest (rows identical),
    # so the compacted snapshot answers the same exact frequency oracle
    oracles["stream_compacted"] = oracles["cm_user_frequency"]
    # incremental read: delta rows are the MERGED state of every window
    # touched by the post-cutoff batch; CM exact at this sizing, so the
    # whole changelog (window set, change kind, counts) replays in SQL
    oracles["stream_incremental"] = """
        WITH n AS (SELECT CAST(floor(0.8 * count(DISTINCT ts)) AS BIGINT) n_off
                   FROM events),
             o AS (SELECT ts, row_number() OVER (ORDER BY ts) - 1 rn
                   FROM (SELECT DISTINCT ts FROM events)),
             cut AS (SELECT ts AS c FROM o WHERE rn = (SELECT n_off FROM n)),
             e AS (SELECT time_bucket(INTERVAL '1 day', ts) ws, user_id, ts
                   FROM events),
             w AS (SELECT ws,
                          CASE WHEN min(ts) < (SELECT c FROM cut)
                               THEN 'update' ELSE 'insert' END AS change_type
                   FROM e GROUP BY ws
                   HAVING max(ts) >= (SELECT c FROM cut)),
             u AS (SELECT DISTINCT user_id FROM events),
             cnt AS (SELECT ws, user_id, count(*) cnt FROM e GROUP BY 1, 2)
        SELECT w.ws AS window_start, w.change_type,
               CAST(u.user_id AS VARCHAR) AS key,
               COALESCE(cnt.cnt, 0) AS est_count
        FROM w CROSS JOIN u
        LEFT JOIN cnt ON cnt.ws = w.ws AND cnt.user_id = u.user_id
    """
    oracles["equiwidth_sql_hist"] = oracles["equiwidth_hist"]
    oracles["bottomk_sql_sample"] = oracles["bottomk_sample"]
    oracles["fifo_sql_latest"] = oracles["fifo_latest"]
    oracles["hist4lt_sql_ranges"] = oracles["hist4lt_ranges"]
    # integer-keyed bloom (SQL path): FP bound ~1e-9 at this sizing → exact
    oracles["bloom_sql_membership"] = """
        WITH w AS (SELECT DISTINCT time_bucket(INTERVAL '1 day', ts) ws FROM events),
             k AS (SELECT unnest(list_sort(list_distinct(list(user_id)))
                          || [-1, -2, -3]) AS uid
                   FROM events),
             p AS (SELECT DISTINCT time_bucket(INTERVAL '1 day', ts) ws, user_id
                   FROM events)
        SELECT w.ws AS window_start, CAST(k.uid AS VARCHAR) AS key,
               (p.user_id IS NOT NULL) AS member
        FROM w CROSS JOIN k
        LEFT JOIN p ON p.ws = w.ws AND p.user_id = k.uid
    """
    oracles["stream_sessions"] = oracles["session_windows"]
    oracles["stream_sliding"] = oracles["sliding_counts"]
    oracles["stream_wavelet"] = oracles["wavelet_range_sums"]
    # hash-sketch estimates replayed exactly in SQL (embedded hash-family
    # constants; see the helper docstrings) — the "approximate" estimators
    # are deterministic, so they value-hash like any exact query
    # full MinHash+LSH pipeline replayed exactly: signatures, banding,
    # exact-Jaccard verification (see _minhash_oracle_sql caveats)
    oracles["minhash_pairs"] = _minhash_oracle_sql(threshold=0.6)
    # full SimHash pipeline replayed exactly: codepoint-polynomial token
    # hash, per-bit votes, chunk blocking, hamming filter — all-integer,
    # bit-exact (see _simhash_oracle_sql)
    oracles["simhash_pairs"] = _simhash_oracle_sql(max_hamming=10)
    # split-and-merge equi-depth: post-merge state = exact min + DD quantile
    # estimator at i/B, boundaries ≤ the running max chain-merged into their
    # predecessor with size N/B each (histograms.SplitMergeDDHistogram
    # _recompute); the estimator CTE matches the equidepth_dd oracle
    oracles["splitmerge_dd_hist"] = """
        WITH r AS (SELECT value, row_number() OVER (ORDER BY value) rn,
                          count(*) OVER () n
                   FROM events WHERE value > 0),
             mn AS (SELECT min(value) AS mv, max(n) AS n FROM r),
             q AS (SELECT i FROM range(1, 10) t(i)),
             est AS (SELECT q.i,
                        2 * pow(1.01/0.99, ceil(ln(r.value) / ln(1.01/0.99)))
                          / (1.01/0.99 + 1) AS v
                     FROM q JOIN r
                       ON r.rn = greatest(1, CAST(ceil(q.i / 10.0 * r.n) AS BIGINT))),
             keyed AS (  -- quantile boundaries at/below the exact min chain-
                         -- merge into the min bucket; quantiles are monotone,
                         -- so CASE + GROUP BY reproduces the sequential merge
               SELECT CASE WHEN e.v <= mn.mv THEN mn.mv ELSE e.v END AS lo
               FROM est e CROSS JOIN mn
               UNION ALL SELECT mv FROM mn),
             merged AS (SELECT lo, count(*) AS mult FROM keyed GROUP BY lo)
        SELECT row_number() OVER (ORDER BY lo) - 1 AS bucket,
               ROUND(lo, 4) AS lo,
               ROUND(mult * (SELECT n FROM mn) / 10.0, 4) AS freq
        FROM merged
    """
    oracles["ams_f2"] = _ams_oracle_sql(width=1024, height=7, seed=7)
    oracles["ams_sql_f2"] = _ams_oracle_sql(width=1024, height=7, seed=7)
    oracles["ams_join_size"] = _ams_join_oracle_sql(width=1024, height=7, seed=7)
    oracles["cm_join_size"] = _cm_join_oracle_sql(width=2048, height=5, seed=7)
    oracles["kmv_distinct"] = _kmv_distinct_oracle_sql(k=1024, seed=7)
    # the SQL build is blob byte-identical to build_batch (pytest-asserted),
    # so the JVM-path twin shares the batch oracle
    oracles["kmv_sql_distinct"] = oracles["kmv_distinct"]
    oracles["pii_scrub"] = _pii_oracle_sql()
    oracles["kmv_overlap"] = _kmv_overlap_oracle_sql(k=1024, seed=7)
    # streamed KMV blobs are byte-identical to the batch build (canonical
    # sorted min-k merge), so the streaming twin shares the batch oracle
    oracles["stream_kmv_overlap"] = oracles["kmv_overlap"]
    # Misra-Gries in the oversized regime is the exact count table (no
    # decrement ever fires — module docstring, synopsis/mg.py), so the
    # oracle is the plain GROUP BY the summary collapses to
    oracles["mg_heavy_hitters"] = """
        SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
               CAST(user_id AS VARCHAR) AS key, count(*) AS est_count
        FROM events GROUP BY 1, user_id
        HAVING count(*) >= 5
    """
    # streamed MG blobs are byte-identical to the batch build in the exact
    # regime (canonical sorted-key state), so the twin shares the oracle
    oracles["stream_mg_hh"] = oracles["mg_heavy_hitters"]
    # the SQL build is blob byte-identical to build_batch (pytest), so the
    # JVM-path twin shares the batch oracle
    oracles["mg_sql_hh"] = oracles["mg_heavy_hitters"]
    oracles["mg_topk_tokens"] = f"""
        WITH t AS (SELECT lang, unnest({_TOKS}) AS token FROM documents),
             c AS (SELECT lang, token, count(*) cnt FROM t
                   WHERE token <> '' GROUP BY lang, token),
             r AS (SELECT lang AS stratum, token AS key, cnt AS est_count,
                          row_number() OVER (PARTITION BY lang
                              ORDER BY cnt DESC, token) AS rank
                   FROM c)
        SELECT stratum, rank, key, est_count FROM r WHERE rank <= 20
    """
    # decayed weights: direct SQL sum vs the engine's partial rescaling —
    # ~1e-15 relative apart; both sides round to 6 and threshold on the
    # rounded value, so the cut is identical
    oracles["decay_trending"] = """
        WITH w AS (SELECT time_bucket(INTERVAL '1 day', ts) ws, user_id,
                          epoch_us(ts) tus FROM events),
             m AS (SELECT ws, max(tus) tr FROM w GROUP BY ws),
             c AS (SELECT w.ws, user_id,
                          sum(pow(0.5, (m.tr - w.tus) / 21600000000.0)) AS wt
                   FROM w JOIN m USING (ws) GROUP BY w.ws, user_id)
        SELECT ws AS window_start, CAST(user_id AS VARCHAR) AS key,
               ROUND(wt, 6) AS est_weight
        FROM c WHERE ROUND(wt, 6) >= 1.2
    """
    oracles["stream_decay_trending"] = oracles["decay_trending"]
    oracles["stream_decay_querylatest"] = """
        WITH last AS (SELECT max(time_bucket(INTERVAL '1 day', ts)) ws
                      FROM events),
             w AS (SELECT user_id, epoch_us(ts) tus FROM events, last
                   WHERE time_bucket(INTERVAL '1 day', ts) = last.ws),
             m AS (SELECT max(tus) tr FROM w),
             c AS (SELECT user_id,
                          sum(pow(0.5, (m.tr - w.tus) / 21600000000.0)) wt
                   FROM w, m GROUP BY user_id, m.tr),
             u AS (SELECT DISTINCT user_id FROM events),
             b AS (SELECT i AS q_batch FROM range(0, 3) t(i))
        SELECT b.q_batch, CAST(u.user_id AS VARCHAR) AS key,
               ROUND(COALESCE(c.wt, 0), 6) AS est_weight
        FROM b CROSS JOIN u LEFT JOIN c USING (user_id)
    """
    # entropy from exact counts; sum order differs between engines but the
    # summands are O(100) doubles, so the noise (~1e-15 rel) sits ~9 orders
    # of magnitude below the 6-decimal rounding grid
    oracles["mg_entropy"] = """
        WITH c AS (SELECT time_bucket(INTERVAL '1 day', ts) ws, user_id,
                          count(*) cnt
                   FROM events GROUP BY 1, 2),
             s AS (SELECT ws, sum(cnt) n FROM c GROUP BY ws)
        SELECT c.ws AS window_start,
               ROUND(-sum((cnt / n) * ln(cnt / n)), 6) AS entropy
        FROM c JOIN s USING (ws) GROUP BY c.ws
    """
    # decontamination: the same gram pipeline, one semi-join on gram
    oracles["decontaminate"] = """
        WITH base AS (SELECT doc_id,
                             lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) norm
                      FROM documents),
             t AS (SELECT doc_id, string_split(norm, ' ') toks FROM base),
             gi AS (SELECT doc_id, toks,
                           unnest(range(1, greatest(len(toks) - 5 + 2, 1))) AS i
                    FROM t),
             g AS (SELECT DISTINCT doc_id,
                          array_to_string(toks[i : i + 4], ' ') AS gram
                   FROM gi),
             tr AS (SELECT DISTINCT gram FROM g WHERE doc_id % 2 = 0),
             ev AS (SELECT doc_id, CAST(count(*) AS BIGINT) n_grams,
                           CAST(sum(CASE WHEN gram IN (SELECT gram FROM tr)
                                         THEN 1 ELSE 0 END) AS BIGINT) n_hits
                    FROM g WHERE doc_id % 2 = 1 GROUP BY doc_id)
        SELECT b.doc_id,
               COALESCE(ev.n_grams, 0) AS n_grams,
               COALESCE(ev.n_hits, 0) AS n_hits,
               ROUND(COALESCE(ev.n_hits, 0)
                     / greatest(COALESCE(ev.n_grams, 0), 1), 6)
                   AS contamination_ratio,
               ROUND(COALESCE(ev.n_hits, 0)
                     / greatest(COALESCE(ev.n_grams, 0), 1), 6) >= 0.2
                   AS contaminated
        FROM (SELECT doc_id FROM base WHERE doc_id % 2 = 1) b
        LEFT JOIN ev USING (doc_id)
    """
    # per-doc verdicts depend only on the doc + the static gram set, so
    # the streamed union equals the batch run exactly
    oracles["stream_decontaminate"] = oracles["decontaminate"]
    # repetition signals: the same one-explode two-aggregation pipeline,
    # DuckDB list slices standing in for Spark's slice/concat_ws
    oracles["repetition_scores"] = """
        WITH base AS (SELECT doc_id,
                             lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) norm
                      FROM documents),
             t AS (SELECT doc_id, norm, string_split(norm, ' ') toks FROM base),
             gi AS (SELECT doc_id, toks, v.n,
                           unnest(range(1, greatest(len(toks) - v.n + 2, 1))) AS i
                    FROM t, (VALUES (2), (3)) v(n)),
             g AS (SELECT doc_id, n,
                          array_to_string(toks[i : i + n - 1], ' ') AS gram
                   FROM gi),
             c AS (SELECT doc_id, n, gram, count(*) cnt FROM g GROUP BY ALL),
             s AS (SELECT doc_id, n,
                          max(cnt * length(gram)) top_cov,
                          sum(CASE WHEN cnt >= 2 THEN cnt * length(gram)
                                   ELSE 0 END) dup_cov
                   FROM c GROUP BY ALL)
        SELECT b.doc_id,
               ROUND(COALESCE(MAX(CASE WHEN s.n = 2 THEN s.top_cov END), 0)
                     / greatest(length(b.norm), 1), 6) AS top_2gram_frac,
               ROUND(COALESCE(MAX(CASE WHEN s.n = 3 THEN s.top_cov END), 0)
                     / greatest(length(b.norm), 1), 6) AS top_3gram_frac,
               ROUND(COALESCE(MAX(CASE WHEN s.n = 3 THEN s.dup_cov END), 0)
                     / greatest(length(b.norm), 1), 6) AS dup_3gram_frac
        FROM base b LEFT JOIN s ON s.doc_id = b.doc_id
        GROUP BY b.doc_id, b.norm
    """
    oracles["hll_distinct"] = _hll_oracle_sql(log_reg_num=14, seed=7)
    oracles["hll_sql_distinct"] = _hll_oracle_sql(log_reg_num=14, seed=7)
    # codegen point-query twins: DD quantile estimator replayed in SQL
    # (rank = max(1, ceil(q*n)), representative of the rank-th value);
    # cuckoo promoted to exact at 5 keys / 1024x4 slots; equi-width range
    # fractions are exact dyadic rationals at these endpoints
    oracles["dd_quantile_pointquery"] = """
        WITH r AS (SELECT value, row_number() OVER (ORDER BY value) rn,
                          count(*) OVER () n
                   FROM events WHERE value > 0),
             qs AS (SELECT unnest([0.001, 0.01, 0.05, 0.1, 0.25, 0.5, 0.75,
                                   0.9, 0.95, 0.99, 0.999, 1.0]) AS q)
        SELECT qs.q,
               ROUND(2 * pow(1.01/0.99, ceil(ln(r.value) / ln(1.01/0.99)))
                     / (1.01/0.99 + 1), 6) AS quantile
        FROM r JOIN qs ON r.rn = greatest(1, CAST(ceil(qs.q * r.n) AS BIGINT))
    """
    oracles["stream_quantile_latest"] = """
        WITH last AS (SELECT max(time_bucket(INTERVAL '1 day', ts)) ws
                      FROM events WHERE value > 0),
             r AS (SELECT value, row_number() OVER (ORDER BY value) rn,
                          count(*) OVER () n
                   FROM events, last
                   WHERE value > 0
                     AND time_bucket(INTERVAL '1 day', ts) = last.ws),
             qs AS (SELECT CAST(unnest([0.1, 0.25, 0.5, 0.75, 0.9, 0.99])
                                AS DOUBLE) AS q)
        SELECT CAST(qs.q AS VARCHAR) AS key,
               ROUND(2 * pow(1.01/0.99, ceil(ln(r.value) / ln(1.01/0.99)))
                     / (1.01/0.99 + 1), 6) AS est_value
        FROM r JOIN qs ON r.rn = greatest(1, CAST(ceil(qs.q * r.n) AS BIGINT))
    """
    oracles["cuckoo_pointquery"] = """
        WITH k AS (SELECT i AS key FROM range(-3, 10) t(i)),
             p AS (SELECT DISTINCT CAST(floor(value / 100) AS BIGINT) v
                   FROM events)
        SELECT k.key, (p.v IS NOT NULL) AS member
        FROM k LEFT JOIN p ON p.v = k.key
    """
    oracles["equiwidth_rangequery"] = """
        WITH c AS (SELECT CAST(floor(value / 25.0) AS BIGINT) bin, count(*) cnt
                   FROM events WHERE value >= 0 AND value < 500 GROUP BY 1),
             b AS (SELECT t.i AS bin, CAST(COALESCE(c.cnt, 0) AS DOUBLE) cnt
                   FROM range(0, 20) t(i) LEFT JOIN c ON c.bin = t.i),
             r AS (SELECT lo, hi, greatest(lo, 0.0) lo2, least(hi, 500.0) hi2
                   FROM (VALUES (0.0, 500.0), (12.5, 237.5), (31.25, 31.25),
                                (3.125, 496.875), (-125.0, 250.0),
                                (250.0, 1000.0), (400.0, 100.0),
                                (600.0, 700.0), (43.75, 68.75),
                                (0.0, 3.125)) v(lo, hi))
        SELECT r.lo, r.hi,
               ROUND(CASE WHEN r.hi2 <= r.lo2 THEN 0.0
                     ELSE sum(b.cnt * greatest(0.0,
                              least(r.hi2, (b.bin + 1) * 25.0)
                              - greatest(r.lo2, b.bin * 25.0)) / 25.0)
                     END, 6) AS est_count
        FROM r CROSS JOIN b GROUP BY r.lo, r.hi, r.lo2, r.hi2
    """
    # query-stream evaluation: the snapshot is final before the query stream
    # replays, so every batch answers against the newest window; CM at
    # width 8192 over this key set is exact
    oracles["stream_query_latest"] = """
            WITH last AS (SELECT max(time_bucket(INTERVAL '1 day', ts)) ws
                          FROM events),
                 u AS (SELECT DISTINCT user_id FROM events),
                 c AS (SELECT user_id, count(*) cnt FROM events, last
                       WHERE time_bucket(INTERVAL '1 day', ts) = last.ws
                       GROUP BY 1),
                 b AS (SELECT i AS q_batch FROM range(0, 3) t(i))
            SELECT b.q_batch, CAST(u.user_id AS VARCHAR) AS key,
                   COALESCE(c.cnt, 0) AS est_count
            FROM b CROSS JOIN u LEFT JOIN c USING (user_id)
        """
    # MG at this capacity is exact like CM at this width: same answers
    oracles["stream_mg_querylatest"] = oracles["stream_query_latest"]
    oracles["bucketed_join"] = """
            SELECT user_id, user_id % 5 AS segment, count(*) AS n_events,
                   ROUND(sum(value), 6) AS sum_value
            FROM events GROUP BY 1, 2
        """
    oracles["query_latest_sql"] = """
            WITH last AS (SELECT max(time_bucket(INTERVAL '1 day', ts)) ws
                          FROM events),
                 u AS (SELECT DISTINCT user_id FROM events),
                 c AS (SELECT user_id, count(*) cnt FROM events, last
                       WHERE time_bucket(INTERVAL '1 day', ts) = last.ws
                       GROUP BY 1)
            SELECT CAST(u.user_id AS VARCHAR) AS key,
                   COALESCE(c.cnt, 0) AS est_count
            FROM u LEFT JOIN c USING (user_id)
        """
    oracles["cep_sequence"] = """
            SELECT a.user_id AS key, a.ts AS first_ts, b.ts AS second_ts
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND a.event_type = 'signup' AND b.event_type = 'purchase'
             AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 3 DAY
        """
    oracles["cep_sequence_first"] = """
            SELECT a.user_id AS key, a.ts AS first_ts, min(b.ts) AS second_ts
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND a.event_type = 'signup' AND b.event_type = 'purchase'
             AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 3 DAY
            GROUP BY 1, 2
        """
    oracles["cep_chain3"] = """
            SELECT a.user_id AS key, a.ts AS ts1, b.ts AS ts2, c.ts AS ts3
            FROM events a
            JOIN events b ON a.user_id = b.user_id AND b.ts > a.ts
            JOIN events c ON a.user_id = c.user_id AND c.ts > b.ts
                         AND c.ts <= a.ts + INTERVAL 1 DAY
            WHERE a.event_type = 'signup' AND b.event_type = 'view'
              AND c.event_type = 'purchase'
        """
    # the streaming CEP operator emits each pair exactly once at its later
    # element's arrival, so full replay reproduces the batch join verbatim
    oracles["stream_cep_sequence"] = oracles["cep_sequence"]
    oracles["cep_absence"] = """
            SELECT a.user_id AS key, a.ts AS first_ts
            FROM events a
            WHERE a.event_type = 'signup' AND NOT EXISTS (
                  SELECT 1 FROM events b
                  WHERE b.user_id = a.user_id AND b.event_type = 'purchase'
                    AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 3 DAY)
        """
    # absence decides by time passing: the streaming twin emits each first
    # exactly once when the watermark clears first_ts + within, so a full
    # replay reproduces the batch anti-join verbatim
    oracles["stream_cep_absence"] = oracles["cep_absence"]
    oracles["cep_kleene"] = """
            SELECT a.user_id AS key, a.ts AS first_ts, b.ts AS second_ts,
                   count(*) AS n_mid
            FROM events a
            JOIN events b ON a.user_id = b.user_id
             AND a.event_type = 'signup' AND b.event_type = 'purchase'
             AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 3 DAY
            JOIN events m ON m.user_id = a.user_id
             AND m.event_type = 'view' AND m.ts > a.ts AND m.ts < b.ts
            GROUP BY 1, 2, 3
        """
    # the streaming twin finalizes each pair's count when the watermark
    # clears second_ts, so full replay equals the batch aggregate verbatim
    oracles["stream_cep_kleene"] = oracles["cep_kleene"]
    oracles["cep_adjacent"] = """
            WITH o AS (
                SELECT user_id, ts, event_type,
                       lead(event_type) OVER w AS nk,
                       lead(ts) OVER w AS nt
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT user_id AS key, ts AS first_ts, nt AS second_ts
            FROM o
            WHERE event_type = 'signup' AND nk = 'purchase'
              AND nt <= ts + INTERVAL 3 DAY
        """
    # strict contiguity decides by order finality: the streaming twin emits
    # each adjacent pair exactly once when the watermark clears its later
    # element, so a full replay reproduces the batch window lead verbatim
    oracles["stream_cep_adjacent"] = oracles["cep_adjacent"]
    # in-band triple emission: a chain emits exactly once, when its
    # latest-arriving element lands — full replay equals the 3-way join
    oracles["stream_cep_chain3"] = oracles["cep_chain3"]
    # noise-free media replay: pixel value v(i,t,x,y) =
    # trunc(clip((base + 20 sin(t/4 + i)) mod 256)) with base the x/y
    # gradient — the mod/clip/trunc and the left-to-right luminance
    # weighting reproduce the numpy ops bit-for-bit (mod by 2^8 is exact
    # in float64 on this domain), so only the 4dp-rounded means remain,
    # where summation-order ulps are ~1e-12 of the rounding quantum
    # md5-Rademacher SRP replay: plane sign (d, p) is the parity of
    # md5('srp:<seed>:<d>:<p>')'s last hex char on both sides; projections
    # are exact ±embedding sums (order ulps vs a >0 threshold — flips need
    # |proj| ~ 1e-15, never seen); cosine verify + rank reuse the proven
    # ann_topk oracle pattern
    oracles["ann_topk_lsh_exact"] = """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings),
            pl AS (
                SELECT d.generate_series AS d, p.generate_series AS p,
                       CASE WHEN substr(md5('srp:7:' || d.generate_series
                                            || ':' || p.generate_series),
                                        32, 1)
                            IN ('1','3','5','7','9','b','d','f')
                            THEN 1.0 ELSE -1.0 END AS s
                FROM generate_series(0, 63) d, generate_series(0, 7) p),
            proj AS (
                SELECT e.vec_id, pl.p, sum(e.v[pl.d + 1] * pl.s) AS pr
                FROM e, pl GROUP BY 1, 2),
            b AS (
                SELECT vec_id, CAST(sum(CASE WHEN pr > 0 THEN 1 << p
                                             ELSE 0 END) AS BIGINT) AS bucket
                FROM proj GROUP BY 1),
            q AS (SELECT e.vec_id AS qid, e.v AS qv, b.bucket
                  FROM e JOIN b USING (vec_id) WHERE e.vec_id < 10),
            c AS (SELECT e.vec_id AS nid, e.v AS cv, b.bucket
                  FROM e JOIN b USING (vec_id)),
            s AS (SELECT qid AS query_id, nid AS neighbor_id,
                         ROUND(list_cosine_similarity(qv, cv), 6) AS cosine
                  FROM q JOIN c USING (bucket) WHERE qid != nid),
            r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
                  FROM s)
            SELECT query_id, rank, neighbor_id, cosine
            FROM r WHERE rank <= 5
        """
    # full IVF replay: md5-ordered init sample, TWO unrolled Lloyd
    # iterations (per-dimension unnest; assignment = argmax dot via
    # row_number with the kernel's first-max tie-break; empty clusters
    # keep their previous centroid, the kernel's `moved` mask), then the
    # nprobe=4 probe and cosine top-k. Assignments are discrete, so the
    # ulp-level summation differences only matter at exact dot ties —
    # verified 500/500 identical at sf0.01
    oracles["ann_topk_ivf_exact"] = """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings),
            u AS (
                SELECT vec_id, list_transform(v, x -> x /
                         greatest(sqrt(list_sum(
                             list_transform(v, y -> y*y))), 1e-12)) AS uv
                FROM e),
            init AS (
                SELECT row_number() OVER (ORDER BY md5(vec_id || ':7')) - 1
                           AS cluster, uv
                FROM u ORDER BY md5(vec_id || ':7') LIMIT 16),
            c0 AS (SELECT cluster, generate_subscripts(uv, 1) - 1 AS d,
                          unnest(uv) AS cv
                   FROM init),
            ud AS (SELECT vec_id, generate_subscripts(uv, 1) - 1 AS d,
                          unnest(uv) AS uvd
                   FROM u),
            dot1 AS (SELECT ud.vec_id, c0.cluster, sum(ud.uvd * c0.cv) AS dp
                     FROM ud JOIN c0 USING (d) GROUP BY 1, 2),
            a1 AS (SELECT vec_id, cluster FROM (
                     SELECT vec_id, cluster,
                            row_number() OVER (PARTITION BY vec_id
                                ORDER BY dp DESC, cluster) rn
                     FROM dot1) WHERE rn = 1),
            m1 AS (SELECT a1.cluster, ud.d, avg(ud.uvd) AS mv
                   FROM a1 JOIN ud USING (vec_id) GROUP BY 1, 2),
            n1 AS (SELECT cluster, sqrt(sum(mv*mv)) AS nrm
                   FROM m1 GROUP BY 1),
            c1 AS (
                SELECT c0.cluster, c0.d,
                       CASE WHEN m1.mv IS NOT NULL
                            THEN m1.mv / greatest(n1.nrm, 1e-12)
                            ELSE c0.cv END AS cv
                FROM c0 LEFT JOIN m1 ON m1.cluster = c0.cluster
                                    AND m1.d = c0.d
                        LEFT JOIN n1 ON n1.cluster = c0.cluster),
            dot2 AS (SELECT ud.vec_id, c1.cluster, sum(ud.uvd * c1.cv) AS dp
                     FROM ud JOIN c1 USING (d) GROUP BY 1, 2),
            a2 AS (SELECT vec_id, cluster FROM (
                     SELECT vec_id, cluster,
                            row_number() OVER (PARTITION BY vec_id
                                ORDER BY dp DESC, cluster) rn
                     FROM dot2) WHERE rn = 1),
            m2 AS (SELECT a2.cluster, ud.d, avg(ud.uvd) AS mv
                   FROM a2 JOIN ud USING (vec_id) GROUP BY 1, 2),
            n2 AS (SELECT cluster, sqrt(sum(mv*mv)) AS nrm
                   FROM m2 GROUP BY 1),
            c2 AS (
                SELECT c1.cluster, c1.d,
                       CASE WHEN m2.mv IS NOT NULL
                            THEN m2.mv / greatest(n2.nrm, 1e-12)
                            ELSE c1.cv END AS cv
                FROM c1 LEFT JOIN m2 ON m2.cluster = c1.cluster
                                    AND m2.d = c1.d
                        LEFT JOIN n2 ON n2.cluster = c1.cluster),
            dotf AS (SELECT ud.vec_id, c2.cluster, sum(ud.uvd * c2.cv) AS dp
                     FROM ud JOIN c2 USING (d) GROUP BY 1, 2),
            af AS (SELECT vec_id, cluster FROM (
                     SELECT vec_id, cluster,
                            row_number() OVER (PARTITION BY vec_id
                                ORDER BY dp DESC, cluster) rn
                     FROM dotf) WHERE rn = 1),
            probe AS (SELECT vec_id AS qid, cluster FROM (
                        SELECT vec_id, cluster,
                               row_number() OVER (PARTITION BY vec_id
                                   ORDER BY dp DESC, cluster) rn
                        FROM dotf WHERE vec_id < 10) WHERE rn <= 4),
            s AS (
                SELECT probe.qid AS query_id, af.vec_id AS neighbor_id,
                       ROUND(list_cosine_similarity(eq.v, en.v), 6)
                           AS cosine
                FROM probe JOIN af USING (cluster)
                JOIN e eq ON eq.vec_id = probe.qid
                JOIN e en ON en.vec_id = af.vec_id
                WHERE af.vec_id != probe.qid),
            r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id) AS rank
                  FROM s)
            SELECT query_id, rank, neighbor_id, cosine
            FROM r WHERE rank <= 5
        """
    # banded variant of the same replay: plane p belongs to band p // 2,
    # contributing bit p % 2 of that band's bucket; the Spark side filters
    # on the ROUNDED cosine, so the oracle does too
    oracles["dedup_cosine_lsh_exact"] = """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings),
            pl AS (
                SELECT d.generate_series AS d, p.generate_series AS p,
                       CASE WHEN substr(md5('srp:7:' || d.generate_series
                                            || ':' || p.generate_series),
                                        32, 1)
                            IN ('1','3','5','7','9','b','d','f')
                            THEN 1.0 ELSE -1.0 END AS s
                FROM generate_series(0, 63) d, generate_series(0, 15) p),
            proj AS (
                SELECT e.vec_id, pl.p, sum(e.v[pl.d + 1] * pl.s) AS pr
                FROM e, pl GROUP BY 1, 2),
            bb AS (
                SELECT vec_id, p // 2 AS band,
                       CAST(sum(CASE WHEN pr > 0 THEN 1 << (p % 2)
                                     ELSE 0 END) AS BIGINT) AS bucket
                FROM proj GROUP BY 1, 2),
            cand AS (
                SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
                FROM bb a JOIN bb b ON a.band = b.band
                                   AND a.bucket = b.bucket
                                   AND a.vec_id < b.vec_id)
            SELECT c.id_a, c.id_b,
                   ROUND(list_cosine_similarity(ea.v, eb.v), 6) AS cosine
            FROM cand c
            JOIN e ea ON ea.vec_id = c.id_a
            JOIN e eb ON eb.vec_id = c.id_b
            WHERE ROUND(list_cosine_similarity(ea.v, eb.v), 6) >= 0.4
        """
    # closed-form audio replay: samples w(i,k) are pure sinusoid sums; the
    # float32 cast points are reproduced with CAST(.. AS REAL) (the int16/
    # 32767 double-divide-then-narrow equals float32 division for ALL 2^16
    # values — verified exhaustively in test_fixtures_exact), pcm16
    # rounding is numpy's half-to-even = round_even, and the DDSketch
    # answer is the rank-picked rms value's bin representative (the
    # ddsketch_quantiles oracle pattern). Residual float noise (summation
    # order, sin ulps) is ~1e-14 relative vs the 2% bin width.
    # direct-DFT replay of the rfft spectral operator on 64-sample clips
    # (q_audio_spectral_exact docstring has the numerics argument): the
    # same synth → normalize → float32 → pcm16 lattice as audio_rms_exact
    # (sr pinned 8000, n = 64), then power[m] = re² + im² from explicit
    # cos/sin sums, freqs = m·8000/64 = m·125 (exact doubles), and the
    # four estimators with 4-decimal rounding on both sides
    oracles["audio_spectral_exact"] = """
            WITH c AS (
              SELECT i,
                80.0 + (i*131)%900 AS f1, 1000.0 + (i*211)%1000 AS f2,
                (i%7)*0.9 AS p1, (i%11)*0.55 AS p2,
                0.4 + (i%5)*0.12 AS a1, 0.1 + (i%3)*0.13 AS a2
              FROM generate_series(0, 239) s(i)
            ), k AS (
              SELECT *, unnest(range(64)) AS k FROM c
            ), w AS (
              SELECT i, k,
                a1*sin(2*pi()*f1*(k/8000.0) + p1)
                + a2*sin(2*pi()*f2*(k/8000.0) + p2) AS w
              FROM k
            ), sc AS (
              SELECT i, 0.9/greatest(1e-9, max(abs(w))) AS scale
              FROM w GROUP BY i
            ), v AS (
              SELECT w.i, w.k,
                CAST(CAST(
                  CAST(CAST(round_even(least(greatest(
                    CAST(CAST(w.w*sc.scale AS REAL) AS DOUBLE),
                    -1.0), 1.0) * 32767.0, 0) AS SMALLINT) AS DOUBLE)
                  / 32767.0 AS REAL) AS DOUBLE) AS x
              FROM w JOIN sc USING (i)
            ), d AS (
              SELECT v.i, m.m,
                sum(v.x * cos(2*pi()*m.m*v.k/64.0)) AS re,
                sum(v.x * sin(2*pi()*m.m*v.k/64.0)) AS im
              FROM v, (SELECT unnest(range(33)) AS m) m
              GROUP BY v.i, m.m
            ), p AS (
              SELECT i, m, m*125.0 AS freq,
                     CASE WHEN m = 0 THEN 0.0 ELSE re*re + im*im END AS p
              FROM d
            ), t AS (
              SELECT i, sum(p) AS tot FROM p GROUP BY i
            ), cen AS (
              SELECT p.i, sum(p.freq*p.p)/any_value(t.tot) AS c
              FROM p JOIN t USING (i) GROUP BY p.i
            ), bw AS (
              SELECT p.i, sqrt(sum((p.freq-cen.c)*(p.freq-cen.c)*p.p)
                               /any_value(t.tot)) AS bw
              FROM p JOIN t USING (i) JOIN cen USING (i) GROUP BY p.i
            ), cu AS (
              SELECT i, m, freq,
                     sum(p) OVER (PARTITION BY i ORDER BY m) AS cum
              FROM p
            ), roll AS (
              SELECT cu.i, min(cu.freq) AS roll
              FROM cu JOIN t USING (i)
              WHERE cu.cum >= 0.85*t.tot GROUP BY cu.i
            ), fl AS (
              SELECT i, exp(avg(ln(p + 1e-30))) AS geo, avg(p) AS am
              FROM p WHERE m >= 1 GROUP BY i
            )
            SELECT 'clip-' || lpad(CAST(cen.i AS VARCHAR), 12, '0')
                     AS clip_id,
                   ROUND(cen.c, 4) AS centroid_hz,
                   ROUND(bw.bw, 4) AS bandwidth_hz,
                   ROUND(roll.roll, 4) AS rolloff_hz,
                   ROUND(fl.geo / greatest(fl.am, 1e-30), 4) AS flatness
            FROM cen JOIN bw USING (i) JOIN roll USING (i)
                     JOIN fl USING (i)
        """
    oracles["audio_rms_exact"] = """
            WITH c AS (
                SELECT i,
                  CASE i%4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                           WHEN 2 THEN 22050 ELSE 44100 END AS sr,
                  200 + (i*37)%600 AS dur_ms,
                  80.0 + (i*131)%900 AS f1, 1000.0 + (i*211)%1000 AS f2,
                  (i%7)*0.9 AS p1, (i%11)*0.55 AS p2,
                  0.4 + (i%5)*0.12 AS a1, 0.1 + (i%3)*0.13 AS a2
                FROM generate_series(0, 399) s(i)
            ), n AS (
                SELECT *, greatest(1, CAST(round_even(dur_ms*sr/1000.0, 0)
                                           AS BIGINT)) AS ns
                FROM c
            ), k AS (
                SELECT i, sr, f1, f2, p1, p2, a1, a2,
                       unnest(range(ns)) AS k
                FROM n
            ), w AS (
                SELECT i,
                  a1*sin(2*pi()*f1*(k/CAST(sr AS DOUBLE)) + p1)
                  + a2*sin(2*pi()*f2*(k/CAST(sr AS DOUBLE)) + p2) AS w
                FROM k
            ), sc AS (
                SELECT i, 0.9/greatest(1e-9, max(abs(w))) AS scale
                FROM w GROUP BY i
            ), v AS (
                SELECT w.i,
                  CAST(CAST(round_even(least(greatest(
                         CAST(CAST(w.w*sc.scale AS REAL) AS DOUBLE),
                         -1.0), 1.0) * 32767.0, 0) AS SMALLINT) AS DOUBLE)
                  / 32767.0 AS v64
                FROM w JOIN sc USING (i)
            ), r AS (
                SELECT i, sqrt(avg(CAST(CAST(v64 AS REAL) AS DOUBLE)
                                   * CAST(CAST(v64 AS REAL) AS DOUBLE)))
                       AS rms
                FROM v GROUP BY i
            ), rr AS (
                SELECT rms, row_number() OVER (ORDER BY rms) AS rn,
                       count(*) OVER () AS n
                FROM r
            ), qs AS (SELECT unnest([0.5, 0.95]) AS q)
            SELECT 'pcm_s16le' AS stratum, qs.q,
                   ROUND(2 * pow(1.01/0.99, ceil(ln(rr.rms) / ln(1.01/0.99)))
                         / (1.01/0.99 + 1), 6) AS est_value
            FROM rr JOIN qs
              ON rr.rn = greatest(1, CAST(ceil(qs.q * rr.n) AS BIGINT))
        """
    # audio fingerprint dedup replay: the same closed-form waveform CTEs as
    # audio_rms_exact (params folded onto j = i%120, plus the integer
    # 31-bit multiply-xor-shift amplitude gate — every intermediate < 2^62
    # so BIGINT and numpy int64 agree exactly), then the whole fingerprint
    # pipeline in SQL: per-128-sample-frame energy (exact int64 sum of
    # int16 squares), bit_length*4 + 2-mantissa-bit level (length(bin(e))
    # + shifts), 4-level shingle pack, DISTINCT per clip, stop-fp cap
    # df<=64, fp equi-join, shared count >= 3, Jaccard >= 0.6. Expected:
    # exactly the 120 planted duplicate pairs (i, i+120) at jaccard 1.0.
    # shared closed-form fingerprint replay (gated synth -> pcm16 lattice ->
    # frame energies -> levels -> 4-shingles -> DISTINCT per clip), used by
    # BOTH audio_fp_exact and audio_corpus_overlap: one copy, composed below
    audio_fp_ctes = """c AS (
                SELECT i, (i%120) AS j,
                  CASE (i%120)%4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                           WHEN 2 THEN 22050 ELSE 44100 END AS sr,
                  200 + ((i%120)*37)%600 AS dur_ms,
                  80.0 + ((i%120)*131)%900 AS f1,
                  1000.0 + ((i%120)*211)%1000 AS f2,
                  ((i%120)%7)*0.9 AS p1, ((i%120)%11)*0.55 AS p2,
                  0.4 + ((i%120)%5)*0.12 AS a1, 0.1 + ((i%120)%3)*0.13 AS a2
                FROM generate_series(0, 239) s(i)
            ), n AS (
                SELECT *, greatest(1, CAST(round_even(dur_ms*sr/1000.0, 0)
                                           AS BIGINT)) AS ns
                FROM c
            ), k AS (
                SELECT i, j, sr, f1, f2, p1, p2, a1, a2, ns,
                       unnest(range(ns)) AS k
                FROM n
            ), h1 AS (
                SELECT *, ((k >> 9) * 2654435761
                           + j * 2246822519) % 2147483648 AS h
                FROM k
            ), h2 AS (
                SELECT * REPLACE ((xor(h, h >> 13) * 1274126177)
                                  % 2147483648 AS h)
                FROM h1
            ), w AS (
                SELECT i, ns, k,
                  (a1*sin(2*pi()*f1*(k/CAST(sr AS DOUBLE)) + p1)
                   + a2*sin(2*pi()*f2*(k/CAST(sr AS DOUBLE)) + p2))
                  * (1 + xor(h, h >> 16) % 7) AS w
                FROM h2
            ), sc AS (
                SELECT i, 0.9/greatest(1e-9, max(abs(w))) AS scale
                FROM w GROUP BY i
            ), s16 AS (
                SELECT w.i, w.k, w.ns,
                  CAST(CAST(round_even(least(greatest(
                         CAST(CAST(w.w*sc.scale AS REAL) AS DOUBLE),
                         -1.0), 1.0) * 32767.0, 0) AS SMALLINT) AS BIGINT)
                  AS s
                FROM w JOIN sc USING (i)
            ), fe AS (
                SELECT i, k // 128 AS f, sum(s*s) AS e
                FROM s16 WHERE k < (ns // 128) * 128
                GROUP BY 1, 2
            ), lv AS (
                SELECT i, f,
                  CASE WHEN e = 0 THEN 0
                       ELSE length(bin(e))*4
                            + ((e >> greatest(length(bin(e)) - 3, 0)) & 3)
                  END AS l
                FROM fe
            ), sh AS (
                SELECT i, l,
                   lead(l,1) OVER (PARTITION BY i ORDER BY f) AS l1,
                   lead(l,2) OVER (PARTITION BY i ORDER BY f) AS l2,
                   lead(l,3) OVER (PARTITION BY i ORDER BY f) AS l3
                FROM lv
            ), fps0 AS (
                SELECT DISTINCT i, ((l*256 + l1)*256 + l2)*256 + l3 AS fp
                FROM sh WHERE l3 IS NOT NULL
            )"""
    oracles["audio_fp_hh"] = f"""
            WITH {audio_fp_ctes}
            SELECT CAST(fp AS VARCHAR) AS key, count(*) AS est_count
            FROM fps0 GROUP BY fp HAVING count(*) >= 4
        """
    oracles["audio_fp_exact"] = f"""
            WITH {audio_fp_ctes}, keep AS (
                SELECT fp FROM fps0 GROUP BY fp HAVING count(*) <= 64
            ), fps AS (
                SELECT fps0.i, fps0.fp FROM fps0 JOIN keep USING (fp)
            ), cnt AS (
                SELECT i, count(*) AS c FROM fps GROUP BY i
            ), pair AS (
                SELECT a.i AS ia, b.i AS ib, count(*) AS m
                FROM fps a JOIN fps b ON a.fp = b.fp AND a.i < b.i
                GROUP BY 1, 2 HAVING count(*) >= 3
            )
            SELECT 'clip-' || lpad(CAST(ia AS VARCHAR), 12, '0') AS id_a,
                   'clip-' || lpad(CAST(ib AS VARCHAR), 12, '0') AS id_b,
                   m AS n_match,
                   ROUND(CAST(m AS DOUBLE) / (ca.c + cb.c - m), 6)
                       AS jaccard
            FROM pair JOIN cnt ca ON ca.i = ia JOIN cnt cb ON cb.i = ib
            WHERE CAST(m AS DOUBLE) / (ca.c + cb.c - m) >= 0.6
        """
    # corpus-level audio contamination: the SAME fingerprint chain feeds the
    # KMV min-k machinery (splitmix64 stages shared with the HLL/KMV event
    # oracles) — synth through estimator replayed end-to-end, single window
    _au_eu = _KMV_EST.format(cnt="l_cnt", k=1024, km1=1023, tau="tau_u")
    _au_ec = _KMV_EST.format(cnt="c", k=1024, km1=1023, tau="tau")
    oracles["audio_corpus_overlap"] = f"""
            WITH {audio_fp_ctes},
              corp AS (SELECT DISTINCT CASE WHEN i < 60 THEN 'a' ELSE 'b' END
                              AS et, fp FROM fps0),
              keys AS (SELECT DISTINCT fp AS x FROM corp),
              {_splitmix64_stages_sql(7)},
              hashed AS (SELECT x, CAST(hi AS HUGEINT) * 4294967296 + lo AS h
                         FROM s6),
              hw AS (SELECT DISTINCT corp.et, hh.h
                     FROM corp JOIN hashed hh ON hh.x = corp.fp),
              rk AS (SELECT et, h,
                        row_number() OVER (PARTITION BY et ORDER BY h) AS rn
                     FROM hw),
              mk AS (SELECT * FROM rk WHERE rn <= 1024),
              pc AS (SELECT et, count(*) AS c,
                            max(CASE WHEN rn = 1024 THEN h END) AS tau
                     FROM mk GROUP BY et),
              un AS (SELECT h, bool_or(et = 'a') AS in_a,
                            bool_or(et = 'b') AS in_b
                     FROM mk GROUP BY h),
              ur AS (SELECT h, in_a, in_b,
                        row_number() OVER (ORDER BY h) AS rn FROM un),
              ls AS (SELECT count(*) AS l_cnt,
                            sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END)
                                AS k_int,
                            max(CASE WHEN rn = 1024 THEN h END) AS tau_u
                     FROM ur WHERE rn <= 1024),
              est AS (SELECT l_cnt, k_int, {_au_eu} AS est_union FROM ls),
              pa AS (SELECT {_au_ec} AS est_c FROM pc WHERE et = 'a'),
              pb AS (SELECT {_au_ec} AS est_c FROM pc WHERE et = 'b')
            SELECT pa.est_c AS est_a, pb.est_c AS est_b, e.est_union,
                   CAST(CASE WHEN e.l_cnt < 1024 THEN e.k_int
                             ELSE (e.k_int * CAST(e.est_union AS HUGEINT))
                                  // 1024
                        END AS BIGINT) AS est_intersection,
                   CASE WHEN e.l_cnt = 0 THEN 0.0
                        ELSE CAST(e.k_int AS DOUBLE) / e.l_cnt END AS jaccard
            FROM est e, pa, pb
        """
    # audio preprocessing replay: the gated closed-form waveform CTEs plus
    # planted zero pads ((i*97)%1600 lead / (i*53)%1200 tail), then every
    # prep stage in SQL — per-128-sample int64 frame energies and the
    # e*1000 >= max(e) trim rule (pure integer compare), exact-rational
    # (k2*sr) divmod 16000 resample positions with a + frac*(b-a) float64
    # interpolation (the kernel uses the SAME expression form — IEEE
    # exact-rounded on both sides), round_even requantize, the
    # g = 3276.7/sqrt(e/n) gain (e < 2^53 so e/n is exact both sides),
    # and per-1600-sample/800-hop segment energies via the two-candidate
    # closed form (seg = 2*hop, so sample k2 lies in segments k2//800 and
    # k2//800 - 1, bounds-filtered). Matches prep_segments bit-for-bit.
    # shared replay prefix for BOTH pad-lattice oracles (audio_prep_exact
    # + audio_quality_exact): gated closed-form synth -> planted zero pads
    # -> pcm16 int16 lattice -> per-128-sample int64 frame energies ->
    # e*1000 >= max(e) trim bounds. One copy, composed below — any fix to
    # the gate hash / pad formula edits exactly one string (the fp oracle
    # keeps its own CTEs: param_mod folding, no pads).
    pad_lattice = """
            WITH c AS (
                SELECT i,
                  CASE i%4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                           WHEN 2 THEN 22050 ELSE 44100 END AS sr,
                  200 + (i*37)%600 AS dur_ms,
                  80.0 + (i*131)%900 AS f1, 1000.0 + (i*211)%1000 AS f2,
                  (i%7)*0.9 AS p1, (i%11)*0.55 AS p2,
                  0.4 + (i%5)*0.12 AS a1, 0.1 + (i%3)*0.13 AS a2,
                  (i*97)%1600 AS lead, (i*53)%1200 AS tail,
                  'tok' || lpad(CAST(i%512 AS VARCHAR), 3, '0') AS t
                FROM generate_series(0, 119) s(i)
            ), n AS (
                SELECT *, greatest(1, CAST(round_even(dur_ms*sr/1000.0, 0)
                                           AS BIGINT)) AS ns
                FROM c
            ), k AS (
                SELECT i, sr, f1, f2, p1, p2, a1, a2, ns, lead, tail,
                       unnest(range(ns)) AS k
                FROM n
            ), h1 AS (
                SELECT *, ((k >> 9) * 2654435761
                           + i * 2246822519) % 2147483648 AS h
                FROM k
            ), h2 AS (
                SELECT * REPLACE ((xor(h, h >> 13) * 1274126177)
                                  % 2147483648 AS h)
                FROM h1
            ), w AS (
                SELECT i, lead, ns, k,
                  (a1*sin(2*pi()*f1*(k/CAST(sr AS DOUBLE)) + p1)
                   + a2*sin(2*pi()*f2*(k/CAST(sr AS DOUBLE)) + p2))
                  * (1 + xor(h, h >> 16) % 7) AS w
                FROM h2
            ), sc AS (
                SELECT i, 0.9/greatest(1e-9, max(abs(w))) AS scale
                FROM w GROUP BY i
            ), s16 AS (
                SELECT w.i, w.lead + w.k AS p,
                  CAST(CAST(round_even(least(greatest(
                         CAST(CAST(w.w*sc.scale AS REAL) AS DOUBLE),
                         -1.0), 1.0) * 32767.0, 0) AS SMALLINT) AS BIGINT)
                  AS s
                FROM w JOIN sc USING (i)
                UNION ALL
                SELECT i, unnest(range(lead)) AS p, 0 AS s
                FROM n WHERE lead > 0
                UNION ALL
                SELECT i, lead + ns + unnest(range(tail)) AS p, 0 AS s
                FROM n WHERE tail > 0
            ), nt AS (
                SELECT i, lead + ns + tail AS ntot FROM n
            ), fe AS (
                SELECT i, p // 128 AS f, sum(s*s) AS e
                FROM s16 GROUP BY 1, 2
            ), mx AS (
                SELECT i, max(e) AS mxe FROM fe GROUP BY i
            ), act AS (
                SELECT fe.i, min(f) AS fa, max(f) AS fb
                FROM fe JOIN mx USING (i)
                WHERE e * 1000 >= mxe GROUP BY fe.i
            ), bounds AS (
                SELECT act.i, fa * 128 AS strt,
                       least(ntot, (fb + 1) * 128) AS stp
                FROM act JOIN nt USING (i)
            )"""
    oracles["audio_prep_exact"] = pad_lattice + """, rs AS (
                SELECT b.i, c.sr, b.strt, b.stp - b.strt AS nin,
                       ((b.stp - b.strt) * 16000 + c.sr - 1) // c.sr
                           AS nout
                FROM bounds b JOIN c USING (i)
            ), k2 AS (
                SELECT i, sr, strt, nin, unnest(range(nout)) AS k2 FROM rs
            ), pos AS (
                SELECT i, strt, nin, k2, (k2 * sr) // 16000 AS idx,
                       CAST((k2 * sr) % 16000 AS DOUBLE) / 16000.0 AS frac
                FROM k2
            ), y AS (
                SELECT pos.i, pos.k2,
                  CAST(round_even(a.s + pos.frac * (b.s - a.s), 0)
                       AS BIGINT) AS s2
                FROM pos
                JOIN s16 a ON a.i = pos.i AND a.p = pos.strt + pos.idx
                JOIN s16 b ON b.i = pos.i
                          AND b.p = pos.strt
                                    + least(pos.idx + 1, pos.nin - 1)
            ), ge AS (
                SELECT i, sum(s2*s2) AS e2, count(*) AS n2
                FROM y GROUP BY i
            ), gg AS (
                SELECT i, 3276.7 / sqrt(CAST(e2 AS DOUBLE) / n2) AS g
                FROM ge WHERE e2 > 0
            ), y2 AS (
                SELECT y.i, y.k2,
                  CAST(least(greatest(round_even(y.s2 * gg.g, 0),
                                      -32768.0), 32767.0) AS BIGINT) AS s3
                FROM y JOIN gg USING (i)
            ), ns2 AS (
                SELECT i, count(*) AS nout FROM y2 GROUP BY i
            ), cand AS (
                SELECT i, k2 // 800 AS sg, s3 FROM y2
                UNION ALL
                SELECT i, k2 // 800 - 1 AS sg, s3 FROM y2
            ), segf AS (
                SELECT cand.i, cand.sg, sum(s3*s3) AS energy
                FROM cand JOIN ns2 USING (i)
                -- nout >= 1600 guards the short-clip case: DuckDB's //
                -- truncates toward zero, so (nout-1600)//800 is 0 (not
                -- -1) for nout in 801..1599 and would admit a spurious
                -- seg 0 the kernel (n < seg -> nothing) never emits
                WHERE ns2.nout >= 1600
                  AND cand.sg >= 0
                  AND cand.sg <= (ns2.nout - 1600) // 800
                GROUP BY 1, 2
            )
            SELECT 'clip-' || lpad(CAST(i AS VARCHAR), 12, '0') AS clip_id,
                   CAST(sg AS INTEGER) AS seg_idx,
                   CAST(sg * 800 AS BIGINT) AS seg_start,
                   CAST(1600 AS INTEGER) AS n_samples,
                   CAST(energy AS BIGINT) AS energy
            FROM segf
        """
    # streaming dedup-on-ingest: with max_df=4096 above the fixture's
    # global max fingerprint df (88), no fingerprint is ever hot, so the
    # streamed pair set provably equals the batch scorer — the oracle IS
    # the audio_fp_exact replay with the cap lifted (and the same 0.6
    # Jaccard gate; the loudest false pair scores 0.418).
    oracles["stream_fp_dedup"] = oracles["audio_fp_exact"].replace(
        "count(*) <= 64", "count(*) <= 4096")
    # streaming exact text dedup: one whole-doc md5 fingerprint per row
    # and no df cap -> stream == batch unconditionally; DuckDB replays
    # the planted-duplicate union (doc_id+10000, case/whitespace-mangled
    # text), the md5(lower(ws-normalized)) fingerprint and the self-join
    # directly against the same documents parquet
    oracles["stream_text_dedup"] = f"""
            WITH all_docs AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 10000 AS doc_id,
                       '  ' || upper(text) || '   ' AS text
                FROM documents
            ), f AS (
                SELECT doc_id, md5({_NORM}) AS fp FROM all_docs
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(1 AS BIGINT) AS n_match,
                   CAST(1.0 AS DOUBLE) AS jaccard
            FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
        """
    # per-clip quality stats on the same padded gated lattice: counts and
    # ratios from the replayed s16 CTE — trim rule as above, exact int64
    # energy, abs(s) >= 32767 saturation count (0 on this 0.9-peak fixture
    # by design; the nonzero case is pytest-covered), divisions ordered
    # identically to clip_quality and round_even(_, 6) = np.round on both
    # sides.
    oracles["audio_quality_exact"] = pad_lattice + """, stats AS (
                SELECT i, count(*) AS nn, sum(s*s) AS e,
                       sum(CASE WHEN abs(s) >= 32767 THEN 1 ELSE 0 END)
                           AS nclip
                FROM s16 GROUP BY i
            )
            SELECT 'clip-' || lpad(CAST(stats.i AS VARCHAR), 12, '0')
                       AS clip_id,
                   stats.nn AS n_samples,
                   b.strt AS lead_trim,
                   stats.nn - b.stp AS tail_trim,
                   round_even(CAST(b.stp - b.strt AS DOUBLE) / stats.nn, 6)
                       AS active_ratio,
                   round_even(CAST(nclip AS DOUBLE) / stats.nn, 6)
                       AS clip_ratio,
                   round_even(sqrt(CAST(e AS DOUBLE) / stats.nn), 6) AS rms,
                   round_even((CASE WHEN c.t = '' THEN 0
                               ELSE length(c.t)
                                    - length(replace(c.t, ' ', '')) + 1
                               END)
                              / (stats.nn / CAST(c.sr AS DOUBLE)), 6)
                       AS tokens_per_sec
            FROM stats JOIN bounds b ON b.i = stats.i
                       JOIN c ON c.i = stats.i
        """
    oracles["media_features_exact"] = """
            WITH ids AS (
                SELECT i, 1 AS nf FROM generate_series(0, 119) s(i)
                UNION ALL
                SELECT i, 8 AS nf FROM generate_series(1000, 1039) s(i)
            ), px AS (
                SELECT ids.i, ids.nf, t.generate_series AS t,
                       y.generate_series AS y, x.generate_series AS x
                FROM ids, generate_series(0, 7) t, generate_series(0, 23) y,
                     generate_series(0, 31) x
                WHERE t.generate_series < ids.nf
            ), lum AS (
                SELECT i, nf, t, y, x,
                       0.299 * v + 0.587 * v + 0.114 * v AS l
                FROM (
                    SELECT *, trunc(least(greatest(
                               raw - floor(raw / 256.0) * 256.0, 0.0), 255.0))
                           AS v
                    FROM (SELECT *, (x * 255.0 / 31) * 0.5
                                    + (y * 255.0 / 23) * 0.5
                                    + 20.0 * sin(t / 4.0 + i) AS raw
                          FROM px))
            ), g AS (
                SELECT i, nf, l,
                       lead(l) OVER (PARTITION BY i, t, y ORDER BY x) AS lx,
                       lead(l) OVER (PARTITION BY i, t, x ORDER BY y) AS ly
                FROM lum)
            SELECT 'media-' || lpad(CAST(i AS VARCHAR), 8, '0') AS media_id,
                   round(avg(l), 4) AS mean_lum,
                   round(stddev_pop(l), 4) AS std_lum,
                   round(avg(abs(lx - l)) + avg(abs(ly - l)), 4)
                       AS edge_energy,
                   nf AS n_frames
            FROM g GROUP BY i, nf
        """
    oracles["stream_count_windows"] = """
            WITH o AS (SELECT row_number() OVER (ORDER BY ts, event_id) - 1 AS idx
                       FROM events)
            SELECT idx // 1000 AS window_id, count(*) AS n FROM o
            GROUP BY 1 HAVING count(*) = 1000
        """
    # dyadic CM family: exact at the driver sizing (64x oversampled levels,
    # promotion asserted by tests/test_dyadic.py), so the oracles are plain
    # exact counts — same promotion as cm_user_frequency
    rng_vals = ", ".join(f"({lo}, {hi})" for lo, hi in _DYADIC_RANGES)
    oracles["dyadic_range_count"] = f"""
            WITH w AS (SELECT max(time_bucket(INTERVAL '1 day', ts)) ws FROM events),
                 e AS (SELECT CAST(floor(value) AS BIGINT) k FROM events, w
                       WHERE time_bucket(INTERVAL '1 day', ts) = w.ws),
                 r AS (SELECT CAST(lo AS BIGINT) lo, CAST(hi AS BIGINT) hi
                       FROM (VALUES {rng_vals}) t(lo, hi))
            SELECT r.lo, r.hi,
                   (SELECT count(*) FROM e WHERE e.k BETWEEN r.lo AND r.hi)
                       AS est_count
            FROM r
        """
    oracles["dyadic_heavy_hitters"] = """
            WITH t AS (SELECT CAST((count(*) * 8 + 999) // 1000 AS BIGINT) thr
                       FROM events)
            SELECT user_id AS key, count(*) AS est_count
            FROM events, t GROUP BY user_id, t.thr
            HAVING count(*) >= t.thr
        """
    oracles["stream_dyadic_range"] = oracles["dyadic_range_count"]
    # closed streaming windows must equal the batch build byte-for-byte,
    # so the streamed tree shares the batch range oracle
    oracles["stream_dyadic_querylatest"] = f"""
            WITH w AS (SELECT max(time_bucket(INTERVAL '1 day', ts)) ws FROM events),
                 e AS (SELECT CAST(floor(value) AS BIGINT) k FROM events, w
                       WHERE time_bucket(INTERVAL '1 day', ts) = w.ws),
                 r AS (SELECT CAST(lo AS BIGINT) lo, CAST(hi AS BIGINT) hi
                       FROM (VALUES {rng_vals}) t(lo, hi)),
                 b AS (SELECT CAST(unnest([0, 1, 2]) AS BIGINT) q_batch)
            SELECT b.q_batch,
                   CAST(r.lo AS VARCHAR) || ':' || CAST(r.hi AS VARCHAR) AS key,
                   (SELECT count(*) FROM e WHERE e.k BETWEEN r.lo AND r.hi)
                       AS est_count
            FROM b CROSS JOIN r
        """
    qs_vals = ", ".join(f"({x})" for x in _DYADIC_QS)
    oracles["dyadic_quantile"] = f"""
            WITH w AS (SELECT max(time_bucket(INTERVAL '1 day', ts)) ws FROM events),
                 e AS (SELECT CAST(floor(value) AS BIGINT) k FROM events, w
                       WHERE time_bucket(INTERVAL '1 day', ts) = w.ws),
                 r AS (SELECT k, row_number() OVER (ORDER BY k) rn,
                              count(*) OVER () n FROM e),
                 qs AS (SELECT CAST(q AS DOUBLE) q FROM (VALUES {qs_vals}) t(q))
            SELECT qs.q, r.k AS est_key
            FROM qs JOIN r
              ON r.rn = greatest(1, CAST(ceil(qs.q * r.n) AS BIGINT))
        """
    return oracles
