"""Pure-JVM SQL build path (sqlbuild.py): byte parity with the kernel path,
hash-expression parity with the numpy families, plan shape, guards, and the
streaming formulation (sketch cells as native streaming aggregation state)."""

import tempfile

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from condor_spark import fixtures
from condor_spark.engine.builder import SynopsisSpec, build_batch, build_batch_many
from condor_spark.engine.sqlbuild import (StreamingSketchSQLJob, build_sketch_sql,
                                          build_sketch_sql_many, eh3_sign_exprs,
                                          h3_bucket_exprs, splitmix64_expr)
from condor_spark.engine.windows import GlobalWindow, Session, Sliding, Tumbling
from condor_spark.synopsis.hashing import EH3Family, H3Family, hash64

from conftest import SF_DIR


def _blob_map(df, key_cols=("window_start", "window_end", "stratum")):
    return {tuple(r[k] for k in key_cols): (bytes(r["state"]), r["n"])
            for r in df.collect()}


# ---------------------------------------------------------------------------
# hash-expression parity: SQL H3/EH3 == numpy H3/EH3, including negatives
# ---------------------------------------------------------------------------

def test_h3_expr_matches_numpy(spark):
    vals = np.array([0, 1, 2, 255, 256, 65535, 2**31 - 1, -1, -12345,
                     987654321, 2**40 + 17], dtype=np.int64)
    df = spark.createDataFrame(pd.DataFrame({"x": vals}))
    exprs = h3_bucket_exprs(F.col("x"), height=5, seed=7, width=8192)
    got = (df.select(F.col("x"), *[exprs[r].alias(f"h{r}") for r in range(5)])
           .toPandas().set_index("x"))
    want = H3Family(5, 7).hash(vals) % 8192  # (5, n)
    for i, v in enumerate(vals):
        for r in range(5):
            assert got.loc[v, f"h{r}"] == want[r, i]


def test_eh3_expr_matches_numpy(spark):
    vals = np.array([0, 1, 3, 42, 255, 65535, -1, -999, 2**31 - 1],
                    dtype=np.int64)
    df = spark.createDataFrame(pd.DataFrame({"x": vals}))
    exprs = eh3_sign_exprs(F.col("x"), height=7, seed=7)
    got = (df.select(F.col("x"), *[exprs[r].alias(f"s{r}") for r in range(7)])
           .toPandas().set_index("x"))
    want = EH3Family(7, 7).signs(vals)  # (7, n) ±1
    for i, v in enumerate(vals):
        for r in range(7):
            assert got.loc[v, f"s{r}"] == want[r, i]


# ---------------------------------------------------------------------------
# byte parity with build_batch across kinds / windows / strata
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kind,params,column", [
    ("countmin", dict(width=8192, height=5, seed=7), "user_id"),
    ("ams", dict(width=1024, height=7, seed=7), "user_id"),
    ("hll", dict(log_reg_num=14, seed=7), "user_id"),
    ("equiwidth", dict(lower=0.0, upper=450.0, num_buckets=19), "value"),
    ("equiwidth4lt", dict(lower=0.0, upper=450.0, num_buckets=19), "value"),
    ("bloom", dict(n_bits=8192, max_elements=512, seed=7, merge_mode="union"),
     "user_id"),
])
@pytest.mark.parametrize("window,stratify", [
    (Tumbling("1 day"), None),
    (Sliding("2 days", "1 day"), None),
    (Tumbling("1 day"), "event_type"),
    (GlobalWindow(), "event_type"),
])
def test_sql_build_byte_parity(spark, kind, params, column, window, stratify):
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    spec = SynopsisSpec(
        kind=kind, params=params, column=column,
        ts_column=None if isinstance(window, GlobalWindow) else "ts",
        window=window, stratify_by=stratify)
    kernel = _blob_map(build_batch(df, spec))
    sql = _blob_map(build_sketch_sql(df, spec))
    assert kernel.keys() == sql.keys()
    assert kernel == sql  # blob bytes AND n identical


def test_sql_build_parallelism_invariant(spark):
    """2-partition and 8-partition inputs produce identical bytes (counter
    addition commutes; no merge-order sensitivity)."""
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    spec = SynopsisSpec(kind="countmin", params=dict(width=4096, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling("1 day"))
    a = _blob_map(build_sketch_sql(df.repartition(2), spec))
    b = _blob_map(build_sketch_sql(df.repartition(8), spec))
    assert a == b


# ---------------------------------------------------------------------------
# shared-scan multi-build
# ---------------------------------------------------------------------------

def test_sql_many_matches_per_spec(spark):
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    specs = [
        SynopsisSpec(kind="countmin", params=dict(width=8192, height=5, seed=7),
                     column="user_id", ts_column="ts", window=Tumbling("1 day")),
        SynopsisSpec(kind="ams", params=dict(width=1024, height=7, seed=7),
                     column="user_id", ts_column="ts", window=Tumbling("1 day")),
        SynopsisSpec(kind="hll", params=dict(log_reg_num=12, seed=7),
                     column="user_id", ts_column="ts", window=Tumbling("1 day")),
        SynopsisSpec(kind="countmin", params=dict(width=2048, height=3, seed=11),
                     column="event_id", ts_column="ts", window=Tumbling("1 day")),
    ]
    many = build_sketch_sql_many(df, specs)
    for i, spec in enumerate(specs):
        got = _blob_map(many.where(F.col("spec_id") == i).drop("spec_id"))
        want = _blob_map(build_sketch_sql(df, spec))
        assert got == want, f"spec {i}"


def test_sql_many_matches_kernel_many(spark):
    """The SQL shared-scan and the kernel shared-scan agree row-for-row."""
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    specs = [
        SynopsisSpec(kind="countmin", params=dict(width=8192, height=5, seed=7),
                     column="user_id", ts_column="ts", window=Tumbling("1 day")),
        SynopsisSpec(kind="ams", params=dict(width=1024, height=7, seed=7),
                     column="user_id", ts_column="ts", window=Tumbling("1 day")),
    ]
    keys = ("spec_id", "window_start", "window_end", "stratum")
    got = _blob_map(build_sketch_sql_many(df, specs), key_cols=keys)
    want = _blob_map(build_batch_many(df, specs), key_cols=keys)
    assert got == want


# ---------------------------------------------------------------------------
# plan shape: the hot path is pure codegen — no Python evaluation before the
# final per-window assembly
# ---------------------------------------------------------------------------

def test_sql_build_plan_is_jvm_side(spark):
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    spec = SynopsisSpec(kind="countmin", params=dict(width=8192, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling("1 day"))
    plan = build_sketch_sql(df, spec)._jdf.queryExecution().executedPlan().toString()
    # exactly one Python operator: the final blob assembly
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    # pre-shuffle partial aggregation is present (map-side combine)
    assert "HashAggregate" in plan


# ---------------------------------------------------------------------------
# guards
# ---------------------------------------------------------------------------

def test_sql_build_rejects_string_keys(spark):
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    spec = SynopsisSpec(kind="countmin", params=dict(width=1024, height=5, seed=7),
                        column="event_type", ts_column="ts", window=Tumbling("1 day"))
    with pytest.raises(ValueError, match="integer-typed"):
        build_sketch_sql(df, spec)


def test_sql_build_rejects_other_kinds(spark):
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    spec = SynopsisSpec(kind="cuckoo", params=dict(bucket_size=4, num_buckets=64),
                        column="user_id", ts_column="ts", window=Tumbling("1 day"))
    with pytest.raises(ValueError, match="SQL build supports"):
        build_sketch_sql(df, spec)


def test_sql_bloom_rejects_intersect_merge(spark):
    """The reference's intersect-merge quirk is partition-dependent by
    construction; the SQL bit-OR path only matches union merge."""
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    spec = SynopsisSpec(kind="bloom",
                        params=dict(n_bits=4096, max_elements=256, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling("1 day"))
    with pytest.raises(ValueError, match="union"):
        build_sketch_sql(df, spec)


def test_sql_build_rejects_session_windows(spark):
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    spec = SynopsisSpec(kind="countmin", params=dict(width=1024, height=5, seed=7),
                        column="user_id", ts_column="ts",
                        window=Session("10 minutes"))
    with pytest.raises(ValueError, match="unsupported window"):
        build_sketch_sql(df, spec)


# ---------------------------------------------------------------------------
# bottom-k sampler as a rank-limited window query
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("use_md5,window,stratify", [
    (True, Tumbling("1 day"), None),
    (False, Sliding("2 days", "1 day"), "event_type"),
    (False, GlobalWindow(), None),
])
def test_bottomk_sql_byte_parity(spark, use_md5, window, stratify):
    from condor_spark.engine.sqlbuild import build_bottomk_sql
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    kwargs = dict(kind="bottomk", params=dict(sample_size=20, seed=7),
                  column="event_id",
                  ts_column=None if isinstance(window, GlobalWindow) else "ts",
                  window=window, stratify_by=stratify)
    if use_md5:
        df = df.withColumn("__p", F.md5(F.col("event_id").cast("string")))
        kwargs["priority_column"] = "__p"
    spec = SynopsisSpec(**kwargs)
    assert _blob_map(build_batch(df, spec)) == _blob_map(build_bottomk_sql(df, spec))


def test_bottomk_sql_plans_rank_pushdown(spark):
    """The rn<=k filter must plan as WindowGroupLimit: each map task keeps
    only its local top-k before the shuffle → shuffle is O(partitions×k)."""
    from condor_spark.engine.sqlbuild import build_bottomk_sql
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    spec = SynopsisSpec(kind="bottomk", params=dict(sample_size=20, seed=7),
                        column="event_id", ts_column="ts",
                        window=Tumbling("1 day"))
    plan = build_bottomk_sql(df, spec)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "WindowGroupLimit" in plan


@pytest.mark.parametrize("window,stratify", [
    (Tumbling("1 day"), None),
    (Sliding("2 days", "1 day"), "event_type"),
])
def test_fifo_sql_byte_parity(spark, window, stratify):
    from condor_spark.engine.sqlbuild import build_fifo_sql
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    spec = SynopsisSpec(kind="fifo", params=dict(sample_size=20),
                        column="event_id", ts_column="ts", window=window,
                        tiebreak_column="event_id", stratify_by=stratify)
    assert _blob_map(build_batch(df, spec)) == _blob_map(build_fifo_sql(df, spec))


def test_fifo_sql_requires_tiebreak(spark):
    """Arrival order is not a distributed concept — the SQL fifo path
    refuses to run without an explicit tiebreak column."""
    from condor_spark.engine.sqlbuild import build_fifo_sql
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    spec = SynopsisSpec(kind="fifo", params=dict(sample_size=20),
                        column="event_id", ts_column="ts",
                        window=Tumbling("1 day"))
    with pytest.raises(ValueError, match="tiebreak"):
        build_fifo_sql(df, spec)


def test_bottomk_sql_rejects_string_default_hash(spark):
    from condor_spark.engine.sqlbuild import build_bottomk_sql
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    spec = SynopsisSpec(kind="bottomk", params=dict(sample_size=20, seed=7),
                        column="event_type", ts_column="ts",
                        window=Tumbling("1 day"))
    with pytest.raises(ValueError, match="integer key column"):
        build_bottomk_sql(df, spec)


def test_equiwidth_expr_matches_np_histogram(spark):
    """Adversarial boundary parity: edge doubles, their float neighbors,
    NaN, out-of-range, irrational bucket widths — bucket assignment must
    reproduce np.histogram's uniform-bin fast path exactly."""
    from condor_spark.engine.sqlbuild import equiwidth_cell_expr
    rng = np.random.default_rng(3)
    lo, up, k = -3.7, 129.1, 13
    edges = np.linspace(lo, up, k + 1)
    vals = np.concatenate([
        rng.uniform(lo - 10, up + 10, 5000),
        edges, np.nextafter(edges, -np.inf), np.nextafter(edges, np.inf),
        [np.nan, -0.0, up, np.nextafter(up, -np.inf)]])
    df = spark.createDataFrame(pd.DataFrame({"x": vals}))
    got = (df.select(equiwidth_cell_expr(F.col("x"), lo, up, k, 0).alias("c"))
           .toPandas()["c"].astype(int).to_numpy())
    kept = vals[~np.isnan(vals)]
    kept = kept[(kept >= lo) & (kept < up)]
    want_hist, _ = np.histogram(kept, bins=k, range=(lo, up))
    got_hist = np.bincount(got[got >= 2] - 2, minlength=k)  # cell = bucket+2
    assert (got_hist == want_hist).all()
    assert int((got >= 2).sum()) == len(kept)
    assert int((got == 1).sum()) == len(vals) - len(kept)  # sentinel rows


def test_equiwidth_all_dropped_window_still_emits(spark):
    """A window whose rows are ALL out-of-range must still produce an
    all-zero histogram row (kernel semantics: the group exists before the
    range filter) — the sentinel cell keeps it alive in the SQL path."""
    pdf = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 11:00",
                              "2024-01-02 10:00", "2024-01-02 11:00"]),
        "v": [5.0, 7.0, 999.0, -4.0],  # day 2 entirely out of [0, 10)
    })
    df = spark.createDataFrame(pdf)
    spec = SynopsisSpec(kind="equiwidth",
                        params=dict(lower=0.0, upper=10.0, num_buckets=5),
                        column="v", ts_column="ts", window=Tumbling("1 day"))
    kernel = _blob_map(build_batch(df, spec))
    sql = _blob_map(build_sketch_sql(df, spec))
    assert len(kernel) == 2  # both days present
    assert kernel == sql


def test_wrap_arithmetic_matches_python_mod_2_64(spark):
    """Property check of the ANSI-safe lane arithmetic: for random 64-bit
    constants and inputs, _wrap_mul_const/_wrap_add_const equal Python's
    (x*c) % 2^64 / (x+c) % 2^64 reinterpreted as signed."""
    from condor_spark.engine.sqlbuild import _wrap_add_const, _wrap_mul_const
    rng = np.random.default_rng(99)
    consts = [int(c) for c in rng.integers(0, 2**64, 25, dtype=np.uint64)]
    vals = np.concatenate([
        rng.integers(-2**63, 2**63 - 1, 500, dtype=np.int64),
        np.array([0, 1, -1, 2**63 - 1, -2**63], dtype=np.int64)])
    df = spark.createDataFrame(pd.DataFrame({"x": vals}))
    exprs = []
    for j, c in enumerate(consts):
        exprs.append(_wrap_mul_const(F.col("x"), c).alias(f"m{j}"))
        exprs.append(_wrap_add_const(F.col("x"), c).alias(f"a{j}"))
    got = df.select("x", *exprs).toPandas()
    M = 1 << 64
    for j, c in enumerate(consts):
        for col, op in ((f"m{j}", lambda u: (u * c) % M),
                        (f"a{j}", lambda u: (u + c) % M)):
            want = [op(int(v) % M) for v in vals]
            want = [w - M if w >= (1 << 63) else w for w in want]
            assert got[col].tolist() == want, (col, c)


def test_splitmix64_expr_matches_numpy(spark):
    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.integers(-2**63, 2**63 - 1, 2000, dtype=np.int64),
        np.array([0, 1, -1, 2**62, -2**62, 2**63 - 1, -2**63], dtype=np.int64)])
    df = spark.createDataFrame(pd.DataFrame({"x": vals}))
    for seed in (7, 123456789):
        got = (df.select(splitmix64_expr(F.col("x"), seed).alias("h"))
               .toPandas()["h"].to_numpy().view(np.uint64))
        assert (got == hash64(vals, seed)).all()


# ---------------------------------------------------------------------------
# streaming: sketch cells as native streaming aggregation state
# ---------------------------------------------------------------------------

def _stream_parity(spark, specs, replay, watermark_delay, sliding=False):
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    max_ts = df.agg(F.max("ts")).collect()[0][0]
    cutoff = pd.Timestamp(max_ts) + pd.Timedelta(days=2)
    tmp = tempfile.mkdtemp(prefix="condor_sqlstream_")
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    replay(df, src, [cutoff + pd.Timedelta(days=40),
                     cutoff + pd.Timedelta(days=80)])
    job = StreamingSketchSQLJob(specs, watermark_delay=watermark_delay)
    q = job.start(spark, src, out, ckpt, max_files_per_trigger=1)
    q.awaitTermination(600)
    got = {(r["spec_id"], r["window_start"], r["stratum"]):
           (bytes(r["state"]), r["n"])
           for r in job.read_output(spark, out)
           .filter(F.col("window_end") <= F.lit(cutoff)).collect()}
    want = {(r["spec_id"], r["window_start"], r["stratum"]):
            (bytes(r["state"]), r["n"])
            for r in build_sketch_sql_many(df, specs).collect()}
    assert got == want


def test_streaming_sql_matches_batch(spark):
    """Ordered replay: every closed window's blob is byte-identical to the
    batch SQL build (which is byte-identical to the kernel build) — all
    five SQL-path kinds maintained in ONE streaming aggregation."""
    specs = [
        SynopsisSpec(kind="countmin", params=dict(width=8192, height=5, seed=7),
                     column="user_id", ts_column="ts", window=Tumbling("1 day")),
        SynopsisSpec(kind="hll", params=dict(log_reg_num=12, seed=7),
                     column="user_id", ts_column="ts", window=Tumbling("1 day")),
        SynopsisSpec(kind="equiwidth",
                     params=dict(lower=0.0, upper=450.0, num_buckets=9),
                     column="value", ts_column="ts", window=Tumbling("1 day")),
        SynopsisSpec(kind="bloom",
                     params=dict(n_bits=8192, max_elements=512, seed=7,
                                 merge_mode="union"),
                     column="user_id", ts_column="ts", window=Tumbling("1 day")),
    ]
    _stream_parity(
        spark, specs,
        lambda df, src, flush: fixtures.replay_in_order(
            spark, df, src, n_chunks=4, flush_ts=flush),
        watermark_delay="1 hour")


def test_streaming_sql_unordered_within_watermark(spark):
    """Bounded-disorder replay with watermark delay ≥ the disorder bound
    reproduces the in-order results exactly (UnorderedSource contract)."""
    specs = [SynopsisSpec(kind="ams", params=dict(width=512, height=5, seed=7),
                          column="user_id", ts_column="ts",
                          window=Tumbling("1 day"))]
    _stream_parity(
        spark, specs,
        lambda df, src, flush: fixtures.replay_unordered(
            spark, df, src, n_chunks=4, max_delay="2 hours", flush_ts=flush),
        watermark_delay="3 hours")


def test_streaming_sql_sliding_stratified(spark):
    """F.window(size, slide) streaming expansion matches the batch slice
    algebra, per stratum."""
    specs = [SynopsisSpec(kind="countmin", params=dict(width=2048, height=5, seed=7),
                          column="user_id", ts_column="ts",
                          window=Sliding("2 days", "1 day"),
                          stratify_by="event_type")]
    _stream_parity(
        spark, specs,
        lambda df, src, flush: fixtures.replay_in_order(
            spark, df, src, n_chunks=4, flush_ts=flush),
        watermark_delay="1 hour")


def test_streaming_sql_resume_from_checkpoint(spark):
    """Kill/resume contract: run 1 drains the first half of the stream and
    stops; run 2 restarts from the SAME checkpoint over the appended second
    half. Aggregation state for windows spanning the split must survive the
    restart — the final closed windows are byte-identical to a single batch
    build over everything."""
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    max_ts = df.agg(F.max("ts")).collect()[0][0]
    mid = pd.Timestamp(max_ts) - pd.Timedelta(days=14)
    cutoff = pd.Timestamp(max_ts) + pd.Timedelta(days=2)
    tmp = tempfile.mkdtemp(prefix="condor_sqlresume_")
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    # mid falls inside a window: its first-half rows sit in checkpointed
    # aggregation state when run 1 stops
    fixtures.replay_in_order(spark, df.where(F.col("ts") <= F.lit(mid)),
                             src, n_chunks=2)
    specs = [SynopsisSpec(kind="countmin", params=dict(width=4096, height=5, seed=7),
                          column="user_id", ts_column="ts",
                          window=Tumbling("1 day"))]
    job = StreamingSketchSQLJob(specs, watermark_delay="1 hour")
    q1 = job.start(spark, src, out, ckpt, max_files_per_trigger=1)
    q1.awaitTermination(300)
    fixtures.replay_in_order(spark, df.where(F.col("ts") > F.lit(mid)),
                             src, n_chunks=2,
                             flush_ts=[cutoff + pd.Timedelta(days=40),
                                       cutoff + pd.Timedelta(days=80)])
    q2 = job.start(spark, src, out, ckpt, max_files_per_trigger=1)
    q2.awaitTermination(300)
    got = {(r["spec_id"], r["window_start"]): (bytes(r["state"]), r["n"])
           for r in job.read_output(spark, out)
           .filter(F.col("window_end") <= F.lit(cutoff)).collect()}
    want = {(r["spec_id"], r["window_start"]): (bytes(r["state"]), r["n"])
            for r in build_sketch_sql_many(df, specs).collect()}
    assert got == want


def test_streaming_sql_rejects_global_window(spark):
    spec = SynopsisSpec(kind="countmin", params=dict(width=1024, height=5, seed=7),
                        column="user_id", window=GlobalWindow())
    with pytest.raises(ValueError, match="Tumbling/Sliding"):
        StreamingSketchSQLJob(spec)


def test_sql_many_rejects_mismatched_windows(spark):
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    specs = [
        SynopsisSpec(kind="countmin", params=dict(width=1024, height=5, seed=7),
                     column="user_id", ts_column="ts", window=Tumbling("1 day")),
        SynopsisSpec(kind="ams", params=dict(width=1024, height=5, seed=7),
                     column="user_id", ts_column="ts", window=Tumbling("2 days")),
    ]
    with pytest.raises(ValueError, match="share window"):
        build_sketch_sql_many(df, specs)


# ---------------------------------------------------------------------------
# KMV distinct sketch as a rank-limited window query
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("window,stratify", [
    (Tumbling("1 day"), None),
    (Tumbling("1 day"), "event_type"),
    (Sliding("1 day", "6 hours"), None),
    (GlobalWindow(), None),
])
def test_kmv_sql_byte_parity(spark, window, stratify):
    """State IS "the k smallest distinct hashes" — assembling it from the
    JVM rank query must reproduce build_batch blob bytes exactly."""
    from condor_spark.engine.sqlbuild import build_kmv_sql
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    spec = SynopsisSpec(kind="kmv", params=dict(k=256, seed=7),
                        column="user_id",
                        ts_column=None if isinstance(window, GlobalWindow)
                        else "ts",
                        window=window, stratify_by=stratify)
    assert _blob_map(build_batch(df, spec)) == _blob_map(build_kmv_sql(df, spec))


def test_kmv_sql_plans_rank_pushdown(spark):
    """rn<=k must plan as WindowGroupLimit (map-side local top-k before
    the shuffle → O(partitions×k) shuffle volume)."""
    from condor_spark.engine.sqlbuild import build_kmv_sql
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    spec = SynopsisSpec(kind="kmv", params=dict(k=256, seed=7),
                        column="user_id", ts_column="ts",
                        window=Tumbling("1 day"))
    plan = build_kmv_sql(df, spec)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_kmv_sql_rejects_string_key(spark):
    from condor_spark.engine.sqlbuild import build_kmv_sql
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    spec = SynopsisSpec(kind="kmv", params=dict(k=64, seed=7),
                        column="event_type", ts_column="ts",
                        window=Tumbling("1 day"))
    with pytest.raises(ValueError, match="integer key"):
        build_kmv_sql(df, spec)


@pytest.mark.parametrize("window,stratify", [
    (Tumbling("1 day"), None),
    (Tumbling("1 day"), "event_type"),
    (Sliding("1 day", "6 hours"), None),
    (GlobalWindow(), None),
])
def test_mg_sql_byte_parity(spark, window, stratify):
    """Exact-regime MG state IS the per-key count table — assembling it
    from the relational GROUP BY must reproduce build_batch blob bytes."""
    from condor_spark.engine.sqlbuild import build_mg_sql
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    spec = SynopsisSpec(kind="mg", params=dict(capacity=2048),
                        column="user_id",
                        ts_column=None if isinstance(window, GlobalWindow)
                        else "ts",
                        window=window, stratify_by=stratify)
    assert _blob_map(build_batch(df, spec)) == _blob_map(build_mg_sql(df, spec))


def test_mg_sql_float_keys_cast_like_kernel(spark):
    """Float key columns follow the kernel's Number->intValue() rule
    (truncation toward zero) on the SQL path too — blob byte parity, not
    silent string-keyed divergence."""
    from condor_spark.engine.sqlbuild import build_mg_sql
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    spec = SynopsisSpec(kind="mg", params=dict(capacity=2048),
                        column="value", ts_column="ts",
                        window=Tumbling("1 day"))
    assert _blob_map(build_batch(df, spec)) == _blob_map(build_mg_sql(df, spec))


def test_mg_sql_string_keys_and_overflow(spark):
    """String keys assemble to the kernel's U-dtype canonical state; a
    window over capacity fails loudly (the relational form only exists in
    the exact regime)."""
    from condor_spark.engine.sqlbuild import build_mg_sql
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    spec = SynopsisSpec(kind="mg", params=dict(capacity=64),
                        column="event_type", ts_column="ts",
                        window=Tumbling("1 day"))
    assert _blob_map(build_batch(df, spec)) == _blob_map(build_mg_sql(df, spec))
    tiny = SynopsisSpec(kind="mg", params=dict(capacity=8),
                        column="user_id", ts_column="ts",
                        window=Tumbling("1 day"))
    with pytest.raises(Exception, match="distinct keys > capacity"):
        build_mg_sql(df, tiny).collect()
