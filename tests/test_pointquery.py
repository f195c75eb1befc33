"""JVM-side (codegen) point-query evaluation vs the numpy kernels."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from condor_spark.engine import pointquery as pq
from condor_spark.engine.builder import SynopsisSpec, build_batch
from condor_spark.engine.windows import Tumbling
from condor_spark.synopsis.base import Synopsis

SF = "/root/testdata/sf0.001"


def _latest_syn(spark, spec):
    df = spark.read.parquet(f"{SF}/events.parquet")
    row = (build_batch(df, spec)
           .orderBy(F.col("window_end").desc()).limit(1).collect())[0]
    return Synopsis.from_bytes(bytes(row["state"]))


def test_cm_point_queries_bit_identical(spark):
    """Codegen gather+least == CountMinSketch.query for every key, including
    negatives and misses (H3 byte-LUT parity end to end)."""
    spec = SynopsisSpec(kind="countmin", params=dict(width=8192, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling("1 day"))
    syn = _latest_syn(spark, spec)
    keys = list(range(-10, 300)) + [10**9, -(10**9)]
    qdf = spark.createDataFrame([(k,) for k in keys], "key long")
    got = {r["key"]: r["est_count"] for r in pq.frequency_point_queries(
        qdf, "key", pq.cm_cells(syn), 8192, 5, 7).collect()}
    ref = syn.query(np.array(keys))
    assert all(got[k] == ref[i] for i, k in enumerate(keys))


def test_bloom_point_queries_bit_identical(spark):
    from condor_spark.synopsis.bloom import BloomFilter

    bf = BloomFilter(n_bits=4096, max_elements=256, seed=7)
    bf.update_batch(np.array([3, 17, 99, 1234, -8]))
    keys = list(range(-20, 2000, 7))
    qdf = spark.createDataFrame([(k,) for k in keys], "key long")
    got = {r["key"]: r["member"] for r in pq.membership_point_queries(
        qdf, "key", pq.bloom_bits(bf), bf.n_bits, bf.k, 7).collect()}
    ref = bf.query(np.array(keys))
    assert all(bool(got[k]) == bool(ref[i]) for i, k in enumerate(keys))
    assert any(got.values()) and not all(got.values())


def test_point_queries_reject_string_keys(spark):
    qdf = spark.createDataFrame([("a",)], "key string")
    with pytest.raises(ValueError, match="integer key"):
        pq.frequency_point_queries(qdf, "key", [0] * 8, 4, 2, 7)
    with pytest.raises(ValueError, match="integer key"):
        pq.membership_point_queries(qdf, "key", [False] * 8, 8, 2, 7)


def test_query_latest_frequency_empty_snapshot(spark):
    empty = spark.createDataFrame(
        [], "window_start timestamp, window_end timestamp, stratum string, "
            "state binary, n long")
    qdf = spark.createDataFrame([(1,), (2,)], "key long")
    out = pq.query_latest_frequency(empty, qdf)
    assert out.count() == 0
    assert out.columns == ["key", "est_count"]


def test_point_query_plan_is_pure_codegen(spark):
    """No Python evaluation node anywhere in the answer plan: the whole
    query side must sit inside WholeStageCodegen over a 1-row broadcast
    (BroadcastNestedLoopJoin of the cell grid)."""
    spec = SynopsisSpec(kind="countmin", params=dict(width=8192, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling("1 day"))
    syn = _latest_syn(spark, spec)
    qdf = spark.range(0, 1000).select(F.col("id").alias("key"))
    out = pq.frequency_point_queries(qdf, "key", pq.cm_cells(syn), 8192, 5, 7)
    out.collect()  # materialize the AQE final plan before inspecting it
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan \
        and "MapInPandas" not in plan
    assert "*(" in plan  # WholeStageCodegen stage marker
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row cells side


def test_stream_answer_modes_agree(spark, tmp_path):
    """QueryLatestStream 'auto' (codegen) and 'python' (Arrow+numpy) produce
    identical answers for an integer-keyed CountMin snapshot."""
    from condor_spark import fixtures
    from condor_spark.engine.streaming import (QueryLatestStream,
                                               StreamingSynopsisJob)

    events = spark.read.parquet(f"{SF}/events.parquet")
    spec = SynopsisSpec(kind="countmin", params=dict(width=8192, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling("1 day"))
    job = StreamingSynopsisJob(spec, sink_dir=str(tmp_path / "sink"),
                               watermark_delay="1 hour")
    src = str(tmp_path / "src")
    fixtures.replay_in_order(spark, events, src, n_chunks=3)
    job.start(spark, src, str(tmp_path / "ckpt")).awaitTermination(300)

    keys = sorted(r[0] for r in events.select("user_id").distinct().collect())
    qdf = spark.createDataFrame([(k,) for k in keys], "key long")
    answers = {}
    for mode in ("auto", "python"):
        ql = QueryLatestStream(job, out_dir=str(tmp_path / f"ans_{mode}"),
                               key_column="key", answer_mode=mode)
        ql.process_batch(qdf, 0)
        answers[mode] = sorted(
            (r["key"], r["est_count"], r["snapshot_version"])
            for r in ql.read_answers(spark).collect())
    assert answers["auto"] == answers["python"]
    assert len(answers["auto"]) == len(keys)


def test_cuckoo_point_queries_bit_identical(spark):
    """Codegen two-bucket probe == CuckooFilter.query for hits, misses and
    negative keys (splitmix64 + alt-bucket-LUT parity end to end)."""
    from condor_spark.synopsis.cuckoo import CuckooFilter

    cf = CuckooFilter(bucket_size=4, num_buckets=512, seed=11)
    inserted = np.array(list(range(0, 900, 3)) + [-5, -77, 10**12])
    cf.update_batch(inserted)
    keys = list(range(-100, 1200)) + [10**12, -(10**12)]
    qdf = spark.createDataFrame([(k,) for k in keys], "key long")
    got = {r["key"]: r["member"] for r in pq.cuckoo_point_queries(
        qdf, "key", pq.cuckoo_table(cf), cf.bucket_size, cf.num_buckets,
        cf.seed).collect()}
    ref = cf.query(np.array(keys))
    assert all(bool(got[k]) == bool(ref[i]) for i, k in enumerate(keys))
    assert any(got.values()) and not all(got.values())


def test_quantile_point_queries_bit_identical(spark):
    """Unrolled codegen binary search == DDSketch.quantile on a real value
    distribution, including q=0, q=1, sub-1/n quantiles and the zero
    bucket."""
    from condor_spark.synopsis.ddsketch import DDSketch

    vals = spark.read.parquet(f"{SF}/events.parquet") \
        .select("value").toPandas()["value"].to_numpy()
    dd = DDSketch(relative_accuracy=0.01)
    dd.update_batch(np.concatenate([vals, [0.0, 0.0, -3.0]]))
    qs = [0.0, 1e-9, 0.001, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999, 1.0]
    qdf = spark.createDataFrame([(q,) for q in qs], "q double")
    got = {r["q"]: r["quantile"] for r in pq.quantile_point_queries(
        qdf, "q", pq.dd_quantile_state(dd)).collect()}
    for q in qs:
        assert got[q] == dd.quantile(q), (q, got[q], dd.quantile(q))
    assert got[0.0] == 0.0  # rank 1 lands in the zero bucket


def test_quantile_point_queries_degenerate(spark):
    from condor_spark.synopsis.ddsketch import DDSketch

    qdf = spark.createDataFrame([(0.5,)], "q double")
    empty = DDSketch()
    out = pq.quantile_point_queries(qdf, "q", pq.dd_quantile_state(empty))
    assert np.isnan(out.collect()[0]["quantile"])  # n == 0 → NaN
    zeros = DDSketch()
    zeros.update_batch(np.zeros(10))
    out = pq.quantile_point_queries(qdf, "q", pq.dd_quantile_state(zeros))
    assert out.collect()[0]["quantile"] == 0.0  # empty bins, all zero bucket


def test_range_point_queries_match_kernel(spark):
    """O(1) prefix-sum range estimate == EquiWidthHistogram.range_query on
    aligned, fractional, clipped, inverted and out-of-domain ranges."""
    from condor_spark.synopsis.histograms import EquiWidthHistogram

    vals = spark.read.parquet(f"{SF}/events.parquet") \
        .select("value").toPandas()["value"].to_numpy()
    h = EquiWidthHistogram(lower=0.0, upper=100.0, num_buckets=40)
    h.update_batch(vals)
    w = 2.5
    ranges = ([(i * w, j * w) for i in range(0, 40, 7)
               for j in range(i, 41, 9)]
              + [(1.3, 1.9), (0.1, 99.9), (17.77, 18.0), (-50.0, 50.0),
                 (50.0, 500.0), (-10.0, 200.0), (60.0, 20.0), (200.0, 300.0),
                 (-5.0, -1.0), (33.333, 33.334)])
    qdf = spark.createDataFrame(ranges, "lo double, hi double")
    got = {(r["lo"], r["hi"]): r["est_count"]
           for r in pq.range_point_queries(qdf, "lo", "hi",
                                           pq.hist_state(h)).collect()}
    for lo, hi in ranges:
        ref = h.range_query(lo, hi)
        assert np.isclose(got[(lo, hi)], ref, rtol=1e-12, atol=1e-9), \
            (lo, hi, got[(lo, hi)], ref)


def test_new_point_query_plans_are_pure_codegen(spark):
    """None of the new kinds evaluate any Python node; the quantile search
    must also avoid higher-order functions (CodegenFallback)."""
    from condor_spark.synopsis.cuckoo import CuckooFilter
    from condor_spark.synopsis.ddsketch import DDSketch
    from condor_spark.synopsis.histograms import EquiWidthHistogram

    cf = CuckooFilter(num_buckets=256, seed=3)
    cf.update_batch(np.arange(200))
    dd = DDSketch()
    dd.update_batch(np.arange(1, 5000, dtype=np.float64))
    h = EquiWidthHistogram(0.0, 1000.0, 50)
    h.update_batch(np.arange(1000, dtype=np.float64))
    qk = spark.range(0, 500).select(F.col("id").alias("key"))
    qq = spark.range(1, 100).select((F.col("id") / 100).alias("q"))
    qr = spark.range(0, 100).select(
        (F.col("id") * 7 % 900).cast("double").alias("lo"),
        (F.col("id") * 7 % 900 + 60).cast("double").alias("hi"))
    outs = [
        pq.cuckoo_point_queries(qk, "key", pq.cuckoo_table(cf),
                                cf.bucket_size, cf.num_buckets, cf.seed),
        pq.quantile_point_queries(qq, "q", pq.dd_quantile_state(dd)),
        pq.range_point_queries(qr, "lo", "hi", pq.hist_state(h)),
    ]
    for out in outs:
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        assert "lambdafunction" not in plan.lower()


def test_query_latest_dispatchers(spark):
    """query_latest_{membership,quantile,range} decode the newest snapshot
    row and agree with the snapshot kernels."""
    from condor_spark.synopsis.base import Synopsis

    events = spark.read.parquet(f"{SF}/events.parquet")
    for kind, params, mk_q, answer in [
        ("cuckoo", dict(bucket_size=4, num_buckets=1024, seed=7),
         lambda: spark.createDataFrame([(k,) for k in range(120)], "key long"),
         lambda syn, df: {r["key"]: bool(r["member"]) for r in
                          pq.query_latest_membership(df_syn, df).collect()}),
        ("ddsketch", dict(relative_accuracy=0.02),
         lambda: spark.createDataFrame([(q / 10,) for q in range(1, 10)],
                                       "q double"),
         lambda syn, df: {r["q"]: r["quantile"] for r in
                          pq.query_latest_quantile(df_syn, df).collect()}),
        ("equiwidth", dict(lower=0.0, upper=100.0, num_buckets=20),
         lambda: spark.createDataFrame([(5.0, 55.0), (0.0, 100.0)],
                                       "lo double, hi double"),
         lambda syn, df: {(r["lo"], r["hi"]): r["est_count"] for r in
                          pq.query_latest_range(df_syn, df).collect()}),
    ]:
        col = "user_id" if kind == "cuckoo" else "value"
        spec = SynopsisSpec(kind=kind, params=params, column=col,
                            ts_column="ts", window=Tumbling("30 day"))
        df_syn = build_batch(events, spec)
        row = (df_syn.orderBy(F.col("window_end").desc()).limit(1)
               .collect())[0]
        syn = Synopsis.from_bytes(bytes(row["state"]))
        got = answer(syn, mk_q())
        if kind == "cuckoo":
            ref = syn.query(np.arange(120))
            assert all(got[k] == bool(ref[k]) for k in range(120))
        elif kind == "ddsketch":
            for q in got:
                assert got[q] == syn.quantile(q)
        else:
            for (lo, hi) in got:
                assert np.isclose(got[(lo, hi)], syn.range_query(lo, hi),
                                  rtol=1e-12)


def test_stream_quantile_and_membership_kinds(spark, tmp_path):
    """QueryLatestStream serves DDSketch quantile and Cuckoo membership
    query streams: codegen 'auto' == forced 'python', and both equal the
    snapshot kernel."""
    from condor_spark import fixtures
    from condor_spark.engine.streaming import (QueryLatestStream,
                                               StreamingSynopsisJob)
    from condor_spark.synopsis.base import Synopsis

    events = spark.read.parquet(f"{SF}/events.parquet")

    # ---- quantile stream over a DDSketch job -----------------------------
    spec = SynopsisSpec(kind="ddsketch",
                        params=dict(relative_accuracy=0.02),
                        column="value", ts_column="ts", window=Tumbling("30 day"))
    job = StreamingSynopsisJob(spec, sink_dir=str(tmp_path / "dsink"),
                               watermark_delay="1 hour")
    src = str(tmp_path / "dsrc")
    fixtures.replay_in_order(spark, events.filter(F.col("value") > 0),
                             src, n_chunks=2)
    job.start(spark, src, str(tmp_path / "dckpt")).awaitTermination(300)
    qs = [0.1, 0.5, 0.9, 0.99]
    qdf = spark.createDataFrame([(q,) for q in qs], "q double")
    answers = {}
    for mode in ("auto", "python"):
        ql = QueryLatestStream(job, out_dir=str(tmp_path / f"dans_{mode}"),
                               key_column="q", answer_mode=mode)
        ql.process_batch(qdf, 0)
        answers[mode] = sorted(
            (r["key"], r["est_value"]) for r in ql.read_answers(spark).collect())
    assert answers["auto"] == answers["python"] and len(answers["auto"]) == 4
    state = job.read_state_df(spark)
    syn = Synopsis.from_bytes(bytes(
        state.orderBy(F.col("window_end").desc()).limit(1).collect()[0]["state"]))
    got = dict(answers["auto"])
    assert all(got[str(q)] == syn.quantile(q) for q in qs)

    # ---- membership stream over a Cuckoo job ------------------------------
    spec = SynopsisSpec(kind="cuckoo",
                        params=dict(bucket_size=4, num_buckets=1024, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling("30 day"))
    job = StreamingSynopsisJob(spec, sink_dir=str(tmp_path / "csink"),
                               watermark_delay="1 hour")
    src = str(tmp_path / "csrc")
    fixtures.replay_in_order(spark, events, src, n_chunks=2)
    job.start(spark, src, str(tmp_path / "cckpt")).awaitTermination(300)
    kdf = spark.createDataFrame([(k,) for k in range(80)], "key long")
    answers = {}
    for mode in ("auto", "python"):
        ql = QueryLatestStream(job, out_dir=str(tmp_path / f"cans_{mode}"),
                               key_column="key", answer_mode=mode)
        ql.process_batch(kdf, 0)
        answers[mode] = sorted(
            (r["key"], r["est_count"]) for r in ql.read_answers(spark).collect())
    assert answers["auto"] == answers["python"] and len(answers["auto"]) == 80
    syn = Synopsis.from_bytes(bytes(
        job.read_state_df(spark).orderBy(F.col("window_end").desc())
        .limit(1).collect()[0]["state"]))
    ref = syn.query(np.arange(80))
    got = dict(answers["auto"])
    assert all(got[str(k)] == int(ref[k]) for k in range(80))


def test_stream_range_kind(spark, tmp_path):
    """QueryLatestStream serves two-parameter equi-width RANGE streams
    (key_column=('lo','hi')): codegen 'auto' == forced 'python' == kernel,
    including a pre-snapshot parked batch."""
    from condor_spark import fixtures
    from condor_spark.engine.streaming import (QueryLatestStream,
                                               StreamingSynopsisJob)
    from condor_spark.synopsis.base import Synopsis

    events = spark.read.parquet(f"{SF}/events.parquet")
    spec = SynopsisSpec(kind="equiwidth",
                        params=dict(lower=0.0, upper=500.0, num_buckets=20),
                        column="value", ts_column="ts", window=Tumbling("30 day"))
    job = StreamingSynopsisJob(spec, sink_dir=str(tmp_path / "sink"),
                               watermark_delay="1 hour")
    ranges = [(0.0, 500.0), (12.5, 237.5), (-10.0, 50.0), (450.0, 900.0)]
    rdf = spark.createDataFrame(ranges, "lo double, hi double")

    # pre-snapshot batch parks with BOTH columns, then is adopted
    ql0 = QueryLatestStream(job, out_dir=str(tmp_path / "ans_park"),
                            key_column=("lo", "hi"))
    ql0.process_batch(rdf, 0)

    src = str(tmp_path / "src")
    fixtures.replay_in_order(spark, events, src, n_chunks=2)
    job.start(spark, src, str(tmp_path / "ckpt")).awaitTermination(300)

    syn = Synopsis.from_bytes(bytes(
        job.read_state_df(spark).orderBy(F.col("window_end").desc())
        .limit(1).collect()[0]["state"]))
    answers = {}
    for mode in ("auto", "python"):
        ql = QueryLatestStream(job, out_dir=str(tmp_path / f"ans_{mode}"),
                               key_column=("lo", "hi"), answer_mode=mode)
        ql.process_batch(rdf, 0)
        answers[mode] = sorted(
            (r["key"], r["est_value"]) for r in ql.read_answers(spark).collect())
    assert answers["auto"] == answers["python"] and len(answers["auto"]) == 4
    got = dict(answers["auto"])
    for lo, hi in ranges:
        assert np.isclose(got[f"{lo}:{hi}"], syn.range_query(lo, hi),
                          rtol=1e-12)

    # the parked batch is answered by the first post-snapshot batch
    ql0.process_batch(rdf.limit(0), 1)
    parked = ql0.read_answers(spark).toPandas()
    assert len(parked) == 4 and (parked["est_value"] >= 0).all()


def test_query_latest_range_4lt(spark, tmp_path):
    """A 4LT-compressed snapshot answers range queries through its lossy
    decoded view — query_latest_range and the range STREAM both equal
    range_query_compressed."""
    from condor_spark import fixtures
    from condor_spark.engine.streaming import (QueryLatestStream,
                                               StreamingSynopsisJob)
    from condor_spark.synopsis.base import Synopsis

    events = spark.read.parquet(f"{SF}/events.parquet")
    spec = SynopsisSpec(kind="equiwidth4lt",
                        params=dict(lower=0.0, upper=500.0, num_buckets=16),
                        column="value", ts_column="ts", window=Tumbling("30 day"))
    syn_df = build_batch(events, spec)
    syn = Synopsis.from_bytes(bytes(
        syn_df.orderBy(F.col("window_end").desc()).limit(1)
        .collect()[0]["state"]))
    ranges = [(0.0, 500.0), (31.25, 250.0), (100.0, 300.0), (-5.0, 62.5)]
    rdf = spark.createDataFrame(ranges, "lo double, hi double")
    got = {(r["lo"], r["hi"]): r["est_count"] for r in
           pq.query_latest_range(syn_df, rdf).collect()}
    for lo, hi in ranges:
        assert np.isclose(got[(lo, hi)], syn.range_query_compressed(lo, hi),
                          rtol=1e-12), (lo, hi)

    job = StreamingSynopsisJob(spec, sink_dir=str(tmp_path / "sink"),
                               watermark_delay="1 hour")
    src = str(tmp_path / "src")
    fixtures.replay_in_order(spark, events, src, n_chunks=2)
    job.start(spark, src, str(tmp_path / "ckpt")).awaitTermination(300)
    answers = {}
    for mode in ("auto", "python"):
        ql = QueryLatestStream(job, out_dir=str(tmp_path / f"ans_{mode}"),
                               key_column=("lo", "hi"), answer_mode=mode)
        ql.process_batch(rdf, 0)
        answers[mode] = sorted(
            (r["key"], r["est_value"]) for r in ql.read_answers(spark).collect())
    assert answers["auto"] == answers["python"] and len(answers["auto"]) == 4
    ssyn = Synopsis.from_bytes(bytes(
        job.read_state_df(spark).orderBy(F.col("window_end").desc())
        .limit(1).collect()[0]["state"]))
    got = dict(answers["auto"])
    for lo, hi in ranges:
        assert np.isclose(got[f"{lo}:{hi}"],
                          ssyn.range_query_compressed(lo, hi), rtol=1e-12)
