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
