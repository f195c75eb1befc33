"""Synthetic generator sources: distribution sanity, determinism across
partitionings, and stream wiring (SURVEY §2.4 source inventory)."""

import numpy as np
from pyspark.sql import functions as F

from condor_spark.engine import sources as S


def test_uniform_key_distribution_and_determinism(spark):
    df = S.with_uniform_key(spark.range(0, 200_000, 1, 8).withColumnRenamed("id", "value"))
    pdf = df.groupBy("key").count().toPandas()
    assert len(pdf) == 1001
    mean = 200_000 / 1001
    assert (np.abs(pdf["count"] - mean) < 6 * np.sqrt(mean)).all()
    vals = df.filter(F.col("value") < 10).orderBy("value").toPandas()
    vals2 = (S.with_uniform_key(spark.range(0, 10, 1, 2).withColumnRenamed("id", "value"))
             .orderBy("value").toPandas())
    assert vals[["key", "val"]].reset_index(drop=True).equals(
        vals2[["key", "val"]].reset_index(drop=True))  # partition-invariant


def test_normal_key_moments(spark):
    df = S.with_normal_key(spark.range(0, 200_000).withColumnRenamed("id", "value"),
                           mean=500.0, std=100.0)
    got = df.agg(F.mean("key"), F.stddev("key")).first()
    assert abs(got[0] - 500.0) < 1.5
    assert abs(got[1] - 100.0) < 1.5


def test_ip_key_range(spark):
    df = S.with_ip_key(spark.range(0, 100_000).withColumnRenamed("id", "value"))
    got = df.agg(F.min("key"), F.max("key"), F.mean("key")).first()
    assert got[0] >= 0 and got[1] < (1 << 31) - 1
    assert abs(got[2] / (1 << 30) - 1.0) < 0.02  # mean ~ range/2


def test_zipf_table_distribution_and_partition_invariance(spark):
    t8 = S.zipf_table(spark, 100_000, key_range=1000, s=1.1, num_partitions=8)
    t2 = S.zipf_table(spark, 100_000, key_range=1000, s=1.1, num_partitions=2)
    p8 = t8.orderBy("idx").toPandas()
    p2 = t2.orderBy("idx").toPandas()
    assert p8.equals(p2)  # same table at any parallelism
    freq = p8["key"].value_counts()
    cdf = S._zipf_cdf(1000, 1.1)
    pmf0 = cdf[0]
    # head frequency tracks the pmf (rank-1 mass is ~8% at s=1.1)
    assert abs(freq.get(0, 0) / 100_000 - pmf0) < 0.01
    assert freq.get(0, 0) > 2.0 * freq.get(4, 1)  # heavy head vs rank 5


def test_stream_wiring(spark, tmp_path):
    st = S.uniform_stream(spark, rows_per_sec=1000)
    assert st.isStreaming
    assert {"timestamp", "key", "val"} <= set(st.columns)

    # zipf file-replay end-to-end
    src = str(tmp_path / "zipf")
    S.zipf_table(spark, 5_000, num_partitions=4).write.parquet(src)
    stream = S.zipf_replay(spark, src, max_files_per_trigger=2)
    assert stream.isStreaming
    q = (stream.groupBy("key").count()
         .writeStream.format("memory").queryName("zipf_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT sum(count) FROM zipf_counts").first()[0]
    assert got == 5_000


def test_replay_proportional_equal_time_spans(spark, tmp_path):
    """Proportional replay: files cover equal EVENT-TIME spans, so row
    counts per file track the data's temporal density, not a fixed size."""
    import glob
    import os

    import pandas as pd
    from condor_spark import fixtures

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "prop")
    fixtures.replay_proportional(spark, events, src, n_chunks=6)
    files = sorted(glob.glob(os.path.join(src, "*.parquet")),
                   key=os.path.getmtime)
    assert 2 <= len(files) <= 6  # empty spans are skipped
    spans = []
    total = 0
    for f in files:
        pdf = pd.read_parquet(f)
        total += len(pdf)
        spans.append((pdf["ts"].min(), pdf["ts"].max()))
    assert total == events.count()
    # files replay in event-time order: span starts are non-decreasing
    assert all(spans[i][0] <= spans[i + 1][0] for i in range(len(spans) - 1))
    # equal-span cut: every file's width is <= the global span / chunks + slack
    lo = min(s[0] for s in spans)
    hi = max(s[1] for s in spans)
    width = (hi - lo) / 6
    assert all((s[1] - s[0]) <= width * 1.05 for s in spans[:-1])


def test_replay_unordered_bounded_disorder(spark, tmp_path):
    """Unordered replay: arrival position lags event time by at most
    max_delay — and a stateful stream with watermark >= max_delay still
    reproduces the exact batch windows."""
    import pandas as pd
    from condor_spark import fixtures
    from condor_spark.engine.builder import SynopsisSpec, build_batch
    from condor_spark.engine.stateful import StatefulSynopsisStream
    from condor_spark.engine.windows import Tumbling

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    cutoff = pd.Timestamp(max_ts) + pd.Timedelta(days=1)
    src = str(tmp_path / "unord")
    fixtures.replay_unordered(
        spark, events, src, n_chunks=5, max_delay="2 hours",
        flush_ts=[cutoff + pd.Timedelta(days=40),
                  cutoff + pd.Timedelta(days=80)])

    # disorder bound: within the written arrival order, event time never
    # runs more than max_delay behind the running max
    import glob
    import os
    files = sorted(glob.glob(os.path.join(src, "*.parquet")),
                   key=os.path.getmtime)[:5]
    arr = pd.concat([pd.read_parquet(f) for f in files])
    ts = arr["ts"].to_numpy()
    lag = (np.maximum.accumulate(ts) - ts).astype("timedelta64[us]")
    assert lag.max() <= np.timedelta64(2 * 3600 * 1_000_000, "us")
    assert lag.max() > np.timedelta64(0, "us")  # it IS out of order

    spec = SynopsisSpec(kind="hll", params=dict(log_reg_num=8, seed=7),
                        column="event_id", ts_column="ts",
                        window=Tumbling("1 day"))
    job = StatefulSynopsisStream(spec, watermark_delay="2 hours")
    q = job.start(spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt"),
                  max_files_per_trigger=1)
    q.awaitTermination(300)
    got = {r["window_start"]: r["n"]
           for r in spark.read.parquet(str(tmp_path / "out"))
           .filter(F.col("window_end") <= F.lit(cutoff)).collect()}
    want = {r["window_start"]: r["n"]
            for r in build_batch(events, spec).collect()}
    assert got == want
