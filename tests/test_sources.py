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
