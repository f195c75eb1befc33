"""Table-format abstraction: parquet fallback mode (no Iceberg jar here)."""

from condor_spark.engine.catalog import Catalog, iceberg_available


def test_catalog_roundtrip(spark, tmp_path):
    cat = Catalog(spark, root=str(tmp_path))
    assert not cat.is_iceberg  # sandbox has no iceberg runtime jar
    df = spark.range(100).withColumnRenamed("id", "x")
    cat.write(df, "t")
    assert cat.read("t").count() == 100
    cat.write(df, "t", mode="append")
    assert cat.read("t").count() == 200


def test_catalog_stream(spark, tmp_path):
    cat = Catalog(spark, root=str(tmp_path))
    cat.write(spark.range(50).withColumnRenamed("id", "x"), "src")
    stream = cat.read_stream("src", max_files_per_trigger=1)
    q = cat.write_stream(stream, "dst", str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert cat.read("dst").count() == 50


def test_iceberg_detection_is_false_here(spark):
    assert iceberg_available(spark) is False


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-located bucketed join — the 100 TB shuffle-elimination primitive:
    both sides bucketed by the join key plan a SortMergeJoin with ZERO
    Exchange, and results match the plain (shuffling) join exactly."""
    from pyspark.sql import functions as F

    cat = Catalog(spark, root=str(tmp_path), namespace="buck1")
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    dim = (ev.groupBy("user_id").agg(F.count("*").alias("total"))
           .withColumn("segment", (F.col("user_id") % 7).cast("int")))
    cat.write_bucketed(ev, "events_b", ["user_id"], 8, sort_cols=["user_id"])
    cat.write_bucketed(dim, "users_b", ["user_id"], 8, sort_cols=["user_id"])

    a = cat.read_bucketed("events_b")
    b = cat.read_bucketed("users_b")
    # at sf0.01 Spark rightly broadcasts the tiny dim; hint the merge join
    # to exercise the 100 TB shape (where neither side broadcasts)
    joined = (a.join(b.hint("merge"), "user_id")
              .groupBy("segment").agg(F.sum("value").alias("sv"),
                                      F.count("*").alias("c")))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    # the user_id join needs NO exchange; only the tiny segment agg shuffles
    assert plan.count("Exchange") == 1, plan

    plain = (ev.join(dim.hint("merge"), "user_id")
             .groupBy("segment").agg(F.sum("value").alias("sv"),
                                     F.count("*").alias("c")))
    got = {r["segment"]: (round(r["sv"], 6), r["c"]) for r in joined.collect()}
    want = {r["segment"]: (round(r["sv"], 6), r["c"]) for r in plain.collect()}
    assert got == want


def test_bucketed_groupby_has_no_exchange(spark, tmp_path):
    """Aggregation keyed on the bucket column reads each bucket co-located —
    no Exchange before the final agg."""
    cat = Catalog(spark, root=str(tmp_path), namespace="buck2")
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    cat.write_bucketed(ev, "events_b2", ["user_id"], 8)
    agg = cat.read_bucketed("events_b2").groupBy("user_id").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == ev.select("user_id").distinct().count()
