"""Skew handling: salted repartitioning balance + tree-merge equivalence."""

import pyspark.sql.functions as F
import pytest

from condor_spark import fixtures
from condor_spark.engine import evaluate as ev
from condor_spark.engine.builder import SynopsisSpec, build_batch
from condor_spark.engine.skew import (build_batch_tree, partition_histogram,
                                      salted_repartition)
from condor_spark.engine.windows import Sliding, Tumbling

SF = "/root/testdata/sf0.001"


def test_salted_repartition_balances_hot_codec(spark):
    """80% of fixture clips are pcm_s16le; a plain hash repartition on codec
    puts them all in one task, the salted one spreads them ~uniformly."""
    clips = fixtures.audio_clips(spark, 2000, num_partitions=8).select(
        "clip_id", "codec", "sr_hz")

    plain = partition_histogram(clips.repartition(8, "codec"))
    salted = partition_histogram(salted_repartition(clips, ["codec"], 8, 8))

    assert max(plain) >= 0.7 * 2000          # the hot-key pile-up
    assert max(salted) <= 2 * (2000 / 8)     # defused
    assert sum(salted) == 2000


def test_salt_is_deterministic(spark):
    clips = fixtures.audio_clips(spark, 500, num_partitions=4).select(
        "clip_id", "codec")
    a = partition_histogram(salted_repartition(clips, ["codec"], 8, 8))
    b = partition_histogram(salted_repartition(clips, ["codec"], 8, 8))
    assert a == b


@pytest.mark.parametrize("kind,params,col", [
    ("countmin", dict(width=2048, height=5, seed=7), "user_id"),
    ("hll", dict(log_reg_num=10, seed=7), "user_id"),
    ("bottomk", dict(sample_size=32, seed=7), "user_id"),
])
def test_tree_merge_identical_rows(spark, kind, params, col):
    """Two-level tree merge must produce byte-identical windowed synopses to
    the flat merge (deterministic lane ordering) — the N-vs-4N output-row
    parity property extended to the merge topology."""
    df = spark.read.parquet(f"{SF}/events.parquet").repartition(8)
    spec = SynopsisSpec(kind=kind, params=params, column=col,
                        ts_column="ts", window=Tumbling("1 day"))
    flat = {(str(r["window_start"]), r["stratum"]): (bytes(r["state"]), r["n"])
            for r in build_batch(df, spec).collect()}
    tree = {(str(r["window_start"]), r["stratum"]): (bytes(r["state"]), r["n"])
            for r in build_batch_tree(df, spec, fanout=3).collect()}
    assert flat == tree


def test_tree_merge_sliding_estimates(spark):
    df = spark.read.parquet(f"{SF}/events.parquet")
    spec = SynopsisSpec(kind="ddsketch", params=dict(relative_accuracy=0.01),
                        column="value", ts_column="ts",
                        window=Sliding("2 days", "1 day"))
    flat = ev.quantile_estimates(build_batch(df, spec), [0.5, 0.9])
    tree = ev.quantile_estimates(build_batch_tree(df, spec, fanout=4), [0.5, 0.9])
    f = sorted(map(tuple, flat.collect()))
    t = sorted(map(tuple, tree.collect()))
    assert f == t
