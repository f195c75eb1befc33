"""The user-defined-synopsis extension story (the reference's headline API
claim, README.md:11, validated there by adapting Yahoo's HLL —
``benchmark/.../efficiency/yahoo/YahooHLLOnCondor.java``): registering a new
kernel makes every engine strategy (windows, stratification, two-phase
merge, evaluation) work with it, no engine changes."""

import numpy as np
import pyspark.sql.functions as F
import pandas as pd

from condor_spark.synopsis.base import Synopsis, Trait, register
from condor_spark.engine import evaluate as ev
from condor_spark.engine.builder import SynopsisSpec, build_batch
from condor_spark.engine.windows import Tumbling


@register
class MinMaxSum(Synopsis):
    """Tiny user-defined synopsis: exact min/max/sum/count."""

    KIND = "user_minmaxsum"
    TRAIT = Trait.INVERTIBLE

    def __init__(self):
        super().__init__()
        self.mn = float("inf")
        self.mx = float("-inf")
        self.total = 0.0
        self.n_processed = 0

    def update_batch(self, values, ts=None):
        x = np.asarray(values, dtype=np.float64)
        if x.size:
            self.mn = min(self.mn, float(x.min()))
            self.mx = max(self.mx, float(x.max()))
            self.total += float(x.sum())
        self.n_processed += int(x.size)

    def merge(self, other):
        self._check_same(other)
        self.mn = min(self.mn, other.mn)
        self.mx = max(self.mx, other.mx)
        self.total += other.total
        self.n_processed += other.n_processed
        return self


def test_custom_synopsis_through_engine(spark):
    import sys
    from pyspark import cloudpickle
    # ship the user class by value (the interactive-session equivalent of
    # packaging it in --py-files)
    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    spec = SynopsisSpec(kind="user_minmaxsum", column="value",
                        ts_column="ts", window=Tumbling("1 day"),
                        synopsis_cls=MinMaxSum)
    syn = build_batch(df, spec)

    def fn(s, row):
        return pd.DataFrame({"mn": [round(s.mn, 4)], "mx": [round(s.mx, 4)],
                             "total": [round(s.total, 4)], "cnt": [s.n_processed]})

    got = {r["window_start"].replace(tzinfo=None): (r["mn"], r["mx"], r["total"], r["cnt"])
           for r in ev.apply_per_window(
               syn, fn, "window_start timestamp, mn double, mx double, "
                        "total double, cnt long").collect()}
    exact = (df.groupBy(F.window("ts", "1 day").alias("w"))
             .agg(F.round(F.min("value"), 4).alias("mn"),
                  F.round(F.max("value"), 4).alias("mx"),
                  F.round(F.sum("value"), 4).alias("total"),
                  F.count("*").alias("cnt"))
             .select(F.col("w.start").alias("s"), "mn", "mx", "total", "cnt")
             .collect())
    assert got  # windows exist
    for r in exact:
        g = got[r["s"].replace(tzinfo=None)]
        assert g[0] == r["mn"] and g[1] == r["mx"] and g[3] == r["cnt"]
        assert abs(g[2] - r["total"]) < 1e-6


def test_sliding_via_inversion_matches_slices(spark):
    """Prefix-difference sliding (invertible eviction) == slice-composed
    sliding for an invertible kind (CountMin)."""
    from condor_spark.engine.windows import Sliding

    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    params = dict(width=2048, height=5, seed=7)
    # slice synopses = tumbling windows at the slide granularity
    slices = build_batch(df, SynopsisSpec(
        kind="countmin", params=params, column="user_id", ts_column="ts",
        window=Tumbling("6 hours")))
    inv = ev.sliding_via_inversion(slices, size_slices=4)  # 4 slices = 1 day
    ref = build_batch(df, SynopsisSpec(
        kind="countmin", params=params, column="user_id", ts_column="ts",
        window=Sliding("1 day", "6 hours")))
    keys = list(range(150))
    # compare on windows both strategies produce (inversion emits one window
    # per slice-end; slice composition also emits leading partial windows)
    a = {(str(r["window_end"]), r["key"]): r["est_count"]
         for r in ev.frequency_estimates(inv, keys).collect()}
    b = {(str(r["window_end"]), r["key"]): r["est_count"]
         for r in ev.frequency_estimates(ref, keys).collect()}
    shared = set(a) & set(b)
    assert len(shared) > 100
    assert all(a[k] == b[k] for k in shared)


def test_equidepth_from_ddsketch(spark):
    from condor_spark.engine.windows import GlobalWindow

    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    spec = SynopsisSpec(kind="ddsketch", params=dict(relative_accuracy=0.01),
                        column="value", window=GlobalWindow())
    syn = build_batch(df.filter("value > 0"), spec)
    rows = ev.equidepth_from_ddsketch(syn, 10).collect()
    assert len(rows) == 10
    vals = np.array([r["value"] for r in
                     df.filter("value > 0").select("value").collect()])
    bounds = [rows[0]["lo"]] + [r["hi"] for r in sorted(rows, key=lambda r: r["bucket"])]
    counts, _ = np.histogram(vals, bins=bounds)
    assert (np.abs(counts / vals.size - 0.1) < 0.04).all()
