"""Dyadic Count-Min hierarchy (engine/dyadic.py): decomposition
correctness (exhaustive vs brute force), heavy-hitter guarantees, quantile
descent, kernel/SQL bucket parity, and the exactness promotion the driver
queries rely on."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from condor_spark.engine import dyadic
from condor_spark.engine.windows import Tumbling
from condor_spark.synopsis import make

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def small(spark):
    """Synthetic keyed table with a skewed head (deterministic)."""
    rng = np.random.default_rng(42)
    keys = np.concatenate([
        rng.integers(0, 64, 3000),          # uniform background
        np.repeat([3, 17, 42], [400, 300, 250]),  # heavy keys
    ]).astype(np.int64)
    rng.shuffle(keys)
    df = spark.createDataFrame([(int(k),) for k in keys], "key long")
    return df, keys


@pytest.fixture(scope="module")
def dy6(spark, small):
    df, _ = small
    return dyadic.build_dyadic_latest(df, "key", bits=6, height=5, seed=7)


def test_range_counts_exhaustive_vs_bruteforce(spark, small, dy6):
    """Every (lo, hi) over the bits=6 domain, arrow impl — the closed-form
    take rules must reproduce exact counts at exactness sizing (and this
    exhaustively validates no decomposition node is dropped/double-counted,
    including singletons, empty and clamped ranges)."""
    _, keys = small
    ranges = [(lo, hi) for lo in range(64) for hi in range(lo, 64)]
    ranges += [(5, 4), (63, 0), (-3, 7), (60, 99)]  # empty + clamped
    qdf = spark.createDataFrame(ranges, "lo long, hi long")
    got = {(r["lo"], r["hi"]): r["est_count"]
           for r in dyadic.range_count_queries(qdf, "lo", "hi", dy6).collect()}
    for lo, hi in ranges:
        clo, chi = max(lo, 0), min(hi, 63)
        exact = int(((keys >= clo) & (keys <= chi)).sum())
        assert got[(lo, hi)] == exact, (lo, hi)


def test_range_sql_impl_matches_arrow(spark, small, dy6):
    """The pure-JVM form (staged splitmix buckets + one broadcast + one
    gathering Project) is bit-identical to the arrow kernel — transitively
    proves splitmix64_expr/pow2-mask bucket parity with
    DyadicCountMin._cols."""
    ranges = [(0, 63), (1, 1), (2, 2), (3, 47), (17, 18), (5, 4), (0, 0),
              (62, 63), (31, 32), (8, 55)]
    qdf = spark.createDataFrame(ranges, "lo long, hi long")
    a = dyadic.range_count_queries(qdf, "lo", "hi", dy6, impl="arrow")
    s = dyadic.range_count_queries(qdf, "lo", "hi", dy6, impl="sql")
    ga = {(r["lo"], r["hi"]): r["est_count"] for r in a.collect()}
    gs = {(r["lo"], r["hi"]): r["est_count"] for r in s.collect()}
    assert ga == gs


def test_range_overestimates_only_at_tiny_width(spark, small):
    """The CM guarantee survives the decomposition: under heavy collisions
    (width 16 per level) every range estimate is >= exact, never under."""
    df, keys = small
    dy = dyadic.build_dyadic_latest(df, "key", bits=6, height=3, seed=7,
                                    oversample=1, min_width=16, max_width=16)
    ranges = [(lo, hi) for lo in range(0, 64, 5) for hi in range(lo, 64, 7)]
    qdf = spark.createDataFrame(ranges, "lo long, hi long")
    got = {(r["lo"], r["hi"]): r["est_count"]
           for r in dyadic.range_count_queries(qdf, "lo", "hi", dy).collect()}
    assert all(got[(lo, hi)] >= int(((keys >= lo) & (keys <= hi)).sum())
               for lo, hi in ranges)


def test_heavy_hitters_exact_and_no_false_negatives(spark, small, dy6):
    df, keys = small
    vals, counts = np.unique(keys, return_counts=True)
    thr = 200
    exact = {int(k): int(c) for k, c in zip(vals, counts) if c >= thr}
    got = {r["key"]: r["est_count"]
           for r in dyadic.heavy_hitters(spark, dy6, thr).collect()}
    assert got == exact  # exactness sizing: estimates are the true counts
    assert set(got) == {3, 17, 42}
    # tiny width: still NO false negatives (CM never underestimates), and
    # every reported estimate >= the true count
    dy_tiny = dyadic.build_dyadic_latest(df, "key", bits=6, height=2, seed=7,
                                         oversample=1, min_width=16,
                                         max_width=16)
    got_t = {r["key"]: r["est_count"]
             for r in dyadic.heavy_hitters(spark, dy_tiny, thr).collect()}
    assert set(exact) <= set(got_t)
    assert all(got_t[k] >= exact.get(k, 0) for k in got_t)


def test_heavy_hitters_empty_result(spark, dy6):
    out = dyadic.heavy_hitters(spark, dy6, threshold=10**9)
    assert out.count() == 0 and out.columns == ["key", "est_count"]
    with pytest.raises(ValueError):
        dyadic.heavy_hitters(spark, dy6, threshold=0)


def test_quantiles_exact(spark, small, dy6):
    _, keys = small
    sv = np.sort(keys)
    qs = [0.001, 0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    qdf = spark.createDataFrame([(float(x),) for x in qs], "q double")
    for impl in ("arrow", "sql"):
        got = {r["q"]: r["est_key"]
               for r in dyadic.quantile_queries(qdf, "q", dy6,
                                                impl=impl).collect()}
        for x in qs:
            t = max(1, int(np.ceil(x * len(sv))))
            assert got[x] == sv[t - 1], (impl, x)


def test_build_partition_invariance(spark, small):
    """Same snapshot cells whatever the input partitioning (mergeable CM
    partials; communication-free pre-agg then one blob shuffle)."""
    df, _ = small
    d1 = dyadic.build_dyadic_latest(df.repartition(1), "key", bits=6)
    d7 = dyadic.build_dyadic_latest(df.repartition(7), "key", bits=6)
    assert d1.levels == d7.levels and d1.n == d7.n


def test_windowed_build_latest_snapshot(spark):
    """Tumbling build answers against the NEWEST window only (queryLatest
    semantics) — verified against exact counts of that window at sf0.001."""
    df = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("vkey", F.floor("value").cast("long")))
    dy = dyadic.build_dyadic_latest(df, "vkey", bits=10, height=5, seed=7,
                                    ts_column="ts", window=Tumbling("1 day"))
    pdf = df.select("ts", "vkey").toPandas()
    wb = pdf["ts"].dt.floor("D")
    sub = pdf[wb == wb.max()]["vkey"].to_numpy()
    assert dy.n == len(sub)
    ranges = [(0, 1023), (0, 127), (100, 421), (37, 201)]
    qdf = spark.createDataFrame(ranges, "lo long, hi long")
    got = {(r["lo"], r["hi"]): r["est_count"]
           for r in dyadic.range_count_queries(qdf, "lo", "hi", dy).collect()}
    assert all(got[(lo, hi)] == int(((sub >= lo) & (sub <= hi)).sum())
               for lo, hi in ranges)


def test_dyadiccm_kernel_props():
    s = make("dyadiccm", width=256, height=4, seed=11)
    s.update_batch(np.array([5, 5, 9, 300, -2]))
    assert s.query(np.array([5]))[0] >= 2  # overestimate-only
    blob = s.to_bytes()
    from condor_spark.synopsis.base import Synopsis
    s2 = Synopsis.from_bytes(blob)
    assert np.array_equal(s2.query(np.arange(-5, 310)),
                          s.query(np.arange(-5, 310)))
    s2.merge(s)
    assert s2.n_processed == 10
    with pytest.raises(ValueError):
        make("dyadiccm", width=100)  # pow-2 guard


def test_empty_input_builds_zero_snapshot(spark):
    empty = spark.createDataFrame([], "key long")
    dy = dyadic.build_dyadic_latest(empty, "key", bits=4)
    assert dy.n == 0
    qdf = spark.createDataFrame([(0, 15), (3, 3)], "lo long, hi long")
    got = dyadic.range_count_queries(qdf, "lo", "hi", dy).collect()
    assert all(r["est_count"] == 0 for r in got)
    assert dyadic.heavy_hitters(spark, dy, 1).count() == 0


def test_out_of_domain_key_fails_loudly(spark):
    """Keys outside [0, 2**bits) would silently vanish from range counts
    and heavy hitters (still counted in n) — the build must raise."""
    df = spark.createDataFrame([(1,), (100,)], "key long")
    with pytest.raises(Exception, match="out of domain"):
        dyadic.build_dyadic_latest(df, "key", bits=4)
    neg = spark.createDataFrame([(-1,), (3,)], "key long")
    with pytest.raises(Exception, match="out of domain"):
        dyadic.build_dyadic_latest(neg, "key", bits=4)


def test_kernel_count_fold_matches_per_level_hashing():
    """The bincount+tree-fold update (and the big-bits no-table fallback)
    produce grids identical to direct per-level hashing of every value —
    the optimization must be invisible."""
    from condor_spark.synopsis.hashing import hash64_multi

    rng = np.random.default_rng(9)
    x = rng.integers(0, 1024, 50_000)
    for bits, kw in ((10, {}), (18, {})):  # table path / fallback path
        dom = 1 << bits
        xs = x % dom
        s = make("dyadic", bits=bits, **kw)
        s.update_batch(xs)
        ref = make("dyadic", bits=bits, **kw)
        for l, w in enumerate(ref.widths):
            h = hash64_multi(xs >> l, ref._row_seeds)
            cols = (h & np.uint64(w - 1)).astype(np.int64)
            for r in range(ref.height):
                np.add.at(ref.grids[l][r], cols[r], 1)
        assert all(np.array_equal(a, b) for a, b in zip(s.grids, ref.grids)), bits
    # decrement is the exact inverse
    s.decrement_batch(xs[:100])
    t = make("dyadic", bits=18)
    t.update_batch(xs[100:])
    assert all(np.array_equal(a, b) for a, b in zip(s.grids, t.grids))


def test_kernel_tiny_group_path_matches_bincount():
    """update_precomputed's small-group fallback (n*4 < 2^bits hashes the
    few values instead of allocating a 2^bits count vector) must land the
    same grids as the count-fold path."""
    rng = np.random.default_rng(3)
    x = rng.integers(0, 4096, 2000).astype(np.int64)
    a = make("dyadic", bits=12)
    pre = a.precompute(x)
    for lo in range(0, 2000, 50):       # 50-row groups: tiny path
        a.update_precomputed(pre, lo, min(lo + 50, 2000))
    b = make("dyadic", bits=12)
    b.update_batch(x)                   # one bincount
    assert all(np.array_equal(g, h) for g, h in zip(a.grids, b.grids))
    assert a.n_processed == b.n_processed == 2000


def test_query_stream_dyadic_auto_equals_sql(spark, tmp_path):
    """QueryLatestStream kind=dyadic: the arrow kernel (auto) and the
    pure-JVM twin (sql) answer a (lo, hi) stream identically, and both
    match the kernel's own range math on the newest window."""
    import pandas as pd

    from condor_spark import fixtures
    from condor_spark.engine.streaming import (QueryLatestStream,
                                               StreamingSynopsisJob)
    from condor_spark.engine.windows import Tumbling

    rng = np.random.default_rng(5)
    n = 4000
    pdf = pd.DataFrame({
        "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 3 * 86400, n), unit="s"),
        "key": rng.integers(0, 256, n),
    })
    df = spark.createDataFrame(pdf)
    base = str(tmp_path)
    fixtures.replay_in_order(spark, df, f"{base}/src", n_chunks=3)
    spec = dyadic.dyadic_spec("key", bits=8, ts_column="ts",
                              window=Tumbling("1 day"))
    job = StreamingSynopsisJob(spec, sink_dir=f"{base}/sink",
                               watermark_delay="1 hour")
    job.start(spark, f"{base}/src", f"{base}/ckpt").awaitTermination()

    qdf = spark.createDataFrame(
        [(0, lo, hi) for lo in (0, 7, 100) for hi in (hi0 for hi0 in (5, 63, 255))],
        "q_batch long, lo long, hi long")
    answers = {}
    for mode in ("auto", "sql"):
        fixtures.replay_in_order(spark, qdf, f"{base}/qsrc_{mode}",
                                 n_chunks=1, ts_col="q_batch")
        ql = QueryLatestStream(job, out_dir=f"{base}/ans_{mode}",
                               key_column=("lo", "hi"), answer_mode=mode)
        ql.start(spark, f"{base}/qsrc_{mode}",
                 f"{base}/qck_{mode}").awaitTermination()
        answers[mode] = {r["key"]: r["est_count"]
                         for r in ql.read_answers(spark).collect()}
    assert answers["auto"] == answers["sql"] and len(answers["auto"]) == 9
    # both match exact counts of the newest window (exactness sizing)
    wb = pdf["ts"].dt.floor("D")
    sub = pdf[wb == wb.max()]["key"].to_numpy()
    for k, v in answers["auto"].items():
        lo, hi = map(int, k.split(":"))
        assert v == int(((sub >= lo) & (sub <= min(hi, 255))).sum()), k
