"""End-to-end builder tests on the driver's sf0.001/sf0.01 testdata —
mirrors the reference's accuracy jobs (SURVEY.md §5 tier 2)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from condor_spark.engine import evaluate as ev
from condor_spark.engine.builder import (SynopsisSpec, build_batch,
                                         build_count_windows, build_ordered)
from condor_spark.engine.windows import (CountTumbling, GlobalWindow, Session,
                                         Sliding, Tumbling)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


def test_tumbling_countmin_exact(spark, events):
    spec = SynopsisSpec(kind="countmin", params=dict(width=8192, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling("1 day"))
    syn = build_batch(events, spec)
    keys = sorted(r.user_id for r in events.select("user_id").distinct().collect())
    res = ev.frequency_estimates(syn, keys).collect()
    exact = {(r["w"].replace(tzinfo=None), str(r["user_id"])): r["c"] for r in
             events.groupBy(F.window("ts", "1 day").alias("win"), "user_id")
                   .agg(F.count("*").alias("c"))
                   .select(F.col("win.start").alias("w"), "user_id", "c").collect()}
    assert res
    for r in res:
        t = exact.get((r["window_start"].replace(tzinfo=None), r["key"]), 0)
        assert r["est_count"] == t


def test_sliding_hll_bound(spark, events):
    spec = SynopsisSpec(kind="hll", params=dict(log_reg_num=14, seed=7),
                        column="user_id", ts_column="ts",
                        window=Sliding("1 day", "6 hours"))
    d = ev.distinct_estimates(build_batch(events, spec)).collect()
    exact = {r["w"].replace(tzinfo=None): r["d"] for r in
             events.groupBy(F.window("ts", "1 day", "6 hours").alias("win"))
                   .agg(F.countDistinct("user_id").alias("d"))
                   .select(F.col("win.start").alias("w"), "d").collect()}
    assert len(d) == len(exact)
    for r in d:
        t = exact[r["window_start"].replace(tzinfo=None)]
        assert abs(r["est_distinct"] - t) <= max(3, 0.05 * t)


def test_parallelism_invariance(spark, events):
    """Same output rows at 2 vs 8 input partitions (north rule)."""
    def run(parts):
        spec = SynopsisSpec(kind="countmin", params=dict(width=512, height=5, seed=7),
                            column="user_id", ts_column="ts", window=Tumbling("1 day"))
        syn = build_batch(events.repartition(parts), spec)
        return sorted((str(r["window_start"]), r["key"], r["est_count"])
                      for r in ev.frequency_estimates(syn, list(range(150))).collect())
    assert run(2) == run(8)


def test_session_windows(spark, events):
    spec = SynopsisSpec(kind="equiwidth",
                        params=dict(lower=0.0, upper=500.0, num_buckets=10),
                        column="value", ts_column="ts",
                        window=Session("30 minutes"), stratify_by="user_id")
    rows = build_batch(events, spec).collect()
    assert sum(r["n"] for r in rows) <= events.count()  # out-of-range drops
    # every session's bounds must respect the gap semantics
    for r in rows:
        assert r["window_end"] >= r["window_start"]


def test_session_unstratified_exact(spark, events):
    """Un-stratified sessionization (whole table = one stratum) must NOT
    collapse to a single task, and cross-partition boundary sessions must
    gap-merge exactly: session (start, end, n) match a pandas oracle."""
    spec = SynopsisSpec(kind="hll", params=dict(log_reg_num=4, seed=7),
                        column="event_id", ts_column="ts",
                        window=Session("30 minutes"))
    got = sorted((r["window_start"], r["window_end"], r["n"])
                 for r in build_batch(events, spec).collect())

    pdf = events.select("ts").toPandas().sort_values("ts")
    ts = pdf["ts"].astype("datetime64[us]")
    gap = np.timedelta64(30 * 60 * 1_000_000, "us")
    brk = (ts.diff() > gap).cumsum()
    want = sorted(
        (g.iloc[0].to_pydatetime(), (g.iloc[-1] + gap).to_pydatetime(), len(g))
        for _, g in ts.groupby(brk))
    assert [(s, e) for s, e, _ in got] == [(s, e) for s, e, _ in want]
    assert [n for *_, n in got] == [n for *_, n in want]


def test_session_chain_spans_partitions(spark):
    """A single long session spanning every range partition must come back
    as ONE window (the boundary-merge chain walk), alongside isolated ones."""
    import pandas as pd

    base = pd.Timestamp("2024-01-01")
    # 900 points 1 min apart = one 900-min session; plus two far-away singles
    rows = [(base + pd.Timedelta(minutes=i), i) for i in range(900)]
    rows += [(base + pd.Timedelta(days=5), 9001), (base + pd.Timedelta(days=9), 9002)]
    df = spark.createDataFrame(
        [(t.to_pydatetime(), float(v)) for t, v in rows],
        "ts timestamp, value double")
    spec = SynopsisSpec(kind="hll", params=dict(log_reg_num=4, seed=7),
                        column="value", ts_column="ts", window=Session("30 minutes"))
    got = sorted((r["window_start"], r["n"]) for r in build_batch(df, spec).collect())
    assert [n for _, n in got] == [900, 1, 1]
    assert got[0][0] == base.to_pydatetime()


def test_session_chain_broadcast_join_branch(spark, monkeypatch):
    """The chain lookup has two physical forms — an inline literal map for
    the common few-chains case and a broadcast join for many-thousand-
    partition builds. Forcing the join branch on a fixture that is
    guaranteed to chain across every range partition (one long session)
    must produce byte-identical sessions to the literal-map branch."""
    import pandas as pd
    from condor_spark.engine import builder as B

    base = pd.Timestamp("2024-01-01")
    rows = [(base + pd.Timedelta(minutes=i), i) for i in range(900)]
    rows += [(base + pd.Timedelta(days=5), 9001),
             (base + pd.Timedelta(days=9), 9002)]
    df = spark.createDataFrame(
        [(t.to_pydatetime(), float(v)) for t, v in rows],
        "ts timestamp, value double")
    spec = SynopsisSpec(kind="hll", params=dict(log_reg_num=4, seed=7),
                        column="value", ts_column="ts",
                        window=Session("30 minutes"))
    want = sorted((r["window_start"], r["window_end"], r["stratum"],
                   bytes(r["state"]), r["n"])
                  for r in build_batch(df, spec).collect())
    assert [n for *_, n in want] == [900, 1, 1]  # the chain really merged
    monkeypatch.setattr(B, "_CHAIN_MAP_INLINE_MAX", 0)
    got = sorted((r["window_start"], r["window_end"], r["stratum"],
                  bytes(r["state"]), r["n"])
                 for r in build_batch(df, spec).collect())
    assert got == want


def test_sliding_bucketing_equals_slicing(spark, events):
    """The per-element bucketing baseline (Bucketing.java:57-60 — what the
    bench's concurrent-windows block measures slicing AGAINST) must be
    byte-identical to the slicing path on the same Sliding window."""
    from condor_spark.engine.builder import build_sliding_bucketing
    win = Sliding("1 day", "6 hours")
    spec = SynopsisSpec(kind="hll", params=dict(log_reg_num=4, seed=7),
                        column="event_id", ts_column="ts", window=win,
                        stratify_by="user_id")
    a = sorted((r["window_start"], r["stratum"], bytes(r["state"]), r["n"])
               for r in build_batch(events, spec).collect())
    b = sorted((r["window_start"], r["stratum"], bytes(r["state"]), r["n"])
               for r in build_sliding_bucketing(events, spec, win).collect())
    assert a == b and len(a) > 0


def test_count_windows_exact_sizes(spark, events):
    n = events.count()
    spec = SynopsisSpec(kind="ddsketch", params=dict(relative_accuracy=0.01),
                        column="value", ts_column="ts",
                        window=CountTumbling(200), tiebreak_column="event_id")
    rows = sorted(build_count_windows(events, spec).collect(),
                  key=lambda r: r["window_id"])
    sizes = [r["n"] for r in rows]
    assert sum(sizes) == n
    assert all(s == 200 for s in sizes[:-1])


def test_wavelet_range_sum_exact(spark, events):
    spec = SynopsisSpec(kind="wavelet", params=dict(size=1 << 13), column="value",
                        ts_column="ts", tiebreak_column="event_id")
    sl = build_ordered(events, spec, num_partitions=4)
    n = events.count()
    res = {(r["lo_idx"], r["hi_idx"]): r["range_sum"]
           for r in ev.wavelet_range_sums(sl, [(0, 100), (100, n)]).collect()}
    import duckdb
    lo100, rest = duckdb.sql(f"""
      with o as (select value, row_number() over (order by ts, event_id) - 1 idx
                 from read_parquet('{SF}/events.parquet'))
      select sum(value) filter (idx < 100), sum(value) filter (idx >= 100) from o
    """).fetchone()
    assert abs(res[(0, 100)] - lo100) < 1e-6
    assert abs(res[(100, n)] - rest) < 1e-6


def test_global_window_quantiles(spark, events):
    spec = SynopsisSpec(kind="ddsketch", params=dict(relative_accuracy=0.01),
                        column="value", window=GlobalWindow())
    qs = [0.25, 0.5, 0.95]
    rows = ev.quantile_estimates(build_batch(events, spec), qs).collect()
    vals = np.array([r["value"] for r in events.select("value").collect()])
    got = {r["q"]: r["est_value"] for r in rows}
    for q in qs:
        exact = np.quantile(vals, q)
        assert abs(got[q] - exact) / exact < 0.021


def test_query_timestamped(spark, events):
    spec = SynopsisSpec(kind="countmin", params=dict(width=4096, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling("1 day"))
    syn = build_batch(events, spec).cache()
    queries = spark.createDataFrame(
        [("2024-01-02 06:00:00",), ("2024-01-05 23:00:00,".rstrip(","),)],
        "q_ts_s string").select(F.col("q_ts_s").cast("timestamp").alias("q_ts"))

    def fn(synopsis, pdf):
        import pandas as pd
        est = synopsis.query(pd.Series([7] * len(pdf)))
        return pd.DataFrame({"q_ts": pdf["q_ts"], "est_count": est.astype("int64")})

    res = ev.query_timestamped(syn, queries, fn,
                               "q_ts timestamp, est_count long, window_start timestamp")
    rows = res.collect()
    assert len(rows) == 2
    exact = {r["w"].replace(tzinfo=None): r["c"] for r in
             events.filter(F.col("user_id") == 7)
                   .groupBy(F.window("ts", "1 day").alias("win"))
                   .agg(F.count("*").alias("c"))
                   .select(F.col("win.start").alias("w"), "c").collect()}
    for r in rows:
        assert r["est_count"] == exact.get(r["window_start"].replace(tzinfo=None), 0)


def test_query_latest(spark, events):
    spec = SynopsisSpec(kind="hll", params=dict(log_reg_num=12, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling("1 day"))
    syn = build_batch(events, spec)
    lat = ev.latest(syn, per_stratum=False)
    rows = ev.distinct_estimates(lat).collect()
    assert len(rows) == 1
    last_day = (events.groupBy(F.window("ts", "1 day").alias("win"))
                .agg(F.countDistinct("user_id").alias("d"))
                .select(F.col("win.start").alias("s"), "d")
                .orderBy(F.desc("s")).first())
    assert abs(rows[0]["est_distinct"] - last_day["d"]) <= max(3, 0.05 * last_day["d"])


def test_build_batch_multi_matches_single(spark, events):
    """N concurrent windows from one slice pass == N independent builds
    (the Scotty addWindow loop, SynopsisBuilder.java:335-337)."""
    from condor_spark.engine.builder import build_batch_multi

    windows = [Tumbling("1 day"), Sliding("2 days", "1 day"),
               Sliding("1 day", "6 hours")]
    spec = SynopsisSpec(kind="countmin", params=dict(width=4096, height=5, seed=7),
                        column="user_id", ts_column="ts")
    multi = build_batch_multi(events, spec, windows).collect()
    by_id = {}
    for r in multi:
        by_id.setdefault(r["window_id"], {})[
            r["window_start"].replace(tzinfo=None)] = (r["state"], r["n"])
    for wid, win in enumerate(windows):
        single_spec = SynopsisSpec(kind="countmin",
                                   params=dict(width=4096, height=5, seed=7),
                                   column="user_id", ts_column="ts", window=win)
        single = build_batch(events, single_spec).collect()
        got = by_id.get(wid, {})
        assert len(single) == len(got), f"window {wid}: row-count mismatch"
        for r in single:
            st, n = got[r["window_start"].replace(tzinfo=None)]
            assert n == r["n"]
            assert st == r["state"], f"window {wid}: sketch bytes differ"


def test_cosine_near_dup_exact_and_lsh(spark):
    from condor_spark.engine import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    exact = similarity.cosine_near_dup_pairs(emb, threshold=0.4).collect()
    exact_pairs = {(r["id_a"], r["id_b"]) for r in exact}
    assert all(r["id_a"] < r["id_b"] and r["cosine"] >= 0.4 for r in exact)
    assert len(exact_pairs) == len(exact)

    lsh = similarity.cosine_near_dup_pairs_lsh(emb, threshold=0.4,
                                               bands=8, rows_per_band=2).collect()
    lsh_pairs = {(r["id_a"], r["id_b"]) for r in lsh}
    # precision 1.0 (candidates are exact-verified); recall high but < forced
    assert lsh_pairs <= exact_pairs
    assert len(lsh_pairs) >= 0.9 * len(exact_pairs)


def test_ann_topk_ivf_recall(spark):
    """IVF probes nprobe nearest clusters; the fixture embeddings are near-
    uniform (worst case for cluster pruning: recall ~ fraction probed), so
    the bound is recall@5 clearly above the probed fraction (8/16), plus:
    every reported cosine must equal the exact cosine (IVF only prunes
    candidates, never alters scores)."""
    from condor_spark.engine import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    qids = list(range(10))
    exact = similarity.brute_force_topk(emb, qids, k=5).collect()
    ivf = similarity.ann_topk_ivf(emb, qids, k=5, num_centroids=16,
                                  nprobe=8).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    ivf_set = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    assert len(ivf_set & exact_set) >= 0.6 * len(exact_set)
    cos = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact}
    for r in ivf:
        key = (r["query_id"], r["neighbor_id"])
        if key in cos:
            assert abs(r["cosine"] - cos[key]) < 1e-9


def test_build_ordered_round_robin_wavelet(spark, events):
    """Round-robin division + DistributedWaveletsManager index math
    (OrderAndIndex.java:58-66, DistributedWaveletsManager.java:42-76):
    point/range-sum queries match exact prefix sums of the ordered stream."""
    from condor_spark.engine.builder import build_ordered_round_robin
    from condor_spark.synopsis.base import Synopsis
    from condor_spark.synopsis.wavelet import DistributedWaveletsManager

    P = 4
    spec = SynopsisSpec(kind="wavelet", params=dict(size=4096),
                        column="value", ts_column="ts",
                        tiebreak_column="event_id")
    rows = build_ordered_round_robin(events, spec, parallelism=P).collect()
    assert sorted(r["slice_idx"] for r in rows) == list(range(P))
    mgr = DistributedWaveletsManager(
        P, [Synopsis.from_bytes(r["state"]) for r in
            sorted(rows, key=lambda r: r["slice_idx"])])

    ordered = np.array([r[0] for r in events.orderBy("ts", "event_id")
                        .select("value").collect()])
    assert mgr.n == len(ordered)
    # size 4096 >= ceil(n/P) rounded to pow2 → lossless coefficients
    for i in (0, 1, 17, len(ordered) // 2, len(ordered) - 1):
        assert abs(mgr.point_query(i) - ordered[i]) < 1e-6 * max(1, abs(ordered[i]))
    for lo, hi in [(0, len(ordered)), (5, 105), (333, 777),
                   (len(ordered) - 50, len(ordered))]:
        assert abs(mgr.range_sum_query(lo, hi) - ordered[lo:hi].sum()) \
            <= 1e-6 * max(1.0, abs(ordered[lo:hi].sum()))


def test_build_batch_many_matches_single(spark, events):
    """Shared-scan multi-synopsis build: each spec's output must be
    byte-identical to its standalone build_batch result."""
    from condor_spark.engine.builder import build_batch_many

    specs = [
        SynopsisSpec(kind="countmin", params=dict(width=8192, height=5, seed=7),
                     column="user_id", ts_column="ts", window=Tumbling("1 day")),
        SynopsisSpec(kind="hll", params=dict(log_reg_num=12, seed=7),
                     column="user_id", ts_column="ts", window=Tumbling("1 day")),
        SynopsisSpec(kind="ddsketch", params=dict(relative_accuracy=0.01),
                     column="value", ts_column="ts", window=Tumbling("1 day")),
    ]
    many = build_batch_many(events, specs).collect()
    for i, spec in enumerate(specs):
        single = sorted(
            ((r["window_start"], r["stratum"], bytes(r["state"]), r["n"])
             for r in build_batch(events, spec).collect()))
        got = sorted(
            ((r["window_start"], r["stratum"], bytes(r["state"]), r["n"])
             for r in many if r["spec_id"] == i))
        assert got == single, f"spec {i} ({spec.kind}) differs"


def test_build_batch_many_sliding(spark, events):
    """Shared-scan multi-build with a SLIDING window: slice expansion and
    merge must match the standalone sliding build byte-for-byte."""
    from condor_spark.engine.builder import build_batch_many

    specs = [
        SynopsisSpec(kind="hll", params=dict(log_reg_num=10, seed=7),
                     column="user_id", ts_column="ts",
                     window=Sliding("1 day", "6 hours")),
        SynopsisSpec(kind="countmin", params=dict(width=1024, height=5, seed=7),
                     column="user_id", ts_column="ts",
                     window=Sliding("1 day", "6 hours")),
    ]
    many = build_batch_many(events, specs).collect()
    for i, spec in enumerate(specs):
        single = sorted(
            ((r["window_start"], r["stratum"], bytes(r["state"]), r["n"])
             for r in build_batch(events, spec).collect()))
        got = sorted(
            ((r["window_start"], r["stratum"], bytes(r["state"]), r["n"])
             for r in many if r["spec_id"] == i))
        assert got == single, f"spec {i} ({spec.kind}) differs"
