"""KMV distinct sketch + set operations (synopsis/kmv.py).

Kernel invariants (determinism, exactness below k, the Beyer et al. 2007
relative-error bound, set-operation math recomputed from raw hashes) plus
the Spark build path: byte-identical blobs across partition counts (KMV is
fully deterministic — no RNG anywhere) and the overlap evaluator vs exact
per-window set arithmetic.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from condor_spark.engine import evaluate as ev
from condor_spark.engine.builder import SynopsisSpec, Tumbling, build_batch
from condor_spark.synopsis.base import Synopsis, make
from condor_spark.synopsis.hashing import hash64
from condor_spark.synopsis.kmv import KMVSketch

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").cache()


# ---------------------------------------------------------------- kernel
class TestKMVKernel:
    def test_exact_below_k(self):
        s = KMVSketch(k=256, seed=7)
        s.update_batch(np.arange(100))
        s.update_batch(np.arange(100))  # duplicates don't count
        assert s.estimate() == 100
        assert s.n_processed == 200

    def test_accuracy_bound(self):
        """Relative stderr ~ 1/sqrt(k-2) (Beyer et al. 2007 Thm 1); assert
        at 4 sigma, seeded/deterministic."""
        n, k = 200_000, 1024
        s = KMVSketch(k=k, seed=7)
        s.update_batch(np.arange(n, dtype=np.int64))
        rel = abs(s.estimate() - n) / n
        assert rel < 4.0 / np.sqrt(k - 2)

    def test_estimator_is_exact_integer_math(self):
        """The estimate equals (k-1)*2^64 // tau on Python ints — the
        property the SQL oracle twin replays bit-for-bit."""
        s = KMVSketch(k=512, seed=7)
        vals = np.arange(50_000, dtype=np.int64)
        s.update_batch(vals)
        h = np.sort(np.unique(hash64(vals, 7)))
        assert s.estimate() == (511 << 64) // int(h[511])

    def test_partition_invariance_bytes(self):
        """merge(parts) == whole, byte-for-byte (deterministic, no RNG)."""
        rng = np.random.default_rng(3)
        data = rng.integers(0, 30_000, size=120_000)
        full = KMVSketch(k=1024, seed=7)
        full.update_batch(data)
        merged = None
        for chunk in np.array_split(rng.permutation(data), 9):
            p = KMVSketch(k=1024, seed=7)
            p.update_batch(chunk)
            merged = p if merged is None else merged.merge(p)
        assert np.array_equal(merged.mins, full.mins)
        assert merged.estimate() == full.estimate()

    def test_overlap_exact_path(self):
        a, b = KMVSketch(k=1024, seed=7), KMVSketch(k=1024, seed=7)
        a.update_batch(np.arange(300))
        b.update_batch(np.arange(200, 500))
        assert a.overlap(b) == {"est_a": 300, "est_b": 300, "est_union": 500,
                                "est_intersection": 100, "jaccard": 0.2}

    def test_overlap_saturated_matches_recomputation(self):
        """Saturated-path figures equal a direct recomputation of the
        Beyer et al. math from the raw hash sets."""
        k = 512
        A = np.arange(80_000, dtype=np.int64)
        B = np.arange(40_000, 120_000, dtype=np.int64)
        sa, sb = KMVSketch(k=k, seed=7), KMVSketch(k=k, seed=7)
        sa.update_batch(A)
        sb.update_batch(B)
        o = sa.overlap(sb)
        ha = np.sort(np.unique(hash64(A, 7)))[:k]
        hb = np.sort(np.unique(hash64(B, 7)))[:k]
        L = np.union1d(ha, hb)[:k]
        tau = int(L[k - 1])
        k_int = int((np.isin(L, ha) & np.isin(L, hb)).sum())
        est_union = ((k - 1) << 64) // tau
        assert o["est_union"] == est_union
        assert o["est_intersection"] == (k_int * est_union) // k
        assert o["jaccard"] == k_int / k
        # and it lands near the truth (|A∩B| = 40k, |A∪B| = 120k, J = 1/3)
        assert abs(o["est_union"] - 120_000) / 120_000 < 4.0 / np.sqrt(k - 2)
        assert abs(o["jaccard"] - 1 / 3) < 0.1

    def test_merge_guard_and_roundtrip(self):
        s = KMVSketch(k=64, seed=7)
        s.update_batch(np.arange(1000))
        with pytest.raises(ValueError):
            s.merge(KMVSketch(k=128, seed=7))
        with pytest.raises(ValueError):
            s.merge(KMVSketch(k=64, seed=8))
        back = Synopsis.from_bytes(s.to_bytes())
        assert np.array_equal(back.mins, s.mins)
        assert back.estimate() == s.estimate()

    def test_registered(self):
        assert isinstance(make("kmv", k=16, seed=1), KMVSketch)


# ---------------------------------------------------------------- Spark path
def test_build_partition_invariance_bytes(spark, events):
    """Blobs are byte-identical at 2 vs 8 input partitions — KMV has no
    randomized merge, so the north-rule equality holds at the BYTE level,
    not just the output-row level."""
    spec = SynopsisSpec(kind="kmv", params=dict(k=256, seed=7),
                        column="user_id", ts_column="ts",
                        window=Tumbling("1 day"))

    def blobs(parts):
        rows = build_batch(events.repartition(parts), spec).collect()
        return {str(r["window_start"]): bytes(r["state"]) for r in rows}

    assert blobs(2) == blobs(8)


def test_distinct_estimates_close_to_exact(spark, events):
    spec = SynopsisSpec(kind="kmv", params=dict(k=1024, seed=7),
                        column="user_id", ts_column="ts",
                        window=Tumbling("1 day"))
    got = {r["window_start"].replace(tzinfo=None): r["est_distinct"]
           for r in ev.distinct_estimates(build_batch(events, spec)).collect()}
    exact = {r["w"].replace(tzinfo=None): r["d"] for r in
             events.groupBy(F.window("ts", "1 day").alias("win"))
                   .agg(F.countDistinct("user_id").alias("d"))
                   .select(F.col("win.start").alias("w"), "d").collect()}
    assert set(got) == set(exact)
    for w, d in exact.items():
        # sf0.01 windows have < k distinct users → estimates are EXACT
        assert got[w] == d if d < 1024 else abs(got[w] - d) / d < 0.125


def test_overlap_estimates_spark(spark, events):
    """overlap_estimates vs exact per-window set arithmetic on the two
    corpora, through the real stratified build + blob join."""
    two = events.filter(F.col("event_type").isin("click", "view"))
    spec = SynopsisSpec(kind="kmv", params=dict(k=1024, seed=7),
                        column="user_id", ts_column="ts",
                        window=Tumbling("1 day"), stratify_by="event_type")
    res = {r["window_start"].replace(tzinfo=None): r
           for r in ev.overlap_strata(build_batch(two, spec),
                                      "click", "view").collect()}
    assert res  # inner join kept the shared windows

    sets = {}
    for r in two.groupBy(F.window("ts", "1 day").alias("win"), "event_type").agg(
            F.collect_set("user_id").alias("u")).collect():
        sets.setdefault(r["win"].start.replace(tzinfo=None), {})[
            r["event_type"]] = set(r["u"])
    for w, row in res.items():
        A, B = sets[w]["click"], sets[w]["view"]
        if len(A | B) < 1024:  # exact regime (union below k) at this sf
            assert row["est_a"] == len(A) and row["est_b"] == len(B)
            assert row["est_union"] == len(A | B)
            assert row["est_intersection"] == len(A & B)
            assert row["jaccard"] == len(A & B) / len(A | B)


def test_stream_matches_batch_bytes(spark, tmp_path):
    """KMV through the exactly-once streaming path unchanged (one blob per
    window, merged across micro-batches): final per-window blobs are
    byte-identical to the batch build — the canonical sorted min-k state
    makes stream-vs-batch equality checkable at the byte level."""
    from condor_spark.engine.streaming import StreamingSynopsisJob

    sf_small = "/root/testdata/sf0.001"
    src = str(tmp_path / "src")
    df = spark.read.parquet(f"{sf_small}/events.parquet")
    df.repartitionByRange(5, "ts").write.mode("overwrite").parquet(src)
    spec = SynopsisSpec(kind="kmv", params=dict(k=256, seed=7),
                        column="user_id", ts_column="ts",
                        window=Tumbling("1 day"))
    job = StreamingSynopsisJob(spec=spec, sink_dir=str(tmp_path / "sink"),
                               watermark_delay="40 days")
    q = job.start(spark, src, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    q.awaitTermination(300)
    stream = {str(r["window_start"]): bytes(r["state"])
              for r in job.read_state_df(spark).collect()}
    batch = {str(r["window_start"]): bytes(r["state"])
             for r in build_batch(df, spec).collect()}
    assert stream == batch


def test_audio_corpus_overlap_containment(spark):
    """The planted structure of the audio contamination query: corpus B
    (clips 60-239, param_mod=120) contains a content-duplicate of every
    corpus-A clip, so the union's fingerprints ARE B's and the
    intersection estimate lands on A's distinct count within KMV error."""
    import __spark_entry__ as entry

    row = entry.queries()["audio_corpus_overlap"](
        spark, "/root/testdata/sf0.01").collect()[0]
    assert row["est_union"] == row["est_b"]  # A ⊆ B contentwise
    assert abs(row["est_intersection"] - row["est_a"]) / row["est_a"] < 0.05
    assert 0.5 < row["jaccard"] < 0.75
