"""Streaming dedup-on-ingest (engine/dedup_stream.py): stream == batch
when no fingerprint crosses the df cap, exactly-once under replay, hot-fp
bounding, and extractor genericity."""

import numpy as np
import pandas as pd
import pytest

from condor_spark import fixtures
from condor_spark.engine.audio import band_energy_fingerprints, \
    fingerprint_pairs
from condor_spark.engine.dedup_stream import StreamFpDedup


def _write_stream_input(spark, tmp_path, n=240, files=3):
    """Gated exact clips split chronologically into `files` parquet files
    (one micro-batch each under maxFilesPerTrigger=1)."""
    src = str(tmp_path / "clips")
    per = n // files
    for f in range(files):
        pdf = pd.DataFrame([fixtures.clip_row_exact(i, param_mod=120,
                                                    gate=True)
                            for i in range(f * per, (f + 1) * per)])
        spark.createDataFrame(pdf).repartition(2) \
            .write.mode("append").parquet(src)
    return src


def _fps(df):
    return band_energy_fingerprints(df, frame=128, shingle=4)


def test_stream_equals_batch_when_nothing_hot(spark, tmp_path):
    """240 gated clips in 3 micro-batches; max_df above the global max
    fingerprint df (88 on this fixture) -> the streamed pair set equals
    the batch scorer's output exactly: the 120 planted duplicate pairs,
    each at Jaccard 1.0, discovered in the batch where the second member
    arrived."""
    src = _write_stream_input(spark, tmp_path)
    job = StreamFpDedup(sink_dir=str(tmp_path / "sink"),
                        fingerprint_fn=_fps, min_matches=3,
                        max_df=4096, min_jaccard=0.6)
    job.run(spark, src, str(tmp_path / "ckpt"))
    got = (job.read_pairs(spark).toPandas()
           .sort_values(["clip_id_a", "clip_id_b"]).reset_index(drop=True))
    clips = fixtures.audio_clips_exact(spark, 240, num_partitions=4,
                                       param_mod=120, gate=True)
    want = (fingerprint_pairs(_fps(clips), min_matches=3, max_df=4096,
                              min_jaccard=0.6)
            .withColumnsRenamed({"id_a": "clip_id_a", "id_b": "clip_id_b"})
            .toPandas().sort_values(["clip_id_a", "clip_id_b"])
            .reset_index(drop=True))
    assert len(got) == len(want) == 120
    pd.testing.assert_frame_equal(got.drop(columns=["batch_id"]), want,
                                  check_dtype=False)
    # pairs surface when the SECOND member arrives: clips 120-239 land in
    # batches 1-2, so no pair can come from batch 0
    assert (got["batch_id"] > 0).all()


def test_exactly_once_replay(spark, tmp_path):
    """A replayed committed batch is a no-op, and a crash before the
    ledger commit replays to identical output (deterministic paths +
    committed-store input)."""
    clips = fixtures.audio_clips_exact(spark, 80, num_partitions=2,
                                       param_mod=40, gate=True)
    job = StreamFpDedup(sink_dir=str(tmp_path / "sink"),
                        fingerprint_fn=_fps, min_matches=3,
                        max_df=4096, min_jaccard=0.6)
    job.process_batch(clips, 0)
    n1 = job.read_pairs(spark).count()
    # replay of the committed batch: no-op
    job.process_batch(clips, 0)
    assert job.read_pairs(spark).count() == n1
    # crash-before-commit replay: wipe the ledger entry (files stay) and
    # reprocess -> same rows, no duplicates
    led = job._read_ledger()
    del led["committed"]["0"]
    job._commit(led)
    job.process_batch(clips, 0)
    got = job.read_pairs(spark).toPandas()
    assert len(got) == n1
    assert not got.duplicated(["clip_id_a", "clip_id_b"]).any()


def test_hot_fp_bounding(spark, tmp_path):
    """A fingerprint shared by more than max_df ids is dropped from the
    join — synthetic (id, fp) rows prove the cap and the extractor
    genericity (fingerprint_fn is any df -> (id, fp) mapping)."""
    # 10 ids share hot fp 1; ids 0 and 1 also share private fps 100..104
    rows = [(f"id{i:02d}", 1) for i in range(10)]
    rows += [(f"id{i:02d}", 100 + j) for i in (0, 1) for j in range(5)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "fp"])

    job = StreamFpDedup(sink_dir=str(tmp_path / "sink"),
                        fingerprint_fn=lambda df: df, min_matches=3,
                        max_df=5, id_col="doc_id")
    job.process_batch(spark.createDataFrame(pdf), 0)
    got = job.read_pairs(spark).toPandas()
    # only (id00, id01) share >= 3 non-hot fps; fp 1 (df=10 > 5) never
    # joins, so no other pair appears and jaccard ignores the hot fp
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["doc_id_a"], r["doc_id_b"]) == ("id00", "id01")
    assert r["n_match"] == 5 and r["jaccard"] == 1.0


def test_cross_batch_discovery_order(spark, tmp_path):
    """A pair whose members arrive in different batches is emitted once,
    in the later batch; nothing is re-emitted by later unrelated
    batches."""
    def mk(ids_fps):
        return spark.createDataFrame(
            pd.DataFrame(ids_fps, columns=["clip_id", "fp"]))

    job = StreamFpDedup(sink_dir=str(tmp_path / "sink"),
                        fingerprint_fn=lambda df: df, min_matches=2,
                        max_df=None)
    job.process_batch(mk([("a", 1), ("a", 2), ("a", 3)]), 0)
    assert job.read_pairs(spark).count() == 0
    job.process_batch(mk([("b", 1), ("b", 2), ("b", 3)]), 1)
    p = job.read_pairs(spark).toPandas()
    assert len(p) == 1 and p.iloc[0]["batch_id"] == 1
    assert p.iloc[0]["jaccard"] == 1.0
    job.process_batch(mk([("c", 99), ("c", 98)]), 2)
    assert job.read_pairs(spark).count() == 1  # (a, b) not re-emitted


def test_compact_store_preserves_behavior(spark, tmp_path):
    """compact() bin-packs the fps store into one file; subsequent
    batches read it once (no double-counted df) and produce the same
    pairs a never-compacted run would."""
    def mk(ids_fps):
        return spark.createDataFrame(
            pd.DataFrame(ids_fps, columns=["clip_id", "fp"]))

    def run(sink, do_compact):
        job = StreamFpDedup(sink_dir=str(sink),
                            fingerprint_fn=lambda df: df, min_matches=2,
                            max_df=3)
        job.process_batch(mk([("a", 1), ("a", 2), ("a", 7)]), 0)
        job.process_batch(mk([("b", 1), ("b", 2), ("b", 8)]), 1)
        if do_compact:
            out = job.compact(spark)
            assert out["compacted"] == 2
            # idempotent second call: nothing to do
            assert job.compact(spark)["compacted"] == 0
        # fp 1,2 reach df=3 here (cap is >3, so still not hot); pair
        # (a,c) and (b,c) share exactly {1,2}
        job.process_batch(mk([("c", 1), ("c", 2), ("c", 9)]), 2)
        return (job.read_pairs(spark).toPandas()
                .sort_values(["clip_id_a", "clip_id_b"])
                .reset_index(drop=True))

    plain = run(tmp_path / "plain", False)
    comp = run(tmp_path / "comp", True)
    pd.testing.assert_frame_equal(plain, comp)
    assert len(comp) == 3  # (a,b) @1, (a,c)+(b,c) @2
    assert (comp["n_match"] == 2).all()


def test_stream_decontaminate_equals_batch_and_replays(spark, tmp_path):
    """Per-batch verdict union == the batch run (static gram set), and
    the ledger makes committed-batch replays no-ops / crash replays
    idempotent."""
    from condor_spark.engine.dedup_stream import StreamDecontaminate
    from condor_spark.engine.text import contamination_scores

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (2, "one two three four"),
         (1, "alpha beta gamma"), (3, "two three four five"),
         (5, "nine ten eleven")],
        "doc_id long, text string")
    train = docs.filter("doc_id % 2 = 0")
    ev = docs.filter("doc_id % 2 = 1")
    job = StreamDecontaminate(sink_dir=str(tmp_path / "sink"), n=3,
                              threshold=0.5)
    job.prepare(spark, train)
    job.process_batch(ev.filter("doc_id <= 1"), 0)
    job.process_batch(ev.filter("doc_id > 1"), 1)
    got = (job.read_scores(spark).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = (contamination_scores(ev, train, n=3, threshold=0.5).toPandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert got.equals(want)
    # committed replay: no-op
    job.process_batch(ev.filter("doc_id <= 1"), 0)
    assert len(job.read_scores(spark).toPandas()) == len(want)
    # crash-before-commit replay: identical output, no duplicates
    led = job._read_ledger()
    del led["committed"]["1"]
    job._commit(led)
    job.process_batch(ev.filter("doc_id > 1"), 1)
    again = (job.read_scores(spark).toPandas()
             .sort_values("doc_id").reset_index(drop=True))
    assert again.equals(want)

def test_stream_decontaminate_empty_ledger_schema_matches(spark, tmp_path):
    """ADVICE r3 (low): with string doc ids, the empty-ledger read_scores
    schema must match the non-empty one (id type auto-detected at
    prepare(), not hardcoded long)."""
    from condor_spark.engine.dedup_stream import StreamDecontaminate
    docs = spark.createDataFrame(
        [("a", "alpha beta gamma delta"), ("b", "one two three four")],
        "doc_id string, text string")
    job = StreamDecontaminate(sink_dir=str(tmp_path / "sink"), n=3,
                              threshold=0.5)
    job.prepare(spark, docs.filter("doc_id = 'a'"))
    empty = job.read_scores(spark)
    assert empty.count() == 0
    job.process_batch(docs.filter("doc_id = 'b'"), 0)
    full = job.read_scores(spark)
    assert [f.simpleString() for f in empty.schema.fields] == \
           [f.simpleString() for f in full.schema.fields]
    # unionByName across the two regimes must not throw
    assert empty.unionByName(full).count() == full.count()

def test_stream_decontaminate_id_type_survives_restart(spark, tmp_path):
    """Code-review r4: id_type is persisted in the ledger at prepare(), so
    a FRESH instance on the same sink_dir sees the right empty-ledger
    schema before any batch commits; the first committed batch's actual
    schema then pins it (stream id type is authoritative over train)."""
    from condor_spark.engine.dedup_stream import StreamDecontaminate
    docs = spark.createDataFrame(
        [("a", "alpha beta gamma delta"), ("b", "one two three four")],
        "doc_id string, text string")
    sink = str(tmp_path / "sink")
    StreamDecontaminate(sink_dir=sink, n=3).prepare(
        spark, docs.filter("doc_id = 'a'"))
    # brand-new object, default id_type long — must read string from ledger
    fresh = StreamDecontaminate(sink_dir=sink, n=3)
    empty = fresh.read_scores(spark)
    assert empty.schema["doc_id"].dataType.simpleString() == "string"
    fresh.process_batch(docs.filter("doc_id = 'b'"), 0)
    full = StreamDecontaminate(sink_dir=sink, n=3).read_scores(spark)
    assert full.schema["doc_id"].dataType.simpleString() == "string"
    assert empty.unionByName(full).count() == full.count()


def test_staging_orphan_reclaimed(spark, tmp_path):
    """Code-review r4 + ADVICE r4: a crashed attempt's d<V>.staging dir
    under state/ with V at-or-below the version the next batch writes is
    reclaimed by that batch (not leaked forever), while a HIGHER-version
    staging dir — which can only belong to a misconfigured concurrent
    second writer on the same sink_dir — is left alone so the conflict
    surfaces through the ledger instead of silently deleting its
    in-flight write."""
    import os
    from pyspark.sql import functions as F
    from condor_spark.engine.builder import SynopsisSpec
    from condor_spark.engine.streaming import StreamingSynopsisJob
    from condor_spark.engine.windows import Tumbling
    spec = SynopsisSpec(kind="hll", params=dict(log_reg_num=4, seed=7),
                        column="v", ts_column="ts", window=Tumbling("1 day"))
    job = StreamingSynopsisJob(spec=spec, sink_dir=str(tmp_path / "sink"))
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 01:00:00")],
        "v long, ts string").withColumn("ts", F.col("ts").cast("timestamp"))
    state_dir = os.path.join(job.sink_dir, "state")
    # batch 0 commits version 1: d1 is a same-lineage crashed attempt,
    # d99 is a foreign writer far ahead of this ledger
    orphan = os.path.join(state_dir, "d1.staging")
    foreign = os.path.join(state_dir, "d99.staging")
    for d in (orphan, foreign):
        os.makedirs(d, exist_ok=True)
        open(os.path.join(d, "junk"), "w").write("x")
    job.process_batch(df, 0)
    assert not os.path.exists(orphan)
    assert os.path.isdir(foreign)
    assert job.read_state(spark).count() >= 1
