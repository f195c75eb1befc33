"""Streaming tests: watermark late-drop, exactly-once idempotence, checkpoint
kill/resume equivalence, batch-vs-stream parity (north rule)."""

import glob
import json
import os

import pyspark.sql.functions as F
import pytest

from condor_spark.engine import evaluate as ev
from condor_spark.engine.builder import SynopsisSpec, build_batch
from condor_spark.engine.streaming import StreamingSynopsisJob
from condor_spark.engine.windows import Tumbling

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def source_dir(spark, tmp_path):
    """events split into 5 parquet files ordered by ts (a file-replay
    stream, like the reference's gzip replay sources)."""
    src = str(tmp_path / "src")
    (spark.read.parquet(f"{SF}/events.parquet")
     .repartitionByRange(5, "ts")
     .write.mode("overwrite").parquet(src))
    return src


def _spec():
    return SynopsisSpec(kind="countmin", params=dict(width=4096, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling("1 day"))


def _run_stream(spark, source_dir, sink, ckpt, watermark="10 seconds"):
    job = StreamingSynopsisJob(spec=_spec(), sink_dir=sink,
                               watermark_delay=watermark)
    q = job.start(spark, source_dir, ckpt, max_files_per_trigger=1)
    q.awaitTermination(300)
    return job


def test_stream_matches_batch(spark, source_dir, tmp_path):
    """Stream (5 micro-batches) ends with the same per-window estimates as a
    single batch build, with a watermark wide enough to keep all rows."""
    job = _run_stream(spark, source_dir, str(tmp_path / "sink"),
                      str(tmp_path / "ckpt"), watermark="40 days")
    stream_syn = job.read_state_df(spark)
    batch_syn = build_batch(spark.read.parquet(f"{SF}/events.parquet"), _spec())
    keys = list(range(150))
    s = sorted((str(r["window_start"]), r["key"], r["est_count"])
               for r in ev.frequency_estimates(stream_syn, keys).collect())
    b = sorted((str(r["window_start"]), r["key"], r["est_count"])
               for r in ev.frequency_estimates(batch_syn, keys).collect())
    assert s == b

    # metrics + lineage recorded per batch
    lines = [json.loads(l) for l in
             open(os.path.join(str(tmp_path / "sink"), "metrics.jsonl"))]
    assert len(lines) == 5
    assert all(m["partitions"] for m in lines)
    assert sum(m["n_input"] for m in lines) == 1000


def test_sliding_lineage_counts_partials_once(spark, source_dir, tmp_path):
    """Sliding windows replicate each partial into size/slide windows; the
    lineage metric must count each consumed row ONCE (pre-explode), so with
    a keep-everything watermark per-batch n_rows sums to n_input and the
    late-drop count is exactly 0 — not negative."""
    from condor_spark.engine.windows import Sliding

    spec = SynopsisSpec(kind="countmin",
                        params=dict(width=4096, height=5, seed=7),
                        column="user_id", ts_column="ts",
                        window=Sliding("4 days", "1 day"))
    job = StreamingSynopsisJob(spec=spec, sink_dir=str(tmp_path / "sink"),
                               watermark_delay="40 days")
    q = job.start(spark, source_dir, str(tmp_path / "ckpt"),
                  max_files_per_trigger=1)
    q.awaitTermination(300)
    metrics = [json.loads(l) for l in
               open(os.path.join(str(tmp_path / "sink"), "metrics.jsonl"))]
    assert len(metrics) == 5
    for m in metrics:
        assert m["n_late_dropped"] == 0
        assert sum(p["n_rows"] for p in m["partitions"]) == m["n_input"]


def test_exactly_once_replay(spark, source_dir, tmp_path):
    """Reprocessing an already-committed batch id is a no-op."""
    sink = str(tmp_path / "sink")
    job = _run_stream(spark, source_dir, sink, str(tmp_path / "ckpt"),
                      watermark="40 days")
    ledger_before = job._read_ledger()
    df = spark.read.parquet(source_dir)
    job.process_batch(df, batch_id=0)  # replay batch 0
    ledger_after = job._read_ledger()
    assert ledger_after == ledger_before


def test_checkpoint_resume(spark, source_dir, tmp_path):
    """Stop after 2 files, restart from checkpoint → identical final state to
    an uninterrupted run."""
    sink_a = str(tmp_path / "sink_a")
    ckpt_a = str(tmp_path / "ckpt_a")
    # phase 1: only 2 files visible
    part_src = str(tmp_path / "partial_src")
    os.makedirs(part_src)
    files = sorted(glob.glob(os.path.join(source_dir, "part-*.parquet")))
    import shutil
    for f in files[:2]:
        shutil.copy(f, part_src)
    job_a = StreamingSynopsisJob(spec=_spec(), sink_dir=sink_a,
                                 watermark_delay="40 days")
    q = job_a.start(spark, part_src, ckpt_a, max_files_per_trigger=1)
    q.awaitTermination(300)
    assert job_a._read_ledger()["version"] == 2
    # phase 2: remaining files arrive; restart from the same checkpoint
    for f in files[2:]:
        shutil.copy(f, part_src)
    q = job_a.start(spark, part_src, ckpt_a, max_files_per_trigger=1)
    q.awaitTermination(300)

    # uninterrupted reference run
    sink_b = str(tmp_path / "sink_b")
    job_b = _run_stream(spark, source_dir, sink_b, str(tmp_path / "ckpt_b"),
                        watermark="40 days")
    keys = list(range(150))
    a = sorted((str(r["window_start"]), r["key"], r["est_count"]) for r in
               ev.frequency_estimates(job_a.read_state_df(spark), keys).collect())
    b = sorted((str(r["window_start"]), r["key"], r["est_count"]) for r in
               ev.frequency_estimates(job_b.read_state_df(spark), keys).collect())
    assert a == b


def test_watermark_drops_late_rows(spark, tmp_path):
    """A second file whose rows are older than (max_ts - delay) is dropped."""
    src = str(tmp_path / "src")
    df = spark.read.parquet(f"{SF}/events.parquet")
    hi = df.filter(F.col("event_id") < 500)
    lo_late = df.filter(F.col("event_id") >= 500).withColumn(
        "ts", F.col("ts") - F.expr("INTERVAL 500 DAYS"))
    hi.coalesce(1).write.parquet(os.path.join(src, "f=1"))
    lo_late.coalesce(1).write.parquet(os.path.join(src, "f=2"))
    job = StreamingSynopsisJob(spec=_spec(), sink_dir=str(tmp_path / "sink"),
                               watermark_delay="1 hour")
    schema = df.schema
    q = job.start(spark, src + "/*", ckpt_dir if (ckpt_dir := str(tmp_path / "ck")) else None,
                  schema=schema, max_files_per_trigger=1)
    q.awaitTermination(300)
    metrics = [json.loads(l) for l in
               open(os.path.join(str(tmp_path / "sink"), "metrics.jsonl"))]
    total_rows = sum(r["n"] for r in job.read_state(spark).collect())
    assert total_rows == 500  # late file fully dropped
    assert any(m["n_late_dropped"] > 0 for m in metrics)


def test_query_stream_buffers_early_queries(spark, source_dir, tmp_path):
    """Queries arriving before the FIRST committed synopsis park in the
    pending buffer and are answered by the first batch that finds a
    snapshot (QueryLatestFunction.java:42-60 semantics), exactly once."""
    import pandas as pd
    from condor_spark import fixtures
    from condor_spark.engine.streaming import QueryLatestStream

    events = spark.read.parquet(f"{SF}/events.parquet")
    spec = SynopsisSpec(kind="countmin", params=dict(width=8192, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling("1 day"))
    job = StreamingSynopsisJob(spec, sink_dir=str(tmp_path / "sink"),
                               watermark_delay="1 hour")
    keys = sorted(r[0] for r in events.select("user_id").distinct().collect())

    # phase 1: query batches 0-1 arrive BEFORE any synopsis exists
    q1 = spark.createDataFrame([(b, k) for b in range(2) for k in keys],
                               "q_batch long, key long")
    fixtures.replay_in_order(spark, q1, str(tmp_path / "qsrc"), n_chunks=2,
                             ts_col="q_batch")
    ql = QueryLatestStream(job, out_dir=str(tmp_path / "ans"), key_column="key")
    ql.start(spark, str(tmp_path / "qsrc"), str(tmp_path / "qckpt"),
             max_files_per_trigger=1).awaitTermination(300)
    assert ql.read_answers(spark).count() == 0  # parked, not answered

    # phase 2: the synopsis stream commits, a third query batch arrives
    job.start(spark, source_dir, str(tmp_path / "ckpt")).awaitTermination(300)
    q2 = spark.createDataFrame([(2, k) for k in keys], "q_batch long, key long")
    (q2.coalesce(1).write.mode("append")
       .parquet(str(tmp_path / "qsrc")))  # new file -> batch 2 on restart
    ql.start(spark, str(tmp_path / "qsrc"), str(tmp_path / "qckpt"),
             max_files_per_trigger=1).awaitTermination(300)

    got = ql.read_answers(spark).toPandas()
    # batch 2 answered its own keys AND both parked batches
    assert len(got) == 3 * len(keys)
    assert set(got["batch"]) == {2}
    # answers are exact counts of the newest window
    latest_ws = (events.groupBy(F.window("ts", "1 day").alias("w"))
                 .count().orderBy(F.col("w.start").desc()).first())
    exact = {str(r["user_id"]): r["c"] for r in
             events.filter(F.col("ts") >= latest_ws["w"]["start"])
             .groupBy("user_id").agg(F.count("*").alias("c")).collect()}
    for k, grp in got.groupby("key"):
        assert (grp["est_count"] == exact.get(k, 0)).all()


def test_query_stream_replayed_park_not_double_answered(spark, source_dir,
                                                        tmp_path):
    """A batch that parked itself (no snapshot yet), crashed before its
    checkpoint committed, and replays AFTER the synopsis stream commits
    must answer its rows exactly once — never adopt its own park on top of
    its own input rows."""
    from condor_spark.engine.streaming import QueryLatestStream

    events = spark.read.parquet(f"{SF}/events.parquet")
    spec = SynopsisSpec(kind="countmin", params=dict(width=8192, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling("1 day"))
    job = StreamingSynopsisJob(spec, sink_dir=str(tmp_path / "sink"),
                               watermark_delay="1 hour")
    ql = QueryLatestStream(job, out_dir=str(tmp_path / "ans"), key_column="key")
    keys = sorted(r[0] for r in events.select("user_id").distinct().collect())
    qdf = spark.createDataFrame([(k,) for k in keys], "key long")

    # batch 7 runs with no snapshot -> parks itself (checkpoint "crashes"
    # before commit: we simply invoke process_batch directly again later)
    ql.process_batch(qdf, 7)
    assert ql.read_answers(spark).count() == 0

    # the synopsis stream commits, then batch 7 REPLAYS the same rows
    job.start(spark, source_dir, str(tmp_path / "ckpt")).awaitTermination(300)
    ql.process_batch(qdf, 7)
    got = ql.read_answers(spark).toPandas()
    assert len(got) == len(keys)  # once per key, not twice
    # a second replay (post-ledger-commit) is still idempotent
    ql.process_batch(qdf, 7)
    assert ql.read_answers(spark).count() == len(keys)
    # and a LATER batch does not re-adopt the consumed own-park
    qdf2 = spark.createDataFrame([(keys[0],)], "key long")
    ql.process_batch(qdf2, 8)
    got = ql.read_answers(spark).toPandas()
    assert len(got) == len(keys) + 1


# -------------------------------------------------------- snapshot history
def test_time_travel_matches_prefix_batch_builds(spark, tmp_path):
    """Iceberg-style time travel: the state AS OF committed version k must
    equal a batch build over exactly the first k replayed chunks."""
    from condor_spark import fixtures

    df = spark.read.parquet(f"{SF}/events.parquet")
    src = str(tmp_path / "src")
    fixtures.replay_in_order(spark, df, src, n_chunks=4, ts_col="ts")
    sink = str(tmp_path / "sink")
    job = StreamingSynopsisJob(spec=_spec(), sink_dir=sink,
                               watermark_delay="40 days")
    q = job.start(spark, src, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    q.awaitTermination(300)

    snaps = job.snapshots()
    assert [s["version"] for s in snaps] == [1, 2, 3, 4]
    # FileStreamSource replays in mtime order == replay_in_order chunk order
    files = sorted(glob.glob(os.path.join(src, "*.parquet")),
                   key=os.path.getmtime)
    keys = list(range(150))
    for k in (1, 2, 3, 4):
        prefix = spark.read.parquet(*files[:k])
        batch = build_batch(prefix, _spec())
        want = sorted((str(r["window_start"]), r["key"], r["est_count"])
                      for r in ev.frequency_estimates(batch, keys).collect())
        got = sorted(
            (str(r["window_start"]), r["key"], r["est_count"])
            for r in ev.frequency_estimates(
                job.read_state_df(spark, as_of_version=k), keys).collect())
        assert got == want, f"snapshot v{k} != prefix batch build"
    # head read unchanged by time travel
    assert job.read_state(spark).count() == \
        job.read_state(spark, as_of_version=4).count()
    with pytest.raises(ValueError):
        job.read_state(spark, as_of_version=5)


def test_expire_snapshots_keeps_recent_history(spark, tmp_path):
    from condor_spark import fixtures

    df = spark.read.parquet(f"{SF}/events.parquet")
    src = str(tmp_path / "src")
    fixtures.replay_in_order(spark, df, src, n_chunks=4, ts_col="ts")
    sink = str(tmp_path / "sink")
    job = StreamingSynopsisJob(spec=_spec(), sink_dir=sink,
                               watermark_delay="40 days")
    q = job.start(spark, src, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    q.awaitTermination(300)

    keys = list(range(150))
    before_v3 = sorted(
        (str(r["window_start"]), r["key"], r["est_count"])
        for r in ev.frequency_estimates(
            job.read_state_df(spark, as_of_version=3), keys).collect())
    removed = job.expire_snapshots(keep_last=2)
    assert removed > 0
    # kept snapshots still read exactly; expired ones fail loudly
    after_v3 = sorted(
        (str(r["window_start"]), r["key"], r["est_count"])
        for r in ev.frequency_estimates(
            job.read_state_df(spark, as_of_version=3), keys).collect())
    assert after_v3 == before_v3
    assert job.read_state(spark, as_of_version=4).count() > 0
    for dead in (1, 2):
        with pytest.raises(ValueError, match="expired"):
            job.read_state(spark, as_of_version=dead)
    # expiration is idempotent and never touches the head
    assert job.expire_snapshots(keep_last=2) == 0
    assert job._read_ledger()["version"] == 4


def test_compact_snapshots_multi_file_target(spark, tmp_path):
    """target_files > 1 must actually yield that many consolidated files
    (contiguous window ranges), each tracked by its own compaction entry,
    with the live read unchanged row-for-row."""
    from condor_spark import fixtures

    df = spark.read.parquet(f"{SF}/events.parquet")
    src = str(tmp_path / "src")
    fixtures.replay_in_order(spark, df, src, n_chunks=4, ts_col="ts")
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    job = StreamingSynopsisJob(spec=_spec(), sink_dir=sink,
                               watermark_delay="40 days")
    job.start(spark, src, ckpt, max_files_per_trigger=1).awaitTermination(300)

    keys = list(range(150))
    def estimates(state_df):
        return sorted((str(r["window_start"]), r["key"], r["est_count"])
                      for r in ev.frequency_estimates(state_df, keys).collect())

    live_before = estimates(job.read_state_df(spark))
    files_before = len(set(job._read_ledger()["manifest"].values()))
    assert files_before > 2
    out = job.compact_snapshots(spark, target_files=2)
    assert out["compacted"] and out["files_after"] == 2
    led = job._read_ledger()
    assert len(set(led["manifest"].values())) == 2
    comps = [c for c in led["compactions"] if c["version"] == out["version"]]
    assert len(comps) == 2
    # contiguous disjoint window ranges covering the manifest
    all_ws = sorted(w for c in comps for w in c["windows"])
    assert all_ws == sorted(int(w) for w in led["manifest"])
    assert max(comps[0]["windows"]) < min(comps[1]["windows"]) or \
        max(comps[1]["windows"]) < min(comps[0]["windows"])
    assert estimates(job.read_state_df(spark)) == live_before
    # already at the target: no-op
    assert job.compact_snapshots(spark, target_files=2)["compacted"] is False


def test_compact_snapshots_rewrite_and_resume(spark, tmp_path):
    """Compaction (rewriteDataFiles analogue): bin-packs the live manifest
    into one file without changing a row, preserves pre-compaction time
    travel, and batches landing AFTER it supersede windows correctly."""
    from condor_spark import fixtures

    df = spark.read.parquet(f"{SF}/events.parquet")
    pdf = df.toPandas().sort_values("ts").reset_index(drop=True)
    head_n = int(len(pdf) * 0.75)
    df1 = spark.createDataFrame(pdf.iloc[:head_n], schema=df.schema)
    src = str(tmp_path / "src")
    fixtures.replay_in_order(spark, df1, src, n_chunks=3, ts_col="ts")
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    job = StreamingSynopsisJob(spec=_spec(), sink_dir=sink,
                               watermark_delay="40 days")
    job.start(spark, src, ckpt, max_files_per_trigger=1).awaitTermination(300)

    keys = list(range(150))
    def estimates(state_df):
        return sorted((str(r["window_start"]), r["key"], r["est_count"])
                      for r in ev.frequency_estimates(state_df, keys).collect())

    live_before = estimates(job.read_state_df(spark))
    v2_before = estimates(job.read_state_df(spark, as_of_version=2))
    files_before = len({p for p in job._read_ledger()["manifest"].values()})
    assert files_before > 1

    out = job.compact_snapshots(spark)
    assert out["compacted"] and out["files_before"] == files_before
    assert out["files_after"] == 1 and out["version"] == 4

    # pure rewrite: live read identical, row-for-row (including blobs)
    assert estimates(job.read_state_df(spark)) == live_before
    assert job.read_state(spark).count() == \
        job.read_state(spark, as_of_version=4).count()
    # pre-compaction time travel still served by the old per-window files
    assert estimates(job.read_state_df(spark, as_of_version=2)) == v2_before
    # idempotent no-op when already one file
    assert job.compact_snapshots(spark)["compacted"] is False

    # a batch AFTER compaction supersedes its windows inside the compacted
    # file (mapping-aware read: no duplicates, no stale rows)
    df2 = spark.createDataFrame(pdf.iloc[head_n:], schema=df.schema)
    before = set(glob.glob(os.path.join(src, "*.parquet")))
    df2.coalesce(1).write.mode("append").parquet(src)
    for f in set(glob.glob(os.path.join(src, "*.parquet"))) - before:
        os.utime(f, (2_000_000_000, 2_000_000_000))
    job2 = StreamingSynopsisJob(spec=_spec(), sink_dir=sink,
                                watermark_delay="40 days")
    job2.start(spark, src, ckpt, max_files_per_trigger=1).awaitTermination(300)

    full = estimates(build_batch(spark.read.parquet(f"{SF}/events.parquet"),
                                 _spec()))
    assert estimates(job2.read_state_df(spark)) == full
    st = job2.read_state(spark).toPandas()
    assert not st.duplicated(["window_start", "stratum"]).any()

    # expiration reclaims the superseded per-window files AND, once every
    # window is superseded at all kept versions, the compacted file itself
    removed = job2.expire_snapshots(keep_last=1)
    assert removed > 0
    assert estimates(job2.read_state_df(spark)) == full
    with pytest.raises(ValueError, match="expired"):
        job2.read_state(spark, as_of_version=2)


def test_read_changes_incremental_scan(spark, tmp_path):
    """Iceberg incremental-read analogue: read_changes(a, b) returns
    exactly the window buckets whose data changed in (a, b], tagged
    insert/update, with the MERGED state as of b — and chaining a
    snapshot with its delta reconstructs the head."""
    from condor_spark import fixtures

    df = spark.read.parquet(f"{SF}/events.parquet")
    src = str(tmp_path / "src")
    fixtures.replay_in_order(spark, df, src, n_chunks=4, ts_col="ts")
    job = StreamingSynopsisJob(spec=_spec(), sink_dir=str(tmp_path / "sink"),
                               watermark_delay="40 days")
    job.start(spark, src, str(tmp_path / "ckpt"),
              max_files_per_trigger=1).awaitTermination(300)
    assert [s["version"] for s in job.snapshots()] == [1, 2, 3, 4]

    def rows(sdf):
        return sorted((r["window_start"], r["stratum"], bytes(r["state"]),
                       r["n"]) for r in sdf.collect())

    # from=0: the full table, all inserts
    full = job.read_changes(spark, 0)
    assert set(r["_change_type"] for r in full.collect()) == {"insert"}
    assert rows(full.drop("_change_type")) == rows(job.read_state(spark))

    files = sorted(glob.glob(os.path.join(src, "*.parquet")),
                   key=os.path.getmtime)
    day = F.date_trunc("day", F.col("ts")).cast("long") * 1_000_000
    for k in (1, 2, 3):
        prefix_ws = {r[0] for r in spark.read.parquet(*files[:k])
                     .select(day).distinct().collect()}
        tail_ws = {r[0] for r in spark.read.parquet(*files[k:])
                   .select(day).distinct().collect()}
        delta = job.read_changes(spark, k).collect()
        assert {r["window_start"] for r in delta} == tail_ws
        for r in delta:
            want = "update" if r["window_start"] in prefix_ws else "insert"
            assert r["_change_type"] == want, (k, r["window_start"])
        # snapshot k + delta(k, head) == head, replacing changed buckets
        base = {(r["window_start"], r["stratum"]): (bytes(r["state"]), r["n"])
                for r in job.read_state(spark, as_of_version=k).collect()}
        for r in delta:
            base[(r["window_start"], r["stratum"])] = (bytes(r["state"]),
                                                       r["n"])
        head = {(r["window_start"], r["stratum"]): (bytes(r["state"]), r["n"])
                for r in job.read_state(spark).collect()}
        assert base == head, f"delta from v{k} does not reconstruct head"

    # bad endpoints fail loudly
    with pytest.raises(ValueError):
        job.read_changes(spark, 3, 2)
    with pytest.raises(ValueError):
        job.read_changes(spark, 0, 9)


def test_read_changes_skips_compaction_and_survives_expiry(spark, tmp_path):
    """Compaction is a pure rewrite: it must contribute NO changes — also
    after expiration deletes the original per-window files (the compaction
    ledger entry carries the packed windows' data versions forward). A
    batch landing after the compaction shows up as exactly its touched
    windows."""
    from condor_spark import fixtures

    df = spark.read.parquet(f"{SF}/events.parquet")
    pdf = df.orderBy("ts").toPandas()
    head_n = int(len(pdf) * 0.75)
    src = str(tmp_path / "src")
    fixtures.replay_in_order(
        spark, spark.createDataFrame(pdf.iloc[:head_n], schema=df.schema),
        src, n_chunks=3, ts_col="ts")
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    job = StreamingSynopsisJob(spec=_spec(), sink_dir=sink,
                               watermark_delay="40 days")
    job.start(spark, src, ckpt, max_files_per_trigger=1).awaitTermination(300)
    v_pre = job._read_ledger()["version"]          # 3
    out = job.compact_snapshots(spark)
    v_comp = out["version"]                         # 4
    assert job.read_changes(spark, v_pre, v_comp).count() == 0

    # late batch after the compaction: delta is exactly its windows
    fixtures.replay_in_order(
        spark, spark.createDataFrame(pdf.iloc[head_n:], schema=df.schema),
        src, n_chunks=1, ts_col="ts", base=1_000_000_100)
    job.start(spark, src, ckpt, max_files_per_trigger=1).awaitTermination(300)
    v_head = job._read_ledger()["version"]          # 5
    day = F.date_trunc("day", F.col("ts")).cast("long") * 1_000_000
    tail = spark.createDataFrame(pdf.iloc[head_n:], schema=df.schema)
    tail_ws = {r[0] for r in tail.select(day).distinct().collect()}
    pre_ws = {r[0] for r in
              spark.createDataFrame(pdf.iloc[:head_n], schema=df.schema)
              .select(day).distinct().collect()}
    delta = job.read_changes(spark, v_comp, v_head).collect()
    assert {r["window_start"] for r in delta} == tail_ws
    for r in delta:
        want = "update" if r["window_start"] in pre_ws else "insert"
        assert r["_change_type"] == want
    # same delta when measured across the compaction commit
    across = job.read_changes(spark, v_pre, v_head).collect()
    assert sorted((r["window_start"], r["_change_type"]) for r in across) == \
        sorted((r["window_start"], r["_change_type"]) for r in delta)

    # expiry: deltas between kept snapshots stay exact, expired ones raise
    job.expire_snapshots(keep_last=2)
    assert job.read_changes(spark, v_comp, v_head).count() == len(delta)
    assert job.read_changes(spark, v_comp, v_comp).count() == 0
    with pytest.raises(ValueError, match="expired"):
        job.read_changes(spark, 1, v_head)
