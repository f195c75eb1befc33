"""Deployment contract: the job artifact runs under spark-submit --py-files
from a directory where the package is NOT importable, proving the zip is the
only code channel — exactly how it ships to a multi-executor cluster."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _make_zip(tmp_path) -> str:
    zpath = str(tmp_path / "condor_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "condor_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.slow
def test_spark_submit_batch_job(tmp_path):
    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH"
    out = str(tmp_path / "syn_out")
    cmd = [
        spark_submit, "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--py-files", _make_zip(tmp_path),
        os.path.join(REPO, "jobs", "synopsis_job.py"),
        "--mode", "batch",
        "--input", f"{SF}/events.parquet",
        "--sink", out,
        "--kind", "countmin",
        "--params", '{"width": 2048, "height": 5, "seed": 7}',
        "--column", "user_id", "--ts-column", "ts", "--window", "1 day",
    ]
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    r = subprocess.run(cmd, cwd=str(tmp_path), env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-4000:]

    # validate the produced synopsis table in-process
    from condor_spark.engine import evaluate as ev
    from pyspark.sql import SparkSession
    spark = SparkSession.getActiveSession() or (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate())
    syn = spark.read.parquet(out)
    assert syn.count() == 30  # one window per day of January
    ests = ev.frequency_estimates(syn, [1, 2, 3])
    assert ests.count() == 90


@pytest.mark.slow
def test_spark_submit_sql_stream_job(tmp_path):
    """The pure-JVM streaming mode ships through the same --py-files
    artifact: sketch cells as native streaming aggregation state, closed
    windows assembled to blobs in idempotent batch dirs."""
    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH"
    out = str(tmp_path / "sql_out")
    ckpt = str(tmp_path / "sql_ckpt")
    # FileStreamSource needs a DIRECTORY source; stage the single-file table
    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(f"{SF}/events.parquet", f"{src}/events.parquet")
    cmd = [
        spark_submit, "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--py-files", _make_zip(tmp_path),
        os.path.join(REPO, "jobs", "synopsis_job.py"),
        "--mode", "sql",
        "--input", src,
        "--sink", out,
        "--checkpoint", ckpt,
        "--kind", "countmin",
        "--params", '{"width": 2048, "height": 5, "seed": 7}',
        "--column", "user_id", "--ts-column", "ts", "--window", "1 day",
        "--watermark-delay", "1 hour",
    ]
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    r = subprocess.run(cmd, cwd=str(tmp_path), env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-4000:]

    # every window the stream closed must match the batch build exactly
    from pyspark.sql import SparkSession
    from condor_spark.engine.builder import SynopsisSpec
    from condor_spark.engine.sqlbuild import build_sketch_sql
    from condor_spark.engine.windows import Tumbling
    spark = SparkSession.getActiveSession() or (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate())
    got = {r2["window_start"]: (bytes(r2["state"]), r2["n"])
           for r2 in spark.read.parquet(out).collect()}
    assert len(got) >= 25  # all but the watermark-open tail of 30 days
    spec = SynopsisSpec(kind="countmin", params=dict(width=2048, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling("1 day"))
    df = spark.read.parquet(f"{SF}/events.parquet")
    want = {r2["window_start"]: (bytes(r2["state"]), r2["n"])
            for r2 in build_sketch_sql(df, spec).collect()}
    for k, v in got.items():
        assert want[k] == v, k


@pytest.mark.slow
def test_spark_submit_features_job(tmp_path):
    """--mode features materializes the decoded feature table (the audio
    scale lever): streaming append with checkpoint, resumable and
    idempotent — a second run with the same checkpoint adds no rows."""
    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH"

    from pyspark.sql import SparkSession

    from condor_spark import fixtures
    from condor_spark.engine.audio import decode_features_arrow

    spark = SparkSession.getActiveSession() or (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate())
    src = str(tmp_path / "clips")
    clips = fixtures.audio_clips(spark, 120, num_partitions=3)
    clips.write.parquet(src)

    sink = str(tmp_path / "features")
    cmd = [
        spark_submit, "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--py-files", _make_zip(tmp_path),
        os.path.join(REPO, "jobs", "synopsis_job.py"),
        "--mode", "features",
        "--input", src, "--sink", sink,
        "--checkpoint", str(tmp_path / "ckpt"),
    ]
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    r = subprocess.run(cmd, cwd=str(tmp_path), env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-4000:]

    got = (spark.read.parquet(sink).toPandas()
           .sort_values("clip_id").reset_index(drop=True))
    want = (decode_features_arrow(spark.read.parquet(src),
                                  passthrough=("ts",)).toPandas()
            .sort_values("clip_id").reset_index(drop=True))
    assert len(got) == 120
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c

    # resume with the same checkpoint: no new input files -> no new rows
    r2 = subprocess.run(cmd, cwd=str(tmp_path), env=env,
                        capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-4000:]
    assert spark.read.parquet(sink).count() == 120

    # --spectral materializes the rfft shape features instead (one-shot
    # batch path), equal to the in-process operator
    from condor_spark.engine.audio import spectral_features
    spec_sink = str(tmp_path / "spectral")
    cmd_spec = cmd[:cmd.index("--sink") + 1] + [spec_sink, "--spectral"]
    r3 = subprocess.run(cmd_spec, cwd=str(tmp_path), env=env,
                        capture_output=True, text=True, timeout=600)
    assert r3.returncode == 0, r3.stderr[-4000:]
    got = (spark.read.parquet(spec_sink).toPandas()
           .sort_values("clip_id").reset_index(drop=True))
    want = (spectral_features(spark.read.parquet(src), passthrough=("ts",))
            .toPandas().sort_values("clip_id").reset_index(drop=True))
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


@pytest.mark.slow
def test_spark_submit_querylatest_job(tmp_path):
    """Deployment surface for the query path: one spark-submit job maintains
    the snapshot AND answers a point-query stream against the newest window
    (codegen answer plan). Answers must equal the newest window's exact
    counts."""
    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH"

    from pyspark.sql import SparkSession, functions as F

    from condor_spark import fixtures

    spark = SparkSession.getActiveSession() or (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate())
    events = spark.read.parquet(f"{SF}/events.parquet")
    src = str(tmp_path / "src")
    fixtures.replay_in_order(spark, events, src, n_chunks=3)
    keys = sorted(r[0] for r in events.select("user_id").distinct().collect())
    qsrc = str(tmp_path / "qsrc")
    (spark.createDataFrame([(k,) for k in keys], "key long")
     .coalesce(1).write.parquet(qsrc))
    latest_ws = (events.groupBy(F.window("ts", "1 day").alias("w")).count()
                 .orderBy(F.col("w.start").desc()).first())
    exact = {str(r["user_id"]): r["c"] for r in
             events.filter(F.col("ts") >= latest_ws["w"]["start"])
             .groupBy("user_id").agg(F.count("*").alias("c")).collect()}

    sink = str(tmp_path / "out")
    cmd = [
        spark_submit, "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--py-files", _make_zip(tmp_path),
        os.path.join(REPO, "jobs", "synopsis_job.py"),
        "--mode", "querylatest",
        "--input", src, "--queries", qsrc,
        "--sink", sink, "--checkpoint", str(tmp_path / "ckpt"),
        "--kind", "countmin",
        "--params", '{"width": 8192, "height": 5, "seed": 7}',
        "--column", "user_id", "--ts-column", "ts", "--window", "1 day",
        "--watermark-delay", "1 hour",
    ]
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    r = subprocess.run(cmd, cwd=str(tmp_path), env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-4000:]

    import glob as _glob
    dirs = sorted(_glob.glob(os.path.join(sink, "answers", "batch=*")))
    got = spark.read.option("basePath", f"{sink}/answers").parquet(*dirs)
    pdf = got.toPandas()
    assert len(pdf) == len(keys)
    for _, row in pdf.iterrows():
        assert row["est_count"] == exact.get(row["key"], 0), row["key"]


@pytest.mark.slow
def test_spark_submit_querylatest_quantile_job(tmp_path):
    """The deployed query job serves QUANTILE streams too: --kind ddsketch
    with a q-valued query table; answers must equal the committed snapshot
    kernel's quantile() for every q."""
    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH"

    from pyspark.sql import SparkSession, functions as F

    from condor_spark import fixtures
    from condor_spark.engine.streaming import StreamingSynopsisJob
    from condor_spark.engine.builder import SynopsisSpec
    from condor_spark.synopsis.base import Synopsis

    spark = SparkSession.getActiveSession() or (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate())
    events = spark.read.parquet(f"{SF}/events.parquet")
    src = str(tmp_path / "src")
    fixtures.replay_in_order(spark, events, src, n_chunks=2)
    qs = [0.25, 0.5, 0.9]
    qsrc = str(tmp_path / "qsrc")
    (spark.createDataFrame([(q,) for q in qs], "q double")
     .coalesce(1).write.parquet(qsrc))

    sink = str(tmp_path / "out")
    cmd = [
        spark_submit, "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--py-files", _make_zip(tmp_path),
        os.path.join(REPO, "jobs", "synopsis_job.py"),
        "--mode", "querylatest",
        "--input", src, "--queries", qsrc,
        "--sink", sink, "--checkpoint", str(tmp_path / "ckpt"),
        "--kind", "ddsketch", "--params", '{"relative_accuracy": 0.02}',
        "--column", "value", "--ts-column", "ts", "--window", "1 day",
        "--watermark-delay", "1 hour", "--query-key", "q",
    ]
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    r = subprocess.run(cmd, cwd=str(tmp_path), env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-4000:]

    import glob as _glob
    dirs = sorted(_glob.glob(os.path.join(sink, "answers", "batch=*")))
    got = (spark.read.option("basePath", f"{sink}/answers").parquet(*dirs)
           .toPandas())
    assert len(got) == len(qs)
    spec = SynopsisSpec(kind="ddsketch", params=dict(relative_accuracy=0.02),
                        column="value", ts_column="ts")
    job = StreamingSynopsisJob(spec, sink_dir=f"{sink}/snapshot")
    state = job.read_state_df(spark)
    syn = Synopsis.from_bytes(bytes(
        state.orderBy(F.col("window_end").desc()).limit(1)
        .collect()[0]["state"]))
    for _, row in got.iterrows():
        assert row["est_value"] == syn.quantile(float(row["key"])), row["key"]


@pytest.mark.slow
def test_spark_submit_snapshots_mode(tmp_path):
    """Table maintenance ships too: time-travel export + history expiry on
    an existing sink, from the same --py-files artifact."""
    # build a 3-batch sink in-process first
    from pyspark.sql import SparkSession
    from condor_spark import fixtures
    from condor_spark.engine.builder import SynopsisSpec
    from condor_spark.engine.streaming import StreamingSynopsisJob
    from condor_spark.engine.windows import Tumbling

    spark = SparkSession.getActiveSession() or (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate())
    df = spark.read.parquet(f"{SF}/events.parquet")
    src = str(tmp_path / "src")
    fixtures.replay_in_order(spark, df, src, n_chunks=3, ts_col="ts")
    sink = str(tmp_path / "sink")
    spec = SynopsisSpec(kind="countmin",
                        params=dict(width=2048, height=5, seed=7),
                        column="user_id", ts_column="ts",
                        window=Tumbling("1 day"))
    job = StreamingSynopsisJob(spec=spec, sink_dir=sink,
                               watermark_delay="40 days")
    q = job.start(spark, src, str(tmp_path / "ckpt"),
                  max_files_per_trigger=1)
    assert q.awaitTermination(300)

    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH"
    export = str(tmp_path / "asof2")
    cmd = [
        spark_submit, "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--py-files", _make_zip(tmp_path),
        os.path.join(REPO, "jobs", "synopsis_job.py"),
        "--mode", "snapshots",
        "--input", sink, "--sink", export,
        "--as-of-version", "2", "--expire-keep-last", "2",
    ]
    # a second maintenance run exports the incremental delta since v2
    delta_dir = str(tmp_path / "delta2")
    cmd_delta = cmd[:cmd.index("--sink") + 1] + [
        delta_dir, "--changes-since", "2"]
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    r = subprocess.run(cmd, cwd=str(tmp_path), env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-4000:]
    assert '"version": 3' in r.stdout and '"expired_files"' in r.stdout

    # exported snapshot == in-process time travel to v2
    got = spark.read.parquet(export)
    want = job.read_state(spark, as_of_version=2)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    # v1 expired by the CLI run (floor recorded in the shared ledger)
    with pytest.raises(ValueError, match="expired"):
        job.read_state(spark, as_of_version=1)

    # incremental read from the CLI: delta since v2 == in-process delta
    r = subprocess.run(cmd_delta, cwd=str(tmp_path), env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-4000:]
    got = spark.read.parquet(delta_dir)
    want = job.read_changes(spark, from_version=2)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    assert got.filter("_change_type not in ('insert','update')").count() == 0


@pytest.mark.slow
def test_spark_submit_audio_stream_job(tmp_path):
    """The north-rule pipeline as ONE deployed artifact: a stream of raw
    audio clips decodes to feature rows per micro-batch (--decode-audio),
    a DDSketch per day window is maintained over the rms feature by the
    exactly-once manifest sink, and the committed snapshot equals the
    batch build over the decoded feature table byte-for-byte."""
    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH"

    from pyspark.sql import SparkSession
    from condor_spark import fixtures
    spark = SparkSession.getActiveSession() or (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate())
    src = str(tmp_path / "clips")
    fixtures.replay_in_order(spark, fixtures.audio_clips(spark, 300,
                                                         num_partitions=4),
                             src, n_chunks=3, ts_col="ts")

    sink = str(tmp_path / "sink")
    cmd = [
        spark_submit, "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--py-files", _make_zip(tmp_path),
        os.path.join(REPO, "jobs", "synopsis_job.py"),
        "--mode", "stream", "--decode-audio",
        "--input", src,
        "--sink", sink,
        "--checkpoint", str(tmp_path / "ckpt"),
        "--kind", "ddsketch",
        "--params", '{"relative_accuracy": 0.01, "max_num_bins": 4096}',
        "--column", "rms", "--ts-column", "ts", "--window", "1 day",
        "--watermark-delay", "1 hour",
        "--max-files-per-trigger", "1",
    ]
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    r = subprocess.run(cmd, cwd=str(tmp_path), env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-4000:]

    from condor_spark.engine.audio import decode_features_arrow
    from condor_spark.engine.builder import SynopsisSpec, build_batch
    from condor_spark.engine.streaming import StreamingSynopsisJob
    from condor_spark.engine.windows import Tumbling
    job = StreamingSynopsisJob(spec=None, sink_dir=sink)
    got = {(r2["window_start"], r2["stratum"]): (bytes(r2["state"]), r2["n"])
           for r2 in job.read_state_df(spark).collect()}
    assert got
    feats = decode_features_arrow(spark.read.parquet(src),
                                  passthrough=("ts",))
    spec = SynopsisSpec(kind="ddsketch",
                        params=dict(relative_accuracy=0.01, max_num_bins=4096),
                        column="rms", ts_column="ts", window=Tumbling("1 day"))
    want = {(r2["window_start"], r2["stratum"]): (bytes(r2["state"]), r2["n"])
            for r2 in build_batch(feats, spec).collect()}
    assert got == want


@pytest.mark.slow
def test_spark_submit_cep_job(tmp_path):
    """--mode cep deploys a streaming CEP pattern as the same artifact:
    the submitted sequence matcher's full replay equals the in-process
    batch join."""
    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH"

    from pyspark.sql import SparkSession
    spark = SparkSession.getActiveSession() or (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate())
    from condor_spark import fixtures
    df = spark.read.parquet(f"{SF}/events.parquet")
    src = str(tmp_path / "src")
    fixtures.replay_in_order(spark, df, src, n_chunks=3, ts_col="ts")

    out = str(tmp_path / "cep_out")
    cmd = [
        spark_submit, "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--py-files", _make_zip(tmp_path),
        os.path.join(REPO, "jobs", "synopsis_job.py"),
        "--mode", "cep", "--pattern", "sequence",
        "--input", src, "--sink", out,
        "--checkpoint", str(tmp_path / "ck"),
        "--first", "signup", "--second", "purchase",
        "--within", "3 days", "--watermark-delay", "40 days",
    ]
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    r = subprocess.run(cmd, cwd=str(tmp_path), env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-4000:]

    from condor_spark.engine.cep import sequence_matches
    got = sorted(map(tuple, spark.read.parquet(out).toPandas()
                     .astype(str).values.tolist()))
    want = sorted(map(tuple, sequence_matches(df, within="3 days")
                      .toPandas().astype(str).values.tolist()))
    assert got == want and len(got) > 0


@pytest.mark.slow
def test_spark_submit_prep_job(tmp_path):
    """--mode prep materializes the preprocessed clips table (trim →
    resample → gain; same schema as the input, written back to the lake)
    as a resumable streaming append, and the per-segment audit rows with
    --segments (one-shot batch path) — both equal to the in-process
    operators."""
    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH"

    from pyspark.sql import SparkSession

    from condor_spark import fixtures
    from condor_spark.engine.audio_prep import prep_clips, prep_segments

    spark = SparkSession.getActiveSession() or (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate())
    src = str(tmp_path / "clips")
    fixtures.audio_clips(spark, 60, num_partitions=3).write.parquet(src)

    sink = str(tmp_path / "prepped")
    cmd = [
        spark_submit, "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--py-files", _make_zip(tmp_path),
        os.path.join(REPO, "jobs", "synopsis_job.py"),
        "--mode", "prep",
        "--input", src, "--sink", sink,
        "--checkpoint", str(tmp_path / "ckpt"),
    ]
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    r = subprocess.run(cmd, cwd=str(tmp_path), env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-4000:]

    got = (spark.read.parquet(sink).toPandas()
           .sort_values("clip_id").reset_index(drop=True))
    want = (prep_clips(spark.read.parquet(src)).toPandas()
            .sort_values("clip_id").reset_index(drop=True))
    assert len(got) == 60
    assert (got["sr_hz"] == 16000).all()
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c

    # resume with the same checkpoint: no new input files -> no new rows
    r2 = subprocess.run(cmd, cwd=str(tmp_path), env=env,
                        capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-4000:]
    assert spark.read.parquet(sink).count() == 60

    # --segments materializes the audit rows (one-shot batch path)
    seg_sink = str(tmp_path / "segments")
    cmd_seg = cmd[:cmd.index("--sink") + 1] + [seg_sink, "--segments"]
    r3 = subprocess.run(cmd_seg, cwd=str(tmp_path), env=env,
                        capture_output=True, text=True, timeout=600)
    assert r3.returncode == 0, r3.stderr[-4000:]
    got = (spark.read.parquet(seg_sink).toPandas()
           .sort_values(["clip_id", "seg_idx"]).reset_index(drop=True))
    want = (prep_segments(spark.read.parquet(src)).toPandas()
            .sort_values(["clip_id", "seg_idx"]).reset_index(drop=True))
    assert len(got) == len(want) > 60
    for c in got.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


@pytest.mark.slow
def test_spark_submit_dedupstream_job(tmp_path):
    """--mode dedupstream deploys streaming dedup-on-ingest: band-energy
    fingerprints over a 2-batch clip replay, pairs equal to the batch
    scorer (nothing hot at this cap), resume adds nothing, and the
    compact knob bin-packs the store."""
    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH"

    import pandas as pd
    from pyspark.sql import SparkSession

    from condor_spark import fixtures
    from condor_spark.engine.audio import (band_energy_fingerprints,
                                           fingerprint_pairs)

    spark = SparkSession.getActiveSession() or (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate())
    src = str(tmp_path / "clips")
    for f in range(2):
        pdf = pd.DataFrame([fixtures.clip_row_exact(i, param_mod=40,
                                                    gate=True)
                            for i in range(f * 40, (f + 1) * 40)])
        spark.createDataFrame(pdf).coalesce(1) \
            .write.mode("append").parquet(src)

    sink = str(tmp_path / "dedup")
    cmd = [
        spark_submit, "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--py-files", _make_zip(tmp_path),
        os.path.join(REPO, "jobs", "synopsis_job.py"),
        "--mode", "dedupstream",
        "--input", src, "--sink", sink,
        "--checkpoint", str(tmp_path / "ckpt"),
        "--max-files-per-trigger", "1",
        "--params", '{"min_matches": 3, "max_df": 4096, '
                    '"min_jaccard": 0.6, "compact": true}',
    ]
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    r = subprocess.run(cmd, cwd=str(tmp_path), env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-4000:]
    summary = json.loads([l for l in r.stdout.strip().splitlines()
                          if l.startswith("{")][-1])
    assert summary["batches"] == 2
    assert summary["compact"]["compacted"] == 2

    got = (spark.read.parquet(f"{sink}/pairs/*.parquet")
           .toPandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    clips = fixtures.audio_clips_exact(spark, 80, num_partitions=4,
                                       param_mod=40, gate=True)
    want = (fingerprint_pairs(band_energy_fingerprints(clips),
                              min_matches=3, max_df=4096, min_jaccard=0.6)
            .toPandas().sort_values(["id_a", "id_b"])
            .reset_index(drop=True))
    assert len(got) == len(want) == 40
    for c in ("id_a", "id_b", "n_match", "jaccard"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c

    # resume with the same checkpoint: no new files -> nothing changes
    r2 = subprocess.run(cmd, cwd=str(tmp_path), env=env,
                        capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-4000:]
    s2 = json.loads([l for l in r2.stdout.strip().splitlines()
                     if l.startswith("{")][-1])
    assert s2["batches"] == 2 and s2["pairs"] == summary["pairs"]


def test_spark_submit_overlap_job(tmp_path):
    """Deployable contamination monitoring: `--mode stream --kind kmv
    --stratify-by event_type` maintains per-corpus KMV state through the
    exactly-once sink, then `--mode overlap` reports per-window
    union/intersection/Jaccard between two strata — and the report equals
    the in-process batch build exactly (KMV is deterministic)."""
    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH"
    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(f"{SF}/events.parquet", f"{src}/events.parquet")
    sink = str(tmp_path / "sink")
    report = str(tmp_path / "report")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    common = [spark_submit, "--master", "local[4]",
              "--conf", "spark.ui.enabled=false",
              "--conf", "spark.sql.shuffle.partitions=4",
              "--conf", "spark.sql.session.timeZone=UTC",
              "--py-files", _make_zip(tmp_path),
              os.path.join(REPO, "jobs", "synopsis_job.py")]
    r = subprocess.run(common + [
        "--mode", "stream", "--input", src, "--sink", sink,
        "--checkpoint", str(tmp_path / "ckpt"),
        "--kind", "kmv", "--params", '{"k": 256, "seed": 7}',
        "--column", "user_id", "--ts-column", "ts", "--window", "1 day",
        "--stratify-by", "event_type", "--watermark-delay", "40 days",
    ], cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600)
    assert r.returncode == 0, r.stderr[-4000:]
    r = subprocess.run(common + [
        "--mode", "overlap", "--input", sink, "--sink", report,
        "--stratum-a", "click", "--stratum-b", "view",
    ], cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600)
    assert r.returncode == 0, r.stderr[-4000:]

    from pyspark.sql import SparkSession, functions as F
    from condor_spark.engine import evaluate as ev
    from condor_spark.engine.builder import SynopsisSpec, build_batch
    from condor_spark.engine.windows import Tumbling
    spark = SparkSession.getActiveSession() or (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate())
    got = sorted(
        (str(r2["window_start"]), r2["est_a"], r2["est_b"], r2["est_union"],
         r2["est_intersection"], r2["jaccard"])
        for r2 in spark.read.parquet(report).collect())
    spec = SynopsisSpec(kind="kmv", params=dict(k=256, seed=7),
                        column="user_id", ts_column="ts",
                        window=Tumbling("1 day"), stratify_by="event_type")
    built = build_batch(spark.read.parquet(f"{SF}/events.parquet"), spec)
    want = sorted(
        (str(r2["window_start"]), r2["est_a"], r2["est_b"], r2["est_union"],
         r2["est_intersection"], r2["jaccard"])
        for r2 in ev.overlap_strata(built, "click", "view").collect())
    assert got == want and got
