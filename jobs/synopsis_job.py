"""spark-submit entrypoint: streaming synopsis maintenance over a table dir.

North-rule deployment surface — the job runs on a real multi-executor
cluster exactly as here::

    zip -r condor_spark.zip condor_spark
    spark-submit --master <cluster> --py-files condor_spark.zip \
        jobs/synopsis_job.py \
        --input  /data/audio_clips        # parquet/Iceberg table dir \
        --sink   /out/synopses \
        --checkpoint /chk/synopses \
        --kind countmin --params '{"width": 65536, "height": 5, "seed": 7}' \
        --column rms --ts-column ts --window "1 minute" --stratify-by codec

The driver creates no SparkSession config of its own beyond shuffle
partitioning — master, executor sizing and dynamic allocation come from
spark-submit, so the same artifact runs local[N] or a 1000-executor
cluster unchanged. Resume: re-submitting with the same --checkpoint and
--sink continues from the last committed batch (exactly-once ledger,
condor_spark/engine/streaming.py).

Modes:
  --mode stream    foreachBatch snapshot sink (default; queryable open windows)
  --mode stateful  applyInPandasWithState closed-window append stream
  --mode sql       pure-JVM streaming aggregation (sqlbuild; sketch cells as
                   native streaming state — countmin/ams/hll/equiwidth/bloom)
  --mode batch     one-shot batch build of the input table
  --mode querylatest  maintain the snapshot from --input AND answer a point-
                   query stream from --queries against the newest committed
                   window (codegen answer plan, engine/pointquery.py);
                   answers land under --sink/answers, batch-idempotent
  --mode features  materialize the decoded FEATURE TABLE once (the audio
                   scale lever from BASELINE.md: downstream synopses read
                   narrow numeric rows instead of re-shipping the 60 KB
                   ``bytes`` column per job). --spectral materializes the
                   rfft shape features instead of the time-domain set.
                   Streaming append when
                   --checkpoint is given (exactly-once file sink), one-shot
                   batch otherwise. --kind/--column are not needed.
  --mode prep      materialize the PREPROCESSED clips table (training-data
                   prep, engine/audio_prep.py): silence trim → linear
                   resample to --target-sr → RMS gain normalization, same
                   schema as the input (write it back to the lake), or
                   the per-segment audit rows with --segments. Streaming
                   append when --checkpoint is given, one-shot batch
                   otherwise. --kind/--column are not needed.
  --mode dedupstream  streaming near-dup dedup-on-ingest
                   (engine/dedup_stream.py): each micro-batch's
                   fingerprints join the accumulating committed store;
                   pairs land under --sink/pairs, the fingerprint store
                   under --sink/fps (exactly-once ledger). --params is
                   the knob JSON: {"extractor": "band"|"landmark"|"text",
                   "min_matches": N, "max_df": N|null, "min_jaccard": F,
                   "compact": true} — "compact" bin-packs the store after
                   the run. --kind/--column are not needed.
  --mode decontaminate  decontamination-on-ingest (engine/dedup_stream.py
                   StreamDecontaminate): score arriving docs against a
                   once-materialized train-corpus n-gram set; verdicts
                   land under --sink/scores (exactly-once ledger). The
                   gram set is built on first run and reused on restarts
                   (refresh with {"refresh_grams": true}). --params knobs:
                   {"train": "<parquet>", "n": N, "threshold": F}.
                   --kind/--column are not needed.
  --mode snapshots table maintenance on an existing stream sink: list the
                   committed snapshot history, export one (--as-of-version,
                   time travel), export the delta since a version
                   (--changes-since V, incremental read / changelog),
                   bin-pack the live manifest (--compact N,
                   rewriteDataFiles analogue) and/or expire history
                   (--expire-keep-last N). Spec-agnostic.
  --mode overlap   contamination report on an existing STRATIFIED KMV
                   stream sink (--input = that sink dir; pair with
                   `--mode stream --kind kmv --stratify-by <corpus_col>`):
                   per-window distinct / union / intersection / Jaccard
                   between --stratum-a and --stratum-b → --sink parquet;
                   --as-of-version reports against a historical snapshot.
  --mode cep       deploy a streaming CEP pattern (--pattern sequence |
                   absence | kleene | adjacent | chain) over the input
                   stream: keyed applyInPandasWithState matcher → append
                   parquet sink; --first/--mid/--second/--steps name the
                   event kinds, --within bounds the pattern. --kind/
                   --column are not needed.

--decode-audio applies to batch AND all streaming modes: raw clip rows
decode to keyed feature rows per micro-batch, executor-side, before
synopsis maintenance (the north-rule audio pipeline as one artifact).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--sink", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--kind", default=None,
                   help="synopsis kind (required except --mode features)")
    p.add_argument("--params", default="{}", help="JSON synopsis params")
    p.add_argument("--column", default=None,
                   help="input column (required except --mode features)")
    p.add_argument("--ts-column", default="ts")
    p.add_argument("--window", default="1 minute")
    p.add_argument("--slide", default=None)
    p.add_argument("--stratify-by", default=None)
    p.add_argument("--watermark-delay", default="10 seconds")
    p.add_argument("--mode", choices=("stream", "stateful", "sql", "batch",
                                      "querylatest", "features", "snapshots",
                                      "cep", "prep", "dedupstream", "overlap",
                                      "decontaminate"),
                   default="stream")
    p.add_argument("--stratum-a", default=None,
                   help="overlap mode: first corpus stratum value")
    p.add_argument("--stratum-b", default=None,
                   help="overlap mode: second corpus stratum value")
    p.add_argument("--pattern", choices=("sequence", "absence", "kleene",
                                         "adjacent", "chain"),
                   default="sequence", help="cep mode: the pattern to match")
    p.add_argument("--key-col", default="user_id")
    p.add_argument("--event-col", default="event_type")
    p.add_argument("--first", default="signup")
    p.add_argument("--mid", default="view")
    p.add_argument("--second", default="purchase")
    p.add_argument("--steps", default="signup,view,purchase",
                   help="cep chain pattern: comma-separated event kinds")
    p.add_argument("--tiebreak-col", default="event_id",
                   help="cep adjacent pattern: order tiebreak under ts ties")
    p.add_argument("--within", default="7 days")
    p.add_argument("--as-of-version", type=int, default=None,
                   help="snapshots mode: export the state AS OF this "
                        "committed version to --sink (time travel)")
    p.add_argument("--expire-keep-last", type=int, default=None,
                   help="snapshots mode: expire history, keeping the "
                        "newest N committed snapshots")
    p.add_argument("--compact", type=int, default=None, metavar="N",
                   help="snapshots mode: bin-pack the live manifest into "
                        "N consolidated state files (rewriteDataFiles "
                        "analogue); runs before any expire")
    p.add_argument("--spectral", action="store_true",
                   help="features mode: materialize spectral-shape features "
                        "(rfft centroid/bandwidth/rolloff/flatness) instead "
                        "of the time-domain set")
    p.add_argument("--target-sr", type=int, default=16000,
                   help="prep mode: resample target sample rate")
    p.add_argument("--segments", action="store_true",
                   help="prep mode: materialize the per-segment audit rows "
                        "(clip_id, seg_idx, seg_start, n_samples, energy) "
                        "instead of the processed clips table")
    p.add_argument("--changes-since", type=int, default=None, metavar="V",
                   help="snapshots mode: export only the window buckets "
                        "whose data changed after committed version V "
                        "(incremental read / changelog), tagged "
                        "insert/update, to --sink; 0 = full table")
    p.add_argument("--queries", default=None,
                   help="query-stream table dir (querylatest mode); one "
                        "integer column named by --query-key")
    p.add_argument("--query-key", default="key")
    p.add_argument("--max-files-per-trigger", type=int, default=4)
    p.add_argument("--decode-audio", action="store_true",
                   help="input is the audio-clip table: decode + extract "
                        "features first (per micro-batch in streaming "
                        "modes); --column then names a feature "
                        "(rms, peak, zcr, e_q50, n_tokens, ...)")
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import SparkSession

    from condor_spark.engine.builder import SynopsisSpec, build_batch
    from condor_spark.engine.stateful import StatefulSynopsisStream
    from condor_spark.engine.streaming import StreamingSynopsisJob
    from condor_spark.engine.windows import Sliding, Tumbling

    # Master / executor sizing come from spark-submit; the configs set here
    # are semantic or byte-bounding. Audio rows are ~60 KB of binary, so
    # row-count batch defaults (10k Arrow rows, 4096 parquet-reader rows)
    # mean 250-600 MB per in-flight task batch — enough to OOM an executor
    # heap at 32 tasks (measured 16x throughput loss locally). Bound batch
    # BYTES via row caps sized to the payload.
    spark = (SparkSession.builder.appName(
        f"condor_spark_{args.kind}_{args.mode}")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "500")
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
        .config("spark.sql.files.maxPartitionBytes", "32m")
        # match HotSpot's 8000-byte JIT limit — oversized fused codegen
        # spans otherwise run interpreted (BASELINE.md, engine/sqlbuild.py)
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        .getOrCreate())
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    if args.mode == "features":
        from condor_spark.engine.audio import (decode_features_arrow,
                                               spectral_features)
        # --spectral materializes the rfft shape features instead of the
        # time-domain set (separate operators so neither pays the other's
        # kernel; run the mode twice to get both, amortizing nothing but
        # the scan — PLANS.md §20)
        extract = spectral_features if args.spectral else decode_features_arrow
        if args.checkpoint:
            src = (spark.readStream
                   .option("maxFilesPerTrigger", args.max_files_per_trigger)
                   .schema(spark.read.parquet(args.input).schema)
                   .parquet(args.input))
            q = (extract(src, passthrough=(args.ts_column,))
                 .writeStream.format("parquet")
                 .option("path", args.sink)
                 .option("checkpointLocation", args.checkpoint)
                 .trigger(availableNow=True).start())
            q.awaitTermination()
        else:
            (extract(spark.read.parquet(args.input),
                     passthrough=(args.ts_column,))
             .write.mode("overwrite").parquet(args.sink))
        spark.stop()
        return

    if args.mode == "dedupstream":
        if not args.checkpoint:
            raise SystemExit("--checkpoint is required in dedupstream mode")
        from condor_spark.engine.dedup_stream import StreamFpDedup

        knobs = json.loads(args.params)
        extractor = knobs.get("extractor", "band")
        if extractor == "band":
            from condor_spark.engine.audio import band_energy_fingerprints

            def fpfn(df):
                return band_energy_fingerprints(df)
            id_col = "clip_id"
        elif extractor == "landmark":
            from condor_spark.engine.audio import landmark_fingerprints

            def fpfn(df):
                return landmark_fingerprints(df)
            id_col = "clip_id"
        elif extractor == "text":
            from condor_spark.engine.text import fingerprints

            def fpfn(df):
                return fingerprints(df).select("doc_id", "fingerprint")
            id_col = "doc_id"
        else:
            raise SystemExit(f"unknown extractor {extractor!r}")
        job = StreamFpDedup(
            sink_dir=args.sink, fingerprint_fn=fpfn,
            min_matches=int(knobs.get("min_matches", 3)),
            max_df=knobs.get("max_df", 64),
            min_jaccard=knobs.get("min_jaccard"),
            id_col=knobs.get("id_col", id_col))
        job.run(spark, args.input, args.checkpoint,
                max_files_per_trigger=args.max_files_per_trigger)
        summary = {"batches": len(job._read_ledger()["committed"]),
                   "pairs": job.read_pairs(spark).count()}
        if knobs.get("compact"):
            summary["compact"] = job.compact(spark)
        print(json.dumps(summary))
        spark.stop()
        return

    if args.mode == "decontaminate":
        if not args.checkpoint:
            raise SystemExit("--checkpoint is required in decontaminate mode")
        from condor_spark.engine.dedup_stream import StreamDecontaminate

        knobs = json.loads(args.params)
        train_path = knobs.get("train")
        if not train_path:
            raise SystemExit('--params {"train": "<parquet>"} is required')
        job = StreamDecontaminate(
            sink_dir=args.sink,
            n=int(knobs.get("n", 13)),
            threshold=float(knobs.get("threshold", 0.5)),
            id_col=knobs.get("id_col", "doc_id"),
            text_col=knobs.get("text_col", "text"))
        if (not os.path.isdir(job._grams_path)
                or knobs.get("refresh_grams")):
            # the once-materialized contract: a restart with the same
            # --sink reuses the stored gram table instead of rescanning
            # the train corpus
            job.prepare(spark, spark.read.parquet(train_path))
        job.run(spark, args.input, args.checkpoint,
                max_files_per_trigger=args.max_files_per_trigger)
        scores = job.read_scores(spark)
        summary = {"batches": len(job._read_ledger()["committed"]),
                   "docs": scores.count(),
                   "contaminated": scores.filter("contaminated").count()}
        print(json.dumps(summary))
        spark.stop()
        return

    if args.mode == "prep":
        from condor_spark.engine.audio_prep import prep_clips, prep_segments

        def prep(df):
            if args.segments:
                return prep_segments(df, target_sr=args.target_sr)
            return prep_clips(df, target_sr=args.target_sr)

        if args.checkpoint:
            src = (spark.readStream
                   .option("maxFilesPerTrigger", args.max_files_per_trigger)
                   .schema(spark.read.parquet(args.input).schema)
                   .parquet(args.input))
            q = (prep(src)
                 .writeStream.format("parquet")
                 .option("path", args.sink)
                 .option("checkpointLocation", args.checkpoint)
                 .trigger(availableNow=True).start())
            q.awaitTermination()
        else:
            prep(spark.read.parquet(args.input)) \
                .write.mode("overwrite").parquet(args.sink)
        spark.stop()
        return

    if args.mode == "snapshots":
        # table maintenance on an existing stream sink: list committed
        # snapshots, optionally export one (time travel) and/or expire
        # history — spec-agnostic, the manifest carries everything
        job = StreamingSynopsisJob(spec=None, sink_dir=args.input)
        print(json.dumps(job.snapshots()))
        if args.as_of_version is not None and args.changes_since is not None:
            raise SystemExit("--as-of-version and --changes-since both "
                             "export to --sink; run snapshots mode twice "
                             "with separate sinks")
        if args.as_of_version is not None:
            (job.read_state(spark, as_of_version=args.as_of_version)
             .write.mode("overwrite").parquet(args.sink))
        if args.changes_since is not None:
            (job.read_changes(spark, from_version=args.changes_since)
             .write.mode("overwrite").parquet(args.sink))
        if args.compact is not None:
            print(json.dumps(job.compact_snapshots(spark,
                                                   target_files=args.compact)))
        if args.expire_keep_last is not None:
            removed = job.expire_snapshots(keep_last=args.expire_keep_last)
            print(json.dumps({"expired_files": removed}))
        spark.stop()
        return

    if args.mode == "overlap":
        # contamination report on an EXISTING stratified KMV stream sink
        # (spec-agnostic manifest read, like snapshots mode — pair this
        # with `--mode stream --kind kmv --stratify-by <corpus_col>`):
        # per-window union / intersection / Jaccard between two strata →
        # --sink parquet. --as-of-version reports against a historical
        # snapshot (time travel).
        from condor_spark.engine.evaluate import overlap_strata

        if not (args.stratum_a and args.stratum_b):
            raise SystemExit("overlap mode needs --stratum-a and --stratum-b")
        job = StreamingSynopsisJob(spec=None, sink_dir=args.input)
        st = job.read_state_df(spark, as_of_version=args.as_of_version)
        (overlap_strata(st, args.stratum_a, args.stratum_b)
         .write.mode("overwrite").parquet(args.sink))
        spark.stop()
        return

    if args.mode == "cep":
        if args.checkpoint is None:
            raise SystemExit("--checkpoint is required in cep mode")
        from condor_spark.engine import cep as cep_mod
        common = dict(key_col=args.key_col, ts_col=args.ts_column,
                      event_col=args.event_col, within=args.within,
                      watermark_delay=args.watermark_delay)
        if args.pattern == "sequence":
            job = cep_mod.StatefulSequenceStream(
                first=args.first, second=args.second, **common)
        elif args.pattern == "absence":
            job = cep_mod.StatefulAbsenceStream(
                first=args.first, second=args.second, **common)
        elif args.pattern == "kleene":
            job = cep_mod.StatefulKleeneStream(
                first=args.first, mid=args.mid, second=args.second, **common)
        elif args.pattern == "adjacent":
            job = cep_mod.StatefulAdjacentStream(
                first=args.first, second=args.second,
                tiebreak_col=args.tiebreak_col, **common)
        else:
            job = cep_mod.StatefulChainStream(
                steps=tuple(args.steps.split(",")), **common)
        q = job.start(spark, args.input, args.sink, args.checkpoint,
                      max_files_per_trigger=args.max_files_per_trigger)
        q.awaitTermination()
        spark.stop()
        return

    if not args.kind or not args.column:
        raise SystemExit("--kind and --column are required in synopsis modes")

    window = (Sliding(args.window, args.slide) if args.slide
              else Tumbling(args.window))
    spec = SynopsisSpec(kind=args.kind, params=json.loads(args.params),
                        column=args.column, ts_column=args.ts_column,
                        window=window, stratify_by=args.stratify_by)

    if args.mode == "batch":
        df = spark.read.parquet(args.input)
        if args.decode_audio:
            from condor_spark.engine.audio import decode_features_arrow
            df = decode_features_arrow(df, passthrough=(args.ts_column,))
        build_batch(df, spec).write.mode("overwrite").parquet(args.sink)
        spark.stop()
        return

    if args.checkpoint is None:
        raise SystemExit("--checkpoint is required in streaming modes")

    transform = None
    if args.decode_audio:
        # the north-rule pipeline: the stream's (clip_id, bytes, codec, …)
        # rows decode to keyed feature rows per micro-batch, executor-side,
        # BEFORE windowed synopsis maintenance — --column then names a
        # decoded feature (rms, peak, zcr, e_q50, n_tokens, ...)
        from condor_spark.engine.audio import decode_features_arrow

        def transform(df):
            return decode_features_arrow(df, passthrough=(args.ts_column,))

    if args.mode == "sql":
        from condor_spark.engine.sqlbuild import StreamingSketchSQLJob
        job = StreamingSketchSQLJob(spec, watermark_delay=args.watermark_delay)
        q = job.start(spark, args.input, args.sink, args.checkpoint,
                      max_files_per_trigger=args.max_files_per_trigger,
                      transform=transform)
    elif args.mode == "stateful":
        job = StatefulSynopsisStream(spec, watermark_delay=args.watermark_delay)
        q = job.start(spark, args.input, args.sink, args.checkpoint,
                      max_files_per_trigger=args.max_files_per_trigger,
                      transform=transform)
    elif args.mode == "querylatest":
        if not args.queries:
            raise SystemExit("--queries is required in querylatest mode")
        from condor_spark.engine.streaming import QueryLatestStream
        job = StreamingSynopsisJob(spec, sink_dir=f"{args.sink}/snapshot",
                                   watermark_delay=args.watermark_delay)
        job.start(spark, args.input, f"{args.checkpoint}/build",
                  max_files_per_trigger=args.max_files_per_trigger,
                  transform=transform).awaitTermination()
        qkey = (tuple(args.query_key.split(","))  # "lo,hi" = range stream
                if "," in args.query_key else args.query_key)
        ql = QueryLatestStream(job, out_dir=f"{args.sink}/answers",
                               key_column=qkey)
        q = ql.start(spark, args.queries, f"{args.checkpoint}/queries",
                     max_files_per_trigger=args.max_files_per_trigger)
    else:
        job = StreamingSynopsisJob(spec, sink_dir=args.sink,
                                   watermark_delay=args.watermark_delay)
        q = job.start(spark, args.input, args.checkpoint,
                      max_files_per_trigger=args.max_files_per_trigger,
                      transform=transform)
    q.awaitTermination()
    spark.stop()


if __name__ == "__main__":
    main()
