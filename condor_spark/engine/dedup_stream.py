"""Streaming near-duplicate dedup — dedup-on-INGEST for training-data
pipelines: as clips (or documents) arrive, each micro-batch's fingerprints
join an accumulating fingerprint store, so duplicate pairs surface the
moment the second member lands instead of in a nightly batch sweep. The
reference has no payload dedup at all; this is the streaming twin of the
batch pair scorers (`audio.fingerprint_pairs`, `text.minhash_dedup_pairs`'
candidate stage) built on the same exactly-once ledger discipline as
`streaming.StreamingSynopsisJob`.

Generic over the fingerprint extractor: ``fingerprint_fn(df) ->
DataFrame(id, fp)`` — audio band-energy shingles, spectral landmarks,
text shingle hashes, minhash band signatures all fit (any near-dup family
whose candidate step is an equi-join on a fingerprint key).

Semantics vs the batch scorer: each pair is emitted once, in the first
batch where both members have arrived, with n_match / Jaccard computed
under the document-frequency cap AS OF that batch (df counts are
monotone, so once a fingerprint is hot it stays hot). When no fingerprint
ever crosses ``max_df`` the streamed pair set equals the batch scorer's
output EXACTLY (the driver query ``stream_fp_dedup`` proves this against
the same DuckDB replay as the batch oracle); when one does, pairs
discovered before the crossing keep their discovery-time metrics — the
standard streaming-knowledge caveat, tested explicitly.

Exactly-once: per-batch outputs go to deterministic paths
(``fps/b{batch_id}.parquet``, ``pairs/b{batch_id}.parquet``) and an
atomic ledger commit (os.replace) marks the batch done; a replayed batch
that already committed is skipped, and a crash before commit replays
onto the same paths with the same committed-store input — identical
output, no duplicates.

Scale posture: the per-batch work is (batch fps) ⋈ (store fps) — an
equi-join on fp, never all-pairs; the stop-fp cap bounds any bucket's
fan-out at max_df². The store scan is the inherent cost of
dedup-on-ingest; at warehouse scale the store is a table bucketed by fp
(co-located join, no store shuffle) and this module's manifest-of-
parquet-files stands in for it. Pair scoring shuffles one short row per
surviving pair (map-side combine first).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAIR_SCHEMA = ("id_a string, id_b string, n_match long, jaccard double, "
               "batch_id long")


class _AtomicLedger:
    """Shared atomic-ledger discipline (one copy — StreamFpDedup and
    StreamDecontaminate both commit through it): deterministic per-batch
    output paths + a single ``os.replace`` commit point, so a replayed
    committed batch is a no-op and a crash before commit replays to
    identical output."""

    @property
    def _ledger_path(self) -> str:
        return os.path.join(self.sink_dir, "ledger.json")

    def _read_ledger(self) -> dict:
        if os.path.exists(self._ledger_path):
            with open(self._ledger_path) as f:
                return json.load(f)
        return {"committed": {}}

    def _commit(self, ledger: dict) -> None:
        tmp = self._ledger_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(ledger, f)
        os.replace(tmp, self._ledger_path)


@dataclass
class StreamDecontaminate(_AtomicLedger):
    """Decontamination-on-INGEST: score each arriving micro-batch of
    documents against a STATIC train-corpus n-gram set
    (``text.contamination_scores`` semantics) and append the per-doc
    verdicts through the same atomic-ledger exactly-once discipline as
    ``StreamFpDedup``. Because a document's score depends only on the
    document and the static gram set, the union of per-batch outputs is
    EXACTLY the batch run over the same rows — the driver query
    ``stream_decontaminate`` shares the batch oracle.

    ``prepare(spark, train_df)`` materializes the distinct gram set once
    (the expensive side — at warehouse scale a bucketed table); every
    batch then pays one hit-marking hash join against it, never a rescan
    of the train corpus.
    """

    sink_dir: str
    n: int = 13
    threshold: float = 0.5
    id_col: str = "doc_id"
    text_col: str = "text"
    #: Spark DDL type of ``id_col`` — contamination_scores preserves the
    #: input id type, so the empty-ledger schema must match it (string doc
    #: ids would otherwise diverge from the non-empty case). Detected from
    #: the train corpus at prepare() and PERSISTED in the ledger (so a
    #: fresh process on the same sink_dir sees it before any batch
    #: commits), then pinned to the first committed batch's ACTUAL scores
    #: schema, which is authoritative if train and stream id types differ.
    id_type: str = "long"

    @property
    def _grams_path(self) -> str:
        return os.path.join(self.sink_dir, "train_grams.parquet")

    def prepare(self, spark: SparkSession, train_df: DataFrame) -> None:
        from .text import train_gram_set

        os.makedirs(self.sink_dir, exist_ok=True)
        if self.id_col in train_df.columns:
            self.id_type = train_df.schema[self.id_col].dataType.simpleString()
            ledger = self._read_ledger()
            ledger["id_type"] = self.id_type
            self._commit(ledger)
        (train_gram_set(train_df, self.id_col, self.text_col, self.n)
         .write.mode("overwrite").parquet(self._grams_path))

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from .text import contamination_scores

        ledger = self._read_ledger()
        if str(batch_id) in ledger["committed"]:
            return  # replay of a committed batch: exactly-once no-op
        spark = batch_df.sparkSession
        grams = spark.read.parquet(self._grams_path)
        scores = contamination_scores(
            batch_df, None, self.id_col, self.text_col, self.n,
            self.threshold, train_grams=grams)
        path = os.path.join(self.sink_dir, "scores",
                            f"b{int(batch_id)}.parquet")
        scores.write.mode("overwrite").parquet(path)
        ledger["committed"][str(batch_id)] = {"scores": path}
        # the committed scores' own id type wins over the train-corpus
        # detection (contamination_scores preserves the BATCH id type)
        ledger["id_type"] = scores.schema[self.id_col].dataType.simpleString()
        self._commit(ledger)

    def run(self, spark: SparkSession, input_dir: str, checkpoint: str,
            max_files_per_trigger: int = 1):
        src = (spark.readStream
               .option("maxFilesPerTrigger", max_files_per_trigger)
               .schema(spark.read.parquet(input_dir).schema)
               .parquet(input_dir))
        q = (src.writeStream
             .foreachBatch(self.process_batch)
             .option("checkpointLocation", checkpoint)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        return q

    def read_scores(self, spark: SparkSession) -> DataFrame:
        led = self._read_ledger()
        paths = [e["scores"] for e in led["committed"].values()]
        if not paths:
            id_type = led.get("id_type", self.id_type)
            return spark.createDataFrame(
                [], f"{self.id_col} {id_type}, n_grams long, "
                    "n_hits long, contamination_ratio double, "
                    "contaminated boolean")
        return spark.read.parquet(*paths)


@dataclass
class StreamFpDedup(_AtomicLedger):
    sink_dir: str
    fingerprint_fn: Callable[[DataFrame], DataFrame]
    min_matches: int = 3
    max_df: int | None = 64
    min_jaccard: float | None = None
    id_col: str = "clip_id"

    # ---------------- per-batch body --------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        ledger = self._read_ledger()
        if str(batch_id) in ledger["committed"]:
            return  # replay of a committed batch: exactly-once no-op
        spark = batch_df.sparkSession
        fps_b = (self.fingerprint_fn(batch_df)
                 .toDF("id", "fp")
                 .dropDuplicates(["id", "fp"])
                 .persist())
        # set(): after compact() many batches share one path — reading it
        # once per batch would double-count store df and per-id counts
        store_paths = sorted({e["fps"]
                              for e in ledger["committed"].values()})
        if store_paths:
            store = spark.read.parquet(*store_paths).toDF("id", "fp")
            all_fps = store.unionByName(fps_b)
        else:
            store, all_fps = None, fps_b
        if self.max_df is not None:
            # hot set AS OF this batch (df counts are monotone: once hot,
            # always hot — so committed pairs never need retraction to
            # stay consistent with their own discovery time)
            keep = (all_fps.groupBy("fp")
                    .agg(F.count(F.lit(1)).alias("df_"))
                    .filter(F.col("df_") <= int(self.max_df))
                    .select("fp"))
            eff_all = all_fps.join(keep, "fp")
            eff_b = fps_b.join(keep, "fp")
        else:
            eff_all, eff_b = all_fps, fps_b
        eff_all = eff_all.persist()
        counts = eff_all.groupBy("id").agg(F.count(F.lit(1)).alias("nfp"))
        # candidate pairs touching this batch, each exactly once:
        #   P1 = batch x everything   with a.id < b.id
        #   P2 = store-only x batch   with a.id < b.id
        a1 = eff_b.select(F.col("id").alias("id_a"), "fp")
        b1 = eff_all.select(F.col("id").alias("id_b"), "fp")
        p1 = a1.join(b1, "fp").filter(F.col("id_a") < F.col("id_b"))
        if store is not None:
            batch_ids = fps_b.select("id").distinct()
            store_only = (eff_all.join(batch_ids, "id", "left_anti"))
            a2 = store_only.select(F.col("id").alias("id_a"), "fp")
            b2 = eff_b.select(F.col("id").alias("id_b"), "fp")
            p2 = a2.join(b2, "fp").filter(F.col("id_a") < F.col("id_b"))
            cand = p1.unionByName(p2)
        else:
            cand = p1
        pairs = (cand.groupBy("id_a", "id_b")
                 .agg(F.count(F.lit(1)).alias("n_match"))
                 .filter(F.col("n_match") >= int(self.min_matches))
                 .join(counts.select(F.col("id").alias("id_a"),
                                     F.col("nfp").alias("na")), "id_a")
                 .join(counts.select(F.col("id").alias("id_b"),
                                     F.col("nfp").alias("nb")), "id_b")
                 .withColumn("_jac", F.col("n_match")
                                     / (F.col("na") + F.col("nb")
                                        - F.col("n_match"))))
        if self.min_jaccard is not None:
            # raw-ratio filter, matching the batch scorer + SQL oracles
            pairs = pairs.filter(F.col("_jac")
                                 >= float(self.min_jaccard))
        pairs = pairs.select("id_a", "id_b", "n_match",
                             F.round(F.col("_jac"), 6).alias("jaccard"),
                             F.lit(int(batch_id)).alias("batch_id"))
        fps_path = os.path.join(self.sink_dir, "fps",
                                f"b{int(batch_id)}.parquet")
        pairs_path = os.path.join(self.sink_dir, "pairs",
                                  f"b{int(batch_id)}.parquet")
        fps_b.write.mode("overwrite").parquet(fps_path)
        pairs.write.mode("overwrite").parquet(pairs_path)
        fps_b.unpersist(blocking=False)
        eff_all.unpersist(blocking=False)
        ledger["committed"][str(batch_id)] = {"fps": fps_path,
                                              "pairs": pairs_path}
        self._commit(ledger)

    # ---------------- run + read ------------------------------------------
    def run(self, spark: SparkSession, input_dir: str, checkpoint: str,
            max_files_per_trigger: int = 1):
        """availableNow file-replay run over a parquet input directory."""
        os.makedirs(self.sink_dir, exist_ok=True)
        src = (spark.readStream
               .option("maxFilesPerTrigger", max_files_per_trigger)
               .schema(spark.read.parquet(input_dir).schema)
               .parquet(input_dir))
        q = (src.writeStream
             .foreachBatch(self.process_batch)
             .option("checkpointLocation", checkpoint)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        return q

    def read_pairs(self, spark: SparkSession) -> DataFrame:
        led = self._read_ledger()
        paths = [e["pairs"] for e in led["committed"].values()]
        out = (spark.read.parquet(*paths) if paths
               else spark.createDataFrame([], PAIR_SCHEMA))
        return out.withColumnsRenamed({"id_a": self.id_col + "_a",
                                       "id_b": self.id_col + "_b"})

    def read_fps(self, spark: SparkSession) -> DataFrame:
        led = self._read_ledger()
        paths = sorted({e["fps"] for e in led["committed"].values()})
        if not paths:
            return spark.createDataFrame([], "id string, fp long")
        return spark.read.parquet(*paths)

    def compact(self, spark: SparkSession,
                target_files: int = 8) -> dict:
        """Bin-pack the committed fingerprint store into one compacted
        parquet (the rewriteDataFiles analogue for the dedup store): a
        long-running ingest stream otherwise accumulates one small file
        per batch, and the per-batch store scan pays one file-open per
        batch ever committed. Crash-safe in the same way as the batch
        commit: the compacted file is written first, the ledger repoint
        is one atomic os.replace, and only then are the orphaned
        per-batch files removed (a crash between the two leaves readable
        orphans, not a broken store). Pairs files are untouched — they
        are the output log, not the working set."""
        import shutil

        ledger = self._read_ledger()
        old = sorted({e["fps"] for e in ledger["committed"].values()})
        if len(old) <= 1:
            return {"compacted": 0, "files": len(old)}
        n = ledger.get("compact_epoch", 0) + 1
        path = os.path.join(self.sink_dir, "fps",
                            f"compact_e{n}.parquet")
        (spark.read.parquet(*old).coalesce(int(target_files))
         .write.mode("overwrite").parquet(path))
        for e in ledger["committed"].values():
            e["fps"] = path
        ledger["compact_epoch"] = n
        self._commit(ledger)  # atomic repoint
        for p in old:
            if os.path.abspath(p) != os.path.abspath(path):
                shutil.rmtree(p, ignore_errors=True)
        return {"compacted": len(old), "files": 1, "path": path}
