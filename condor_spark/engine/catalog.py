"""Table-format abstraction: Iceberg when available, parquet dirs otherwise.

The north rule's input/output tables are Iceberg; this sandbox ships no
``iceberg-spark-runtime`` jar (checked: none under the pyspark jars dir), so
every call sites goes through this module instead of hard-coding a format.
On a cluster with Iceberg on the classpath, ``Catalog`` transparently
switches to Iceberg tables — the engine code (readers, streaming sources,
exactly-once sink keying) is format-agnostic by construction
(SURVEY.md §7.3).

Iceberg detection is *capability-based* (can Spark resolve the Iceberg
catalog class), not version-sniffing. The exactly-once sink contract is
identical either way: the ledger/upsert keying in ``streaming.py`` and
Spark's file-sink transaction log never depend on table format.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.catalog.Catalog")
        return True
    except Exception:
        return False


@dataclass
class Catalog:
    """Uniform read/write/stream surface over Iceberg or parquet-dir tables.

    parquet mode: a table name maps to ``{root}/{name}`` (a parquet dir).
    iceberg mode: a table name maps to ``{namespace}.{name}`` in the
    session catalog; streaming reads use the Iceberg streaming source.
    """
    spark: SparkSession
    root: str
    namespace: str = "condor"
    force_parquet: bool = False

    @property
    def is_iceberg(self) -> bool:
        return not self.force_parquet and iceberg_available(self.spark)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _ident(self, name: str) -> str:
        return f"{self.namespace}.{name}"

    # -------------------------------------------------------------- batch
    def read(self, name: str) -> DataFrame:
        if self.is_iceberg:
            return self.spark.read.format("iceberg").load(self._ident(name))
        return self.spark.read.parquet(self._path(name))

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        if self.is_iceberg:
            (df.writeTo(self._ident(name)).using("iceberg")
             .createOrReplace() if mode == "overwrite"
             else df.writeTo(self._ident(name)).append())
        else:
            df.write.mode(mode).parquet(self._path(name))

    # ---------------------------------------------------------- bucketing
    def _bucketed_ident(self, name: str) -> str:
        # session-catalog table name (in-memory catalog in this sandbox;
        # hive/iceberg metastore on a real cluster)
        return f"{self.namespace}_{name}"

    def write_bucketed(self, df: DataFrame, name: str, bucket_cols: list,
                       num_buckets: int, sort_cols: list | None = None,
                       mode: str = "overwrite") -> None:
        """Bucketed write — the co-location primitive for the 100 TB posture:
        rows are hash-routed into ``num_buckets`` files per partition by
        ``bucket_cols``, and the layout is recorded in the catalog, so any
        join or aggregation keyed on those columns reads each bucket
        co-located and plans with ZERO Exchange (asserted in
        ``tests/test_catalog.py``; captured plan in PLANS.md §10). On
        Iceberg this is the ``bucket(N, col)`` partition transform; on the
        parquet fallback it is Spark's native ``bucketBy`` + ``saveAsTable``
        (bucket metadata requires a catalog table, not a bare path)."""
        if self.is_iceberg:
            from pyspark.sql import functions as F
            writer = df.writeTo(self._ident(name)).using("iceberg") \
                .partitionedBy(F.bucket(num_buckets, bucket_cols[0]))
            writer.createOrReplace()
            return
        writer = (df.write.mode(mode)
                  .bucketBy(num_buckets, *bucket_cols)
                  .option("path", self._path(name)))
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        writer.saveAsTable(self._bucketed_ident(name))

    def read_bucketed(self, name: str) -> DataFrame:
        """Read via the catalog identifier — a plain path read would drop the
        bucket metadata and reintroduce the shuffle."""
        if self.is_iceberg:
            return self.read(name)
        return self.spark.table(self._bucketed_ident(name))

    # ---------------------------------------------------------- streaming
    def read_stream(self, name: str, schema=None,
                    max_files_per_trigger: int = 4) -> DataFrame:
        if self.is_iceberg:
            return (self.spark.readStream.format("iceberg")
                    .load(self._ident(name)))
        if schema is None:
            schema = self.spark.read.parquet(self._path(name)).schema
        return (self.spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", max_files_per_trigger)
                .parquet(self._path(name)))

    def write_stream(self, df: DataFrame, name: str, checkpoint_dir: str,
                     available_now: bool = True):
        writer = df.writeStream.option("checkpointLocation", checkpoint_dir)
        if self.is_iceberg:
            writer = writer.format("iceberg").toTable(self._ident(name))
            return writer
        writer = (writer.format("parquet")
                  .option("path", self._path(name))
                  .outputMode("append"))
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
