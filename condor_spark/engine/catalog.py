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
