"""Synthetic benchmark sources — the reference's generator suite, Spark-first.

Condor's benchmark jobs feed on throttled synthetic generators
(``benchmark/.../sources/input/``):

  * ``UniformDistributionSource.java:73-117`` — key ``nextInt(1001)``,
    value ``nextInt(10)``, per-second throughput loop (the throttle);
  * ``NormalDistributionSource`` — gaussian keys;
  * ``IPaddressesSource.java:113-118`` — key ``nextInt(2^31 - 1)``;
  * ``ZipfDistributionSource.java:89-121`` — file replay of a pregenerated
    ``zipfTimestamped.gz`` (the reference does NOT sample zipf online).

Spark equivalents, all deterministic (the driver requires reproducibility):

  * the throttle is the ``rate`` source's ``rowsPerSecond`` — Spark's
    native analogue of the reference's per-second emission loop;
  * randomness derives from ``xxhash64`` of the rate source's
    monotonically increasing ``value`` (never wall-clock, never
    ``rand()``), so any replay — and any cluster size — regenerates the
    identical stream. The key transforms are pure JVM expressions inside
    whole-stage codegen: no Python anywhere in a generator;
  * zipf mirrors the reference's design: a deterministic pregenerated
    table (numpy inverse-CDF at build time) replayed as a file stream.

The ``with_*`` column transforms are exposed separately from the
``readStream`` wiring so batch jobs and tests can drive them over
``spark.range`` at any scale.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

_TWO53 = float(1 << 53)


def _u01(col, salt: int):
    """Deterministic uniform double in [0, 1) from a long column — top 53
    bits of xxhash64, the standard 64-bit-to-double construction."""
    h = F.xxhash64(col, F.lit(salt))
    return F.shiftrightunsigned(h, 11).cast("double") / F.lit(_TWO53)


def with_uniform_key(df: DataFrame, col: str = "value", key_range: int = 1001,
                     value_range: int = 10, seed: int = 7) -> DataFrame:
    """UniformDistributionSource analogue: key ~ U[0, key_range),
    val ~ U[0, value_range). Modulo of a 64-bit hash — bias O(range/2^64)."""
    return (df.withColumn("key", F.pmod(F.xxhash64(F.col(col), F.lit(seed)),
                                        F.lit(key_range)).cast("int"))
              .withColumn("val", F.pmod(F.xxhash64(F.col(col), F.lit(seed + 1)),
                                        F.lit(value_range)).cast("int")))


def with_normal_key(df: DataFrame, col: str = "value", mean: float = 500.0,
                    std: float = 100.0, seed: int = 7) -> DataFrame:
    """NormalDistributionSource analogue via Box–Muller on two hash-derived
    uniforms — pure JVM (log/sqrt/cos are codegen'd built-ins)."""
    u1 = _u01(F.col(col), seed)
    u2 = _u01(F.col(col), seed + 1)
    z = F.sqrt(-2.0 * F.log(u1 + F.lit(1e-300))) * F.cos(2.0 * float(np.pi) * u2)
    return df.withColumn("key", (F.lit(mean) + F.lit(std) * z))


def with_ip_key(df: DataFrame, col: str = "value", seed: int = 7) -> DataFrame:
    """IPaddressesSource analogue: key ~ U[0, 2^31 - 1)."""
    return df.withColumn("key", F.pmod(F.xxhash64(F.col(col), F.lit(seed)),
                                       F.lit((1 << 31) - 1)).cast("long"))


def _rate_reader(spark: SparkSession, rows_per_sec: int) -> DataFrame:
    return (spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_sec).load())


def uniform_stream(spark: SparkSession, rows_per_sec: int = 200_000,
                   key_range: int = 1001, value_range: int = 10,
                   seed: int = 7) -> DataFrame:
    """Throttled uniform generator stream: (timestamp, key, val). The
    200k/s default is the reference's per-core input-rate cap
    (``CountMinSlicing.java:35-40``)."""
    return with_uniform_key(_rate_reader(spark, rows_per_sec), "value",
                            key_range, value_range, seed)


def normal_stream(spark: SparkSession, rows_per_sec: int = 200_000,
                  mean: float = 500.0, std: float = 100.0,
                  seed: int = 7) -> DataFrame:
    return with_normal_key(_rate_reader(spark, rows_per_sec), "value",
                           mean, std, seed)


def ip_stream(spark: SparkSession, rows_per_sec: int = 200_000,
              seed: int = 7) -> DataFrame:
    return with_ip_key(_rate_reader(spark, rows_per_sec), "value", seed)


# ------------------------------------------------------------------- zipf
def _zipf_cdf(key_range: int, s: float) -> np.ndarray:
    ranks = np.arange(1, key_range + 1, dtype=np.float64)
    pmf = ranks ** -s
    return np.cumsum(pmf) / pmf.sum()


def zipf_keys_for_ids(ids: np.ndarray, cdf: np.ndarray,
                      seed: int = 7) -> np.ndarray:
    """Bounded-Zipf key per row id: inverse-CDF over a hash-derived uniform.
    Addressable by id (not a sequential stream), so any partition computes
    its own rows — nothing row-count-sized ever leaves an executor."""
    from ..synopsis.hashing import hash64_multi
    h = hash64_multi(np.asarray(ids, dtype=np.int64),
                     np.array([seed], dtype=np.uint64))[0]
    u = h.astype(np.float64) / float(2 ** 64)
    return np.searchsorted(cdf, u, side="right").astype(np.int64)


def zipf_table(spark: SparkSession, n: int, key_range: int = 1000,
               s: float = 1.1, seed: int = 7,
               num_partitions: int = 8) -> DataFrame:
    """The pregenerated zipf table (ZipfDistributionSource replays a file;
    we materialize the same thing as a DataFrame — write it to parquet and
    replay with ``maxFilesPerTrigger`` for the streaming form). Only the
    key_range-sized CDF rides the closure."""
    cdf = _zipf_cdf(key_range, s)

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            if len(pdf):
                idx = pdf["id"].to_numpy()
                yield pd.DataFrame({"idx": idx,
                                    "key": zipf_keys_for_ids(idx, cdf, seed)})

    base = spark.range(0, n, 1, num_partitions)
    return base.mapInPandas(gen, schema="idx long, key long")


def zipf_replay(spark: SparkSession, table_dir: str,
                max_files_per_trigger: int = 1) -> DataFrame:
    """File-replay stream over a written zipf table — the exact analogue of
    ``ZipfDistributionSource``'s gzip replay."""
    schema = spark.read.parquet(table_dir).schema
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(table_dir))
