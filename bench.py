"""Benchmark harness — prints ONE JSON line for the driver.

Headline queries run at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] (default 32). Also measures raw synopsis-build
throughput (events rows/sec and audio clips/sec — the BASELINE.json metric)
and, unless SPARK_GRAFT_SKIP_SCALING=1, the north-rule two-cluster-size
proxy: the same build job at local[8] vs local[32] on identical input, with
scaling efficiency = T32 / (4 * T8).

Child mode (used for the scaling runs): ``python bench.py --throughput N``
prints a single JSON dict with clips/sec on local[N] — after an untimed
warmup pass so JVM/codegen/python-worker startup doesn't pollute the
scaling ratio (the whole point is marginal throughput per added core).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPO = os.path.dirname(os.path.abspath(__file__))


def make_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (SparkSession.builder.master(f"local[{cpus}]")
            .appName("condor_spark_bench")
            .config("spark.sql.shuffle.partitions", str(cpus))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            # NOTE: big heaps regress badly on this VM (page-fault storms
            # during heap growth: 48g heap made a 2s decode stage take 6-30s
            # at local[32]); 12g is ample — synopsis state is KB-scale
            .config("spark.driver.memory", "12g")
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate())


def throughput_job(spark, sf_dir: str) -> dict:
    """The scaling-proxy job: two-phase CM + HLL + DDSketch build over events
    (3 synopsis kinds per window — one pass each). Returns rows/sec."""
    from pyspark.sql import functions as F

    from condor_spark.engine import evaluate as ev
    from condor_spark.engine.builder import SynopsisSpec, build_batch
    from condor_spark.engine.windows import Tumbling

    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    n = df.count()
    t0 = time.perf_counter()
    for kind, params, col in (
            ("countmin", dict(width=65536, height=5, seed=7), "user_id"),
            ("hll", dict(log_reg_num=14, seed=7), "user_id"),
            ("ddsketch", dict(relative_accuracy=0.01, max_num_bins=4096), "value")):
        spec = SynopsisSpec(kind=kind, params=params, column=col,
                            ts_column="ts", window=Tumbling("1 day"))
        build_batch(df, spec).count()
    wall = time.perf_counter() - t0
    return {"rows": n * 3, "sec": wall, "rows_per_sec": n * 3 / wall}


def audio_throughput(spark, n_clips: int, cpus: int, warmup: int = 1000) -> dict:
    """clips/sec through synth→decode→features→windowed stratified sketch
    (the BASELINE.json metric). Warmup pass excluded from timing."""
    from condor_spark import fixtures
    from condor_spark.engine.audio import decode_features
    from condor_spark.engine.builder import SynopsisSpec, build_batch
    from condor_spark.engine.windows import Tumbling

    def run(n):
        clips = fixtures.audio_clips(spark, n, num_partitions=cpus * 2)
        feats = decode_features(clips, passthrough=("ts",))
        spec = SynopsisSpec(kind="ddsketch", params=dict(relative_accuracy=0.01),
                            column="rms", ts_column="ts",
                            window=Tumbling("1 minute"), stratify_by="codec")
        build_batch(feats, spec).count()

    run(warmup)  # spawns + warms the python worker pool, JIT, codegen
    t0 = time.perf_counter()
    run(n_clips)
    wall = time.perf_counter() - t0
    return {"clips": n_clips, "sec": wall, "clips_per_sec": n_clips / wall}


HEADLINE = [
    "cm_user_frequency", "hll_distinct", "ddsketch_quantiles",
    "equiwidth_hist", "sliding_counts", "session_windows", "count_windows",
    "wavelet_range_sums", "bottomk_sample", "dedup_exact", "quality_scores",
    "minhash_pairs", "ann_topk",
]


def main() -> None:
    sys.path.insert(0, REPO)
    if len(sys.argv) >= 3 and sys.argv[1] == "--throughput":
        cpus = int(sys.argv[2])
        spark = make_spark(cpus)
        spark.sparkContext.setLogLevel("ERROR")
        # large enough that parallel work dominates the ~5s of fixed
        # per-run overhead (stage scheduling + Arrow stream setup); the
        # scaling ratio is about marginal throughput, not startup
        out = audio_throughput(spark, 300_000, cpus, warmup=8_000)
        spark.stop()
        print(json.dumps(out))
        return

    import __spark_entry__ as entry

    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entry.queries()
    per_query: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        qmap[name](spark, SF_DIR).count()
        per_query[name] = round(time.perf_counter() - t0, 3)

    tput = throughput_job(spark, SF_DIR)
    audio = audio_throughput(spark, 20_000, CPUS)
    spark.stop()

    scaling = {}
    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        runs = {}
        for n in (8, 32):
            p = subprocess.run([sys.executable, __file__, "--throughput", str(n)],
                               capture_output=True, text=True, cwd=REPO)
            line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
            runs[n] = json.loads(line)
        eff = runs[32]["clips_per_sec"] / (4 * runs[8]["clips_per_sec"])
        scaling = {"local8_clips_per_sec": round(runs[8]["clips_per_sec"]),
                   "local32_clips_per_sec": round(runs[32]["clips_per_sec"]),
                   "efficiency_n_to_4n": round(eff, 3)}

    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(sum(per_query.values()), 3),
        "unit": "sec",
        "queries": per_query,
        "sf": float(SF_DIR.rstrip("/").split("sf")[-1]),
        "throughput": {
            "events_updates_per_sec": round(tput["rows_per_sec"]),
            "audio_clips_per_sec": round(audio["clips_per_sec"]),
        },
        "scaling": scaling,
    }))


if __name__ == "__main__":
    main()
