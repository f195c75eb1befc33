"""One-off sf1 correctness stress (VERDICT r4 next-round #5) — NOT the gate.

The driver gate runs every oracle pair at sf0.01 and the bench at sf0.1.
This script replays the same Spark-vs-DuckDB comparison at "sf1" — a
deterministic 10x replication of the sf0.1 tables with disjoint id spaces
(event_id/doc_id/vec_id offset by k*1e10 for replica k; timestamps
unchanged, so per-window row counts grow 10x, which is exactly the
scale-dependent surface the stress targets: window caps, cap-sized
reservoir audits, hot-key paths, overflow guards). Replica embeddings get
embedding[0] += k*1e-6 (float32) so cosine top-k ties break on VALUE
deterministically in both engines instead of being genuine ties.

Skips, recorded with reasons in the artifact:
- queries whose oracle is a deliberate all-pairs exact baseline
  (quadratic by design — infeasible at sf1, gated at sf0.01);
- sf-independent queries (closed-form fixture inputs that ignore sf_dir:
  the audio/kmv/decontamination fixture families) — identical to their
  gated sf0.01 runs by construction.

Usage:  python stress_sf1.py            # writes CORRECTNESS_sf1.json
        (progress streamed to CORRECTNESS_sf1.jsonl as it runs)
"""
from __future__ import annotations

import hashlib
import inspect
import json
import os
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

SF1 = "/tmp/condor_sf1"
REPO = os.path.dirname(os.path.abspath(__file__))
OUT_JSONL = os.path.join(REPO, "CORRECTNESS_sf1.jsonl")
OUT_JSON = os.path.join(REPO, "CORRECTNESS_sf1.json")
B = 10_000_000_000

# all-pairs exact baselines: quadratic BY DESIGN (the deliberately-labeled
# small-N oracles the repo keeps next to the banded/bucketed scale paths)
QUADRATIC = {
    "ngram_jaccard": "all-pairs exact Jaccard baseline — O(n^2) by design",
    "dedup_cosine": "all-pairs exact cosine baseline — O(n^2) by design",
}

# exact-regime promotions that leave their exact regime at sf1: a hash
# mismatch here is the documented approximation, not a bug — the runner
# records the measured max relative diff alongside the explanation
EXACT_REGIME = {
    "wavelet_range_sums":
        "wavelet budget regime: ~125k values/slice exceed the 32768-"
        "coefficient budget, so truncation kicks in and the retained set "
        "depends on the sampled range-partition cuts (run-to-run rel diff "
        "~1e-6, within the error budget); exact regime gated at sf0.01",
    "wavelet_stratified":
        "same wavelet budget regime as wavelet_range_sums (per-stratum)",
    "stream_wavelet":
        "same wavelet budget regime as wavelet_range_sums (streamed)",
    "mg_heavy_hitters":
        "Misra-Gries undersized regime: 1356 distinct users in the "
        "hottest window exceed capacity 1024, so decrements fire and "
        "estimates become the documented lower bounds (deficit bound "
        "pytest-asserted); exact regime gated at sf0.01 (<=1024 distinct)",
    "stream_mg_hh":
        "same MG undersized regime as mg_heavy_hitters (streamed)",
    "mg_entropy":
        "same MG undersized regime (entropy from the trimmed summary)",
    "stream_mg_querylatest":
        "same MG undersized regime (point estimates are lower bounds)",
    "decay_trending":
        "decayed-counts trim regime: 1356 distinct users exceed capacity "
        "1024, so the weighted Misra-Gries trim drops low-weight keys "
        "(24.4k of 37.5k rows kept) — the documented lower-bound summary; "
        "exact regime gated at sf0.01",
    "stream_decay_trending":
        "same decayed-counts trim regime (streamed)",
    "stream_decay_querylatest":
        "same decayed-counts trim regime (point estimates)",
}

# designed loud failures: paths that only exist in the exact regime and
# raise a documented guard instead of silently approximating
LOUD_GUARD = {
    "mg_sql_hh":
        "designed guard fired: build_mg_sql raises 'window has 1338 "
        "distinct keys > capacity 1024 — the relational form only exists "
        "in the exact regime; raise capacity or use build_batch' — the "
        "documented loud-overflow behavior (COVERAGE.md MG row), the "
        "correct outcome at this scale",
}

# oracles whose SQL replay is itself super-linear and exceeds local temp
# at sf1 — the SPARK side runs and is recorded; the replay stays gated at
# sf0.01
ORACLE_AT_GATE = {
    "minhash_pairs":
        "oracle replay materializes docs x shingles x 64 SplitMix64 lanes "
        "(~80+ GB DuckDB temp at 50k docs) — infeasible locally; Spark "
        "side recorded, exact replay gated at sf0.01",
    "cep_kleene":
        "oracle replay enumerates each kleene start against every in-run "
        "successor (O(run-length^2)); the 10x-duplicated timestamps make "
        "runs ~10x longer (~100x intermediate), exceeding local DuckDB "
        "temp. Spark side recorded; batch and streamed kleene agree "
        "row-for-row at sf1 (11,329), and the exact replay stays gated "
        "at sf0.01",
    "stream_cep_kleene":
        "same kleene oracle-replay blowup; Spark side recorded (row "
        "count equals the batch twin's at sf1)",
    "cep_chain3":
        "chain semantics are combinatorial under the 10x-duplicated "
        "events: every original 3-chain match becomes 10^3 = 1000 "
        "matches (Spark emits exactly 1914 x 1000 = 1,914,000 rows — "
        "internally consistent), and the oracle's 3-way join "
        "intermediate exceeds local DuckDB temp; exact replay gated at "
        "sf0.01",
    "stream_cep_chain3":
        "same chain3 oracle-replay blowup; Spark side recorded "
        "(1,914,000 rows, equal to the batch twin's)",
}


def ensure_tables() -> None:
    os.makedirs(SF1, exist_ok=True)
    if os.path.exists(os.path.join(SF1, "embeddings.parquet")):
        return
    con = duckdb.connect()
    con.sql(f"""
        COPY (SELECT event_id + k.k*{B} AS event_id, ts, user_id,
                     event_type, value, props
              FROM read_parquet('/root/testdata/sf0.1/events.parquet'),
                   (SELECT unnest(range(10)) AS k) k
              ORDER BY event_id)
        TO '{SF1}/events.parquet' (FORMAT PARQUET)""")
    con.sql(f"""
        COPY (SELECT doc_id + k.k*{B} AS doc_id, text, lang, source, n_chars
              FROM read_parquet('/root/testdata/sf0.1/documents.parquet'),
                   (SELECT unnest(range(10)) AS k) k
              ORDER BY doc_id)
        TO '{SF1}/documents.parquet' (FORMAT PARQUET)""")
    con.sql(f"""
        COPY (SELECT vec_id + k.k*{B} AS vec_id,
                     list_prepend(CAST(embedding[1] + k.k*1e-6 AS FLOAT),
                                  embedding[2:]) AS embedding,
                     label
              FROM read_parquet('/root/testdata/sf0.1/embeddings.parquet'),
                   (SELECT unnest(range(10)) AS k) k
              ORDER BY vec_id)
        TO '{SF1}/embeddings.parquet' (FORMAT PARQUET)""")


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    # the driver-contract compare (tests/test_entry.py::normalize)
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = (pd.to_datetime(s).dt.tz_localize(None)
                      .astype("datetime64[us]"))
        elif pd.api.types.is_bool_dtype(s):
            pdf[c] = s.astype(bool)
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype("float64")
        else:
            pdf[c] = s.astype(str)
    return pdf.sort_values(list(pdf.columns), kind="stable").reset_index(
        drop=True)


def value_hash(pdf: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in pdf.columns:
        h.update(c.encode())
        h.update(np.asarray(pdf[c]).tobytes()
                 if pdf[c].dtype.kind in "ifb"
                 else "\x00".join(map(str, pdf[c])).encode())
    return h.hexdigest()[:16]


def main() -> None:
    ensure_tables()
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{os.cpu_count()}]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry
    qmap, oracles = entry.queries(), entry.oracle_sql()

    con = duckdb.connect()
    for t in ("events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF1}/{t}.parquet')")
    # the other driver views exist at sf0.01 only; no query reads them,
    # but register them so any oracle referencing one fails loudly
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
                f"'/root/testdata/sf0.01/{t}.parquet')")

    done = {}
    if os.path.exists(OUT_JSONL):
        for line in open(OUT_JSONL):
            rec = json.loads(line)
            done[rec["name"]] = rec
    out = dict(done)
    log = open(OUT_JSONL, "a")

    for name, fn in qmap.items():
        if name in done:
            continue
        rec: dict = {"name": name}
        src = inspect.getsource(fn)
        if name in QUADRATIC:
            rec["skipped"] = QUADRATIC[name]
        elif not any(h in src for h in ("_events(", "_docs(", "_emb(")):
            rec["skipped"] = ("sf-independent (closed-form fixture input; "
                              "identical to the gated sf0.01 run)")
        else:
            t0 = time.time()
            try:
                got = normalize(fn(spark, SF1).toPandas())
                rec["spark_rows"] = int(len(got))
                rec["spark_sec"] = round(time.time() - t0, 1)
                if name in ORACLE_AT_GATE:
                    rec["oracle_skipped"] = ORACLE_AT_GATE[name]
                elif name in oracles:
                    t1 = time.time()
                    want = normalize(con.sql(oracles[name]).df())
                    rec["oracle_rows"] = int(len(want))
                    rec["oracle_sec"] = round(time.time() - t1, 1)
                    rec["rows_match"] = len(got) == len(want)
                    rec["schema_match"] = (list(got.columns)
                                           == list(want.columns))
                    if rec["rows_match"] and rec["schema_match"]:
                        ok = True
                        max_rel = 0.0
                        for c in got.columns:
                            a = got[c].to_numpy()
                            b = want[c].to_numpy()
                            if a.dtype.kind == "f":
                                col_ok = bool(np.isclose(
                                    a, b, rtol=0, atol=0,
                                    equal_nan=True).all())
                                if not col_ok:
                                    denom = np.maximum(np.abs(b), 1e-300)
                                    max_rel = max(max_rel, float(
                                        np.nanmax(np.abs(a - b) / denom)))
                                ok &= col_ok
                            else:
                                ok &= bool((a == b).all())
                        rec["hash_match"] = ok
                        if not ok and max_rel:
                            rec["max_rel_diff"] = max_rel
                    else:
                        rec["hash_match"] = False
                    if not rec["hash_match"] and name in EXACT_REGIME:
                        rec["explained"] = EXACT_REGIME[name]
                else:
                    rec["rows_only"] = True
            except Exception as exc:  # noqa: BLE001 — record, keep going
                rec["err"] = f"{type(exc).__name__}: {exc}"
                rec["trace"] = traceback.format_exc()[-1500:]
                if name in LOUD_GUARD:
                    rec["explained"] = LOUD_GUARD[name]
        out[name] = rec
        log.write(json.dumps(rec) + "\n")
        log.flush()
        print(json.dumps({k: v for k, v in rec.items() if k != "trace"}),
              flush=True)

    json.dump(out, open(OUT_JSON, "w"), indent=1)
    ran = [r for r in out.values() if "skipped" not in r]
    bad = [r["name"] for r in ran
           if r.get("err") or (("hash_match" in r) and not r["hash_match"])]
    print(json.dumps({"total": len(out), "ran": len(ran),
                      "skipped": len(out) - len(ran),
                      "failed_or_mismatched": bad}))
    spark.stop()


if __name__ == "__main__":
    main()
