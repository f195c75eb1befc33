"""CEP sequence detection: batch join semantics + streaming exactness under
out-of-order arrival (oracle parity at sf0.01 is covered by test_entry.py)."""

import glob
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from condor_spark.engine.cep import StatefulSequenceStream, sequence_matches

SF = "/root/testdata/sf0.001"


def test_batch_plan_pushes_kind_filters(spark):
    """The event-kind predicates must reach the parquet scan: at 10^12 rows
    the join sides are the (small) filtered projections, never the table."""
    df = spark.read.parquet(f"{SF}/events.parquet")
    plan = (sequence_matches(df, within="3 days")
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters" in plan
    assert "signup" in plan and "purchase" in plan


def test_stream_matches_batch_out_of_order(spark, tmp_path):
    """Pairs whose first element arrives in a LATER micro-batch than the
    second (admissible out-of-order) must still emit, exactly once."""
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    rows = pd.DataFrame({
        "event_id": range(8),
        "ts": pd.to_datetime([
            "2024-01-01 00:00", "2024-01-01 01:00",   # u1 signup, purchase
            "2024-01-02 00:30",                        # u1 purchase (2nd)
            "2024-01-02 00:00",                        # u1 signup (out of order!)
            "2024-01-03 00:00", "2024-01-09 00:00",   # u2 signup, too-late purchase
            "2024-01-04 00:00", "2024-01-04 00:00",   # u3 purchase==signup ts
        ]),
        "user_id": [1, 1, 1, 1, 2, 2, 3, 3],
        "event_type": ["signup", "purchase", "purchase", "signup",
                       "signup", "purchase", "signup", "purchase"],
        "value": [0.0] * 8, "props": ["{}"] * 8,
    })
    schema = spark.read.parquet(f"{SF}/events.parquet").schema
    # file 1: everything except the out-of-order signup; file 2: the signup
    base = 1_000_000_000
    for i, part in enumerate((rows.drop(index=3), rows.loc[[3]])):
        before = set(glob.glob(os.path.join(src, "*.parquet")))
        (spark.createDataFrame(part, schema=schema)
         .coalesce(1).write.mode("append").parquet(src))
        for f in set(glob.glob(os.path.join(src, "*.parquet"))) - before:
            os.utime(f, (base + i, base + i))

    job = StatefulSequenceStream(within="3 days", watermark_delay="2 days")
    q = job.start(spark, src, str(tmp_path / "out"), str(tmp_path / "ck"))
    q.awaitTermination(300)
    got = (spark.read.parquet(str(tmp_path / "out")).toPandas()
           .sort_values(["key", "first_ts", "second_ts"]).reset_index(drop=True))

    batch = (sequence_matches(spark.read.parquet(src), within="3 days")
             .toPandas().sort_values(["key", "first_ts", "second_ts"])
             .reset_index(drop=True))
    got["first_ts"] = got["first_ts"].astype("datetime64[us]")
    got["second_ts"] = got["second_ts"].astype("datetime64[us]")
    batch["first_ts"] = batch["first_ts"].astype("datetime64[us]")
    batch["second_ts"] = batch["second_ts"].astype("datetime64[us]")
    assert got.equals(batch)
    # semantics spot-checks: the out-of-order signup pairs with the later
    # purchase only; u2's purchase is outside `within`; equal ts is no match
    assert len(got) == 3
    assert set(got["key"]) == {1}


def test_earliest_only_is_min_per_first(spark):
    df = spark.read.parquet(f"{SF}/events.parquet")
    allp = sequence_matches(df, within="3 days").toPandas()
    first = sequence_matches(df, within="3 days", earliest_only=True).toPandas()
    ref = (allp.groupby(["key", "first_ts"], as_index=False)["second_ts"].min()
           .sort_values(["key", "first_ts"]).reset_index(drop=True))
    first = first.sort_values(["key", "first_ts"]).reset_index(drop=True)
    assert first.equals(ref[first.columns.tolist()])


def test_chain_degenerates_to_pairs(spark):
    from condor_spark.engine.cep import sequence_chain
    df = spark.read.parquet(f"{SF}/events.parquet")
    a = (sequence_chain(df, steps=("signup", "purchase"), within="3 days")
         .toPandas().rename(columns={"ts1": "first_ts", "ts2": "second_ts"}))
    b = sequence_matches(df, within="3 days").toPandas()
    cols = ["key", "first_ts", "second_ts"]
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_absence_batch_is_complement_of_sequence(spark):
    """absence ∪ (firsts of sequence pairs) partitions the signup set."""
    from condor_spark.engine.cep import absence_matches
    df = spark.read.parquet(f"{SF}/events.parquet")
    absent = absence_matches(df, within="3 days").toPandas()
    paired = (sequence_matches(df, within="3 days").toPandas()
              [["key", "first_ts"]].drop_duplicates())
    signups = (df.filter(F.col("event_type") == "signup")
               .select(F.col("user_id").alias("key"),
                       F.col("ts").alias("first_ts")).toPandas())
    a = set(map(tuple, absent.itertuples(index=False)))
    p = set(map(tuple, paired.itertuples(index=False)))
    s = set(map(tuple, signups.itertuples(index=False)))
    assert a | p == s and not (a & p)


def test_stream_absence_matches_batch_out_of_order(spark, tmp_path):
    """Timer-driven emission: a signup emits exactly once when the watermark
    clears signup_ts + within — including when its cancelling purchase
    arrives in an EARLIER micro-batch than the (out-of-order) signup."""
    from condor_spark.engine.cep import StatefulAbsenceStream, absence_matches

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    rows = pd.DataFrame({
        "event_id": range(7),
        "ts": pd.to_datetime([
            "2024-01-02 00:30",                      # u1 purchase (file 1)
            "2024-01-02 00:00",                      # u1 signup (file 2 — late)
            "2024-01-03 00:00",                      # u2 signup, no purchase
            "2024-01-04 00:00", "2024-01-09 00:00",  # u3 signup, too-late purch
            "2024-01-05 00:00", "2024-01-05 00:00",  # u4 purchase==signup ts
            ]),
        "user_id": [1, 1, 2, 3, 3, 4, 4],
        "event_type": ["purchase", "signup", "signup", "signup", "purchase",
                       "signup", "purchase"],
        "value": [0.0] * 7, "props": ["{}"] * 7,
    })
    sentinel = pd.DataFrame({
        "event_id": [99], "ts": [pd.Timestamp("2024-02-01")],
        "user_id": [-1], "event_type": ["purchase"],
        "value": [0.0], "props": ["{}"]})
    schema = spark.read.parquet(f"{SF}/events.parquet").schema
    base = 1_000_000_000
    parts = (rows.drop(index=1), rows.loc[[1]], sentinel)
    for i, part in enumerate(parts):
        before = set(glob.glob(os.path.join(src, "*.parquet")))
        (spark.createDataFrame(part, schema=schema)
         .coalesce(1).write.mode("append").parquet(src))
        for f in set(glob.glob(os.path.join(src, "*.parquet"))) - before:
            os.utime(f, (base + i, base + i))

    job = StatefulAbsenceStream(within="3 days", watermark_delay="2 days")
    q = job.start(spark, src, str(tmp_path / "out"), str(tmp_path / "ck"))
    q.awaitTermination(300)
    got = (spark.read.parquet(str(tmp_path / "out")).toPandas()
           .sort_values(["key", "first_ts"]).reset_index(drop=True))
    batch = (absence_matches(spark.read.parquet(src), within="3 days")
             .toPandas().sort_values(["key", "first_ts"])
             .reset_index(drop=True))
    got["first_ts"] = got["first_ts"].astype("datetime64[us]")
    batch["first_ts"] = batch["first_ts"].astype("datetime64[us]")
    assert got.equals(batch)
    # u1 cancelled by the earlier-arriving purchase; u2 absent; u3's
    # purchase is outside `within` → absent; u4 equal-ts is no match →
    # absent. Key -1's sentinel purchase emits nothing.
    assert set(got["key"]) == {2, 3, 4}


def test_stream_kleene_matches_batch_out_of_order(spark, tmp_path):
    """Watermark-gated pair finalization: the count includes mids that
    arrive AFTER their second (admissible disorder), duplicates multiply
    like the batch GROUP BY, and a mid-less pair emits nothing."""
    from condor_spark.engine.cep import StatefulKleeneStream, kleene_matches

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    rows = pd.DataFrame({
        "event_id": range(9),
        "ts": pd.to_datetime([
            "2024-01-01 00:00",                      # u1 signup
            "2024-01-01 06:00",                      # u1 view
            "2024-01-01 12:00",                      # u1 purchase (file 1)
            "2024-01-01 08:00",                      # u1 view (file 2 — LATE,
                                                     #   after its purchase)
            "2024-01-02 00:00", "2024-01-02 01:00",  # u2 signup, purchase
            "2024-01-03 00:00", "2024-01-03 05:00",  # u3 signup, view
            "2024-01-03 06:00",                      # u3 purchase
        ]),
        "user_id": [1, 1, 1, 1, 2, 2, 3, 3, 3],
        "event_type": ["signup", "view", "purchase", "view",
                       "signup", "purchase",          # u2: no mid -> no row
                       "signup", "view", "purchase"],
        "value": [0.0] * 9, "props": ["{}"] * 9,
    })
    sentinel = pd.DataFrame({
        "event_id": [99], "ts": [pd.Timestamp("2024-03-01")],
        "user_id": [-1], "event_type": ["purchase"],
        "value": [0.0], "props": ["{}"]})
    schema = spark.read.parquet(f"{SF}/events.parquet").schema
    base = 1_000_000_000
    parts = (rows.drop(index=3), rows.loc[[3]], sentinel)
    for i, part in enumerate(parts):
        before = set(glob.glob(os.path.join(src, "*.parquet")))
        (spark.createDataFrame(part, schema=schema)
         .coalesce(1).write.mode("append").parquet(src))
        for f in set(glob.glob(os.path.join(src, "*.parquet"))) - before:
            os.utime(f, (base + i, base + i))

    job = StatefulKleeneStream(within="3 days", watermark_delay="2 days")
    q = job.start(spark, src, str(tmp_path / "out"), str(tmp_path / "ck"))
    q.awaitTermination(300)
    cols = ["key", "first_ts", "second_ts", "n_mid"]
    got = (spark.read.parquet(str(tmp_path / "out")).toPandas()[cols]
           .sort_values(cols).reset_index(drop=True))
    batch = (kleene_matches(spark.read.parquet(src), within="3 days")
             .toPandas()[cols].sort_values(cols).reset_index(drop=True))
    for c in ("first_ts", "second_ts"):
        got[c] = got[c].astype("datetime64[us]")
        batch[c] = batch[c].astype("datetime64[us]")
    got["n_mid"] = got["n_mid"].astype("int64")
    batch["n_mid"] = batch["n_mid"].astype("int64")
    assert got.equals(batch)
    # u1 counts BOTH views (incl. the late-arriving one); u2 emits nothing
    assert set(got["key"]) == {1, 3}
    assert got.loc[got["key"] == 1, "n_mid"].tolist() == [2]


def test_adjacent_strict_contiguity_batch(spark):
    """adjacent_matches is strict: an intervening event of ANY kind breaks
    the match that sequence_matches (relaxed) would still report."""
    from condor_spark.engine.cep import adjacent_matches

    rows = pd.DataFrame({
        "event_id": range(8),
        "ts": pd.to_datetime([
            "2024-01-01 01:00", "2024-01-01 02:00",  # u1 signup→purchase
            "2024-01-02 01:00", "2024-01-02 01:30",  # u2 signup, click, ...
            "2024-01-02 02:00",                       # ... purchase (blocked)
            "2024-01-03 01:00", "2024-01-09 01:00",  # u3 adjacent but late
            "2024-01-04 01:00",                       # u4 lone signup
        ]),
        "user_id": [1, 1, 2, 2, 2, 3, 3, 4],
        "event_type": ["signup", "purchase", "signup", "click", "purchase",
                       "signup", "purchase", "signup"],
        "value": [0.0] * 8, "props": ["{}"] * 8,
    })
    schema = spark.read.parquet(f"{SF}/events.parquet").schema
    df = spark.createDataFrame(rows, schema=schema)
    adj = adjacent_matches(df, within="3 days", tiebreak_col="event_id")
    got = sorted((r["key"], str(r["second_ts"])) for r in adj.collect())
    assert got == [(1, "2024-01-01 02:00:00")]
    seq = sequence_matches(df, within="3 days")
    assert sorted(r["key"] for r in seq.collect()) == [1, 2]


def test_adjacent_single_shuffle_no_python(spark):
    from condor_spark.engine.cep import adjacent_matches
    import re

    df = spark.read.parquet(f"{SF}/events.parquet")
    out = adjacent_matches(df, within="3 days", tiebreak_col="event_id")
    out.collect()
    plan = (out._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    assert "Python" not in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_stream_adjacent_matches_batch_out_of_order(spark, tmp_path):
    """Order-finality emission: a pair only emits once the watermark clears
    its later element — so an admissibly-late intervening event arriving in
    a LATER micro-batch still breaks the match, exactly like batch."""
    from condor_spark.engine.cep import StatefulAdjacentStream, adjacent_matches

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    rows = pd.DataFrame({
        "event_id": range(8),
        "ts": pd.to_datetime([
            "2024-01-01 01:00", "2024-01-01 02:00",  # u1 signup→purchase
            "2024-01-02 02:00", "2024-01-02 03:00",  # u5 purchase, click ...
            "2024-01-02 01:30",                       # ... late signup → match
            "2024-01-03 01:00", "2024-01-03 02:00",  # u6 signup, purchase ...
            "2024-01-03 01:30",                       # ... late click → BREAKS
        ]),
        "user_id": [1, 1, 5, 5, 5, 6, 6, 6],
        "event_type": ["signup", "purchase", "purchase", "click", "signup",
                       "signup", "purchase", "click"],
        "value": [0.0] * 8, "props": ["{}"] * 8,
    })
    sentinel = pd.DataFrame({
        "event_id": [99], "ts": [pd.Timestamp("2024-02-01")],
        "user_id": [-1], "event_type": ["click"],
        "value": [0.0], "props": ["{}"]})
    schema = spark.read.parquet(f"{SF}/events.parquet").schema
    base = 1_000_000_000
    parts = (rows.drop(index=[4, 7]), rows.loc[[4, 7]], sentinel)
    for i, part in enumerate(parts):
        before = set(glob.glob(os.path.join(src, "*.parquet")))
        (spark.createDataFrame(part, schema=schema)
         .coalesce(1).write.mode("append").parquet(src))
        for f in set(glob.glob(os.path.join(src, "*.parquet"))) - before:
            os.utime(f, (base + i, base + i))

    job = StatefulAdjacentStream(within="3 days", watermark_delay="2 days")
    q = job.start(spark, src, str(tmp_path / "out"), str(tmp_path / "ck"))
    q.awaitTermination(300)
    got = (spark.read.parquet(str(tmp_path / "out")).toPandas()
           .sort_values(["key", "first_ts", "second_ts"])
           .reset_index(drop=True))
    batch = (adjacent_matches(spark.read.parquet(src), within="3 days",
                              tiebreak_col="event_id")
             .toPandas().sort_values(["key", "first_ts", "second_ts"])
             .reset_index(drop=True))
    for c in ("first_ts", "second_ts"):
        got[c] = got[c].astype("datetime64[us]")
        batch[c] = batch[c].astype("datetime64[us]")
    assert got.equals(batch)
    # u1 clean; u5's out-of-order signup lands immediately before its
    # purchase → match; u6's out-of-order click lands BETWEEN → no match
    assert set(got["key"]) == {1, 5}


def test_stream_chain_matches_batch_out_of_order(spark, tmp_path):
    """In-band triple emission: a chain emits when its latest-ARRIVING
    element lands — including a mid view that arrives AFTER its purchase
    (admissible disorder) — and exactly once per triple."""
    from condor_spark.engine.cep import StatefulChainStream, sequence_chain

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    rows = pd.DataFrame({
        "event_id": range(10),
        "ts": pd.to_datetime([
            "2024-01-01 01:00", "2024-01-01 02:00", "2024-01-01 03:00",  # u1
            "2024-01-02 01:00", "2024-01-02 03:00",  # u2 signup, purchase...
            "2024-01-02 02:00",                       # ... late view (file 2)
            "2024-01-03 01:00", "2024-01-03 02:00",  # u4 signup, view ...
            "2024-01-03 03:00", "2024-01-03 04:00",  # ... view, purchase
        ]),
        "user_id": [1, 1, 1, 2, 2, 2, 4, 4, 4, 4],
        "event_type": ["signup", "view", "purchase", "signup", "purchase",
                       "view", "signup", "view", "view", "purchase"],
        "value": [0.0] * 10, "props": ["{}"] * 10,
    })
    sentinel = pd.DataFrame({
        "event_id": [99], "ts": [pd.Timestamp("2024-02-01")],
        "user_id": [-1], "event_type": ["view"],
        "value": [0.0], "props": ["{}"]})
    schema = spark.read.parquet(f"{SF}/events.parquet").schema
    base = 1_000_000_000
    parts = (rows.drop(index=5), rows.loc[[5]], sentinel)
    for i, part in enumerate(parts):
        before = set(glob.glob(os.path.join(src, "*.parquet")))
        (spark.createDataFrame(part, schema=schema)
         .coalesce(1).write.mode("append").parquet(src))
        for f in set(glob.glob(os.path.join(src, "*.parquet"))) - before:
            os.utime(f, (base + i, base + i))

    job = StatefulChainStream(within="1 day", watermark_delay="2 days")
    q = job.start(spark, src, str(tmp_path / "out"), str(tmp_path / "ck"))
    q.awaitTermination(300)
    got = (spark.read.parquet(str(tmp_path / "out")).toPandas()
           .sort_values(["key", "ts1", "ts2", "ts3"]).reset_index(drop=True))
    batch = (sequence_chain(spark.read.parquet(src), within="1 day")
             .toPandas().sort_values(["key", "ts1", "ts2", "ts3"])
             .reset_index(drop=True))
    for c in ("ts1", "ts2", "ts3"):
        got[c] = got[c].astype("datetime64[us]")
        batch[c] = batch[c].astype("datetime64[us]")
    assert got.equals(batch)
    # u1 one triple; u2 completed by the LATE view; u4 two triples (2 views)
    assert got.groupby("key").size().to_dict() == {1: 1, 2: 1, 4: 2}


def test_stream_cep_checkpoint_resume(spark, tmp_path):
    """A CEP stream stopped after the first files and restarted from the
    same checkpoint emits exactly the batch join — no lost or duplicated
    pairs across the restart (state lives in the checkpointed store)."""
    import shutil

    from condor_spark import fixtures

    df = spark.read.parquet(f"{SF}/events.parquet")
    full_src = str(tmp_path / "full_src")
    fixtures.replay_in_order(spark, df, full_src, n_chunks=4, ts_col="ts")
    files = sorted(glob.glob(os.path.join(full_src, "*.parquet")),
                   key=os.path.getmtime)

    part_src = str(tmp_path / "src")
    os.makedirs(part_src)
    for f in files[:2]:
        shutil.copy(f, part_src)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    job = StatefulSequenceStream(within="3 days", watermark_delay="40 days")
    job.start(spark, part_src, out, ck,
              max_files_per_trigger=1).awaitTermination(300)
    n_phase1 = spark.read.parquet(out).count()

    for f in files[2:]:
        shutil.copy(f, part_src)
    job.start(spark, part_src, out, ck,
              max_files_per_trigger=1).awaitTermination(300)

    got = sorted(map(tuple, spark.read.parquet(out).toPandas()
                     .astype(str).values.tolist()))
    want = sorted(map(tuple, sequence_matches(df, within="3 days")
                      .toPandas().astype(str).values.tolist()))
    assert got == want
    assert 0 < n_phase1 < len(want)  # the restart really continued mid-way


@pytest.mark.parametrize("seed", [3, 17, 99])
def test_cep_batch_forms_match_bruteforce(spark, seed):
    """Every CEP batch form vs an independent O(n^2/n^3) brute force over a
    random event table (seeded): sequence, absence, kleene, adjacency,
    3-chain all agree on matches AND multiplicities."""
    import numpy as np
    from condor_spark.engine.cep import (absence_matches, adjacent_matches,
                                         kleene_matches, sequence_chain)
    from collections import Counter

    rng = np.random.default_rng(seed)
    n = 300
    base = pd.Timestamp("2024-03-01").value // 1000
    rows = pd.DataFrame({
        "event_id": range(n),
        "ts": pd.to_datetime(
            base + rng.integers(0, 3 * 86400 * 1_000_000, n), unit="us"),
        "user_id": rng.integers(0, 12, n),
        "event_type": rng.choice(["signup", "view", "purchase", "click"], n),
        "value": np.zeros(n), "props": ["{}"] * n,
    })
    schema = spark.read.parquet(f"{SF}/events.parquet").schema
    df = spark.createDataFrame(rows, schema=schema)
    w_us = 12 * 3600 * 1_000_000  # 12 hours

    ev = {}
    for k, grp in rows.groupby("user_id"):
        g = grp.sort_values(["ts", "event_id"], kind="stable")
        ev[k] = list(zip(g["ts"].astype("datetime64[us]").astype("int64"),
                         g["event_type"]))

    def us(col):  # spark NTZ -> int64 µs
        return col.astype("datetime64[us]").astype("int64")

    # sequence (via kleene's endpoints below) + absence
    exp_abs = Counter()
    for k, es in ev.items():
        for ta, ka in es:
            if ka == "signup" and not any(
                    kb == "purchase" and ta < tb <= ta + w_us
                    for tb, kb in es):
                exp_abs[(k, ta)] += 1
    got = absence_matches(df, within="12 hours").toPandas()
    assert Counter(zip(got["key"], us(got["first_ts"]))) == exp_abs

    exp_kln = Counter()
    for k, es in ev.items():
        for ta, ka in es:
            for tc, kc in es:
                if ka == "signup" and kc == "purchase" and ta < tc <= ta + w_us:
                    nm = sum(1 for tm, km in es
                             if km == "view" and ta < tm < tc)
                    if nm:
                        exp_kln[(k, ta, tc, nm)] += 1
    got = kleene_matches(df, within="12 hours").toPandas()
    # batch kleene groups duplicates into count rows; expand for compare
    got_c = Counter()
    for r in got.itertuples(index=False):
        got_c[(r.key, int(pd.Timestamp(r.first_ts).value // 1000),
               int(pd.Timestamp(r.second_ts).value // 1000))] = r.n_mid
    exp_c = {}
    for (k, ta, tc, nm), mult in exp_kln.items():
        exp_c[(k, ta, tc)] = nm  # n_mid per distinct pair
    assert dict(got_c) == exp_c

    exp_adj = Counter()
    for k, es in ev.items():
        for i in range(len(es) - 1):
            (ta, ka), (tb, kb) = es[i], es[i + 1]
            if ka == "signup" and kb == "purchase" and tb <= ta + w_us:
                exp_adj[(k, ta, tb)] += 1
    got = adjacent_matches(df, within="12 hours", tiebreak_col="event_id"
                           ).toPandas()
    assert Counter(zip(got["key"], us(got["first_ts"]),
                       us(got["second_ts"]))) == exp_adj

    exp_chn = Counter()
    for k, es in ev.items():
        for ta, ka in es:
            for tb, kb in es:
                for tc, kc in es:
                    if (ka == "signup" and kb == "view" and kc == "purchase"
                            and ta < tb < tc <= ta + w_us):
                        exp_chn[(k, ta, tb, tc)] += 1
    got = sequence_chain(df, within="12 hours").toPandas()
    assert Counter(zip(got["key"], us(got["ts1"]), us(got["ts2"]),
                       us(got["ts3"]))) == exp_chn
