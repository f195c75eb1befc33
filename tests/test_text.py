"""Text dedup paths: the broadcast-LUT verify and the join verify are two
physical strategies for ONE logical operator. Precision is 1.0 on both; the
join path additionally pre-filters candidates whose signature estimate sits
>= 4 binomial stderrs below the threshold, so its recall can differ by a
bounded ~3e-5 ONLY for true pairs exactly at the threshold (see
minhash_dedup_pairs docstring). This fixture has no such knife-edge pair,
so rows compare equal here."""

from condor_spark.engine import text as T

SF = "/root/testdata/sf0.001"


def test_minhash_verify_paths_identical(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    fast = (T.minhash_dedup_pairs(df, threshold=0.7)
            .toPandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    slow = (T.minhash_dedup_pairs(df, threshold=0.7, broadcast_bytes=0)
            .toPandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    assert fast.equals(slow)
    assert len(fast) > 0  # fixture has near-dup pairs above 0.7


def test_minhash_precision_vs_exact(spark):
    """Every emitted pair must also appear in the exact all-pairs Jaccard at
    the same threshold with the same value — precision 1.0 by construction
    (LSH prunes candidates, never invents them)."""
    df = spark.read.parquet(f"{SF}/documents.parquet")
    got = T.minhash_dedup_pairs(df, threshold=0.7).toPandas()
    exact = T.ngram_jaccard_pairs(df, threshold=0.7).toPandas()
    key = lambda p: set(map(tuple, p[["doc_a", "doc_b", "jaccard"]].to_numpy()))
    assert key(got) <= key(exact)


def test_pii_scrub_rules(spark):
    """Redaction order, per-rule counts, and clean-text passthrough."""
    from condor_spark.engine.text import pii_scrub

    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-y.org and 192.168.0.1 call +44 20 7946 0958 "
             "ref 123456789"),
         (2, "clean text only"),
         (3, "two mails a@b.io c@d.co plus 8.8.8.8")],
        "id long, text string")
    rows = {r["id"]: r for r in pii_scrub(df, "text").collect()}
    assert rows[1]["n_email"] == 1 and rows[1]["n_ip"] == 1
    assert rows[1]["n_phone"] == 1 and rows[1]["n_idnum"] == 1
    assert rows[1]["text"] == "mail <EMAIL> and <IP> call <PHONE> ref <NUM>"
    assert rows[2]["text"] == "clean text only"
    assert all(rows[2][c] == 0
               for c in ("n_email", "n_ip", "n_phone", "n_idnum"))
    assert rows[3]["n_email"] == 2 and rows[3]["n_ip"] == 1
    # ssn/card run before the idnum catch-all and before phone
    df2 = spark.createDataFrame(
        [(1, "ssn 123-45-6789 card 4111-1111-1111-1111 or 4111 1111 1111 1111")],
        "id long, text string")
    r2 = pii_scrub(df2, "text").collect()[0]
    assert r2["n_ssn"] == 1 and r2["n_card"] == 2
    assert r2["n_phone"] == 0 and r2["n_idnum"] == 0
    assert r2["text"] == "ssn <SSN> card <CARD> or <CARD>"
    # out_col keeps the original column intact
    kept = pii_scrub(df, "text", out_col="scrubbed").collect()[0]
    assert "@" in kept["text"] and "@" not in kept["scrubbed"]


def test_repetition_scores(spark):
    from condor_spark.engine.text import repetition_scores

    df = spark.createDataFrame(
        [(1, "spam spam spam spam"),        # "spam spam" 2-gram x3
         (2, "a b c d e"),                  # all grams unique
         (3, "one two one two one two"),    # repeated 2- and 3-grams
         (4, "solo"),                       # shorter than every n
         (5, "")],                          # empty text
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in repetition_scores(df, dup_n=3).collect()}

    # doc 1: norm len 19; top 2-gram "spam spam" (9 chars) x3 -> 27/19
    assert rows[1]["top_2gram_frac"] == round(27 / 19, 6)
    # top 3-gram "spam spam spam" (14) x2 -> 28/19; also the dup-3 sum
    assert rows[1]["top_3gram_frac"] == round(28 / 19, 6)
    assert rows[1]["dup_3gram_frac"] == round(28 / 19, 6)
    # doc 2: unique grams -> top covers one occurrence, no duplicates
    assert rows[2]["top_2gram_frac"] == round(3 / 9, 6)
    assert rows[2]["dup_3gram_frac"] == 0.0
    # doc 3: "one two" (7) x3 = 21 / len 23
    assert rows[3]["top_2gram_frac"] == round(21 / 23, 6)
    # 3-grams: "one two one" x2, "two one two" x2 -> dup = (22+22)/23
    assert rows[3]["dup_3gram_frac"] == round(44 / 23, 6)
    # short + empty docs: present with all-zero signals
    for d in (4, 5):
        assert rows[d]["top_2gram_frac"] == 0.0
        assert rows[d]["dup_3gram_frac"] == 0.0


def test_contamination_scores(spark):
    from condor_spark.engine.text import contamination_scores

    train = spark.createDataFrame(
        [(0, "alpha beta gamma delta"),
         (2, "one two three four five six")],
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),       # full overlap at n=3
         (3, "zeta eta theta iota"),          # no overlap
         (5, "one two three nine ten"),       # 1 of 3 grams hits
         (7, "xx yy")],                       # shorter than n: no grams
        "doc_id long, text string")
    rows = {r["doc_id"]: r
            for r in contamination_scores(ev, train, n=3, threshold=0.5).collect()}
    assert rows[1]["n_grams"] == 2 and rows[1]["n_hits"] == 2
    assert rows[1]["contamination_ratio"] == 1.0 and rows[1]["contaminated"]
    assert rows[3]["n_hits"] == 0 and not rows[3]["contaminated"]
    assert rows[5]["n_grams"] == 3 and rows[5]["n_hits"] == 1
    assert rows[5]["contamination_ratio"] == round(1 / 3, 6)
    assert not rows[5]["contaminated"]
    assert rows[7]["n_grams"] == 0 and rows[7]["contamination_ratio"] == 0.0
    assert not rows[7]["contaminated"]
