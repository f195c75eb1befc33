"""Text analysis + dedup operators for training-data pipelines.

Beyond the reference's synopsis set (these are the large-scale pipeline ops
the engine adds): token counting, quality scoring, language-ID heuristic,
document fingerprinting, exact dedup, MinHash+LSH near-dedup, SimHash.

Everything that can stay JVM-side does (split/filter/md5/array ops —
whole-stage codegen); only MinHash/SimHash signatures use a pandas UDF
(vectorized numpy over Arrow batches). Each op is O(rows) map-side plus at
most one groupBy on a short key — no all-pairs joins except behind LSH
candidate generation, so the plans hold at 10^12 rows.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..synopsis.hashing import hash64

# tiny per-language stopword lists for the heuristic language ID
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pas"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "no"],
}

_NORM_WS = r"\s+"


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin rebalance a degenerate scan (one small parquet file scans
    as 1 partition, serializing every downstream UDF). Fires only for tiny
    scans far below the session's shuffle width — a real warehouse scan has
    thousands of partitions and must not pay a raw-row shuffle."""
    from .builder import _shuffle_width

    p_in = df.rdd.getNumPartitions()
    width = _shuffle_width(df.sparkSession)
    if p_in <= 8 and p_in * 4 <= width:
        return df.repartition(width)
    return df


def tokens_col(text_col: str = "text"):
    """Whitespace tokens of the normalized text (JVM-side)."""
    return F.split(F.regexp_replace(F.trim(F.col(text_col)), _NORM_WS, " "), " ")


def token_counts(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    return df.select(F.col(id_col),
                     F.size(tokens_col(text_col)).alias("n_tokens"),
                     F.length(F.col(text_col)).alias("n_chars_text"))


def quality_scores(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features, rounded to 6
    decimals so the values hash identically across engines."""
    toks = tokens_col(text_col)
    stop = F.array(*[F.lit(s) for s in LANG_STOPWORDS["en"]])
    n_tok = F.size(toks)
    punct_removed = F.regexp_replace(F.col(text_col), r"\p{Punct}", "")
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars_q"),
        n_tok.alias("n_tokens"),
        F.round((F.length(text_col) - F.length(punct_removed))
                / F.greatest(F.length(text_col), F.lit(1)), 6).alias("punct_ratio"),
        F.round(F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
                / F.greatest(n_tok, F.lit(1)).cast("double"), 6).alias("stopword_ratio"),
        F.round((F.length(text_col) + 1) / F.greatest(n_tok, F.lit(1)).cast("double") - 1,
                6).alias("avg_token_len"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-hit language heuristic (deterministic, SQL-expressible).

    Predicts the language whose stopword list hits the most tokens;
    'unknown' when nothing hits. Ties break by language name order.
    """
    toks = tokens_col(text_col)

    def hit_count(words):
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    hits = {lang: hit_count(words) for lang, words in sorted(LANG_STOPWORDS.items())}
    best = F.greatest(*hits.values())
    pred = F.when(best <= 0, F.lit("unknown"))
    for lang in sorted(LANG_STOPWORDS):
        pred = pred.when(hits[lang] == best, F.lit(lang))
    return df.select(F.col(id_col), pred.alias("lang_pred"))


def fingerprints(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 over whitespace-normalized lowered text."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), _NORM_WS, " "))
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


def dedup_exact(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash: keep the minimum id per distinct text.

    Hash-groupBy — one shuffle on the md5 key, no sorting, scales linearly.
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), _NORM_WS, " "))
    return (df.select(F.md5(norm).alias("fingerprint"), F.col(id_col))
              .groupBy("fingerprint")
              .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups")))


# --------------------------------------------------------------- MinHash/LSH
def _shingle_minhash(texts: pd.Series, num_hashes: int, shingle: int,
                     seed: int) -> np.ndarray:
    """(n_docs, num_hashes) int64 MinHash signatures over character shingles.

    Vectorized per document: shingles → hash64 per seed lane → min.
    """
    from ..synopsis.hashing import hash64_multi

    out = np.empty((len(texts), num_hashes), dtype=np.int64)
    seeds = np.array([seed * 1_000_003 + j for j in range(num_hashes)],
                     dtype=np.uint64)
    for i, t in enumerate(texts):  # per-doc numpy over all its shingles
        t = " ".join(str(t).split()).lower()
        if len(t) < shingle:
            t = t.ljust(shingle, "_")
        # shingle ids via polynomial over byte windows
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.int64)
        if b.size < shingle:
            b = np.pad(b, (0, shingle - b.size))
        win = np.lib.stride_tricks.sliding_window_view(b, shingle)
        ids = np.unique(win @ (257 ** np.arange(shingle, dtype=np.int64)))
        # all hash lanes at once: (k, n_shingles) → min per lane
        out[i] = hash64_multi(ids, seeds).min(axis=1).astype(np.int64)
    return out


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", num_hashes: int = 64,
                       shingle: int = 3, seed: int = 7) -> DataFrame:
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            sig = _shingle_minhash(pdf[text_col], num_hashes, shingle, seed)
            yield pd.DataFrame({"doc_id": pdf[id_col].to_numpy(),
                                "signature": list(sig)})

    return _spread(df.select(id_col, text_col)).mapInPandas(
        fn, schema="doc_id long, signature array<long>")


def lsh_candidate_pairs(sig_df: DataFrame, bands: int = 8,
                        rows_per_band: int = 8) -> DataFrame:
    """Band the signatures and emit same-bucket pairs (classic MinHash LSH):
    explode to (band, band_hash) keys, groupBy bucket, pair within bucket.
    Shuffle volume O(rows × bands) short keys — no all-pairs join.
    """
    banded = sig_df.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.hash(F.slice("signature", b * rows_per_band + 1,
                                    rows_per_band)).alias("bucket"))
            for b in range(bands)])).alias("bb"))
    a = banded.select(F.col("bb.band").alias("band"),
                      F.col("bb.bucket").alias("bucket"),
                      F.col("doc_id").alias("doc_a"))
    b = banded.select(F.col("bb.band").alias("band"),
                      F.col("bb.bucket").alias("bucket"),
                      F.col("doc_id").alias("doc_b"))
    return (a.join(b, ["band", "bucket"])
             .filter(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b").distinct())


def minhash_dedup_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", threshold: float = 0.7,
                        num_hashes: int = 64, shingle: int = 3,
                        seed: int = 7,
                        broadcast_bytes: int = 64 << 20,
                        verify_mode: str = "auto") -> DataFrame:
    """LSH candidates verified by exact character-shingle Jaccard.

    Banding r=8, b=8 targets the ~0.7 LSH threshold ((1/b)^(1/r)); recall
    below that is partial by construction — the exact all-pairs oracle is
    ``ngram_jaccard_pairs``.

    Verification strategy mirrors Spark's broadcast-vs-shuffle join choice:
    when the hashed-shingle table fits under ``broadcast_bytes`` it is
    broadcast as a doc_id -> sorted-int64-array LUT and candidate pairs are
    verified in one Arrow-batched numpy pass (sorted-array intersection via
    searchsorted) — no per-pair array materialization, ~4x faster than the
    join at sf0.1. Above the cap (warehouse scale: the corpus can't sit on
    one executor) pairs co-locate both arrays through two equi-joins and
    verify JVM-side, pre-filtered by the signature lane-match estimate.
    Both paths have precision 1.0 (every emitted pair is exactly verified).
    Recall differs by a bounded amount: the shuffle path's pre-filter drops
    candidates whose lane-match estimate sits ≥ 4σ below the threshold
    (σ = sqrt(t(1−t)/k), the binomial stderr of the estimate) — a TRUE
    pair exactly at the threshold is lost with probability ≤ ~3e-5
    (binomial tail at z = −4), vanishing for pairs above it. The broadcast
    path verifies every LSH candidate and has no such loss.

    ``verify_mode``: "auto" (size-based switch, the default), "broadcast",
    or "shuffle". Callers that need DETERMINISTIC semantics independent of
    input size — e.g. the driver-contract query, whose exact SQL oracle
    models the exhaustive-verify path and not the shuffle path's 4σ
    pre-filter — pin "broadcast"; "shuffle" forces the scale path in tests.
    """
    # persist the self-joined intermediate: without it Spark recomputes the
    # Python minhash UDF once per join side (4x the text work per query); at
    # warehouse scale signatures would be a materialized column for the same
    # reason
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle,
                              seed).persist()
    cand = lsh_candidate_pairs(sigs, bands=num_hashes // 8, rows_per_band=8)
    # verify on HASHED shingles: intersecting long arrays is ~18x faster
    # than string arrays (measured 59s -> 3.3s on 550k candidates at sf0.1);
    # xxhash64 collisions (~n_shingles^2 / 2^64 per doc pair) cannot
    # realistically perturb a Jaccard at 6 decimals
    sh = (shingle_sets(df, id_col, text_col, shingle)
          .select(id_col, F.array_distinct(
              F.transform("shingles", lambda s: F.xxhash64(s))).alias("shingles"))
          .persist())
    stats = sh.select(F.count(F.lit(1)).alias("n_docs"),
                      F.sum(F.size("shingles")).alias("tot")).first()
    lut_bytes = int(stats["tot"] or 0) * 8 + int(stats["n_docs"] or 0) * 120
    if verify_mode not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"verify_mode {verify_mode!r}")
    if verify_mode == "broadcast" or (verify_mode == "auto"
                                      and lut_bytes <= broadcast_bytes):
        raw = _verify_pairs_broadcast(cand, sh, id_col)
    else:
        # signature pre-filter: matching-lane fraction is an unbiased
        # Jaccard estimate; candidates whose estimate sits >= 4 binomial
        # stderrs below the threshold cannot plausibly verify, so they skip
        # the (heavier) shingle-set join. The 4-sigma margin bounds the
        # recall loss for a true at-threshold pair to ~3e-5 (see docstring).
        sigma = (threshold * (1.0 - threshold) / num_hashes) ** 0.5
        cutoff = (threshold - 4.0 * sigma) * num_hashes
        sa = sigs.select(F.col(id_col).alias("doc_a"),
                         F.col("signature").alias("sig_a"))
        sb = sigs.select(F.col(id_col).alias("doc_b"),
                         F.col("signature").alias("sig_b"))
        matches = F.aggregate(
            F.zip_with("sig_a", "sig_b",
                       lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0))),
            F.lit(0), lambda acc, v: acc + v)
        cand = (cand.join(sa, "doc_a").join(sb, "doc_b")
                    .filter(matches >= F.lit(cutoff))
                    .select("doc_a", "doc_b"))
        a = sh.select(F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a"))
        b = sh.select(F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b"))
        joined = cand.join(a, "doc_a").join(b, "doc_b")
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size("sh_a") + F.size("sh_b") - inter
        raw = joined.select(
            "doc_a", "doc_b",
            (inter / F.greatest(union, F.lit(1)).cast("double")).alias("jaccard"))
    # round/filter in the JVM for BOTH paths so results are bit-identical
    # (numpy rounds half-to-even, Spark half-up)
    from .util import pin_result

    out = (raw.select("doc_a", "doc_b",
                      F.round(F.col("jaccard"), 6).alias("jaccard"))
              .filter(F.col("jaccard") >= threshold))
    return pin_result(out, sigs, sh, key="minhash_dedup_pairs")


def _verify_pairs_broadcast(cand: DataFrame, sh: DataFrame,
                            id_col: str) -> DataFrame:
    """Exact Jaccard for candidate pairs against a broadcast shingle LUT.

    One sorted-array intersection per pair (searchsorted + equality mask),
    ~10µs/pair — the arrays never enter a join, Arrow carries only
    (doc_a, doc_b) in and (doc_a, doc_b, jaccard) out. A doc with NULL
    shingles yields no row for its pairs, matching the join path's
    NULL-comparison semantics.
    """
    pdf_sh = sh.toPandas()
    lut = {int(d): None if s is None
           else np.sort(np.asarray(s, dtype=np.int64))
           for d, s in zip(pdf_sh[id_col], pdf_sh["shingles"])}
    bc = cand.sparkSession.sparkContext.broadcast(lut)

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        L = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            da = pdf["doc_a"].to_numpy()
            db = pdf["doc_b"].to_numpy()
            jac = np.full(len(pdf), np.nan)
            for i in range(len(pdf)):
                A = L.get(int(da[i]))
                B = L.get(int(db[i]))
                if A is None or B is None:
                    continue
                if A.size > B.size:
                    A, B = B, A
                idx = np.searchsorted(A, B)
                ok = idx < A.size
                inter = int((A[idx[ok]] == B[ok]).sum())
                union = A.size + B.size - inter
                jac[i] = inter / max(union, 1)
            keep = ~np.isnan(jac)
            yield pd.DataFrame({"doc_a": da[keep], "doc_b": db[keep],
                                "jaccard": jac[keep]})

    return cand.mapInPandas(verify,
                            schema="doc_a long, doc_b long, jaccard double")


def shingle_sets(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                 shingle: int = 3) -> DataFrame:
    """Distinct character shingles per doc — pure JVM expressions.

    Normalization is projected ONCE per row first: inlining it into the
    transform lambda re-evaluates the regexp per shingle position
    (O(len^2) per doc — measured 22s -> ~2s on 5k docs at sf0.1).
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return (_spread(df.select(F.col(id_col), norm.alias("__norm")))
              .select(
                  F.col(id_col),
                  F.array_distinct(F.expr(
                      f"transform(sequence(1, greatest(length(__norm) - {shingle - 1}, 1)), "
                      f"i -> substring(__norm, i, {shingle}))")).alias("shingles")))


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", shingle: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Exact all-pairs n-gram Jaccard (small sets / verification oracle path;
    the scale path is minhash_dedup_pairs)."""
    sh = shingle_sets(df, id_col, text_col, shingle).persist()
    a = sh.select(F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b"))
    pairs = a.join(b, F.col("doc_a") < F.col("doc_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter / F.greatest(union, F.lit(1)).cast("double")
    from .util import pin_result

    out = (pairs.select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
                .filter(F.col("jaccard") >= threshold))
    return pin_result(out, sh, key="ngram_jaccard_pairs")


# ----------------------------------------------------- repetition signals
def repetition_scores(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      top_ns: tuple[int, ...] = (2, 3),
                      dup_n: int = 5) -> DataFrame:
    """Within-document repetition signals (Gopher quality rules, Rae et al.
    2021 §A1.1, adapted to token n-grams): high values mark boilerplate /
    auto-generated text a curation pipeline drops.

    Per document, over whitespace-normalized lowered tokens:

      * ``top_{n}gram_frac`` (n in ``top_ns``) — max over n-grams of
        ``occurrences x chars(gram)`` divided by normalized text length:
        the character coverage of the single most-covering n-gram.
        (Deterministic without a tie-break column: ties in occurrence
        count resolve by taking the larger coverage, never by picking one
        gram.)
      * ``dup_{dup_n}gram_frac`` — sum over n-grams occurring >= 2 times of
        ``occurrences x chars(gram)``, over text length. This is the
        occurrence-weighted variant (can exceed 1 for overlapping
        repeats); Gopher's char-coverage variant needs per-char overlap
        dedup, which has no exact relational twin.

    Plan shape (holds at 10^12 docs): ONE scan, all n-gram families
    produced by a single JVM ``flatten(transform(...))`` explode, one
    partial-aggregated shuffle on (doc, n, gram), one on (doc), and a
    final join back to the per-doc length — every key contains the
    unique ``doc_id``, so there is no skew and no all-pairs surface.
    Documents shorter than n tokens contribute zero fractions.
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), _NORM_WS, " "))
    base = _spread(df.select(F.col(id_col), norm.alias("__norm")))
    with_toks = base.withColumn("__toks", F.split(F.col("__norm"), " "))
    ns = sorted(set(top_ns) | {dup_n})
    fams = ", ".join(
        f"IF(size(__toks) >= {n}, transform(sequence(1, size(__toks) - {n - 1}), "
        f"i -> named_struct('n', {n}, 'gram', concat_ws(' ', slice(__toks, i, {n})))), "
        f"CAST(array() AS ARRAY<STRUCT<n: INT, gram: STRING>>))"
        for n in ns)
    grams = (with_toks
             .select(id_col, F.explode(F.expr(f"flatten(array({fams}))")).alias("g"))
             .select(id_col, F.col("g.n").alias("n"), F.col("g.gram").alias("gram")))
    cov = F.col("cnt") * F.length("gram")
    stats = (grams.groupBy(id_col, "n", "gram").agg(F.count("*").alias("cnt"))
             .groupBy(id_col, "n")
             .agg(F.max(cov).alias("top_cov"),
                  F.sum(F.when(F.col("cnt") >= 2, cov).otherwise(F.lit(0)))
                   .alias("dup_cov")))
    nch = base.select(id_col, F.length("__norm").alias("__n_chars"))
    denom = F.greatest(F.col("__n_chars"), F.lit(1)).cast("double")
    aggs = [F.round(F.coalesce(
                F.max(F.when(F.col("n") == n, F.col("top_cov"))), F.lit(0))
            / denom, 6).alias(f"top_{n}gram_frac") for n in top_ns]
    aggs.append(F.round(F.coalesce(
                    F.max(F.when(F.col("n") == dup_n, F.col("dup_cov"))), F.lit(0))
                / denom, 6).alias(f"dup_{dup_n}gram_frac"))
    return (nch.join(stats, id_col, "left")
            .groupBy(id_col, "__n_chars").agg(*aggs)
            .drop("__n_chars"))


# ----------------------------------------------------- decontamination
def _distinct_doc_grams(df: DataFrame, id_col: str, text_col: str,
                        n: int) -> DataFrame:
    """(id, gram) rows — each document's DISTINCT token n-grams."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), _NORM_WS, " "))
    toks = F.split(norm, " ")
    gram_expr = (
        f"IF(size(__toks) >= {n}, transform(sequence(1, size(__toks) - {n - 1}), "
        f"i -> concat_ws(' ', slice(__toks, i, {n}))), "
        f"CAST(array() AS ARRAY<STRING>))")
    return (df.select(F.col(id_col), toks.alias("__toks"))
              .select(id_col, F.explode_outer(
                  F.array_distinct(F.expr(gram_expr))).alias("gram")))


def train_gram_set(train_df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", n: int = 13) -> DataFrame:
    """The train corpus's distinct n-gram set — build (or materialize)
    ONCE, score many eval sets / micro-batches against it."""
    return (_distinct_doc_grams(train_df, id_col, text_col, n)
            .select("gram").where(F.col("gram").isNotNull()).distinct())


def contamination_scores(eval_df: DataFrame, train_df: DataFrame | None,
                         id_col: str = "doc_id", text_col: str = "text",
                         n: int = 13, threshold: float = 0.5,
                         train_grams: DataFrame | None = None) -> DataFrame:
    """Doc-level benchmark decontamination (the GPT-3 appendix-C / Llama
    n-gram rule): for every EVAL document, the fraction of its distinct
    token n-grams that appear anywhere in the TRAIN corpus; documents at
    or above ``threshold`` are flagged for removal. This is the per-doc
    removal decision that complements the KMV corpus-level contamination
    ESTIMATE (synopsis/kmv.py): KMV answers "how much overlap" from two
    blobs, this answers "which documents", paying one scan of each corpus.

    Plan shape (holds with a 10^12-doc train side): distinct n-grams per
    side are flatMap + hash-aggregate (no shuffle of raw text); the only
    join is eval-grams LEFT OUTER (hit-marking) train-grams on the gram
    key — one standard hash join, after which a single doc-keyed groupBy
    yields both the gram total and the hit count (one pass over the eval
    corpus, not two).
    Rare long n-grams (the defaults) have no hot keys; for small n enable
    AQE skew handling. Documents shorter than n tokens have no grams and
    score 0.0 (never flagged).

    Output: (id, n_grams, n_hits, contamination_ratio, contaminated).
    Pass ``train_grams`` (from ``train_gram_set``, materialized once) to
    skip recomputing the train side — the streaming ingest path scores
    every micro-batch against one stored gram table.
    """
    ge = _distinct_doc_grams(eval_df, id_col, text_col, n)
    gt = train_grams if train_grams is not None else train_gram_set(
        train_df, id_col, text_col, n)
    # ONE pass over the eval grams: the left join marks hits (gt is
    # distinct, so it cannot duplicate rows; a null gram — the
    # explode_outer row of a shorter-than-n doc — matches nothing and
    # count(col) skips it), and a single groupBy yields both counts
    joined = ge.join(gt.withColumn("__hit", F.lit(1)), "gram", "left")
    out = joined.groupBy(id_col).agg(
        F.count("gram").alias("n_grams"),
        F.count("__hit").alias("n_hits"))
    ratio = F.round(F.col("n_hits")
                    / F.greatest(F.col("n_grams"), F.lit(1)).cast("double"), 6)
    return out.select(id_col, "n_grams", "n_hits",
                      ratio.alias("contamination_ratio"),
                      (ratio >= threshold).alias("contaminated"))


# --------------------------------------------------------------- SimHash
def _token_poly_ids(tokens: list[str]) -> np.ndarray:
    """Token -> uint64 id: Horner base-257 polynomial over the token's
    unicode CODEPOINTS, wrapping mod 2^64.

    Chosen over an opaque library hasher because every step is exact
    integer arithmetic a SQL engine can replay (``list_reduce`` over
    ``ord()`` codepoints with 128-bit modular arithmetic in DuckDB) — the
    same design as the minhash shingle-id polynomial, which is what lets
    ``simhash_pairs`` carry an exact driver oracle instead of a rows-only
    check. Vectorized Horner: one masked multiply-add per codepoint
    position across the whole batch of tokens.
    """
    enc = [t.encode("utf-32-le") for t in tokens]
    n = len(enc)
    lens = np.fromiter((len(b) >> 2 for b in enc), dtype=np.int64, count=n)
    max_len = int(lens.max()) if n else 0
    mat = np.zeros((n, max_len), dtype=np.uint64)
    for i, b in enumerate(enc):
        k = lens[i]
        if k:
            mat[i, :k] = np.frombuffer(b, dtype=np.uint32).astype(np.uint64)
    acc = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):  # uint64 wraparound IS the mod 2^64
        for j in range(max_len):
            live = lens > j
            acc[live] = acc[live] * np.uint64(257) + mat[live, j]
    return acc


def simhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", seed: int = 7) -> DataFrame:
    """64-bit SimHash over whitespace tokens (vectorized pandas UDF).

    Token hash = splitmix64(codepoint-polynomial ^ seed) — exact integer
    ops end-to-end, so the whole signature (and the pair pipeline above
    it) is replayable in ANSI-ish SQL for the driver oracle
    (``_simhash_oracle_sql`` in ``__spark_entry__``). Tokens keep
    multiplicity (a repeated token votes once per occurrence); a doc with
    no tokens gets signature 0.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            toklists = [str(t).lower().split() for t in pdf[text_col]]
            counts = np.fromiter((len(t) for t in toklists), dtype=np.int64,
                                 count=len(toklists))
            out = np.zeros(len(pdf), dtype=np.int64)
            flat = [tok for ts in toklists for tok in ts]
            if flat:
                h = hash64(_token_poly_ids(flat), seed)
                shifts = np.arange(64, dtype=np.uint64)
                signs = ((h[:, None] >> shifts) & np.uint64(1)).astype(
                    np.int64) * 2 - 1                      # (n_tokens, 64)
                nonempty = counts > 0
                bounds = np.zeros(len(pdf) + 1, dtype=np.int64)
                np.cumsum(counts, out=bounds[1:])
                # empty docs contribute no token rows, so the starts of the
                # nonempty docs are exactly the reduceat segment boundaries
                votes = np.add.reduceat(signs, bounds[:-1][nonempty], axis=0)
                sigs = ((votes > 0).astype(np.uint64) << shifts).sum(
                    axis=1, dtype=np.uint64)
                out[nonempty] = sigs.view(np.int64)
            yield pd.DataFrame({"doc_id": pdf[id_col].to_numpy(), "simhash": out})

    return _spread(df.select(id_col, text_col)).mapInPandas(
        fn, schema="doc_id long, simhash long")


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", max_hamming: int = 3,
                       seed: int = 7) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, via 4×16-bit chunk
    blocking (a pair within hamming<=3 shares at least one exact chunk)."""
    # persist: the chunk self-join would otherwise run the signature UDF twice
    sig = simhash_signatures(df, id_col, text_col, seed).persist()
    chunks = sig.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     F.shiftright("simhash", c * 16).bitwiseAND(F.lit(0xFFFF))
                      .alias("val"))
            for c in range(4)])).alias("cc"))
    a = chunks.select(F.col("cc.chunk").alias("chunk"), F.col("cc.val").alias("val"),
                      F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"))
    b = chunks.select(F.col("cc.chunk").alias("chunk"), F.col("cc.val").alias("val"),
                      F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"))
    cand = (a.join(b, ["chunk", "val"]).filter(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b", "sig_a", "sig_b").distinct())
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    from .util import pin_result

    out = (cand.select("doc_a", "doc_b", ham.alias("hamming"))
               .filter(F.col("hamming") <= max_hamming))
    return pin_result(out, sig, key="simhash_near_pairs")


# ---------------------------------------------------------------------------
# PII scrubbing (training-data curation)
# ---------------------------------------------------------------------------

#: (name, pattern, replacement) applied IN ORDER — email first (it contains
#: dots and digits the later patterns would chew on), then IPv4, then
#: international-format phone, then long id-like digit runs. Patterns are
#: deliberately restricted to the regex subset Java (Spark) and RE2 (DuckDB,
#: the oracle engine) evaluate IDENTICALLY: ASCII character classes, bounded
#: greedy quantifiers, non-capturing groups, ASCII \b/\d — no backrefs, no
#: lookaround, no unicode classes. Replacement tokens contain no digits, so
#: later patterns cannot re-match inside an earlier replacement.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("card", r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b", "<CARD>"),
    ("phone", r"\+\d[\d -]{7,14}\d", "<PHONE>"),
    ("idnum", r"\b\d{9,16}\b", "<NUM>"),  # catch-all: MUST stay last
]


def pii_scrub(df: DataFrame, text_col: str = "text",
              out_col: str | None = None) -> DataFrame:
    """Redact PII-shaped spans and count them per row — entirely JVM-side.

    Adds ``n_<rule>`` count columns (one per ``PII_RULES`` entry, counted
    BEFORE that rule's replacement on the partially-scrubbed text, exactly
    the spans the replacement rewrites) and replaces ``text_col`` (or
    writes ``out_col``) with the scrubbed text. Pure ``regexp_count`` /
    ``regexp_replace`` expressions: whole-stage codegen, no Python, no
    shuffle — at 100 TB this is a map-only pass that fuses into whatever
    scan feeds it. The partially-scrubbed text is STAGED through an
    intermediate column per rule (each stage is referenced twice — next
    count + next replace — so CollapseProject keeps it, SPARK-36718, and
    every regex pass runs exactly once; composed as one expression the
    count columns would re-run the whole replace chain). Deterministic and
    engine-portable by construction (see ``PII_RULES``), so the driver
    oracle replays it verbatim in DuckDB."""
    tmp = "__pii_cur"
    out = df.withColumn(tmp, F.col(text_col))
    for name, pat, tok in PII_RULES:
        out = out.withColumn(f"n_{name}", F.regexp_count(F.col(tmp), F.lit(pat)))
        out = out.withColumn(tmp, F.regexp_replace(F.col(tmp), pat, tok))
    return out.withColumn(out_col or text_col, F.col(tmp)).drop(tmp)
