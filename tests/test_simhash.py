"""SimHash unit invariants: the SQL-replayable token polynomial and the
vectorized signature path (the e2e engine-vs-DuckDB parity lives in
test_entry.py::test_oracle_match[simhash_pairs])."""

import numpy as np

from condor_spark.engine.text import _token_poly_ids
from condor_spark.synopsis.hashing import hash64


def _horner(tok: str) -> int:
    acc = 0
    for ch in tok:
        acc = (acc * 257 + ord(ch)) % (1 << 64)
    return acc


def test_token_poly_matches_scalar_horner():
    toks = ["hello", "wörld", "a", "x" * 40, "", "MiXeD123", "日本語"]
    ids = _token_poly_ids(toks)
    assert ids.dtype == np.uint64
    for t, v in zip(toks, ids):
        assert int(v) == _horner(t), t


def test_token_poly_wraps_mod_2_64():
    # 11 chars of 'z' push the polynomial past 2^64: 257^10 > 2^80
    t = "z" * 11
    v = int(_token_poly_ids([t])[0])
    assert v == _horner(t)
    assert v < (1 << 64)


def test_signature_batch_matches_scalar(spark):
    from condor_spark.engine.text import simhash_signatures

    texts = ["hello world hello", "", "   ", "The quick brown Fox",
             "one two three four five", "hello\tworld\nagain"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r.doc_id: r.simhash
           for r in simhash_signatures(df).collect()}

    shifts = np.arange(64, dtype=np.uint64)
    for i, text in enumerate(texts):
        toks = text.lower().split()
        if not toks:
            assert got[i] == 0
            continue
        h = hash64(_token_poly_ids(toks), 7)
        votes = (((h[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
                 * 2 - 1).sum(axis=0)
        want = int(((votes > 0).astype(np.uint64) << shifts)
                   .sum(dtype=np.uint64).view(np.int64))
        assert got[i] == want, (i, text)
