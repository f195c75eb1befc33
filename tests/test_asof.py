"""As-of join vs pandas merge_asof ground truth."""
import numpy as np
import pandas as pd
import pytest

from condor_spark.engine.joins import asof_join


def _mk(spark, seed=7, n_left=400, n_right=120, n_keys=8):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2020-01-01")
    left = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_left),
        "ts": base + pd.to_timedelta(rng.integers(0, 100_000, n_left), "s"),
        "lval": rng.normal(size=n_left).round(6),
    }).drop_duplicates(["k", "ts"]).reset_index(drop=True)
    right = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_right),
        "rts": base + pd.to_timedelta(rng.integers(0, 100_000, n_right), "s"),
        "rval": rng.normal(size=n_right).round(6),
    }).drop_duplicates(["k", "rts"]).reset_index(drop=True)
    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    return left, right, sl, sr


def _expected(left, right, direction="backward", tolerance=None,
              strict=False):
    exp = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.rename(columns={"rts": "ts"}).sort_values("ts", kind="stable"),
        on="ts", by="k", direction=direction,
        tolerance=None if tolerance is None else pd.Timedelta(tolerance),
        allow_exact_matches=not strict)
    exp["rts"] = exp["ts"].where(exp["rval"].notna())
    # merge_asof only yields the matched ts implicitly; recompute it
    r2 = right.set_index(["k", "rval"])["rts"]
    exp["rts"] = [
        r2.get((k, v), pd.NaT) if pd.notna(v) else pd.NaT
        for k, v in zip(exp["k"], exp["rval"])]
    return exp


def _got(sdf):
    return (sdf.toPandas()
            .sort_values(["k", "ts", "lval"], kind="stable")
            .reset_index(drop=True))


def _cmp(got, exp):
    exp = (exp.sort_values(["k", "ts", "lval"], kind="stable")
           .reset_index(drop=True))
    assert len(got) == len(exp)
    for c in ["k", "ts", "lval", "rval", "rts"]:
        g, e = got[c], exp[c]
        if g.dtype.kind == "f":
            assert ((g.isna() == e.isna()).all()
                    and np.allclose(g.dropna(), e.dropna()))
        else:
            assert (g.fillna(pd.Timestamp(0)) if g.dtype.kind == "M"
                    else g).astype(str).equals(
                (e.fillna(pd.Timestamp(0)) if e.dtype.kind == "M"
                 else e).astype(str))


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas(spark, direction):
    left, right, sl, sr = _mk(spark)
    got = _got(asof_join(sl, sr, on="k", left_ts="ts", right_ts="rts",
                         direction=direction))
    _cmp(got, _expected(left, right, direction=direction))


def test_asof_tolerance(spark):
    left, right, sl, sr = _mk(spark, seed=13)
    got = _got(asof_join(sl, sr, on="k", left_ts="ts", right_ts="rts",
                         tolerance="1 hour"))
    _cmp(got, _expected(left, right, tolerance="1 hour"))


def test_asof_strict_excludes_ties(spark):
    import pandas as pd
    left = pd.DataFrame({"k": [1, 1], "ts": pd.to_datetime(
        ["2020-01-01 00:00:05", "2020-01-01 00:00:09"]), "lval": [1.0, 2.0]})
    right = pd.DataFrame({"k": [1, 1], "rts": pd.to_datetime(
        ["2020-01-01 00:00:05", "2020-01-01 00:00:07"]), "rval": [10.0, 20.0]})
    sl, sr = spark.createDataFrame(left), spark.createDataFrame(right)
    loose = _got(asof_join(sl, sr, on="k", left_ts="ts", right_ts="rts"))
    strict = _got(asof_join(sl, sr, on="k", left_ts="ts", right_ts="rts",
                            strict=True))
    assert loose["rval"].tolist() == [10.0, 20.0]
    assert strict["rval"].isna().tolist() == [True, False]
    assert strict["rval"].dropna().tolist() == [20.0]


def test_asof_inner_drops_unmatched(spark):
    left, right, sl, sr = _mk(spark, seed=3)
    out = asof_join(sl, sr, on="k", left_ts="ts", right_ts="rts",
                    how="inner").toPandas()
    assert out["rval"].notna().all()
    exp = _expected(left, right)
    assert len(out) == int(exp["rval"].notna().sum())


def test_asof_null_payload_is_row_wise(spark):
    """A matched right row whose payload is NULL must yield NULL — not
    fill through to an older right row's value for that column (the match
    is the ROW, exactly merge_asof's semantics)."""
    left = pd.DataFrame({"k": [1], "ts": pd.to_datetime(
        ["2020-01-01 00:00:04"]), "lval": [1.0]})
    right = pd.DataFrame({"k": [1, 1], "rts": pd.to_datetime(
        ["2020-01-01 00:00:01", "2020-01-01 00:00:03"]),
        "rval": [5.0, np.nan]})
    sl, sr = spark.createDataFrame(left), spark.createDataFrame(right)
    got = _got(asof_join(sl, sr, on="k", left_ts="ts", right_ts="rts"))
    assert got["rts"].tolist() == [pd.Timestamp("2020-01-01 00:00:03")]
    assert got["rval"].isna().all()


def test_asof_collision_raises(spark):
    _, _, sl, sr = _mk(spark)
    with pytest.raises(ValueError):
        asof_join(sl, sr.withColumnRenamed("rval", "lval"),
                  on="k", left_ts="ts", right_ts="rts")


def test_asof_same_ts_name_defaults_work(spark):
    """Both sides naming their timestamp the same (the signature defaults)
    must work — the matched right ts comes back as `{right_ts}_right`."""
    left, right, sl, _ = _mk(spark)
    sr = spark.createDataFrame(right.rename(columns={"rts": "ts"}))
    out = asof_join(sl, sr, on="k")  # left_ts == right_ts == "ts"
    assert "ts_right" in out.columns
    got = (out.withColumnRenamed("ts_right", "rts").toPandas()
           .sort_values(["k", "ts", "lval"], kind="stable")
           .reset_index(drop=True))
    _cmp(got, _expected(left, right))


def test_asof_single_shuffle_no_python(spark):
    _, _, sl, sr = _mk(spark)
    out = asof_join(sl, sr, on="k", left_ts="ts", right_ts="rts")
    out.collect()
    # AQE prints Final + Initial sections; count only the final plan
    plan = (out._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    assert "Python" not in plan
    # a union merge: the only structural shuffle is the window's
    # hashpartitioning on the key (AQE may add reads, not exchanges)
    import re
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
