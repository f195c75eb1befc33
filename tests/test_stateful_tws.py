"""transformWithStateInPandas (state API v2) streaming path.

The v2 Python<->JVM state protocol needs google.protobuf, absent in this
sandbox — the end-to-end streaming test is marked skipif. The processor's
merge / timer / late-drop semantics (the part this engine owns, vs. Spark's
transport) are exercised here against stub handles and checked for byte
equality with the batch engine and the v1 (applyInPandasWithState) path's
contract.
"""

import numpy as np
import pandas as pd
import pytest

from condor_spark.engine.builder import SynopsisSpec
from condor_spark.engine.stateful_tws import (TWS_AVAILABLE,
                                              TransformWithStateSynopsisStream,
                                              WindowMergeProcessor)
from condor_spark.engine.windows import Tumbling, duration_us
from condor_spark.synopsis.base import Synopsis

DAY_US = duration_us("1 day")


def _spec():
    return SynopsisSpec(kind="countmin", params=dict(width=512, height=5, seed=7),
                        column="user_id", ts_column="ts", window=Tumbling("1 day"))


class _StubValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class _StubHandle:
    def __init__(self):
        self.states = {}
        self.timers = []

    def getValueState(self, name, schema, ttl=None):
        return self.states.setdefault(name, _StubValueState())

    def registerTimer(self, ms):
        self.timers.append(int(ms))


class _StubTimerValues:
    def __init__(self, wm_ms=0):
        self._wm = int(wm_ms)

    def getCurrentWatermarkInMs(self):
        return self._wm

    def getCurrentProcessingTimeInMs(self):
        return 0


class _StubExpiredTimerInfo:
    def __init__(self, ms):
        self._ms = int(ms)

    def getExpiryTimeInMs(self):
        return self._ms


def _partial_blob(spec, vals):
    syn = spec.make_synopsis()
    syn.update_batch(np.asarray(vals, dtype=np.int64))
    return syn.to_bytes()


def _partials_pdf(spec, chunks, pid0=0):
    return pd.DataFrame({
        "__slice": [0] * len(chunks),
        "__st": [None] * len(chunks),
        "__pid": list(range(pid0, pid0 + len(chunks))),
        "state": [_partial_blob(spec, c) for c in chunks],
        "n": [len(c) for c in chunks],
        "__w": [0] * len(chunks),
        "__evt": [pd.Timestamp(0)] * len(chunks),
    })


def test_processor_merge_matches_batch():
    """Partials merged through the processor across several invocations
    equal one synopsis built over all rows at once (treeReduce law), and the
    timer fires the window exactly once with the right bounds."""
    spec = _spec()
    proc = WindowMergeProcessor(spec, size_us=DAY_US, delay_us=1_000_000)
    handle = _StubHandle()
    proc.init(handle)
    key = (0, None)

    chunks = [[1, 2, 3, 1], [2, 2, 9], [7, 1]]
    out = list(proc.handleInputRows(key, iter([_partials_pdf(spec, chunks[:2])]),
                                    _StubTimerValues(0)))
    out += list(proc.handleInputRows(key, iter([_partials_pdf(spec, chunks[2:], 2)]),
                                     _StubTimerValues(0)))
    assert out == []                      # append mode: nothing until close
    assert len(handle.timers) == 1        # one timer per key for its life
    assert handle.timers[0] == (DAY_US + 1_000_000) // 1000

    rows = pd.concat(list(proc.handleExpiredTimer(
        key, _StubTimerValues(handle.timers[0]),
        _StubExpiredTimerInfo(handle.timers[0]))))
    assert len(rows) == 1
    row = rows.iloc[0]
    assert row["window_start"] == pd.Timestamp(0)
    assert row["window_end"] == pd.Timestamp(DAY_US, unit="us")
    assert row["n"] == 9

    ref = spec.make_synopsis()
    ref.update_batch(np.asarray(sum(chunks, []), dtype=np.int64))
    got = Synopsis.from_bytes(row["state"])
    probe = np.array([1, 2, 3, 7, 9, 42], dtype=np.int64)
    assert (got.query(probe) == ref.query(probe)).all()
    assert not proc.state.exists()        # state cleared on emit


def test_processor_drops_late_partials():
    """A partial arriving after its window fired (state gone, watermark past
    window_end + delay) must not resurrect the window — matches the v1 path
    and the reference's watermark-drop semantics."""
    spec = _spec()
    proc = WindowMergeProcessor(spec, size_us=DAY_US, delay_us=0)
    handle = _StubHandle()
    proc.init(handle)
    key = (0, None)
    late_wm = _StubTimerValues(2 * DAY_US // 1000)

    out = list(proc.handleInputRows(key, iter([_partials_pdf(spec, [[5]])]),
                                    late_wm))
    assert out == []
    assert not proc.state.exists()
    assert handle.timers == []

    # expired timer for a key with no state is a no-op
    assert list(proc.handleExpiredTimer(key, late_wm,
                                        _StubExpiredTimerInfo(0))) == []


def test_processor_admitted_straggler_keeps_fire_time():
    """A straggler admitted by the watermark (wm < window_end + delay) while
    state is live merges into the open window rather than re-registering."""
    spec = _spec()
    proc = WindowMergeProcessor(spec, size_us=DAY_US, delay_us=1_000_000)
    handle = _StubHandle()
    proc.init(handle)
    key = (0, None)

    list(proc.handleInputRows(key, iter([_partials_pdf(spec, [[1, 1]])]),
                              _StubTimerValues(0)))
    list(proc.handleInputRows(key, iter([_partials_pdf(spec, [[1]], 1)]),
                              _StubTimerValues(DAY_US // 1000)))  # wm inside delay
    assert len(handle.timers) == 1
    rows = pd.concat(list(proc.handleExpiredTimer(
        key, _StubTimerValues(handle.timers[0]),
        _StubExpiredTimerInfo(handle.timers[0]))))
    assert Synopsis.from_bytes(rows.iloc[0]["state"]).query(np.array([1], dtype=np.int64))[0] == 3


@pytest.mark.skipif(not TWS_AVAILABLE,
                    reason="google.protobuf absent: TWS state transport "
                           "unavailable in this sandbox")
def test_tws_stream_matches_batch(spark, tmp_path):
    """Full streaming run (only on clusters with protobuf): closed windows
    equal the batch build, mirroring test_stateful_matches_batch."""
    import os
    from condor_spark.engine.builder import build_batch
    from tests.test_stateful import _replay_in_order

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    _replay_in_order(spark, events, src, 5)

    spec = _spec()
    job = TransformWithStateSynopsisStream(spec, watermark_delay="10 seconds")
    q = job.start(spark, src, str(tmp_path / "out"), str(tmp_path / "ck"))
    q.awaitTermination(300)

    got = spark.read.parquet(str(tmp_path / "out")).toPandas()
    ref = build_batch(spark.read.parquet(src), spec).toPandas()
    ref = ref[ref["window_start"].isin(got["window_start"])]
    merged = got.merge(ref, on="window_start", suffixes=("_s", "_b"))
    assert (merged["n_s"] == merged["n_b"]).all()
