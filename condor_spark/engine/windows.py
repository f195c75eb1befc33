"""Window specifications and slice math.

Reference: Scotty ``TumblingWindow(measure, size)`` / ``SlidingWindow(measure,
size, slide)`` with Time or Count measures plus session support
(SURVEY.md §2.4; ``flinkScottyConnector/.../SynopsisBuilder.java:218-221,
335-337``). Spark-first mapping:

  * tumbling/sliding time windows → *slices*: a slice is a tumbling bucket of
    ``gcd(size, slide)`` µs. Partial synopses are built per slice and each
    slice is expanded (JVM-side ``sequence``+``explode``) into the sliding
    windows that contain it — the relational form of Scotty's "general stream
    slicing": overlapping windows share slice partials, and only slice-sized
    sketch blobs ever shuffle, never raw rows.
  * session windows → gaps-and-islands sessionization (lag + cumulative sum)
    per stratum key, matching ``session_window`` semantics (end = last ts + gap).
  * count windows → deterministic global row index (two-pass partition
    offsets), window id = index // count.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import pandas as pd


def duration_us(s: str | int | float) -> int:
    """'10 seconds' / '1 day' / int microseconds → microseconds.

    The engine tracks event time in epoch MICROseconds end-to-end: parquet
    timestamps carry µs precision and any truncation would desynchronize
    window/session bounds from the exact-SQL oracles."""
    if isinstance(s, (int, float)):
        return int(s)
    return int(pd.Timedelta(s).total_seconds() * 1_000_000)


@dataclass(frozen=True)
class Tumbling:
    size: str  # e.g. "1 day"

    @property
    def size_us(self) -> int:
        return duration_us(self.size)

    @property
    def slice_us(self) -> int:
        return self.size_us


@dataclass(frozen=True)
class Sliding:
    size: str
    slide: str

    @property
    def size_us(self) -> int:
        return duration_us(self.size)

    @property
    def slide_us(self) -> int:
        return duration_us(self.slide)

    @property
    def slice_us(self) -> int:
        return math.gcd(self.size_us, self.slide_us)


@dataclass(frozen=True)
class Session:
    gap: str

    @property
    def gap_us(self) -> int:
        return duration_us(self.gap)


@dataclass(frozen=True)
class CountTumbling:
    count: int


@dataclass(frozen=True)
class GlobalWindow:
    """Single window over the whole input (batch analytics mode)."""
