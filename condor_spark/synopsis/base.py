"""Synopsis protocol — the numpy re-expression of the reference trait lattice.

Reference trait hierarchy (see SURVEY.md §1.1):
  ``Synopsis.update``                core/.../synopsis/Synopsis.java:13-20
  ``MergeableSynopsis.merge``        core/.../synopsis/MergeableSynopsis.java:13-23
  ``CommutativeSynopsis`` (marker)   core/.../synopsis/CommutativeSynopsis.java:5-8
  ``InvertibleSynopsis.invert``      core/.../synopsis/InvertibleSynopsis.java:5-13
  ``SamplerWithTimestamps``          core/.../synopsis/Sampling/SamplerWithTimestamps.java:5-7
  ``NonMergeableSynopsisManager``    core/.../synopsis/NonMergeableSynopsisManager.java:5-35

Differences from the reference (deliberate, Spark-first):
  * ``update_batch`` consumes a whole numpy batch (Arrow column) instead of
    one element — no per-row Python anywhere.
  * state serializes to a single ``bytes`` blob so a synopsis travels as one
    BinaryType cell through a Spark shuffle.
"""

from __future__ import annotations

import io
import pickle
from enum import Enum
from typing import Any

import numpy as np


class Trait(str, Enum):
    MERGEABLE = "mergeable"        # merge() defined, order may matter for samplers
    COMMUTATIVE = "commutative"    # merge() order-insensitive
    INVERTIBLE = "invertible"      # + invert()/decrement()
    NON_MERGEABLE = "non_mergeable"  # order-based; unified via slice managers


class Synopsis:
    """Base synopsis. Subclasses set KIND/TRAIT and implement the kernel."""

    KIND: str = "base"
    TRAIT: Trait = Trait.MERGEABLE
    #: True when update_batch wants the event-time array (samplers)
    NEEDS_TIMESTAMPS: bool = False

    def __init__(self, **params: Any):
        self.params = params
        self.n_processed = 0

    # --- kernel API -------------------------------------------------------
    def update_batch(self, values: np.ndarray, ts: np.ndarray | None = None) -> None:
        raise NotImplementedError

    def merge(self, other: "Synopsis") -> "Synopsis":
        """Merge ``other`` into self (in place), return self."""
        raise NotImplementedError

    def invert(self, other: "Synopsis") -> "Synopsis":
        raise NotImplementedError(f"{self.KIND} is not invertible")

    # --- serde ------------------------------------------------------------
    def _state(self) -> dict:
        """Everything beyond params needed to reconstruct the synopsis."""
        d = dict(self.__dict__)
        d.pop("params", None)
        return d

    def _load_state(self, state: dict) -> None:
        self.__dict__.update(state)

    def to_bytes(self) -> bytes:
        d = {"kind": self.KIND, "params": self.params, "state": self._state()}
        if type(self).__module__.split(".")[0] != "condor_spark":
            # user-defined synopsis: carry the class in the blob (cloudpickle,
            # by value) so any worker stage deserializes without registration
            d["cls"] = type(self)
            try:
                from pyspark import cloudpickle
                return cloudpickle.dumps(d, protocol=pickle.HIGHEST_PROTOCOL)
            except ImportError:
                pass
        buf = io.BytesIO()
        pickle.dump(d, buf, protocol=pickle.HIGHEST_PROTOCOL)
        return buf.getvalue()

    @staticmethod
    def from_bytes(blob: bytes) -> "Synopsis":
        d = pickle.loads(blob)
        if "cls" in d:
            register(d["cls"])
            syn = d["cls"](**d["params"])
        else:
            syn = make(d["kind"], **d["params"])
        syn._load_state(d["state"])
        return syn

    #: params irrelevant for merge compatibility (e.g. 'seed' for samplers
    #: whose contents don't depend on hash functions)
    MERGE_IGNORE_PARAMS: tuple = ()

    def _check_same(self, other: "Synopsis") -> None:
        # mirrors the reference's illegal-merge guards
        # (core/.../Sketches/CountMinSketch.java:156-173)
        skip = set(self.MERGE_IGNORE_PARAMS)
        mine = {k: v for k, v in self.params.items() if k not in skip}
        theirs = {k: v for k, v in getattr(other, "params", {}).items() if k not in skip}
        if type(other) is not type(self) or mine != theirs:
            raise ValueError(
                f"cannot merge {self.KIND}{self.params} with "
                f"{getattr(other, 'KIND', type(other))}{getattr(other, 'params', {})}")


_REGISTRY: dict[str, type] = {}


def register(cls: type) -> type:
    _REGISTRY[cls.KIND] = cls
    return cls


def make(kind: str, **params: Any) -> Synopsis:
    if kind not in _REGISTRY:
        # import side-effect registration
        from . import _register_all  # noqa: F401
    return _REGISTRY[kind](**params)


def kinds() -> list[str]:
    from . import _register_all  # noqa: F401
    return sorted(_REGISTRY)
