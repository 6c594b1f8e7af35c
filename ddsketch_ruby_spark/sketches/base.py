"""MergeableSketch protocol: the common UDAF interface for all sketches.

Every sketch (DDSketch, HLL, count-min, Bloom, t-digest, KLL) implements
this contract and is then executed distributively by one shared engine
(operators/agg.py): per-partition ``zero``+``update`` (map-side combine) ->
shuffle of compact state rows -> ``merge`` tree -> ``result``.

Legality requirement (verified per sketch in tests/): ``merge`` must be
commutative and associative with ``zero`` as identity — the same monoid
contract the reference pins for DDSketch
(/root/reference/spec/support/shared_examples_for_sketch.rb:118-250).

State travels as FLAT top-level DataFrame columns (``state_fields``), which
keeps Arrow conversion cheap and the shuffle rows small; params (accuracy,
widths, seeds) are plan-time constants captured in the spec closure, not
shipped per row.
"""

from __future__ import annotations

import abc
from typing import Any

import numpy as np
from pyspark.sql import types as T

__all__ = ["SketchSpec"]


class SketchSpec(abc.ABC):
    """Config-carrying factory + codec for one sketch type."""

    #: short name used in default column prefixes
    name: str = "sketch"

    # -- monoid ------------------------------------------------------------
    @abc.abstractmethod
    def zero(self) -> Any:
        """Fresh empty state (kernel-side object)."""

    @abc.abstractmethod
    def update(
        self, state: Any, values: np.ndarray, weights: np.ndarray | None = None
    ) -> Any:
        """Fold a batch of values into state; returns the (mutated) state."""

    @abc.abstractmethod
    def merge(self, a: Any, b: Any) -> Any:
        """Merge b into a; returns a. Must be associative + commutative."""

    # -- state codec ---------------------------------------------------------
    @abc.abstractmethod
    def state_fields(self) -> list[T.StructField]:
        """Flat Spark schema of the serialized state."""

    @abc.abstractmethod
    def state_to_row(self, state: Any) -> dict[str, Any]:
        """State -> {field_name: arrow-compatible value}."""

    @abc.abstractmethod
    def row_to_state(self, row: dict[str, Any]) -> Any:
        """Inverse of state_to_row."""

    # -- finalization ----------------------------------------------------------
    def result_fields(self) -> list[T.StructField]:
        """Schema of the finalized output (override with result())."""
        raise NotImplementedError(f"{type(self).__name__} has no finalizer")

    def result(self, state: Any) -> dict[str, Any]:
        """State -> final answer row."""
        raise NotImplementedError(f"{type(self).__name__} has no finalizer")

    # -- convenience -------------------------------------------------------------
    def state_schema(self) -> T.StructType:
        return T.StructType(self.state_fields())

    def result_schema(self) -> T.StructType:
        return T.StructType(self.result_fields())
