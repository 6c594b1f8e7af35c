"""Count-min sketch as a MergeableSketch: frequency estimation with
one-sided error (overestimates only), eps = e/width, delta = e^-depth.

Input contract: pre-hashed int64 values (``F.xxhash64(col)`` JVM-side).
Row hashes are pairwise-independent (a_i*h + b_i mod Mersenne-61) with
deterministic seeds, so sketches built anywhere merge coherently.
Weighted updates supported (weight column = counts).
"""

from __future__ import annotations

from typing import Any, Iterable

import numpy as np
from pyspark.sql import types as T

from .base import SketchSpec

__all__ = ["CMSSpec"]

_M61 = (1 << 61) - 1


class CMSSpec(SketchSpec):
    name = "cms"

    def __init__(self, width: int = 2048, depth: int = 5, seed: int = 42) -> None:
        self.width = width
        self.depth = depth
        self.seed = seed
        rng = np.random.default_rng(seed)
        self._a = rng.integers(1, _M61, size=depth, dtype=np.uint64)
        self._b = rng.integers(0, _M61, size=depth, dtype=np.uint64)

    # -- hashing -----------------------------------------------------------
    def _indices(self, h: np.ndarray) -> np.ndarray:
        """(depth, n) bucket indices for hashed values h."""
        x = np.asarray(h).astype(np.int64).view(np.uint64) % np.uint64(_M61)
        with np.errstate(over="ignore"):
            v = (self._a[:, None] * x[None, :] + self._b[:, None]) % np.uint64(_M61)
        return (v % np.uint64(self.width)).astype(np.int64)

    # -- monoid --------------------------------------------------------------
    def zero(self) -> np.ndarray:
        return np.zeros((self.depth, self.width), dtype=np.float64)

    def update(
        self, state: np.ndarray, values: np.ndarray, weights: np.ndarray | None = None
    ) -> np.ndarray:
        idx = self._indices(values)
        w = (
            np.ones(idx.shape[1], dtype=np.float64)
            if weights is None
            else np.asarray(weights, dtype=np.float64)
        )
        for d in range(self.depth):
            state[d] += np.bincount(idx[d], weights=w, minlength=self.width)
        return state

    def merge(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        a += b
        return a

    # -- queries -----------------------------------------------------------------
    def estimate(self, state: np.ndarray, hashed_items: Iterable[int]) -> np.ndarray:
        """Point estimates (min over rows) for pre-hashed items."""
        h = np.asarray(list(hashed_items), dtype=np.int64)
        idx = self._indices(h)
        ests = np.stack([state[d][idx[d]] for d in range(self.depth)])
        return ests.min(axis=0)

    # -- codec ---------------------------------------------------------------------
    def state_fields(self) -> list[T.StructField]:
        return [T.StructField("counts", T.ArrayType(T.DoubleType(), False))]

    def state_to_row(self, state: np.ndarray) -> dict[str, Any]:
        return {"counts": state.ravel()}

    def row_to_state(self, row: dict[str, Any]) -> np.ndarray:
        return np.asarray(row["counts"], dtype=np.float64).reshape(
            self.depth, self.width
        )

    def result_fields(self) -> list[T.StructField]:
        return [
            T.StructField("total_weight", T.DoubleType()),
            T.StructField("counts", T.ArrayType(T.DoubleType(), False)),
        ]

    def result(self, state: np.ndarray) -> dict[str, Any]:
        return {"total_weight": float(state[0].sum()), "counts": state.ravel()}
