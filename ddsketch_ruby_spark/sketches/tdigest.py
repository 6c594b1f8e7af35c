"""t-digest (Dunning's merging variant) as a MergeableSketch.

Centroids (mean, weight) compressed against the k1 scale function
k(q) = (delta/2pi) * asin(2q-1): a centroid may absorb neighbors while the
k-size of the merged run stays <= 1. Accuracy concentrates at the tails
(rank error ~ q(1-q)/delta).

Vectorization note: instead of Dunning's sequential greedy pass we assign
sorted points to k-index buckets (floor of k(q_left)) and merge within
buckets — a standard batch formulation that keeps the same k-size bound
and is fully NumPy-vectorizable. Exact min/max are tracked for q=0/q=1.
Quantiles interpolate linearly between centroid midpoints.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
from pyspark.sql import types as T

from .base import SketchSpec

__all__ = ["TDigestSpec", "tdigest_quantile"]


def _k_scale(q: np.ndarray, delta: float) -> np.ndarray:
    return (delta / (2.0 * math.pi)) * np.arcsin(2.0 * np.clip(q, 0, 1) - 1.0)


def _compress(
    means: np.ndarray, weights: np.ndarray, delta: float
) -> tuple[np.ndarray, np.ndarray]:
    if len(means) == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    means = means[order]
    weights = weights[order]
    total = weights.sum()
    q_left = (np.cumsum(weights) - weights) / total
    buckets = np.floor(_k_scale(q_left, delta) + 0.5 * delta).astype(np.int64)
    # merge runs with equal bucket id
    uniq, inv = np.unique(buckets, return_inverse=True)
    w_out = np.bincount(inv, weights=weights)
    m_out = np.bincount(inv, weights=means * weights) / w_out
    return m_out, w_out


class _TD:
    __slots__ = ("means", "weights", "min", "max", "count", "sum")

    def __init__(self):
        self.means = np.zeros(0)
        self.weights = np.zeros(0)
        self.min = math.inf
        self.max = -math.inf
        self.count = 0.0
        self.sum = 0.0


def tdigest_quantile(td: _TD, q: float) -> float | None:
    if td.count == 0 or q < 0 or q > 1:
        return None
    if q == 0:
        return td.min
    if q == 1:
        return td.max
    m, w = td.means, td.weights
    if len(m) == 1:
        return float(m[0])
    target = q * td.count
    cum = np.cumsum(w) - 0.5 * w  # centroid midpoints in rank space
    if target <= cum[0]:
        # interpolate min .. first centroid
        f = target / cum[0]
        return float(td.min + f * (m[0] - td.min))
    if target >= cum[-1]:
        f = (target - cum[-1]) / (td.count - cum[-1])
        return float(m[-1] + f * (td.max - m[-1]))
    i = int(np.searchsorted(cum, target, side="right"))
    f = (target - cum[i - 1]) / (cum[i] - cum[i - 1])
    return float(m[i - 1] + f * (m[i] - m[i - 1]))


class TDigestSpec(SketchSpec):
    name = "tdigest"

    def __init__(
        self,
        delta: float = 200.0,
        quantiles: dict[str, float] | None = None,
    ) -> None:
        self.delta = delta
        self.quantiles = quantiles or {"q50": 0.5, "q95": 0.95, "q99": 0.99}

    def zero(self) -> _TD:
        return _TD()

    def update(
        self, state: _TD, values: np.ndarray, weights: np.ndarray | None = None
    ) -> _TD:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return state
        w = (
            np.ones_like(v)
            if weights is None
            else np.asarray(weights, dtype=np.float64)
        )
        state.count += float(w.sum())
        state.sum += float((v * w).sum())
        state.min = min(state.min, float(v.min()))
        state.max = max(state.max, float(v.max()))
        means = np.concatenate([state.means, v])
        wts = np.concatenate([state.weights, w])
        state.means, state.weights = _compress(means, wts, self.delta)
        return state

    def merge(self, a: _TD, b: _TD) -> _TD:
        if b.count == 0:
            return a
        a.count += b.count
        a.sum += b.sum
        a.min = min(a.min, b.min)
        a.max = max(a.max, b.max)
        a.means, a.weights = _compress(
            np.concatenate([a.means, b.means]),
            np.concatenate([a.weights, b.weights]),
            self.delta,
        )
        return a

    def state_fields(self) -> list[T.StructField]:
        return [
            T.StructField("means", T.ArrayType(T.DoubleType(), False)),
            T.StructField("weights", T.ArrayType(T.DoubleType(), False)),
            T.StructField("min", T.DoubleType()),
            T.StructField("max", T.DoubleType()),
            T.StructField("count", T.DoubleType()),
            T.StructField("sum", T.DoubleType()),
        ]

    def state_to_row(self, state: _TD) -> dict[str, Any]:
        return {
            "means": state.means,
            "weights": state.weights,
            "min": state.min,
            "max": state.max,
            "count": state.count,
            "sum": state.sum,
        }

    def row_to_state(self, row: dict[str, Any]) -> _TD:
        td = _TD()
        td.means = np.asarray(row["means"], dtype=np.float64)
        td.weights = np.asarray(row["weights"], dtype=np.float64)
        td.min = float(row["min"])
        td.max = float(row["max"])
        td.count = float(row["count"])
        td.sum = float(row["sum"])
        return td

    def result_fields(self) -> list[T.StructField]:
        return [
            T.StructField(name, T.DoubleType()) for name in self.quantiles
        ] + [
            T.StructField("count", T.DoubleType()),
            T.StructField("avg", T.DoubleType()),
        ]

    def result(self, state: _TD) -> dict[str, Any]:
        out = {
            name: tdigest_quantile(state, q) for name, q in self.quantiles.items()
        }
        out["count"] = state.count
        out["avg"] = state.sum / state.count if state.count else None
        return out
