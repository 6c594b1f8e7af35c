"""KMV (k-minimum-values, "theta"-style) distinct-count sketch.

State = the k smallest DISTINCT 64-bit hash values seen (unsigned order),
kept sorted. Merge = k-smallest of the set union — a pure function of the
input SET, so the sketch is order- and partitioning-insensitive by
construction (same legality argument as the collapsing stores:
kernel/store.py:11-25). That determinism is what lets the driver oracle
hash-match the ESTIMATES, not just assert bounds: DuckDB can recompute
the identical k smallest hashes and the identical float expression.

Estimator (Bar-Yossef et al. 2002; Beyer et al. 2007 "On synopses for
distinct-value estimation under multiset operations"):

    n < k  ->  exact n (the sketch holds every distinct hash)
    else   ->  (k - 1) / u_k,   u_k = h_k * 2^-64

u_k is one uint64->double conversion (round-to-nearest in every IEEE
engine) times an exact power of two, and the division is one correctly-
rounded op — bit-identical across NumPy / Spark / DuckDB.

Unlike HLL (register max — union only), a KMV state supports SET
OPERATIONS: the k smallest of A ∪ B form an exact KMV sketch of the
union, and the fraction of those that lie in both A and B estimates the
Jaccard similarity, giving |A ∩ B| ≈ ρ · est(A ∪ B) (Beyer et al. §4).
See operators/frequency.py kmv_overlap for the distributed pairing.

Input contract matches HLLSpec: values are already 64-bit hashes
(``F.xxhash64`` JVM-side); the Python boundary only sees int64.
"""

from __future__ import annotations

from typing import Any

import numpy as np
from pyspark.sql import types as T

from .base import SketchSpec

__all__ = ["KmvSpec", "kmv_estimate", "kmv_union", "kmv_intersect_stats"]


def kmv_estimate(state: np.ndarray, k: int) -> float:
    """Distinct-count estimate from a sorted uint64 KMV state."""
    n = len(state)
    if n < k:
        return float(n)
    u_k = float(state[k - 1]) * 2.0**-64
    if u_k == 0.0:  # all-zero hash pathology; exact lower bound
        return float(n)
    return (k - 1) / u_k


def kmv_union(a: np.ndarray, b: np.ndarray, k: int) -> np.ndarray:
    """Exact KMV state of the union of the two sketched sets (restricted
    to the hashes both sketches could have retained)."""
    return np.unique(np.concatenate([a, b]))[:k]


def kmv_intersect_stats(
    a: np.ndarray, b: np.ndarray, k: int
) -> tuple[float, float, float]:
    """(est_union, jaccard, est_intersect) for two KMV states.

    Uses the k' = |union sketch| smallest union hashes as the common
    sample: rho = |{h in sample : h in A and h in B}| / k',
    jaccard = rho, est_intersect = rho * est_union. Both float ops are
    single correctly-rounded expressions (replayed verbatim by the SQL
    oracle in __spark_entry__)."""
    u = kmv_union(a, b, k)
    ku = len(u)
    est_u = kmv_estimate(u, k)
    if ku == 0:
        return 0.0, 0.0, 0.0
    both = np.isin(u, a) & np.isin(u, b)
    rho = float(int(both.sum())) / float(ku)
    return est_u, rho, rho * est_u


class KmvSpec(SketchSpec):
    name = "kmv"

    def __init__(self, k: int = 256) -> None:
        if k < 2:
            raise ValueError("k must be >= 2")
        self.k = k

    def zero(self) -> np.ndarray:
        return np.empty(0, dtype=np.uint64)

    def update(
        self, state: np.ndarray, values: np.ndarray, weights: np.ndarray | None = None
    ) -> np.ndarray:
        h = np.asarray(values).astype(np.int64).view(np.uint64)
        return np.unique(np.concatenate([state, h]))[: self.k]

    def merge(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return np.unique(np.concatenate([a, b]))[: self.k]

    def state_fields(self) -> list[T.StructField]:
        return [T.StructField("minima", T.BinaryType())]

    def state_to_row(self, state: np.ndarray) -> dict[str, Any]:
        return {"minima": state.tobytes()}

    def row_to_state(self, row: dict[str, Any]) -> np.ndarray:
        return np.frombuffer(bytes(row["minima"]), dtype=np.uint64).copy()

    def result_fields(self) -> list[T.StructField]:
        return [T.StructField("approx_distinct", T.DoubleType())]

    def result(self, state: np.ndarray) -> dict[str, Any]:
        return {"approx_distinct": kmv_estimate(state, self.k)}
