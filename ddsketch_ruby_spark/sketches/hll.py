"""HyperLogLog distinct-count sketch as a MergeableSketch.

Dense 2^p uint8 registers; merge = element-wise max (commutative,
associative, idempotent). Input contract: values are already 64-bit hashes
— compute them JVM-side with ``F.xxhash64(col)`` so the Python boundary
only ever sees int64 (the idiomatic split: hashing in whole-stage codegen,
register folding vectorized in NumPy).

Estimator: classic HLL (Flajolet et al.) with linear counting for the small
range — standard error ~= 1.04/sqrt(2^p) (~0.8% at the default p=14);
cross-checked against Spark's built-in HLL++ ``approx_count_distinct`` in
tests.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
from pyspark.sql import types as T

from .base import SketchSpec

__all__ = ["HLLSpec", "hll_estimate"]


def _alpha_m(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _rho(h: np.ndarray, width: int) -> np.ndarray:
    """1 + number of leading zeros in the low ``width`` bits of h."""
    r = h & np.uint64((1 << width) - 1)
    # bit length via 6-step binary search (vectorized)
    bl = np.zeros(r.shape, dtype=np.int64)
    v = r.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = v >= (np.uint64(1) << np.uint64(shift))
        bl[mask] += shift
        v[mask] >>= np.uint64(shift)
    bl[r > 0] += 1  # bit_length of a nonzero value
    return (width - bl + 1).astype(np.uint8)


def hll_estimate(registers: np.ndarray) -> float:
    """Cardinality estimate from a register array.

    The indicator sum 2^-r is accumulated EXACTLY as a big integer
    (sum of 2^(R-r) scaled by 2^-R, R = max rho = 65 - p): every term is
    dyadic, so the float sum would depend on accumulation order once the
    exponent spread exceeds 53 bits; the integer sum makes the estimate a
    pure function of the register multiset — reproducible by a SQL oracle
    summing the same integers (__spark_entry__ hll oracle)."""
    m = len(registers)
    p = m.bit_length() - 1
    R = 65 - p  # rho ranges over 1..R for occupied registers, 0 empty
    # clamp out-of-range values (corrupt/foreign state) instead of letting
    # a negative shift below raise — mirrors the old float formulation's
    # graceful degradation (a too-large rho contributes ~0 to the sum)
    vals, counts = np.unique(np.minimum(registers, R), return_counts=True)
    S = sum(int(c) << (R - int(v)) for v, c in zip(vals, counts))
    denom = float(S) * 2.0 ** (-R)
    raw = _alpha_m(m) * m * m / denom
    zeros = int((registers == 0).sum())
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)  # linear counting
    return float(raw)


class HLLSpec(SketchSpec):
    name = "hll"

    def __init__(self, p: int = 14) -> None:
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p

    def zero(self) -> np.ndarray:
        return np.zeros(self.m, dtype=np.uint8)

    def update(
        self, state: np.ndarray, values: np.ndarray, weights: np.ndarray | None = None
    ) -> np.ndarray:
        h = np.asarray(values).astype(np.int64).view(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rho = _rho(h, 64 - self.p)
        np.maximum.at(state, idx, rho)
        return state

    def merge(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        np.maximum(a, b, out=a)
        return a

    def state_fields(self) -> list[T.StructField]:
        return [T.StructField("registers", T.BinaryType())]

    def state_to_row(self, state: np.ndarray) -> dict[str, Any]:
        return {"registers": state.tobytes()}

    def row_to_state(self, row: dict[str, Any]) -> np.ndarray:
        return np.frombuffer(bytes(row["registers"]), dtype=np.uint8).copy()

    def result_fields(self) -> list[T.StructField]:
        return [T.StructField("approx_distinct", T.DoubleType())]

    def result(self, state: np.ndarray) -> dict[str, Any]:
        return {"approx_distinct": hll_estimate(state)}
