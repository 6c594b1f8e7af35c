"""Bloom filter as a MergeableSketch: approximate set membership with
no false negatives; merge = bitwise OR.

Input contract: pre-hashed int64 values (``F.xxhash64(col)`` JVM-side).
k index hashes are derived via double hashing h1 + i*h2 (Kirsch-Mitzenmacker),
deterministic, so filters built on any partitioning merge coherently.
Cross-checked against Spark's built-in ``bloom_filter_agg`` semantics in
tests (no false negatives; FPR near theory).
"""

from __future__ import annotations

import math
from typing import Any, Iterable

import numpy as np
from pyspark.sql import types as T

from .base import SketchSpec

__all__ = ["BloomSpec"]


class BloomSpec(SketchSpec):
    name = "bloom"

    def __init__(
        self,
        expected_items: int = 1_000_000,
        fpp: float = 0.01,
        num_bits: int | None = None,
        num_hashes: int | None = None,
    ) -> None:
        if num_bits is None:
            num_bits = max(
                64, int(-expected_items * math.log(fpp) / (math.log(2) ** 2))
            )
        num_bits = ((num_bits + 63) // 64) * 64  # whole uint64 words
        if num_hashes is None:
            num_hashes = max(1, round(num_bits / expected_items * math.log(2)))
        self.num_bits = num_bits
        self.num_hashes = num_hashes

    def _bit_positions(self, h: np.ndarray) -> np.ndarray:
        """(k, n) bit indices via double hashing."""
        x = np.asarray(h).astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            h1 = x * np.uint64(0x9E3779B97F4A7C15)
            h2 = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD) | np.uint64(1)
            i = np.arange(self.num_hashes, dtype=np.uint64)[:, None]
            pos = (h1[None, :] + i * h2[None, :]) % np.uint64(self.num_bits)
        return pos.astype(np.int64)

    def zero(self) -> np.ndarray:
        return np.zeros(self.num_bits // 64, dtype=np.uint64)

    def update(
        self, state: np.ndarray, values: np.ndarray, weights: np.ndarray | None = None
    ) -> np.ndarray:
        pos = self._bit_positions(values).ravel()
        words = pos >> 6
        bits = np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63))
        np.bitwise_or.at(state, words, bits)
        return state

    def merge(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        np.bitwise_or(a, b, out=a)
        return a

    def contains(self, state: np.ndarray, hashed_items: Iterable[int]) -> np.ndarray:
        h = np.asarray(list(hashed_items), dtype=np.int64)
        pos = self._bit_positions(h)
        words = pos >> 6
        bits = np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63))
        return ((state[words] & bits) != 0).all(axis=0)

    def state_fields(self) -> list[T.StructField]:
        return [T.StructField("bits", T.BinaryType())]

    def state_to_row(self, state: np.ndarray) -> dict[str, Any]:
        return {"bits": state.tobytes()}

    def row_to_state(self, row: dict[str, Any]) -> np.ndarray:
        return np.frombuffer(bytes(row["bits"]), dtype=np.uint64).copy()

    def result_fields(self) -> list[T.StructField]:
        return [
            T.StructField("bits_set", T.LongType()),
            T.StructField("bits", T.BinaryType()),
        ]

    def result(self, state: np.ndarray) -> dict[str, Any]:
        bits_set = int(np.bitwise_count(state).sum()) if hasattr(
            np, "bitwise_count"
        ) else int(bin(int.from_bytes(state.tobytes(), "little")).count("1"))
        return {"bits_set": bits_set, "bits": state.tobytes()}
