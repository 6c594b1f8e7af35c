"""Dense bucket stores as NumPy float64 counter arrays.

Semantics-parity with DataDog/ddsketch-ruby stores, re-derived for batch
execution:

- DenseStore add/merge/key_at_rank: reference lib/ddsketch/store/
  dense_store.rb:71-135
- CollapsingLowestDenseStore: collapsing_lowest_dense_store.rb:46-142
- CollapsingHighestDenseStore: collapsing_highest_dense_store.rb:46-140

Design note (why this is not a port): the reference grows a chunked array
incrementally and collapses lazily when the key span outgrows
``min(chunked_length, bin_limit)``. Because ``chunked_length >= span``
always, a collapse happens iff the running key span exceeds ``bin_limit``,
and the reference's own specs pin the *net* semantics as order-insensitive
key clamping — every inserted key behaves as if clamped to
``max_key_seen - bin_limit + 1`` (lowest-collapsing,
spec/ddsketch/store/collapsing_lowest_dense_store_spec.rb:35-38,82-85) or
``min_key_seen + bin_limit - 1`` (highest-collapsing,
collapsing_highest_dense_store_spec.rb:35-38,81-84). That order-insensitive
contract is what makes a vectorized, exact-span implementation legal: we
allocate the exact clamped span per batch and use ``np.bincount`` /
``np.add.at`` instead of per-key loops. Chunked growth and bin recentering
(dense_store.rb:150-207) are amortization tricks for one-at-a-time inserts
and are unnecessary when batch min/max keys are known up front.
"""

from __future__ import annotations

import numpy as np

__all__ = ["Store", "DENSE", "COLLAPSE_LOWEST", "COLLAPSE_HIGHEST"]

DENSE = "dense"
COLLAPSE_LOWEST = "collapsing_lowest"
COLLAPSE_HIGHEST = "collapsing_highest"

# Safety valve for the non-collapsing store: refuse absurd spans instead of
# attempting a multi-GiB allocation (the reference would die the same way,
# just slower). 1<<26 bins = 512 MiB of f64 counters.
_MAX_DENSE_SPAN = 1 << 26


class Store:
    """One store covering all three reference variants.

    State is ``(bins, offset, count)`` where ``bins[i]`` is the counter for
    key ``offset + i``; the array spans exactly the (clamped) key range seen
    so far. ``collapse`` selects the variant: None (dense, unbounded),
    "collapsing_lowest" or "collapsing_highest" with ``bin_limit``.
    """

    __slots__ = ("bins", "offset", "count", "collapse", "bin_limit")

    def __init__(self, collapse: str | None = None, bin_limit: int | None = None):
        if collapse in (None, DENSE):
            collapse = None
        elif collapse not in (COLLAPSE_LOWEST, COLLAPSE_HIGHEST):
            raise ValueError(f"unknown collapse mode {collapse!r}")
        if collapse is not None:
            if bin_limit is None or bin_limit <= 0:
                raise ValueError("bin_limit must be a positive integer")
        self.bins = np.zeros(0, dtype=np.float64)
        self.offset = 0  # key of bins[0] (python int: immune to int64 overflow)
        self.count = 0.0
        self.collapse = collapse
        self.bin_limit = int(bin_limit) if bin_limit is not None else None

    # -- inspection -------------------------------------------------------
    @property
    def min_key(self) -> int:
        return self.offset

    @property
    def max_key(self) -> int:
        return self.offset + len(self.bins) - 1

    def __len__(self) -> int:
        return len(self.bins)

    def key_counts(self) -> dict[int, float]:
        """{key: count} for nonzero bins — the test-oracle view."""
        nz = np.flatnonzero(self.bins)
        return {self.offset + int(i): float(self.bins[i]) for i in nz}

    # -- span management ----------------------------------------------------
    def _clamped_span(self, lo: int, hi: int) -> tuple[int, int]:
        """Clamp a candidate key span to the collapse policy."""
        if self.collapse == COLLAPSE_LOWEST:
            if hi - lo + 1 > self.bin_limit:
                lo = hi - self.bin_limit + 1
        elif self.collapse == COLLAPSE_HIGHEST:
            if hi - lo + 1 > self.bin_limit:
                hi = lo + self.bin_limit - 1
        elif hi - lo + 1 > _MAX_DENSE_SPAN:
            raise MemoryError(
                f"dense store span {hi - lo + 1} exceeds {_MAX_DENSE_SPAN}; "
                "use a collapsing store for unbounded key ranges"
            )
        return lo, hi

    def _respan(self, lo: int, hi: int) -> None:
        """Grow/shift ``bins`` to span exactly [lo, hi], folding any existing
        mass that falls outside into the boundary bin (collapse)."""
        size = hi - lo + 1
        new_bins = np.zeros(size, dtype=np.float64)
        if len(self.bins):
            old_lo = self.offset
            old_hi = self.max_key
            # overlap region copies; out-of-span mass folds into the edge bin
            start = max(old_lo, lo)
            end = min(old_hi, hi)
            if end >= start:
                new_bins[start - lo : end - lo + 1] = self.bins[
                    start - old_lo : end - old_lo + 1
                ]
            if old_lo < lo:  # mass below the new floor (lowest-collapse)
                new_bins[0] += self.bins[: lo - old_lo].sum()
            if old_hi > hi:  # mass above the new ceiling (highest-collapse)
                new_bins[-1] += self.bins[max(0, hi - old_lo + 1) :].sum()
        self.bins = new_bins
        self.offset = lo

    def _fit(self, lo: int, hi: int) -> None:
        """Ensure bins cover [lo, hi] union the current span (with clamping)."""
        if len(self.bins):
            lo = min(lo, self.offset)
            hi = max(hi, self.max_key)
        lo, hi = self._clamped_span(lo, hi)
        if not len(self.bins) or lo != self.offset or hi != self.max_key:
            self._respan(lo, hi)

    # -- updates -------------------------------------------------------------
    def add_batch(self, keys: np.ndarray, weights: np.ndarray | None = None) -> None:
        """Add a batch of integer keys with optional positive weights."""
        keys = np.asarray(keys, dtype=np.int64)
        if keys.size == 0:
            return
        self._fit(int(keys.min()), int(keys.max()))
        # Clip into the (possibly collapsed) span: out-of-range keys land in
        # the boundary bin, matching collapsed get_index
        # (collapsing_lowest_dense_store.rb:91-102).
        idx = np.clip(keys, self.offset, self.max_key) - self.offset
        if weights is None:
            self.bins += np.bincount(idx, minlength=len(self.bins)).astype(np.float64)
            self.count += float(keys.size)
        else:
            weights = np.asarray(weights, dtype=np.float64)
            self.bins += np.bincount(idx, weights=weights, minlength=len(self.bins))
            self.count += float(weights.sum())

    def add(self, key: int, weight: float = 1.0) -> None:
        self.add_batch(
            np.array([key], dtype=np.int64), np.array([weight], dtype=np.float64)
        )

    def merge(self, other: "Store") -> None:
        """Merge ``other`` into self; equivalent to replaying its adds
        (dense_store.rb:71-88 and the collapsing overrides)."""
        if other.count == 0:
            return
        if self.count == 0:
            self.bins = other.bins.copy()
            self.offset = other.offset
            self.count = other.count
            return
        self._fit(other.offset, other.max_key)
        keys = other.offset + np.arange(len(other.bins), dtype=np.int64)
        idx = np.clip(keys, self.offset, self.max_key) - self.offset
        np.add.at(self.bins, idx, other.bins)
        self.count += other.count

    # -- queries ---------------------------------------------------------------
    def key_at_rank(self, rank: float, lower: bool = True) -> int:
        """Key holding the given rank in cumulative-count order.

        lower: first key with running_count >  rank
        upper: first key with running_count >= rank + 1
        Falls back to max_key (dense_store.rb:123-135).
        """
        cum = np.cumsum(self.bins)
        if lower:
            i = int(np.searchsorted(cum, rank, side="right"))
        else:
            i = int(np.searchsorted(cum, rank + 1.0, side="left"))
        if i >= len(self.bins):
            i = len(self.bins) - 1
        return self.offset + i

    def copy(self) -> "Store":
        out = Store(self.collapse, self.bin_limit)
        out.bins = self.bins.copy()
        out.offset = self.offset
        out.count = self.count
        return out
