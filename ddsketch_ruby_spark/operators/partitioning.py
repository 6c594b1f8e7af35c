"""Partitioning / skew helpers (north rule: salted repartitioning for
host-skewed URL distributions).

Skew story for sketch builds, by stage:

- Phase 1 (partial build) is partition-local and shuffle-free: a hot key
  (one host owning half the corpus) cannot skew it — rows are folded where
  they sit. Input-split imbalance is the only phase-1 skew, handled by
  ``salted_repartition`` (spread rows by a uniform hash) or upstream split
  sizing.
- Phase 2 (merge) receives at most ``n_partitions`` partial rows per
  group regardless of raw-row skew, so hot GROUPS are bounded too; extreme
  fan-in uses ``tree_fanin`` (operators/agg.py) salted merge rounds.
- The JVM fast path inherits Tungsten partial aggregation + AQE skew
  handling natively.

These helpers cover the remaining case: OTHER per-group operations
(applyInPandas pipelines) on hot keys, and deliberately rebalancing a
skewed scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_repartition", "with_salt", "partition_histogram"]


def salted_repartition(
    df: DataFrame, cols: list[str] | None = None, buckets: int | None = None
) -> DataFrame:
    """Deterministically rebalance rows: repartition by xxhash64 of the
    given columns (default: a uniform per-row spread that still keeps same
    keys co-located within hash space). Unlike ``repartition()`` alone this
    is stable across runs (no round-robin nondeterminism)."""
    buckets = buckets or df.sparkSession.sparkContext.defaultParallelism
    if cols:
        return df.repartition(buckets, F.xxhash64(*[F.col(c) for c in cols]))
    return df.repartition(buckets, F.xxhash64(*[F.col(c) for c in df.columns]))


def with_salt(df: DataFrame, key_col: str, salt_buckets: int) -> DataFrame:
    """Adds a deterministic ``__salt`` in [0, salt_buckets) derived from the
    full row spread of a hot key: groupBy(key, __salt) bounds any single
    task to ~1/salt_buckets of the hot key's rows; re-aggregate by key
    afterwards (legal for any commutative-monoid aggregate)."""
    return df.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)),
    )


def partition_histogram(df: DataFrame) -> list[int]:
    """Rows per partition — the skew diagnostic used in tests/benchmarks."""
    return [
        int(r["count"])
        for r in df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .orderBy("pid")
        .collect()
    ]
