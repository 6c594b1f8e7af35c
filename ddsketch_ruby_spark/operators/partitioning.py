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

__all__ = [
    "salted_repartition",
    "with_salt",
    "partition_histogram",
    "sketch_boundaries",
    "range_bucket",
    "sketch_range_partition",
]


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


def sketch_boundaries(
    df: DataFrame,
    value_col: str,
    n_buckets: int,
    relative_accuracy: float = 0.01,
    round_to: int = 6,
    **sketch_kwargs,
) -> list[float]:
    """Equi-depth range boundaries from a distributed DDSketch build:
    the (i/n)-quantiles for i in 1..n-1, rounded to ``round_to`` decimals
    (the same rounding the SQL quantile oracles use, so boundary values
    are bit-reproducible by any engine). One scan + the tiny two-phase
    sketch shuffle; the collect is n-1 doubles — bounded by construction.

    Accuracy contract: each boundary is within the sketch's alpha
    relative-error bound of the true quantile, so bucket populations are
    N/n up to O(alpha * N) — good enough to bound any post-repartition
    task at ~1/n of the data regardless of value skew."""
    from .quantiles import ddsketch_quantiles_long

    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    if n_buckets == 1:
        return []
    qs = {f"b{i:04d}": i / n_buckets for i in range(1, n_buckets)}
    rows = ddsketch_quantiles_long(
        df,
        value_col,
        quantiles=qs,
        relative_accuracy=relative_accuracy,
        round_to=round_to,
        **sketch_kwargs,
    ).collect()
    by_name = {r["qname"]: r["qvalue"] for r in rows}
    return [by_name[n] for n in sorted(by_name)]


def range_bucket(value_col: str, boundaries: list[float]):
    """Bucket id = number of boundaries <= value, as a pure JVM array
    expression (ties go right: a row equal to boundary i lands in bucket
    i+1 — mirrored by the SQL oracle's COUNT(qvalue <= value))."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    v = F.col(value_col).cast("double")
    return F.size(F.filter(arr, lambda b: b <= v))


def sketch_range_partition(
    df: DataFrame,
    value_col: str,
    n_buckets: int,
    boundaries: list[float] | None = None,
    bucket_col_name: str = "__bucket",
    repartition: bool = True,
    **boundary_kwargs,
) -> DataFrame:
    """Equi-depth range repartitioning driven by the sketch: balanced
    output partitions for ANY value distribution, at the cost of one
    extra scan (the sketch build) instead of the sort-based sampling
    ``repartitionByRange`` does.

    Compared to ``repartitionByRange``: boundaries are deterministic
    (no sampling RNG), reusable across jobs (pass ``boundaries=`` from a
    previous/persisted build), and carry the sketch's alpha guarantee.
    Pathological single-VALUE skew (one value holding >> 1/n of rows)
    cannot be split by any range scheme — compose with ``with_salt``.

    Returns ``df`` with ``bucket_col_name`` added and (by default) hash-
    repartitioned into ``n_buckets`` partitions on it."""
    if boundaries is None:
        boundaries = sketch_boundaries(
            df, value_col, n_buckets, **boundary_kwargs
        )
    out = df.withColumn(bucket_col_name, range_bucket(value_col, boundaries))
    if repartition:
        # range- (not hash-) partition the bucket ids: with n distinct
        # ids into n partitions each bucket keeps its own partition —
        # pmod(hash(id), n) would birthday-collide buckets together
        out = out.repartitionByRange(n_buckets, F.col(bucket_col_name))
    return out
