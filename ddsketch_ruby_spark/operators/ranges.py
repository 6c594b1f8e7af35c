"""Distributed range (interval-containment) join.

``point BETWEEN interval.start AND interval.end`` expressed naively is an
inequality join, which Spark plans as BroadcastNestedLoopJoin — O(n·m)
and forbidden in this repo's plan lint. The scale-correct plan is the
BIN-BUCKETED EQUI-JOIN:

1. choose a bin width (>= the longest interval, or any cap you enforce);
2. points land in exactly one bin: ``floor(ts_us / bin_us)``;
3. intervals explode into every bin they overlap (``sequence`` of bin
   ordinals — at most ``len/bin + 1`` rows, i.e. <= 2 under the default
   width);
4. ordinary equi-join on the bin ordinal, then the exact containment
   filter.

Each qualifying (interval, point) pair is produced exactly once — the
point has ONE bin — so no dedup stage is needed. The join is a plain
shuffled equi-join: Catalyst picks sort-merge or broadcast-hash by
side size, partial pruning and AQE skew handling apply, and the shuffle
key (time bin) spreads uniformly for event-time data. At 100 TB the
only tunable is the bin width: wider bins mean fewer exploded interval
rows but more non-matching pairs to filter; the default (the smallest
power-of-two seconds covering the longest interval) keeps the explosion
factor <= 2 while bounding filter waste by ~2x the true match volume.

All boundary arithmetic is exact integer microseconds, so DuckDB can
oracle the result with a plain BETWEEN join.

Reference scope (DataDog/ddsketch-ruby) has no joins; this is §2.5 join
surface alongside asof_join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join"]


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join every ``points`` row to every ``intervals`` row whose
    ``[start_col, end_col]`` (inclusive both ends, microsecond
    resolution) contains ``point_ts``.

    ``bin_seconds`` is the bucket width; intervals longer than the
    width still work (they explode into more bins) but the width should
    normally be >= the longest interval. Output: all interval columns +
    all point columns (names must not collide — select/alias first).
    """
    if how != "inner":
        raise ValueError("only inner range joins are supported")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"point/interval column names collide: {sorted(overlap)} — "
            "alias them apart before joining"
        )
    bin_us = int(bin_seconds) * 1_000_000
    p_us = F.unix_micros(F.col(point_ts).cast("timestamp"))
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))

    # any MONOTONE binning is correct (s<=p<=e implies bin(s)<=bin(p)<=
    # bin(e), and the sequence covers that whole bin range); floor over
    # IEEE division by a positive constant is monotone
    def _bin(col):
        return F.floor(col / F.lit(bin_us)).cast("long")

    p = points.withColumn("__p_us", p_us).withColumn("__bin", _bin(F.col("__p_us")))
    iv = (
        intervals.withColumn("__s_us", s_us)
        .withColumn("__e_us", e_us)
        .where(F.col("__s_us") <= F.col("__e_us"))
        .withColumn(
            "__bin",
            F.explode(
                F.sequence(_bin(F.col("__s_us")), _bin(F.col("__e_us")))
            ),
        )
    )
    joined = iv.join(p, on="__bin", how="inner").where(
        (F.col("__p_us") >= F.col("__s_us"))
        & (F.col("__p_us") <= F.col("__e_us"))
    )
    return joined.drop("__bin", "__p_us", "__s_us", "__e_us")
