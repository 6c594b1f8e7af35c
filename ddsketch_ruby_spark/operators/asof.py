"""Distributed as-of join (backward, inclusive): for every left row, the
most recent right row of the same key with ``right.ts <= left.ts``.

Spark has no native as-of join; the naive formulations both fail at
scale — a range join explodes into O(n·m) per key, and a per-row probe
is driver-side. The scale-correct plan is the UNION-CARRY pipeline:

1. tag both sides and union them on aligned schemas (right payload
   columns are NULL on left rows and vice versa);
2. one window over (key) ordered by (ts, side, tiebreak) — right rows
   sort BEFORE left rows at equal ts, which is exactly the inclusive
   boundary — carrying each right payload forward with
   ``last(col, ignorenulls=True)``;
3. keep the left rows: the carried values ARE the as-of match.

Cost: ONE shuffle of both inputs on the join key plus an in-partition
sort — the same shape any engine needs (matching rows must co-locate),
no quadratic stage, no driver involvement. Skew is bounded by the
hottest single key. At 100 TB this is a standard sort-merge-sized job;
pre-bucketing both tables by the key removes even that shuffle.

Works identically on static frames; the DuckDB ``ASOF LEFT JOIN`` is an
independent implementation used as the oracle in the driver gate.

Determinism contract: right-side (key, ts) pairs should be unique (true
for event streams with microsecond timestamps); with duplicates the
winner is decided by ``right_order`` — pass it to pin a total order.

Reference scope (DataDog/ddsketch-ruby) has no joins at all; this is
part of the §2.5 join surface a web-events analytics engine needs.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Iterable[str],
    left_ts: str,
    right_ts: str,
    right_cols: Iterable[str],
    tolerance_seconds: int | None = None,
    right_order: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward inclusive as-of join.

    Returns every ``left`` row with ``<c>{suffix}`` columns for each of
    ``right_cols`` plus ``<right_ts>{suffix}`` (microsecond long) and
    ``age_us`` (left ts − matched right ts); all NULL when no right row
    precedes. ``tolerance_seconds`` nullifies matches older than the
    bound (the nearest match is unique, so filtering after the carry is
    equivalent to bounding the search).
    """
    on = list(on)
    right_cols = list(right_cols)
    # carried right columns live under <c><suffix>; a collision with a
    # left column would silently feed left values into the carry
    bad = [c for c in right_cols if f"{c}{suffix}" in left.columns]
    if bad or any(c in on for c in right_cols):
        raise ValueError(
            f"right_cols {bad or right_cols} collide with left/on columns "
            f"under suffix {suffix!r} — pass a different suffix"
        )
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))
    carried = [f"{c}{suffix}" for c in right_cols]
    ts_carried = f"{right_ts}{suffix}"

    lhs = left.select(
        *on,
        l_us.alias("__ts_us"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__r_ord"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(n)
          for c, n in zip(right_cols, carried)],
        F.lit(None).cast("long").alias(ts_carried),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns
          if c not in on],
    )
    r_ord = (
        F.col(right_order).cast("long") if right_order else F.lit(0)
    )
    rhs = right.select(
        *on,
        r_us.alias("__ts_us"),
        F.lit(0).alias("__side"),
        r_ord.alias("__r_ord"),
        *[F.col(c).alias(n) for c, n in zip(right_cols, carried)],
        r_us.alias(ts_carried),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left.columns if c not in on],
    )
    # right before left at equal ts => inclusive boundary
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts_us", "__side", "__r_ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = lhs.unionByName(rhs)
    for n in [*carried, ts_carried]:
        unioned = unioned.withColumn(n, F.last(n, ignorenulls=True).over(w))
    out = unioned.where(F.col("__side") == 1)
    age = F.col("__ts_us") - F.col(ts_carried)
    if tolerance_seconds is not None:
        keep = age <= F.lit(int(tolerance_seconds) * 1_000_000)
        for n in [*carried, ts_carried]:
            out = out.withColumn(
                n, F.when(keep, F.col(n))
            )
        age = F.col("__ts_us") - F.col(ts_carried)
    return out.select(
        *on,
        F.col("__ts_us").alias(f"{left_ts}_us"),
        *[F.col(f"__l_{c}").alias(c) for c in left.columns if c not in on],
        *carried,
        ts_carried,
        age.alias("age_us"),
    )
