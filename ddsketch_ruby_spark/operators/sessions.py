"""Event sessionization — gaps-and-islands, fully relational.

A session is a maximal run of a user's events where consecutive gaps stay
within ``gap_seconds``. Two equivalent formulations, both provided:

- ``sessionize``/``session_stats``: the classic lag + cumulative-sum
  window pipeline (this module). Everything stays JVM-side — two window
  functions over (keys, ts) partitions, then an ordinary groupBy — so the
  plan is one shuffle on the session keys followed by in-partition sorts.
  At 100 TB the per-key partitions are bounded by per-user activity, not
  corpus size: the sort is local, the shuffle moves each event once, and
  skew is capped by the hottest single user (salting is unnecessary
  because a user's events must be co-located to be sessionized at all —
  any engine pays this shuffle).
- Streaming: ``streaming.sketch_stream.sketch_stream_sessions`` uses
  Spark's native ``session_window`` state merging; the batch twin here is
  the oracle for it in tests.

Boundary arithmetic is exact integer microseconds (``unix_micros`` /
DuckDB ``epoch_us``), so a SQL oracle can replay it bit-for-bit: a new
session starts when ``ts_us - lag(ts_us) > gap_seconds * 1_000_000``.
Ties on ``ts`` are broken by ``order_col`` to keep the lag deterministic
under any partitioning.

The reference scope (DataDog/ddsketch-ruby) has no sessionization; this
is part of the §2.5 window-function surface (SURVEY.md) that a
web-events analytics engine needs alongside the sketch aggregations.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "session_stats"]


def sessionize(
    df: DataFrame,
    ts_col: str,
    gap_seconds: int,
    by: Iterable[str] = ("user_id",),
    order_col: str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a per-key ordinal ``session_col`` (1-based) to every row.

    New session when the microsecond gap to the previous event of the
    same key STRICTLY exceeds ``gap_seconds`` (first event of a key is
    always a boundary). Exact integer arithmetic end to end.
    """
    by = list(by)
    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(*by).orderBy(*order)
    gap_us = int(gap_seconds) * 1_000_000
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    boundary = F.when(
        prev.isNull() | ((us - prev) > F.lit(gap_us)), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(session_col, F.sum(boundary).over(run))


def session_stats(
    df: DataFrame,
    ts_col: str,
    gap_seconds: int,
    by: Iterable[str] = ("user_id",),
    value_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Per-session summary: event count, exact start/end (microsecond
    longs, so the output is timezone- and codec-unambiguous), duration,
    and optionally the session's value sum (rounded to 6 decimals — the
    repo-wide float comparison contract)."""
    by = list(by)
    s = sessionize(df, ts_col, gap_seconds, by, order_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(us).alias("start_us"),
        F.max(us).alias("end_us"),
        (F.max(us) - F.min(us)).alias("duration_us"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 6).alias("sum_value"))
    return s.groupBy(*by, "session_id").agg(*aggs)
