"""Range (interval-containment) join: boundary inclusivity, intervals
longer than the bin width, inverted-interval filtering, the column
collision guard, and the no-nested-loop plan shape."""

import pytest
from pyspark.sql import functions as F

from ddsketch_ruby_spark.operators.ranges import range_join

US = 1_000_000
BASE = 1_700_000_000 * US


def _pts(spark, offsets):
    return spark.createDataFrame(
        [(i, BASE + o * US) for i, o in enumerate(offsets)],
        "pid long, us long",
    ).select("pid", F.timestamp_micros("us").alias("pts"))


def _ivs(spark, spans):
    return spark.createDataFrame(
        [(i, BASE + s * US, BASE + e * US) for i, (s, e) in enumerate(spans)],
        "iid long, sus long, eus long",
    ).select(
        "iid",
        F.timestamp_micros("sus").alias("ivs"),
        F.timestamp_micros("eus").alias("ive"),
    )


def _pairs(out):
    return sorted((r["iid"], r["pid"]) for r in out.collect())


def test_inclusive_boundaries(spark):
    pts = _pts(spark, [0, 10, 20, 21])
    ivs = _ivs(spark, [(10, 20)])
    out = range_join(pts, ivs, "pts", "ivs", "ive", bin_seconds=30)
    # both endpoints inclusive; 0 and 21 outside
    assert _pairs(out) == [(0, 1), (0, 2)]


def test_interval_longer_than_bin(spark):
    # interval spans many bins; every covered point matches exactly once
    pts = _pts(spark, list(range(0, 100, 7)))
    ivs = _ivs(spark, [(5, 95)])
    out = range_join(pts, ivs, "pts", "ivs", "ive", bin_seconds=3)
    expect = sorted(
        (0, i) for i, o in enumerate(range(0, 100, 7)) if 5 <= o <= 95
    )
    assert _pairs(out) == expect


def test_inverted_interval_dropped_and_collision_raises(spark):
    pts = _pts(spark, [5])
    ivs = _ivs(spark, [(10, 0)])
    assert range_join(pts, ivs, "pts", "ivs", "ive", 30).count() == 0
    with pytest.raises(ValueError, match="collide"):
        range_join(
            pts, ivs.withColumnRenamed("iid", "pid"), "pts", "ivs", "ive", 30
        )


def test_events_partition_invariant_and_no_nested_loop(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    iv = ev.filter("event_id % 20 = 0").select(
        F.col("event_id").alias("iid"),
        F.col("ts").alias("ivs"),
        F.timestamp_micros(
            F.unix_micros(F.col("ts").cast("timestamp")) + 7200 * US
        ).alias("ive"),
    )
    pts = ev.select(F.col("event_id").alias("pid"), F.col("ts").alias("pts"))

    out = range_join(pts, iv, "pts", "ivs", "ive", bin_seconds=7200)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    a = _pairs(out)
    b = _pairs(
        range_join(
            pts.repartition(11), iv.repartition(3), "pts", "ivs", "ive", 7200
        )
    )
    assert a == b and len(a) > 0
    # exhaustive reference on the small frame
    ref = sorted(
        (r["iid"], r["pid"])
        for r in iv.crossJoin(pts.withColumnRenamed("pts", "p2"))
        .where(
            (F.unix_micros(F.col("p2").cast("timestamp"))
             >= F.unix_micros(F.col("ivs").cast("timestamp")))
            & (F.unix_micros(F.col("p2").cast("timestamp"))
               <= F.unix_micros(F.col("ive").cast("timestamp")))
        )
        .collect()
    )
    assert a == ref
