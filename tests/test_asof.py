"""As-of join (operators/asof.py): backward inclusive semantics, the
tolerance bound, unmatched-row NULLs, partition invariance, and the
carried-column collision guard."""

import pytest
from pyspark.sql import functions as F

from ddsketch_ruby_spark.operators.asof import asof_join

US = 1_000_000
BASE = 1_700_000_000 * US


def _ts(col):
    return F.timestamp_micros(F.col(col)).alias("ts")


def _left(spark, rows):
    return spark.createDataFrame(
        [(k, BASE + off * US, i) for i, (k, off) in enumerate(rows)],
        "k long, us long, lid long",
    ).select("k", _ts("us"), "lid")


def _right(spark, rows):
    return spark.createDataFrame(
        [(k, BASE + off * US, float(v)) for k, off, v in rows],
        "k long, us long, v double",
    ).select("k", _ts("us"), "v")


def _collect(out):
    return {
        r["lid"]: (r["v_asof"], r["age_us"]) for r in out.collect()
    }


def test_backward_inclusive_and_nulls(spark):
    left = _left(spark, [(1, 10), (1, 20), (1, 5)])
    right = _right(spark, [(1, 10, 1.0), (1, 18, 2.0), (2, 0, 9.0)])
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["v"],
    )
    got = _collect(out)
    # lid 0 at t=10: right at EXACTLY 10 matches (inclusive)
    assert got[0] == (1.0, 0)
    # lid 1 at t=20: latest right <= 20 is t=18
    assert got[1] == (2.0, 2 * US)
    # lid 2 at t=5: nothing precedes -> NULLs
    assert got[2] == (None, None)


def test_tolerance_nullifies_stale_matches(spark):
    left = _left(spark, [(1, 100), (1, 103)])
    right = _right(spark, [(1, 99, 5.0)])
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["v"], tolerance_seconds=2,
    )
    got = _collect(out)
    assert got[0] == (5.0, 1 * US)  # 1 s old: inside tolerance
    assert got[1] == (None, None)  # 4 s old: nullified


def test_partition_invariance_on_events(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    req = ev.filter("event_id % 2 = 0").select(
        "user_id", "ts", F.col("event_id").alias("lid")
    )
    met = ev.filter("event_id % 2 = 1").select("user_id", "ts", "value")

    def run(r, m):
        return {
            row["lid"]: (row["value_asof"], row["age_us"])
            for row in asof_join(
                r, m, on=["user_id"], left_ts="ts", right_ts="ts",
                right_cols=["value"],
            ).collect()
        }

    a = run(req.repartition(1), met.repartition(1))
    b = run(req.repartition(13), met.repartition(7))
    assert a == b
    assert len(a) == req.count()


def test_right_col_collision_raises(spark):
    left = _left(spark, [(1, 10)]).withColumn("v_asof", F.lit(0.0))
    right = _right(spark, [(1, 5, 1.0)])
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            right_cols=["v"],
        )
