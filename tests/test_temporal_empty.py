"""Empty-input behavior of the temporal operators (sessions / as-of /
range join): empty frames must flow through every plan without error and
with the semantically-right output — not crash on an empty window or an
empty explode."""

from pyspark.sql import functions as F

from ddsketch_ruby_spark.operators.asof import asof_join
from ddsketch_ruby_spark.operators.ranges import range_join
from ddsketch_ruby_spark.operators.sessions import session_stats, sessionize


def _empty(spark, ddl):
    return spark.createDataFrame([], ddl)


def test_sessionize_empty(spark):
    df = _empty(spark, "user_id long, ts timestamp, value double, ord long")
    assert sessionize(df, "ts", 60, ["user_id"], "ord").count() == 0
    assert (
        session_stats(df, "ts", 60, ["user_id"], "value", "ord").count() == 0
    )


def test_asof_empty_sides(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(5)
    left = ev.select("event_id", "user_id", "ts")
    # empty right: every left row survives with NULL match columns
    out = asof_join(
        left,
        _empty(spark, "user_id long, ts timestamp, value double"),
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["value"],
    ).collect()
    assert len(out) == 5
    assert all(
        r["value_asof"] is None and r["age_us"] is None for r in out
    )
    # empty left: empty output
    assert (
        asof_join(
            _empty(spark, "event_id long, user_id long, ts timestamp"),
            ev.select("user_id", "ts", "value"),
            on=["user_id"],
            left_ts="ts",
            right_ts="ts",
            right_cols=["value"],
        ).count()
        == 0
    )


def test_range_join_empty_sides(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(5)
    pts = ev.select(F.col("event_id").alias("pid"), F.col("ts").alias("pts"))
    ivs = ev.select(
        F.col("event_id").alias("iid"),
        F.col("ts").alias("ivs"),
        F.col("ts").alias("ive"),
    )
    assert (
        range_join(
            pts, _empty(spark, "iid long, ivs timestamp, ive timestamp"),
            "pts", "ivs", "ive", 60,
        ).count()
        == 0
    )
    assert (
        range_join(
            _empty(spark, "pid long, pts timestamp"), ivs,
            "pts", "ivs", "ive", 60,
        ).count()
        == 0
    )
