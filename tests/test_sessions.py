"""Sessionization: gaps-and-islands batch operator (operators/sessions.py)
and the session_window streaming twin (stream_session_stats).

The boundary contracts differ deliberately and are pinned here:
- batch sessionize: NEW session when gap STRICTLY exceeds gap_seconds
  (an exactly-gap tie stays in the same session);
- Spark session_window: merged [t, t+gap) ranges, so an exactly-gap tie
  STARTS a new session (>=).
"""

import pytest
from pyspark.sql import functions as F

from ddsketch_ruby_spark.operators.sessions import session_stats, sessionize

GAP = 3600  # 1 h
US = 1_000_000


def _frame(spark, rows):
    """rows: (user, us_offset, value) -> DataFrame with ts/ord columns."""
    base = 1_700_000_000 * US
    return spark.createDataFrame(
        [(u, base + off * US, float(v)) for u, off, v in rows],
        "user_id long, us long, value double",
    ).select(
        "user_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "value",
        F.col("us").alias("ord"),
    )


def test_sessionize_strict_gt_boundary(spark):
    # gaps: 3599 s (in), exactly 3600 s (STAYS — strict >), 3601 s (new)
    df = _frame(
        spark,
        [(1, 0, 1), (1, 3599, 1), (1, 3599 + GAP, 1), (1, 3599 + GAP + GAP + 1, 1)],
    )
    out = sessionize(df, "ts", GAP, by=["user_id"], order_col="ord")
    got = sorted(
        (r["ord"], r["session_id"]) for r in out.collect()
    )
    assert [sid for _, sid in got] == [1, 1, 1, 2]


def test_sessionize_per_user_and_partition_invariant(spark):
    rows = []
    for u in range(5):
        # per-user staggered bursts: 3 events tight, long gap, 2 events
        for j in range(3):
            rows.append((u, u * 7 + j * 10, j))
        for j in range(2):
            rows.append((u, u * 7 + 2 * GAP + j * 10, j))
    df = _frame(spark, rows)
    a = sessionize(df.repartition(1), "ts", GAP, ["user_id"], "ord")
    b = sessionize(df.repartition(7), "ts", GAP, ["user_id"], "ord")
    ga = sorted((r["user_id"], r["ord"], r["session_id"]) for r in a.collect())
    gb = sorted((r["user_id"], r["ord"], r["session_id"]) for r in b.collect())
    assert ga == gb
    # every user: first 3 rows session 1, last 2 rows session 2
    for u in range(5):
        sids = [sid for uu, _, sid in ga if uu == u]
        assert sids == [1, 1, 1, 2, 2]


def test_session_stats_values(spark):
    df = _frame(spark, [(9, 0, 1.5), (9, 100, 2.25), (9, 3 * GAP, 4.0)])
    out = session_stats(
        df, "ts", GAP, by=["user_id"], value_col="value", order_col="ord"
    ).orderBy("session_id")
    r1, r2 = out.collect()
    assert (r1["n_events"], r2["n_events"]) == (2, 1)
    assert r1["duration_us"] == 100 * US
    assert r1["end_us"] - r1["start_us"] == 100 * US
    assert r1["sum_value"] == pytest.approx(3.75)
    assert r2["duration_us"] == 0
    assert r2["sum_value"] == pytest.approx(4.0)


def test_stream_sessions_match_batch_session_window(spark, tmp_path):
    """The streamed session stats must equal the batch session_window
    aggregation over the same events — across genuinely multiple
    micro-batches, with zero watermark-dropped rows (the two-data-files +
    sentinel-last staging keeps every out-of-order row inside the
    one-batch lag of Spark's late-event watermark)."""
    import __spark_entry__ as e
    from ddsketch_ruby_spark.streaming.sketch_stream import (
        stream_session_stats,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "sess_src")
    for i in range(2):
        events.filter(F.col("event_id") % 2 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        e._stamp_new_parquet_mtimes(src, batch_index=i)
    events.agg(F.max("ts").alias("__mx")).select(
        F.lit(10**9).cast("long").alias("event_id"),
        (F.col("__mx") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("sentinel").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    ).coalesce(1).write.mode("append").parquet(src)
    e._stamp_new_parquet_mtimes(src, batch_index=2)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_session_stats(
        stream, "ts", gap="1 day", by=["user_id"], value_col="value"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    assert q.awaitTermination(180)
    progress = q.recentProgress
    assert len(progress) >= 3  # genuinely multi-batch
    for p in progress:
        for op in p["stateOperators"]:
            assert op["numRowsDroppedByWatermark"] == 0

    got = {
        (r["user_id"], r["start_us"]): (
            r["n_events"], r["end_us"], r["duration_us"],
        )
        for r in spark.table("sess_stream")
        .where(F.col("user_id") >= 0)
        .collect()
    }
    ref = {
        (r["user_id"], r["start_us"]): (
            r["n_events"], r["end_us"], r["duration_us"],
        )
        for r in (
            events.withColumn("ts", F.col("ts").cast("timestamp"))
            .groupBy(
                F.session_window("ts", "1 day").alias("sw"), "user_id"
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.min(F.unix_micros("ts")).alias("start_us"),
                F.max(F.unix_micros("ts")).alias("end_us"),
                (
                    F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))
                ).alias("duration_us"),
            )
            .collect()
        )
    }
    assert got == ref
