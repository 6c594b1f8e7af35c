"""The one-call web-corpus pipeline on a LIVE stream: prepare_web_corpus
is a stateless projection, so it composes unchanged with the streaming
sketch operators — a crawl monitor (per-host length sketches over
event-time windows) whose multi-micro-batch result must equal the batch
build bucket-for-bucket."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from ddsketch_ruby_spark.operators.ddsketch_jvm import histogram_rows
from ddsketch_ruby_spark.operators.webcorpus import prepare_web_corpus
from ddsketch_ruby_spark.sketches.ddsketch_spec import DDSketchSpec
from ddsketch_ruby_spark.sources.webpages import web_pages
from ddsketch_ruby_spark.streaming.sketch_stream import sketch_stream_hist

KEYS = ["window_start", "host", "__zone", "__key"]


@pytest.fixture()
def pages_stream_dir(spark, tmp_path):
    """web_pages split into 3 parquet files -> file stream."""
    src = web_pages(spark, 900, partitions=3).cache()
    src.count()
    d = str(tmp_path / "pages_in")
    for i in range(3):
        # pmod, NOT %: xxhash64 is signed and Spark's % keeps the sign,
        # so `% 3 == i` over i in 0..2 would silently drop ~third of rows
        src.filter(F.pmod(F.xxhash64("url"), F.lit(3)) == i).coalesce(
            1
        ).write.mode("append").parquet(d)
    yield d, src
    src.unpersist()


def test_stream_pipeline_converges_to_batch(spark, pages_stream_dir):
    d, src = pages_stream_dir
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    spec = DDSketchSpec(0.01)
    # the SAME one-call enrichment, applied to the unbounded frame
    # (update mode + watermark=None: state keyed by the bounded
    # (window, host, bucket) set; last emission per key = final count)
    enriched = prepare_web_corpus(stream)
    hist = sketch_stream_hist(
        enriched,
        spec,
        "n_chars",
        "warc_ts",
        window="5 minutes",
        watermark=None,
        group_by=["host"],
    )
    q = (
        hist.writeStream.format("memory")
        .queryName("crawl_monitor")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from crawl_monitor").toPandas()
    assert len(got) > 0
    final = (
        got.groupby(KEYS, sort=False).tail(1).set_index(KEYS).sort_index()
    )

    # batch twin: same pipeline, same windowing, batch histogram path
    batch = prepare_web_corpus(src).select(
        F.window("warc_ts", "5 minutes").alias("__win"), "host", "n_chars"
    )
    ref = (
        histogram_rows(batch, spec, "n_chars", ["__win", "host"])
        .select(
            F.col("__win.start").alias("window_start"),
            "host",
            "__zone",
            "__key",
            "__cnt",
            "__minv",
            "__maxv",
        )
        .toPandas()
        .set_index(KEYS)
        .sort_index()
    )
    assert len(ref) > 0
    # several event-time windows and hosts actually exercised
    assert ref.index.get_level_values("window_start").nunique() >= 2
    assert ref.index.get_level_values("host").nunique() > 50
    pd.testing.assert_frame_equal(
        final[["__cnt", "__minv", "__maxv"]],
        ref[["__cnt", "__minv", "__maxv"]],
        check_exact=True,
    )
