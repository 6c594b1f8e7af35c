"""Skew handling: salted repartition balances a host-skewed table; salted
group aggregation equals unsalted (monoid legality)."""

import numpy as np
from pyspark.sql import functions as F

from ddsketch_ruby_spark.operators.partitioning import (
    partition_histogram,
    salted_repartition,
    with_salt,
)
from ddsketch_ruby_spark.operators.quantiles import ddsketch_quantiles
from ddsketch_ruby_spark.sources.webpages import web_pages


def test_salted_repartition_balances_host_skew(spark):
    pages = web_pages(spark, 20_000, partitions=8)
    # skew the layout: repartition BY host so hot hosts own whole partitions
    by_host = pages.repartition(16, F.regexp_extract("url", r"host(\d+)", 1))
    skewed = partition_histogram(by_host)
    balanced = partition_histogram(salted_repartition(by_host, ["url"], 16))
    assert max(skewed) > 2 * (20_000 / 16)  # the skew is real
    assert max(balanced) < 1.25 * (20_000 / 16)  # and salting removes it


def test_group_agg_immune_to_hot_key(spark):
    """A hot group (60% of rows on one host) must not change results vs any
    other layout — phase 1 is partition-local, phase 2 sees only partials."""
    pages = web_pages(spark, 10_000, partitions=8).select(
        F.regexp_extract("url", r"host(\d+)", 1).alias("host"),
        F.length("text").cast("double").alias("doc_len"),
    )
    base = {
        r["host"]: r.asDict()
        for r in ddsketch_quantiles(
            pages, "doc_len", ["host"], quantiles=(0.5,), engine="python"
        ).collect()
    }
    hot_layout = pages.repartition(16, "host")  # co-locate the hot key
    salted = {
        r["host"]: r.asDict()
        for r in ddsketch_quantiles(
            salted_repartition(hot_layout, ["host", "doc_len"], 16),
            "doc_len",
            ["host"],
            quantiles=(0.5,),
            engine="python",
            tree_fanin=4,
        ).collect()
    }
    assert set(base) == set(salted)
    for h in base:
        assert base[h]["count"] == salted[h]["count"]
        assert base[h]["q50"] == salted[h]["q50"]


def test_with_salt_bounds_group_size(spark):
    df = spark.range(10_000).select(F.lit("hot").alias("k"), F.col("id"))
    salted = with_salt(df, "k", 8)
    sizes = [
        r["count"] for r in salted.groupBy("k", "__salt").count().collect()
    ]
    assert len(sizes) == 8
    assert max(sizes) < 10_000 / 8 * 1.5
