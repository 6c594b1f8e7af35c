"""SQL-text access to persisted sketch states via registered pandas UDFs."""

import numpy as np
from pyspark.sql import functions as F

from ddsketch_ruby_spark.functions.sql_udfs import register_sketch_sql
from ddsketch_ruby_spark.operators.agg import sketch_agg
from ddsketch_ruby_spark.operators.quantiles import ddsketch_quantiles, ddsketch_state
from ddsketch_ruby_spark.sketches.hll import HLLSpec


def test_sql_quantile_on_persisted_states(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "sketches")
    ddsketch_state(docs, "n_chars", ["lang"]).write.mode("overwrite").parquet(out)

    register_sketch_sql(spark)
    spark.read.parquet(out).createOrReplaceTempView("doc_sketches")
    rows = spark.sql(
        """
        SELECT lang,
               ddsketch_q(0.5, gamma, pos_bins, pos_offset, neg_bins,
                          neg_offset, zero_count, count) AS p50
        FROM doc_sketches
        """
    ).collect()
    sql_p50 = {r["lang"]: r["p50"] for r in rows}
    direct = {
        r["lang"]: r["q50"]
        for r in ddsketch_quantiles(
            docs, "n_chars", ["lang"], quantiles=(0.5,), engine="python"
        ).collect()
    }
    assert sql_p50 == direct


def test_sql_hll_cardinality(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    hashed = events.select("event_type", F.xxhash64("user_id").alias("h"))
    states = sketch_agg(hashed, HLLSpec(p=12), "h", ["event_type"], output="state")
    register_sketch_sql(spark)
    states.createOrReplaceTempView("hll_states")
    rows = spark.sql(
        "SELECT event_type, hll_card(registers) AS card FROM hll_states"
    ).collect()
    exact = {
        r["event_type"]: r["d"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    for r in rows:
        d = exact[r["event_type"]]
        assert abs(r["card"] - d) / d < 0.1
