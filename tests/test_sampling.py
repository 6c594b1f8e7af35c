"""Sequential Poisson weighted sampling (operators/sampling.py).

The selection is a pure function of (id, weight, seed) — no RNG state —
so the tests pin partitioning-invariance, the TakeOrderedAndProject plan
for the global path, pps bias on a constructed corpus, and the seed
contract."""

import pytest
from pyspark.sql import functions as F

from ddsketch_ruby_spark.operators.sampling import sample_key, weighted_sample


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_global_topk_plan_and_size(spark):
    out = weighted_sample(_docs(spark), "doc_id", "n_chars", k=25)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = out.collect()
    assert len(rows) == 25
    keys = [r["sample_key"] for r in rows]
    assert keys == sorted(keys)


def test_partitioning_invariant(spark):
    docs = _docs(spark)
    a = weighted_sample(docs.repartition(1), "doc_id", "n_chars", k=30)
    b = weighted_sample(docs.repartition(17), "doc_id", "n_chars", k=30)
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )


def test_stratified_k_per_group(spark):
    out = weighted_sample(
        _docs(spark), "doc_id", "n_chars", k=7, strata=["lang"]
    )
    per = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    avail = {
        r["lang"]: r["n"]
        for r in _docs(spark)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per == {lang: min(7, n) for lang, n in avail.items()}


def test_pps_bias_deterministic(spark):
    # 200 unit-weight rows + 5 rows whose weight is 10^9: every heavy
    # row's key is ~1e9 smaller than any unit row's, so all 5 must be
    # selected into a k=10 sample (deterministic, not statistical).
    rows = [(i, 1.0) for i in range(200)] + [
        (1000 + i, 1.0e9) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "id long, w double")
    picked = {
        r["id"] for r in weighted_sample(df, "id", "w", k=10).collect()
    }
    assert {1000, 1001, 1002, 1003, 1004} <= picked


def test_nonpositive_and_null_weights_excluded(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -2.0), (4, None), (5, 3.0)],
        "id long, w double",
    )
    picked = {r["id"] for r in weighted_sample(df, "id", "w", k=10).collect()}
    assert picked == {1, 5}


def test_seed_changes_sample(spark):
    docs = _docs(spark)
    a = {r["doc_id"] for r in weighted_sample(docs, "doc_id", "n_chars", k=20).collect()}
    b = {
        r["doc_id"]
        for r in weighted_sample(docs, "doc_id", "n_chars", k=20, seed=7).collect()
    }
    assert a != b  # independent replicates


def test_key_is_scan_level_expression(spark):
    # sample_key compiles to pure JVM expressions — no Python eval node.
    out = _docs(spark).select(sample_key("doc_id", "n_chars"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_k_must_be_positive(spark):
    with pytest.raises(ValueError):
        weighted_sample(_docs(spark), "doc_id", "n_chars", k=0)
