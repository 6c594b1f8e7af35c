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


def test_hash_split_proportions_and_exhaustive(spark):
    from ddsketch_ruby_spark.operators.sampling import hash_split

    df = spark.range(20000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["c"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert sum(counts.values()) == 20000  # every row assigned exactly once
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    assert abs(counts["val"] / 20000 - 0.1) < 0.01
    assert abs(counts["test"] / 20000 - 0.1) < 0.01


def test_hash_split_frozen_under_corpus_growth(spark):
    from ddsketch_ruby_spark.operators.sampling import hash_split

    w = {"train": 0.9, "test": 0.1}
    small = spark.range(1000).withColumnRenamed("id", "doc_id")
    big = spark.range(5000).withColumnRenamed("id", "doc_id").repartition(5)
    a = {r["doc_id"]: r["split"] for r in hash_split(small, "doc_id", w).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(big, "doc_id", w).collect()}
    # growing the corpus (and changing partitioning) never moves old rows
    assert a == {k: v for k, v in b.items() if k < 1000}
    # a different seed is a different (but still deterministic) assignment
    c = {r["doc_id"]: r["split"] for r in hash_split(small, "doc_id", w, seed=7).collect()}
    assert c != a
    c2 = {r["doc_id"]: r["split"] for r in hash_split(small, "doc_id", w, seed=7).collect()}
    assert c2 == c


def test_hash_split_no_shuffle_and_validation(spark):
    from ddsketch_ruby_spark.operators.sampling import hash_split

    df = spark.range(100).withColumnRenamed("id", "doc_id")
    plan = hash_split(df, "doc_id", {"a": 1.0, "b": 1.0})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure scan-level expression
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", {})
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", {"a": 1.0, "b": -0.5})
