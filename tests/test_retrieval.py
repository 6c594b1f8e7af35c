"""BM25 retrieval (operators/retrieval.py): ranking sanity, determinism,
plan shape, and tokenizer edge cases."""

import pytest
from pyspark.sql import functions as F

from ddsketch_ruby_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
    query_terms,
)


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_query_terms_tokenizer():
    assert query_terms("Fast, HASH-join! fast") == ["fast", "hash", "join"]
    assert query_terms("a1 B2 a1") == ["a1", "b2"]
    with pytest.raises(ValueError):
        bm25_scores(None, "text", "doc_id", "!!! ...")


def test_scores_nonnegative_and_zero_without_terms(spark):
    df = spark.createDataFrame(
        [(1, "spark join join hash"), (2, "completely unrelated words")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bm25_scores(df, "text", "doc_id", "join hash").collect()}
    assert rows[1]["score"] > 0
    assert rows[2]["score"] == 0.0
    assert rows[1]["dl"] == 4 and rows[2]["dl"] == 3


def test_tf_saturation_and_idf_ordering(spark):
    # same dl: more matching occurrences -> higher score; a rarer term
    # (lower df) outweighs a common one at equal tf.
    df = spark.createDataFrame(
        [
            (1, "rare w w w"),
            (2, "common w w w"),
            (3, "common w w w"),
            (4, "common w w w"),
            (5, "rare rare w w"),
        ],
        "doc_id long, text string",
    )
    s = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(df, "text", "doc_id", "rare common").collect()
    }
    assert s[5] > s[1]  # tf=2 beats tf=1 for the same term/dl
    assert s[1] > s[2]  # df(rare)=2 < df(common)=3 -> bigger idf


def test_topk_deterministic_under_partitioning(spark):
    docs = _docs(spark)
    q = "fast hash join"
    a = bm25_topk(docs.repartition(1), "text", "doc_id", q, k=15).collect()
    b = bm25_topk(docs.repartition(13), "text", "doc_id", q, k=15).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]
    scores = [r["score"] for r in a]
    assert scores == sorted(scores, reverse=True)
    assert len(a) == 15


def test_absent_terms_yield_empty(spark):
    out = bm25_topk(_docs(spark), "text", "doc_id", "zzqqxx", k=5)
    assert out.count() == 0


def test_plan_shape(spark):
    out = bm25_topk(_docs(spark), "text", "doc_id", "fast hash", k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # per-token explode never appears: tf is an array-expression column
    assert "Generate" not in plan


def test_vocab_topk_counts_and_order(spark):
    from ddsketch_ruby_spark.operators.retrieval import vocab_topk

    df = spark.createDataFrame(
        [(1, "b a a C c"), (2, "a b! b")], "doc_id long, text string"
    )
    rows = vocab_topk(df, "text", k=2).collect()
    # a:3, b:3, c:2 -> top-2 is a,b (tie broken by term)
    assert [(r["term"], r["n"]) for r in rows] == [("a", 3), ("b", 3)]
    full = vocab_topk(df, "text", k=10, min_count=3).collect()
    assert {r["term"] for r in full} == {"a", "b"}
    plan = vocab_topk(df, "text", k=2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
