"""BM25 full-text relevance scoring and top-k retrieval.

Okapi BM25 (Robertson & Zaragoza 2009, "The Probabilistic Relevance
Framework") with the Lucene-style non-negative idf
``ln(1 + (N - df + 0.5)/(df + 0.5))``:

    score(d, q) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

Execution shape — built for a corpus that does NOT fit one machine:

- **No corpus-token explode.** Tokens come from one JVM-side
  ``regexp_extract_all``; per-query-term tf is ``size(filter(tokens, ...))``
  — a column expression, so the per-document pass emits one row per doc,
  never one row per token.
- **Two scan-bound passes, zero data shuffle.** Pass 1 is a single
  1-row aggregate (N, total token count, df per query term — map-side
  partial agg, bytes to the driver side of the exchange). Pass 2 joins
  that broadcast 1-row frame back on a literal key (BroadcastHashJoin,
  not a nested loop), computes every per-doc score inside whole-stage
  codegen, and top-k plans as TakeOrderedAndProject.
- **Deterministic scores.** Each term's contribution is scaled by 1e6
  and rounded to an INTEGER before summing, so the doc score is an
  order-insensitive integer sum — a pure function of (corpus, query),
  reproducible bit-for-bit by any SQL engine (the per-term double math
  is a fixed tree of IEEE ops on exactly-representable inputs).

Ranking ties break by id, making the selected top-k SET deterministic.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bm25_scores", "bm25_topk", "query_terms", "vocab_topk"]

_TOKEN_RE = "([A-Za-z0-9]+)"
_SCALE = 1_000_000.0


def query_terms(query: str) -> list[str]:
    """Lower-cased distinct query tokens, first-occurrence order — the
    same tokenizer the corpus side uses (ASCII alnum runs; lower() is
    applied per-token so it is engine-portable)."""
    seen: dict[str, None] = {}
    for t in re.findall("[A-Za-z0-9]+", query):
        seen.setdefault(t.lower())
    return list(seen)


def _tokens(text_col: str) -> Column:
    return F.transform(
        F.regexp_extract_all(F.col(text_col), F.lit(_TOKEN_RE), 1),
        lambda x: F.lower(x),
    )


def bm25_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query: str,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document against ``query``; returns (id, dl, score)
    with score > 0 only for docs matching at least one term."""
    terms = query_terms(query)
    if not terms:
        raise ValueError("query has no tokens")
    toks = df.select(
        F.col(id_col), _tokens(text_col).alias("__toks")
    ).withColumn("__dl", F.size("__toks"))
    def _tf(term: str) -> Column:
        # NB: a one-parameter lambda — pyspark treats two-parameter
        # lambdas in F.filter as (element, index) functions
        return F.size(F.filter("__toks", lambda x: x == F.lit(term)))

    tf_cols = [_tf(t).alias(f"__tf_{i}") for i, t in enumerate(terms)]
    perdoc = toks.select(id_col, "__dl", *tf_cols)

    # pass 1: corpus statistics — one aggregate row
    stats = perdoc.agg(
        F.count("*").alias("__n"),
        F.sum("__dl").alias("__tot"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    ).withColumn("__k", F.lit(1))

    # pass 2: per-doc scores with the broadcast stats row (equi-join on a
    # literal key -> BroadcastHashJoin, codegen-friendly)
    joined = perdoc.withColumn("__k", F.lit(1)).join(
        F.broadcast(stats), on="__k"
    )
    n_d = F.col("__n").cast("double")
    avgdl = F.col("__tot").cast("double") / n_d
    norm = F.lit(1.0 - b) + F.lit(b) * (F.col("__dl").cast("double") / avgdl)
    k1p1 = k1 + 1.0
    ints = []
    for i in range(len(terms)):
        dfd = F.col(f"__df_{i}").cast("double")
        idf = F.log(F.lit(1.0) + ((n_d - dfd) + F.lit(0.5)) / (dfd + F.lit(0.5)))
        tfd = F.col(f"__tf_{i}").cast("double")
        term = idf * ((tfd * F.lit(k1p1)) / (tfd + F.lit(k1) * norm))
        ints.append(F.round(term * F.lit(_SCALE), 0).cast("long"))
    total = ints[0]
    for c in ints[1:]:
        total = total + c
    return joined.select(
        F.col(id_col),
        F.col("__dl").alias("dl"),
        (total.cast("double") / F.lit(_SCALE)).alias("score"),
    )


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 score (ties broken by id ascending).
    Plans as TakeOrderedAndProject: per-partition partial top-k, k-row
    final — no full sort, no single-partition window."""
    scored = bm25_scores(df, text_col, id_col, query, k1=k1, b=b)
    return (
        scored.filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def vocab_topk(
    df: DataFrame,
    text_col: str,
    k: int = 1000,
    min_count: int = 1,
) -> DataFrame:
    """Corpus vocabulary heavy hitters: (term, n) for the k most frequent
    tokens (ties broken by term ascending), using the same tokenizer as
    BM25 so retrieval and vocabulary agree on what a token is.

    Plan shape: explode -> Tungsten partial count per term (map-side
    combine bounds the shuffle at distinct-terms-per-partition, not
    token occurrences) -> final count -> TakeOrderedAndProject. The
    classic wordcount, and the classic right plan for it."""
    if k <= 0:
        raise ValueError("k must be positive")
    toks = df.select(F.explode(_tokens(text_col)).alias("term"))
    counts = toks.groupBy("term").agg(F.count("*").alias("n"))
    if min_count > 1:
        counts = counts.filter(F.col("n") >= min_count)
    return counts.orderBy(F.col("n").desc(), F.col("term")).limit(k)
