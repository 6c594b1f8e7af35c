"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force exact top-k neighbors — the correctness
  baseline. All math is JVM-side (zip_with/aggregate inside whole-stage
  codegen); the query vector is a broadcast literal, so the plan is a
  single scan + TopK sort: embarrassingly parallel, no shuffle except the
  final k-row reduction.
- lsh_topk: the scale path — random-hyperplane (SimHash) bucketing with
  multi-probe: candidates restricted to matching buckets, then exact
  rerank. At 100 TB the bucket column is precomputed/partitioned-by so a
  query touches only matching partitions (partition pruning), turning a
  full-corpus scan into a bucket lookup.
- ivf_topk: IVF-style coarse quantizer (k-means-lite centroids trained on a
  sample) + nprobe nearest cells, exact rerank within cells.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cosine_topk", "lsh_bucket", "lsh_topk", "ivf_topk"]


def _cosine_col(vec_col: str, query: Sequence[float]):
    """Cosine similarity between an array column and a literal query vector,
    computed in float64 JVM-side."""
    q = [float(x) for x in query]
    qnorm = math.sqrt(sum(x * x for x in q))
    qarr = F.array(*[F.lit(x) for x in q])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(v, qarr, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    vnorm = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    return dot / (vnorm * F.lit(qnorm))


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity; deterministic
    tie-break on id. Returns (id, sim, rank)."""
    sim = F.round(_cosine_col(vec_col, query), round_to).alias("sim")
    scored = df.select(F.col(id_col), sim)
    w = F.row_number().over(Window.orderBy(F.desc("sim"), F.col(id_col)))
    return (
        scored.withColumn("rank", w)
        .filter(F.col("rank") <= k)
        .select(id_col, "sim", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(
    df: DataFrame, vec_col: str, dim: int, n_planes: int = 16, seed: int = 42
) -> DataFrame:
    """Adds a random-hyperplane LSH bucket column (int). Sign pattern of
    n_planes dot products — JVM-side arithmetic, no UDF."""
    planes = _hyperplanes(dim, n_planes, seed)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        parr = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(v, parr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return df.withColumn("lsh_bucket", bucket)


def lsh_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
    n_planes: int = 12,
    max_hamming: int = 1,
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """Approximate top-k: only rows whose hyperplane sign-bucket is within
    ``max_hamming`` bits of the query's bucket are scored (multi-probe
    LSH). Recall measured in tests vs cosine_topk."""
    dim = len(query)
    planes = _hyperplanes(dim, n_planes, seed)
    qsigns = (planes @ np.asarray(query, dtype=np.float64)) > 0
    qbucket = int(sum(1 << i for i, s in enumerate(qsigns) if s))
    probes = {qbucket}
    if max_hamming >= 1:
        probes |= {qbucket ^ (1 << i) for i in range(n_planes)}
    if max_hamming >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probes.add(qbucket ^ (1 << i) ^ (1 << j))
    bucketed = lsh_bucket(df, vec_col, dim, n_planes, seed)
    cand = bucketed.filter(F.col("lsh_bucket").isin(list(probes)))
    return cosine_topk(cand, vec_col, id_col, query, k, round_to)


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    sample_fraction: float = 0.2,
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """IVF-lite ANN: coarse centroids from a driver-side sample (one k-means
    iteration from random seeds — deterministic), cell assignment JVM-side,
    exact rerank within the ``nprobe`` cells nearest to the query."""
    sample = np.array(
        df.select(vec_col)
        .sample(fraction=sample_fraction, seed=seed)
        .limit(5000)
        .collect()
    )[:, 0]
    sample = np.stack([np.asarray(v, dtype=np.float64) for v in sample])
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)]
    # one Lloyd iteration for stability
    d2 = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
    assign = d2.argmin(1)
    for c in range(len(centroids)):
        pts = sample[assign == c]
        if len(pts):
            centroids[c] = pts.mean(0)

    # nearest cell assignment as a JVM expression (argmin over n_cells dots)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def dist2(cent: np.ndarray):
        carr = F.array(*[F.lit(float(x)) for x in cent])
        return F.aggregate(
            F.zip_with(v, carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    best_cell = F.lit(0)
    best_d = dist2(centroids[0])
    for ci in range(1, len(centroids)):
        d = dist2(centroids[ci])
        cond = d < best_d
        best_cell = F.when(cond, F.lit(ci)).otherwise(best_cell)
        best_d = F.when(cond, d).otherwise(best_d)

    qd = ((centroids - np.asarray(query, dtype=np.float64)) ** 2).sum(1)
    probe_cells = [int(c) for c in np.argsort(qd)[:nprobe]]
    cand = df.withColumn("__cell", best_cell).filter(
        F.col("__cell").isin(probe_cells)
    )
    return cosine_topk(cand, vec_col, id_col, query, k, round_to)
