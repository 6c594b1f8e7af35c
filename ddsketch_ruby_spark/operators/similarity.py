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
  full-corpus scan into a bucket lookup — that persisted shape is
  lsh_write_index / lsh_topk_indexed below.
- ivf_topk: IVF-style coarse quantizer — k-means centroids (k-means++ init,
  several Lloyd iterations, empty-cell reseeding) trained on a driver-side
  sample — + nprobe nearest cells, exact rerank within cells.
- ivf_write_index / ivf_topk_indexed: the 100 TB shape — persist the corpus
  partitioned BY CELL with the centroids alongside, so a query reads only
  nprobe partitions (partition pruning at the scan, verified in tests)
  instead of the full corpus.
"""

from __future__ import annotations

import json
import math
from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = [
    "cosine_topk",
    "lsh_bucket",
    "lsh_topk",
    "lsh_write_index",
    "lsh_topk_indexed",
    "lsh_ann_join",
    "lsh_ann_join_indexed",
    "ivf_train",
    "ivf_assign",
    "ivf_topk",
    "ivf_write_index",
    "ivf_topk_indexed",
    "ivf_ann_join",
    "ivf_ann_join_indexed",
]


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
    tie-break on id. Returns (id, sim, rank).

    The selection is orderBy().limit(k) — Spark plans it as
    TakeOrderedAndProject: each partition keeps its own k best and only
    those k-per-partition rows reach the driver-side merge, so no global
    shuffle ever happens. (A bare row_number() window with no partitionBy
    would move EVERY row into one task — the single-partition WindowExec
    trap.) The rank window then runs over just the k survivors."""
    sim = F.round(_cosine_col(vec_col, query), round_to).alias("sim")
    top = (
        df.select(F.col(id_col), sim)
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
    )
    w = F.row_number().over(Window.orderBy(F.desc("sim"), F.col(id_col)))
    return top.withColumn("rank", w).select(id_col, "sim", "rank")


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


def _probe_masks(n_planes: int, max_hamming: int) -> list[int]:
    """XOR masks defining the multi-probe set: 0 (the bucket itself),
    every single-bit flip, and — at max_hamming 2 — every pair flip. The
    ONE definition of the probe neighborhood, shared by the per-query
    path (_lsh_probes) and the batch path (lsh_ann_join) so they cannot
    diverge."""
    masks = [0]
    if max_hamming >= 1:
        masks += [1 << i for i in range(n_planes)]
    if max_hamming >= 2:
        masks += [
            (1 << i) | (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    return masks


def _lsh_probes(
    planes: np.ndarray, query: Sequence[float], max_hamming: int
) -> list[int]:
    """Multi-probe bucket set for a query: its own sign bucket plus every
    bucket within ``max_hamming`` flipped plane bits (_probe_masks)."""
    qsigns = (planes @ np.asarray(query, dtype=np.float64)) > 0
    qbucket = int(sum(1 << i for i, s in enumerate(qsigns) if s))
    return sorted({qbucket ^ m for m in _probe_masks(len(planes), max_hamming)})


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
    LSH). Recall measured in tests vs cosine_topk. Recomputes the bucket
    column over the corpus per call — for repeated queries build a
    persisted index once (lsh_write_index) and query it partition-pruned
    (lsh_topk_indexed)."""
    dim = len(query)
    planes = _hyperplanes(dim, n_planes, seed)
    probes = _lsh_probes(planes, query, max_hamming)
    bucketed = lsh_bucket(df, vec_col, dim, n_planes, seed)
    cand = bucketed.filter(F.col("lsh_bucket").isin(probes))
    return cosine_topk(cand, vec_col, id_col, query, k, round_to)


def lsh_write_index(
    df: DataFrame,
    path: str,
    vec_col: str,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    prefix_bits: int | None = None,
) -> np.ndarray:
    """Persist a hyperplane-LSH index: the corpus parquet PARTITIONED BY
    the sign bucket, with the plane parameters stored alongside
    (planes.json) so queries recompute nothing. Build once; every query
    then reads only its probe buckets via partition pruning — the module
    docstring's 100 TB shape, mirroring ivf_write_index/ivf_topk_indexed.

    Without ``prefix_bits``, ``n_planes`` is also the partition fan-out
    (2^n_planes directories): 8 planes -> 256 partitions; above 12 planes
    that layout is refused (directory explosion). At larger plane counts
    pass ``prefix_bits`` (<= 12): the layout partitions by the TOP
    ``prefix_bits`` bits of the bucket (``lsh_prefix``), bounding the
    directory count at 2^prefix_bits while the FULL bucket column stays
    in the data for the in-partition filter — queries prune to the
    distinct probe prefixes (multi-probe flips spread across all bit
    positions, so the ~n_planes single-flip probes collapse onto at most
    prefix_bits+1 distinct prefixes), then filter exact buckets inside
    the surviving partitions. Returns the planes matrix."""
    if prefix_bits is None and n_planes > 12:
        raise ValueError(
            "n_planes > 12 would create 2^n_planes partition directories; "
            "pass prefix_bits (<= 12) to partition by a bucket prefix"
        )
    if prefix_bits is not None and not (1 <= prefix_bits <= min(n_planes, 12)):
        raise ValueError(
            f"prefix_bits must be in [1, min(n_planes, 12)], got {prefix_bits}"
        )
    planes = _hyperplanes(dim, n_planes, seed)
    bucketed = lsh_bucket(df, vec_col, dim, n_planes, seed)
    if prefix_bits is None:
        bucketed.write.partitionBy("lsh_bucket").mode("overwrite").parquet(
            f"{path}/corpus"
        )
    else:
        bucketed.withColumn(
            "lsh_prefix",
            F.shiftrightunsigned(
                F.col("lsh_bucket").cast("long"), n_planes - prefix_bits
            ),
        ).write.partitionBy("lsh_prefix").mode("overwrite").parquet(
            f"{path}/corpus"
        )
    meta = {
        "planes": planes.tolist(),
        "vec_col": vec_col,
        "dim": dim,
        "n_planes": n_planes,
        "seed": seed,
        "prefix_bits": prefix_bits,
    }
    spark = df.sparkSession
    spark.createDataFrame([(json.dumps(meta),)], "meta string").coalesce(
        1
    ).write.mode("overwrite").text(f"{path}/planes.json")
    return planes


def lsh_topk_indexed(
    spark: SparkSession,
    path: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
    max_hamming: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """Query a persisted LSH index: the probe-bucket filter is on a
    PARTITION column, so Spark prunes all non-probed buckets at planning
    time (verify with .explain -> 'PartitionFilters: [lsh_bucket IN ...]');
    with max_hamming=1 over n_planes=8 a query reads 9/256 of the corpus
    instead of scanning it. Prefix-partitioned indexes (lsh_write_index
    with ``prefix_bits``) prune on the distinct PROBE PREFIXES
    ('PartitionFilters: [lsh_prefix IN ...]') and apply the exact bucket
    set as an ordinary pushed filter inside the surviving partitions."""
    raw = spark.read.text(f"{path}/planes.json").collect()
    meta = json.loads(raw[0].value)
    planes = np.asarray(meta["planes"], dtype=np.float64)
    probes = _lsh_probes(planes, query, max_hamming)
    corpus = spark.read.parquet(f"{path}/corpus")
    prefix_bits = meta.get("prefix_bits")
    if prefix_bits is not None:
        shift = meta["n_planes"] - prefix_bits
        prefixes = sorted({p >> shift for p in probes})
        corpus = corpus.filter(F.col("lsh_prefix").isin(prefixes))
    cand = corpus.filter(F.col("lsh_bucket").isin(probes))
    return cosine_topk(cand, meta["vec_col"], id_col, query, k, round_to)


def lsh_ann_join(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    query_vec_col: str,
    *,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    max_hamming: int = 1,
    round_to: int = 6,
    broadcast_queries: bool = True,
) -> DataFrame:
    """BATCH multi-probe ANN: the per-query top-k for EVERY row of a
    ``queries`` DataFrame in one distributed job — the production shape
    for "N thousand queries against the corpus", where looping
    lsh_topk per query would launch N jobs and rescan the corpus N
    times. Returns (query_id, id, sim, rank), rank 1..k per query,
    ties broken on id.

    Plan shape at corpus scale: the corpus is scanned ONCE, bucketed by
    the JVM hyperplane expression (no UDF); each query expands to its
    1 + n_planes (+ pairs, at max_hamming=2) probe buckets — a thin
    (query_id, probe, query_vec) frame that is broadcast by default
    (queries are typically thousands of rows against a corpus of
    billions; pass ``broadcast_queries=False`` for huge query sets and
    AQE plans the join) — so candidate generation is a broadcast hash
    join with NO corpus shuffle. Norms are computed ONCE per corpus row
    and once per query (8 B columns through the join), never per
    candidate; the dot product is the same JVM fold as cosine_topk, and
    the final top-k window partitions BY QUERY (hash distributed, sized
    by |candidates| — never the single-partition WindowExec trap).

    Probe masks are _probe_masks — the same definition the per-query
    path expands — and the query's base bucket uses the same JVM fold
    that buckets the corpus, so a batch row equals lsh_topk's answer
    for that query. (The per-query path computes the base bucket with
    numpy planes@query instead; the two folds can disagree on the sign
    of a dot product only within rounding error of zero, so exact
    equality holds for any query not astride a hyperplane.)"""
    bc = lsh_bucket(corpus, vec_col, dim, n_planes, seed).withColumn(
        "__vn", _sqnorm_col(vec_col)
    )
    probes = _query_probe_frame(
        queries, query_id_col, query_vec_col, dim, n_planes, seed,
        max_hamming, broadcast_queries,
    )
    cand = bc.join(probes, F.col("lsh_bucket") == F.col("__probe"))
    return _score_and_rank(cand, vec_col, id_col, k, round_to)


def _sqnorm_col(vec_col: str):
    """L2 norm of an array column as the left-to-right JVM fold."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _query_probe_frame(
    queries: DataFrame,
    query_id_col: str,
    query_vec_col: str,
    dim: int,
    n_planes: int,
    seed: int,
    max_hamming: int,
    broadcast_queries: bool,
) -> DataFrame:
    """(query_id, __qv, __qn, __probe) — each query exploded over its
    _probe_masks neighborhood, base bucket computed with the same JVM
    fold that buckets the corpus. Shared by lsh_ann_join and
    lsh_ann_join_indexed."""
    if max_hamming > 2:
        raise ValueError("max_hamming > 2 not supported (probe explosion)")
    masks = _probe_masks(n_planes, max_hamming)
    qb = lsh_bucket(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("__qv"),
        ),
        "__qv",
        dim,
        n_planes,
        seed,
    ).withColumn("__qn", _sqnorm_col("__qv"))
    probes = qb.select(
        "query_id",
        "__qv",
        "__qn",
        F.explode(
            F.array(
                *[
                    F.col("lsh_bucket").bitwiseXOR(F.lit(m).cast("long"))
                    for m in masks
                ]
            )
        ).alias("__probe"),
    )
    return F.broadcast(probes) if broadcast_queries else probes


def _score_and_rank(
    cand: DataFrame, vec_col: str, id_col: str, k: int, round_to: int
) -> DataFrame:
    """Cosine from precomputed norms (__vn, __qn) + per-query top-k."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qv = F.transform(F.col("__qv"), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(v, qv, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sim = F.round(dot / (F.col("__vn") * F.col("__qn")), round_to)
    scored = cand.select("query_id", F.col(id_col), sim.alias("sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "sim", "rank")
    )


def lsh_ann_join_indexed(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    id_col: str,
    query_id_col: str,
    query_vec_col: str,
    *,
    k: int = 10,
    max_hamming: int = 1,
    round_to: int = 6,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Batch multi-probe ANN against a PERSISTED index (lsh_write_index):
    the repeated-workload combination of lsh_ann_join (N queries, one
    job) and lsh_topk_indexed (read only probed partitions). Returns
    (query_id, id, sim, rank).

    Partition pruning needs a LITERAL filter — a join on the partition
    column does not prune statically and Spark's dynamic partition
    pruning does not fire for this shape (verified on the executed
    plan) — so the distinct probe set is collected to the driver first.
    That collect is BOUNDED metadata, not data: at most
    |queries| x (1 + n_planes [+ pairs]) longs (thousands of queries ->
    ~10^4-10^5 values), the same budget class as IVF's driver-side
    training sample. For query sets large enough that the probe IN-list
    itself is unwieldy, scan-and-bucket the raw corpus with lsh_ann_join
    instead — one full scan beats a million-literal plan."""
    raw = spark.read.text(f"{path}/planes.json").collect()
    meta = json.loads(raw[0].value)
    # build the probe frame UNHINTED first: the bounded metadata collect
    # below is not a join, and a broadcast hint on a non-join plan only
    # produces a HintErrorLogger warning; the hint is applied for the
    # actual candidate join afterwards
    probes = _query_probe_frame(
        queries, query_id_col, query_vec_col, meta["dim"], meta["n_planes"],
        meta["seed"], max_hamming, broadcast_queries=False,
    )
    probe_vals = sorted(
        r["__probe"] for r in probes.select("__probe").distinct().collect()
    )
    if broadcast_queries:
        probes = F.broadcast(probes)
    corpus = spark.read.parquet(f"{path}/corpus")
    prefix_bits = meta.get("prefix_bits")
    if prefix_bits is not None:
        shift = meta["n_planes"] - prefix_bits
        corpus = corpus.filter(
            F.col("lsh_prefix").isin(sorted({p >> shift for p in probe_vals}))
        )
    corpus = corpus.filter(F.col("lsh_bucket").isin(probe_vals)).withColumn(
        "__vn", _sqnorm_col(meta["vec_col"])
    )
    cand = corpus.join(probes, F.col("lsh_bucket") == F.col("__probe"))
    return _score_and_rank(cand, meta["vec_col"], id_col, k, round_to)


def ivf_train(
    df: DataFrame,
    vec_col: str,
    n_cells: int = 16,
    iters: int = 10,
    sample_fraction: float = 0.2,
    sample_limit: int = 20000,
    seed: int = 42,
) -> np.ndarray:
    """Train IVF coarse centroids: k-means on a driver-side sample with
    k-means++ seeding, ``iters`` Lloyd iterations, and empty-cell reseeding
    to the farthest point. Deterministic for a fixed seed.

    The sample is bounded (``sample_limit`` rows) so training cost is
    independent of corpus size — at 10^12 docs you train on the same 20k
    rows; only assignment (ivf_assign) scans the corpus."""
    sample = np.array(
        df.select(vec_col)
        .sample(fraction=sample_fraction, seed=seed)
        .limit(sample_limit)
        .collect()
    )[:, 0]
    sample = np.stack([np.asarray(v, dtype=np.float64) for v in sample])
    rng = np.random.default_rng(seed)
    return kmeans_np(sample, n_cells, iters, rng)


def kmeans_np(
    sample: np.ndarray, k: int, iters: int, rng: np.random.Generator
) -> np.ndarray:
    """k-means++ seeding + Lloyd iterations with empty-cell reseeding to
    the farthest point, on an in-memory (n, d) float64 sample.
    Deterministic for a fixed Generator state. Shared by ivf_train and
    pq_train (operators/pq.py trains one codebook per subspace)."""
    n = len(sample)
    k = min(k, n)

    centroids = np.empty((k, sample.shape[1]))
    centroids[0] = sample[rng.integers(n)]
    d2 = ((sample - centroids[0]) ** 2).sum(-1)
    for c in range(1, k):
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
        centroids[c] = sample[rng.choice(n, p=probs)]
        d2 = np.minimum(d2, ((sample - centroids[c]) ** 2).sum(-1))

    for _ in range(iters):
        dist = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        assign = dist.argmin(1)
        moved = False
        for c in range(k):
            pts = sample[assign == c]
            if len(pts):
                new = pts.mean(0)
            else:  # reseed empty cell at the globally farthest point
                new = sample[dist.min(1).argmax()]
            if not np.array_equal(new, centroids[c]):
                centroids[c] = new
                moved = True
        if not moved:
            break
    return centroids


def ivf_assign(
    df: DataFrame, vec_col: str, centroids: np.ndarray, cell_col: str = "__cell"
) -> DataFrame:
    """Adds the nearest-centroid cell id as a column. All JVM-side: an
    array of n_cells squared distances (each computed once), argmin via
    array_position(array_min) — no UDF, no shuffle."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def dist2(cent: np.ndarray):
        carr = F.array(*[F.lit(float(x)) for x in cent])
        return F.aggregate(
            F.zip_with(v, carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    dists = F.array(*[dist2(c) for c in centroids])
    cell = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return df.withColumn(cell_col, cell)


def _probe_cells(
    centroids: np.ndarray, query: Sequence[float], nprobe: int
) -> list[int]:
    qd = ((centroids - np.asarray(query, dtype=np.float64)) ** 2).sum(1)
    return [int(c) for c in np.argsort(qd)[:nprobe]]


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    iters: int = 10,
    sample_fraction: float = 0.2,
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """IVF ANN in one shot: train on a sample, assign JVM-side, exact
    rerank within the ``nprobe`` cells nearest to the query."""
    centroids = ivf_train(
        df, vec_col, n_cells, iters, sample_fraction, seed=seed
    )
    cand = ivf_assign(df, vec_col, centroids).filter(
        F.col("__cell").isin(_probe_cells(centroids, query, nprobe))
    )
    return cosine_topk(cand, vec_col, id_col, query, k, round_to)


def ivf_write_index(
    df: DataFrame,
    path: str,
    vec_col: str,
    n_cells: int = 16,
    iters: int = 10,
    sample_fraction: float = 0.2,
    seed: int = 42,
) -> np.ndarray:
    """Persist an IVF index: the corpus parquet PARTITIONED BY cell, with
    the trained centroids stored alongside (centroids.json). Build once,
    then every query is a partition-pruned read of nprobe cells — at corpus
    scale this is the difference between scanning 100 TB and scanning
    nprobe/n_cells of it. Returns the centroids."""
    centroids = ivf_train(df, vec_col, n_cells, iters, sample_fraction, seed=seed)
    assigned = ivf_assign(df, vec_col, centroids, cell_col="cell")
    assigned.write.partitionBy("cell").mode("overwrite").parquet(
        f"{path}/corpus"
    )
    # tiny metadata file next to the data (same layout Iceberg would keep
    # in table properties)
    meta = {"centroids": centroids.tolist(), "vec_col": vec_col}
    spark = df.sparkSession
    spark.createDataFrame([(json.dumps(meta),)], "meta string").coalesce(
        1
    ).write.mode("overwrite").text(f"{path}/centroids.json")
    return centroids


def ivf_topk_indexed(
    spark: SparkSession,
    path: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """Query a persisted IVF index: the cell filter is on a PARTITION
    column, so Spark prunes non-probed cells at planning time (verify with
    .explain -> 'PartitionFilters: [cell IN ...]'); only nprobe/n_cells of
    the data is ever read."""
    raw = spark.read.text(f"{path}/centroids.json").collect()
    meta = json.loads(raw[0].value)
    centroids = np.asarray(meta["centroids"], dtype=np.float64)
    corpus = spark.read.parquet(f"{path}/corpus")
    cand = corpus.filter(
        F.col("cell").isin(_probe_cells(centroids, query, nprobe))
    )
    return cosine_topk(cand, meta["vec_col"], id_col, query, k, round_to)


def _ivf_probe_frame(
    queries: DataFrame,
    query_id_col: str,
    query_vec_col: str,
    centroids: np.ndarray,
    nprobe: int,
    broadcast_queries: bool,
) -> DataFrame:
    """(query_id, __qv, __qn, __cell) — each query exploded over its
    nprobe nearest centroid cells, computed JVM-side: an array of
    (distance, cell) structs sorted lexicographically (distance, then
    cell id on exact ties — np.argsort in the per-query path leaves tie
    order unspecified, but exact float-distance ties do not occur for
    real embeddings), sliced to nprobe."""
    if not (1 <= nprobe <= len(centroids)):
        raise ValueError(
            f"nprobe must be in [1, n_cells={len(centroids)}], got {nprobe}"
        )
    qv = F.transform(F.col("__qv"), lambda x: x.cast("double"))

    def dist2(cent: np.ndarray):
        carr = F.array(*[F.lit(float(x)) for x in cent])
        return F.aggregate(
            F.zip_with(qv, carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    structs = F.array(
        *[
            F.struct(dist2(c).alias("d"), F.lit(i).cast("int").alias("c"))
            for i, c in enumerate(centroids)
        ]
    )
    cells = F.transform(
        F.slice(F.array_sort(structs), 1, nprobe), lambda s: s["c"]
    )
    probes = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("__qv"),
    ).select(
        "query_id",
        "__qv",
        _sqnorm_col("__qv").alias("__qn"),
        F.explode(cells).alias("__cell"),
    )
    return F.broadcast(probes) if broadcast_queries else probes


def ivf_ann_join(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    query_vec_col: str,
    *,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    iters: int = 10,
    sample_fraction: float = 0.2,
    seed: int = 42,
    round_to: int = 6,
    broadcast_queries: bool = True,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Batch IVF ANN: the nprobe-cell top-k for every row of ``queries``
    in one job — the IVF twin of lsh_ann_join (same plan shape: corpus
    assigned to cells once, thin broadcast probe frame, broadcast hash
    join, per-query top-k window partitioned by query). Pass trained
    ``centroids`` to skip training (and to share them with a per-query
    ivf_topk for comparison); otherwise k-means trains on the bounded
    driver-side sample exactly as ivf_topk does."""
    if centroids is None:
        centroids = ivf_train(
            corpus, vec_col, n_cells, iters, sample_fraction, seed=seed
        )
    bc = ivf_assign(corpus, vec_col, centroids, cell_col="__corpus_cell")
    bc = bc.withColumn("__vn", _sqnorm_col(vec_col))
    probes = _ivf_probe_frame(
        queries, query_id_col, query_vec_col, centroids, nprobe,
        broadcast_queries,
    )
    cand = bc.join(probes, F.col("__corpus_cell") == F.col("__cell"))
    return _score_and_rank(cand, vec_col, id_col, k, round_to)


def ivf_ann_join_indexed(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    id_col: str,
    query_id_col: str,
    query_vec_col: str,
    *,
    k: int = 10,
    nprobe: int = 4,
    round_to: int = 6,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Batch IVF ANN against a persisted index (ivf_write_index): reads
    only the UNION of the queries' probe cells via static partition
    pruning. Like lsh_ann_join_indexed, a literal filter is required for
    planning-time pruning, so the distinct probed cells are collected
    first — bounded by n_cells values, strictly smaller metadata than
    even the LSH probe union."""
    raw = spark.read.text(f"{path}/centroids.json").collect()
    meta = json.loads(raw[0].value)
    centroids = np.asarray(meta["centroids"], dtype=np.float64)
    probes = _ivf_probe_frame(
        queries, query_id_col, query_vec_col, centroids, nprobe,
        broadcast_queries=False,
    )
    cells = sorted(
        r["__cell"] for r in probes.select("__cell").distinct().collect()
    )
    if broadcast_queries:
        probes = F.broadcast(probes)
    corpus = spark.read.parquet(f"{path}/corpus")
    corpus = corpus.filter(F.col("cell").isin(cells)).withColumn(
        "__vn", _sqnorm_col(meta["vec_col"])
    )
    cand = corpus.join(probes, F.col("cell") == F.col("__cell"))
    return _score_and_rank(cand, meta["vec_col"], id_col, k, round_to)
