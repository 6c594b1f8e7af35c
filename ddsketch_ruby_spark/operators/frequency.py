"""Frequency / membership convenience operators over CMS and Bloom states.

Pattern: build the sketch distributed (hashing JVM-side), persist or collect
the compact state, query it anywhere — the state is the index. Useful when
the key space is too large for an exact groupBy (CMS: O(width x depth)
memory for any number of keys) or when a later job needs cheap membership
(Bloom: bits shipped to executors instead of a join).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sketches.bloom import BloomSpec
from ..sketches.cms import CMSSpec
from .agg import sketch_agg

__all__ = [
    "cms_build",
    "cms_estimate",
    "cms_probe_column",
    "bloom_build",
    "bloom_filter_column",
    "hash_items",
    "hll_overlap",
    "kmv_overlap",
    "heavy_hitters",
]


def hash_items(spark, items: Iterable, dtype: str = "long") -> list[int]:
    """xxhash64 of literal items via the JVM — the same hash the build used
    (never mix Python-side hashing with JVM-side builds)."""
    items = list(items)
    df = spark.createDataFrame([(it,) for it in items], f"item {dtype}")
    return [r["h"] for r in df.select(F.xxhash64("item").alias("h")).collect()]


def cms_build(
    df: DataFrame, col: str, spec: CMSSpec, weight_col: str | None = None
) -> np.ndarray:
    """Distributed count-min build over xxhash64(col); returns the state."""
    hashed = df.select(
        F.xxhash64(col).alias("__h"),
        *( [F.col(weight_col)] if weight_col else [] ),
    )
    rows = sketch_agg(
        hashed, spec, "__h", [], weight_col=weight_col, output="state"
    ).collect()
    return spec.row_to_state(rows[0].asDict())


def cms_estimate(
    spark, state: np.ndarray, spec: CMSSpec, items: Iterable, dtype: str = "long"
) -> dict:
    hashes = hash_items(spark, items, dtype)
    est = spec.estimate(state, hashes)
    return dict(zip(list(items), [float(e) for e in est]))


def _scratch_col(df: DataFrame, base: str) -> str:
    """A scratch column name guaranteed absent from df — a user column
    literally named __h must survive the probe untouched."""
    name = base
    i = 0
    existing = set(df.columns)
    while name in existing:
        i += 1
        name = f"{base}_{i}"
    return name


def cms_probe_column(
    df: DataFrame, col: str, spec: CMSSpec, state: np.ndarray
) -> DataFrame:
    """Adds double ``est_count`` by probing the count-min state inside a
    pandas iterator — the state broadcasts once per executor via the
    closure, each batch is estimated in ONE vectorized call (O(depth) per
    row); no join, no shuffle. The distributed-scale twin of
    ``cms_estimate`` (which collects literal items on the driver)."""
    import pandas as pd
    from pyspark.sql import types as T

    counts = state.copy()
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("est_count", T.DoubleType())]
    )
    hcol = _scratch_col(df, "__h")
    hashed = df.withColumn(hcol, F.xxhash64(col))

    def probe(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            h = pdf[hcol].to_numpy()
            out = pdf.drop(columns=[hcol])
            out["est_count"] = spec.estimate(counts, h)
            yield out

    return hashed.mapInPandas(probe, schema=schema)


def bloom_build(df: DataFrame, col: str, spec: BloomSpec) -> np.ndarray:
    hashed = df.select(F.xxhash64(col).alias("__h"))
    rows = sketch_agg(hashed, spec, "__h", [], output="state").collect()
    return spec.row_to_state(rows[0].asDict())


def bloom_filter_column(
    df: DataFrame, col: str, spec: BloomSpec, state: np.ndarray
) -> DataFrame:
    """Adds boolean ``maybe_member`` by probing the Bloom state inside a
    pandas iterator — the state broadcasts once per executor via the
    closure; no join, no shuffle."""
    import pandas as pd
    from pyspark.sql import types as T

    bits = state.copy()
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("maybe_member", T.BooleanType())]
    )
    hcol = _scratch_col(df, "__h")
    hashed = df.withColumn(hcol, F.xxhash64(col))

    def probe(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            h = pdf[hcol].to_numpy()
            member = spec.contains(bits, h)
            out = pdf.drop(columns=[hcol])
            out["maybe_member"] = member
            yield out

    return hashed.mapInPandas(probe, schema=schema)


def hll_overlap(
    df: DataFrame,
    hash_col: str,
    group_col: str,
    p: int = 14,
) -> DataFrame:
    """Pairwise distinct-overlap estimates between groups, via HLL
    inclusion-exclusion: |A ∩ B| ≈ est(A) + est(B) − est(A ∪ B), where
    est(A ∪ B) is the estimate of the element-wise register MAX (the HLL
    union is exact at the sketch level — merging registers gives the
    sketch OF the union, so only the estimator error remains).

    Input contract matches the HLL spec: ``hash_col`` already holds
    xxhash64 values (hash JVM-side). Output: one row per unordered group
    pair (type_a < type_b) with est_a / est_b / est_union /
    est_intersect (clamped at 0 — inclusion-exclusion can go slightly
    negative for disjoint sets).

    Scale shape: the expensive part is the distributed register build
    (two-phase sketch_agg — shuffle volume partitions x groups x 16 kB,
    row-count independent). The pairing joins two g-row state frames
    with an inequality condition: a BROADCAST nested loop over g rows a
    side — bounded by construction (g = group cardinality after
    aggregation), never by input rows. The estimator folds each pair's
    16 kB registers in NumPy inside mapInPandas."""
    import pandas as pd
    from pyspark.sql import types as T

    from ..sketches.hll import HLLSpec, hll_estimate

    spec = HLLSpec(p)
    states = sketch_agg(df, spec, hash_col, [group_col], output="state")
    gtype = states.schema[group_col].dataType
    a = states.select(
        F.col(group_col).alias("type_a"), F.col("registers").alias("__ra")
    )
    b = states.select(
        F.col(group_col).alias("type_b"), F.col("registers").alias("__rb")
    )
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    out_schema = T.StructType(
        [
            T.StructField("type_a", gtype),
            T.StructField("type_b", gtype),
            T.StructField("est_a", T.DoubleType()),
            T.StructField("est_b", T.DoubleType()),
            T.StructField("est_union", T.DoubleType()),
            T.StructField("est_intersect", T.DoubleType()),
        ]
    )

    def est_pairs(batches):
        for pdf in batches:
            rows = []
            for ta, tb, ra_b, rb_b in zip(
                pdf["type_a"], pdf["type_b"], pdf["__ra"], pdf["__rb"]
            ):
                ra = np.frombuffer(bytes(ra_b), dtype=np.uint8)
                rb = np.frombuffer(bytes(rb_b), dtype=np.uint8)
                ea = hll_estimate(ra)
                eb = hll_estimate(rb)
                eu = hll_estimate(np.maximum(ra, rb))
                rows.append(
                    (ta, tb, ea, eb, eu, max(0.0, (ea + eb) - eu))
                )
            yield pd.DataFrame(rows, columns=out_schema.names)

    return pairs.mapInPandas(est_pairs, schema=out_schema)


def kmv_overlap(
    df: DataFrame,
    hash_col: str,
    group_col: str,
    k: int = 128,
) -> DataFrame:
    """Pairwise distinct union / intersection / Jaccard estimates between
    groups via KMV set operations (sketches/kmv.py).

    Where ``hll_overlap`` gets the intersection only indirectly
    (inclusion-exclusion — the error of THREE estimates compounds), the
    k smallest hashes of A ∪ B are a uniform sample of the union, so the
    fraction landing in both sets estimates the Jaccard similarity
    DIRECTLY (Beyer et al. 2007 §4) with relative error ~1/sqrt(k·J).

    Every output is a pure function of the distinct-hash SETS (k-smallest
    selection + two correctly-rounded float ops), so the driver oracle
    hash-matches the estimates themselves — no error-bound gate needed.

    Scale shape: identical to hll_overlap — the distributed two-phase
    state build dominates (shuffle rows are ≤ 8k-byte sorted arrays, one
    per partition x group, row-count independent); pairing is a broadcast
    nested loop over the g-row state frame (bounded by group cardinality,
    never input rows); the estimator folds pairs of ≤k-long uint64 arrays
    in NumPy inside mapInPandas."""
    import pandas as pd
    from pyspark.sql import types as T

    from ..sketches.kmv import KmvSpec, kmv_estimate, kmv_intersect_stats

    spec = KmvSpec(k)
    states = sketch_agg(df, spec, hash_col, [group_col], output="state")
    gtype = states.schema[group_col].dataType
    a = states.select(
        F.col(group_col).alias("type_a"), F.col("minima").alias("__ma")
    )
    b = states.select(
        F.col(group_col).alias("type_b"), F.col("minima").alias("__mb")
    )
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    out_schema = T.StructType(
        [
            T.StructField("type_a", gtype),
            T.StructField("type_b", gtype),
            T.StructField("est_a", T.DoubleType()),
            T.StructField("est_b", T.DoubleType()),
            T.StructField("est_union", T.DoubleType()),
            T.StructField("jaccard", T.DoubleType()),
            T.StructField("est_intersect", T.DoubleType()),
        ]
    )

    def est_pairs(batches):
        for pdf in batches:
            rows = []
            for ta, tb, ma_b, mb_b in zip(
                pdf["type_a"], pdf["type_b"], pdf["__ma"], pdf["__mb"]
            ):
                ma = np.frombuffer(bytes(ma_b), dtype=np.uint64)
                mb = np.frombuffer(bytes(mb_b), dtype=np.uint64)
                ea = kmv_estimate(ma, k)
                eb = kmv_estimate(mb, k)
                eu, jac, ei = kmv_intersect_stats(ma, mb, k)
                rows.append((ta, tb, ea, eb, eu, jac, ei))
            yield pd.DataFrame(rows, columns=out_schema.names)

    return pairs.mapInPandas(est_pairs, schema=out_schema)


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    k: int = 64,
    group_by: Iterable[str] = (),
    weight_col: str | None = None,
) -> DataFrame:
    """Distributed Misra-Gries frequent items (sketches/mg.py MGSpec):
    one pass, O(k) state per group, no exact groupBy of the item space.
    Returns exploded rows (group..., item, est, n, err_bound) sorted
    within each group by est desc — where est <= true count <=
    est + n/(k+1) (and the tighter est + err_bound, the exact decrement
    actually applied on this run's merge path). Every item whose true
    count exceeds n/(k+1) is guaranteed to appear.

    Scale shape (10^12 rows, unbounded item cardinality): the map side
    folds each Arrow batch into a k-entry summary, so the shuffle carries
    one ~16k-byte state row per (partition x group) — never the items
    themselves. Use where vocab_topk's exact wordcount groupBy would
    shuffle the full item space."""
    from ..sketches.mg import MGSpec

    group_by = list(group_by)
    res = sketch_agg(df, MGSpec(k=k), item_col, group_by, weight_col)
    z = F.explode(F.arrays_zip(F.col("items"), F.col("ests"))).alias("z")
    return (
        res.select(*group_by, "n", "err_bound", z)
        .select(
            *group_by,
            F.col("z.items").alias("item"),
            F.col("z.ests").alias("est"),
            "n",
            "err_bound",
        )
    )
