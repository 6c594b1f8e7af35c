"""Deterministic weighted sampling for training-data selection.

``weighted_sample`` implements sequential Poisson sampling (Ohlsson 1998,
"Sequential Poisson Sampling", J. Official Statistics 14(2)): each row
gets the priority key xi = u / w where u is uniform(0,1) and w the row's
positive weight; the k smallest keys form an (approximately
probability-proportional-to-size, without-replacement) sample. The method
is order-free — xi depends only on (id, weight) — so the selected set is
partitioning-invariant, resumable, and replayable by an oracle.

Determinism: u is derived from ``xxhash64(id)`` (JVM-side, whole-stage
codegen) by masking the low 53 bits and scaling by 2^-53 — a dyadic
rational that every IEEE-754 engine represents exactly; xi = u / w is a
single correctly-rounded double division, so Spark and any SQL oracle
compute bit-identical keys (no RNG state, no seed files).

Scale shape (10^12 rows): the key is a scan-level expression. Selection
runs on a THIN projection — (strata, id, xi) only, ~24 B/row — and the
full payload rejoins via a semi-join on the selected ids, so the sort /
window shuffle never carries document text:

- global (``strata=None``): ``orderBy(xi).limit(k)`` plans as
  TakeOrderedAndProject — per-partition partial top-k, then a k-row
  final reduction on the driver-side single partition. No full sort.
- stratified: one hash shuffle of the thin rows by the strata columns
  into a partitioned window (row_number <= k). A hot stratum holds its
  own rows only; with millions of strata the window parallelizes on the
  strata hash. (A bare unpartitioned window is never planned.)

The weight column must be positive; rows with NULL or non-positive
weight are excluded (a zero-weight unit has inclusion probability 0
under pps semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["weighted_sample", "sample_key", "hash_split"]

_MASK53 = (1 << 53) - 1
_INV53 = 2.0**-53  # exact power of two


def sample_key(id_col: str, weight_col: str, seed: int = 0) -> F.Column:
    """The sequential-Poisson priority key xi = u(id) / weight as a JVM
    column expression. ``seed`` variants chain the seed long into the
    hash (Spark's multi-arg xxhash64 folds arguments left-to-right, each
    fully-finalized hash seeding the next — replayable in SQL via the
    seeded-chain oracle helpers)."""
    if seed:
        h = F.xxhash64(F.lit(seed).cast("long"), F.col(id_col))
    else:
        h = F.xxhash64(F.col(id_col))
    u = h.bitwiseAND(F.lit(_MASK53)).cast("double") * F.lit(_INV53)
    return u / F.col(weight_col).cast("double")


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    strata: list[str] | None = None,
    seed: int = 0,
    key_name: str = "sample_key",
) -> DataFrame:
    """Select k rows (per stratum) by sequential Poisson sampling.

    Returns the original columns plus ``key_name`` (the xi priority,
    ties broken by id — both orderings total and deterministic).

    Parameters
    ----------
    id_col : unique row identifier (hashed for the uniform draw).
    weight_col : positive size/weight column; inclusion probability is
        approximately proportional to it.
    k : sample size (per stratum when ``strata`` is given).
    strata : optional stratification columns — k rows from EACH group.
    seed : replicate selector; different seeds give independent samples.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    eligible = df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
    keyed = eligible.withColumn(key_name, sample_key(id_col, weight_col, seed))
    if not strata:
        # TakeOrderedAndProject: partial per-partition top-k, k-row final.
        return keyed.orderBy(key_name, id_col).limit(k)
    # Thin selection frame; payload rejoins via semi-join on winners.
    thin = keyed.select(*strata, id_col, key_name)
    w = Window.partitionBy(*strata).orderBy(key_name, id_col)
    winners = (
        thin.withColumn("__sp_rn", F.row_number().over(w))
        .filter(F.col("__sp_rn") <= k)
        .select(id_col)
    )
    return keyed.join(winners, on=id_col, how="left_semi")


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row lands in one
    named split with probability proportional to its weight, decided by
    the row's OWN id — u = dyadic 53-bit uniform of xxhash64(id) compared
    against the cumulative weight thresholds. Assignment is a pure
    function of (id, weights, seed): partitioning-invariant, stable
    across reruns and cluster sizes, and rows ADDED to the corpus later
    never reshuffle existing rows between splits (the property random()
    splits lack — this is how training pipelines keep eval sets frozen
    while the corpus grows).

    ``weights`` maps split name -> positive weight (normalized
    internally). The uniform and the thresholds are exact doubles, so
    any IEEE SQL engine replays the assignment bit-identically.

    Scale shape: one scan-level JVM expression — no shuffle, no state,
    no sampling pass. The hash subtree is bound to a real column first
    so the threshold CASE references it once (never a re-evaluated
    subtree per branch)."""
    if not weights:
        raise ValueError("weights must be a non-empty {name: weight} dict")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("split weights must be positive")
    total = float(sum(weights.values()))
    names = list(weights)
    if seed:
        h = F.xxhash64(F.lit(seed).cast("long"), F.col(id_col))
    else:
        h = F.xxhash64(F.col(id_col))
    u = h.bitwiseAND(F.lit(_MASK53)).cast("double") * F.lit(_INV53)
    tagged = df.withColumn("__u", u)
    expr = F.lit(names[-1])
    cum = 0.0
    conds = []
    for name in names[:-1]:
        cum += weights[name] / total
        conds.append((name, cum))
    for name, threshold in reversed(conds):
        expr = F.when(F.col("__u") < F.lit(threshold), F.lit(name)).otherwise(
            expr
        )
    return tagged.withColumn(split_col, expr).drop("__u")
