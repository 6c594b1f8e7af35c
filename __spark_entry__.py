"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship DDSketch query; each ``queries()[name]``
is checked against ``oracle_sql()[name]`` via DuckDB at sf=0.01.

Oracle strategy for quantiles: DDSketch with the logarithmic mapping is
fully SQL-expressible — key = CEIL(LOG2(v) * multiplier), histogram by key,
windowed cumulative count, first key whose running count exceeds
rank = q*(n-1), value = POWER(gamma, key) * 2/(1+gamma) (reference
base_sketch.rb:121-138, key_mapping.rb:69-82). The Spark side uses the
'pow' value formula so both engines execute the same libm operations;
outputs are rounded to 6 decimals on both sides.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# DDSketch constants for alpha = 0.01, logarithmic mapping — computed exactly
# as the kernel does (kernel/mapping.py) and inlined into the oracle SQL via
# repr() so both engines use the identical doubles.
ALPHA = 0.01
_GM = 2.0 * ALPHA / (1.0 - ALPHA)
GAMMA = 1.0 + _GM
MULT = (1.0 / math.log(_GM + 1.0)) * math.log(2.0)  # 1/log2(gamma)
COEFF = 2.0 / (1.0 + GAMMA)

_QS = {"q50": 0.5, "q95": 0.95, "q99": 0.99}


def _tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    from ddsketch_ruby_spark.sources.tables import table

    return [table(spark, sf_dir, n) for n in names]


def _ddsketch_oracle_sql(
    value_expr: str, table: str, group_cols: list[str], qs: dict[str, float]
) -> str:
    """DuckDB SQL replicating the DDSketch quantile pipeline exactly."""
    g = ", ".join(group_cols)
    g_comma = f"{g}, " if g else ""
    part = f"PARTITION BY {g} " if g else ""
    qvalues = ", ".join(f"('{name}', {q!r})" for name, q in qs.items())
    join_n = f"JOIN n USING ({g})" if g else "CROSS JOIN n"
    return f"""
WITH vals AS (
  SELECT {g_comma}CAST({value_expr} AS DOUBLE) AS v
  FROM {table} WHERE {value_expr} > 0
),
hist AS (
  SELECT {g_comma}CAST(CEIL(LOG2(v) * {MULT!r}) AS BIGINT) AS k,
         CAST(COUNT(*) AS DOUBLE) AS c
  FROM vals GROUP BY {g_comma}k
),
cum AS (
  SELECT {g_comma}k, SUM(c) OVER ({part}ORDER BY k) AS rc FROM hist
),
n AS (
  SELECT {g_comma}CAST(COUNT(*) AS DOUBLE) AS cnt FROM vals {("GROUP BY " + g) if g else ""}
),
qs(qname, q) AS (VALUES {qvalues}),
keys AS (
  SELECT {g_comma}qs.qname AS qname, MIN(cum.k) AS kq
  FROM qs CROSS JOIN cum {join_n}
  WHERE cum.rc > qs.q * (n.cnt - 1)
  GROUP BY {g_comma}qs.qname
)
SELECT {g_comma}qname, ROUND(POWER({GAMMA!r}, kq) * {COEFF!r}, 6) AS qvalue
FROM keys
"""


# ---------------------------------------------------------------------------
# queries


def _q_events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ddsketch_ruby_spark.operators.quantiles import ddsketch_quantiles_long

    (events,) = _tables(spark, sf_dir, "events")
    return ddsketch_quantiles_long(
        events.filter(F.col("value") > 0), "value", quantiles=_QS
    )


def _q_doclen_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ddsketch_ruby_spark.operators.quantiles import ddsketch_quantiles_long

    (docs,) = _tables(spark, sf_dir, "documents")
    return ddsketch_quantiles_long(
        docs.filter(F.col("n_chars") > 0), "n_chars", ["lang"], quantiles=_QS
    )


def _q_price_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ddsketch_ruby_spark.operators.quantiles import ddsketch_quantiles_long

    (li,) = _tables(spark, sf_dir, "lineitem")
    return ddsketch_quantiles_long(
        li.filter(F.col("l_extendedprice") > 0),
        "l_extendedprice",
        ["l_returnflag"],
        quantiles=_QS,
    )


def _q_sketch_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact side-stats carried by the sketch (base_sketch.rb:107-111) —
    DuckDB-verifiable against plain aggregates."""
    from ddsketch_ruby_spark.operators.quantiles import ddsketch_quantiles

    (events,) = _tables(spark, sf_dir, "events")
    res = ddsketch_quantiles(
        events.filter(F.col("value") > 0),
        "value",
        group_by=["event_type"],
        quantiles=(),
        include_stats=True,
    )
    return res.select(
        "event_type",
        F.col("count").alias("n_values"),
        F.round("sum", 3).alias("sum_value"),
        F.col("min").alias("min_value"),
        F.col("max").alias("max_value"),
        F.round("avg", 6).alias("avg_value"),
    )


def _q_exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ddsketch_ruby_spark.operators.dedup import exact_dedup

    (docs,) = _tables(spark, sf_dir, "documents")
    return exact_dedup(docs, key_cols=["text"], id_col="doc_id")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ddsketch_events_quantiles": _q_events_quantiles,
    "ddsketch_doclen_by_lang": _q_doclen_by_lang,
    "ddsketch_price_by_returnflag": _q_price_by_returnflag,
    "ddsketch_stats_events": _q_sketch_stats_events,
    "exact_dedup_documents": _q_exact_dedup_documents,
}

ORACLES: dict[str, str] = {
    "ddsketch_events_quantiles": _ddsketch_oracle_sql("value", "events", [], _QS),
    "ddsketch_doclen_by_lang": _ddsketch_oracle_sql(
        "n_chars", "documents", ["lang"], _QS
    ),
    "ddsketch_price_by_returnflag": _ddsketch_oracle_sql(
        "l_extendedprice", "lineitem", ["l_returnflag"], _QS
    ),
    "ddsketch_stats_events": """
SELECT event_type,
       CAST(COUNT(*) AS DOUBLE) AS n_values,
       ROUND(SUM(value), 3) AS sum_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value,
       ROUND(SUM(value) / COUNT(*), 6) AS avg_value
FROM events WHERE value > 0 GROUP BY event_type
""",
    "exact_dedup_documents": """
SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS dup_count
FROM documents GROUP BY text
""",
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: per-event-type DDSketch
    latency quantiles + exact stats in one pass."""
    from ddsketch_ruby_spark.operators.quantiles import ddsketch_quantiles
    from ddsketch_ruby_spark.sources.tables import table

    events = table(spark, "/root/testdata/sf0.001", "events")
    return ddsketch_quantiles(
        events, "value", group_by=["event_type"], quantiles=(0.5, 0.95, 0.99)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
