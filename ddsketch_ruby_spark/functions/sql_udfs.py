"""SQL-text surface over persisted sketch states.

``register_sketch_sql(spark)`` registers vectorized pandas UDFs so a table
of sketch-state rows (written by ddsketch_state / sketch_agg
output="state") can be queried from plain SQL:

    SELECT lang,
           ddsketch_q(0.99, gamma, pos_bins, pos_offset, neg_bins,
                      neg_offset, zero_count, count) AS p99
    FROM sketch_table

    SELECT hll_card(registers) FROM hll_table

The UDFs are Arrow-batched (one Python call per batch of groups), so
finalizing a million persisted group sketches is itself vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernel import DDSketch

__all__ = ["register_sketch_sql"]


def _sketch_from_arrays(
    gamma, pos_bins, pos_offset, neg_bins, neg_offset, zero_count, count
) -> DDSketch:
    rel_acc = (gamma - 1.0) / (gamma + 1.0)
    s = DDSketch(rel_acc)
    s.store.bins = np.asarray(pos_bins, dtype=np.float64)
    s.store.offset = int(pos_offset)
    s.store.count = float(s.store.bins.sum())
    s.negative_store.bins = np.asarray(neg_bins, dtype=np.float64)
    s.negative_store.offset = int(neg_offset)
    s.negative_store.count = float(s.negative_store.bins.sum())
    s.zero_count = float(zero_count)
    s.count = float(count)
    return s


def register_sketch_sql(spark: SparkSession) -> None:
    @pandas_udf(T.DoubleType())
    def ddsketch_q(
        q: pd.Series,
        gamma: pd.Series,
        pos_bins: pd.Series,
        pos_offset: pd.Series,
        neg_bins: pd.Series,
        neg_offset: pd.Series,
        zero_count: pd.Series,
        count: pd.Series,
    ) -> pd.Series:
        out = []
        for i in range(len(q)):
            s = _sketch_from_arrays(
                gamma.iloc[i],
                pos_bins.iloc[i],
                pos_offset.iloc[i],
                neg_bins.iloc[i],
                neg_offset.iloc[i],
                zero_count.iloc[i],
                count.iloc[i],
            )
            out.append(s.get_quantile_value(float(q.iloc[i])))
        return pd.Series(out, dtype="float64")

    @pandas_udf(T.DoubleType())
    def hll_card(registers: pd.Series) -> pd.Series:
        from ..sketches.hll import hll_estimate

        return pd.Series(
            [
                hll_estimate(np.frombuffer(bytes(r), dtype=np.uint8))
                for r in registers
            ],
            dtype="float64",
        )

    spark.udf.register("ddsketch_q", ddsketch_q)
    spark.udf.register("hll_card", hll_card)
