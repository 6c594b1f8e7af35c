"""Structured Streaming adapters for mergeable sketches.

The sketch state is an order-insensitive commutative monoid (reference
merge spec, shared_examples_for_sketch.rb:118-250), which makes it a valid
streaming state type: arbitrarily batched, late, or reordered data folds to
the same state.

Two shapes:

- sketch_stream_agg: per-group running sketch via
  ``applyInPandasWithState`` — each micro-batch folds its rows into the
  persisted state row and emits the current result (update mode).
- sketch_stream_windowed: event-time tumbling-window sketches with
  watermarked late-data handling — the state key is (group, window), so
  closed windows age out with the watermark.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sketches.base import SketchSpec

__all__ = ["sketch_stream_agg", "sketch_stream_windowed", "stream_exact_dedup"]


def stream_exact_dedup(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str | None = None,
    watermark: str = "1 hour",
    hash_key: bool = True,
) -> DataFrame:
    """Streaming exact dedup. With a timestamp column the dedup state is
    watermark-bounded (dropDuplicatesWithinWatermark — state ages out);
    without one it is global (state grows with distinct keys — use only
    for bounded key spaces). hash_key keeps the state at 8 bytes per key."""
    df = stream_df
    cols = list(key_cols)
    if hash_key:
        df = df.withColumn("__key", F.xxhash64(*key_cols))
        cols = ["__key"]
    if ts_col is not None:
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        out = df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(cols)
    else:
        out = df.dropDuplicates(cols)
    return out.drop("__key") if hash_key else out


def _plain(v: Any) -> Any:
    """GroupState tuples go through Pyrolite — numpy types must become
    plain Python values."""
    if isinstance(v, np.ndarray):
        return v.tolist()
    if isinstance(v, np.generic):
        return v.item()
    return v


def sketch_stream_agg(
    stream_df: DataFrame,
    spec: SketchSpec,
    value_col: str,
    group_by: Iterable[str],
    emit: str = "result",
) -> DataFrame:
    """Running per-group sketch over a stream; emits one updated row per
    group per micro-batch (outputMode="update")."""
    group_by = list(group_by)
    if not group_by:
        raise ValueError("stateful streaming aggregation requires group keys")
    by_name = {f.name: f for f in stream_df.schema.fields}
    group_fields = [by_name[g] for g in group_by]
    state_schema = T.StructType(spec.state_fields())
    if emit == "result":
        out_schema = T.StructType(group_fields + spec.result_fields())
        emit_fn = spec.result
    elif emit == "state":
        out_schema = T.StructType(group_fields + spec.state_fields())
        emit_fn = spec.state_to_row
    else:
        raise ValueError("emit must be 'result' or 'state'")
    state_names = [f.name for f in spec.state_fields()]

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            stored = dict(zip(state_names, state.get))
            sk = spec.row_to_state(stored)
        else:
            sk = spec.zero()
        for pdf in pdfs:
            vals = pdf[value_col].to_numpy()
            sk = spec.update(sk, vals)
        row = spec.state_to_row(sk)
        state.update(tuple(_plain(row[n]) for n in state_names))
        out = dict(zip(group_by, key))
        out.update(emit_fn(sk))
        yield pd.DataFrame([out], columns=out_schema.names)

    return (
        stream_df.select(*group_by, value_col)
        .groupBy(*group_by)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def sketch_stream_windowed(
    stream_df: DataFrame,
    spec: SketchSpec,
    value_col: str,
    ts_col: str,
    window: str = "1 minute",
    watermark: str = "5 minutes",
    group_by: Iterable[str] = (),
    emit: str = "result",
) -> DataFrame:
    """Tumbling event-time window sketches with a watermark: late rows
    within the watermark still merge (the monoid absorbs reordering);
    older state is dropped by Spark automatically."""
    group_by = list(group_by)
    # watermarks require TIMESTAMP (with zone); parquet often yields NTZ
    stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    windowed = (
        stream_df.withWatermark(ts_col, watermark)
        .select(
            F.window(ts_col, window).alias("win"),
            *group_by,
            value_col,
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_by,
            value_col,
        )
    )
    return sketch_stream_agg(
        windowed, spec, value_col, ["window_start", "window_end", *group_by], emit
    )
