"""Hierarchical rollups over sketch STATES — the mergeability payoff.

Because every sketch is a commutative monoid, coarser aggregation levels
never need to rescan raw data: build states once at the finest grain, then
fold state rows upward (lang, source) -> (lang) -> (). At 100 TB this turns
an N-pass cube into one scan plus merges over kilobyte-sized rows.

``sketch_rollup`` returns one DataFrame per requested level;
``sketch_cube_union`` stacks them in a single DataFrame with NULLs for the
rolled-up dimensions (the SQL ROLLUP output shape).
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sketches.base import SketchSpec

__all__ = ["merge_states", "sketch_rollup", "sketch_cube_union"]


def merge_states(
    states: DataFrame,
    spec: SketchSpec,
    group_by: Iterable[str],
    output: str = "state",
) -> DataFrame:
    """Fold sketch-state rows to a coarser grouping (pure merges)."""
    group_by = list(group_by)
    state_names = [f.name for f in spec.state_fields()]
    by_name = {f.name: f for f in states.schema.fields}
    group_fields = [by_name[g] for g in group_by]
    if output == "state":
        out_schema = T.StructType(group_fields + spec.state_fields())
        emit = spec.state_to_row
    else:
        out_schema = T.StructType(group_fields + spec.result_fields())
        emit = spec.result

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        merged = spec.zero()
        cols = {n: pdf[n].to_numpy() for n in state_names}
        for i in range(len(pdf)):
            merged = spec.merge(
                merged, spec.row_to_state({n: cols[n][i] for n in state_names})
            )
        row: dict[str, Any] = {g: pdf[g].iloc[0] for g in group_by}
        row.update(emit(merged))
        return pd.DataFrame([row], columns=out_schema.names)

    if group_by:
        return states.groupBy(*group_by).applyInPandas(fold, schema=out_schema)
    return states.groupBy(F.lit(1).alias("__g")).applyInPandas(
        lambda pdf: fold(pdf.drop(columns=["__g"], errors="ignore")),
        schema=out_schema,
    )


def sketch_rollup(
    states: DataFrame,
    spec: SketchSpec,
    dims: list[str],
    output: str = "result",
) -> dict[tuple[str, ...], DataFrame]:
    """ROLLUP levels from finest-grain states: for dims [a, b, c] produces
    results for (a,b,c), (a,b), (a,), () — each level folded from the one
    below it is equivalent (associativity), but folding each from the
    finest keeps them independent / parallel."""
    out = {}
    for i in range(len(dims), -1, -1):
        level = tuple(dims[:i])
        out[level] = merge_states(states, spec, level, output=output)
    return out


def sketch_cube_union(
    states: DataFrame,
    spec: SketchSpec,
    dims: list[str],
    output: str = "result",
) -> DataFrame:
    """ROLLUP output as a single DataFrame, NULL-padding rolled-up dims."""
    levels = sketch_rollup(states, spec, dims, output=output)
    pieces = []
    for level, df in levels.items():
        missing = [d for d in dims if d not in level]
        for d in missing:
            df = df.withColumn(d, F.lit(None).cast("string"))
        pieces.append(df.select(*dims, *[c for c in df.columns if c not in dims]))
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out
