"""JVM fast path for DDSketch aggregation (all three key mappings).

The insight: the sketch's bucket key is a closed-form expression — for the
logarithmic mapping ``ceil(log2(|v|) * multiplier)``, and for the linearly /
cubically interpolated mappings a polynomial of the exact (significand,
exponent) decomposition — so the entire histogram build can run inside
whole-stage codegen:

    groupBy(group, zone, key).agg(sum(w), sum(v*w), min(v), max(v))

Tungsten's hash aggregate does map-side partial aggregation, the shuffle
carries only distinct (group, zone, key) rows (bounded by the bucket count,
~2*bin_limit per group — independent of input rows), and Python touches
nothing until the final assembly of a few-thousand-row histogram into bin
arrays. Compared to shipping raw rows through Arrow into pandas UDFs this
removes the Python boundary from the hot path entirely — the job becomes
scan-bound and scales like any native Spark aggregation.

Collapsing-store semantics are applied at assembly time: clamping every key
to [max_key - bin_limit + 1, ...] is exactly the reference's
order-insensitive collapse contract (see kernel/store.py derivation), so
assembling after a full groupBy is legal.

Numerics: Spark's LOG2 computes ln(v)/ln(2) — an oracle must mirror that
exact expression (LN(v)/LN(2)) to be bit-compatible; NumPy's log2 (used by
the kernel/python path) can differ in the last ulp on bucket boundaries.
Both paths satisfy the alpha accuracy contract; tests compare them at the
quantile level, not the bin level.

Interpolated mappings (reference linear_interpolated_key_mapping.rb:35-49,
cubically_interpolated_key_mapping.rb:10-67) need ``frexp`` — unavailable
in SQL, but recoverable EXACTLY: guess e = floor(log2(v)) (any log2, even
one off by an ulp), then correct it by comparing v against 2^e, giving the
true binade exponent; the significand v / 2^e - 1 is then exact because
scaling by a power of two and subtracting 1 are exact float ops. Every
remaining op (polynomial in the significand, + exponent, * multiplier,
ceil) is the identical IEEE-754 operation sequence the NumPy kernel runs,
so JVM keys are bit-identical to kernel keys — verified bin-for-bin in
tests/test_spark_ddsketch.py — and a DuckDB oracle can replicate them.
"""

from __future__ import annotations

from typing import Any, Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernel import DDSketch
from ..sketches.ddsketch_spec import DDSketchSpec

__all__ = ["ddsketch_jvm_agg", "key_column", "histogram_rows", "assemble_histogram"]


def _exact_exponent(v):
    """Exact binade exponent e with 2^e <= v < 2^(e+1), as a LONG column.

    floor(log2(v)) from any libm log2 can be off by one near powers of two;
    comparing v against 2^(guess) repairs it. v must be positive, normal.
    """
    eg = F.floor(F.log2(v))
    p = F.pow(F.lit(2.0), eg.cast("double"))
    return (
        F.when(p > v, eg - F.lit(1))
        .when(v / p >= F.lit(2.0), eg + F.lit(1))
        .otherwise(eg)
    )


def key_column(mapping, v):
    """Bucket key of positive column ``v`` under ``mapping``, bit-identical
    to ``kernel.mapping.KeyMapping.key_batch`` (LONG column).

    Fractional offsets (reference spec sweeps {-12.23, 7768.3},
    shared_context_for_mapping.rb:70-78) reproduce Ruby ``Integer()`` —
    truncation toward zero — via a double add then CAST(double AS LONG),
    which Spark defines as truncate-toward-zero: the identical IEEE op
    order as the kernel's ``trunc(ceil(log_gamma(v)) + offset)``
    (kernel/mapping.py:68-73, key_mapping.rb:69-71).
    """
    mult = mapping._multiplier
    if mapping.interpolation is None:  # logarithmic
        raw = F.ceil(F.log2(v) * F.lit(mult))
    else:
        e = _exact_exponent(v)
        ed = e.cast("double")
        # s = v/2^e - 1 in [0, 1): exact (power-of-two scaling is exact)
        s = v / F.pow(F.lit(2.0), ed) - F.lit(1.0)
        if mapping.interpolation == "linear":
            approx = s + ed
        else:  # cubic polynomial, same op order as the kernel
            A, B, C = mapping._A, mapping._B, mapping._C
            approx = ((F.lit(A) * s + F.lit(B)) * s + F.lit(C)) * s + ed
        raw = F.ceil(approx * F.lit(mult))
    if mapping.offset == int(mapping.offset):
        # integral offset: stay in exact LONG arithmetic
        return raw + F.lit(int(mapping.offset))
    # ceil-as-long -> double is exact for |key| < 2^53
    return (raw.cast("double") + F.lit(float(mapping.offset))).cast("long")


def _histogram(
    df: DataFrame,
    spec: DDSketchSpec,
    value_col: str,
    group_by: list[str],
    weight_col: str | None,
) -> DataFrame:
    mapping = spec.zero().mapping
    mp = mapping.min_possible

    v = F.col(value_col).cast("double")
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    src = df.where(v.isNotNull() & ~F.isnan(v))
    zone = (
        F.when(v > F.lit(mp), F.lit(1))
        .when(v < F.lit(-mp), F.lit(-1))
        .otherwise(F.lit(0))
    )
    key = F.when(zone == 0, F.lit(0).cast("long")).otherwise(
        key_column(mapping, F.abs(v))
    )
    return src.groupBy(
        *group_by, zone.alias("__zone"), key.alias("__key")
    ).agg(
        F.sum(w).alias("__cnt"),
        F.sum(v * w).alias("__svw"),
        F.min(v).alias("__minv"),
        F.max(v).alias("__maxv"),
    )


def _assemble_state(spec: DDSketchSpec, pdf: pd.DataFrame) -> DDSketch:
    """(zone, key, cnt, svw, minv, maxv) rows -> kernel sketch state."""
    s = spec.zero()
    zones = pdf["__zone"].to_numpy()
    keys = pdf["__key"].to_numpy().astype(np.int64)
    cnts = pdf["__cnt"].to_numpy().astype(np.float64)
    for zone, store in ((1, s.store), (-1, s.negative_store)):
        m = zones == zone
        if m.any():
            store.add_batch(keys[m], cnts[m])
    zm = zones == 0
    s.zero_count = float(cnts[zm].sum()) if zm.any() else 0.0
    s.count = float(cnts.sum())
    s.sum = float(pdf["__svw"].to_numpy().sum())
    s.min = float(pdf["__minv"].to_numpy().min())
    s.max = float(pdf["__maxv"].to_numpy().max())
    return s


def histogram_rows(
    df: DataFrame,
    spec: DDSketchSpec,
    value_col: str,
    group_by: Iterable[str] = (),
    weight_col: str | None = None,
) -> DataFrame:
    """The raw bucket-histogram rows (group..., __zone, __key, __cnt,
    __svw, __minv, __maxv) — the sketch's shuffle-time representation.
    Exposed so streaming queries can run the same JVM aggregation and
    assemble sketches downstream (streaming/sketch_stream.py)."""
    return _histogram(df, spec, value_col, list(group_by), weight_col)


def assemble_histogram(
    hist: DataFrame,
    spec: DDSketchSpec,
    group_by: Iterable[str] = (),
    output: str = "result",
) -> DataFrame:
    """Fold histogram_rows output into one sketch row per group. Correct
    over PARTIAL histograms too (duplicate (group, zone, key) rows just
    re-merge — bucket addition is the monoid op)."""
    group_by = list(group_by)
    by_name = {f.name: f for f in hist.schema.fields}
    group_fields = [by_name[g] for g in group_by]
    if output == "state":
        out_schema = T.StructType(group_fields + spec.state_fields())
        emit = spec.state_to_row
    elif output == "result":
        out_schema = T.StructType(group_fields + spec.result_fields())
        emit = spec.result
    else:
        raise ValueError("output must be 'result' or 'state'")

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        state = _assemble_state(spec, pdf)
        row: dict[str, Any] = {g: pdf[g].iloc[0] for g in group_by}
        row.update(emit(state))
        return pd.DataFrame([row], columns=out_schema.names)

    if group_by:
        return hist.groupBy(*group_by).applyInPandas(assemble, schema=out_schema)
    return hist.groupBy(F.lit(1).alias("__g")).applyInPandas(
        lambda pdf: assemble(pdf.drop(columns=["__g"], errors="ignore")),
        schema=out_schema,
    )


def ddsketch_jvm_agg(
    df: DataFrame,
    spec: DDSketchSpec,
    value_col: str,
    group_by: Iterable[str] = (),
    weight_col: str | None = None,
    output: str = "result",
) -> DataFrame:
    """JVM-histogram DDSketch aggregation; same output contract as
    operators.agg.sketch_agg with a DDSketchSpec."""
    group_by = list(group_by)
    hist = _histogram(df, spec, value_col, group_by, weight_col)
    return assemble_histogram(hist, spec, group_by, output)
