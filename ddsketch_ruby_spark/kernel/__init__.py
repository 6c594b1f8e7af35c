"""Pure-NumPy sketch kernel (no Spark imports) — the exact-semantics core.

This package is the single source of truth for sketch math; the Spark layer
(ddsketch_ruby_spark.operators / .sketches) only moves these states around.
"""

from .errors import InvalidSketchMergeError, SketchError
from .mapping import (
    CubicallyInterpolatedKeyMapping,
    KeyMapping,
    LinearlyInterpolatedKeyMapping,
    LogarithmicKeyMapping,
    mapping_from_name,
)
from .sketch import DDSketch, DEFAULT_BIN_LIMIT, DEFAULT_REL_ACC
from .store import COLLAPSE_HIGHEST, COLLAPSE_LOWEST, DENSE, Store

__all__ = [
    "DDSketch",
    "Store",
    "KeyMapping",
    "LogarithmicKeyMapping",
    "LinearlyInterpolatedKeyMapping",
    "CubicallyInterpolatedKeyMapping",
    "mapping_from_name",
    "InvalidSketchMergeError",
    "SketchError",
    "DENSE",
    "COLLAPSE_LOWEST",
    "COLLAPSE_HIGHEST",
    "DEFAULT_REL_ACC",
    "DEFAULT_BIN_LIMIT",
]
