"""Drop-in API facade matching the reference library's class surface.

A user of DataDog/ddsketch-ruby drives three classes with keyword
constructors and add/get_quantile_value/merge/num_values/avg accessors
(reference lib/ddsketch/sketch.rb:8-17,
log_collapsing_lowest_dense_sketch.rb:10-20,
log_collapsing_highest_dense_sketch.rb:10-20). This module mirrors that
exact surface over the NumPy kernel so reference-shaped code ports by
changing only the import:

    from ddsketch_ruby_spark.compat import Sketch
    s = Sketch(relative_accuracy=0.02)
    s.add(1.2)
    s.merge(other)
    s.get_quantile_value(0.99)

Also exported: the mapping and error classes under their reference names,
and ``serialize_sketch`` (reference DDSketch::Proto.serialize_sketch,
proto.rb:18-25 — pass gamma_field="relative_accuracy" for gem-bit-compat
output including its gamma-field quirk).
"""

from __future__ import annotations

from .kernel import DDSketch as _DDSketch
from .kernel import InvalidSketchMergeError  # noqa: F401  (reference errors.rb)
from .kernel.mapping import (  # noqa: F401
    CubicallyInterpolatedKeyMapping,
    LinearlyInterpolatedKeyMapping,
    LogarithmicKeyMapping,
)
from .kernel.proto import deserialize_sketch, serialize_sketch  # noqa: F401

__all__ = [
    "Sketch",
    "LogCollapsingLowestDenseSketch",
    "LogCollapsingHighestDenseSketch",
    "InvalidSketchMergeError",
    "LogarithmicKeyMapping",
    "LinearlyInterpolatedKeyMapping",
    "CubicallyInterpolatedKeyMapping",
    "serialize_sketch",
    "deserialize_sketch",
]


class Sketch(_DDSketch):
    """reference Sketch: unbounded dense stores (sketch.rb:8-17)."""

    def __init__(self, relative_accuracy: float = 0.01):
        super().__init__(relative_accuracy, "dense")


class LogCollapsingLowestDenseSketch(_DDSketch):
    """reference LogCollapsingLowestDenseSketch (bounded memory, lossy low
    quantiles)."""

    def __init__(self, relative_accuracy: float = 0.01, bin_limit: int = 2048):
        super().__init__(relative_accuracy, "collapsing_lowest", bin_limit)


class LogCollapsingHighestDenseSketch(_DDSketch):
    """reference LogCollapsingHighestDenseSketch (bounded memory, lossy high
    quantiles)."""

    def __init__(self, relative_accuracy: float = 0.01, bin_limit: int = 2048):
        super().__init__(relative_accuracy, "collapsing_highest", bin_limit)
