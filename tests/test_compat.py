"""The compat facade runs reference-shaped code verbatim (module swap)."""

import pytest

from ddsketch_ruby_spark.compat import (
    InvalidSketchMergeError,
    LogCollapsingHighestDenseSketch,
    LogCollapsingLowestDenseSketch,
    Sketch,
    deserialize_sketch,
    serialize_sketch,
)


@pytest.mark.parametrize(
    "cls", [Sketch, LogCollapsingLowestDenseSketch, LogCollapsingHighestDenseSketch]
)
def test_reference_usage_shape(cls):
    # the README example of the reference gem, line for line
    sketch = cls(relative_accuracy=0.02) if cls is Sketch else cls(
        relative_accuracy=0.02, bin_limit=1024
    )
    for v in (1.0, 3.2, 2.4, 0.002, 5.6):
        sketch.add(v)
    sketch.add(1.0, 2.0)  # weighted
    assert sketch.num_values == 7.0
    assert sketch.count == 7.0
    assert sketch.min == 0.002 and sketch.max == 5.6
    assert sketch.avg == sketch.sum / sketch.count
    # weighted median is the 1.0 bucket (within alpha=0.02)
    q = sketch.get_quantile_value(0.5)
    assert abs(q - 1.0) <= 0.02 * 1.0 + 1e-15

    other = cls(relative_accuracy=0.02) if cls is Sketch else cls(
        relative_accuracy=0.02, bin_limit=1024
    )
    other.add(100.0)
    sketch.merge(other)
    assert sketch.num_values == 8.0

    mismatched = Sketch(relative_accuracy=0.1)
    with pytest.raises(InvalidSketchMergeError):
        sketch.merge(mismatched)


def test_compat_proto_round_trip():
    s = Sketch(relative_accuracy=0.05)
    s.add(42.0)
    back = deserialize_sketch(serialize_sketch(s))
    assert back.count == 1.0
