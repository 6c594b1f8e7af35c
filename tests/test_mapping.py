"""Mapping accuracy sweep — port of reference
spec/support/shared_context_for_mapping.rb (5.1 in SURVEY.md)."""

import math

import numpy as np
import pytest

from ddsketch_ruby_spark.kernel import (
    CubicallyInterpolatedKeyMapping,
    LinearlyInterpolatedKeyMapping,
    LogarithmicKeyMapping,
)

MAPPINGS = [
    LogarithmicKeyMapping,
    LinearlyInterpolatedKeyMapping,
    CubicallyInterpolatedKeyMapping,
]

# rel-acc sweep: 1-1e-3 down to 1e-8 by factor (1 - sqrt(2)*0.1)
# (shared_context_for_mapping.rb:46-65)
_REL_ACCS = []
_ra = 1.0 - 1e-3
while _ra >= 1e-8:
    _REL_ACCS.append(_ra)
    _ra *= 1.0 - math.sqrt(2.0) * 1e-1


def _sweep_values(mapping) -> np.ndarray:
    """Values from min_possible to max_possible stepping by factor
    2 - sqrt(2)*0.1 (shared_context_for_mapping.rb:20-25), vectorized."""
    mult = 2.0 - math.sqrt(2.0) * 1e-1
    n = int(
        math.floor(
            (math.log(mapping.max_possible) - math.log(mapping.min_possible))
            / math.log(mult)
        )
    )
    exps = np.arange(1, n + 1, dtype=np.float64)
    vals = np.exp(math.log(mapping.min_possible) + exps * math.log(mult))
    vals = vals[(vals > mapping.min_possible) & (vals < mapping.max_possible)]
    return np.append(vals, mapping.max_possible)


@pytest.mark.parametrize("mapping_cls", MAPPINGS, ids=lambda c: c.__name__)
def test_mapping_round_trip_relative_accuracy(mapping_cls):
    for rel_acc in _REL_ACCS:
        m = mapping_cls(rel_acc)
        vals = _sweep_values(m)
        back = m.value_batch(m.key_batch(vals))
        rel_err = np.abs(back - vals) / vals
        worst = float(rel_err.max())
        assert worst < m.relative_accuracy, (
            f"{mapping_cls.__name__} rel_acc={rel_acc}: worst={worst}"
        )


@pytest.mark.parametrize("mapping_cls", MAPPINGS, ids=lambda c: c.__name__)
@pytest.mark.parametrize("offset", [0, 1, -12.23, 7768.3])
def test_mapping_offset(mapping_cls, offset):
    # mapping.key(1) == Integer(offset) (shared_context_for_mapping.rb:70-78)
    m = mapping_cls(0.01, offset=offset)
    assert m.key(1.0) == int(offset)


@pytest.mark.parametrize("mapping_cls", MAPPINGS, ids=lambda c: c.__name__)
@pytest.mark.parametrize("bad", [1.1, -0.1, 0.0, 1.0])
def test_mapping_ctor_validation(mapping_cls, bad):
    with pytest.raises(ValueError, match="must be between 0 and 1"):
        mapping_cls(bad)


@pytest.mark.parametrize("mapping_cls", MAPPINGS, ids=lambda c: c.__name__)
def test_scalar_matches_batch(mapping_cls):
    m = mapping_cls(0.02)
    vals = np.array([1e-6, 0.5, 1.0, 3.14159, 1e6, 1e100])
    keys = m.key_batch(vals)
    assert [m.key(v) for v in vals] == keys.tolist()
    back = m.value_batch(keys)
    assert [m.value(int(k)) for k in keys] == back.tolist()


def test_interpolation_tags():
    assert LogarithmicKeyMapping(0.01).interpolation is None
    assert LinearlyInterpolatedKeyMapping(0.01).interpolation == "linear"
    assert CubicallyInterpolatedKeyMapping(0.01).interpolation == "cubic"
