"""Sketch behavioral suite — port of reference
spec/support/shared_examples_for_sketch.rb (SURVEY.md 5.3), instantiated for
all three sketch classes at relative_accuracy=0.05 (bin_limit=1024 for the
collapsing variants), matching spec/ddsketch/sketch_spec.rb:4 and
log_collapsing_lowest_dense_sketch_spec.rb:4."""

import math
from collections import Counter

import numpy as np
import pytest

from ddsketch_ruby_spark.kernel import DDSketch, InvalidSketchMergeError

from . import datasets as ds

TEST_QUANTILES = [0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999, 1]
TEST_SIZES = [3, 5, 10, 100, 1000]
ALPHA = 0.05

SKETCH_FACTORIES = {
    "dense": lambda a=ALPHA: DDSketch.unbounded(a),
    "collapsing_lowest": lambda a=ALPHA: DDSketch.collapsing_lowest(a, 1024),
    "collapsing_highest": lambda a=ALPHA: DDSketch.collapsing_highest(a, 1024),
}


def assert_accuracy(sketch: DDSketch, data: list[float], alpha: float = ALPHA):
    """|q_hat - q| - alpha*|q| <= 1e-15 (custom_sketch_matchers.rb:1-13)."""
    for q in TEST_QUANTILES:
        got = sketch.get_quantile_value(q)
        want = ds.exact_quantile(data, q)
        err = abs(got - want)
        assert err - alpha * abs(want) <= 1e-15, (
            f"q={q}: sketch={got} exact={want} err={err}"
        )


def assert_summary(sketch: DDSketch, data: list[float]):
    assert sketch.num_values == len(data)
    total = math.fsum(data)
    assert abs(sketch.sum - total) <= 1e-3
    assert abs(sketch.avg - total / len(data)) <= 1e-3


@pytest.mark.parametrize("factory", SKETCH_FACTORIES.values(), ids=SKETCH_FACTORIES)
@pytest.mark.parametrize("name", ds.DETERMINISTIC, ids=ds.DETERMINISTIC)
@pytest.mark.parametrize("size", TEST_SIZES)
def test_add_deterministic_datasets(factory, name, size):
    data = ds.DETERMINISTIC[name](size)
    sketch = factory()
    sketch.add_batch(np.array(data))
    assert_summary(sketch, data)
    assert_accuracy(sketch, data)


@pytest.mark.parametrize("factory", SKETCH_FACTORIES.values(), ids=SKETCH_FACTORIES)
@pytest.mark.parametrize("name", ds.FROZEN, ids=ds.FROZEN)
def test_add_frozen_datasets(factory, name):
    data = ds.FROZEN[name]()
    sketch = factory()
    sketch.add_batch(np.array(data))
    assert_summary(sketch, data)
    assert_accuracy(sketch, data)


@pytest.mark.parametrize("factory", SKETCH_FACTORIES.values(), ids=SKETCH_FACTORIES)
def test_one_at_a_time_equals_batch(factory):
    data = ds.lognormal(500)
    a = factory()
    for v in data:
        a.add(v)
    b = factory()
    b.add_batch(np.array(data))
    assert a.store.key_counts() == b.store.key_counts()
    assert a.negative_store.key_counts() == b.negative_store.key_counts()
    assert a.zero_count == b.zero_count
    assert a.count == b.count
    for q in TEST_QUANTILES:
        assert a.get_quantile_value(q) == b.get_quantile_value(q)


@pytest.mark.parametrize("factory", SKETCH_FACTORIES.values(), ids=SKETCH_FACTORIES)
def test_weighted_add_integer_equivalence(factory):
    # shared_examples_for_sketch.rb:63-83
    data = ds.integers(1000)
    counter = Counter(data)
    sketch = factory()
    for value, count in counter.items():
        sketch.add(value, float(count))
    assert_summary(sketch, data)
    assert_accuracy(sketch, data)


@pytest.mark.parametrize("factory", SKETCH_FACTORIES.values(), ids=SKETCH_FACTORIES)
def test_weighted_add_fractional(factory):
    # shared_examples_for_sketch.rb:85-103
    sketch = factory()
    for value in range(100):
        sketch.add(float(value), 1.1)
    sketch.add(100.0, 110.0)

    data_median = 99.0
    err = abs(sketch.get_quantile_value(0.5) - data_median)
    assert err - ALPHA * data_median <= 1e-15
    assert abs(sketch.count - 220.0) <= 1e-3
    assert abs(sketch.sum - 16445.0) <= 1e-3
    assert abs(sketch.avg - 74.75) <= 1e-3


@pytest.mark.parametrize("factory", SKETCH_FACTORIES.values(), ids=SKETCH_FACTORIES)
def test_nonpositive_weight_raises(factory):
    sketch = factory()
    with pytest.raises(ValueError, match="must be positive"):
        sketch.add(0.0, 0.0)
    with pytest.raises(ValueError, match="must be positive"):
        sketch.add_batch(np.array([1.0, 2.0]), np.array([1.0, -1.0]))


@pytest.mark.parametrize("factory", SKETCH_FACTORIES.values(), ids=SKETCH_FACTORIES)
@pytest.mark.parametrize("size", TEST_SIZES)
def test_merge_equal(factory, size):
    # four Normal batches merged sequentially (shared_examples:118-146)
    parameters = [(35, 1), (1, 3), (15, 2), (40, 0.5)]
    pooled: list[float] = []
    target = factory()
    rng = np.random.default_rng(42)
    for loc, scale in parameters:
        batch = rng.normal(loc, scale, size).tolist()
        sketch = factory()
        sketch.add_batch(np.array(batch))
        pooled.extend(batch)
        target.merge(sketch)
        assert_summary(target, pooled)
        assert_accuracy(target, pooled)


@pytest.mark.parametrize("factory", SKETCH_FACTORIES.values(), ids=SKETCH_FACTORIES)
def test_merge_unequal(factory):
    # random 70/30 split of Lognormal (shared_examples:148-172)
    data = ds.lognormal()
    rng = np.random.default_rng(7)
    mask = rng.random(len(data)) > 0.7
    arr = np.array(data)
    sketch = factory()
    other = factory()
    sketch.add_batch(arr[mask])
    other.add_batch(arr[~mask])
    sketch.merge(other)
    assert_summary(sketch, data)
    assert_accuracy(sketch, data)


@pytest.mark.parametrize("factory", SKETCH_FACTORIES.values(), ids=SKETCH_FACTORIES)
def test_merge_mixed(factory):
    # shared_examples:174-201
    pooled: list[float] = []
    sketch = factory()
    for batch in (ds.normal(100), ds.exponential(), ds.laplace(), ds.bimodal()):
        other = factory()
        other.add_batch(np.array(batch))
        pooled.extend(batch)
        sketch.merge(other)
    assert_summary(sketch, pooled)
    assert_accuracy(sketch, pooled)


@pytest.mark.parametrize("factory", SKETCH_FACTORIES.values(), ids=SKETCH_FACTORIES)
def test_consistent_merge(factory):
    # isolation: merge must not alias state (shared_examples:203-250)
    rng = np.random.default_rng(42)
    sketch1 = factory()
    sketch2 = factory()
    sketch1.add_batch(rng.normal(37.4, 1.0, 100))
    sketch1.merge(sketch2)
    assert sketch2.num_values == 0

    sketch2.add_batch(rng.normal(37.4, 1.0, 50))
    s2_quantiles = [sketch2.get_quantile_value(q) for q in TEST_QUANTILES]
    s2_stats = (sketch2.sum, sketch2.avg, sketch2.num_values)

    sketch1.merge(sketch2)
    sketch1.add_batch(rng.normal(37.4, 1.0, 100))

    # changes to sketch1 must not affect sketch2 after merge
    for q, expected in zip(TEST_QUANTILES, s2_quantiles):
        assert abs(sketch2.get_quantile_value(q) - expected) <= 1e-3
    assert abs(sketch2.sum - s2_stats[0]) <= 1e-3
    assert abs(sketch2.avg - s2_stats[1]) <= 1e-3
    assert sketch2.num_values == s2_stats[2]

    # merging into an empty sketch must not change the source
    sketch3 = factory()
    sketch3.merge(sketch2)
    sketch3.add_batch(rng.normal(0.0, 1.0, 10))
    for q, expected in zip(TEST_QUANTILES, s2_quantiles):
        assert abs(sketch2.get_quantile_value(q) - expected) <= 1e-3
    assert sketch2.num_values == s2_stats[2]


@pytest.mark.parametrize("factory", SKETCH_FACTORIES.values(), ids=SKETCH_FACTORIES)
def test_gamma_mismatch_raises(factory):
    a = DDSketch.unbounded(0.1)
    b = DDSketch.unbounded(0.2)
    with pytest.raises(
        InvalidSketchMergeError,
        match="Cannot merge two sketches with different relative accuracy",
    ):
        a.merge(b)


def test_quantile_out_of_range_and_empty():
    sketch = DDSketch.unbounded(0.05)
    assert sketch.get_quantile_value(0.5) is None  # empty
    sketch.add(1.0)
    assert sketch.get_quantile_value(-0.1) is None
    assert sketch.get_quantile_value(1.1) is None
    assert sketch.get_quantile_value(0.5) is not None


def test_zero_band_and_negative_routing():
    sketch = DDSketch.unbounded(0.05)
    sketch.add_batch(np.array([-5.0, -1.0, 0.0, 0.0, 1.0, 5.0]))
    assert sketch.zero_count == 2.0
    assert sketch.negative_store.count == 2.0
    assert sketch.store.count == 2.0
    assert sketch.min == -5.0 and sketch.max == 5.0
    # median of [-5,-1,0,0,1,5]: rank = 0.5*5 = 2.5 -> zero zone
    assert sketch.get_quantile_value(0.5) == 0.0


def test_merge_associativity_commutativity():
    """Monoid laws on random partition splits — legality basis for Spark
    partial aggregation and tree merges (SURVEY.md 3.3)."""
    data = np.array(ds.lognormal(900))
    parts = np.array_split(data, 9)

    def build(chunks):
        out = DDSketch.unbounded(0.01)
        for c in chunks:
            s = DDSketch.unbounded(0.01)
            s.add_batch(c)
            out.merge(s)
        return out

    fwd = build(parts)
    rev = build(list(reversed(parts)))
    # tree-shaped merge
    sketches = []
    for c in parts:
        s = DDSketch.unbounded(0.01)
        s.add_batch(c)
        sketches.append(s)
    while len(sketches) > 1:
        nxt = []
        for i in range(0, len(sketches) - 1, 2):
            sketches[i].merge(sketches[i + 1])
            nxt.append(sketches[i])
        if len(sketches) % 2:
            nxt.append(sketches[-1])
        sketches = nxt
    tree = sketches[0]

    for a in (rev, tree):
        assert a.store.key_counts() == fwd.store.key_counts()
        assert a.count == fwd.count
        for q in TEST_QUANTILES:
            assert a.get_quantile_value(q) == fwd.get_quantile_value(q)
