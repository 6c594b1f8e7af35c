"""Store exact-bookkeeping tests — port of reference
spec/ddsketch/store/*_spec.rb (SURVEY.md 5.2, FIXTURES.md 3-4)."""

from collections import Counter

import numpy as np
import pytest

from ddsketch_ruby_spark.kernel import COLLAPSE_HIGHEST, COLLAPSE_LOWEST, Store

EXTREME_MAX = 2**63 - 1
EXTREME_MIN = -(2**63)
BIN_LIMITS = [1, 20, 1000]

ADD_SEQUENCES = [
    [0] * 100,
    list(range(100)),
    list(reversed(range(100))),
    [2**x for x in range(10)],
    [2**x for x in reversed(range(16))],
    [i + 1 for i in range(9) for _ in range(2 * (i + 1))],
    [-(i + 1) for i in range(9) for _ in range(2 * (i + 1))],
]

EXTREME_SEQUENCES = [
    [EXTREME_MAX],
    [EXTREME_MIN],
    [0, EXTREME_MIN],
    [0, EXTREME_MAX],
    [EXTREME_MIN, EXTREME_MAX],
    [EXTREME_MAX, EXTREME_MIN],
]

MERGE_LISTS = [
    [[-10000], [10000]],
    [[10000], [-10000]],
    [[10000], [-10000], [0]],
    [[10000, 0], [-10000], [0]],
    [[2, 2], [2, 2, 2], [2]],
    [[-8, -8], [-8]],
]

EXTREME_MERGE_LISTS = [
    [[0], [EXTREME_MIN]],
    [[0], [EXTREME_MAX]],
    [[EXTREME_MIN], [0]],
    [[EXTREME_MAX], [0]],
    [[EXTREME_MIN], [EXTREME_MIN]],
    [[EXTREME_MAX], [EXTREME_MAX]],
    [[EXTREME_MIN], [EXTREME_MAX]],
    [[EXTREME_MAX], [EXTREME_MIN]],
    [[0], [EXTREME_MIN, EXTREME_MAX]],
    [[EXTREME_MIN, EXTREME_MAX], [0]],
]


def _assert_bins_match(store: Store, values: list[int]) -> None:
    """Every nonzero bin equals the multiset count of its key
    (custom_store_matchers.rb:1-11)."""
    counter = Counter(values)
    for key, ct in store.key_counts().items():
        assert ct == counter[key], f"key {key}: bin={ct} expected={counter[key]}"
    assert store.bins.sum() == len(values)


def _clamp_lowest(values: list[int], bin_limit: int) -> list[int]:
    floor = max(values) - bin_limit + 1
    return [max(floor, v) for v in values]


def _clamp_highest(values: list[int], bin_limit: int) -> list[int]:
    ceil = min(values) + bin_limit - 1
    return [min(ceil, v) for v in values]


def _fill(store: Store, values: list[int], one_at_a_time: bool) -> None:
    if one_at_a_time:
        for v in values:
            store.add(v)
    else:
        store.add_batch(np.array(values, dtype=np.int64))


@pytest.mark.parametrize("one_at_a_time", [True, False])
@pytest.mark.parametrize("values", ADD_SEQUENCES, ids=range(len(ADD_SEQUENCES)))
def test_dense_add(values, one_at_a_time):
    store = Store()
    _fill(store, values, one_at_a_time)
    _assert_bins_match(store, values)


@pytest.mark.parametrize("list_values", MERGE_LISTS, ids=range(len(MERGE_LISTS)))
def test_dense_merge(list_values):
    store = Store()
    for values in list_values:
        other = Store()
        _fill(other, values, one_at_a_time=True)
        store.merge(other)
    flat = [v for vs in list_values for v in vs]
    _assert_bins_match(store, flat)


def test_dense_key_at_rank():
    # dense_store_spec.rb:59-79
    store = Store()
    for k in (4, 10, 100):
        store.add(k)
    assert store.key_at_rank(0) == 4
    assert store.key_at_rank(1) == 10
    assert store.key_at_rank(2) == 100
    assert store.key_at_rank(0, False) == 4
    assert store.key_at_rank(1, False) == 10
    assert store.key_at_rank(2, False) == 100
    assert store.key_at_rank(0.5) == 4
    assert store.key_at_rank(1.5) == 10
    assert store.key_at_rank(2.5) == 100
    assert store.key_at_rank(-0.5, False) == 4
    assert store.key_at_rank(0.5, False) == 10
    assert store.key_at_rank(1.5, False) == 100


@pytest.mark.parametrize("one_at_a_time", [True, False])
@pytest.mark.parametrize("bin_limit", BIN_LIMITS)
@pytest.mark.parametrize(
    "values",
    ADD_SEQUENCES + EXTREME_SEQUENCES,
    ids=range(len(ADD_SEQUENCES) + len(EXTREME_SEQUENCES)),
)
def test_collapsing_lowest_add(values, bin_limit, one_at_a_time):
    store = Store(COLLAPSE_LOWEST, bin_limit)
    _fill(store, values, one_at_a_time)
    _assert_bins_match(store, _clamp_lowest(values, bin_limit))


@pytest.mark.parametrize("bin_limit", BIN_LIMITS)
@pytest.mark.parametrize(
    "list_values",
    MERGE_LISTS + EXTREME_MERGE_LISTS,
    ids=range(len(MERGE_LISTS) + len(EXTREME_MERGE_LISTS)),
)
def test_collapsing_lowest_merge(list_values, bin_limit):
    store = Store(COLLAPSE_LOWEST, bin_limit)
    for values in list_values:
        other = Store(COLLAPSE_LOWEST, bin_limit)
        _fill(other, values, one_at_a_time=True)
        store.merge(other)
    flat = [v for vs in list_values for v in vs]
    _assert_bins_match(store, _clamp_lowest(flat, bin_limit))


@pytest.mark.parametrize("one_at_a_time", [True, False])
@pytest.mark.parametrize("bin_limit", BIN_LIMITS)
@pytest.mark.parametrize(
    "values",
    ADD_SEQUENCES + EXTREME_SEQUENCES,
    ids=range(len(ADD_SEQUENCES) + len(EXTREME_SEQUENCES)),
)
def test_collapsing_highest_add(values, bin_limit, one_at_a_time):
    store = Store(COLLAPSE_HIGHEST, bin_limit)
    _fill(store, values, one_at_a_time)
    _assert_bins_match(store, _clamp_highest(values, bin_limit))


@pytest.mark.parametrize("bin_limit", BIN_LIMITS)
@pytest.mark.parametrize(
    "list_values",
    MERGE_LISTS + EXTREME_MERGE_LISTS,
    ids=range(len(MERGE_LISTS) + len(EXTREME_MERGE_LISTS)),
)
def test_collapsing_highest_merge(list_values, bin_limit):
    store = Store(COLLAPSE_HIGHEST, bin_limit)
    for values in list_values:
        other = Store(COLLAPSE_HIGHEST, bin_limit)
        _fill(other, values, one_at_a_time=True)
        store.merge(other)
    flat = [v for vs in list_values for v in vs]
    _assert_bins_match(store, _clamp_highest(flat, bin_limit))


def test_copy_semantics():
    # collapsing_lowest_dense_store_spec.rb:92-111
    empty = Store(COLLAPSE_LOWEST, 10)
    assert empty.copy().count == 0
    src = Store(COLLAPSE_LOWEST, 10)
    src.add(0)
    dup = src.copy()
    assert dup.count == 1
    dup.add(5)
    assert src.count == 1  # no aliasing


def test_weighted_add():
    store = Store()
    store.add_batch(
        np.array([3, 3, 7], dtype=np.int64), np.array([0.5, 1.5, 2.0])
    )
    assert store.key_counts() == {3: 2.0, 7: 2.0}
    assert store.count == 4.0


def test_merge_into_empty_copies():
    src = Store()
    src.add(42)
    dst = Store()
    dst.merge(src)
    dst.add(43)
    assert src.key_counts() == {42: 1.0}  # source unchanged
    assert dst.key_counts() == {42: 1.0, 43: 1.0}
