"""Adversarial boundary tests: the exact routing/rounding edges where a
reimplementation typically diverges from the reference."""

import math
import sys

import numpy as np
import pytest

from ddsketch_ruby_spark.kernel import DDSketch, LogarithmicKeyMapping


def test_min_possible_boundary_routing():
    """add uses strict comparison: val > min_possible goes positive, equal
    goes to the zero band (base_sketch.rb:99-104)."""
    s = DDSketch.unbounded(0.01)
    mp = s.mapping.min_possible
    s.add(mp)  # == min_possible -> zero band
    s.add(np.nextafter(mp, math.inf))  # just above -> positive store
    s.add(-mp)  # == -min_possible -> zero band
    s.add(-np.nextafter(mp, math.inf))  # just below -> negative store
    assert s.zero_count == 2.0
    assert s.store.count == 1.0
    assert s.negative_store.count == 1.0


def test_subnormals_route_to_zero_band():
    s = DDSketch.unbounded(0.01)
    s.add_batch(np.array([5e-324, -5e-324, 1e-310]))
    assert s.zero_count == 3.0
    assert s.count == 3.0


def test_fractional_offset_truncates_toward_zero():
    # Ruby Integer(-12.23) == -12 (truncation, not floor) — key(1) must
    # match (key_mapping.rb:69-71, shared_context_for_mapping.rb:70-78)
    m = LogarithmicKeyMapping(0.01, offset=-12.23)
    assert m.key(1.0) == -12
    m2 = LogarithmicKeyMapping(0.01, offset=12.23)
    assert m2.key(1.0) == 12


def test_all_negative_quantiles():
    s = DDSketch.unbounded(0.05)
    vals = -np.linspace(1, 100, 100)
    s.add_batch(vals)
    srt = np.sort(vals)
    for q in (0.0, 0.5, 1.0):
        got = s.get_quantile_value(q)
        want = srt[int(q * 99)]
        assert abs(got - want) - 0.05 * abs(want) <= 1e-15
    assert s.max == -1.0 and s.min == -100.0


def test_tiny_fractional_weights_accumulate():
    s = DDSketch.unbounded(0.01)
    for _ in range(1000):
        s.add(7.0, 1e-2)
    assert s.count == pytest.approx(10.0, rel=1e-9)
    assert s.get_quantile_value(0.5) == pytest.approx(7.0, rel=0.01)
    # reference degenerate case: total weight < 1 makes rank negative —
    # the quantile is then meaningless but must not crash (mirrors
    # base_sketch.rb:124 with fractional counts)
    t = DDSketch.unbounded(0.01)
    t.add(7.0, 1e-3)
    assert t.get_quantile_value(0.5) is not None


def test_huge_values_near_max_possible():
    s = DDSketch.unbounded(0.01)
    m = s.mapping
    v = m.max_possible
    s.add(v)
    got = s.get_quantile_value(1.0)
    # q=1 returns the bucket value, within alpha of max_possible
    assert abs(got - v) <= 0.011 * v
    assert math.isfinite(got)


def test_merge_weighted_sketches():
    a = DDSketch.unbounded(0.02)
    b = DDSketch.unbounded(0.02)
    a.add(10.0, 2.5)
    b.add(10.0, 0.5)
    b.add(20.0, 3.0)
    a.merge(b)
    assert a.count == 6.0
    assert a.sum == pytest.approx(2.5 * 10 + 0.5 * 10 + 3 * 20)
    # weighted median: total 6, rank 0.5*(6-1)=2.5 -> first 3.0 mass is 10
    assert a.get_quantile_value(0.5) == pytest.approx(10.0, rel=0.02)


def test_single_value_all_quantiles_equal():
    s = DDSketch.collapsing_lowest(0.01, 4)
    s.add(123.456)
    for q in (0.0, 0.3, 1.0):
        assert s.get_quantile_value(q) == pytest.approx(123.456, rel=0.01)


def test_collapsing_preserves_total_mass_under_pressure():
    s = DDSketch.collapsing_lowest(0.01, 8)
    rng = np.random.default_rng(0)
    vals = np.exp(rng.uniform(-200, 200, 10_000))
    s.add_batch(vals)
    assert s.count == 10_000.0
    assert len(s.store.bins) <= 8
    # collapse is lossy below the retained top buckets (by design:
    # base_sketch.rb:24-28); the maximum itself stays within alpha
    srt = np.sort(vals)
    got = s.get_quantile_value(1.0)
    want = srt[-1]
    assert abs(got - want) <= 0.011 * want
    # and the collapsed mass is all accounted for in bin 0
    assert s.store.bins.sum() == pytest.approx(10_000.0)


def test_float_max_min_stats():
    s = DDSketch.unbounded(0.01)
    s.add_batch(np.array([sys.float_info.min, 1.0, sys.float_info.max / 2]))
    assert s.min == sys.float_info.min
    assert s.max == sys.float_info.max / 2
    assert math.isfinite(s.sum)


def test_dedup_family_poison_pill_corpus(spark):
    """Web-crawl poison pills — NULL text, empty text, whitespace,
    sub-shingle-length, a 1 MB document, astral-plane unicode — must flow
    through every text-dedup operator without error and with sane
    outputs (the family's padding rule maps degenerate docs to the
    padded-window set instead of crashing)."""
    from ddsketch_ruby_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
        shingle_hash_rows,
        simhash,
    )

    rows = [
        (1, None),
        (2, ""),
        (3, "   "),
        (4, "ab"),                      # shorter than the shingle width
        (5, "x" * 1_000_000),           # 1 MB single document
        (6, "emoji \U0001F600\U0001F680 mixed é中文 text"),
        (7, "a normal document about distributed sketches"),
        (8, "a normal document about distributed sketches"),  # exact dup of 7
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sigs = {r["doc_id"]: list(r["sig"]) for r in
            minhash_signatures(df, "text", "doc_id", 32).collect()}
    assert set(sigs) == {1, 2, 3, 4, 5, 6, 7, 8}
    assert sigs[1] == sigs[2]  # None and "" both pad to the same window
    assert sigs[7] == sigs[8]
    assert all(len(s) == 32 for s in sigs.values())

    fps = {r["doc_id"]: r["simhash"] for r in
           simhash(df, "text", "doc_id").collect()}
    assert set(fps) == set(sigs) and fps[7] == fps[8]

    sh = shingle_hash_rows(df, "text", "doc_id", shingle=5)
    per_doc = {r["doc_id"]: r["n"] for r in
               sh.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()}
    assert per_doc[1] == 1 and per_doc[5] == 1  # constant docs: 1 distinct shingle
    assert per_doc[7] > 10

    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(
        df, "text", "doc_id", num_hashes=32, bands=8, min_jaccard=0.9
    ).collect()}
    assert (7, 8) in pairs and (1, 2) in pairs

    exact = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(
        df, "text", "doc_id", min_jaccard=0.99, num_hashes=32, bands=8
    ).collect()}
    assert exact[(7, 8)] == 1.0
