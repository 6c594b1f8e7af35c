"""Foreign-payload golden fixtures for kernel/proto.py's READER.

The reference gem is serialize-only; our reader additionally accepts the
encodings OTHER public DDSketch implementations emit per the shared
schema (reference ddsketch.proto:15-66): the sparse ``binCounts`` map
(dict-based stores in the Java/Go/Python families), sparse+contiguous
summing (ddsketch.proto:56-57), arbitrary field order, unknown-field
skipping, split/unpacked packed fields, and the gem's
relative-accuracy-in-gamma quirk (proto.rb:36).

Fixtures are HAND-ENCODED with an independent mini proto3 writer in this
file (own varint/zigzag, straight from the proto3 wire spec) and frozen
as hex strings — this sandbox has no other DDSketch implementation
installed to capture live bytes from, so the fixtures pin the schema's
wire contract rather than one library's output. Each fixture's layout is
annotated with the implementation family it mirrors."""

import struct

import pytest

from ddsketch_ruby_spark.kernel.proto import deserialize_sketch


# -- independent mini writer (proto3 wire spec) -------------------------------
def vint(n: int) -> bytes:
    out = bytearray()
    while True:
        b, n = n & 0x7F, n >> 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def zz32(n: int) -> int:
    return (n << 1) ^ (n >> 31)


def ld(field: int, payload: bytes) -> bytes:
    return vint((field << 3) | 2) + vint(len(payload)) + payload


def dbl(field: int, v: float) -> bytes:
    return vint((field << 3) | 1) + struct.pack("<d", v)


def vfield(field: int, n: int) -> bytes:
    return vint((field << 3) | 0) + vint(n)


def map_entry(k: int, v: float, value_first: bool = False) -> bytes:
    """One map<sint32,double> binCounts entry (Store field 1)."""
    key = vfield(1, zz32(k))
    val = dbl(2, v)
    return ld(1, (val + key) if value_first else (key + val))


GAMMA_001 = 1.0 + 2.0 * 0.01 / (1.0 - 0.01)  # alpha=0.01


def test_sparse_map_store():
    """Dict-store layout (Java/Go sparse stores): positiveValues carries
    ONLY binCounts map entries — negative keys zigzagged, one entry out
    of order, one value-first entry."""
    store = (
        map_entry(1400, 2.0)
        + map_entry(-3, 1.0)
        + map_entry(1469, 1.5, value_first=True)
    )
    blob = ld(1, dbl(1, GAMMA_001)) + ld(2, store) + dbl(4, 2.0)
    assert blob.hex() == (
        "0a0909fd4a815abf52f03f12290a0c08f0151100000000"
        "00000040"  # entry {1400: 2.0}
        "0a0b080511000000000000f03f"  # entry {-3: 1.0} (zigzag 5)
        "0a0c11000000000000f83f08fa16"  # {1469: 1.5}, value-first
        "210000000000000040"  # zeroCount = 2.0
    )
    s = deserialize_sketch(blob)
    assert s.store.key_counts() == {1400: 2.0, -3: 1.0, 1469: 1.5}
    assert s.zero_count == 2.0
    assert s.count == 6.5
    assert s.negative_store.count == 0


def test_sparse_plus_contiguous_sum():
    """ddsketch.proto:56-57: a store may carry BOTH encodings; readers
    sum them. Contiguous [1.0, 2.0] at offset 10 plus sparse {11: 3.0}
    -> {10: 1.0, 11: 5.0}."""
    store = (
        ld(2, struct.pack("<2d", 1.0, 2.0))
        + vfield(3, zz32(10))
        + map_entry(11, 3.0)
    )
    blob = ld(1, dbl(1, GAMMA_001)) + ld(2, store)
    s = deserialize_sketch(blob)
    assert s.store.key_counts() == {10: 1.0, 11: 5.0}


def test_split_packed_and_unpacked_contiguous():
    """Protobuf allows a packed repeated field to arrive as MULTIPLE
    length-delimited records (concatenated) or fully UNPACKED (one
    wire-type-1 record per element) — conformant readers accept all
    three spellings."""
    split = (
        ld(2, struct.pack("<d", 1.0))
        + ld(2, struct.pack("<2d", 2.0, 3.0))
        + vfield(3, zz32(5))
    )
    unpacked = (
        dbl(2, 1.0) + dbl(2, 2.0) + dbl(2, 3.0) + vfield(3, zz32(5))
    )
    for store in (split, unpacked):
        blob = ld(1, dbl(1, GAMMA_001)) + ld(2, store)
        s = deserialize_sketch(blob)
        assert s.store.key_counts() == {5: 1.0, 6: 2.0, 7: 3.0}, store.hex()


def test_gem_rel_acc_as_gamma_quirk():
    """The Ruby gem writes relative_accuracy INTO the proto gamma field
    (proto.rb:36). gamma_field='relative_accuracy' opts into reading such
    payloads: 0.01 in the gamma slot must yield a mapping with true gamma
    1+2a/(1-a), while the default read treats 0.01 as a literal gamma."""
    blob = ld(1, dbl(1, 0.01)) + ld(2, map_entry(7, 1.0))
    assert blob.hex() == (
        "0a09097b14ae47e17a843f120d0a0b080e11000000000000f03f"
    )
    s = deserialize_sketch(blob, gamma_field="relative_accuracy")
    assert s.mapping.gamma == pytest.approx(GAMMA_001)
    assert s.mapping.relative_accuracy == pytest.approx(0.01)
    # the DEFAULT read takes the field literally as gamma; 0.01 implies a
    # negative relative accuracy, which the mapping ctor rejects loudly —
    # a gem payload read without the quirk flag fails, never mis-decodes
    with pytest.raises(ValueError):
        deserialize_sketch(blob)


def test_field_order_and_unknown_fields():
    """proto3 fields may arrive in ANY order and readers must skip
    unknown fields (forward compat): zeroCount first, unknown varint /
    length-delimited / fixed64 fields interleaved at both message
    levels, mapping last, negativeValues present."""
    store_pos = (
        map_entry(3, 4.0)
        + vfield(15, 99)  # unknown varint inside Store
        + ld(9, b"future")  # unknown length-delimited inside Store
    )
    store_neg = map_entry(2, 1.0)
    blob = (
        dbl(4, 7.0)  # zeroCount first
        + vfield(13, 1)  # unknown varint in DDSketch
        + ld(2, store_pos)
        + dbl(12, 3.25)  # unknown fixed64 in DDSketch
        + ld(3, store_neg)
        + ld(1, dbl(1, GAMMA_001) + dbl(2, 0.5) + vfield(3, 1))  # linear
    )
    s = deserialize_sketch(blob)
    assert s.zero_count == 7.0
    assert s.store.key_counts() == {3: 4.0}
    assert s.negative_store.key_counts() == {2: 1.0}
    assert s.mapping.interpolation == "linear"
    assert s.mapping.offset == 0.5
    assert s.count == 12.0


def test_foreign_sparse_merges_with_native():
    """A sketch decoded from a foreign sparse payload must merge with a
    natively-built sketch of the same gamma — the interchange point of
    the whole exercise."""
    import numpy as np

    from ddsketch_ruby_spark.kernel import DDSketch

    native = DDSketch(0.01)
    native.add_batch(np.array([1.0, 2.0, 4.0]))
    keys = sorted(native.store.key_counts())
    foreign_store = b"".join(map_entry(k, 2.0) for k in keys)
    foreign = deserialize_sketch(
        ld(1, dbl(1, native.mapping.gamma)) + ld(2, foreign_store)
    )
    native.merge(foreign)
    assert native.count == 9.0
    assert all(c == 3.0 for c in native.store.key_counts().values())
