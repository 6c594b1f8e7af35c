"""DDSketch protobuf interchange — hand-rolled proto3 wire codec (no
protobuf dependency), matching the reference schema
(/root/reference/lib/ddsketch/proto/ddsketch.proto:15-66):

  DDSketch      { 1: IndexMapping mapping, 2: Store positiveValues,
                  3: Store negativeValues, 4: double zeroCount }
  IndexMapping  { 1: double gamma, 2: double indexOffset,
                  3: enum interpolation {NONE=0, LINEAR=1, QUADRATIC=2, CUBIC=3} }
  Store         { 1: map<sint32,double> binCounts,
                  2: repeated double contiguousBinCounts (packed),
                  3: sint32 contiguousBinIndexOffset }

Compat note: the reference gem serializes ``relative_accuracy`` into the
proto ``gamma`` field (proto.rb:36 — a bug we do not reproduce by default);
``gamma_field="relative_accuracy"`` opts into gem-compatible output. Unlike
the gem (serialize-only), a reader is provided; it also accepts the sparse
``binCounts`` encoding and sums it with the contiguous one
(ddsketch.proto:56-57).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .mapping import mapping_from_name
from .sketch import DDSketch
from .store import Store

__all__ = ["serialize_sketch", "deserialize_sketch"]

_INTERP_ENUM = {None: 0, "linear": 1, "cubic": 3}
_INTERP_NAME = {0: None, 1: "linear", 3: "cubic"}


# -- wire primitives ---------------------------------------------------------
def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _double_field(field: int, value: float) -> bytes:
    if value == 0.0:  # proto3 default elision
        return b""
    return _tag(field, 1) + struct.pack("<d", value)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


# -- encode -----------------------------------------------------------------
def _encode_store(store: Store) -> bytes:
    if store.count == 0 or not len(store.bins):
        return b""
    packed = struct.pack(f"<{len(store.bins)}d", *store.bins.tolist())
    out = _len_field(2, packed)
    if store.offset != 0:
        out += _tag(3, 0) + _varint(_zigzag(int(store.offset)))
    return out


def _encode_mapping(sketch: DDSketch, gamma_field: str) -> bytes:
    m = sketch.mapping
    gamma = m.relative_accuracy if gamma_field == "relative_accuracy" else m.gamma
    out = _double_field(1, gamma)
    out += _double_field(2, m.offset)
    interp = _INTERP_ENUM.get(m.interpolation, 0)
    if interp:
        out += _tag(3, 0) + _varint(interp)
    return out


def serialize_sketch(sketch: DDSketch, gamma_field: str = "gamma") -> bytes:
    """Sketch -> proto3 DDSketch bytes (contiguous store encoding)."""
    out = _len_field(1, _encode_mapping(sketch, gamma_field))
    pos = _encode_store(sketch.store)
    if pos:
        out += _len_field(2, pos)
    neg = _encode_store(sketch.negative_store)
    if neg:
        out += _len_field(3, neg)
    out += _double_field(4, sketch.zero_count)
    return out


# -- decode ------------------------------------------------------------------
class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def eof(self) -> bool:
        return self.pos >= len(self.buf)

    def varint(self) -> int:
        shift = 0
        result = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            result |= (b & 0x7F) << shift
            if not b & 0x80:
                return result
            shift += 7

    def double(self) -> float:
        v = struct.unpack_from("<d", self.buf, self.pos)[0]
        self.pos += 8
        return v

    def bytes_(self) -> bytes:
        n = self.varint()
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def skip(self, wire: int) -> None:
        if wire == 0:
            self.varint()
        elif wire == 1:
            self.pos += 8
        elif wire == 2:
            self.bytes_()
        elif wire == 5:
            self.pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _decode_store(buf: bytes) -> tuple[dict[int, float], np.ndarray, int]:
    r = _Reader(buf)
    sparse: dict[int, float] = {}
    contiguous = np.zeros(0)
    offset = 0
    while not r.eof():
        key = r.varint()
        field, wire = key >> 3, key & 7
        if field == 1 and wire == 2:  # map<sint32,double> entry
            entry = _Reader(r.bytes_())
            k, v = 0, 0.0
            while not entry.eof():
                ek = entry.varint()
                ef, ew = ek >> 3, ek & 7
                if ef == 1:
                    k = _unzigzag(entry.varint())
                elif ef == 2:
                    v = entry.double()
                else:
                    entry.skip(ew)
            sparse[k] = sparse.get(k, 0.0) + v
        elif field == 2 and wire == 2:  # packed doubles
            payload = r.bytes_()
            chunk = np.frombuffer(payload, dtype="<f8").astype(np.float64)
            contiguous = (
                chunk
                if not len(contiguous)
                else np.concatenate([contiguous, chunk])
            )
        elif field == 2 and wire == 1:
            # spec-conformant readers accept the UNPACKED encoding of a
            # packed repeated field (one wire-type-1 record per element) —
            # proto2-era writers and some hand-rolled encoders emit it
            contiguous = np.concatenate([contiguous, [r.double()]])
        elif field == 3 and wire == 0:
            offset = _unzigzag(r.varint())
        else:
            r.skip(wire)
    return sparse, contiguous, offset


def _store_from_parts(
    sparse: dict[int, float], contiguous: np.ndarray, offset: int, template: Store
) -> Store:
    s = Store(template.collapse, template.bin_limit)
    if len(contiguous):
        keys = offset + np.arange(len(contiguous), dtype=np.int64)
        nz = contiguous != 0
        if nz.any():
            s.add_batch(keys[nz], contiguous[nz])
        else:
            pass
    for k, v in sparse.items():  # sparse and contiguous encodings sum
        if v:
            s.add(k, v)
    return s


def deserialize_sketch(
    data: bytes,
    store_type: str = "dense",
    bin_limit: int = 2048,
    gamma_field: str = "gamma",
) -> DDSketch:
    """proto3 DDSketch bytes -> kernel sketch. Summary stats (count) are
    reconstructed from bin mass; min/max/sum are not carried by the proto
    (they aren't part of the reference schema either)."""
    r = _Reader(data)
    mapping_buf = b""
    pos_buf = b""
    neg_buf = b""
    zero_count = 0.0
    while not r.eof():
        key = r.varint()
        field, wire = key >> 3, key & 7
        if field == 1 and wire == 2:
            mapping_buf = r.bytes_()
        elif field == 2 and wire == 2:
            pos_buf = r.bytes_()
        elif field == 3 and wire == 2:
            neg_buf = r.bytes_()
        elif field == 4 and wire == 1:
            zero_count = r.double()
        else:
            r.skip(wire)

    mr = _Reader(mapping_buf)
    gamma = 1.0
    offset = 0.0
    interp = 0
    while not mr.eof():
        key = mr.varint()
        field, wire = key >> 3, key & 7
        if field == 1 and wire == 1:
            gamma = mr.double()
        elif field == 2 and wire == 1:
            offset = mr.double()
        elif field == 3 and wire == 0:
            interp = mr.varint()
        else:
            mr.skip(wire)

    if gamma_field == "relative_accuracy":
        rel_acc = gamma
    else:
        rel_acc = (gamma - 1.0) / (gamma + 1.0)
    if interp not in _INTERP_NAME:
        # reference enum declares QUADRATIC = 2 (ddsketch.proto:38-44) but
        # no implementation ships it (proto.rb:18-44 maps NONE/LINEAR/CUBIC
        # only); reject foreign payloads explicitly instead of silently
        # misreading them as logarithmic
        raise ValueError(
            f"unsupported IndexMapping interpolation enum {interp}; "
            "supported: NONE(0), LINEAR(1), CUBIC(3) — QUADRATIC(2) has no "
            "reference implementation"
        )
    mapping = mapping_from_name(
        _INTERP_NAME[interp] or "logarithmic", rel_acc, offset
    )
    sketch = DDSketch(rel_acc, store_type, bin_limit, mapping=mapping)
    tmpl = sketch.store
    sketch.store = _store_from_parts(*_decode_store(pos_buf), tmpl)
    sketch.negative_store = _store_from_parts(*_decode_store(neg_buf), tmpl)
    sketch.zero_count = zero_count
    sketch.count = (
        sketch.store.count + sketch.negative_store.count + zero_count
    )
    sketch.min = math.inf
    sketch.max = -math.inf
    sketch.sum = 0.0
    return sketch
