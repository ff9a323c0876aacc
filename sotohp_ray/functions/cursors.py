"""Opaque, order-preserving cursor tokens (reference analog: the
MediaAccessKey with sign-flipped longs so encoded keys sort
lexicographically like their numeric order, model/package.scala:50-99).

The engine's public paging surfaces hand cursors to clients as opaque
URL-safe strings. Two invariants, both property-tested:

1. round-trip: ``decode(encode(x)) == x`` exactly (floats bit-exact);
2. order-preserving: comparing the token STRINGS equals comparing the
   (score DESC, doc_id ASC) rank tuples — so a stateless edge cache
   or client can order/dedup cursors without decoding them.

Encoding: 8-byte big-endian order-flipped IEEE754 score (sign bit
flipped for non-negatives, all bits inverted for negatives, then the
whole word inverted so DESCENDING score order sorts ascending) +
8-byte big-endian sign-flipped int64 doc id — the standard
order-preserving key tricks the reference's timestamp sign-flip is an
instance of — rendered as lowercase hex. Hex, NOT base64url: the
base64url alphabet is not ASCII-ordered ('-' < digits < uppercase <
'_' < lowercase), so base64url tokens do not sort like their payload
bytes; hex digits 0-9a-f are ASCII-ordered, so invariant 2 holds on
the token itself."""

from __future__ import annotations

import math
import struct


def _float_key(x: float) -> int:
    """IEEE754 double -> uint64 whose unsigned order equals the float
    order (nan excluded by contract)."""
    (bits,) = struct.unpack(">Q", struct.pack(">d", x))
    if bits & (1 << 63):  # negative: invert all bits
        return bits ^ 0xFFFFFFFFFFFFFFFF
    return bits | (1 << 63)  # non-negative: flip sign bit


def _float_unkey(key: int) -> float:
    if key & (1 << 63):
        bits = key ^ (1 << 63)
    else:
        bits = key ^ 0xFFFFFFFFFFFFFFFF
    (x,) = struct.unpack(">d", struct.pack(">Q", bits))
    return x


def encode_cursor(score: float, doc_id: int) -> str:
    """(score, doc_id) -> opaque hex token; token STRING order ==
    (score DESC, doc_id ASC) rank order. -0.0 canonicalizes to +0.0
    (they compare equal in ranking, so their tokens must be equal)."""
    score = float(score)
    if math.isnan(score):
        raise ValueError("NaN score has no rank order; refusing to "
                         "mint a cursor that would corrupt paging")
    if score == 0.0:
        score = 0.0
    skey = _float_key(score) ^ 0xFFFFFFFFFFFFFFFF  # desc
    dkey = (int(doc_id) ^ (1 << 63)) & 0xFFFFFFFFFFFFFFFF  # sign-flip
    return struct.pack(">QQ", skey, dkey).hex()


def decode_cursor(token: str) -> tuple[float, int]:
    raw = bytes.fromhex(token)
    skey, dkey = struct.unpack(">QQ", raw)
    score = _float_unkey(skey ^ 0xFFFFFFFFFFFFFFFF)
    doc_id = dkey ^ (1 << 63)
    if doc_id & (1 << 63):
        doc_id -= 1 << 64
    return score, doc_id
