"""Opaque cursor token invariants: exact round-trip and
order-preservation — token BYTE order must equal the
(score DESC, doc_id ASC) rank order (the property the reference's
sign-flipped MediaAccessKey encoding exists for)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from sotohp_ray.functions.cursors import decode_cursor, encode_cursor

_scores = st.floats(allow_nan=False, allow_infinity=True, width=64)
_ids = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=500, deadline=None)
@given(_scores, _ids)
def test_cursor_round_trip_exact(score, doc_id):
    s, d = decode_cursor(encode_cursor(score, doc_id))
    assert s == score or (score == 0.0 and s == 0.0)  # -0.0 folds below
    assert d == doc_id
    # bit-exactness for everything except the -0.0/+0.0 pair, which
    # MUST compare equal anyway
    import struct

    if score != 0.0:
        assert struct.pack(">d", s) == struct.pack(">d", score)


@settings(max_examples=500, deadline=None)
@given(_scores, _ids, _scores, _ids)
def test_cursor_token_order_matches_rank_order(s1, d1, s2, d2):
    t1, t2 = encode_cursor(s1, d1), encode_cursor(s2, d2)
    # rank: higher score first, then lower doc_id first
    r1, r2 = (-s1 if s1 == s1 else 0, d1), (-s2, d2)
    # compare raw decoded bytes (base64url of equal-length input is
    # itself order-preserving, but compare the canonical bytes)
    import base64

    b1 = base64.urlsafe_b64decode(t1 + "=" * (-len(t1) % 4))
    b2 = base64.urlsafe_b64decode(t2 + "=" * (-len(t2) % 4))
    if (s1, d1) == (s2, d2) or (s1 == s2 == 0.0 and d1 == d2):
        assert b1 == b2
    elif r1 < r2:
        assert b1 < b2
    else:
        assert b1 > b2


def test_cursor_examples():
    assert decode_cursor(encode_cursor(3.25, 42)) == (3.25, 42)
    assert decode_cursor(encode_cursor(-1.5, -7)) == (-1.5, -7)
    # descending score sorts ascending in token space
    hi = encode_cursor(10.0, 0)
    lo = encode_cursor(1.0, 0)
    assert hi < lo
    # equal score: doc asc
    a = encode_cursor(1.0, 5)
    b = encode_cursor(1.0, 6)
    assert a < b
