"""Opaque cursor token invariants: exact round-trip and
order-preservation — token STRING order must equal the
(score DESC, doc_id ASC) rank order (the property the reference's
sign-flipped MediaAccessKey encoding exists for). The tokens are
compared directly, as a client holding only tokens would."""

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from sotohp_ray.functions.cursors import decode_cursor, encode_cursor

_scores = st.floats(allow_nan=False, allow_infinity=True, width=64)
_ids = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=500, deadline=None)
@given(_scores, _ids)
def test_cursor_round_trip_exact(score, doc_id):
    s, d = decode_cursor(encode_cursor(score, doc_id))
    assert d == doc_id
    if score == 0.0:
        # -0.0 canonicalizes to +0.0 (rank-equal scores must encode
        # identically); both compare equal to the input
        assert s == 0.0
    else:
        assert struct.pack(">d", s) == struct.pack(">d", score)


@settings(max_examples=500, deadline=None)
@given(_scores, _ids, _scores, _ids)
def test_cursor_token_order_matches_rank_order(s1, d1, s2, d2):
    t1, t2 = encode_cursor(s1, d1), encode_cursor(s2, d2)
    # rank-equal (+0.0 and -0.0 fold together) => identical tokens;
    # otherwise the TOKEN comparison must agree with the rank order:
    # higher score first, then lower doc_id first
    if s1 == s2 and d1 == d2:
        assert t1 == t2
    elif (s1 > s2) or (s1 == s2 and d1 < d2):
        assert t1 < t2
    else:
        assert t1 > t2


def test_cursor_examples():
    assert decode_cursor(encode_cursor(3.25, 42)) == (3.25, 42)
    assert decode_cursor(encode_cursor(-1.5, -7)) == (-1.5, -7)
    # descending score sorts ascending in token space
    assert encode_cursor(10.0, 0) < encode_cursor(1.0, 0)
    # negative vs positive score across the sign boundary
    assert encode_cursor(0.5, 0) < encode_cursor(-0.5, 0)
    # equal score: doc asc
    assert encode_cursor(1.0, 5) < encode_cursor(1.0, 6)
    assert encode_cursor(1.0, -3) < encode_cursor(1.0, 2)
