"""Property-based codec + block-structure tests (hypothesis).

The reference relies on golden-value unit specs only (SURVEY.md §5 —
"No property-based or randomized testing"); posting codecs are exactly
the kind of bit-twiddling where property tests earn their keep, so this
engine adds them on top of the golden tests in test_codec.py.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from sotohp_ray.functions import codec as pcodec

u64_arrays = arrays(
    dtype=np.uint64,
    shape=st.integers(min_value=0, max_value=400),
    elements=st.integers(min_value=0, max_value=2**63 - 1),
)

small_arrays = arrays(
    dtype=np.uint64,
    shape=st.integers(min_value=1, max_value=300),
    elements=st.integers(min_value=0, max_value=2**31 - 1),
)


@settings(max_examples=60, deadline=None)
@given(u64_arrays)
def test_varint_roundtrip_property(v):
    buf = pcodec.varint_encode(v)
    out = pcodec.varint_decode(buf, v.size if v.size else None)
    assert np.array_equal(out, v)


@settings(max_examples=60, deadline=None)
@given(small_arrays)
def test_pfor_roundtrip_property(v):
    buf = pcodec.pfor_encode(v)
    out = pcodec.pfor_decode(buf, v.size)
    assert np.array_equal(out, v)


@settings(max_examples=60, deadline=None)
@given(u64_arrays)
def test_varint_lengths_consistent(v):
    buf, lens = pcodec.varint_encode_with_lengths(v)
    assert int(lens.sum()) == len(buf)
    # prefix decodability: any prefix of whole values decodes
    if v.size >= 2:
        k = v.size // 2
        cut = int(lens[:k].sum())
        assert np.array_equal(
            pcodec.varint_decode(buf[:cut], k), v[:k]
        )


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=500).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.integers(min_value=0, max_value=2**40),
                min_size=n, max_size=n, unique=True,
            ),
            st.lists(
                st.integers(min_value=1, max_value=1000),
                min_size=n, max_size=n,
            ),
        )
    ),
    st.sampled_from([4, 16, 128]),
    st.sampled_from(["varint", "pfor"]),
)
def test_postings_blocks_roundtrip_property(data, block_size, codec):
    n, docs, tfs = data
    docs = np.sort(np.array(docs, dtype=np.uint64))
    tfs = np.array(tfs, dtype=np.uint64)
    scores = tfs.astype(np.float64) * 0.37
    blob, last, goffs, toffs, tf_base, bmax = (
        pcodec.encode_postings_blocks(
            docs, tfs, scores, block_size, codec=codec
        )
    )
    nblocks = last.size
    counts = np.full(nblocks, block_size, dtype=np.int64)
    counts[-1] = n - block_size * (nblocks - 1)
    d, f = pcodec.decode_postings(
        blob, n, tf_base, block_counts=counts,
        gap_offs=goffs, tf_offs=toffs, codec=codec,
    )
    assert np.array_equal(d, docs)
    assert np.array_equal(f, tfs)
    # block-max stays an upper bound of its block's scores
    for k in range(nblocks):
        lo, hi = k * block_size, min(n, (k + 1) * block_size)
        assert float(bmax[k]) >= float(scores[lo:hi].max())
    # every single block decodes identically to its slice
    for k in range(nblocks):
        lo, hi = k * block_size, min(n, (k + 1) * block_size)
        bd, bf = pcodec.decode_one_block(
            blob, k, counts, goffs, toffs, tf_base, last, codec=codec
        )
        assert np.array_equal(bd, docs[lo:hi])
        assert np.array_equal(bf, tfs[lo:hi])


@settings(max_examples=40, deadline=None)
@given(st.text(min_size=0, max_size=400))
def test_tokenizer_total_function(text):
    """The analyzer never throws and always returns lowercase
    alnum tokens with no pure-number tokens (M7 chain invariants)."""
    from sotohp_ray.functions.tokenizer import CodeTokenizer

    toks = CodeTokenizer().tokens_of(text)
    for t in toks:
        assert t == t.lower()
        assert t != ""
        assert not t.isdigit()
