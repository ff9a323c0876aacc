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


# ---------------------------------------------------------- positions

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=30),
    min_size=1,
    max_size=12,
)


@settings(max_examples=40, deadline=None)
@given(docs_strategy, st.sampled_from([1, 2, 65536]))
def test_positions_roundtrip_spimi_merge(token_docs, salt_rows):
    """Positions survive SPIMI -> salt chunking -> merge byte-shuffle:
    for every (term, doc), the decoded dictionary position stream
    equals the brute positions in the analyzed token stream. Pure
    in-process (no Ray): index_partition_table + merge_shard +
    the Searcher's decode math."""
    import pyarrow as pa

    from sotohp_ray.config import IndexConfig
    from sotohp_ray.stages.merge import merge_shard
    from sotohp_ray.stages.spimi import index_partition_table

    cfg = IndexConfig(num_term_shards=1, salt_rows=salt_rows)
    n = len(token_docs)
    t = pa.table({
        "repo": pa.array(["r"] * n),
        "path": pa.array([f"{i:05d}" for i in range(n)]),
        "commit": pa.array(["0"] * n),
        "lang": pa.array(["x"] * n),
        "content": pa.array([" ".join(toks) for toks in token_docs]),
    })
    docmeta, partials, metrics = index_partition_table(t, 0, 0, cfg)
    if partials.num_rows == 0:
        return
    d = merge_shard(
        partials, n, max(metrics["token_count"] / max(n, 1), 1e-9), cfg
    )
    # docmeta order == path order == original doc index here
    brute = {}
    for i, toks in enumerate(token_docs):
        for p, tok in enumerate(toks):
            brute.setdefault(tok, {}).setdefault(i, []).append(p)

    dfs = d["df"].to_numpy(zero_copy_only=False)
    cfs = d["cf"].to_numpy(zero_copy_only=False)
    for row in range(d.num_rows):
        term = d["term"][row].as_py()
        df, cf = int(dfs[row]), int(cfs[row])
        # decode postings
        if not d["blob"][row].is_valid:
            docs = np.array([d["doc0"][row].as_py()], dtype=np.int64)
            tfs = np.array([d["tf0"][row].as_py()], dtype=np.int64)
        else:
            last = d["block_last"][row].values.to_numpy(
                zero_copy_only=False).astype(np.int64)
            counts = np.full(last.size, cfg.block_size, dtype=np.int64)
            counts[-1] = df - cfg.block_size * (last.size - 1)
            docs_u, tfs_u = pcodec.decode_postings(
                d["blob"][row].as_buffer(), df,
                int(d["tf_base"][row].as_py()),
                block_counts=counts,
                gap_offs=d["block_gap_offs"][row].values.to_numpy(
                    zero_copy_only=False),
                tf_offs=d["block_tf_offs"][row].values.to_numpy(
                    zero_copy_only=False),
                codec=cfg.codec,
            )
            docs = docs_u.astype(np.int64)
            tfs = tfs_u.astype(np.int64)
        # decode positions (the Searcher's math)
        if not d["pos_blob"][row].is_valid:
            occ = np.array([d["pos0"][row].as_py()], dtype=np.int64)
        else:
            pg = pcodec.varint_decode(d["pos_blob"][row].as_buffer(), cf)
            cum = np.cumsum(pg, dtype=np.uint64)
            p_starts = np.zeros(docs.size, dtype=np.int64)
            np.cumsum(tfs[:-1], out=p_starts[1:])
            base = np.zeros(docs.size, dtype=np.uint64)
            base[1:] = cum[p_starts[1:] - 1]
            occ = (cum - np.repeat(base, tfs)).astype(np.int64)
        # compare per posting
        off = 0
        expect_docs = sorted(brute[term])
        assert list(docs) == expect_docs, term
        for doc, tf in zip(docs, tfs):
            got = occ[off: off + tf].tolist()
            assert got == brute[term][int(doc)], (term, doc)
            off += tf
        assert off == cf
