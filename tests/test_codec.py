"""Codec round-trip + golden tests (FIXTURES.md translation of the
reference's binary-key encode/decode specs, model/package.scala:48-100)."""

import numpy as np
import pytest

from sotohp_ray.functions import codec


@pytest.mark.parametrize("name", ["varint", "pfor"])
def test_roundtrip_random(name):
    enc, dec = codec.CODECS[name]
    rng = np.random.RandomState(7)
    for size in [0, 1, 2, 127, 128, 1000]:
        vals = rng.randint(0, 1 << 20, size=size).astype(np.uint64)
        assert np.array_equal(dec(enc(vals), size), vals)


@pytest.mark.parametrize("name", ["varint", "pfor"])
def test_roundtrip_large_values(name):
    enc, dec = codec.CODECS[name]
    vals = np.array([0, 1, 127, 128, 16383, 16384, 2**31, 2**40, 2**63 - 1], dtype=np.uint64)
    assert np.array_equal(dec(enc(vals), len(vals)), vals)


def test_varint_golden():
    # LEB128: 300 = 0xAC 0x02
    assert codec.varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert codec.varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert codec.varint_encode(np.array([127, 128], dtype=np.uint64)) == b"\x7f\x80\x01"


@pytest.mark.parametrize("name", ["varint", "pfor"])
@pytest.mark.parametrize("n", [1, 5, 128, 129, 1000])
def test_postings_blocks_roundtrip(name, n):
    rng = np.random.RandomState(n)
    doc_ids = np.unique(rng.randint(0, 10 * n + 10, size=n).astype(np.uint64))
    n = doc_ids.size
    tfs = rng.randint(1, 50, size=n).astype(np.uint64)
    scores = rng.rand(n) * 10
    block = 128
    blob, last_docs, goffs, toffs, tf_base, maxs = codec.encode_postings_blocks(
        doc_ids, tfs, scores, block, codec=name
    )
    nblocks = (n + block - 1) // block
    counts = np.full(nblocks, block, dtype=np.int64)
    counts[-1] = n - block * (nblocks - 1)
    d, t = codec.decode_postings(
        blob, n, tf_base, block_counts=counts, gap_offs=goffs,
        tf_offs=toffs, codec=name,
    )
    assert np.array_equal(d, doc_ids)
    assert np.array_equal(t, tfs)
    # last_docs / per-block decode agree
    for k in range(nblocks):
        bd, bt = codec.decode_one_block(
            blob, k, counts, goffs, toffs, tf_base, last_docs, codec=name
        )
        lo, hi = k * block, min(n, (k + 1) * block)
        assert np.array_equal(bd, doc_ids[lo:hi])
        assert np.array_equal(bt, tfs[lo:hi])
        assert last_docs[k] == doc_ids[hi - 1]
        # block-max is an upper bound
        assert float(maxs[k]) >= scores[lo:hi].max()
