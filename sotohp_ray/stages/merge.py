"""Merge stage: partial postings -> final docID-sorted, block-compressed
posting lists + per-shard sorted dictionary.

Runs under ``partials.groupby("term_shard").map_groups(...)`` — THE big
shuffle of the build (SURVEY.md §7.4). One group = one dictionary
shard; inside the group everything is vectorized numpy (decode all
partial blobs, lexsort by (term, doc), segment, block-encode).

Because df, N and avgdl are all known at merge time, exact per-posting
BM25 scores are computed here and the per-block MAX (rounded up to
float32) is stored as block-max metadata for query-time WAND skipping.

Reference analog: the LMDB secondary-index build
(``withIndexFull`` upserts key -> sorted id lists,
MediaServiceLive.scala:1806-1841) — the same "key -> docID-sorted
postings" product, built here as one vectorized shuffle instead of
per-record index walks (the reference's own performance note at
MediaServiceLive.scala:1412 shows why per-record walks don't scale).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from sotohp_ray.config import IndexConfig
from sotohp_ray.functions import codec as pcodec

DICT_SCHEMA = pa.schema(
    [
        ("term_shard", pa.uint32()),
        ("term", pa.string()),
        ("df", pa.uint64()),
        ("cf", pa.uint64()),
        ("max_score", pa.float32()),
        ("blob", pa.large_binary()),
        ("block_last", pa.large_list(pa.uint64())),
        ("block_offs", pa.large_list(pa.uint32())),
        ("block_max", pa.large_list(pa.float32())),
    ]
)


def merge_shard(
    group: pa.Table, n_docs: int, avgdl: float, config: IndexConfig
) -> pa.Table:
    """All partial rows of one term_shard -> final dictionary rows,
    sorted by term."""
    _, dec = pcodec.CODECS[config.codec]
    k1, b = config.bm25.k1, config.bm25.b
    nrows = group.num_rows
    if nrows == 0:
        return pa.table({}, schema=DICT_SCHEMA)
    shard = int(group["term_shard"][0].as_py())
    counts = group["count"].to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(counts.sum())

    # decode all partial blobs into flat arrays (row loop is over
    # partial ROWS — O(#terms × #partitions / #shards) — while each
    # decode is vectorized over its postings)
    doc_col = group["doc_blob"].combine_chunks()
    tf_col = group["tf_blob"].combine_chunks()
    dl_col = group["dl_blob"].combine_chunks()
    docs = np.empty(total, dtype=np.uint64)
    tfs = np.empty(total, dtype=np.uint64)
    dls = np.empty(total, dtype=np.uint64)
    pos = 0
    for i in range(nrows):
        c = int(counts[i])
        gaps = dec(doc_col[i].as_buffer(), c)
        docs[pos : pos + c] = np.cumsum(gaps, dtype=np.uint64)
        tfs[pos : pos + c] = dec(tf_col[i].as_buffer(), c)
        dls[pos : pos + c] = dec(dl_col[i].as_buffer(), c)
        pos += c

    # term code per posting
    import pyarrow.compute as pc

    tcodes_arr = pc.dictionary_encode(group["term"].combine_chunks())
    tcodes_arr = (
        tcodes_arr.combine_chunks()
        if isinstance(tcodes_arr, pa.ChunkedArray)
        else tcodes_arr
    )
    term_dict = tcodes_arr.dictionary
    row_codes = tcodes_arr.indices.to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    post_codes = np.repeat(row_codes, counts)

    order = np.lexsort((docs, post_codes))
    codes_s = post_codes[order]
    docs_s = docs[order]
    tfs_s = tfs[order]
    dls_s = dls[order]

    bounds = np.flatnonzero(np.diff(codes_s)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [codes_s.size]))
    uniq_terms = term_dict.take(pa.array(codes_s[starts], type=pa.int64()))
    uniq_list = uniq_terms.to_pylist()

    # exact per-posting BM25 scores (float64), block-encoded per term
    o_term, o_df, o_cf, o_max = [], [], [], []
    o_blob, o_last, o_offs, o_bmax = [], [], [], []
    for k in range(starts.size):
        lo, hi = int(starts[k]), int(ends[k])
        df = hi - lo
        d = docs_s[lo:hi]
        f = tfs_s[lo:hi].astype(np.float64)
        dl = dls_s[lo:hi].astype(np.float64)
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        denom = f + k1 * (1.0 - b + b * dl / avgdl)
        scores = idf * (f * (k1 + 1.0)) / denom
        blob, last, offs, bmax = pcodec.encode_postings_blocks(
            d, tfs_s[lo:hi], scores, config.block_size, codec=config.codec
        )
        o_term.append(uniq_list[k])
        o_df.append(df)
        o_cf.append(int(tfs_s[lo:hi].sum()))
        o_max.append(float(bmax.max()))
        o_blob.append(blob)
        o_last.append(last)
        o_offs.append(offs)
        o_bmax.append(bmax)

    out = pa.table(
        {
            "term_shard": pa.array(
                np.full(len(o_term), shard, dtype=np.uint32), type=pa.uint32()
            ),
            "term": pa.array(o_term, type=pa.string()),
            "df": pa.array(o_df, type=pa.uint64()),
            "cf": pa.array(o_cf, type=pa.uint64()),
            "max_score": pa.array(o_max, type=pa.float32()),
            "blob": pa.array(o_blob, type=pa.large_binary()),
            "block_last": pa.array(
                [x.tolist() for x in o_last], type=pa.large_list(pa.uint64())
            ),
            "block_offs": pa.array(
                [x.tolist() for x in o_offs], type=pa.large_list(pa.uint32())
            ),
            "block_max": pa.array(
                [x.tolist() for x in o_bmax], type=pa.large_list(pa.float32())
            ),
        },
        schema=DICT_SCHEMA,
    )
    # dictionary sorted by term within the shard (ordered navigation /
    # seek — the reference's sorted-key iteration discipline, O1/O2)
    idx = pc.sort_indices(out, sort_keys=[("term", "ascending")])
    return out.take(idx)
