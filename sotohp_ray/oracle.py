"""Brute-force BM25 oracle (pure pyarrow/numpy, no Ray, no codec path).

The stand-in for the reference's delegated Lucene/Elasticsearch BM25
(modules/search/ElasticOperations.scala): same Lucene-style formula,
k1=1.2, b=0.75, idf = ln(1 + (N - df + 0.5)/(df + 0.5)), ties broken by
doc_id asc. Engine results must be rank-identical (FIXTURES.md F4).

DocID assignment is re-derived INDEPENDENTLY here: a global sort of all
rows by (repo, path, commit). The engine assigns docIDs as
partition-base-offset + within-partition sort; the corpus generator
guarantees partition key ranges are sorted, so the two must agree —
this doubles as a check of the engine's assignment scheme.

Query semantics: a query is a token BAG — duplicate query terms
contribute their multiplicity (qtf × per-term score).
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from sotohp_ray.config import BM25Params, TokenizerRules
from sotohp_ray.functions.tokenizer import CodeTokenizer
from sotohp_ray.sources.corpus import corpus_files


class BruteForceBM25:
    def __init__(
        self,
        corpus_dir: str,
        rules: TokenizerRules | None = None,
        params: BM25Params | None = None,
    ):
        self.params = params or BM25Params()
        tok = CodeTokenizer(rules)
        self.tok = tok
        tables = [pq.read_table(f) for f in corpus_files(corpus_dir)]
        t = pa.concat_tables(tables)
        # independent docID assignment: global sort by (repo, path, commit)
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("repo", "ascending"),
                ("path", "ascending"),
                ("commit", "ascending"),
            ],
        )
        t = t.take(idx)
        self.n_docs = t.num_rows
        content = t["content"].combine_chunks()
        tf_tbl = tok.term_frequencies(content)
        rows = tf_tbl["row_idx"].to_numpy(zero_copy_only=False)
        terms = tf_tbl["term"].to_pylist()
        tfs = tf_tbl["tf"].to_numpy(zero_copy_only=False)
        # build per-term postings (docID-sorted)
        self.postings: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        tmp: dict[str, tuple[list, list]] = {}
        for r, term, f in zip(rows, terms, tfs):
            d, ff = tmp.setdefault(term, ([], []))
            d.append(r)
            ff.append(f)
        for term, (d, ff) in tmp.items():
            d = np.array(d, dtype=np.int64)
            ff = np.array(ff, dtype=np.float64)
            o = np.argsort(d, kind="stable")
            self.postings[term] = (d[o], ff[o])
        # doc lengths
        dl = np.zeros(self.n_docs, dtype=np.float64)
        np.add.at(dl, rows, tfs)
        self.doc_len = dl
        self.avgdl = dl.sum() / max(1, self.n_docs)

    def idf(self, term: str) -> float:
        df = self.postings[term][0].size if term in self.postings else 0
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        qterms = self.tok.tokens_of(query)
        if not qterms:
            return []
        qtf = Counter(qterms)
        k1, b = self.params.k1, self.params.b
        scores = np.zeros(self.n_docs, dtype=np.float64)
        # accumulate in first-appearance query-term order (the engine
        # scores in the same order → bit-identical float64 sums)
        seen = []
        for t in qterms:
            if t not in seen:
                seen.append(t)
        for term in seen:
            if term not in self.postings:
                continue
            d, f = self.postings[term]
            idf = self.idf(term)
            denom = f + k1 * (1.0 - b + b * self.doc_len[d] / self.avgdl)
            contrib = qtf[term] * idf * (f * (k1 + 1.0)) / denom
            scores[d] += contrib
        nz = np.flatnonzero(scores > 0.0)
        if nz.size == 0:
            return []
        order = np.lexsort((nz, -scores[nz]))
        top = nz[order[:k]]
        return [(int(d), float(scores[d])) for d in top]
