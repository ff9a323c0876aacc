"""Semantics tests for the BM25 query-DSL variants (dis_max, boosting,
explain) beyond oracle parity: each variant must degenerate to the
plain ranking at its identity parameter, and explain's breakdown must
reconstruct the ranking it explains."""

from __future__ import annotations

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def _by_query(tbl):
    df = tbl.to_pandas()
    return {
        int(q): g.sort_values("doc_id")[["doc_id", "score"]].values
        for q, g in df.groupby("query_id")
    }


def test_dismax_single_clause_is_plain_topk():
    """A one-clause dis_max IS the plain BM25 ranking (max == sum ==
    the only clause, tie-breaker moot)."""
    from sotohp_ray.pipelines.fulltext import bm25_dismax, bm25_topk

    q = "hash join"
    plain = _by_query(bm25_topk(SF_DIR, queries=(q,)))
    for tie in (0.0, 0.3, 1.0):
        dm = _by_query(bm25_dismax(SF_DIR, query_sets=((q,),), tie=tie))
        np.testing.assert_allclose(dm[0], plain[0], atol=1e-9)


def test_dismax_tie1_disjoint_clauses_is_union_query():
    """With tie_breaker=1 the dis_max score is the SUM over clauses;
    for clauses with disjoint term sets that equals the plain BM25
    score of the concatenated query."""
    from sotohp_ray.pipelines.fulltext import bm25_dismax, bm25_topk

    clauses = ("spark sort merge", "hash join")  # disjoint terms
    dm = _by_query(bm25_dismax(SF_DIR, query_sets=(clauses,), tie=1.0))
    plain = _by_query(bm25_topk(SF_DIR, queries=(" ".join(clauses),)))
    np.testing.assert_allclose(dm[0], plain[0], atol=1e-3)


def test_dismax_tie0_is_best_clause():
    """With tie_breaker=0 every doc's score is its best single-clause
    score — recompute from the two one-clause runs at full depth."""
    from sotohp_ray.pipelines.fulltext import bm25_dismax, bm25_topk

    clauses = ("slow big table scan", "vector column agg")
    a = _by_query(bm25_topk(SF_DIR, queries=(clauses[0],), k=10**9))
    b = _by_query(bm25_topk(SF_DIR, queries=(clauses[1],), k=10**9))
    best: dict[int, float] = {}
    for arr in (a[0], b[0]):
        for d, sc in arr:
            best[int(d)] = max(best.get(int(d), 0.0), float(sc))
    dm = bm25_dismax(SF_DIR, query_sets=(clauses,), tie=0.0).to_pandas()
    assert len(dm) > 0
    for _, r in dm.iterrows():
        assert r["score"] == pytest.approx(best[int(r["doc_id"])], abs=1e-9)


def test_boosting_identity_at_nb1():
    """negative_boost=1.0 demotes nothing: ranking == plain BM25."""
    from sotohp_ray.pipelines.fulltext import bm25_boosting, bm25_topk

    pos = "query data filter"
    plain = _by_query(bm25_topk(SF_DIR, queries=(pos,)))
    bq = _by_query(bm25_boosting(SF_DIR, specs=((pos, "slow", 1.0),)))
    np.testing.assert_allclose(bq[0], plain[0], atol=1e-9)


def test_boosting_demotes_only_negative_matches():
    """With nb<1, a doc's boosted score is exactly nb * plain score iff
    it matches a negative term, else the plain score."""
    from sotohp_ray.pipelines.fulltext import (
        bm25_boosting, bm25_topk, documents_index,
    )
    from sotohp_ray.pipelines.query import Searcher

    pos, neg, nb = "spark sort merge", "hash", 0.5
    s = Searcher(documents_index(SF_DIR))
    from sotohp_ray.pipelines.fulltext import _eng2orig

    eng2orig = _eng2orig(documents_index(SF_DIR), s.space)
    negdocs: set[int] = set()
    for t, _ in s._query_terms(neg):
        d, _f = s._decode_full(t)
        negdocs.update(int(eng2orig[x]) for x in d)
    plain = {
        int(d): float(sc)
        for d, sc in bm25_topk(SF_DIR, queries=(pos,), k=10**9)
        .to_pandas()[["doc_id", "score"]].values
    }
    bq = bm25_boosting(SF_DIR, specs=((pos, neg, nb),), k=10**9).to_pandas()
    demoted = 0
    for _, r in bq.iterrows():
        d = int(r["doc_id"])
        want = plain[d] * nb if d in negdocs else plain[d]
        assert r["score"] == pytest.approx(want, abs=2e-4), d
        demoted += d in negdocs
    assert demoted > 0, "fixture must demote at least one doc"


def test_explain_reconstructs_topk():
    """bm25_explain's per-term contributions must sum (within rounding)
    to the bm25_topk score of each explained doc, and the explained doc
    set per query must be exactly the top-EXPLAIN_K set."""
    from sotohp_ray.pipelines.fulltext import (
        DOC_QUERIES, EXPLAIN_K, bm25_explain, bm25_topk,
    )

    ex = bm25_explain(SF_DIR).to_pandas()
    top = bm25_topk(SF_DIR, k=EXPLAIN_K).to_pandas()
    for qid, g in top.groupby("query_id"):
        eg = ex[ex["query_id"] == qid]
        assert set(eg["doc_id"]) == set(g["doc_id"]), qid
        nterms = eg.groupby("doc_id")["term"].nunique().max()
        for _, r in g.iterrows():
            contribs = eg[eg["doc_id"] == r["doc_id"]]["contrib"]
            assert r["score"] == pytest.approx(
                contribs.sum(), abs=1e-4 * (len(contribs) + 1)
            ), (qid, r["doc_id"])
        # every explained term is an analyzed term of the query
        from sotohp_ray.functions.tokenizer import CodeTokenizer

        qterms = set(CodeTokenizer().tokens_of(DOC_QUERIES[int(qid)]))
        assert set(eg["term"]) <= qterms, qid
        assert nterms >= 1


def test_synonym_search_matches_synonym_only_docs():
    """A 'fast sort' query expanded through ('sort','order') must
    retrieve docs that contain 'order' (or 'fast') but NO 'sort'
    token, at the same query weight — and every result doc must
    contain at least one expanded term."""
    from sotohp_ray.pipelines.fulltext import (
        _expand_synonyms, documents_index, synonym_search,
    )
    from sotohp_ray.pipelines.query import Searcher
    from sotohp_ray.pipelines.fulltext import _eng2orig

    q = "fast sort"
    exp_terms = {t for t, _ in _expand_synonyms(q)}
    assert exp_terms == {"fast", "sort", "order"}
    res = synonym_search(SF_DIR, queries=(q,), k=10**9).to_pandas()
    idx = documents_index(SF_DIR)
    s = Searcher(idx)
    eng2orig = _eng2orig(idx, s.space)
    docs_of = {}
    for t in ("fast", "sort", "order"):
        d, _ = s._decode_full(t)
        docs_of[t] = {int(eng2orig[x]) for x in d}
    got = set(res["doc_id"].astype(int))
    assert got == docs_of["fast"] | docs_of["sort"] | docs_of["order"]
    only_syn = (docs_of["order"] - docs_of["sort"]) - docs_of["fast"]
    assert only_syn and only_syn <= got, "synonym-only docs must match"


def test_expand_synonyms_accumulates_collisions():
    """A query containing both members of a group gives every member
    the SUM of both query tfs; unknown terms pass through unexpanded."""
    from sotohp_ray.pipelines.fulltext import _expand_synonyms

    got = dict(_expand_synonyms("sort order sort xyzzy"))
    assert got["sort"] == 3 and got["order"] == 3
    assert got["xyzzy"] == 1


def test_tfidf_formula_bruteforce():
    """tfidf_topk's scores must equal the lnc-style formula computed
    from raw postings: sum qtf*(1+ln tf)*ln(N/df)/sqrt(dl)."""
    from sotohp_ray.pipelines.fulltext import (
        _eng2orig, documents_index, tfidf_topk,
    )
    from sotohp_ray.pipelines.query import Searcher

    q = "hash join"
    idx = documents_index(SF_DIR)
    s = Searcher(idx)
    eng2orig = _eng2orig(idx, s.space)
    exp: dict[int, float] = {}
    for t, qtf in s._query_terms(q):
        d, f = s._decode_full(t)
        df_t = float(s._dfs[s._row[t]])
        for de, tf in zip(d, f):
            de = int(de)
            exp[int(eng2orig[de])] = exp.get(int(eng2orig[de]), 0.0) + (
                qtf * (1.0 + np.log(float(tf)))
                * np.log(s.space / df_t) / np.sqrt(float(s.doc_len[de]))
            )
    got = tfidf_topk(SF_DIR, queries=(q,), k=10**9).to_pandas()
    assert set(got["doc_id"].astype(int)) == set(exp)
    for _, r in got.iterrows():
        assert r["score"] == pytest.approx(
            round(exp[int(r["doc_id"])], 4), abs=2e-4
        )


def test_rescore_phrase_window_semantics():
    """ES rescore-window: bonus=0 degenerates to plain top-k; with a
    bonus, every returned score equals base + bonus iff the doc (a)
    is inside the top-window base ranking AND (b) contains the exact
    phrase — recomputed independently from full-depth base and phrase
    runs."""
    from sotohp_ray.pipelines.fulltext import (
        bm25_rescore_phrase, bm25_topk, documents_index,
    )
    from sotohp_ray.pipelines.fulltext import _eng2orig
    from sotohp_ray.pipelines.query import Searcher

    q = "table hash"
    plain = _by_query(bm25_topk(SF_DIR, queries=(q,)))
    r0 = _by_query(
        bm25_rescore_phrase(SF_DIR, queries=(q,), bonus=0.0)
    )
    np.testing.assert_allclose(r0[0], plain[0], atol=1e-9)

    window, bonus = 20, 2.0
    base = bm25_topk(SF_DIR, queries=(q,), k=10**9).to_pandas()
    base = base.sort_values(
        ["score", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    win = base.head(window)
    base_of = dict(zip(win["doc_id"].astype(int), win["score"]))
    idx = documents_index(SF_DIR)
    s = Searcher(idx)
    eng2orig = _eng2orig(idx, s.space)
    phrase = {
        int(eng2orig[d]) for d, _ in s.search_phrase(q, k=s.space)
    }
    got = bm25_rescore_phrase(
        SF_DIR, queries=(q,), window=window, bonus=bonus
    ).to_pandas()
    assert len(got) == 10
    for r in got.itertuples():
        d = int(r.doc_id)
        assert d in base_of, "result outside the base window"
        want = round(
            base_of[d] + (bonus if d in phrase else 0.0), 4
        )
        assert r.score == pytest.approx(want, abs=1e-9), d
    assert phrase & set(base_of), "fixture: window must contain a phrase hit"
    import pytest as _pt
    with _pt.raises(ValueError):
        bm25_rescore_phrase(SF_DIR, queries=(q,), k=30, window=20)


# --- round-5 ADVICE regression tests: tombstones/absent-id semantics ---


@pytest.fixture(scope="module")
def tombed_index(tmp_path_factory):
    """A copy of the sf0.001 documents index with the TOP tfidf hit for
    'hash join' (and, if distinct, original id 7 for the mget check)
    tombstoned but NOT compacted — tombstone-respecting readers must
    hide these docs immediately."""
    import shutil

    from sotohp_ray.pipelines import fulltext as ft
    from sotohp_ray.pipelines.delete import delete_docs

    base = ft.documents_index(SF_DIR)
    top = int(
        ft.tfidf_topk(SF_DIR, queries=("hash join",), k=1)
        .to_pandas()["doc_id"].iloc[0]
    )
    victims = sorted({top, 7})
    idx = str(tmp_path_factory.mktemp("idx_tomb"))
    shutil.rmtree(idx)
    shutil.copytree(base, idx)
    assert delete_docs(idx, paths=[f"{i:010d}" for i in victims]) == len(
        victims
    )
    return idx, top


def test_tfidf_excludes_tombstoned_doc(tombed_index, monkeypatch):
    """ADVICE r4: tfidf_topk must zero tombstoned docs like every other
    scorer — a deleted doc may not appear in TF-IDF results."""
    from sotohp_ray.pipelines import fulltext as ft

    idx, top = tombed_index
    monkeypatch.setattr(ft, "documents_index", lambda sf: idx)
    got = ft.tfidf_topk(SF_DIR, queries=("hash join",), k=10).to_pandas()
    assert len(got) == 10
    assert top not in set(got["doc_id"].astype(int))
    assert 7 not in set(got["doc_id"].astype(int))


def test_mget_omits_tombstoned_doc(tombed_index, monkeypatch):
    """ADVICE r4: _mget reports found=false for deleted docs — the
    tombstoned id must be omitted, live ids still returned."""
    from sotohp_ray.pipelines import fulltext as ft

    idx, _ = tombed_index
    monkeypatch.setattr(ft, "documents_index", lambda sf: idx)
    got = ft.docs_mget(SF_DIR, doc_ids=(0, 7, 42)).to_pandas()
    ids = set(got["doc_id"].astype(int))
    assert 7 not in ids
    assert {0, 42} <= ids


@pytest.fixture(scope="module")
def duckdb_docs():
    import duckdb

    from tools.check_oracle import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def test_pinned_skips_absent_ids(duckdb_docs):
    """ADVICE r4: pinned promotes only documents that exist — an
    out-of-corpus pin id must not produce a phantom row, surviving
    pins keep their order, and organic results fill the freed slots.
    Oracle SQL agrees on the same pin set."""
    from sotohp_ray.pipelines import fulltext as ft

    pins = (42, 10**9, 7)  # middle pin absent from the corpus
    q = ("hash join",)
    got = ft.bm25_pinned(SF_DIR, queries=q, pins=pins, k=10).to_pandas()
    assert 10**9 not in set(got["doc_id"].astype(int))
    byrank = got.sort_values("rank")
    assert list(byrank["doc_id"].astype(int))[:2] == [42, 7]
    assert list(byrank["pinned"])[:2] == [True, True]
    assert len(got) == 10 and not any(byrank["pinned"][2:])
    sql_df = duckdb_docs.sql(
        ft.bm25_pinned_sql(queries=q, pins=pins, k=10)
    ).df()
    from tools.check_oracle import compare

    assert not compare("bm25_pinned_absent", got, sql_df)


def test_msm_rounds_down():
    """ADVICE r4: positive-percentage minimum_should_match rounds DOWN
    (ES semantics): 60% of 4 distinct terms is 2, of 5 is 3, of 1 is
    clamped to 1."""
    from sotohp_ray.pipelines.fulltext import _msm_of

    assert _msm_of("alpha bravo chi delta") == 2  # floor(2.4)
    assert _msm_of("alpha bravo chi delta echo") == 3  # exact 3.0
    assert _msm_of("alpha") == 1  # clamp to >= 1


def test_decay_identity_inside_offset_and_decay_at_pivot():
    """Linear-decay semantics: a doc whose n_chars sits within
    ``offset`` of the origin keeps its plain BM25 score (mult = 1);
    one exactly ``scale`` beyond the offset edge scores exactly
    ``decay``x plain; far docs floor at 0 — checked by reconstructing
    every multiplier from the plain ranking."""
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.fulltext import bm25_decay, bm25_topk

    q = "hash join"
    plain = _by_query(bm25_topk(SF_DIR, queries=(q,), k=500))
    decayed = _by_query(bm25_decay(
        SF_DIR, queries=(q,), k=500,
        origin=300.0, offset=50.0, scale=150.0, decay=0.5,
    ))
    nch = dict(zip(
        *pq.read_table(
            f"{SF_DIR}/documents.parquet",
            columns=["doc_id", "n_chars"],
        ).to_pandas()[["doc_id", "n_chars"]].T.values
    ))
    pl = {int(d): s for d, s in plain[0]}
    pivot = 150.0 / 0.5
    seen_identity = seen_partial = False
    for d, s in decayed[0]:
        dist = max(abs(nch[int(d)] - 300.0) - 50.0, 0.0)
        mult = max((pivot - dist) / pivot, 0.0)
        # pl is itself 4-dp rounded, so reconstruction can sit one
        # grid step off the engine's round(true * mult, 4)
        assert abs(s - round(pl[int(d)] * mult, 4)) < 1.01e-4
        if dist == 0.0:
            seen_identity = True
            assert s == round(pl[int(d)], 4)
        if 0.0 < mult < 1.0:
            seen_partial = True
    assert seen_identity and seen_partial


def test_random_score_seeded_and_relevance_free():
    """random_score must be reproducible for the same seed, reorder
    under a different seed, and contain scores determined by doc_id
    alone (the ES same-seed-same-shard contract)."""
    from sotohp_ray.pipelines.fulltext import (
        RANDOM_SEED_MULT,
        bm25_random_score,
    )

    q = "hash join"
    a = _by_query(bm25_random_score(SF_DIR, queries=(q,), seed=42))
    b = _by_query(bm25_random_score(SF_DIR, queries=(q,), seed=42))
    np.testing.assert_array_equal(a[0], b[0])
    for d, s in a[0]:
        expect = ((int(d) + 42) * RANDOM_SEED_MULT) % 2**32 / 2**32
        assert s == expect
    c = _by_query(bm25_random_score(SF_DIR, queries=(q,), seed=7))
    assert set(map(tuple, c[0])) != set(map(tuple, a[0]))
