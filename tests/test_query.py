"""Rank-identity tests (FIXTURES.md F4): engine top-k must equal the
brute-force BM25 oracle — docIDs rank-identical, scores bit-close —
and block-max WAND must equal exact scoring EXACTLY (WAND skips work,
never changes answers)."""

import pytest

from sotohp_ray.config import IndexConfig
from sotohp_ray.oracle import BruteForceBM25
from sotohp_ray.pipelines.build_index import build_index
from sotohp_ray.pipelines.query import Searcher
from sotohp_ray.sources.corpus import reference_queries


@pytest.fixture(scope="session")
def small_index(ray_session, small_corpus, tmp_path_factory):
    corpus_dir, meta = small_corpus
    index_dir = str(tmp_path_factory.mktemp("idx_small"))
    stats = build_index(corpus_dir, index_dir)
    return corpus_dir, index_dir, meta, stats


@pytest.fixture(scope="session")
def small_oracle(small_corpus):
    return BruteForceBM25(small_corpus[0])


def _assert_rank_identical(engine, oracle, q):
    assert [d for d, _ in engine] == [d for d, _ in oracle], q
    for (_, a), (_, b) in zip(engine, oracle):
        assert a == pytest.approx(b, rel=1e-9, abs=1e-12), q


def test_rank_identical_vs_oracle(small_index, small_oracle):
    _, index_dir, _, _ = small_index
    s = Searcher(index_dir)
    queries = reference_queries(small_index[0])
    assert len(queries) == 60
    for q in queries:
        exact = s.search_exact(q["q"], q["k"])
        ref = small_oracle.search(q["q"], q["k"])
        _assert_rank_identical(exact, ref, q)


def test_wand_equals_exact(small_index):
    _, index_dir, _, _ = small_index
    s = Searcher(index_dir)
    for q in reference_queries(small_index[0]):
        exact = s.search_exact(q["q"], q["k"])
        wand = s.search_wand(q["q"], q["k"])
        assert wand == exact, q  # bit-identical scores AND order


def test_empty_and_absent_queries(small_index):
    _, index_dir, _, _ = small_index
    s = Searcher(index_dir)
    assert s.search("", 10) == []
    assert s.search("42 17", 10) == []  # tokenizes to nothing
    assert s.search("zzznotfound", 10) == []


def test_k_larger_than_matches(small_index):
    _, index_dir, _, _ = small_index
    s = Searcher(index_dir)
    r = s.search("uniq0x0tok", 50)  # df=1 term
    assert len(r) == 1


def test_wand_fallback_paths_identical(small_index):
    """Forcing immediate fallback, pure WAND (no fallback), and exact
    must all agree — the adaptive cutover changes work, not answers."""
    _, index_dir, _, _ = small_index
    s = Searcher(index_dir)
    for q in reference_queries(small_index[0])[:25]:
        exact = s.search_exact(q["q"], q["k"])
        pure = s.search_wand(q["q"], q["k"], max_iters=10**9)
        forced = s.search_wand(q["q"], q["k"], max_iters=1)
        assert pure == exact, q
        assert forced == exact, q


def test_pfor_codec_same_results(ray_session, tiny_corpus, tmp_path_factory):
    corpus_dir, _ = tiny_corpus
    idx_v = str(tmp_path_factory.mktemp("idx_varint"))
    idx_p = str(tmp_path_factory.mktemp("idx_pfor"))
    build_index(corpus_dir, idx_v, config=IndexConfig(codec="varint"))
    build_index(corpus_dir, idx_p, config=IndexConfig(codec="pfor"))
    sv, sp = Searcher(idx_v), Searcher(idx_p)
    for q in reference_queries(corpus_dir)[:20]:
        assert sv.search(q["q"], q["k"]) == sp.search(q["q"], q["k"])


def test_small_block_size_wand(ray_session, tiny_corpus, tmp_path_factory):
    """Tiny blocks force real block skipping in WAND."""
    corpus_dir, _ = tiny_corpus
    idx = str(tmp_path_factory.mktemp("idx_bs8"))
    build_index(corpus_dir, idx, config=IndexConfig(block_size=8))
    s = Searcher(idx)
    for q in reference_queries(corpus_dir):
        assert s.search_wand(q["q"], q["k"]) == s.search_exact(q["q"], q["k"])
