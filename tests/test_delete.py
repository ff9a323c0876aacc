"""Delete/tombstone + compaction (S5): logical deletes take effect
immediately; compaction makes the index bit-identical in results to a
fresh build without the deleted docs."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from sotohp_ray.pipelines.build_index import build_index
from sotohp_ray.pipelines.delete import (
    compact_index,
    delete_docs,
    load_tombstones,
)
from sotohp_ray.pipelines.query import Searcher


@pytest.fixture(scope="module")
def del_env(ray_session, tiny_corpus, tmp_path_factory):
    corpus_dir, _ = tiny_corpus
    index_dir = str(tmp_path_factory.mktemp("idx_del"))
    stats = build_index(corpus_dir, index_dir)
    return corpus_dir, index_dir, stats


def test_tombstones_filter_results_immediately(del_env):
    _, index_dir, stats = del_env
    s0 = Searcher(index_dir)
    base = s0.search_exact("def return value", k=64)
    victim = base[0][0]
    dm = pq.read_table(
        os.path.join(index_dir, "docmeta"), columns=["doc_id", "doc_uuid"]
    )
    uuid = dict(
        zip(dm["doc_id"].to_pylist(), dm["doc_uuid"].to_pylist())
    )[victim]
    assert delete_docs(index_dir, doc_uuids=[uuid]) == 1
    assert delete_docs(index_dir, doc_uuids=[uuid]) == 0  # idempotent
    s1 = Searcher(index_dir)
    hits = s1.search_exact("def return value", k=10)
    assert victim not in [d for d, _ in hits]
    # WAND stays rank-identical to exact under tombstones
    assert s1.search_wand("def return value", k=10) == hits
    # surviving docs keep pre-delete scores until compaction
    pre = dict(base)
    for d, sc in hits:
        assert sc == pytest.approx(pre[d])


def test_compaction_equals_fresh_build(
    del_env, tmp_path_factory, tiny_corpus
):
    corpus_dir, index_dir, stats = del_env
    n_before = Searcher(index_dir).n_docs
    deleted = load_tombstones(index_dir)
    assert deleted.size >= 1
    # also delete an engine id directly to exercise that path
    extra = 7 if 7 not in deleted else 8
    delete_docs(index_dir, engine_doc_ids=[extra])
    new_stats = compact_index(index_dir)
    assert load_tombstones(index_dir).size == 0
    assert new_stats["n_docs"] == n_before - 2
    assert new_stats["doc_id_space"] == n_before

    # fresh build over the corpus MINUS the deleted docs
    all_deleted = sorted({int(deleted[0]), extra})
    s = Searcher(index_dir)
    dmf = pq.read_table(os.path.join(index_dir, "docmeta"))
    assert not np.isin(
        dmf["doc_id"].to_numpy(zero_copy_only=False), all_deleted
    ).any()

    fresh_corpus = str(tmp_path_factory.mktemp("corpus_nodel"))
    import pyarrow as pa

    from sotohp_ray.sources.corpus import corpus_files

    # rebuild input files without the deleted (repo,path,commit) keys
    gone = set()
    dm_all = pq.read_table(os.path.join(index_dir, "docmeta"))
    kept_keys = set(zip(
        dm_all["repo"].to_pylist(), dm_all["path"].to_pylist(),
        dm_all["commit"].to_pylist(),
    ))
    for f in corpus_files(corpus_dir):
        t = pq.read_table(f)
        mask = [
            (r, p, c) in kept_keys
            for r, p, c in zip(
                t["repo"].to_pylist(), t["path"].to_pylist(),
                t["commit"].to_pylist(),
            )
        ]
        gone.update(
            (r, p) for r, p, m in zip(
                t["repo"].to_pylist(), t["path"].to_pylist(), mask
            ) if not m
        )
        pq.write_table(
            t.filter(pa.array(mask)),
            os.path.join(fresh_corpus, os.path.basename(f)),
        )
    assert len(gone) == 2
    fresh_index = str(tmp_path_factory.mktemp("idx_nodel"))
    fstats = build_index(fresh_corpus, fresh_index)
    assert fstats["n_docs"] == new_stats["n_docs"]
    sf = Searcher(fresh_index)

    # identical search RESULTS (engine ids differ — compare by doc key)
    def by_key(searcher, idx_dir, query):
        dm = pq.read_table(
            os.path.join(idx_dir, "docmeta"), columns=["doc_id", "path"]
        )
        p = dict(zip(dm["doc_id"].to_pylist(), dm["path"].to_pylist()))
        return [
            (p[d], round(sc, 9))
            for d, sc in searcher.search_exact(query, k=20)
        ]

    for q in ("def return value", "class data self", "import numpy"):
        assert by_key(s, index_dir, q) == by_key(sf, fresh_index, q)


def test_compaction_matches_fresh_build_randomized(ray_session):
    """Randomized compaction equivalence: for several random corpora
    and delete sets (including whole-partition wipes and df==1-term
    owners), delete+compact results equal a fresh build without the
    deleted docs — compared by (path, score) so id sparsity doesn't
    mask divergence."""
    import random
    import shutil
    import tempfile

    import pyarrow as pa

    from sotohp_ray.config import IndexConfig

    rng = random.Random(1234)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "uniq"]
    for trial in range(4):
        root = tempfile.mkdtemp(prefix="cmp_rand_", dir="/tmp")
        try:
            n = rng.randint(6, 14)
            texts = []
            for i in range(n):
                toks = [rng.choice(words) for _ in range(rng.randint(1, 12))]
                if i == 0:
                    toks += [f"only{trial}"] * rng.randint(1, 3)  # df==1
                texts.append(" ".join(toks))
            mk = lambda lo, hi: pa.table({
                "repo": pa.array(["r"] * (hi - lo)),
                "path": pa.array([f"{i:05d}" for i in range(lo, hi)]),
                "commit": pa.array(["0"] * (hi - lo)),
                "lang": pa.array(["x"] * (hi - lo)),
                "content": pa.array(texts[lo:hi]),
            })
            corpus = os.path.join(root, "corpus")
            os.makedirs(corpus)
            half = n // 2
            pq.write_table(mk(0, half), os.path.join(corpus, "part-00000.parquet"))
            pq.write_table(mk(half, n), os.path.join(corpus, "part-00001.parquet"))
            idx = os.path.join(root, "idx")
            build_index(corpus, idx, config=IndexConfig(num_term_shards=4))
            # random delete set — sometimes an entire partition
            if trial == 2:
                dels = list(range(half))
            else:
                dels = sorted(rng.sample(range(n), rng.randint(1, n - 2)))
            delete_docs(idx, paths=[f"{i:05d}" for i in dels])
            compact_index(idx)

            fresh_c = os.path.join(root, "fresh_corpus")
            os.makedirs(fresh_c)
            keep = [i for i in range(n) if i not in dels]
            kt = pa.table({
                "repo": pa.array(["r"] * len(keep)),
                "path": pa.array([f"{i:05d}" for i in keep]),
                "commit": pa.array(["0"] * len(keep)),
                "lang": pa.array(["x"] * len(keep)),
                "content": pa.array([texts[i] for i in keep]),
            })
            pq.write_table(kt, os.path.join(fresh_c, "part-00000.parquet"))
            fresh_i = os.path.join(root, "fresh_idx")
            build_index(fresh_c, fresh_i, config=IndexConfig(num_term_shards=4))

            def by_key(idx_dir, query):
                s = Searcher(idx_dir)
                dm = pq.read_table(
                    os.path.join(idx_dir, "docmeta"),
                    columns=["doc_id", "path"],
                )
                p = dict(zip(dm["doc_id"].to_pylist(), dm["path"].to_pylist()))
                return sorted(
                    (p[d], round(sc, 9))
                    for d, sc in s.search_exact(query, k=1000)
                )

            for q in words + [f"only{trial}", "alpha beta gamma"]:
                assert by_key(idx, q) == by_key(fresh_i, q), (trial, q, dels)
        finally:
            shutil.rmtree(root, ignore_errors=True)
