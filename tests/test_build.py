"""End-to-end build tests against the golden tiny corpus (FIXTURES.md
F2/F5/F6; reference analog: MediaServiceSynchronizeTest.scala:18-73 —
exact counts, idempotent second run, resumable sync)."""

import hashlib
import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from sotohp_ray.config import IndexConfig, TokenizerRules
from sotohp_ray.pipelines.build_index import build_index
from sotohp_ray.sources.corpus import corpus_files


@pytest.fixture(scope="session")
def tiny_index(ray_session, tiny_corpus, tmp_path_factory):
    corpus_dir, meta = tiny_corpus
    index_dir = str(tmp_path_factory.mktemp("idx_tiny"))
    stats = build_index(corpus_dir, index_dir)
    return corpus_dir, index_dir, meta, stats


def test_golden_counts(tiny_index):
    _, index_dir, meta, stats = tiny_index
    assert stats["n_docs"] == meta["rows"] == 64
    assert stats["total_tokens"] == meta["total_tokens"]
    assert stats["total_postings"] == meta["total_postings"]
    assert stats["merged"] is True
    d = pq.read_table(os.path.join(index_dir, "dictionary"))
    assert d.num_rows == meta["vocab_size"]
    # df probes (dataset3-style exact goldens)
    dfs = dict(zip(d["term"].to_pylist(), d["df"].to_pylist()))
    for term, df in meta["df_probes"].items():
        assert dfs.get(term, 0) == df, term


def test_sha256_invariant(tiny_index):
    """Per-row content sha256 equality vs the input table — THE
    BASELINE.json input_hint invariant."""
    corpus_dir, index_dir, _, _ = tiny_index
    dm = pq.read_table(os.path.join(index_dir, "docmeta"))
    by_key = {}
    for r, p, c, s in zip(
        dm["repo"].to_pylist(), dm["path"].to_pylist(),
        dm["commit"].to_pylist(), dm["content_sha256"].to_pylist(),
    ):
        by_key[(r, p, c)] = s
    n = 0
    for f in corpus_files(corpus_dir):
        t = pq.read_table(f)
        for r, p, c, content in zip(
            t["repo"].to_pylist(), t["path"].to_pylist(),
            t["commit"].to_pylist(), t["content"].to_pylist(),
        ):
            assert by_key[(r, p, c)] == hashlib.sha256(content.encode()).hexdigest()
            n += 1
    assert n == dm.num_rows


def test_docids_dense_and_sorted(tiny_index):
    _, index_dir, meta, _ = tiny_index
    dm = pq.read_table(os.path.join(index_dir, "docmeta"))
    ids = np.sort(dm["doc_id"].to_numpy(zero_copy_only=False))
    assert np.array_equal(ids, np.arange(meta["rows"], dtype=np.uint64))
    # docID order == (repo, path, commit) order (monotone key discipline)
    import pyarrow.compute as pc

    idx = pc.sort_indices(dm, sort_keys=[("doc_id", "ascending")])
    dm_sorted = dm.take(idx)
    keys = list(
        zip(
            dm_sorted["repo"].to_pylist(),
            dm_sorted["path"].to_pylist(),
            dm_sorted["commit"].to_pylist(),
        )
    )
    assert keys == sorted(keys)


def test_idempotent_rebuild(tiny_index):
    corpus_dir, index_dir, meta, _ = tiny_index
    before = pq.read_table(os.path.join(index_dir, "dictionary"))
    stats2 = build_index(corpus_dir, index_dir)
    assert stats2.get("merge_skipped") is True  # nothing re-done
    after = pq.read_table(os.path.join(index_dir, "dictionary"))
    assert before.equals(after)


def test_resume_from_partial_lineage(ray_session, tiny_corpus, tmp_path_factory):
    """F5: build partitions 0..1 only (simulated interrupt), then a
    plain re-run finishes 2..3; result identical to an uninterrupted
    build."""
    corpus_dir, meta = tiny_corpus
    idx_a = str(tmp_path_factory.mktemp("idx_resume"))
    stats_partial = build_index(corpus_dir, idx_a, only_partitions=[0, 1])
    assert stats_partial["merged"] is False
    assert stats_partial["partitions_done"] == 2
    lineage_files = sorted(os.listdir(os.path.join(idx_a, "lineage")))
    assert len(lineage_files) == 2

    # mark the already-done partitions so we can prove they're skipped
    done_before = {}
    for name in lineage_files:
        p = os.path.join(idx_a, "lineage", name)
        done_before[name] = os.stat(p).st_mtime_ns

    stats_full = build_index(corpus_dir, idx_a)
    assert stats_full["merged"] is True
    assert stats_full["partitions_done"] == 4
    for name, mtime in done_before.items():
        assert os.stat(os.path.join(idx_a, "lineage", name)).st_mtime_ns == mtime, (
            "resume re-processed an already-done partition"
        )
    # lineage records carry the required metrics (F5)
    with open(os.path.join(idx_a, "lineage", lineage_files[0])) as f:
        rec = json.load(f)
    for field in (
        "token_count", "posting_count", "input_fingerprint",
        "tokenizer_version", "base_doc_id", "doc_count",
    ):
        assert field in rec

    # logically identical to an uninterrupted build
    idx_b = str(tmp_path_factory.mktemp("idx_oneshot"))
    build_index(corpus_dir, idx_b)
    da = pq.read_table(os.path.join(idx_a, "dictionary"))
    db = pq.read_table(os.path.join(idx_b, "dictionary"))
    import pyarrow.compute as pc

    da = da.take(pc.sort_indices(da, sort_keys=[("term", "ascending")]))
    db = db.take(pc.sort_indices(db, sort_keys=[("term", "ascending")]))
    assert da.equals(db)


def test_config_change_invalidates_checkpoint(ray_session, tiny_corpus, tmp_path_factory):
    corpus_dir, _ = tiny_corpus
    idx = str(tmp_path_factory.mktemp("idx_cfg"))
    build_index(corpus_dir, idx)
    cfg2 = IndexConfig(tokenizer=TokenizerRules(stopwords=frozenset({"def"})))
    stats2 = build_index(corpus_dir, idx, config=cfg2)
    # all partitions re-done under the new tokenizer version
    assert stats2["partitions_done"] == 4
    assert stats2.get("merge_skipped") is None
    d = pq.read_table(os.path.join(idx, "dictionary"))
    assert "def" not in set(d["term"].to_pylist())


def test_salt_chunking_rank_identical(ray_session, tiny_corpus, tmp_path_factory):
    """Hot-term salt chunking (salt_rows bounds any single shuffled
    row): force multi-chunk partials with salt_rows=4 and assert the
    final index answers every probe identically to the default build —
    chunking changes the shuffle rows, never the postings."""
    from sotohp_ray.pipelines.query import Searcher

    corpus_dir, meta = tiny_corpus
    base_dir = str(tmp_path_factory.mktemp("idx_nosalt"))
    salt_dir = str(tmp_path_factory.mktemp("idx_salt"))
    build_index(corpus_dir, base_dir, config=IndexConfig())
    build_index(corpus_dir, salt_dir, config=IndexConfig(salt_rows=4))

    # the salted build really produced multi-chunk partial rows
    import glob

    max_salt = 0
    for f in glob.glob(os.path.join(salt_dir, "partials", "*", "data.parquet")):
        parts = pq.read_table(f, columns=["salt"])
        max_salt = max(max_salt, max(parts["salt"].to_pylist()))
    assert max_salt >= 1

    s0 = Searcher(base_dir)
    s1 = Searcher(salt_dir)
    for q in ("def", "def import return self", "parse http", "uniq0x0tok"):
        assert s0.search_exact(q, 20) == s1.search_exact(q, 20), q
        assert s1.search_wand(q, 20) == s1.search_exact(q, 20), q

    # dictionaries agree on df/cf for every term
    d0 = pq.read_table(os.path.join(base_dir, "dictionary"))
    d1 = pq.read_table(os.path.join(salt_dir, "dictionary"))
    m0 = {t: (df, cf) for t, df, cf in zip(
        d0["term"].to_pylist(), d0["df"].to_pylist(), d0["cf"].to_pylist())}
    m1 = {t: (df, cf) for t, df, cf in zip(
        d1["term"].to_pylist(), d1["df"].to_pylist(), d1["cf"].to_pylist())}
    assert m0 == m1


def test_incremental_append_partition(ray_session, tiny_corpus, tmp_path_factory):
    """Incremental ingestion (the reference's headline semantic:
    re-running sync only processes NEW docs, MediaServiceLive.scala:
    1522 + idempotent insert-if-absent :1286-1292): append one new
    partition file to an already-built corpus, rebuild — only the new
    partition is indexed (existing lineage untouched), the merge is
    redone, and the result equals a from-scratch build of the full
    corpus."""
    import shutil

    from sotohp_ray.sources.corpus import _gen_partition

    corpus_dir, meta = tiny_corpus
    grown = str(tmp_path_factory.mktemp("corpus_grown"))
    for f in corpus_files(corpus_dir):
        shutil.copy(f, os.path.join(grown, os.path.basename(f)))

    idx = str(tmp_path_factory.mktemp("idx_incr"))
    build_index(grown, idx)
    mtimes = {
        n: os.stat(os.path.join(idx, "lineage", n)).st_mtime_ns
        for n in os.listdir(os.path.join(idx, "lineage"))
    }

    # a 5th partition appears (deterministic from (seed, p))
    _gen_partition(grown, 4, 16, seed=42, preset="tiny", collect_tokens=False)
    stats = build_index(grown, idx)
    assert stats["partitions_done"] == 5
    assert stats["merged"] is True
    for n, m in mtimes.items():
        assert os.stat(os.path.join(idx, "lineage", n)).st_mtime_ns == m, (
            "append re-processed an existing partition"
        )

    # identical to a from-scratch build of the grown corpus
    idx_fresh = str(tmp_path_factory.mktemp("idx_incr_fresh"))
    build_index(grown, idx_fresh)
    import pyarrow.compute as pc

    da = pq.read_table(os.path.join(idx, "dictionary"))
    db = pq.read_table(os.path.join(idx_fresh, "dictionary"))
    da = da.take(pc.sort_indices(da, sort_keys=[("term", "ascending")]))
    db = db.take(pc.sort_indices(db, sort_keys=[("term", "ascending")]))
    assert da.equals(db)


def test_same_size_edit_invalidates(ray_session, tiny_corpus, tmp_path_factory):
    """A content edit that keeps the file size identical must still be
    detected by the resume filter (fingerprint includes mtime)."""
    import shutil

    corpus_dir, _ = tiny_corpus
    work = str(tmp_path_factory.mktemp("corpus_edit"))
    for f in corpus_files(corpus_dir):
        shutil.copy(f, os.path.join(work, os.path.basename(f)))
    index_dir = str(tmp_path_factory.mktemp("idx_edit"))
    build_index(work, index_dir)
    # rewrite partition 0 with identical size but different bytes
    target = corpus_files(work)[0]
    t = pq.read_table(target)
    # swap two rows (same bytes, same size, different content order —
    # docmeta sort hides row order, so flip a content char instead)
    texts = t["content"].to_pylist()
    texts[0] = ("X" + texts[0][1:]) if texts[0] else "X"
    import pyarrow as pa

    t = t.set_column(
        t.schema.get_field_index("content"), "content",
        pa.array(texts, type=t["content"].type),
    )
    pq.write_table(t, target)
    from sotohp_ray.state.lineage import input_fingerprint

    stats2 = build_index(work, index_dir)
    recs = [
        json.load(open(os.path.join(index_dir, "lineage", n)))
        for n in sorted(os.listdir(os.path.join(index_dir, "lineage")))
    ]
    assert recs[0]["input_fingerprint"] == input_fingerprint(target)
    assert stats2["merged"] is True


def test_tokenizer_rules_roundtrip_via_config_json(
    ray_session, tiny_corpus, tmp_path_factory
):
    """An index built with custom analyzer rules must query correctly
    WITHOUT re-passing the config — rules are serialized in
    config.json (round 1 stored only the version hash; a default-rules
    Searcher silently mis-tokenized queries)."""
    from sotohp_ray.pipelines.query import Searcher

    corpus_dir, _ = tiny_corpus
    index_dir = str(tmp_path_factory.mktemp("idx_rules"))
    cfg = IndexConfig(
        tokenizer=TokenizerRules(
            mappings=(("def", "function"),), stopwords=frozenset({"import"})
        )
    )
    build_index(corpus_dir, index_dir, config=cfg)
    s = Searcher(index_dir)  # no config passed
    assert s.config.tokenizer.mapping_dict() == {"def": "function"}
    assert "import" in s.config.tokenizer.stopwords
    # mapped term resolves ("def" -> "function" at query time too)
    r1 = s.search("def", k=5)
    r2 = s.search("function", k=5)
    assert r1 == r2 and len(r1) > 0
    # stopword returns nothing
    assert s.search("import", k=5) == []


def test_codec_migration_identical_results(
    ray_session, tiny_corpus, tmp_path_factory
):
    """S8 migration job: varint -> pfor in place; results bit-identical
    and the migration is resumable/no-op-safe."""
    from sotohp_ray.pipelines.migrate import migrate_codec
    from sotohp_ray.pipelines.query import Searcher

    corpus_dir, _ = tiny_corpus
    index_dir = str(tmp_path_factory.mktemp("idx_mig"))
    build_index(corpus_dir, index_dir, config=IndexConfig(codec="varint"))
    s0 = Searcher(index_dir)
    queries = ("def return value", "class data self", "import numpy")
    before = {q: s0.search_exact(q, k=20) for q in queries}
    before_wand = {q: s0.search_wand(q, k=10) for q in queries}

    out = migrate_codec(index_dir, "pfor")
    assert out["noop"] is False and out["migrated_shards"] > 0
    s1 = Searcher(index_dir)
    assert s1.config.codec == "pfor"
    for q in queries:
        assert s1.search_exact(q, k=20) == before[q]
        assert s1.search_wand(q, k=10) == before_wand[q]
    # second run is a no-op
    assert migrate_codec(index_dir, "pfor")["noop"] is True


def test_migration_preserves_path_masks(
    ray_session, tiny_corpus, tmp_path_factory
):
    """migrate_codec must carry EVERY config field into the promoted
    config.json — a field-by-field rebuild once dropped the S1 path
    masks, un-masking later syncs and spuriously invalidating all
    partition lineage via the changed config fingerprint."""
    from sotohp_ray.pipelines.migrate import migrate_codec

    corpus_dir, _ = tiny_corpus
    index_dir = str(tmp_path_factory.mktemp("idx_mig_masks"))
    cfg = IndexConfig(
        codec="varint", path_include=r"src/", path_ignore=r"\.go$"
    )
    build_index(corpus_dir, index_dir, config=cfg)
    migrate_codec(index_dir, "pfor")
    with open(os.path.join(index_dir, "config.json")) as f:
        after = IndexConfig.from_json(f.read())
    assert after.codec == "pfor"
    assert after.path_include == cfg.path_include
    assert after.path_ignore == cfg.path_ignore
    assert after.tokenizer.version_hash() == cfg.tokenizer.version_hash()


def test_migration_swap_recovery(ray_session, tiny_corpus, tmp_path_factory):
    """A migration killed between swap steps is finished by the
    recovery pass on the next call; readers never see a mixed state."""
    import shutil

    from sotohp_ray.pipelines.migrate import migrate_codec
    from sotohp_ray.pipelines.query import Searcher

    corpus_dir, _ = tiny_corpus
    index_dir = str(tmp_path_factory.mktemp("idx_swapcrash"))
    build_index(corpus_dir, index_dir, config=IndexConfig(codec="varint"))
    s0 = Searcher(index_dir)
    before = s0.search_exact("def return value", k=20)

    # simulate a crash between step (2) and (3): dictionary renamed
    # away, staging complete, config.json.next written
    migrate_codec(index_dir, "pfor")
    # roll the index back to varint to stage again cleanly
    migrate_codec(index_dir, "varint")
    dict_dir = os.path.join(index_dir, "dictionary")
    staging = os.path.join(index_dir, "dictionary.migrating-pfor")
    shutil.copytree(dict_dir, staging)  # stand-in for staged output
    # re-encode staging for real so contents are valid pfor
    shutil.rmtree(staging)
    from sotohp_ray.pipelines.migrate import (
        _MANIFEST, _dict_fingerprint, _migrate_shard,
    )

    os.makedirs(staging)
    for name in sorted(os.listdir(dict_dir)):
        if name.endswith(".parquet"):
            _migrate_shard(
                os.path.join(dict_dir, name), os.path.join(staging, name),
                "varint", "pfor", IndexConfig().block_size,
            )
    from sotohp_ray.state.lineage import write_json

    # a real migration stamps the staging dir before staging shards
    write_json(os.path.join(staging, _MANIFEST), {
        "source_fingerprint": _dict_fingerprint(dict_dir),
        "target_codec": "pfor",
    })
    cfg = IndexConfig(codec="pfor")
    write_json(os.path.join(index_dir, "config.json.next"),
               json.loads(cfg.to_json()))
    os.replace(dict_dir, dict_dir + ".old")  # crash right here

    out = migrate_codec(index_dir, "pfor")  # recovery finishes the swap
    assert out["noop"] is True  # recovered to pfor before the run
    s1 = Searcher(index_dir)
    assert s1.config.codec == "pfor"
    assert s1.search_exact("def return value", k=20) == before
    assert not os.path.exists(os.path.join(index_dir, "config.json.next"))
    assert not os.path.isdir(dict_dir + ".old")


def test_migration_stale_staging_discarded(
    ray_session, tiny_corpus, tmp_path_factory
):
    """A staging dir left by an interrupted migration must be DISCARDED
    when the dictionary was rewritten in between (delete+compact here):
    resuming by filename alone would promote pre-compaction postings
    and resurrect deleted docs (ADVICE r2, medium)."""
    import shutil

    from sotohp_ray.pipelines.delete import compact_index, delete_docs
    from sotohp_ray.pipelines.migrate import (
        _MANIFEST, _dict_fingerprint, _migrate_shard, migrate_codec,
    )
    from sotohp_ray.pipelines.query import Searcher
    from sotohp_ray.state.lineage import write_json

    corpus_dir, _ = tiny_corpus
    index_dir = str(tmp_path_factory.mktemp("idx_stale_staging"))
    build_index(corpus_dir, index_dir, config=IndexConfig(codec="varint"))
    dict_dir = os.path.join(index_dir, "dictionary")
    staging = os.path.join(index_dir, "dictionary.migrating-pfor")

    # interrupted migration: staging fully written, swap never started
    os.makedirs(staging)
    write_json(os.path.join(staging, _MANIFEST), {
        "source_fingerprint": _dict_fingerprint(dict_dir),
        "target_codec": "pfor",
    })
    for name in sorted(os.listdir(dict_dir)):
        if name.endswith(".parquet"):
            _migrate_shard(
                os.path.join(dict_dir, name), os.path.join(staging, name),
                "varint", "pfor", IndexConfig().block_size,
            )

    # dictionary rewritten between the interrupt and the retry
    s0 = Searcher(index_dir)
    victim = s0.search_exact("def return value", k=1)[0][0]
    delete_docs(index_dir, engine_doc_ids=[victim])
    compact_index(index_dir)
    expected = Searcher(index_dir).search_exact("def return value", k=20)
    assert all(d != victim for d, _ in expected)

    out = migrate_codec(index_dir, "pfor")
    assert out["noop"] is False
    got = Searcher(index_dir).search_exact("def return value", k=20)
    assert got == expected  # stale staged shards were NOT promoted
    assert all(d != victim for d, _ in got)
    shutil.rmtree(index_dir, ignore_errors=True)


def test_recovery_staging_derived_from_intent_codec(
    ray_session, tiny_corpus, tmp_path_factory
):
    """Recovery must promote the staging dir NAMED BY config.json.next,
    not an alphabetically-first leftover from a different codec's
    abandoned migration (ADVICE r2: glob()[0] picked the wrong dir)."""
    from sotohp_ray.pipelines.migrate import (
        _MANIFEST, _dict_fingerprint, _migrate_shard, migrate_codec,
    )
    from sotohp_ray.pipelines.query import Searcher
    from sotohp_ray.state.lineage import write_json

    corpus_dir, _ = tiny_corpus
    index_dir = str(tmp_path_factory.mktemp("idx_intent_codec"))
    build_index(corpus_dir, index_dir, config=IndexConfig(codec="pfor"))
    before = Searcher(index_dir).search_exact("def return value", k=20)
    dict_dir = os.path.join(index_dir, "dictionary")

    # abandoned leftover that sorts BEFORE the real staging dir
    leftover = os.path.join(index_dir, "dictionary.migrating-aaa")
    os.makedirs(leftover)

    # real crash state: migrating pfor -> varint, killed between the
    # dictionary rename (2) and the staging promote (3)
    staging = os.path.join(index_dir, "dictionary.migrating-varint")
    os.makedirs(staging)
    write_json(os.path.join(staging, _MANIFEST), {
        "source_fingerprint": _dict_fingerprint(dict_dir),
        "target_codec": "varint",
    })
    for name in sorted(os.listdir(dict_dir)):
        if name.endswith(".parquet"):
            _migrate_shard(
                os.path.join(dict_dir, name), os.path.join(staging, name),
                "pfor", "varint", IndexConfig().block_size,
            )
    write_json(os.path.join(index_dir, "config.json.next"),
               json.loads(IndexConfig(codec="varint").to_json()))
    os.replace(dict_dir, dict_dir + ".old")  # crash right here

    out = migrate_codec(index_dir, "varint")
    assert out["noop"] is True  # recovery finished the varint swap
    s1 = Searcher(index_dir)
    assert s1.config.codec == "varint"
    assert s1.search_exact("def return value", k=20) == before


def test_build_after_compaction_keeps_doc_id_space(
    ray_session, tiny_corpus, tmp_path_factory
):
    """build_index re-run after compact_index must keep doc_id_space >=
    max doc id (stats rewrite previously dropped it and Searcher
    crashed on sparse ids)."""
    from sotohp_ray.pipelines.delete import compact_index, delete_docs
    from sotohp_ray.pipelines.query import Searcher

    corpus_dir, _ = tiny_corpus
    index_dir = str(tmp_path_factory.mktemp("idx_space"))
    build_index(corpus_dir, index_dir)
    delete_docs(index_dir, engine_doc_ids=[0, 5])
    compact_index(index_dir)
    stats = build_index(corpus_dir, index_dir)  # resume path
    assert stats["doc_id_space"] == 64
    s = Searcher(index_dir)  # must not IndexError
    assert s.space == 64 and s.n_docs == 62
    assert len(s.search_exact("def return value", k=10)) > 0


def test_delete_rejects_unknown_engine_ids(
    ray_session, tiny_corpus, tmp_path_factory
):
    """Out-of-space ids are caller errors (an unvalidated tombstone
    would crash every Searcher); in-space ids absent from docmeta are
    already-deleted no-ops (repeat-a-delete stays idempotent even
    across a compaction)."""
    from sotohp_ray.pipelines.delete import compact_index, delete_docs

    corpus_dir, _ = tiny_corpus
    index_dir = str(tmp_path_factory.mktemp("idx_badid"))
    build_index(corpus_dir, index_dir)
    with pytest.raises(ValueError, match="outside the index id space"):
        delete_docs(index_dir, engine_doc_ids=[10**9])
    assert delete_docs(index_dir, engine_doc_ids=[3]) == 1
    compact_index(index_dir)
    # re-issuing the delete after compaction is a no-op, not an error
    assert delete_docs(index_dir, engine_doc_ids=[3]) == 0


def test_s1_path_masks_equal_prefiltered_corpus(
    ray_session, tiny_corpus, tmp_path_factory
):
    """S1 include/ignore masks: building WITH masks must equal building
    from a corpus pre-filtered to the same row subset — identical
    per-path results on every query (doc ids differ by design: masked
    builds keep partition bases, so the id space is gapped).
    Reference analog: FileSystemSearch.scala:56-77."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.query import Searcher
    from sotohp_ray.sources.corpus import corpus_files

    corpus_dir, _ = tiny_corpus
    include, ignore = r"src/pkg1", r"\.(js|go)$"

    # reference: manually pre-filtered corpus
    import re

    filt_dir = str(tmp_path_factory.mktemp("corpus_masked"))
    kept_paths = []
    for f in corpus_files(corpus_dir):
        t = pq.read_table(f)
        keep = [
            bool(re.search(include, p)) and not re.search(ignore, p)
            for p in t["path"].to_pylist()
        ]
        sub = t.filter(pa.array(keep))
        kept_paths += sub["path"].to_pylist()
        if sub.num_rows:
            pq.write_table(
                sub, os.path.join(filt_dir, os.path.basename(f))
            )
    assert 0 < len(kept_paths) < 64  # masks actually select a subset

    idx_masked = str(tmp_path_factory.mktemp("idx_masked"))
    stats_m = build_index(
        corpus_dir, idx_masked,
        config=IndexConfig(path_include=include, path_ignore=ignore),
    )
    idx_ref = str(tmp_path_factory.mktemp("idx_prefiltered"))
    stats_r = build_index(filt_dir, idx_ref, config=IndexConfig())
    assert stats_m["n_docs"] == stats_r["n_docs"] == len(kept_paths)

    def by_path(index_dir, q):
        s = Searcher(index_dir)
        dm = pq.read_table(
            os.path.join(index_dir, "docmeta"), columns=["doc_id", "path"]
        )
        path_of = dict(
            zip(dm["doc_id"].to_pylist(), dm["path"].to_pylist())
        )
        return sorted(
            (path_of[d], round(sc, 9))
            for d, sc in s.search_exact(q, k=s.space)
        )

    for q in ("def return value", "import self", "parse http request"):
        assert by_path(idx_masked, q) == by_path(idx_ref, q), q
