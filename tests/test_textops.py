"""Training-data operator tests over the real testdata tables
(dedup / near-dup / text analysis / ANN — the 100 TB pipeline ops)."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _ray(ray_session):
    yield


def test_dedup_exact_no_dups_in_testdata():
    from sotohp_ray.pipelines.textops import dedup_exact

    df = dedup_exact(SF).to_pandas()
    # testdata documents are all distinct -> every group size 1
    assert len(df) == 500
    assert (df["n_dups"] == 1).all()
    assert set(df["keep_id"]) == set(range(500))


def test_dedup_exact_finds_planted_dups(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.textops import dedup_exact

    t = pa.table(
        {
            "doc_id": pa.array([5, 1, 2, 9], pa.int64()),
            "text": pa.array(["same text", "same text", "other", "same text"]),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    df = dedup_exact(str(d)).to_pandas().sort_values("n_dups")
    assert list(df["n_dups"]) == [1, 3]
    assert df[df["n_dups"] == 3]["keep_id"].iloc[0] == 1  # lowest id kept


def test_minhash_self_similarity():
    """Identical docs land in identical buckets for every band."""
    from sotohp_ray.functions.hashing import (
        minhash_params, minhash_signature, shingle_hashes,
    )

    a, b = minhash_params(64)
    toks = "the quick brown fox jumps over the lazy dog".split()
    s1 = minhash_signature(shingle_hashes(toks), a, b)
    s2 = minhash_signature(shingle_hashes(list(toks)), a, b)
    assert np.array_equal(s1, s2)
    # disjoint docs -> (almost surely) different signatures
    s3 = minhash_signature(shingle_hashes(["totally", "different", "words", "here"]), a, b)
    assert not np.array_equal(s1, s3)


def test_minhash_jaccard_estimate():
    from sotohp_ray.functions.hashing import (
        minhash_params, minhash_signature, shingle_hashes,
    )

    a, b = minhash_params(256)
    base = [f"tok{i}" for i in range(50)]
    half = base[:25] + [f"other{i}" for i in range(25)]
    s1 = minhash_signature(shingle_hashes(base, 1), a, b)
    s2 = minhash_signature(shingle_hashes(half, 1), a, b)
    est = (s1 == s2).mean()
    true_j = 25 / 75
    assert abs(est - true_j) < 0.12


def test_near_dup_pairs_planted(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.textops import near_dup_pairs

    base = " ".join(f"tok{i} filler{i % 7}" for i in range(60))
    near = base.replace("tok3", "tokx").replace("tok40", "toky")
    far = " ".join(f"zz{i} yy{i}" for i in range(60))
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([base, near, far]),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    out = near_dup_pairs(str(d), threshold=0.5).to_pandas()
    assert (0, 1) in set(zip(out["doc_a"], out["doc_b"]))
    assert all((a, b) != (0, 2) and (a, b) != (1, 2) for a, b in zip(out["doc_a"], out["doc_b"]))


def test_near_dup_pair_cache_reused(tmp_path, monkeypatch):
    """A second consumer of the verified pair table (near_dup_dedup,
    corpus_dedup_near, repeated pair queries) must serve from the
    durable pair cache — ZERO shingle/verify work — and see the exact
    same pairs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines import textops

    base = " ".join(f"tok{i} filler{i % 7}" for i in range(60))
    near = base.replace("tok3", "tokx")
    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([base, near]),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    first = textops.near_dup_pairs(str(d), threshold=0.5)

    def boom(*a, **k):
        raise AssertionError("pair table recomputed despite cache")

    monkeypatch.setattr(textops, "_near_dup_pairs_compute", boom)
    again = textops.near_dup_pairs(str(d), threshold=0.5)
    assert again.equals(first)
    # dedup + cleaned corpus run entirely off the cache too
    textops.near_dup_dedup(str(d), threshold=0.5)
    textops.corpus_dedup_near(str(d), threshold=0.5).to_pandas()


def test_fnv1a64_array_matches_scalar():
    """Vectorized FNV-1a (one masked pass per byte position) must be
    byte-for-byte identical to the scalar reference definition,
    including empty and multi-byte-UTF8 strings and chunked/offset
    arrays — it feeds simhash_fingerprints, so a mismatch silently
    changes every fingerprint."""
    import pyarrow as pa

    from sotohp_ray.functions.hashing import fnv1a64, fnv1a64_array

    toks = ["", "a", "tok", "tok1", "naïve", "日本語", "x" * 300, "b"]
    arr = pa.array(toks)
    got = fnv1a64_array(arr)
    expect = [fnv1a64(t.encode()) for t in toks]
    assert [int(v) for v in got] == expect
    # sliced (non-zero offset) and chunked inputs take the buffer path
    assert [int(v) for v in fnv1a64_array(arr.slice(2, 4))] == expect[2:6]
    ch = pa.chunked_array([toks[:3], toks[3:]])
    assert [int(v) for v in fnv1a64_array(ch)] == expect


def test_simhash_batch_stage_matches_scalar(tmp_path):
    """simhash_fingerprints (vectorized batch stage) must produce the
    same fingerprint as scalar simhash64 over the stage's tokenizer
    output for every doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.functions.hashing import simhash64
    from sotohp_ray.pipelines.textops import _TOK, simhash_fingerprints

    texts = [
        "def parse(x): return x + 1",
        "the quick brown fox jumps over the lazy dog " * 5,
        "",
        "naïve café déjà-vu 日本語テキスト",
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    out = simhash_fingerprints(str(d)).to_pandas()
    out = out.set_index("doc_id")["simhash_hex"].to_dict()
    for i, txt in enumerate(texts):
        toks = _TOK.tokens_of(txt)
        assert out[i] == f"{simhash64(toks):016x}", i


def test_simhash_hamming_close_for_near_dups():
    from sotohp_ray.functions.hashing import hamming64, simhash64

    base = [f"tok{i}" for i in range(100)]
    near = base[:-3] + ["a", "b", "c"]
    far = [f"other{i}" for i in range(100)]
    h1, h2, h3 = simhash64(base), simhash64(near), simhash64(far)
    assert hamming64(h1, h2) < 12
    assert hamming64(h1, h3) > 20


def test_knn_cosine_matches_numpy_brute():
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.ann import knn_cosine

    out = knn_cosine(SF).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    col = t["embedding"].combine_chunks()
    dim = len(col[0])
    X = (
        col.flatten().to_numpy(zero_copy_only=False)
        .astype(np.float64).reshape(len(ids), dim)
    )
    Xn = X / np.linalg.norm(X, axis=1)[:, None]
    for q in range(5):
        s = np.round(Xn @ Xn[q], 5)
        mask = ids != q
        order = np.lexsort((ids[mask], -s[mask]))[:10]
        expect = list(zip(ids[mask][order], s[mask][order]))
        got = out[out["query_id"] == q].sort_values(
            ["score", "vec_id"], ascending=[False, True]
        )
        assert list(got["vec_id"]) == [int(v) for v, _ in expect]


def test_ann_lsh_recall():
    """LSH multi-probe recall@10 vs brute force must be reasonable."""
    from sotohp_ray.pipelines.ann import ann_lsh_search, knn_cosine

    brute = knn_cosine(SF).to_pandas()
    approx = ann_lsh_search(SF).to_pandas()
    recalls = []
    for q in range(5):
        bs = set(brute[brute["query_id"] == q]["vec_id"])
        as_ = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(bs & as_) / len(bs))
    assert np.mean(recalls) >= 0.5, recalls


def test_quality_and_langid_schema():
    from sotohp_ray.pipelines.textops import lang_guess, quality_stats

    q = quality_stats(SF).to_pandas()
    assert set(q.columns) == {"doc_id", "n_chars", "n_tokens", "n_distinct_terms"}
    assert (q["n_tokens"] >= q["n_distinct_terms"]).all()
    lg = lang_guess(SF).to_pandas()
    assert set(lg["lang_guess"]) <= {"en", "und"}


def test_minhash_short_rows_batch_independent():
    """Identical short docs (fewer tokens than the shingle window) must
    get identical signatures regardless of batch composition — the
    round-1 reduceat bug folded other rows' hashes into short rows."""
    from sotohp_ray.functions.hashing import (
        batch_minhash_signatures, minhash_params,
    )

    a, b = minhash_params(16)
    # rows: [t1 t2], [x]*5, [t1 t2]  (two identical short rows split by
    # a longer one)
    parents = np.array([0, 0, 1, 1, 1, 1, 1, 2, 2], dtype=np.int64)
    th = np.array([11, 22, 7, 8, 9, 10, 12, 11, 22], dtype=np.uint64)
    sig = batch_minhash_signatures(parents, th, 3, a, b, shingle_n=3)
    assert np.array_equal(sig[0], sig[2])
    # and the same row alone in its own batch gets the same signature
    solo = batch_minhash_signatures(
        np.array([0, 0], dtype=np.int64),
        np.array([11, 22], dtype=np.uint64), 1, a, b, shingle_n=3,
    )
    assert np.array_equal(sig[0], solo[0])


def test_embedding_near_dup_bucketed_matches_brute():
    """The per-LSH-bucket physical plan must produce the identical
    pair set as the broadcast all-pairs plan."""
    from sotohp_ray.pipelines.ann import embedding_near_dup

    brute = embedding_near_dup(SF, bucketed=False).to_pandas()
    bucketed = embedding_near_dup(
        SF, bucketed=True, lsh_planes=2, lsh_tables=16
    ).to_pandas()
    a = set(zip(brute["vec_id_a"], brute["vec_id_b"]))
    b = set(zip(bucketed["vec_id_a"], bucketed["vec_id_b"]))
    assert a == b and len(a) > 0


def test_simhash_near_dups_planted(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.textops import simhash_near_dups

    base = " ".join(f"tok{i} filler{i % 7}" for i in range(80))
    near = base.replace("tok3", "tokx")
    far = " ".join(f"zz{i} yy{i}" for i in range(80))
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([base, near, far]),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    out = simhash_near_dups(str(d)).to_pandas()
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert (0, 1) in got
    assert (0, 2) not in got and (1, 2) not in got


def test_doc_fingerprint_vectorized_contract(tmp_path):
    """0 for <3 tokens; 1 when the shingle count fits one window;
    distinct window minima otherwise — and batch-composition
    independent."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.textops import doc_fingerprint

    texts = [
        "one two",                               # 2 tokens -> 0
        "one two three four five six",           # 6 tokens -> 4 shingles <= window -> 1
        " ".join(f"tok{i}" for i in range(30)),  # 28 shingles -> windowed
        "",                                      # empty -> 0
    ]
    t = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    out = doc_fingerprint(str(d)).to_pandas().sort_values("doc_id")
    vals = list(out["n_fingerprints"])
    assert vals[0] == 0 and vals[3] == 0
    assert vals[1] == 1
    assert 1 <= vals[2] <= 25


def test_ann_ivf_search_recall_and_exactness():
    """IVF probe machinery: probing EVERY centroid must equal brute
    force exactly (the approximation is ONLY the probe subset), and
    default probes keep useful recall."""
    from sotohp_ray.pipelines.ann import ann_ivf_search, knn_cosine

    brute = knn_cosine(SF).to_pandas()
    full = ann_ivf_search(SF, n_centroids=16, n_probe=16).to_pandas()
    for q in range(5):
        bs = list(brute[brute.query_id == q].sort_values(
            ["score", "vec_id"], ascending=[False, True]).vec_id)
        fs = list(full[full.query_id == q].sort_values(
            ["score", "vec_id"], ascending=[False, True]).vec_id)
        assert bs == fs, q

    approx = ann_ivf_search(SF).to_pandas()
    recalls = []
    for q in range(5):
        bs = set(brute[brute.query_id == q].vec_id)
        as_ = set(approx[approx.query_id == q].vec_id)
        recalls.append(len(bs & as_) / len(bs))
    assert np.mean(recalls) >= 0.35, recalls


def test_ivf_training_unbiased_on_cluster_sorted_table(tmp_path):
    """IVF centroid training must stay uniform when the table is
    PHYSICALLY SORTED by the latent cluster key: the round-2 sampler
    read the first row groups, so on this fixture (4 clusters, rows
    ordered by cluster, 256-row row groups, sample_rows=256) it
    trained only on cluster 0 and probe-1 recall collapsed. The
    multiplicative-hash sample sees every cluster."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.ann import (
        _normalize, _train_centroids, ann_ivf_search, knn_cosine,
    )

    rng = np.random.RandomState(7)
    dim, per = 8, 500
    centers = np.eye(4, dim) * 10.0  # well-separated cluster centers
    X = np.concatenate(
        [centers[c] + rng.normal(0, 0.3, (per, dim)) for c in range(4)]
    )
    t = pa.table({
        "vec_id": pa.array(np.arange(4 * per), pa.int64()),
        "embedding": pa.array(
            [row.astype(np.float32) for row in X],
            pa.list_(pa.float32()),
        ),
        "label": pa.array(np.repeat(np.arange(4), per), pa.int32()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "embeddings.parquet"), row_group_size=256)

    # 1) trained centroids cover ALL 4 clusters despite sample<cluster0
    C = _train_centroids(str(d), n_centroids=4, sample_rows=256)
    Cn = _normalize(centers.astype(np.float64))
    for c in range(4):
        assert (C @ Cn[c]).max() > 0.9, f"cluster {c} not represented"

    # 2) probe-1 IVF recall vs brute on one query per cluster
    qids = [0, per, 2 * per, 3 * per]
    brute = knn_cosine(str(d), query_ids=qids).to_pandas()
    approx = ann_ivf_search(
        str(d), query_ids=qids, n_centroids=4, n_probe=1
    ).to_pandas()
    for q in qids:
        bs = set(brute[brute.query_id == q].vec_id)
        as_ = set(approx[approx.query_id == q].vec_id)
        assert len(bs & as_) / len(bs) >= 0.9, q


def _brute_shingle_sets(texts, shingle_n=3):
    """Reference shingle sets mirroring the pipeline contract: token
    3-gram tuples; 0 < len < n -> one whole-row shingle (ORDER-
    INSENSITIVE, matching the engine's segment-sum rule — sorted
    tuple canonicalization); empty -> {}."""
    from sotohp_ray.functions.tokenizer import CodeTokenizer

    tok = CodeTokenizer()
    out = []
    for t in texts:
        toks = tok.tokens_of(t)
        if len(toks) >= shingle_n:
            out.append({
                tuple(toks[i:i + shingle_n])
                for i in range(len(toks) - shingle_n + 1)
            })
        elif toks:
            out.append({tuple(sorted(toks))})
        else:
            out.append(set())
    return out


def test_near_dup_pairs_jaccard_matches_bruteforce(tmp_path):
    """Every emitted pair's jaccard must equal the brute-force shingle
    jaccard, every pair must be above threshold, and every
    identical-content pair must be present (identical contents share
    every LSH bucket, so they are guaranteed candidates)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.textops import near_dup_pairs

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(50)]
    texts = []
    # 6 base docs, each with 2-4 exact copies and 1-2 mutated variants
    for b in range(6):
        base = " ".join(rng.choice(vocab, size=40))
        copies = int(rng.integers(2, 5))
        texts += [base] * copies
        for _ in range(int(rng.integers(1, 3))):
            toks = base.split()
            for pos in rng.integers(0, 40, size=3):
                toks[int(pos)] = f"mut{int(rng.integers(0, 9))}"
            texts.append(" ".join(toks))
    # plus unrelated docs
    for _ in range(8):
        texts.append(" ".join(rng.choice(vocab[25:], size=12)))
    n = len(texts)
    t = pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(texts),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    thr = 0.5
    out = near_dup_pairs(str(d), threshold=thr).to_pandas()
    sets = _brute_shingle_sets(texts)

    def brute_jac(i, j):
        u = len(sets[i] | sets[j])
        return len(sets[i] & sets[j]) / u if u else 0.0

    got = {(a, b): j for a, b, j in
           zip(out["doc_a"], out["doc_b"], out["jaccard"])}
    assert got, "no pairs found"
    for (a, b), j in got.items():
        assert a < b
        bj = brute_jac(int(a), int(b))
        assert bj >= thr, (a, b, bj)
        assert abs(j - round(bj, 6)) < 1e-9, (a, b, j, bj)
    # all identical-content pairs present at jaccard 1.0
    for i in range(n):
        for k in range(i + 1, n):
            if sets[i] and sets[i] == sets[k]:
                assert got.get((i, k)) == 1.0, (i, k)


def test_near_dup_mega_bucket_collapse(tmp_path):
    """A planted 5000-identical-doc cluster (one mega dup-bucket per
    band) must complete fast via representative collapse and emit the
    full clique plus the cross pairs to a small mutated cluster —
    per-pair verification would be 12.5M intersect1d calls."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.textops import near_dup_pairs

    B = 5000
    base = " ".join(f"tok{i} filler{i % 7}" for i in range(60))
    mutated = base.replace("tok3", "tokx")  # high-jaccard variant
    far = " ".join(f"zz{i} yy{i}" for i in range(60))
    ids = [0, 1] + list(range(10, 10 + B))
    texts = [mutated, far] + [base] * B
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    t0 = time.perf_counter()
    out = near_dup_pairs(str(d), threshold=0.6).to_pandas()
    wall = time.perf_counter() - t0
    a = out["doc_a"].to_numpy()
    b = out["doc_b"].to_numpy()
    j = out["jaccard"].to_numpy()
    in_cluster = (a >= 10) & (b >= 10)
    assert in_cluster.sum() == B * (B - 1) // 2
    assert (j[in_cluster] == 1.0).all()
    # mutated doc 0 pairs with EVERY cluster member at the same jaccard
    cross = (a == 0) & (b >= 10)
    assert cross.sum() == B
    assert np.unique(j[cross]).size == 1 and j[cross][0] >= 0.6
    # far doc 1 pairs with nothing
    assert ((a == 1) | (b == 1)).sum() == 0
    # Budget separates collapse (O(reps^2) verify + one expansion pass
    # over the 12.5M-pair output, ~1 min on a healthy host) from the
    # per-pair path (16 bands x 12.5M intersect1d calls, ~1 h). Sized
    # for this sandbox's degraded windows, where host vCPU contention
    # inflates identical runs 2-3x (observed 127 s -> 302 s).
    assert wall < 420, f"mega-bucket collapse too slow: {wall:.1f}s"


def test_simhash_mega_bucket_collapse(tmp_path):
    """Same planted mega-cluster through the SimHash path: identical
    sigs collapse to one rep, the clique is emitted once, and the
    near variant expands against every member."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.textops import simhash_near_dups

    B = 3000
    base = " ".join(f"tok{i} filler{i % 7}" for i in range(80))
    near = base.replace("tok3", "tokx")
    far = " ".join(f"zz{i} yy{i}" for i in range(80))
    ids = [0, 1] + list(range(10, 10 + B))
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([near, far] + [base] * B),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    out = simhash_near_dups(str(d)).to_pandas()
    a = out["doc_a"].to_numpy()
    b = out["doc_b"].to_numpy()
    in_cluster = (a >= 10) & (b >= 10)
    assert in_cluster.sum() == B * (B - 1) // 2
    cross = (a == 0) & (b >= 10)
    assert cross.sum() == B  # near variant pairs with every member
    assert ((a == 1) | (b == 1)).sum() == 0


def test_near_dup_dedup_clusters_transitively(tmp_path):
    """Connected-component dedup: a chain A~B~C clusters all three to
    min(A) even when A and C are not directly near-dup; the clustering
    equals brute-force components over the engine's own pair set."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.textops import near_dup_dedup, near_dup_pairs

    # chain: three 40-token windows sliding by 5 over one stream —
    # adjacent windows share 35 tokens (shingle jaccard ~0.77, above
    # the 0.65 threshold), windows two apart share 30 (~0.58, below),
    # so the cluster only forms transitively
    stream = [f"tok{i}" for i in range(50)]
    docs = [" ".join(stream[5 * k: 5 * k + 40]) for k in range(3)]
    far = " ".join(f"zz{i}" for i in range(40))
    # an exact-dup pair, disjoint from the chain
    dup = " ".join(f"qq{i}" for i in range(40))
    t = pa.table({
        "doc_id": pa.array([10, 11, 12, 50, 60, 61], pa.int64()),
        "text": pa.array(docs + [far, dup, dup]),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    pairs = near_dup_pairs(str(d), threshold=0.65).to_pandas()
    # adjacent chain links present, two-apart absent (transitivity is
    # what the clustering adds)
    ps = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (10, 11) in ps and (11, 12) in ps and (10, 12) not in ps
    got = near_dup_dedup(str(d), threshold=0.65).to_pandas()
    canon = dict(zip(got["doc_id"], got["canonical_id"]))

    # brute-force components over the same pair set
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(pairs["doc_a"], pairs["doc_b"]):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    expect = {}
    for x in set(pairs["doc_a"]) | set(pairs["doc_b"]):
        expect[int(x)] = find(int(x))
    assert canon == expect
    # the chain is one cluster rooted at 10; the dup pair at 60
    assert canon[10] == canon[11] == canon[12] == 10
    assert canon[60] == canon[61] == 60
    # far doc is in no cluster
    assert 50 not in canon


def test_keyword_exclude_unmatchable_literal_excludes_nothing():
    """A MUST_NOT keyword the analyzer would transform ('Slow'
    case-folds) can never match an analyzed token list, so it must
    exclude NOTHING — not zero the result (the MUST guard points the
    other way). Engine vs DuckDB on the same predicate."""
    import duckdb

    from sotohp_ray.pipelines.fulltext import (
        keyword_search_excluding, keyword_search_excluding_sql,
    )

    got = keyword_search_excluding(
        SF, keywords=("fast",), exclude=("Slow",)
    ).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    oracle = con.execute(keyword_search_excluding_sql(
        keywords=("fast",), exclude=("Slow",)
    )).fetchdf()
    assert sorted(got["doc_id"]) == sorted(oracle["doc_id"])
    assert len(got) > 0  # the unmatchable exclude didn't zero it


def test_corpus_dedup_exact_planted(tmp_path):
    """The dup-cluster drop filter keeps exactly one doc (the min id)
    per identical-content cluster and every unique doc."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.textops import (
        corpus_dedup_exact, corpus_dedup_exact_sql,
    )

    t = pa.table({
        "doc_id": pa.array([5, 1, 2, 9, 7], pa.int64()),
        "text": pa.array(
            ["same text", "same text", "other", "same text", "third"]
        ),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    got = corpus_dedup_exact(str(d)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    oracle = con.execute(corpus_dedup_exact_sql()).fetchdf()
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == list(oracle["doc_id"]) == [1, 2, 7]
    assert list(got["n_chars"]) == list(oracle["n_chars"])


def _brute_pairs(texts, thr, shingle_n=3):
    """All-pairs reference for the EXACT join over the family shingle
    sets (short-row order-insensitivity lives in _brute_shingle_sets)."""
    sets = _brute_shingle_sets(texts, shingle_n)
    out = {}
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            u = len(sets[i] | sets[j])
            if not u:
                continue
            jac = len(sets[i] & sets[j]) / u
            if jac >= thr:
                out[(i, j)] = jac
    return out


def _simjoin_fixture(tmp_path, seed=11):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    texts = []
    for _ in range(5):
        base = " ".join(rng.choice(vocab, size=int(rng.integers(7, 30))))
        texts.append(base)
        toks = base.split()
        for _ in range(int(rng.integers(1, 3))):
            m = list(toks)
            for posn in rng.integers(0, len(m), size=2):
                m[int(posn)] = f"mut{int(rng.integers(0, 9))}"
            texts.append(" ".join(m))
        texts.append(base)  # exact copy -> identical-set clique member
    # 7-token docs have exactly 5 shingles — the 0.6*5 float-ceil edge
    # (3.0000000000000004 must not round the prefix bound up to 4);
    # short docs exercise the order-insensitive whole-row rule
    texts += ["aa bb", "aa bb", "bb aa", "solo_token", ""]
    n = len(texts)
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "text": pa.array(texts),
        }),
        str(d / "documents.parquet"),
    )
    return d, texts


def test_set_similarity_join_equals_bruteforce(tmp_path):
    """EXACT recall: the prefix-filtered join's pairs EQUAL the
    brute-force all-pairs result — not merely a subset — including
    identical-set cliques, short docs and prefix-boundary lengths."""
    from sotohp_ray.pipelines.textops import set_similarity_join

    d, texts = _simjoin_fixture(tmp_path)
    thr = 0.6
    out = set_similarity_join(str(d), threshold=thr).to_pandas()
    got = {(int(a), int(b)): float(j) for a, b, j in
           zip(out["doc_a"], out["doc_b"], out["jaccard"])}
    want = _brute_pairs(texts, thr)
    assert set(got) == set(want)
    for k, j in want.items():
        assert abs(got[k] - j) < 1e-12, (k, got[k], j)
    assert any(j == 1.0 for j in want.values())  # cliques exercised


def test_lsh_pairs_subset_of_exact_join(tmp_path):
    """The LSH-candidate path (near_dup_pairs) can only MISS pairs,
    never invent them: its output must be a subset of the exact join
    at equal (threshold, shingle_n), with jaccard agreeing up to the
    LSH path's 6-decimal rounding. The exact join is thus the recall
    oracle for the LSH band settings."""
    from sotohp_ray.pipelines.textops import (
        near_dup_pairs, set_similarity_join,
    )

    d, _texts = _simjoin_fixture(tmp_path, seed=23)
    thr = 0.6
    exact = set_similarity_join(str(d), threshold=thr).to_pandas()
    lsh = near_dup_pairs(str(d), threshold=thr).to_pandas()
    exact_map = {(int(a), int(b)): float(j) for a, b, j in
                 zip(exact["doc_a"], exact["doc_b"], exact["jaccard"])}
    assert len(lsh), "LSH path found nothing on a planted fixture"
    for a, b, j in zip(lsh["doc_a"], lsh["doc_b"], lsh["jaccard"]):
        key = (int(a), int(b))
        assert key in exact_map, f"LSH emitted a non-pair {key}"
        assert abs(float(j) - exact_map[key]) < 1e-6, (key, j)


def test_hll_within_error_bound_and_mergeable():
    """HyperLogLog sketch accuracy: per-type approximate distinct
    users within 3 sigma (1.04/sqrt(2^p)) of the exact distributed
    count-distinct twin, on the real events table. Merging across
    batches is exercised by construction (multiple blocks per type)."""
    from sotohp_ray.pipelines.relational import (
        HLL_P, events_distinct_users, events_user_hll,
    )

    sf = SF
    exact = events_distinct_users(sf).to_pandas().set_index(
        "event_type"
    )["n_users"]
    approx = events_user_hll(sf).to_pandas().set_index(
        "event_type"
    )["approx_users"]
    assert set(exact.index) == set(approx.index)
    bound = 3 * 1.04 / np.sqrt(1 << HLL_P)
    for t in exact.index:
        rel = abs(approx[t] - exact[t]) / exact[t]
        assert rel <= bound, (t, approx[t], exact[t], rel)


def test_kll_quantile_sketch_rank_accuracy():
    """KLL sketch quantiles must sit within ~2/k rank error of the
    exact quantiles of the real events.value column, and the sketch
    must actually compress (no value-sized state survives)."""
    import duckdb

    from sotohp_ray.pipelines.relational import (
        KLL_K, events_value_quantile_sketch,
    )

    sf = SF
    out = events_value_quantile_sketch(sf).to_pandas()
    con = duckdb.connect()
    vals = con.sql(
        f"SELECT value FROM '{sf}/events.parquet' ORDER BY value"
    ).df()["value"].to_numpy()
    n = vals.size
    eps = 2.0 / KLL_K
    for q, va in zip(out["quantile"], out["value_approx"]):
        # rank of the approximate answer in the true sorted column
        r = np.searchsorted(vals, va, side="right") / n
        assert abs(r - q) <= eps + 1.0 / n, (q, va, r)


def test_set_similarity_join_property_random_corpora(tmp_path):
    """Property check: on randomized corpora (varying vocab overlap,
    doc lengths crossing the short-row boundary, duplicate rates) the
    exact join equals brute force. Seeds are fixed for reproducibility
    but span structurally different corpora."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.textops import set_similarity_join

    for seed in (3, 101, 777):
        rng = np.random.default_rng(seed)
        vocab = [f"v{i}" for i in range(int(rng.integers(8, 60)))]
        texts = []
        for _ in range(int(rng.integers(10, 40))):
            ln = int(rng.integers(0, 15))
            texts.append(" ".join(rng.choice(vocab, size=ln)))
        # planted duplicates and near-duplicates
        for i in list(range(0, len(texts), 5)):
            if texts[i]:
                texts.append(texts[i])
        n = len(texts)
        d = tmp_path / f"sf{seed}"
        d.mkdir()
        pq.write_table(
            pa.table({
                "doc_id": pa.array(list(range(n)), pa.int64()),
                "text": pa.array(texts),
            }),
            str(d / "documents.parquet"),
        )
        thr = float(rng.choice([0.4, 0.5, 0.6, 0.8]))
        out = set_similarity_join(str(d), threshold=thr).to_pandas()
        got = {(int(a), int(b)): float(j) for a, b, j in
               zip(out["doc_a"], out["doc_b"], out["jaccard"])}
        want = _brute_pairs(texts, thr)
        assert set(got) == set(want), (seed, thr)
        for kk, j in want.items():
            assert abs(got[kk] - j) < 1e-12, (seed, thr, kk)


def test_inner_join_group_with_no_build_rows(tmp_path):
    """A coarse group holding orders but zero customers (sparse or
    dangling keys) must yield an empty inner-join contribution, not an
    IndexError — the generic big-big contract does not assume FK
    integrity."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.relational import orders_with_segment

    d = tmp_path / "sf"
    d.mkdir()
    # customers only on residue 1; orders on residues 1 and 2 (the
    # residue-2 group has probe rows and no build rows)
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 65], pa.int64()),
        "c_name": pa.array(["a", "b"]),
        "c_nationkey": pa.array([0, 0], pa.int32()),
        "c_acctbal": pa.array([1.0, 2.0]),
        "c_mktsegment": pa.array(["S1", "S2"]),
    }), str(d / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
        "o_custkey": pa.array([1, 2, 65], pa.int64()),
    }), str(d / "orders.parquet"))
    out = orders_with_segment(str(d)).to_pandas().sort_values(
        "o_orderkey"
    )
    # order 11 (custkey 2, no customer anywhere) is dropped
    assert list(out["o_orderkey"]) == [10, 12]
    assert list(out["c_mktsegment"]) == ["S1", "S2"]


def test_hll_rejects_unsafe_precision():
    import pytest as _pytest

    from sotohp_ray.pipelines.relational import events_user_hll

    with _pytest.raises(ValueError):
        events_user_hll(SF, p=8)


def test_set_similarity_join_all_empty_corpus(tmp_path):
    """A corpus with zero shingles anywhere (all texts empty) must
    return an empty pair table with a stable schema — the frequency
    aggregate yields a column-less frame on this path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.textops import set_similarity_join

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["", ""]),
    }), str(d / "documents.parquet"))
    out = set_similarity_join(str(d))
    assert out.num_rows == 0
    assert out.schema.names == ["doc_a", "doc_b", "jaccard"]


def test_set_similarity_join_capped_sample(tmp_path):
    """The bottom-k shingle cap (heavy-tail escape): capped runs still
    find planted near-dup pairs on long docs, a cap above every doc's
    set size reproduces the exact result bit-for-bit, and the shipped
    payload is bounded by the cap."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.textops import (
        _capped_sets, set_similarity_join,
    )

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(200)]
    base = " ".join(rng.choice(vocab, size=400))
    toks = base.split()
    near = list(toks)
    for posn in rng.integers(0, 400, size=8):
        near[int(posn)] = "mutated"
    far = " ".join(rng.choice([f"z{i}" for i in range(200)], size=400))
    texts = [base, " ".join(near), far, base]
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts),
    }), str(d / "documents.parquet"))

    exact = set_similarity_join(str(d), threshold=0.6).to_pandas()
    exact_keys = set(zip(exact["doc_a"], exact["doc_b"]))
    assert {(0, 1), (0, 3), (1, 3)} <= exact_keys

    capped = set_similarity_join(
        str(d), threshold=0.6, max_shingles=64
    ).to_pandas()
    capped_keys = set(zip(capped["doc_a"], capped["doc_b"]))
    # bottom-k Jaccard estimates true Jaccard: planted pairs survive,
    # the unrelated doc never appears
    assert {(0, 1), (0, 3), (1, 3)} <= capped_keys
    assert all(2 not in k for k in capped_keys)
    # cap bound actually holds on the emitted sets
    off, sv, _ck = _capped_sets(
        pa.array(texts, pa.large_string()), 3, 64
    )
    assert int(np.diff(off).max()) <= 64

    # a cap >= every set size is the exact join, bit-for-bit
    wide = set_similarity_join(
        str(d), threshold=0.6, max_shingles=100_000
    ).to_pandas()
    assert wide.equals(exact)


def test_doc_dup_grams_planted_and_brute_force(tmp_path):
    """Exact substring-dup signal (Lee et al. 2021 shape): engine
    counts must equal a brute-force Python Counter over every
    character L-gram — exercised with a planted shared span, a
    within-doc repeat, a short (< L) doc, and a NON-ASCII doc (the
    utf-32 cold path: gram boundaries are codepoints, not bytes)."""
    import collections

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.textops import doc_dup_grams

    L = 16
    shared = "0123456789abcdefghij"       # 20 chars, planted in 2 docs
    texts = [
        "unique prefix A " + shared + " tail one",
        "different lead " + shared + " other tail",
        "short doc",                       # < L chars -> 0 grams
        "xyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxy",  # within-doc repeats
        "héllo wörld çafé niño " * 4,      # non-ASCII, utf-32 path
        "completely unrelated content here with no twins",
    ]
    t = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    counts = collections.Counter(
        s[i : i + L]
        for s in texts
        for i in range(len(s) - L + 1)
    )
    expect = {
        did: (
            max(len(s) - L + 1, 0),
            sum(
                1
                for i in range(len(s) - L + 1)
                if counts[s[i : i + L]] >= 2
            ),
        )
        for did, s in enumerate(texts)
    }

    df = doc_dup_grams(str(d), L=L).to_pandas().sort_values("doc_id")
    got = {
        int(r.doc_id): (int(r.n_grams), int(r.n_dup_grams))
        for r in df.itertuples()
    }
    assert got == expect
    # the planted span really registered: both carriers saw >= 5
    # duplicated grams (20-char shared span -> 5 shared 16-grams)
    assert got[0][1] >= 5 and got[1][1] >= 5
    # the within-doc repeater is self-duplicated
    assert got[3][1] > 0
    # the short doc has zero grams but still a row
    assert got[2] == (0, 0)


def test_significant_terms_planted_vs_brute_force(tmp_path):
    """ES significant_terms shape: a term exclusive to the foreground
    (query-matching) docs must outscore corpus-wide terms, and the
    whole (term, df_fg, df_bg, score) table must equal a brute-force
    JLH computation over the tokenized corpus."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.functions.tokenizer import CodeTokenizer
    from sotohp_ray.pipelines.fulltext import significant_terms

    fg_texts = [
        f"alpha beta gamma shared filler{i}" for i in range(5)
    ]
    bg_texts = [
        f"shared other words filler{i} delta" for i in range(5)
    ]
    texts = fg_texts + bg_texts
    t = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    query, k = "alpha beta", 6
    tok = CodeTokenizer()
    docs_tokens = [set(tok.tokens_of(s)) for s in texts]
    q_toks = set(tok.tokens_of(query))
    fg = [i for i, ts in enumerate(docs_tokens) if q_toks <= ts]
    n_docs, n_fg = float(len(texts)), float(len(fg))
    df_bg, df_fg = {}, {}
    for i, ts in enumerate(docs_tokens):
        for term in ts:
            df_bg[term] = df_bg.get(term, 0) + 1
            if i in fg:
                df_fg[term] = df_fg.get(term, 0) + 1
    scored = []
    for term, f in df_fg.items():
        fr, br = f / n_fg, df_bg[term] / n_docs
        scored.append(
            (term, f, df_bg[term], float(np.round((fr - br) * (fr / br), 6)))
        )
    scored.sort(key=lambda x: (-x[3], x[0]))
    expect = scored[:k]

    out = significant_terms(str(d), queries=(query,), k=k).to_pandas()
    got = [
        (r.term, int(r.df_fg), int(r.df_bg), float(r.score))
        for r in out.itertuples()
    ]
    assert got == expect
    # the fg-exclusive markers score maximal (fr=1, br=0.5 -> 1.0),
    # corpus-wide terms score 0 and fall out of the top
    top_terms = {g[0] for g in got if g[3] == 1.0}
    assert {"alpha", "beta", "gamma"} <= top_terms
    assert all(g[0] != "shared" or g[3] == 0.0 for g in got)


def test_hybrid_rrf_fuses_component_rankings():
    """hybrid_search_rrf must equal a straight Python RRF fuse of its
    two component retrievers' own outputs (bm25_topk / knn_cosine at
    the same depth), and a doc present in BOTH lists must outscore a
    doc holding the same rank in only one."""
    import numpy as np

    from sotohp_ray.pipelines.ann import DEFAULT_QUERY_IDS, knn_cosine
    from sotohp_ray.pipelines.fulltext import (
        DOC_QUERIES, RRF_C, RRF_DEPTH, RRF_K, bm25_topk,
        hybrid_search_rrf,
    )

    sf = SF
    lex = bm25_topk(
        sf, queries=DOC_QUERIES[: len(DEFAULT_QUERY_IDS)], k=RRF_DEPTH
    ).to_pandas()
    vec = knn_cosine(sf, k=RRF_DEPTH).to_pandas()
    vec = vec.rename(columns={"vec_id": "doc_id"})

    expect = {}
    for qi in sorted(lex.query_id.unique()):
        contrib = {}
        for df in (lex, vec):
            g = df[df.query_id == qi].sort_values(
                ["score", "doc_id"], ascending=[False, True]
            )
            for r, doc in enumerate(g.doc_id.tolist(), start=1):
                contrib[doc] = contrib.get(doc, 0.0) + 1.0 / (RRF_C + r)
        rows = sorted(
            ((float(np.round(s, 6)), d) for d, s in contrib.items()),
            key=lambda x: (-x[0], x[1]),
        )[:RRF_K]
        expect[qi] = sorted((d, s) for s, d in rows)

    out = hybrid_search_rrf(sf).to_pandas()
    got = {
        qi: sorted(
            (int(r.doc_id), float(r.rrf))
            for r in out[out.query_id == qi].itertuples()
        )
        for qi in sorted(out.query_id.unique())
    }
    assert got == expect
    # both-list membership beats single-list at equal rank
    assert 1.0 / (RRF_C + 1) + 1.0 / (RRF_C + RRF_DEPTH) > 1.0 / (RRF_C + 1)
    for qi, rows in got.items():
        assert 0 < len(rows) <= RRF_K


def test_bm25_top_per_lang_equals_per_group_rerank():
    """Field collapsing: the distributed per-batch combiner result
    must equal a driver-side per-(query, lang) re-rank of the full
    BM25 ranking (same round4/doc_id tie-break contract)."""
    import duckdb
    import numpy as np

    from sotohp_ray.pipelines.fulltext import (
        COLLAPSE_N, DOC_QUERIES, bm25_top_per_lang, bm25_topk,
    )

    sf = SF
    full = bm25_topk(sf, queries=DOC_QUERIES, k=10**9).to_pandas()
    con = duckdb.connect()
    lang = dict(
        con.sql(
            f"SELECT doc_id, lang FROM '{sf}/documents.parquet'"
        ).fetchall()
    )
    full["lang"] = full.doc_id.map(lang)
    full = full.sort_values(
        ["query_id", "lang", "score", "doc_id"],
        ascending=[True, True, False, True],
    )
    expect = (
        full.groupby(["query_id", "lang"], sort=True)
        .head(COLLAPSE_N)
        .sort_values(["query_id", "lang", "doc_id"])
        .reset_index(drop=True)[
            ["query_id", "lang", "doc_id", "score"]
        ]
    )
    got = bm25_top_per_lang(sf).to_pandas().reset_index(drop=True)
    assert got.equals(expect.astype(got.dtypes.to_dict()))
    # every (query, lang) bucket is filled to n (dense testdata)
    sizes = got.groupby(["query_id", "lang"]).size()
    assert (sizes == COLLAPSE_N).all()


def test_quantized_knn_recall_and_fullrerank_identity():
    """int8 scalar-quantized search: at full re-rank depth the result
    must be BIT-IDENTICAL to brute-force knn_cosine (quantization only
    picks candidates, exact scores decide); at the default depth
    recall@10 must stay high on the testdata embeddings."""
    from sotohp_ray.pipelines.ann import (
        QUANT_DEPTH, knn_cosine, knn_cosine_quantized,
    )

    exact = knn_cosine(SF).to_pandas().sort_values(
        ["query_id", "vec_id"]
    ).reset_index(drop=True)
    fullr = knn_cosine_quantized(SF, depth=10**9).to_pandas().sort_values(
        ["query_id", "vec_id"]
    ).reset_index(drop=True)
    assert fullr.equals(exact)

    q = knn_cosine_quantized(SF, depth=QUANT_DEPTH).to_pandas()
    recalls = []
    for qi in exact.query_id.unique():
        e = set(exact[exact.query_id == qi].vec_id)
        g = set(q[q.query_id == qi].vec_id)
        recalls.append(len(e & g) / len(e))
    assert min(recalls) >= 0.8, recalls


def test_decontaminate_planted_overlap(tmp_path):
    """Decontamination: docs sharing an L-gram with the benchmark set
    (doc_id < n_bench) are flagged with exact instance counts;
    benchmark docs never flag themselves; clean docs are absent."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.textops import decontaminate

    L = 16
    bench_span = "BENCHMARK-EVAL-SPAN-0123456789"   # 30 chars
    texts = [
        "eval doc one " + bench_span,                # benchmark (id 0)
        "eval doc two entirely different content!!",  # benchmark (id 1)
        "train doc leaking " + bench_span + " tail",  # contaminated
        "train doc leaking twice " + bench_span + " and " + bench_span,
        "perfectly clean training document with original words only",
        "short",                                      # < L chars
    ]
    t = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    out = decontaminate(str(d), n_bench=2, L=L).to_pandas()
    got = dict(zip(out.doc_id, out.n_contaminated))
    # brute-force expectation (shared CONTEXT chars around the planted
    # span also form matching windows — e.g. the space preceding it)
    bench_grams = {
        s[i : i + L]
        for s in texts[:2]
        for i in range(len(s) - L + 1)
    }
    expect = {}
    for did, s in enumerate(texts[2:], start=2):
        n = sum(
            1
            for i in range(len(s) - L + 1)
            if s[i : i + L] in bench_grams
        )
        if n:
            expect[did] = n
    assert got == expect
    assert set(got) == {2, 3}          # the clean + short docs absent
    assert got[3] > got[2]             # double leak counts more


def test_percolate_matches_bruteforce_and_is_nonvacuous(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.textops import (
        _TOK,
        PERCOLATE_QUERIES,
        percolate,
    )

    texts = [
        "sort then merge the table",       # q1, q5? needs the+fast -> no
        "window frame over rows",          # q2
        "window hash partition",           # not q2 (hash excluded)
        "stream of batch join plans",      # q3
        "scan only here",                  # q4
        "scan with merge",                 # not q4
        "the fast path",                   # q5
        "nothing relevant 123",
    ]
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        ),
        str(d / "documents.parquet"),
    )
    got = percolate(str(d)).to_pandas()
    got_set = set(map(tuple, got[["query_id", "doc_id"]].to_numpy()))
    toks = _TOK.token_lists(
        pa.array(texts, pa.large_string())
    ).to_pylist()
    want = set()
    for qid, must, mnot in PERCOLATE_QUERIES:
        for did, tl in enumerate(toks):
            s = set(tl)
            if all(t in s for t in must) and not any(t in s for t in mnot):
                want.add((qid, did))
    assert got_set == want
    assert (1, 0) in want and (2, 1) in want and (4, 4) in want
    assert not any(q == 6 for q, _ in want)  # unmatched query stays empty
    # non-vacuous on the real corpus too: every non-sentinel query hits
    real = percolate(SF).to_pandas()
    assert set(real["query_id"]) == {1, 2, 3, 4, 5}


def test_knn_mmr_diversifies_planted_duplicates(tmp_path):
    """MMR re-ranking: on a fixture where the two nearest neighbors
    are IDENTICAL vectors, plain top-k returns both adjacent while
    MMR (lam=0.5) demotes the duplicate below a less-similar but
    diverse vector; rank 0 is always the plain cosine argmax, and a
    brute-force greedy replay must match exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.ann import _normalize, knn_cosine, knn_mmr

    rng = np.random.RandomState(3)
    dim = 8
    q = np.ones(dim)
    dup = q + rng.normal(0, 0.01, dim)  # very near the query
    vecs = [q, dup, dup.copy(),              # 1, 2 identical dupes
            q + np.array([0, 0, 0, 0, 3, 3, 3, 3.0]),  # diverse-ish
            rng.normal(0, 1, dim), rng.normal(0, 1, dim)]
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array(
            [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
        ),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "embeddings.parquet"))

    lam, k = 0.5, 3
    plain = knn_cosine(str(d), query_ids=(0,), k=k).to_pandas()
    mmr = knn_mmr(
        str(d), query_ids=(0,), k=k, depth=5, lam=lam
    ).to_pandas().sort_values("rank")
    # plain top-2 are the duplicate pair; MMR keeps one, demotes the other
    assert set(plain["vec_id"][:2]) == {1, 2}
    assert list(mmr["vec_id"][:2])[0] == 1
    assert 2 not in set(mmr["vec_id"][:2])
    assert mmr["rank"].tolist() == list(range(len(mmr)))

    # brute-force greedy replay over the same candidate pool
    cands = knn_cosine(str(d), query_ids=(0,), k=5).to_pandas()
    cands = cands.sort_values(
        ["score", "vec_id"], ascending=[False, True]
    ).reset_index(drop=True)
    V = _normalize(np.array(
        [vecs[int(v)] for v in cands["vec_id"]], dtype=np.float64
    ))
    rel = cands["score"].to_numpy()
    vids = cands["vec_id"].to_numpy()
    sim = V @ V.T
    picked, out = [], []
    avail = np.ones(len(cands), dtype=bool)
    while avail.any() and len(picked) < k:
        m = lam * rel - (
            (1 - lam) * sim[:, picked].max(axis=1) if picked else 0.0
        )
        r = np.round(m, 6)
        r[~avail] = -np.inf
        c = np.flatnonzero(r == r.max())
        i = int(c[np.argmin(vids[c])])
        out.append((int(vids[i]), float(rel[i]), float(r[i])))
        picked.append(i)
        avail[i] = False
    got = list(mmr[["vec_id", "score", "mmr"]].itertuples(
        index=False, name=None
    ))
    assert got == out


def test_knn_pq_fullrerank_identity_and_recall(tmp_path):
    """PQ plumbing: at depth >= corpus the exact re-rank must EQUAL
    brute-force knn_cosine row for row; at bounded depth on a
    clustered fixture recall@10 must stay high (ADC tables, encoding
    and gathers all working)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.ann import (
        knn_cosine, knn_cosine_pq, knn_cosine_pq_fullrerank,
    )

    rng = np.random.RandomState(11)
    dim, per = 16, 300
    centers = np.eye(4, dim) * 8.0
    X = np.concatenate(
        [centers[c] + rng.normal(0, 0.4, (per, dim)) for c in range(4)]
    )
    t = pa.table({
        "vec_id": pa.array(np.arange(4 * per), pa.int64()),
        "embedding": pa.array(
            [row.astype(np.float32) for row in X], pa.list_(pa.float32())
        ),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "embeddings.parquet"), row_group_size=256)

    qids = [0, per, 2 * per, 3 * per]
    brute = knn_cosine(str(d), query_ids=qids).to_pandas()
    full = knn_cosine_pq_fullrerank(str(d), query_ids=qids).to_pandas()
    key = ["query_id", "vec_id", "score"]
    assert (
        brute.sort_values(key).reset_index(drop=True)[key]
        .equals(full.sort_values(key).reset_index(drop=True)[key])
    )
    approx = knn_cosine_pq(
        str(d), query_ids=qids, depth=64, m=8, ksub=64
    ).to_pandas()
    for q in qids:
        b = set(brute[brute.query_id == q].vec_id)
        a = set(approx[approx.query_id == q].vec_id)
        # intra-cluster top-10 is PQ's hardest case (all candidates
        # near-identical); 8x64 codebooks at depth 64 must still
        # recover >= 90%
        assert len(a & b) / len(b) >= 0.9, q


def test_ann_ivfpq_fullrerank_identity_and_recall(tmp_path):
    """IVF-PQ: fullprobe+fullrerank must equal brute force row for
    row; on a clustered fixture, probing 1 of 4 cells with residual-PQ
    scoring must keep recall@10 >= 0.9 (coarse routing + residual
    codes + ADC all working together)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.ann import (
        ann_ivfpq_fullprobe_fullrerank, ann_ivfpq_search, knn_cosine,
    )

    rng = np.random.RandomState(13)
    dim, per = 16, 300
    centers = np.eye(4, dim) * 8.0
    X = np.concatenate(
        [centers[c] + rng.normal(0, 0.4, (per, dim)) for c in range(4)]
    )
    t = pa.table({
        "vec_id": pa.array(np.arange(4 * per), pa.int64()),
        "embedding": pa.array(
            [row.astype(np.float32) for row in X], pa.list_(pa.float32())
        ),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "embeddings.parquet"), row_group_size=256)

    qids = [0, per, 2 * per, 3 * per]
    brute = knn_cosine(str(d), query_ids=qids).to_pandas()
    full = ann_ivfpq_fullprobe_fullrerank(
        str(d), query_ids=qids, n_centroids=4
    ).to_pandas()
    key = ["query_id", "vec_id", "score"]
    assert (
        brute.sort_values(key).reset_index(drop=True)[key]
        .equals(full.sort_values(key).reset_index(drop=True)[key])
    )
    approx = ann_ivfpq_search(
        str(d), query_ids=qids, n_centroids=4, n_probe=1,
        m=8, ksub=64, depth=64,
    ).to_pandas()
    for q in qids:
        b = set(brute[brute.query_id == q].vec_id)
        a = set(approx[approx.query_id == q].vec_id)
        assert len(a & b) / len(b) >= 0.9, q


# --- round-5: Vernica basic kernel (linear shipping) + durable cache ---


def _longdoc_fixture(tmp_path, n_long=6, n_short=8, seed=11):
    """Heavy-tailed corpus: a few multi-thousand-shingle docs (with a
    planted near-dup and an exact clique among them) over a bed of
    short docs — the corpus shape the basic kernel exists for."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(4000)]
    texts = []
    base = " ".join(rng.choice(vocab, size=3000))
    texts.append(base)
    toks = base.split()
    near = list(toks)
    for posn in rng.integers(0, len(toks), size=30):
        near[int(posn)] = "mut"
    texts.append(" ".join(near))  # near-dup of 0
    texts.append(base)  # exact clique with 0
    for _ in range(n_long - 3):
        texts.append(" ".join(rng.choice(vocab, size=2500)))
    for _ in range(n_short):
        s = " ".join(rng.choice(vocab, size=int(rng.integers(5, 25))))
        texts.append(s)
        texts.append(s)  # short clique pairs
    d = tmp_path / "sflong"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts),
    }), str(d / "documents.parquet"))
    return d


def test_setjoin_kernel_invariance(tmp_path):
    """The basic (linear-shipping) and set-with-prefix kernels compute
    the IDENTICAL exact pair set — pairs, jaccards, cliques — on a
    heavy-tailed planted corpus. Kernel choice is pure performance."""
    from sotohp_ray.pipelines import textops as t

    d = _longdoc_fixture(tmp_path)
    p = t._set_similarity_join_compute(
        str(d), 0.6, 3, 2048, None, kernel="prefix"
    ).to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    b = t._set_similarity_join_compute(
        str(d), 0.6, 3, 2048, None, kernel="basic"
    ).to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert len(p) and p.equals(b)
    # planted structure survived: near-dup pair + clique at jaccard 1
    keys = set(zip(p["doc_a"].astype(int), p["doc_b"].astype(int)))
    assert (0, 1) in keys and (0, 2) in keys and (1, 2) in keys
    byk = dict(zip(zip(p["doc_a"].astype(int), p["doc_b"].astype(int)),
                   p["jaccard"]))
    assert byk[(0, 2)] == 1.0 and byk[(0, 1)] < 1.0


def test_setjoin_basic_kernel_ships_superlinearly_less(tmp_path):
    """The VERDICT-r4 scale-killer, measured: on heavy-tailed L the
    basic kernel's shipped volume (prefix rows + re-fetch values) must
    drop SUPERLINEARLY below the set-with-prefix kernel's ~(1-t)L^2
    envelope — both numbers exact, from the same run's telemetry."""
    from sotohp_ray.pipelines import textops as t

    d = _longdoc_fixture(tmp_path)
    t._set_similarity_join_compute(
        str(d), 0.6, 3, 2048, None, kernel="basic"
    )
    tel = dict(t.SETJOIN_TELEMETRY)
    assert tel["kernel"] == "basic"
    shipped_basic = tel["prefix_rows"] + tel["refetch_values"]
    assert tel["would_prefix_values"] > 10 * shipped_basic, tel


def test_setjoin_auto_selects_basic_on_long_docs(tmp_path):
    """kernel="auto" must pick the basic kernel once the estimated
    p95 shingle count crosses the switch — and the prefix kernel on a
    short-doc corpus."""
    from sotohp_ray.pipelines import textops as t

    d = _longdoc_fixture(tmp_path)
    t._set_similarity_join_compute(str(d), 0.6, 3, 2048, None, "auto")
    assert t.SETJOIN_TELEMETRY["kernel"] == "basic"
    assert t.SETJOIN_TELEMETRY["est_p95_shingles"] > t._SETJOIN_L_SWITCH
    d2, _ = _simjoin_fixture(tmp_path, seed=3)
    t._set_similarity_join_compute(str(d2), 0.6, 3, 2048, None, "auto")
    assert t.SETJOIN_TELEMETRY["kernel"] == "prefix"


def test_setjoin_pair_cache_reused(tmp_path, monkeypatch):
    """Second consumer of the exact join (similarity_components,
    repeated join calls) must serve from the durable pair cache —
    ZERO shingle/verify work — and see identical pairs (the
    near-dup-family cache discipline extended to the exact join,
    VERDICT-r4 ask #3)."""
    from sotohp_ray.pipelines import textops as t

    d, _texts = _simjoin_fixture(tmp_path, seed=7)
    first = t.set_similarity_join(str(d), threshold=0.6)

    def boom(*a, **k):
        raise AssertionError("exact join recomputed despite cache")

    monkeypatch.setattr(t, "_set_similarity_join_compute", boom)
    again = t.set_similarity_join(str(d), threshold=0.6)
    assert again.equals(first)
    # components run entirely off the cache too
    comp = t.similarity_components(str(d), threshold=0.6)
    assert comp.num_rows >= 1


# --- round-5: entropy / NB language model / compression-ratio ops ---


def test_nb_lang_classifier_planted_disjoint_vocab(tmp_path):
    """On a corpus whose languages use DISJOINT vocabularies the NB
    classifier must be 100% accurate, and predictions must equal the
    argmax (score desc, lang asc) of the oracle-gated scores table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines import textops

    rng = np.random.default_rng(3)
    langs = {"aa": [f"alpha{i}" for i in range(30)],
             "bb": [f"beta{i}" for i in range(30)],
             "cc": [f"gamma{i}" for i in range(30)]}
    rows_lang, rows_text = [], []
    for lg, vocab in langs.items():
        for _ in range(8):
            rows_lang.append(lg)
            rows_text.append(
                " ".join(rng.choice(vocab, size=int(rng.integers(8, 25))))
            )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(len(rows_lang))), pa.int64()),
        "lang": pa.array(rows_lang),
        "text": pa.array(rows_text),
    }), str(d / "documents.parquet"))
    pred = textops.nb_lang_predictions(str(d)).to_pandas()
    assert len(pred) == len(rows_lang)
    assert (pred["lang_true"] == pred["lang_pred"]).all()
    # consistency: predictions ARE the argmax of the scores table
    sc = textops.nb_lang_scores(str(d)).to_pandas()
    top = (sc.sort_values(["doc_id", "score", "lang"],
                          ascending=[True, False, True])
             .groupby("doc_id").head(1))
    want = dict(zip(top["doc_id"].astype(int), top["lang"]))
    got = dict(zip(pred["doc_id"].astype(int), pred["lang_pred"]))
    assert got == want


def test_doc_compress_ratio_matches_zlib_and_orders_repetition(tmp_path):
    """Engine values equal direct zlib on every row; a highly
    repetitive doc compresses strictly better than a high-entropy
    one."""
    import zlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines import textops

    rng = np.random.default_rng(9)
    texts = [
        "spam ham " * 200,                       # repetitive
        " ".join(str(rng.integers(10**9)) for _ in range(300)),
        "",                                      # empty edge
    ]
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(texts),
    }), str(d / "documents.parquet"))
    out = textops.doc_compress_ratio(str(d)).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    for i, t in enumerate(texts):
        raw = len(t.encode())
        comp = len(zlib.compress(t.encode(), 6))
        assert out["n_bytes"][i] == raw
        assert out["n_compressed"][i] == comp
        assert out["ratio"][i] == pytest.approx(
            round(comp / max(raw, 1), 6)
        )
    assert out["ratio"][0] < out["ratio"][1]


def test_doc_dup_spans_planted(tmp_path):
    """ExactSubstr span math on a planted fixture: a cross-doc shared
    span is cut from BOTH copies (Lee et al. 2021 remove every copy),
    a within-doc repeat is cut twice, and a fully-unique doc reports
    0/0 — counts match the merged-interval rule exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.textops import doc_dup_spans

    shared = "THE-SHARED-DUPLICATED-SPAN-0123456789-XX"  # 40 chars
    rep = "repeat-me-block-2048"                         # 20 chars
    u0a, u0b = "abcdefghijklmnopqrstuvwxyz", "0123456789!@#$%^&*()"
    u1 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    u2 = "zyxwvutsrqponmlkjihgfedcba9876543210"
    u3a, u3b, u3c = "[first-filler-1]", "{mid_filler_002}", "(last.filler.3)"
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            u0a + shared + u0b,
            u1 + shared,
            u2,
            u3a + rep + u3b + rep + u3c,
        ]),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    out = (
        doc_dup_spans(str(d)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [0, 1, 2, 3]
    assert list(out["n_dup_spans"]) == [1, 1, 0, 2]
    assert list(out["n_chars_removed"]) == [
        len(shared), len(shared), 0, 2 * len(rep)
    ]


def test_corpus_dedup_substrings_planted(tmp_path):
    """The cleaned corpus cuts exactly the planted spans (string-level
    check) and satisfies len(orig) - n_chars_removed == len(clean)
    for every doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.textops import (
        corpus_dedup_substrings, doc_dup_spans,
    )

    shared = "THE-SHARED-DUPLICATED-SPAN-0123456789-XX"
    rep = "repeat-me-block-2048"
    u0a, u0b = "abcdefghijklmnopqrstuvwxyz", "0123456789!@#$%^&*()"
    u1 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    u2 = "zyxwvutsrqponmlkjihgfedcba9876543210"
    u3a, u3b, u3c = "[first-filler-1]", "{mid_filler_002}", "(last.filler.3)"
    texts = [
        u0a + shared + u0b,
        u1 + shared,
        u2,
        u3a + rep + u3b + rep + u3c,
    ]
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(texts),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    clean = (
        corpus_dedup_substrings(str(d)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert list(clean["text"]) == [
        u0a + u0b, u1, u2, u3a + u3b + u3c,
    ]
    spans = (
        doc_dup_spans(str(d)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    for i in range(4):
        assert (
            len(texts[i]) - int(spans["n_chars_removed"][i])
            == len(clean["text"][i])
        )


def test_cms_heavy_hitters_guarantees(tmp_path):
    """Count-Min sketch invariants on a planted skewed corpus: the
    estimate NEVER undercounts (one-sided CMS error), and the top-k
    recall vs the exact twin is perfect when the vocabulary is far
    smaller than the sketch width."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.textops import (
        term_heavy_hitters, term_heavy_hitters_cms,
    )

    # zipf-ish: term_i appears ~ 600/i times across docs
    texts = []
    for d in range(40):
        toks = []
        for i in range(1, 30):
            reps = max(600 // i // 40, 1) if i % 3 != d % 3 else 0
            toks += [f"term{i:02d}"] * reps
        texts.append(" ".join(toks))
    t = pa.table({
        "doc_id": pa.array(list(range(40)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 40),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    exact = term_heavy_hitters(str(d), k=10).to_pandas()
    cms = term_heavy_hitters_cms(str(d), k=10).to_pandas()
    true_cf = dict(zip(
        term_heavy_hitters(str(d), k=10**9).to_pandas()["term"],
        term_heavy_hitters(str(d), k=10**9).to_pandas()["cf"],
    ))
    for term, est in zip(cms["term"], cms["est_cf"]):
        assert est >= true_cf.get(term, 0), (term, est, true_cf.get(term))
    assert set(cms["term"]) == set(exact["term"])


def test_rare_terms_is_bottom_k_of_term_df(tmp_path):
    """rare_terms == the df-ascending head of term_df (rank-based ES
    rare_terms semantics) on a fixture with distinct df levels."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.textops import rare_terms, term_df

    texts = [
        "alpha beta gamma delta",
        "alpha beta gamma",
        "alpha beta",
        "alpha",
    ]
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 4),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    out = rare_terms(str(d), k=2).to_pandas()
    assert list(out["term"]) == ["delta", "gamma"]
    assert list(out["df"]) == [1, 2]
    df = term_df(str(d)).to_pandas().sort_values(["df", "term"]).head(2)
    assert list(df["term"]) == list(out["term"])


def test_similarity_pagerank_matches_dense_power_iteration(tmp_path):
    """PageRank over a planted similarity graph equals an independent
    dense-matrix power iteration, conserves rank mass, and ranks the
    hub of a star cluster above its leaves (the keep-policy signal)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.textops import (
        PR_DAMPING, PR_ITERS, similarity_pagerank,
    )

    # hub doc 0 shares a long phrase with 1/2/3 (star); 4 and 5 are a
    # pair; 6 is isolated (dangling) — shingle_n=3 token shingles
    hub = "alpha beta gamma delta epsilon zeta eta theta"
    pair = "uno dos tres cuatro cinco seis siete ocho nueve"
    texts = [
        hub + " hubextra0",
        hub + " leafone11",
        hub + " leaftwo22",
        hub + " leafthr33",
        pair + " paira",
        pair + " pairb",
        "totally different isolated text goes here now",
    ]
    t = pa.table({
        "doc_id": pa.array(list(range(7)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 7),
    })
    dd = tmp_path / "sf"
    dd.mkdir()
    pq.write_table(t, str(dd / "documents.parquet"))

    out = (
        similarity_pagerank(str(dd)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out["doc_id"]) == list(range(7))
    assert abs(out["rank"].sum() - 1.0) < 1e-4  # mass conserved

    # independent dense reference from the SAME edge set
    from sotohp_ray.pipelines.textops import set_similarity_join

    pairs = set_similarity_join(str(dd)).to_pandas()
    n = 7
    A = np.zeros((n, n))
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        A[a, b] = A[b, a] = 1.0
    deg = A.sum(axis=1)
    P = np.zeros((n, n))
    nz = deg > 0
    P[nz] = A[nz] / deg[nz, None]
    r = np.full(n, 1.0 / n)
    dmp = PR_DAMPING
    for _ in range(PR_ITERS):
        dangle = r[~nz].sum()
        r = (1 - dmp) / n + dmp * (P.T @ r + dangle / n)
    assert np.allclose(out["rank"].to_numpy(), np.round(r, 6), atol=2e-6)

    # docs 0-3 share the hub phrase pairwise -> a 4-clique: equal
    # ranks by symmetry, all above the isolated (teleport-only) doc;
    # the 2-pair is likewise symmetric
    ranks = out["rank"].to_numpy()
    assert np.allclose(ranks[:4], ranks[0])
    assert np.allclose(ranks[4], ranks[5])
    assert ranks[0] > ranks[6]


def test_knn_hard_negatives_labels_and_ordering():
    """Every mined negative must carry a label different from its
    query's; within a query the scores are non-increasing; and each
    negative's score can't beat knn_cosine's same-rank UNRESTRICTED
    neighbor (hard negatives are a label-masked subset of the same
    candidate order)."""
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.ann import knn_cosine, knn_hard_negatives

    neg = knn_hard_negatives(SF).to_pandas()
    pos = knn_cosine(SF).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "label"])
    lab = dict(zip(t["vec_id"].to_pylist(), t["label"].to_pylist()))
    assert len(neg)
    for qid, g in neg.groupby("query_id"):
        ql = lab[int(qid)]
        assert all(lab[int(v)] != ql for v in g["vec_id"])
        s = g.sort_values(["score", "vec_id"],
                          ascending=[False, True])["score"].to_numpy()
        assert (np.diff(s) <= 0).all()
        p = pos[pos["query_id"] == qid].sort_values(
            ["score", "vec_id"], ascending=[False, True]
        )["score"].to_numpy()
        n = min(len(s), len(p))
        assert (s[:n] <= p[:n] + 1e-12).all()


def test_binary_quantized_knn_recall_and_twin():
    """1-bit sign codes at the default re-rank depth must hold
    recall@10 >= 0.85 vs brute force, and the fullrerank twin must
    EQUAL brute force exactly (it shares the kNN SQL oracle too)."""
    from sotohp_ray.pipelines.ann import (
        knn_cosine,
        knn_cosine_binary,
        knn_cosine_binary_fullrerank,
    )

    brute = knn_cosine(SF).to_pandas()
    full = knn_cosine_binary_fullrerank(SF).to_pandas()
    b = brute.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    f = full.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    assert b.equals(f)
    appr = knn_cosine_binary(SF).to_pandas()
    recs = []
    for q, g in brute.groupby("query_id"):
        a = set(appr[appr["query_id"] == q]["vec_id"])
        recs.append(len(a & set(g["vec_id"])) / len(g))
    assert sum(recs) / len(recs) >= 0.85


def test_semdedup_within_cluster_anti_join_rule(tmp_path):
    """SemDeDup semantics on a planted fixture: (a) duplicates are
    removed only WITHIN a cluster — an identical pair assigned to
    different centroids survives intact; (b) the keep rule is the
    anti-join (no lower-id same-cluster neighbor >= tau), so in a
    duplicate chain x<y<z only x survives; (c) centroid rows
    themselves participate."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.ann import semdedup

    d = tmp_path / "sf"
    d.mkdir()
    # two orthogonal centroid directions (vec_id 0 and 1)
    e0 = [1.0, 0.0, 0.0, 0.0]
    e1 = [0.0, 1.0, 0.0, 0.0]
    mix = [0.8, 0.0, 0.6, 0.0]   # cluster 0, sim(e0)=0.8 >= tau
    far = [0.0, 0.6, 0.0, 0.8]   # cluster 1, sim(e1)=0.6 < 0.7
    vecs = [e0, e1,
            e0,    # 2: dup of centroid 0 -> dropped (0 < 2, sim 1.0)
            mix,   # 3: cluster 0, sim 0.8 -> dropped at tau=0.7
            e1,    # 4: dup of centroid 1 -> dropped
            far]   # 5: cluster 1, sim 0.6 -> KEPT at tau=0.7
    t = pa.table({
        "vec_id": pa.array(list(range(len(vecs))), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0] * len(vecs), pa.int32()),
    })
    pq.write_table(t, str(d / "embeddings.parquet"))
    out = semdedup(str(d), n_clusters=2, tau=0.7).to_pandas()
    assert list(out["vec_id"]) == [0, 1, 5]
    assert list(out["cluster"]) == [0, 1, 1]
    # cross-cluster identical pair survives: centroids 0 and 1 both
    # kept even though vecs 2/4 duplicated them within-cluster only
    out2 = semdedup(str(d), n_clusters=2, tau=1.1).to_pandas()
    assert len(out2) == len(vecs)  # tau above max sim: nothing drops


def test_decontaminate_bloom_superset_and_convergence():
    """The Bloom scale path's contract: (a) NO false negatives — its
    flagged-doc set is a superset of the exact twin's and every
    per-doc count is >= the exact count (FPs only ADD); (b) a
    generously-sized filter (64 bits/gram) is bit-identical to the
    exact twin on the real corpus."""
    from sotohp_ray.pipelines.textops import (
        decontaminate,
        decontaminate_bloom,
    )

    sf = "/root/testdata/sf0.001"
    a = (decontaminate(sf).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (decontaminate_bloom(sf).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    ea = a.set_index("doc_id")["n_contaminated"]
    eb = b.set_index("doc_id")["n_contaminated"]
    assert set(ea.index) <= set(eb.index)
    assert all(eb.loc[i] >= ea.loc[i] for i in ea.index)
    c = (decontaminate_bloom(sf, bits_per_gram=64).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert c.equals(a)


def test_ann_index_persisted_build_query_contract(tmp_path, monkeypatch):
    """The persisted IVF-PQ index: (a) the full-probe full-re-rank
    twin over the artifact is BIT-IDENTICAL to brute-force kNN (the
    build + hive-partition + decode plumbing proves itself against
    the exact baseline); (b) a second build is a pure cache hit —
    training is never re-entered; (c) default-probe search over the
    artifact reaches the same recall as the inline IVF-PQ path (same
    centroids, same codebooks)."""
    import sotohp_ray.pipelines.ann as ann

    sf = "/root/testdata/sf0.001"
    d = ann.build_ann_index(sf)
    cols = ["query_id", "vec_id", "score"]

    def table(x):
        x = x.to_pandas() if hasattr(x, "to_pandas") else x
        return x[cols].sort_values(cols).reset_index(drop=True)

    fp = table(ann.ann_index_fullprobe(sf))
    bf = table(ann.knn_cosine(sf))
    assert fp.equals(bf)

    def boom(*a, **k):
        raise AssertionError("cache miss: training re-entered")

    real_train = ann._train_centroids
    monkeypatch.setattr(ann, "_train_centroids", boom)
    assert ann.build_ann_index(sf) == d  # cache hit, no training
    got = ann.ann_index_search(sf).to_pandas()  # also cache-served
    monkeypatch.setattr(ann, "_train_centroids", real_train)
    inline = ann.ann_ivfpq_search(sf)
    inline = inline.to_pandas() if hasattr(inline, "to_pandas") else inline
    r_idx = len(got.merge(bf[["query_id", "vec_id"]],
                          on=["query_id", "vec_id"])) / len(bf)
    r_inl = len(inline.merge(bf[["query_id", "vec_id"]],
                             on=["query_id", "vec_id"])) / len(bf)
    assert r_idx >= r_inl - 1e-9  # persisted path loses no recall


def test_skipgram_window1_equals_bigram_counts():
    """The skip-gram generalization must degenerate exactly to the
    adjacent-bigram op at window=1 (same survivors, same counts)."""
    from sotohp_ray.pipelines.textops import (
        bigram_counts,
        skipgram_counts,
    )

    sf = "/root/testdata/sf0.001"
    a = bigram_counts(sf).to_pandas().sort_values(
        ["t1", "t2"]).reset_index(drop=True)
    b = skipgram_counts(sf, window=1).to_pandas().sort_values(
        ["t1", "t2"]).reset_index(drop=True)
    assert a.equals(b)
    # wider windows only ADD pair mass: every bigram survivor's count
    # is <= its window-4 count
    c = skipgram_counts(sf, window=4).to_pandas()
    m = a.merge(c, on=["t1", "t2"], suffixes=("_bi", "_sk"))
    assert len(m) and (m["n_sk"] >= m["n_bi"]).all()


def test_ann_index_build_crash_leaves_no_corrupt_artifact(
    tmp_path, monkeypatch
):
    """The persisted-index build contract: a crash mid-write must
    leave NO directory at the final path (tmp+rename atomicity), and
    the next build must succeed cleanly from scratch."""
    import os
    import shutil

    import sotohp_ray.pipelines.ann as ann

    d = tmp_path / "sf"
    d.mkdir()
    shutil.copy("/root/testdata/sf0.001/embeddings.parquet",
                str(d / "embeddings.parquet"))
    target = ann._ann_index_dir(str(d), 32, ann.PQ_M, ann.PQ_KSUB)
    shutil.rmtree(target, ignore_errors=True)

    real_books = ann._train_residual_books

    def boom(*a, **k):
        raise RuntimeError("injected crash mid-build")

    monkeypatch.setattr(ann, "_train_residual_books", boom)
    with pytest.raises(RuntimeError, match="injected"):
        ann.build_ann_index(str(d))
    assert not os.path.isdir(target)         # nothing at final path
    assert not os.path.exists(target + ".src")
    leftovers = [p for p in os.listdir(os.path.dirname(target))
                 if p.startswith(os.path.basename(target) + ".tmp-")]
    assert leftovers == []                   # tmp dir cleaned up

    monkeypatch.setattr(ann, "_train_residual_books", real_books)
    rebuilt = ann.build_ann_index(str(d))    # recovery: clean rebuild
    assert rebuilt == target and os.path.isdir(target)
    out = ann.ann_index_fullprobe(str(d))
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert len(out) > 0
