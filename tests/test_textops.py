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
