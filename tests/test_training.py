"""Training-data preparation operator tests (training.py): PII
redaction, token-budget mixture sampling, chunking, OOV scoring.

The sf corpora contain no PII-shaped spans (sum(n_redactions) == 0
there), so redaction is tested on PLANTED fixtures — including a
DuckDB run of the oracle SQL on the same fixture, which keeps the
driver's vacuously-green oracle row honest."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _ray(ray_session):
    yield


def _write_docs(tmp_path, texts, langs=None, ids=None):
    n = len(texts)
    t = pa.table(
        {
            "doc_id": pa.array(
                ids if ids is not None else list(range(n)), pa.int64()
            ),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs if langs is not None else ["en"] * n),
        }
    )
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


PII_TEXTS = [
    "contact alice@example.com or bob.smith@mail.co",
    "server at 10.0.0.1 port 8080",
    "id 123456789012 and 12345678 trailing",
    "x@y.io 1.2.3.4 999999999",
    "nothing here",
]
PII_EXPECT = [
    ("contact <EMAIL> or <EMAIL>", 2),
    ("server at <IP> port 8080", 1),
    ("id <NUM> and 12345678 trailing", 1),
    ("<EMAIL> <IP> <NUM>", 3),
    ("nothing here", 0),
]


def test_pii_redaction_planted(tmp_path):
    from sotohp_ray.pipelines.training import docs_pii_redacted

    d = _write_docs(tmp_path, PII_TEXTS)
    df = docs_pii_redacted(d).to_pandas().sort_values("doc_id")
    assert list(df["text_redacted"]) == [e[0] for e in PII_EXPECT]
    assert list(df["n_redactions"]) == [e[1] for e in PII_EXPECT]


def test_pii_oracle_sql_matches_on_planted(tmp_path):
    """The sf corpora have zero redactions, so prove the SQL oracle on
    a fixture where the rules actually fire."""
    import duckdb

    from sotohp_ray.pipelines.training import (
        docs_pii_redacted,
        docs_pii_redacted_sql,
    )

    d = _write_docs(tmp_path, PII_TEXTS)
    ray_df = (
        docs_pii_redacted(d).to_pandas().sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    sql_df = (
        con.sql(docs_pii_redacted_sql()).df().sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(ray_df["text_redacted"]) == list(sql_df["text_redacted"])
    assert list(ray_df["n_redactions"]) == list(sql_df["n_redactions"])
    assert int(ray_df["n_redactions"].sum()) == 7  # rules really fired


def _brute_chunks(texts, ids, chunk, overlap):
    from sotohp_ray.pipelines.textops import _TOK

    stride = chunk - overlap
    toks = _TOK.token_lists(pa.array(texts, pa.large_string())).to_pylist()
    rows = []
    for did, tl in zip(ids, toks):
        n = len(tl)
        if n == 0:
            continue
        s = 0
        cid = 0
        while True:
            end = min(s + chunk, n)
            rows.append((did, cid, end - s, tl[s], tl[end - 1]))
            if s + chunk >= n:
                break
            s += stride
            cid += 1
    return rows


def test_doc_chunks_matches_bruteforce(tmp_path):
    from sotohp_ray.pipelines.training import doc_chunks

    # token counts around every boundary: 0, 1, chunk-1, chunk,
    # chunk+1, one full stride past, and a long multi-chunk doc
    texts = [
        "1234",  # digits only -> 0 tokens
        "alpha",
        " ".join(f"w{i} x" for i in range(20)),
        " ".join(f"tok{i} y" for i in range(40)),
        " ".join(f"z{i} q p" for i in range(33)),
    ]
    d = _write_docs(tmp_path, texts)
    got = (
        doc_chunks(d, chunk=32, overlap=8)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
    )
    want = _brute_chunks(texts, range(len(texts)), 32, 8)
    assert (
        list(
            got[
                ["doc_id", "chunk_id", "chunk_tokens", "first_tok", "last_tok"]
            ].itertuples(index=False, name=None)
        )
        == want
    )
    # the boundary rule emitted no pure-suffix chunk
    assert (got["chunk_tokens"] > 8).all() or (got["chunk_id"] == 0).any()


def test_doc_chunks_rejects_bad_window():
    from sotohp_ray.pipelines.training import doc_chunks

    with pytest.raises(ValueError):
        doc_chunks(SF, chunk=8, overlap=8)


def _brute_mixture(texts, ids, langs, budget):
    from sotohp_ray.pipelines.training import _MIX_MUL
    from sotohp_ray.pipelines.textops import _TOK

    toks = _TOK.token_lists(pa.array(texts, pa.large_string()))
    import pyarrow.compute as pc

    n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    pr = (
        np.asarray(ids, dtype=np.uint64) * np.uint64(_MIX_MUL)
    ) % np.uint64(1 << 32)
    keep = set()
    for g in set(langs):
        rows = [
            (pr[i], ids[i], n[i])
            for i in range(len(ids))
            if langs[i] == g
        ]
        rows.sort()
        run = 0
        for p, did, nt in rows:
            run += int(nt)
            if run <= budget:
                keep.add(did)
    return keep


def test_token_budget_mixture_matches_bruteforce(tmp_path):
    from sotohp_ray.pipelines.training import token_budget_mixture

    rng = np.random.default_rng(7)
    texts, langs, ids = [], [], []
    for i in range(120):
        nw = int(rng.integers(0, 12))
        # nw == 0 -> "1234" (zero analyzed tokens): exercises the
        # zero-token boundary rows of the QUALIFY semantics
        texts.append(
            "1234" if nw == 0 else " ".join(
                f"w{rng.integers(0, 50)}" for _ in range(nw)
            )
        )
        langs.append(["en", "de", "fr"][int(rng.integers(0, 3))])
        ids.append(i * 13 + 5)
    d = _write_docs(tmp_path, texts, langs=langs, ids=ids)
    for budget in (0, 30, 200, 10_000_000):
        got = token_budget_mixture(d, budget=budget).to_pandas()
        want = _brute_mixture(texts, ids, langs, budget)
        assert set(got["doc_id"]) == want, f"budget={budget}"
        if budget == 10_000_000:
            assert len(got) == len(ids)  # everything fits


def test_doc_oov_rate_matches_bruteforce(tmp_path):
    from sotohp_ray.pipelines.training import doc_oov_rate
    from sotohp_ray.pipelines.textops import _TOK

    texts = [
        "apple apple banana cherry",
        "banana date elder fig grape",
        "apple banana apple",
        "1234",
    ]
    d = _write_docs(tmp_path, texts)
    got = doc_oov_rate(d, vocab_size=2).to_pandas().sort_values("doc_id")
    toks = _TOK.token_lists(pa.array(texts, pa.large_string())).to_pylist()
    from collections import Counter

    cf = Counter(t for tl in toks for t in tl)
    # top-2 by (count desc, term asc)
    vocab = {
        t for t, _ in sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    }
    for row, tl in zip(got.itertuples(), toks):
        n_oov = sum(1 for t in tl if t not in vocab)
        assert row.n_tokens == len(tl)
        assert row.n_oov == n_oov
        assert row.oov_rate == (
            round(n_oov / len(tl), 6) if tl else 0.0
        )

def test_doc_lm_score_matches_bruteforce(tmp_path):
    """Bigram-LM cross-entropy vs a pure-Python model on a planted
    corpus with a tiny vocab (so <unk> mapping and smoothing both
    bite), including a doc with repeated fluent bigrams (low CE), a
    noise doc (high CE), and a 1-token doc (excluded)."""
    import math
    from collections import Counter

    from sotohp_ray.pipelines.textops import _TOK
    from sotohp_ray.pipelines.training import doc_lm_score

    texts = [
        "the cat sat on the mat the cat sat",
        "the cat sat on the mat",
        "zig quux blorp wobble frotz",
        "the",
        "",
        "mat cat the on sat",
    ]
    d = _write_docs(tmp_path, texts)
    V = 4
    got = doc_lm_score(d, vocab_size=V).to_pandas().sort_values("doc_id")

    toks = _TOK.token_lists(pa.array(texts, pa.large_string())).to_pylist()
    cf = Counter(t for tl in toks for t in tl)
    vocab = [
        t for t, _ in sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:V]
    ]
    v = len(vocab)
    m = [[t if t in vocab else "<unk>" for t in tl] for tl in toks]
    bc: Counter = Counter()
    for tl in m:
        bc.update(zip(tl, tl[1:]))
    uc = Counter()
    for (w1, _), c in bc.items():
        uc[w1] += c
    exp = {}
    for i, tl in enumerate(m):
        bgs = list(zip(tl, tl[1:]))
        if not bgs:
            continue
        ll = [math.log((bc[b] + 1.0) / (uc[b[0]] + v + 1.0)) for b in bgs]
        exp[i] = (len(bgs), round(-sum(ll) / len(bgs), 6))
    assert sorted(got["doc_id"]) == sorted(exp)
    for row in got.itertuples():
        nb, ce = exp[int(row.doc_id)]
        assert row.n_bigrams == nb, row.doc_id
        assert row.cross_entropy == pytest.approx(ce, abs=2e-6), row.doc_id
    # repeating a doc's bigrams raises their counts -> its CE drops
    # (no cross-doc claim: unk-unk can legitimately be a hot bigram)
    assert got["cross_entropy"].min() > 0.0

def test_training_shards_partition_properties(tmp_path):
    """Deterministic shuffle shards: every doc appears exactly once,
    shard = hash % n, per-shard positions are dense 0..len-1 in
    (pr, doc_id) order, and a second run is byte-identical."""
    from sotohp_ray.pipelines.training import _MIX_MUL, training_shards

    ids = [3, 7, 11, 100, 4096, 77777, 12, 13, 14, 15]
    d = _write_docs(tmp_path, [f"doc {i}" for i in ids], ids=ids)
    n_shards = 4
    got = (
        training_shards(d, n_shards=n_shards)
        .to_pandas().sort_values(["shard_id", "pos"])
    )
    assert sorted(got["doc_id"]) == sorted(ids)
    pr = {i: (i * _MIX_MUL) % (1 << 32) for i in ids}
    for i, s in zip(got["doc_id"], got["shard_id"]):
        assert s == pr[int(i)] % n_shards
    for s, g in got.groupby("shard_id"):
        assert list(g["pos"]) == list(range(len(g)))
        want = sorted(g["doc_id"], key=lambda i: (pr[int(i)], int(i)))
        assert list(g["doc_id"]) == want
    again = (
        training_shards(d, n_shards=n_shards)
        .to_pandas().sort_values(["shard_id", "pos"])
    )
    assert got.reset_index(drop=True).equals(again.reset_index(drop=True))

def test_doc_packing_matches_bruteforce(tmp_path):
    """Next-fit packing vs a pure-Python fold over planted token
    counts: oversized docs (own overflowing sequence), zero-token
    docs, exact-fit boundaries, and multi-shard independence."""
    from sotohp_ray.pipelines.textops import _TOK
    from sotohp_ray.pipelines.training import _MIX_MUL, doc_packing

    # word counts engineered around L=8: exact fit, overflow-by-one,
    # oversized, zero tokens ("1234" analyzes to no tokens)
    sizes = [3, 5, 1, 8, 9, 0, 2, 7, 8, 1, 4, 4, 4]
    texts = ["1234" if s == 0 else " ".join(f"w{j}" for j in range(s))
             for s in sizes]
    ids = [i * 7 + 2 for i in range(len(sizes))]
    d = _write_docs(tmp_path, texts, ids=ids)
    L, n_shards = 8, 3
    got = (
        doc_packing(d, seq_tokens=L, n_shards=n_shards)
        .to_pandas().sort_values(["shard_id", "seq_id", "offset"])
    )
    # brute force: per shard, (pr, doc_id) order, sequential fold
    toks = _TOK.token_lists(pa.array(texts, pa.large_string())).to_pylist()
    nt = {i: len(tl) for i, tl in zip(ids, toks)}
    assert [nt[i] for i in ids] == sizes  # fixture really has these
    pr = {i: (i * _MIX_MUL) % (1 << 32) for i in ids}
    exp = {}
    for sh in range(n_shards):
        rows = sorted(
            (i for i in ids if pr[i] % n_shards == sh),
            key=lambda i: (pr[i], i),
        )
        seq, fill = 0, None
        for i in rows:
            if fill is None:
                fill = nt[i]
            elif fill + nt[i] <= L:
                off = fill
                fill += nt[i]
                exp[i] = (sh, seq, off)
                continue
            else:
                seq += 1
                fill = nt[i]
            exp[i] = (sh, seq, 0)
    assert len(got) == len(ids)
    for r in got.itertuples():
        sh, seq, off = exp[int(r.doc_id)]
        assert (r.shard_id, r.seq_id, r.offset) == (sh, seq, off), r.doc_id
        assert r.n_tokens == nt[int(r.doc_id)]
    # every sequence respects capacity unless it holds one oversized doc
    for (_, _), g in got.groupby(["shard_id", "seq_id"]):
        assert g["n_tokens"].sum() <= L or len(g) == 1


def test_tokens_sidecar_skips_tokenization(tmp_path, monkeypatch):
    """VERDICT-r4 ask #6: once the analyzed-tokens sidecar exists for a
    (corpus, tokenizer-config) pair, token-based operators must do ZERO
    regex/tokenizer work — guarded by making the tokenizer explode."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.functions.tokenizer import CodeTokenizer
    from sotohp_ray.pipelines import textops, training

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "lang": pa.array(["py", "py", "go"]),
        "text": pa.array([
            "def fooBar(x): return x + 1",
            "spark sort merge join",
            "",
        ]),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    first = textops.term_df(str(d)).to_pandas()  # builds the sidecar

    def boom(*a, **k):
        raise AssertionError("tokenizer ran despite tokens sidecar")

    monkeypatch.setattr(CodeTokenizer, "token_lists", boom)
    monkeypatch.setattr(CodeTokenizer, "exploded", boom)
    again = textops.term_df(str(d)).to_pandas()
    assert sorted(again["term"]) == sorted(first["term"])
    # a DIFFERENT token op rides the same sidecar with zero tokenizing
    oov = training.doc_oov_rate(str(d)).take_all()
    assert len(oov) == 3
    lm = training.doc_lm_score(str(d)).take_all()
    assert len(lm) >= 1


def test_tokens_sidecar_invalidated_by_tokenizer_config(tmp_path):
    """The sidecar key covers the tokenizer version_hash: a config
    change must produce a DIFFERENT sidecar path (never silently mix
    two tokenizations — the M8/M11 lineage discipline)."""
    from sotohp_ray.config import TokenizerRules
    from sotohp_ray.pipelines import textops

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "lang": pa.array(["py"]),
        "text": pa.array(["alpha beta"]),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    p1 = textops._tokens_cache_dir(str(d))
    old_tok = textops._TOK

    class _Tok2:
        rules = TokenizerRules(stopwords=frozenset({"alpha"}))

    try:
        textops._TOK = _Tok2()
        p2 = textops._tokens_cache_dir(str(d))
    finally:
        textops._TOK = old_tok
    assert p1 != p2


def _ref_bpe(word_freqs, n_merges):
    """Independent reference BPE (Sennrich 2016 greedy): symbols =
    chars, position-weighted pair counts, (count desc, pair asc)
    argmax, left-to-right non-overlapping replace, stop below count
    2. Returns (merge list, final segmentation dict)."""
    from collections import Counter

    seqs = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        pc_ = Counter()
        for w, f in word_freqs.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc_[(s[i], s[i + 1])] += f
        if not pc_:
            break
        (l, r), c = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        merges.append((l, r, c))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


def test_bpe_train_matches_reference_and_counts(tmp_path):
    """bpe_train's merge table equals an independent greedy-BPE
    reference bit-for-bit on a planted corpus, and bpe_token_count's
    per-doc subword counts equal summing each word's final reference
    segmentation. The actor's rank-order encoder must reproduce the
    training segmentation for every training word (the classic BPE
    encode/train consistency property)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.functions.tokenizer import CodeTokenizer
    from sotohp_ray.pipelines import training

    texts = [
        "lowest lower low lowly newest newer new widest wider wide",
        "lowest newest widest lowest newest lowest slow slowest",
        "renew renewed renewal lowland newlow",
        "single",
        "",
    ]
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "lang": pa.array(["en"] * len(texts)),
        "text": pa.array(texts),
    }), str(d / "documents.parquet"))

    tok = CodeTokenizer()
    from collections import Counter

    wf = Counter()
    doc_words = []
    for t in texts:
        ws = tok.tokens_of(t)
        doc_words.append(ws)
        wf.update(ws)

    n_merges = 12
    ref_merges, ref_seqs = _ref_bpe(dict(wf), n_merges)
    got = training.bpe_train(str(d), n_merges=n_merges).to_pandas()
    eng = list(zip(got["left"], got["right"], got["count"].astype(int)))
    assert eng == ref_merges

    counts = training.bpe_token_count(
        str(d), n_merges=n_merges
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    for i, ws in enumerate(doc_words):
        want = sum(len(ref_seqs[w]) for w in ws)
        assert int(counts["n_bpe_tokens"][i]) == want, (i, ws)
        assert int(counts["n_words"][i]) == len(ws)

    # encode/train consistency: the rank-order encoder reproduces the
    # training segmentation length for every training word
    import ray as _ray

    words = sorted(wf)
    lens = np.array([0] * 0, dtype=np.int64)
    mref = _ray.put(([], lens, ref_merges))  # no precomputed words
    enc = training._BPECounter(mref)
    for w in words:
        assert enc._encode_len(w) == len(ref_seqs[w]), w


def test_dsir_weights_target_skew(tmp_path):
    """DSIR sanity on a planted two-domain corpus: docs made of
    target-domain tokens get strictly positive importance weights,
    off-domain docs strictly negative, and a doc with no tokens is
    emitted as (0, 0.0)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.training import dsir_weights

    texts = [
        "alpha beta gamma alpha beta",      # en (target-ish tokens)
        "alpha gamma beta beta alpha",      # en
        "uno dos tres cuatro uno dos",      # es
        "dos tres uno cuatro tres",         # es
        "",                                  # empty edge
    ]
    langs = ["en", "en", "es", "es", "en"]
    t = pa.table({
        "doc_id": pa.array(list(range(5)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    out = (
        dsir_weights(str(d), target_lang="en").to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [0, 1, 2, 3, 4]
    assert out["log_ratio"][0] > 0 and out["log_ratio"][1] > 0
    assert out["log_ratio"][2] < 0 and out["log_ratio"][3] < 0
    assert out["n_tokens"][4] == 0 and out["log_ratio"][4] == 0.0


def test_span_corruption_schedule_invariants():
    """Spans are block-aligned, disjoint, in-bounds and ~15% of
    blocks; sentinel ids are dense per doc in span order; the
    schedule is deterministic across calls — together with the
    SQL-oracle parity this pins the full T5 schedule."""
    import numpy as np
    import pyarrow.parquet as pq

    from sotohp_ray.pipelines.training import (
        SPAN_BLOCK,
        SPAN_NOISE,
        doc_span_corruption,
    )

    sf = "/root/testdata/sf0.001"
    a = doc_span_corruption(sf).to_pandas().sort_values(
        ["doc_id", "span_start"]).reset_index(drop=True)
    b = doc_span_corruption(sf).to_pandas().sort_values(
        ["doc_id", "span_start"]).reset_index(drop=True)
    assert a.equals(b)  # deterministic
    assert len(a)
    assert (a["span_start"] % SPAN_BLOCK == 0).all()
    assert (a["span_len"] > 0).all() and (
        a["span_len"] <= SPAN_BLOCK).all()
    from sotohp_ray.functions.tokenizer import CodeTokenizer

    tok = CodeTokenizer()
    docs = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    n_of = {
        int(d): len(tok.tokens_of(t))
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    total_blocks = sum(-(-n // SPAN_BLOCK) for n in n_of.values())
    frac = len(a) / total_blocks
    assert abs(frac - SPAN_NOISE) < 0.03  # ~15% of blocks masked
    for doc, g in a.groupby("doc_id"):
        s = g["span_start"].to_numpy()
        ln = g["span_len"].to_numpy()
        assert (s + ln <= n_of[int(doc)]).all()  # in bounds
        assert (s[1:] >= s[:-1] + ln[:-1]).all()  # disjoint, sorted
        assert list(g["sentinel_id"]) == list(range(len(g)))


def test_lm_model_trained_once_and_durable(monkeypatch):
    """The shared bigram-LM artifact: after one consumer trains it,
    (a) the in-process memo serves every later consumer without
    touching the corpus, and (b) clearing the memo still serves from
    the durable .npz — the corpus is never re-read. Guarded by
    replacing the token stream with a tripwire."""
    import sotohp_ray.pipelines.training as tr

    sf = "/root/testdata/sf0.001"
    v, terms, bc, uc = tr._lm_model(sf, 512)
    assert v > 0 and bc.shape == ((v + 1) * (v + 1),)

    def boom(*a, **k):
        raise AssertionError("LM retrained: corpus re-read")

    monkeypatch.setattr(tr, "_docs_tokens", boom)
    v2, terms2, bc2, uc2 = tr._lm_model(sf, 512)  # memo hit
    assert v2 == v and terms2 == terms
    key = [k for k in tr._LM_MEMO if k.endswith("-v512")]
    for k in key:
        del tr._LM_MEMO[k]
    v3, terms3, bc3, uc3 = tr._lm_model(sf, 512)  # npz hit
    assert v3 == v and terms3 == terms
    assert np.allclose(bc3, bc) and np.allclose(uc3, uc)
