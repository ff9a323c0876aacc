"""Deterministic synthetic source-code corpus generator.

Produces the exact input-table shape from BASELINE.json ``input_hint``:
``(repo:string, path:string, commit:string, lang:string,
content:large_string)``, one Parquet file per partition so partition
boundaries / lineage / resume are observable (FIXTURES.md F1).

Design mirrors the reference's golden-corpus philosophy
(samples/dataset3 with exact expected counts,
MediaServiceSynchronizeTest.scala:47-71): content is assembled from
known token *emissions* — camelCase merges, snake_case merges, UPPER
renders, number literals, punctuation — so the expected analyzed token
multiset is known BY CONSTRUCTION, without running the tokenizer. The
sidecar ``expected.json`` carries exact totals (docs, tokens, vocab,
postings, df probes, duplicate groups).

Skew is built in: hot terms (``def``, ``import``, ``return``, ``self``)
appear in >=90% of rows with high tf; a tail of per-row-unique
identifiers has df=1.

Partition key ranges are non-overlapping and sorted (partition p's
``repo`` values all precede partition p+1's), so dense docID assignment
by (partition base offset + within-partition sort) equals a global sort
by (repo, path, commit) — the ``MediaAccessKey`` monotone-key
discipline (model/package.scala:48-100).
"""

from __future__ import annotations

import hashlib
import json
import os
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.large_string()),
    ]
)

PRESETS = {
    # rows, partitions, stats?
    "tiny": (64, 4, True),
    "small": (5000, 16, True),
    # sized so build COMPUTE (~120 core-sec) dominates the session's
    # fixed executor overhead — the N-vs-4N scaling measurement needs
    # the work, not the startup, to set the wall time
    "bench": (1_200_000, 192, False),
}

HOT_TERMS = ["def", "import", "return", "self"]
LANGS = ["py", "scala", "java", "js", "go", "rs"]

_SYLLA = [
    "parse", "http", "request", "read", "parquet", "file", "write",
    "batch", "stream", "index", "merge", "shard", "token", "score",
    "query", "block", "codec", "hash", "sort", "group", "filter",
    "map", "join", "count", "delta", "varint", "posting", "doc",
    "term", "lineage", "resume", "salt", "skew", "actor", "pool",
    "buffer", "config", "state", "store", "owner", "event", "media",
]


def _mid_vocab(rng: np.random.RandomState, size: int = 400) -> list[list[str]]:
    """Mid-frequency identifiers as token tuples (1-3 syllables)."""
    out = []
    for _ in range(size):
        k = rng.randint(1, 4)
        out.append([_SYLLA[rng.randint(len(_SYLLA))] for _ in range(k)])
    return out


def _render(parts: list[str], style: int) -> str:
    """Render token parts as one identifier; analyzed tokens == parts."""
    if len(parts) == 1 or style == 0:
        return "_".join(parts)  # snake_case
    if style == 1:  # camelCase
        return parts[0] + "".join(p.capitalize() for p in parts[1:])
    if style == 2:  # UPPER_SNAKE
        return "_".join(p.upper() for p in parts)
    return "-".join(parts)  # kebab


def _make_row(
    rng: np.random.RandomState,
    vocab: list[list[str]],
    uniq_token: str,
    zipf_idx: np.ndarray,
) -> tuple[str, list[str]]:
    """Build one document; returns (content, expected analyzed tokens)."""
    lines: list[str] = []
    tokens: list[str] = []

    def emit_ident(parts: list[str]) -> str:
        style = rng.randint(0, 4)
        tokens.extend(parts)
        return _render(parts, style)

    n_funcs = rng.randint(1, 4)
    for _ in range(n_funcs):
        name = vocab[zipf_idx[rng.randint(len(zipf_idx))]]
        arg = vocab[zipf_idx[rng.randint(len(zipf_idx))]]
        tokens.append("def")
        lines.append(f"def {emit_ident(name)}({emit_ident(arg)}):")
        n_body = rng.randint(1, 6)
        for _ in range(n_body):
            v = vocab[zipf_idx[rng.randint(len(zipf_idx))]]
            w = vocab[zipf_idx[rng.randint(len(zipf_idx))]]
            num = rng.randint(0, 1000)
            lines.append(f"    {emit_ident(v)} = {emit_ident(w)} + {num}")
        tokens.extend(["return", "self"])
        lines.append(f"    return self.{emit_ident(name)}")
    n_imports = rng.randint(1, 4)
    for _ in range(n_imports):
        m = vocab[zipf_idx[rng.randint(len(zipf_idx))]]
        tokens.append("import")
        lines.insert(0, f"import {emit_ident(m)}")
    tokens.append(uniq_token)
    lines.append(f"# {uniq_token}")
    return "\n".join(lines), tokens


def _gen_partition(
    out_dir: str,
    p: int,
    n: int,
    seed: int,
    preset: str,
    collect_tokens: bool,
) -> list[list[str]] | int:
    """Generate and write ONE partition file. Deterministic from
    (seed, p) alone, so partitions can be generated in any order or in
    parallel. Returns the expected-token rows when ``collect_tokens``
    (stats presets), else the row count."""
    base_rng = np.random.RandomState(seed)
    vocab = _mid_vocab(base_rng)
    zipf_idx = np.minimum(
        base_rng.zipf(1.3, size=4096) - 1, len(vocab) - 1
    ).astype(np.int64)
    dup_content, dup_tokens = _make_row(
        np.random.RandomState(seed + 10_000), vocab, "dupmarkertoken", zipf_idx
    )
    rng = np.random.RandomState(seed + 1 + p)
    repos, paths, commits, langs, contents = [], [], [], [], []
    exp_tokens_rows = []
    for i in range(n):
        uniq = f"uniq{p}x{i}tok"
        if preset != "bench" and p < 2 and i == 1:
            content, toks = dup_content, list(dup_tokens)
        else:
            content, toks = _make_row(rng, vocab, uniq, zipf_idx)
        repos.append(f"org{p:04d}/repo{rng.randint(8)}")
        paths.append(
            f"src/pkg{rng.randint(20)}/mod{i:05d}.{LANGS[rng.randint(len(LANGS))]}"
        )
        commits.append(hashlib.sha1(f"{seed}:{p}:{i}".encode()).hexdigest())
        langs.append(LANGS[rng.randint(len(LANGS))])
        contents.append(content)
        exp_tokens_rows.append(toks)
    # shuffle row order inside the partition so docID assignment
    # (sort by repo,path,commit) is actually exercised
    order = rng.permutation(n)
    tbl = pa.table(
        {
            "repo": pa.array([repos[j] for j in order]),
            "path": pa.array([paths[j] for j in order]),
            "commit": pa.array([commits[j] for j in order]),
            "lang": pa.array([langs[j] for j in order]),
            "content": pa.array(
                [contents[j] for j in order], type=pa.large_string()
            ),
        },
        schema=SCHEMA,
    )
    pq.write_table(tbl, os.path.join(out_dir, f"part-{p:05d}.parquet"))
    return exp_tokens_rows if collect_tokens else n


def generate_corpus(
    out_dir: str,
    preset: str = "small",
    rows: int | None = None,
    partitions: int | None = None,
    seed: int = 42,
    with_stats: bool | None = None,
) -> dict:
    """Write ``part-NNNNN.parquet`` files + ``expected.json`` sidecar.
    Returns the metadata dict. Stats-free presets generate partitions
    in parallel via Ray tasks when a Ray session is up (each partition
    is deterministic from (seed, p), so parallel == sequential output
    byte-for-byte)."""
    n_rows, n_parts, stats_default = PRESETS[preset]
    n_rows = rows or n_rows
    n_parts = partitions or n_parts
    with_stats = stats_default if with_stats is None else with_stats
    os.makedirs(out_dir, exist_ok=True)

    rows_per_part = [
        n_rows // n_parts + (1 if i < n_rows % n_parts else 0)
        for i in range(n_parts)
    ]
    df_counter: Counter = Counter()
    total_tokens = 0
    total_postings = 0
    dup_groups = 0
    doc_count = 0

    parallel = False
    if not with_stats and n_rows >= 50_000:
        try:
            import ray

            parallel = ray.is_initialized()
        except ImportError:
            pass

    if parallel:
        import ray

        gen = ray.remote(num_cpus=1)(_gen_partition)
        refs = [
            gen.remote(out_dir, p, rows_per_part[p], seed, preset, False)
            for p in range(n_parts)
        ]
        doc_count = sum(ray.get(refs))
    else:
        for p in range(n_parts):
            res = _gen_partition(
                out_dir, p, rows_per_part[p], seed, preset, with_stats
            )
            if with_stats:
                exp_tokens_rows = res
                doc_count += len(exp_tokens_rows)
                for toks in exp_tokens_rows:
                    total_tokens += len(toks)
                    c = Counter(toks)
                    total_postings += len(c)
                    df_counter.update(c.keys())
                if preset != "bench" and p < 2 and rows_per_part[p] > 1:
                    dup_groups += 1
            else:
                doc_count += res

    meta: dict = {
        "preset": preset,
        "rows": doc_count,
        "partitions": n_parts,
        "seed": seed,
    }
    if with_stats:
        probe_terms = (
            HOT_TERMS
            + ["parse", "http", "uniq0x0tok", "uniq1x2tok", "dupmarkertoken"]
            + ["zzznotfound"]
        )
        meta.update(
            {
                "total_tokens": total_tokens,
                "total_postings": total_postings,
                "vocab_size": len(df_counter),
                "df_probes": {t: df_counter.get(t, 0) for t in probe_terms},
                "dup_content_rows": dup_groups,
                "avgdl": total_tokens / doc_count,
            }
        )
    with open(os.path.join(out_dir, "expected.json"), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    return meta


def reference_queries(corpus_dir: str, seed: int = 42) -> list[dict]:
    """Deterministic query set over a generated corpus (FIXTURES.md F4):
    20 single-term (hot / mid / df=1 / absent), 30 multi-term bags
    (2-5 terms), 10 adversarial (all-hot, duplicate query terms,
    k > matching docs)."""
    with open(os.path.join(corpus_dir, "expected.json")) as f:
        meta = json.load(f)
    rng = np.random.RandomState(seed + 7)
    mid = _SYLLA
    queries: list[dict] = []
    singles = (
        HOT_TERMS
        + [mid[rng.randint(len(mid))] for _ in range(12)]
        + ["uniq0x0tok", "uniq1x2tok", "zzznotfound", "alsonotfound"]
    )
    for q in singles[:20]:
        queries.append({"q": q, "k": 10})
    for _ in range(30):
        k = rng.randint(2, 6)
        terms = [mid[rng.randint(len(mid))] for _ in range(k)]
        if rng.rand() < 0.4:
            terms.append(HOT_TERMS[rng.randint(len(HOT_TERMS))])
        queries.append({"q": " ".join(terms), "k": 10})
    queries.append({"q": " ".join(HOT_TERMS), "k": 10})
    queries.append({"q": "def def def", "k": 10})
    queries.append({"q": "uniq0x0tok uniq1x2tok", "k": 10})
    queries.append({"q": "parse parse http", "k": 10})
    queries.append({"q": "zzznotfound def", "k": 10})
    queries.append({"q": "uniq0x0tok", "k": 50})
    queries.append({"q": "dupmarkertoken", "k": 10})
    queries.append({"q": "import return self", "k": 25})
    queries.append({"q": "42 17", "k": 10})  # tokenizes to nothing
    queries.append({"q": "readParquetFile mergeShardIndex", "k": 10})
    return queries


def corpus_files(corpus_dir: str) -> list[str]:
    """Sorted partition file list — file order IS partition order."""
    return sorted(
        os.path.join(corpus_dir, f)
        for f in os.listdir(corpus_dir)
        if f.startswith("part-") and f.endswith(".parquet")
    )
