"""Index build orchestration — two Ray Data phases + tiny driver-side
metadata steps.

Phase 1 (embarrassingly parallel, resumable per input partition):
  a Dataset of partition descriptors -> ``map_batches(PartitionIndexer,
  batch_size=1, concurrency=pool)`` actor pool. Each call reads ONE
  input Parquet partition, runs the vectorized SPIMI stage
  (stages/spimi.py), atomically writes ``docmeta/partition_id=P/`` and
  ``partials/partition_id=P/``, then the lineage record. Already-done
  partitions (lineage fingerprint + config match) are skipped before
  the Dataset is even built — the resume filter
  (MediaServiceLive.scala:1522 analog).

  Why descriptors instead of a flat ``read_parquet``: lineage must be
  written per INPUT partition after its outputs are durable. A flat
  read interleaves rows of many files per block, destroying that
  boundary. The descriptor Dataset keeps the pipeline Ray-Data-native
  (streaming, backpressured, actor-pool scheduled) while making the
  partition the unit of checkpointing. At 10^12-file scale the
  descriptor table is itself a Dataset read from a manifest.

Phase 2 (THE shuffle): ``read_parquet(partials).groupby("term_shard")
  .map_groups(merge_shard)`` -> ``write_parquet(dictionary/,
  partition_cols=["term_shard"])``. Hash-sharded terms spread hot terms'
  *dictionary* entries; the *postings volume* of a hot term is bounded
  per shuffled row by salt chunking (stages/spimi.py). Marked done by a
  ``_MERGE_DONE.json`` containing the config + lineage fingerprints, so
  a resumed build redoes the merge iff phase-1 output changed.

Global stats (N, total tokens, avgdl) are aggregated from lineage
records (driver-side, tiny) into ``stats.json`` — the A2-style
partial+final multi-aggregate (Statistics.scala:49-135 analog).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from sotohp_ray.config import IndexConfig
from sotohp_ray.sources.corpus import corpus_files
from sotohp_ray.stages.spimi import index_partition_table
from sotohp_ray.state import lineage as lin


def _config_fingerprint(config: IndexConfig) -> str:
    return hashlib.sha256(config.to_json().encode()).hexdigest()[:16]


class PartitionIndexer:
    """Actor-pool stage: tokenizer compiled once per actor
    (``__init__``), one input partition indexed per call — the
    DJL-predictor pattern (FacesProcessor.scala:167-192: expensive
    state allocated once per process, record work per invocation)."""

    def __init__(self, config_kwargs: dict, index_dir: str):
        from sotohp_ray.functions.tokenizer import CodeTokenizer

        self.config = _config_from_kwargs(config_kwargs)
        self.tokenizer = CodeTokenizer(self.config.tokenizer)
        self.index_dir = index_dir
        self.cfg_fp = _config_fingerprint(self.config)

    def __call__(self, batch: dict) -> dict:
        out = {k: [] for k in ("partition_id", "doc_count", "token_count", "posting_count")}
        for pid, fpath, base in zip(
            batch["partition_id"], batch["file"], batch["base_doc_id"]
        ):
            m = self._index_one(int(pid), str(fpath), int(base))
            for k in out:
                out[k].append(m[k])
        return {k: np.array(v, dtype=np.int64) for k, v in out.items()}

    def _index_one(self, pid: int, fpath: str, base: int) -> dict:
        t = pq.read_table(fpath)
        docmeta, partials, metrics = index_partition_table(
            t, pid, base, self.config, tokenizer=self.tokenizer
        )
        # non-hive directory names: both tables carry a physical
        # partition_id column, and a hive-style "partition_id=" path
        # would make readers infer a conflicting partition field
        lin.atomic_write_table(
            docmeta,
            os.path.join(
                self.index_dir, "docmeta", f"partition-{pid:05d}", "data.parquet"
            ),
        )
        lin.atomic_write_table(
            partials,
            os.path.join(
                self.index_dir, "partials", f"partition-{pid:05d}", "data.parquet"
            ),
        )
        record = {
            "partition_id": pid,
            "input_file": os.path.basename(fpath),
            "input_fingerprint": lin.input_fingerprint(fpath),
            "config": self.cfg_fp,
            "tokenizer_version": self.config.tokenizer.version_hash(),
            "base_doc_id": base,
            "status": "done",
            **metrics,
        }
        lin.write_record(self.index_dir, record)
        return metrics


def _config_from_kwargs(kw: dict) -> IndexConfig:
    from sotohp_ray.config import BM25Params, TokenizerRules

    return IndexConfig(
        num_term_shards=kw["num_term_shards"],
        block_size=kw["block_size"],
        salt_rows=kw["salt_rows"],
        codec=kw["codec"],
        tokenizer=TokenizerRules(
            rewritings=tuple(tuple(x) for x in kw["rewritings"]),
            mappings=tuple(tuple(x) for x in kw["mappings"]),
            stopwords=frozenset(kw["stopwords"]),
        ),
        bm25=BM25Params(k1=kw["k1"], b=kw["b"]),
    )


def _config_to_kwargs(c: IndexConfig) -> dict:
    return {
        "num_term_shards": c.num_term_shards,
        "block_size": c.block_size,
        "salt_rows": c.salt_rows,
        "codec": c.codec,
        "rewritings": [list(x) for x in c.tokenizer.rewritings],
        "mappings": [list(x) for x in c.tokenizer.mappings],
        "stopwords": sorted(c.tokenizer.stopwords),
        "k1": c.bm25.k1,
        "b": c.bm25.b,
    }


def build_index(
    corpus_dir: str,
    index_dir: str,
    config: IndexConfig | None = None,
    concurrency: int | tuple | None = None,
    only_partitions: list[int] | None = None,
) -> dict:
    """Full build (phase 1 + stats + phase 2). Re-entrant: finished
    partitions are skipped via lineage; the merge is redone only when
    phase-1 output changed. ``only_partitions`` restricts phase 1 (used
    by the resume tests to simulate an interrupted build)."""
    import ray
    import ray.data

    config = config or IndexConfig()
    cfg_fp = _config_fingerprint(config)
    os.makedirs(index_dir, exist_ok=True)
    with open(os.path.join(index_dir, "config.json"), "w") as f:
        f.write(config.to_json())

    files = corpus_files(corpus_dir)
    counts = [pq.ParquetFile(f).metadata.num_rows for f in files]
    bases = np.zeros(len(files), dtype=np.int64)
    np.cumsum(counts[:-1], out=bases[1:])

    done = lin.completed_partitions(index_dir, cfg_fp)
    stale = [
        p
        for p, r in done.items()
        if r.get("input_fingerprint") != lin.input_fingerprint(files[p])
    ]
    for p in stale:
        done.pop(p)
    todo = [
        {"partition_id": p, "file": files[p], "base_doc_id": int(bases[p])}
        for p in range(len(files))
        if p not in done
        and (only_partitions is None or p in only_partitions)
    ]

    t0 = time.perf_counter()
    if todo:
        pool = concurrency
        if pool is None:
            # standalone scripts reach here before Ray Data's lazy
            # auto-init; fall back to host CPUs rather than forcing an
            # init (the driver contract forbids ray.init in the library)
            if ray.is_initialized():
                avail = int(ray.available_resources().get("CPU", 4))
            else:
                avail = os.cpu_count() or 4
            pool = max(1, min(len(todo), avail))
        ds = ray.data.from_items(todo)
        metrics_ds = ds.map_batches(
            PartitionIndexer,
            fn_constructor_kwargs={
                "config_kwargs": _config_to_kwargs(config),
                "index_dir": index_dir,
            },
            batch_size=1,
            batch_format="numpy",
            concurrency=pool,
            num_cpus=1,
        )
        metrics_ds.materialize()
    t_phase1 = time.perf_counter() - t0

    # ---- global stats from lineage (tiny, driver-side) -------------
    records = [
        r
        for r in lin.read_records(index_dir)
        if r.get("status") == "done" and r.get("config") == cfg_fp
    ]
    n_docs = sum(r["doc_count"] for r in records)
    total_tokens = sum(r["token_count"] for r in records)
    total_postings = sum(r["posting_count"] for r in records)
    stats = {
        "n_docs": n_docs,
        "total_tokens": total_tokens,
        "total_postings": total_postings,
        "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
        "partitions_done": len(records),
        "partitions_total": len(files),
        "config": cfg_fp,
    }
    with open(os.path.join(index_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1, sort_keys=True)

    if only_partitions is not None and len(records) < len(files):
        # simulated interrupt: phase 1 incomplete, skip the merge
        stats["merged"] = False
        return stats

    # ---- phase 2: the merge shuffle --------------------------------
    lineage_fp = hashlib.sha256(
        json.dumps(
            sorted(
                (r["partition_id"], r["input_fingerprint"]) for r in records
            )
        ).encode()
    ).hexdigest()[:16]
    marker = os.path.join(index_dir, "_MERGE_DONE.json")
    if os.path.exists(marker):
        with open(marker) as f:
            m = json.load(f)
        if m.get("config") == cfg_fp and m.get("lineage") == lineage_fp:
            stats["merged"] = True
            stats["merge_skipped"] = True
            return stats

    t1 = time.perf_counter()
    from sotohp_ray.stages.merge import merge_shard

    partials = ray.data.read_parquet(
        os.path.join(index_dir, "partials"),
        columns=[
            "term_shard", "term", "salt", "count",
            "doc0", "tf0", "dl0",
            "doc_blob", "tf_blob", "dl_blob",
        ],
    )
    avgdl = stats["avgdl"]

    def _merge(group: pa.Table) -> pa.Table:
        return merge_shard(group, n_docs, avgdl, config)

    dict_dir = os.path.join(index_dir, "dictionary")
    import shutil

    if os.path.isdir(dict_dir):
        shutil.rmtree(dict_dir)
    merged = partials.groupby("term_shard").map_groups(
        _merge, batch_format="pyarrow"
    )
    merged.write_parquet(dict_dir, partition_cols=["term_shard"])
    with open(marker, "w") as f:
        json.dump({"config": cfg_fp, "lineage": lineage_fp}, f)
    stats["merged"] = True
    stats["t_phase1_sec"] = round(t_phase1, 3)
    stats["t_merge_sec"] = round(time.perf_counter() - t1, 3)
    return stats
