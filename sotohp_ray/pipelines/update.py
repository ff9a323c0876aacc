"""Per-document update/upsert — the hash-resync path (reference
analog: ``MediaServiceLive.scala:1317-1349,1522`` synchronizeState
re-processes only documents whose per-doc state hash changed).

``sync_changed_docs`` takes the CURRENT corpus rows (the sync scan)
and re-indexes only what actually changed:

1. **Detect** — each incoming row's identity is its deterministic
   doc_uuid (repo, path, commit) and its content state is its
   content_sha256. Docmeta rows for the incoming uuids are read with a
   parquet ``in`` filter (the broadcast-semi-join shape: the sync
   batch is small, the index is not); a row is *changed* when its sha
   differs and *new* when its uuid is absent. Unchanged rows cost one
   hash compare and nothing else.
2. **Tombstone + append** — changed docs' old engine ids are
   tombstoned (pipelines/delete.py); the changed+new rows become ONE
   new increment partition appended at ``base_doc_id = doc_id_space``
   (append-only id allocation — no base shifts, so no cascade
   re-indexing of existing partitions). The increment's input rows are
   persisted under ``index_dir/increments/`` so the partition has a
   durable, fingerprintable input like every other partition.
3. **Merge** — compaction applies the tombstones and reruns the
   bucketed merge with exact post-update df/N/avgdl, so search results
   equal an index freshly built over the updated corpus (the
   compaction==fresh-build contract, pytest-verified for deletes).

Source-of-truth caveat: an increment represents state newer than the
original corpus directory. A later full ``build_index`` against that
(unchanged) corpus dir re-derives the index from the corpus and drops
increments — exactly like the reference, where the filesystem is
always the authority a full re-sync returns to.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from sotohp_ray.config import IndexConfig
from sotohp_ray.state import lineage as lin


def _existing_partition_ids(index_dir: str) -> list[int]:
    pdir = os.path.join(index_dir, "partials")
    if not os.path.isdir(pdir):
        return []
    return sorted(
        int(d[len("partition-"):])
        for d in os.listdir(pdir)
        if d.startswith("partition-")
    )


def detect_changes(index_dir: str, incoming: pa.Table) -> dict:
    """-> {"changed_rows": int[], "new_rows": int[], "old_ids": int[],
    "uuids": list[str], "shas": list[str]} — row indices into
    ``incoming`` that need re-indexing, plus the engine doc_ids their
    previous versions occupy."""
    from sotohp_ray.functions.hashing import doc_uuid_column, sha256_column
    from sotohp_ray.pipelines.delete import load_tombstones

    uuids = doc_uuid_column(
        incoming["repo"], incoming["path"], incoming["commit"]
    ).to_pylist()
    shas = sha256_column(
        incoming["content"].combine_chunks()
    ).to_pylist()
    dm = pq.read_table(
        os.path.join(index_dir, "docmeta"),
        columns=["doc_id", "doc_uuid", "content_sha256"],
        filters=[("doc_uuid", "in", list(set(uuids)))],
    )
    # a doc synced twice before compaction has BOTH its tombstoned old
    # row and its live row in docmeta — only the live one is current
    tomb = load_tombstones(index_dir)
    if tomb.size:
        ids = dm["doc_id"].to_numpy(zero_copy_only=False)
        dm = dm.filter(
            pa.array(~np.isin(ids.astype(np.uint64), tomb, kind="sort"))
        )
    prev = {
        u: (int(d), s)
        for d, u, s in zip(
            dm["doc_id"].to_pylist(),
            dm["doc_uuid"].to_pylist(),
            dm["content_sha256"].to_pylist(),
        )
    }
    changed, new, old_ids = [], [], []
    for i, (u, s) in enumerate(zip(uuids, shas)):
        hit = prev.get(u)
        if hit is None:
            new.append(i)
        elif hit[1] != s:
            changed.append(i)
            old_ids.append(hit[0])
    return {
        "changed_rows": changed,
        "new_rows": new,
        "old_ids": old_ids,
        "uuids": uuids,
        "shas": shas,
    }


def sync_changed_docs(
    index_dir: str, incoming: pa.Table, compact: bool = True
) -> dict:
    """Re-index exactly the incoming rows whose content changed (plus
    brand-new rows). Idempotent: a second sync with the same rows is a
    no-op. Returns counts + the new stats."""
    import hashlib

    from sotohp_ray.pipelines.build_index import (
        PartitionIndexer,
        _config_to_kwargs,
        merge_phase,
    )
    from sotohp_ray.pipelines.delete import compact_index, delete_docs

    with open(os.path.join(index_dir, "config.json")) as f:
        config = IndexConfig.from_json(f.read())
    det = detect_changes(index_dir, incoming)
    rows = det["changed_rows"] + det["new_rows"]
    if not rows:
        with open(os.path.join(index_dir, "stats.json")) as f:
            stats = json.load(f)
        return {"changed": 0, "new": 0, "tombstoned": 0, "stats": stats}

    if det["old_ids"]:
        delete_docs(index_dir, engine_doc_ids=det["old_ids"])

    # one increment partition, ids appended at the top of the space
    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)
    base = int(stats.get("doc_id_space", stats["n_docs"]))
    pid = (max(_existing_partition_ids(index_dir), default=-1)) + 1
    inc = incoming.take(pa.array(sorted(rows), pa.int64()))
    inc_path = os.path.join(
        index_dir, "increments", f"partition-{pid:05d}.parquet"
    )
    lin.atomic_write_table(inc, inc_path)
    ix = PartitionIndexer(_config_to_kwargs(config), index_dir)
    ix._index_one(pid, inc_path, base)

    # the id space grew; record it BEFORE compaction so searcher
    # arrays size correctly (compaction preserves doc_id_space)
    stats["doc_id_space"] = base + inc.num_rows
    with open(os.path.join(index_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1, sort_keys=True, default=str)

    if compact and det["old_ids"]:
        new_stats = compact_index(index_dir)
    else:
        # pure additions (or caller defers compaction): recompute the
        # global stats from lineage and rerun the merge so the new
        # partition's postings are queryable with exact df/N/avgdl
        records = [
            r for r in lin.read_records(index_dir)
            if r.get("status") == "done"
        ]
        n_docs = sum(r["doc_count"] for r in records)
        total_tokens = sum(r["token_count"] for r in records)
        new_stats = dict(stats)
        new_stats["n_docs"] = n_docs
        new_stats["total_tokens"] = total_tokens
        new_stats["total_postings"] = sum(
            r["posting_count"] for r in records
        )
        new_stats["avgdl"] = (total_tokens / n_docs) if n_docs else 0.0
        with open(os.path.join(index_dir, "stats.json"), "w") as f:
            json.dump(new_stats, f, indent=1, sort_keys=True, default=str)
        lineage_fp = hashlib.sha256(
            json.dumps(
                sorted(
                    (r["partition_id"], r["input_fingerprint"])
                    for r in records
                )
            ).encode()
        ).hexdigest()[:16]
        marker = os.path.join(index_dir, "_MERGE_DONE.json")
        if os.path.exists(marker):
            os.remove(marker)
        merge_phase(
            index_dir, config, n_docs, new_stats["avgdl"], lineage_fp
        )
    return {
        "changed": len(det["changed_rows"]),
        "new": len(det["new_rows"]),
        "tombstoned": len(det["old_ids"]),
        "increment_partition": pid,
        "stats": new_stats,
    }
