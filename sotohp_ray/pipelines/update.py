"""Per-document update/upsert — the hash-resync path (reference
analog: ``MediaServiceLive.scala:1317-1349,1522`` synchronizeState
re-processes only documents whose per-doc state hash changed).

``sync_changed_docs`` takes corpus rows (the sync scan) and re-indexes
only what actually changed:

1. **Detect** — each incoming row's identity is its deterministic
   doc_uuid (repo, path, commit) and its content state is its
   content_sha256. Docmeta is scanned in batches with a hash-set
   membership test (``pc.is_in`` against the incoming uuid set — NOT a
   parquet ``in``-filter expression, whose literal list would be
   corpus-sized for a full resync); a row is *changed* when its sha
   differs and *new* when its uuid is absent. With
   ``remove_missing=True`` the same scan also collects live docs
   ABSENT from the incoming rows, which are then tombstoned — so
   presenting the full current corpus propagates deletions exactly
   like the reference's full re-sync. Unchanged rows cost one hash
   compare and nothing else.
2. **Tombstone + append** — changed docs' old engine ids are
   tombstoned (pipelines/delete.py); the changed+new rows become ONE
   new increment partition appended at ``base_doc_id = doc_id_space``
   (append-only id allocation — no base shifts, so no cascade
   re-indexing of existing partitions). The increment's input rows are
   persisted under ``index_dir/increments/`` plus an INTENT sidecar
   ``partition-N.json`` recording (pid, base, rows) BEFORE any index
   state changes — the crash-recovery record.
3. **Merge** — compaction applies the tombstones and reruns the
   bucketed merge with exact post-update df/N/avgdl, so search results
   equal an index freshly built over the updated corpus (the
   compaction==fresh-build contract, pytest-verified for deletes).

Crash safety: every step is either idempotent or replayable. The
``doc_id_space`` bump is written (atomically) BEFORE the increment is
indexed, so a half-indexed increment can never put docmeta ids beyond
the recorded space (which would crash ``Searcher.__init__``). Every
``sync_changed_docs`` call begins with ``_repair_interrupted``: any
increment intent without a 'done' lineage record is re-indexed from
its persisted input (all partition writes are atomic tmp+rename, so
re-running is safe), and a stale merge marker or pending tombstones
trigger the finishing merge/compaction that the interrupted run never
reached. A retry therefore REPAIRS instead of silently no-op'ing on
the "detect sees the new docmeta rows as current" early exit.

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
import pyarrow.compute as pc
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


def _increments_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "increments")


def _read_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "stats.json")) as f:
        return json.load(f)


def _write_stats(index_dir: str, stats: dict) -> None:
    # atomic (tmp+rename): stats.json is read by every Searcher; a
    # torn write would take the whole index offline
    lin.write_json(os.path.join(index_dir, "stats.json"), stats)


def _scan_docmeta(
    index_dir: str, uuids: list[str], collect_missing: bool = False
) -> tuple[pa.Table, np.ndarray]:
    """Batched docmeta scan: (rows whose doc_uuid is in ``uuids``,
    doc_ids of live rows NOT in ``uuids`` when requested). Membership
    is one hash-set probe per row (``pc.is_in``) over column-pruned
    64k-row batches — never a corpus-sized filter-expression literal,
    never more than one batch of docmeta in driver memory at a time
    beyond the (incoming-sized) matches."""
    import pyarrow.dataset as pads

    dm_dir = os.path.join(index_dir, "docmeta")
    vs = pa.array(sorted(set(uuids)), pa.string())
    ds = pads.dataset(dm_dir, format="parquet")
    matched, missing = [], []
    scanner = ds.scanner(
        columns=["doc_id", "doc_uuid", "content_sha256"],
        batch_size=65536,
    )
    for b in scanner.to_batches():
        t = pa.Table.from_batches([b])
        m = pc.is_in(t["doc_uuid"], value_set=vs)
        matched.append(t.filter(m))
        if collect_missing:
            missing.append(
                t.filter(pc.invert(m))["doc_id"]
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64)
            )
    tbl = (
        pa.concat_tables(matched)
        if matched
        else pa.table({
            "doc_id": pa.array([], pa.uint64()),
            "doc_uuid": pa.array([], pa.string()),
            "content_sha256": pa.array([], pa.string()),
        })
    )
    miss = (
        np.concatenate(missing)
        if missing
        else np.zeros(0, dtype=np.uint64)
    )
    return tbl, miss


def detect_changes(
    index_dir: str, incoming: pa.Table, collect_missing: bool = False
) -> dict:
    """-> {"changed_rows": int[], "new_rows": int[], "old_ids": int[],
    "missing_ids": uint64[], "uuids": list[str], "shas": list[str]} —
    row indices into ``incoming`` that need re-indexing, the engine
    doc_ids their previous versions occupy, and (when requested) live
    engine ids absent from ``incoming`` (i.e. deletions)."""
    from sotohp_ray.functions.hashing import doc_uuid_column, sha256_column
    from sotohp_ray.pipelines.delete import load_tombstones

    uuids = doc_uuid_column(
        incoming["repo"], incoming["path"], incoming["commit"]
    ).to_pylist()
    shas = sha256_column(
        incoming["content"].combine_chunks()
    ).to_pylist()
    dm, miss = _scan_docmeta(index_dir, uuids, collect_missing)
    # a doc synced twice before compaction has BOTH its tombstoned old
    # row and its live row in docmeta — only the live one is current
    tomb = load_tombstones(index_dir)
    if tomb.size:
        ids = dm["doc_id"].to_numpy(zero_copy_only=False)
        dm = dm.filter(
            pa.array(~np.isin(ids.astype(np.uint64), tomb, kind="sort"))
        )
        if miss.size:
            miss = miss[~np.isin(miss, tomb, kind="sort")]
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
        "missing_ids": miss,
        "uuids": uuids,
        "shas": shas,
    }


def _finish_merge(index_dir: str, config: IndexConfig) -> dict:
    """Recompute global stats from 'done' lineage records, persist
    them, and (re)run the bucketed merge unless the merge marker
    already matches the current lineage fingerprint. Idempotent — the
    finishing step of both the append path and crash repair."""
    import hashlib

    from sotohp_ray.pipelines.build_index import (
        _config_fingerprint,
        merge_phase,
    )

    records = [
        r for r in lin.read_records(index_dir)
        if r.get("status") == "done"
    ]
    n_docs = sum(r["doc_count"] for r in records)
    total_tokens = sum(r["token_count"] for r in records)
    stats = _read_stats(index_dir)
    stats["n_docs"] = n_docs
    stats["total_tokens"] = total_tokens
    stats["total_postings"] = sum(r["posting_count"] for r in records)
    stats["avgdl"] = (total_tokens / n_docs) if n_docs else 0.0
    _write_stats(index_dir, stats)
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
        with open(marker) as f:
            m = json.load(f)
        if (
            m.get("config") == _config_fingerprint(config)
            and m.get("lineage") == lineage_fp
        ):
            return stats  # dictionary already reflects this lineage
        os.remove(marker)
    merge_phase(
        index_dir, config, n_docs, stats["avgdl"], lineage_fp
    )
    return stats


def _repair_interrupted(
    index_dir: str, config: IndexConfig, compact: bool
) -> bool:
    """Replay any work an interrupted sync left behind. Returns True
    if something was repaired. Three recoverable states, in order:

    - an increment intent exists but its partition has no 'done'
      lineage record -> re-index it from the persisted increment input
      (atomic overwrites make the replay safe);
    - tombstones are pending and the caller allows compaction -> the
      interrupted run tombstoned old versions but never compacted;
    - the merge marker doesn't match the current lineage fingerprint
      -> partitions were indexed but the dictionary was never rebuilt.
    """
    import hashlib

    from sotohp_ray.pipelines.build_index import (
        PartitionIndexer,
        _config_fingerprint,
        _config_to_kwargs,
    )
    from sotohp_ray.pipelines.delete import compact_index, load_tombstones

    inc_dir = _increments_dir(index_dir)
    done = {
        r["partition_id"]
        for r in lin.read_records(index_dir)
        if r.get("status") == "done"
    }
    reindexed = _finish_consolidation(index_dir, config)
    if os.path.isdir(inc_dir):
        for name in sorted(os.listdir(inc_dir)):
            if not (name.startswith("partition-") and name.endswith(".json")):
                continue
            with open(os.path.join(inc_dir, name)) as f:
                intent = json.load(f)
            pid = int(intent["pid"])
            if pid in done:
                continue
            inc_path = os.path.join(
                inc_dir, f"partition-{pid:05d}.parquet"
            )
            if not os.path.exists(inc_path):
                continue  # intent written, input lost: nothing to replay
            base = int(intent["base"])
            stats = _read_stats(index_dir)
            space = int(stats.get("doc_id_space", stats["n_docs"]))
            if space < base + int(intent["rows"]):
                stats["doc_id_space"] = base + int(intent["rows"])
                _write_stats(index_dir, stats)
            ix = PartitionIndexer(_config_to_kwargs(config), index_dir)
            ix._index_one(pid, inc_path, base)
            reindexed = True

    pending_tombs = load_tombstones(index_dir).size > 0
    records = [
        r for r in lin.read_records(index_dir)
        if r.get("status") == "done"
    ]
    lineage_fp = hashlib.sha256(
        json.dumps(
            sorted(
                (r["partition_id"], r["input_fingerprint"])
                for r in records
            )
        ).encode()
    ).hexdigest()[:16]
    marker = os.path.join(index_dir, "_MERGE_DONE.json")
    stale = True
    if os.path.exists(marker):
        with open(marker) as f:
            m = json.load(f)
        stale = not (
            m.get("config") == _config_fingerprint(config)
            and m.get("lineage") == lineage_fp
        )
    if pending_tombs and compact is True:
        # under compact='auto', pending tombstones are a NORMAL
        # deferred state, not an interrupted run — the policy in the
        # sync body decides when they get applied
        compact_index(index_dir)
        return True
    if reindexed or stale:
        _finish_merge(index_dir, config)
        return True
    return False


AUTO_COMPACT_MAX_INCREMENTS = 8
AUTO_COMPACT_TOMBSTONE_FRAC = 0.10


def _done_increment_intents(index_dir: str) -> list[dict]:
    """Sorted (by pid) increment intents whose partition has a 'done'
    lineage record — the consolidation-eligible backlog."""
    inc_dir = _increments_dir(index_dir)
    if not os.path.isdir(inc_dir):
        return []
    done = {
        r["partition_id"]
        for r in lin.read_records(index_dir)
        if r.get("status") == "done"
    }
    out = []
    for name in sorted(os.listdir(inc_dir)):
        if not (
            name.startswith("partition-") and name.endswith(".json")
        ):
            continue
        with open(os.path.join(inc_dir, name)) as f:
            intent = json.load(f)
        if int(intent["pid"]) in done:
            out.append(intent)
    return sorted(out, key=lambda r: int(r["pid"]))


def _auto_compact_due(index_dir: str) -> bool:
    """The compact='auto' trigger: the increment backlog crossed
    AUTO_COMPACT_MAX_INCREMENTS partitions, or pending tombstones
    crossed AUTO_COMPACT_TOMBSTONE_FRAC of the live corpus. Until the
    trigger fires, syncs pay only the cheap merge — tombstones filter
    results immediately, surviving docs keep pre-compaction scores
    (the standard deferred-delete trade, same as Lucene's deleted
    docs affecting stats until a forced merge)."""
    from sotohp_ray.pipelines.delete import load_tombstones

    if len(_done_increment_intents(index_dir)) >= (
        AUTO_COMPACT_MAX_INCREMENTS
    ):
        return True
    stats = _read_stats(index_dir)
    n_docs = int(stats.get("n_docs", 0))
    tombs = int(load_tombstones(index_dir).size)
    return tombs > 0 and tombs >= AUTO_COMPACT_TOMBSTONE_FRAC * max(
        n_docs, 1
    )


def _remove_partition_artifacts(index_dir: str, pid: int) -> None:
    """Idempotently retire one partition: increment intent first (so
    the generic crash replay can never re-index it), then the
    increment input, lineage record, docmeta and partials dirs."""
    import shutil

    inc_dir = _increments_dir(index_dir)
    for p in (
        os.path.join(inc_dir, f"partition-{pid:05d}.json"),
        os.path.join(inc_dir, f"partition-{pid:05d}.parquet"),
        os.path.join(
            index_dir, "lineage", f"partition-{pid:05d}.json"
        ),
    ):
        try:
            os.remove(p)
        except OSError:
            pass
    for d in (
        os.path.join(index_dir, "docmeta", f"partition-{pid:05d}"),
        os.path.join(index_dir, "partials", f"partition-{pid:05d}"),
    ):
        shutil.rmtree(d, ignore_errors=True)


def _finish_consolidation(index_dir: str, config: IndexConfig) -> bool:
    """Forward-only replay of an increment consolidation whose
    ``consolidate.json`` record is on disk: the consolidated input
    parquet is durable BEFORE the record is written, so repair always
    rolls FORWARD — finish retiring the old increments, index the
    consolidated partition if its lineage record is missing, adjust
    doc_id_space, drop the record. Every step is idempotent."""
    from sotohp_ray.pipelines.build_index import (
        PartitionIndexer,
        _config_to_kwargs,
    )

    cpath = os.path.join(_increments_dir(index_dir), "consolidate.json")
    if not os.path.exists(cpath):
        return False
    with open(cpath) as f:
        c = json.load(f)
    for pid in c["old_pids"]:
        _remove_partition_artifacts(index_dir, int(pid))
    new_pid = int(c["pid"])
    done = {
        r["partition_id"]
        for r in lin.read_records(index_dir)
        if r.get("status") == "done"
    }
    inc_path = os.path.join(
        _increments_dir(index_dir), f"partition-{new_pid:05d}.parquet"
    )
    if new_pid not in done:
        lin.write_json(
            os.path.join(
                _increments_dir(index_dir),
                f"partition-{new_pid:05d}.json",
            ),
            {"pid": new_pid, "base": c["base"], "rows": c["rows"]},
        )
        ix = PartitionIndexer(_config_to_kwargs(config), index_dir)
        ix._index_one(new_pid, inc_path, int(c["base"]))
    stats = _read_stats(index_dir)
    stats["doc_id_space"] = int(c["space"])
    _write_stats(index_dir, stats)
    os.remove(cpath)
    return True


def _consolidate_increments(
    index_dir: str, config: IndexConfig
) -> bool:
    """Fold the whole increment backlog into ONE partition (the
    auto-compaction policy's partition-count bound, VERDICT-r4 ask
    #7). Preconditions: >= 2 done increments, contiguous id ranges
    (increments stack at the top of the id space by construction) and
    NO pending tombstones — the caller runs ``compact_index`` first,
    which also clears the backlog's dead rows from docmeta, so "live
    rows of each increment" is exactly its docmeta partition.

    Engine ids of the consolidated docs are REASSIGNED (dense from
    the first increment's base, the fresh-build rule over the
    surviving rows); result-level equality is unaffected because
    every pipeline maps engine ids to original ids through docmeta
    before ranking — the same sparse-vs-dense freedom compaction
    already established. Crash safety is the staged-record discipline
    of ``_finish_consolidation``: the consolidated input parquet is
    durable before the record, the record before any destruction."""
    from sotohp_ray.functions.hashing import doc_uuid_column
    from sotohp_ray.pipelines.delete import load_tombstones

    if load_tombstones(index_dir).size:
        return False  # caller must compact first
    intents = _done_increment_intents(index_dir)
    if len(intents) < 2:
        return False
    for a, b in zip(intents, intents[1:]):
        if int(a["base"]) + int(a["rows"]) != int(b["base"]):
            return False  # non-contiguous: never consolidate a gap
    stats = _read_stats(index_dir)
    space = int(stats.get("doc_id_space", stats["n_docs"]))
    last = intents[-1]
    if int(last["base"]) + int(last["rows"]) != space:
        return False  # backlog is not the top of the id space
    inc_dir = _increments_dir(index_dir)
    parts = []
    for intent in intents:
        pid = int(intent["pid"])
        t = pq.read_table(
            os.path.join(inc_dir, f"partition-{pid:05d}.parquet")
        )
        dm_path = os.path.join(
            index_dir, "docmeta", f"partition-{pid:05d}", "data.parquet"
        )
        live = set(
            pq.read_table(dm_path, columns=["doc_uuid"])
            ["doc_uuid"].to_pylist()
        ) if os.path.exists(dm_path) else set()
        uu = doc_uuid_column(t["repo"], t["path"], t["commit"])
        keep = pc.is_in(
            uu, value_set=pa.array(sorted(live), type=pa.string())
        )
        parts.append(t.filter(keep))
    cat = pa.concat_tables(parts)
    base = int(intents[0]["base"])
    new_pid = (max(_existing_partition_ids(index_dir), default=-1)) + 1
    inc_path = os.path.join(
        inc_dir, f"partition-{new_pid:05d}.parquet"
    )
    # durable order: consolidated input FIRST, then the record (the
    # point of no return — repair rolls forward from here), then the
    # retire+index replay shared with crash recovery
    lin.atomic_write_table(cat, inc_path)
    lin.write_json(
        os.path.join(inc_dir, "consolidate.json"),
        {
            "old_pids": [int(i["pid"]) for i in intents],
            "pid": new_pid,
            "base": base,
            "rows": cat.num_rows,
            "space": base + cat.num_rows,
        },
    )
    _finish_consolidation(index_dir, config)
    return True


def sync_changed_docs(
    index_dir: str,
    incoming: pa.Table,
    compact: bool | str = True,
    remove_missing: bool = False,
) -> dict:
    """Re-index exactly the incoming rows whose content changed (plus
    brand-new rows); with ``remove_missing=True``, also tombstone live
    docs absent from ``incoming`` (full-corpus resync semantics — only
    pass it when ``incoming`` IS the complete current corpus).
    Idempotent: a second sync with the same rows is a no-op; a retry
    after a crash repairs the interrupted run first. Returns counts +
    the new stats.

    ``compact`` policies: ``True`` (default) compacts whenever this
    sync tombstoned anything — scores always equal a fresh build;
    ``False`` defers forever (caller owns compaction); ``"auto"``
    defers until the increment backlog reaches
    AUTO_COMPACT_MAX_INCREMENTS partitions or pending tombstones reach
    AUTO_COMPACT_TOMBSTONE_FRAC of the corpus, then runs
    ``compact_index`` AND folds the whole increment backlog into ONE
    partition (``_consolidate_increments``) — N repeated syncs keep
    the serving-side partition count and tombstone load BOUNDED
    instead of growing per sync, with the crash-safety contract
    preserved (staged ``consolidate.json`` record, forward-only
    replay)."""
    from sotohp_ray.pipelines.build_index import (
        PartitionIndexer,
        _config_to_kwargs,
    )
    from sotohp_ray.pipelines.delete import compact_index, delete_docs

    with open(os.path.join(index_dir, "config.json")) as f:
        config = IndexConfig.from_json(f.read())
    _repair_interrupted(index_dir, config, compact)
    det = detect_changes(
        index_dir, incoming, collect_missing=remove_missing
    )
    rows = det["changed_rows"] + det["new_rows"]
    missing = det["missing_ids"] if remove_missing else np.zeros(
        0, dtype=np.uint64
    )
    if not rows and not missing.size:
        return {
            "changed": 0, "new": 0, "tombstoned": 0, "removed": 0,
            "stats": _read_stats(index_dir),
        }

    dead = list(det["old_ids"]) + [int(i) for i in missing]
    if dead:
        delete_docs(index_dir, engine_doc_ids=dead)

    pid = None
    if rows:
        # one increment partition, ids appended at the top of the
        # space. Durable order matters: (1) increment input parquet,
        # (2) intent json {pid, base, rows} — the replay record,
        # (3) doc_id_space bump, (4) index. A crash between any two
        # steps is repaired by _repair_interrupted on the next call;
        # the space bump precedes indexing so docmeta can never hold
        # ids >= the recorded space (Searcher arrays size from it).
        stats = _read_stats(index_dir)
        base = int(stats.get("doc_id_space", stats["n_docs"]))
        pid = (max(_existing_partition_ids(index_dir), default=-1)) + 1
        inc = incoming.take(pa.array(sorted(rows), pa.int64()))
        inc_path = os.path.join(
            _increments_dir(index_dir), f"partition-{pid:05d}.parquet"
        )
        lin.atomic_write_table(inc, inc_path)
        lin.write_json(
            os.path.join(
                _increments_dir(index_dir), f"partition-{pid:05d}.json"
            ),
            {"pid": pid, "base": base, "rows": inc.num_rows},
        )
        stats["doc_id_space"] = base + inc.num_rows
        _write_stats(index_dir, stats)
        ix = PartitionIndexer(_config_to_kwargs(config), index_dir)
        ix._index_one(pid, inc_path, base)

    if compact == "auto":
        if _auto_compact_due(index_dir):
            from sotohp_ray.pipelines.delete import (
                compact_index as _ci,
            )

            _ci(index_dir)  # applies + clears tombstones (and merges)
            _consolidate_increments(index_dir, config)
        # always finish with the stats+merge recompute: it is a no-op
        # when the marker matches, and the consolidation path needs it
        new_stats = _finish_merge(index_dir, config)
    elif compact is True and dead:
        new_stats = compact_index(index_dir)
    else:
        # pure additions (or caller defers compaction): recompute the
        # global stats from lineage and rerun the merge so the new
        # partition's postings are queryable with exact df/N/avgdl
        new_stats = _finish_merge(index_dir, config)
    out = {
        "changed": len(det["changed_rows"]),
        "new": len(det["new_rows"]),
        "tombstoned": len(det["old_ids"]),
        "removed": int(missing.size),
        "stats": new_stats,
    }
    if pid is not None:
        out["increment_partition"] = pid
    return out
