"""Resumable cleaned-corpus export sink (pipelines/export.py)."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def dup_sf(tmp_path):
    """12-doc table with two exact-dup clusters ({1,4,9} and {2,7})."""
    texts = [f"unique doc number {i} alpha beta gamma" for i in range(12)]
    texts[4] = texts[1]
    texts[9] = texts[1]
    texts[7] = texts[2]
    t = pa.table({
        "doc_id": pa.array(list(range(12)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 12),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def _exported_ids(out: str):
    ids = []
    for p in sorted(glob.glob(os.path.join(out, "shard-*.parquet"))):
        ids.extend(pq.read_table(p, columns=["doc_id"])["doc_id"].to_pylist())
    return sorted(ids)


def test_export_matches_cleaned_corpus_and_resumes(
    ray_session, dup_sf, tmp_path
):
    from sotohp_ray.pipelines.export import export_cleaned_corpus
    from sotohp_ray.pipelines.textops import corpus_dedup_exact

    out = str(tmp_path / "out")
    manifest = export_cleaned_corpus(
        dup_sf, out, mode="exact", shard_width=5
    )
    # kept rows == the cleaned-corpus query's doc ids (keepers only)
    expect = sorted(
        corpus_dedup_exact(dup_sf).to_pandas()["doc_id"].tolist()
    )
    assert _exported_ids(out) == expect == sorted(
        set(range(12)) - {4, 9, 7}
    )
    # full columns survive; shards are bounded ranges
    first = pq.read_table(os.path.join(out, "shard-00000.parquet"))
    assert set(first.column_names) == {"doc_id", "text", "lang"}
    assert manifest.num_rows == 3  # ids 0..11 at width 5 -> 3 shards
    assert int(pa.compute.sum(manifest["n_rows"]).as_py()) == len(expect)

    # completed export short-circuits on the manifest (no rewrites)
    mtimes = {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(os.path.join(out, "shard-*.parquet"))
    }
    again = export_cleaned_corpus(dup_sf, out, mode="exact", shard_width=5)
    assert again.to_pydict() == manifest.to_pydict()
    for p, m in mtimes.items():
        assert os.stat(p).st_mtime_ns == m, p

    # crash resume: lose the manifest and one shard -> only that shard
    # is rewritten, the others are untouched
    os.remove(os.path.join(out, "_EXPORT_DONE.json"))
    victim = os.path.join(out, "shard-00001.parquet")
    os.remove(victim)
    export_cleaned_corpus(dup_sf, out, mode="exact", shard_width=5)
    assert _exported_ids(out) == expect
    for p, m in mtimes.items():
        if p != victim:
            assert os.stat(p).st_mtime_ns == m, p

    # a directory holding a different export is refused
    with pytest.raises(ValueError, match="refusing"):
        export_cleaned_corpus(dup_sf, out, mode="near", shard_width=5)


def test_export_near_mode(ray_session, dup_sf, tmp_path):
    """near mode drives the near-dup mask path end-to-end (exact dups
    are near dups at any threshold, so the same keepers survive)."""
    from sotohp_ray.pipelines.export import export_cleaned_corpus
    from sotohp_ray.pipelines.textops import corpus_dedup_near

    out = str(tmp_path / "out_near")
    export_cleaned_corpus(dup_sf, out, mode="near", shard_width=100)
    expect = sorted(
        corpus_dedup_near(dup_sf).to_pandas()["doc_id"].tolist()
    )
    assert _exported_ids(out) == expect
