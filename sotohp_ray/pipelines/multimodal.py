"""Multimodal (binary-column) pipeline stages.

Reference analogs: per-record binary transforms `BasicImaging.scala:
23-70` (ratio-preserving reshape/resize), per-size miniature fan-out
`MiniaturizeProcessor.scala:16-84` (T5: one record -> Map[size ->
artifact]), canonical normalization `NormalizeProcessor.scala:16-66`
(T6), stateful feature extraction `FaceFeaturesProcessor.scala:18-127`
(T2: model in init, predict per record), frame/metadata extraction
`OriginalBuilder.scala:275-315` (M1: parse binary -> typed columns,
malformed -> nulls).

Design for 100 TB: media travel as opaque ``large_binary`` columns with
typed metadata columns beside them; every stage is a ``map_batches``
TASK pool whose stage object is built once per worker process and
cached (``_per_worker`` — the MinHashStage/PartitionIndexer
discipline): Ray reuses worker processes across tasks, so codec/model
state amortizes exactly like an actor's ``__init__`` but without
paying a fresh actor-pool spin-up per short pipeline (which was a 2x
wall regression on these stages in round 2). A stage that needs
pinned resources (GPU predictor) would pass ``concurrency=`` to flip
back to a dedicated actor pool — the stage objects themselves are
already shaped for it (state in ``__init__``, work in ``__call__``,
the DJL predictor pattern SURVEY.md section 2.3). ``batch_size`` is
kept SMALL so a batch of decoded frames fits the worker heap; outputs
are re-encoded binary + scalar metadata, never Python objects. Only
the byte-level codec is synthetic here (real codec libs are absent —
see functions/media_codec.py); the schemas, fan-out shapes, stage
signatures and verification are real, and because payload shapes are
pure integer functions of doc_id the SQL oracles verify the decoded
outputs end-to-end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sotohp_ray.functions import media_codec as mc

_WORKER_STAGES: dict = {}


def _per_worker(cls, **kw):
    """Task-pool adapter with once-per-worker stage state: the first
    task a Ray worker process runs builds ``cls(**kw)``; every later
    task on that worker reuses it. Same amortization as an actor-pool
    ``__init__``, none of the per-run actor spin-up."""
    key = (cls.__qualname__, tuple(sorted(kw.items())))

    def fn(batch: pa.Table) -> pa.Table:
        inst = _WORKER_STAGES.get(key)
        if inst is None:
            inst = _WORKER_STAGES[key] = cls(**kw)
        return inst(batch)

    return fn

THUMB_SIZES = (32, 64)
FRAME_STRIDE = 4

# Per-batch row budget for stages holding decoded payloads. At real
# image sizes (~10 MB decoded) this would drop to O(8-32); the knob is
# the contract, the value is sized to the synthetic payloads.
MEDIA_BATCH = 256


def _ids(batch: pa.Table) -> np.ndarray:
    return batch["doc_id"].to_numpy(zero_copy_only=False)


def _payloads(batch: pa.Table) -> list:
    col = batch["payload"]
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return col.to_pylist()


def _synth_batch(batch: pa.Table) -> pa.Table:
    """Attach a deterministic binary payload + kind to each doc_id
    (the test/bench stand-in for reading real media bytes; payload
    shape rules in media_codec.py). Stateless -> task pool, so it
    never pins CPUs away from the downstream actor stages."""
    ids = _ids(batch)
    return pa.table({
        "doc_id": batch["doc_id"],
        "media_kind": pa.array(
            [mc.media_kind_of(int(i)) for i in ids], pa.string()),
        "payload": pa.array(
            [mc.synth_payload(int(i)) for i in ids], pa.large_binary()),
    })


def media_table(sf_dir: str):
    """documents -> (doc_id, media_kind, payload:large_binary). Only
    doc_id leaves the Parquet read (column pruning)."""
    import ray.data

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(_synth_batch, batch_format="pyarrow",
                  batch_size=MEDIA_BATCH)


class _Inventory:
    """Decode-header stage (M1 analog): binary -> typed metadata
    columns. Absent facets are 0, not null, so engines agree bytewise."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = _ids(batch)
        payloads = _payloads(batch)
        n = len(ids)
        out = {k: np.zeros(n, np.int64) for k in (
            "payload_bytes", "width", "height", "sample_rate",
            "n_samples", "n_frames")}
        kinds = []
        for i, p in enumerate(payloads):
            out["payload_bytes"][i] = len(p)
            magic = p[:4]
            if magic == mc.MAGIC_IMAGE:
                kinds.append("image")
                img = mc.decode_image(p)
                out["height"][i], out["width"][i] = img.shape[:2]
            elif magic == mc.MAGIC_AUDIO:
                kinds.append("audio")
                sr, samples = mc.decode_audio(p)
                out["sample_rate"][i] = sr
                out["n_samples"][i] = len(samples)
            else:
                kinds.append("video")
                frames = mc.decode_video(p)
                out["n_frames"][i] = frames.shape[0]
        cols = {"doc_id": pa.array(ids, pa.int64()),
                "media_kind": pa.array(kinds, pa.string())}
        cols.update({k: pa.array(v) for k, v in out.items()})
        return pa.table(cols)


def media_inventory(sf_dir: str):
    """(doc_id, media_kind, payload_bytes, width, height, sample_rate,
    n_samples, n_frames) — decoded from the actual container bytes."""
    return media_table(sf_dir).map_batches(
        _per_worker(_Inventory), batch_format="pyarrow",
        batch_size=MEDIA_BATCH)


def media_inventory_sql() -> str:
    """DuckDB oracle: recompute the same metadata by integer arithmetic
    on doc_id (the payload-shape rules in media_codec.py)."""
    return """
        SELECT doc_id,
          CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
               ELSE 'video' END AS media_kind,
          CASE doc_id % 3
            WHEN 0 THEN 16 + (16 + (doc_id*7919)%49)
                          * (16 + (doc_id*104729)%33) * 3
            WHEN 1 THEN 16 + 2*(512 + (doc_id*13)%1024)
            ELSE 20 + (4 + doc_id%13) * 16*12*3
          END AS payload_bytes,
          CASE WHEN doc_id%3 = 0 THEN 16 + (doc_id*7919)%49 ELSE 0 END
            AS width,
          CASE WHEN doc_id%3 = 0 THEN 16 + (doc_id*104729)%33 ELSE 0 END
            AS height,
          CASE WHEN doc_id%3 = 1 THEN 8000 + 1000*(doc_id%5) ELSE 0 END
            AS sample_rate,
          CASE WHEN doc_id%3 = 1 THEN 512 + (doc_id*13)%1024 ELSE 0 END
            AS n_samples,
          CASE WHEN doc_id%3 = 2 THEN 4 + doc_id%13 ELSE 0 END
            AS n_frames
        FROM documents
    """


class _Thumbnailer:
    """Miniature fan-out (T5): one image row -> one row per size;
    decode once, resize (ratio-preserving floor-div box fit,
    BasicImaging.scala:43-55 rule), re-encode."""

    def __init__(self, sizes=THUMB_SIZES):
        self.sizes = tuple(sizes)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = _ids(batch)
        payloads = _payloads(batch)
        o_id, o_sz, o_w, o_h, o_b = [], [], [], [], []
        for i, p in enumerate(payloads):
            if p[:4] != mc.MAGIC_IMAGE:
                continue
            img = mc.decode_image(p)
            h, w = img.shape[:2]
            for size in self.sizes:
                tw, th = mc.thumbnail_dims(w, h, size)
                enc = mc.encode_image(mc.resize_nearest(img, tw, th))
                o_id.append(int(ids[i]))
                o_sz.append(size)
                o_w.append(tw)
                o_h.append(th)
                o_b.append(len(enc))
        return pa.table({
            "doc_id": pa.array(o_id, pa.int64()),
            "size": pa.array(o_sz, pa.int64()),
            "width": pa.array(o_w, pa.int64()),
            "height": pa.array(o_h, pa.int64()),
            "thumb_bytes": pa.array(o_b, pa.int64()),
        })


def media_thumbnails(sf_dir: str, sizes=THUMB_SIZES):
    """(doc_id, size, width, height, thumb_bytes) per image per size."""
    return media_table(sf_dir).map_batches(
        _per_worker(_Thumbnailer, sizes=tuple(sizes)),
        batch_format="pyarrow", batch_size=MEDIA_BATCH)


def media_thumbnails_sql(sizes=THUMB_SIZES) -> str:
    lst = ", ".join(str(s) for s in sizes)
    return f"""
        WITH img AS (
          SELECT doc_id, 16 + (doc_id*7919)%49 AS w,
                 16 + (doc_id*104729)%33 AS h
          FROM documents WHERE doc_id % 3 = 0
        ), sz AS (SELECT unnest([{lst}]) AS size)
        SELECT doc_id, size,
               greatest(1, (w*size)//greatest(w,h)) AS width,
               greatest(1, (h*size)//greatest(w,h)) AS height,
               16 + 3 * greatest(1, (w*size)//greatest(w,h))
                      * greatest(1, (h*size)//greatest(w,h))
                 AS thumb_bytes
        FROM img CROSS JOIN sz
    """


ROTATE_OPS = ("rot90", "rot180", "mirror_h", "mirror_v")


class _Rotator:
    """Rotate / mirror fan-out (M14, BasicImaging.scala:43-92 rotate +
    :160-180 mirror): one image row -> one row per op. Decode once,
    permute pixels, re-encode; the emitted corner pixel proves the
    permutation happened (the SQL oracle recomputes it from doc_id)."""

    def __init__(self, ops=ROTATE_OPS):
        self.ops = tuple(ops)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = _ids(batch)
        payloads = _payloads(batch)
        o_id, o_op, o_w, o_h, o_b, o_px = [], [], [], [], [], []
        for i, p in enumerate(payloads):
            if p[:4] != mc.MAGIC_IMAGE:
                continue
            img = mc.decode_image(p)
            for op in self.ops:
                if op == "rot90":
                    out = mc.rotate(img, 90)
                elif op == "rot180":
                    out = mc.rotate(img, 180)
                elif op == "mirror_h":
                    out = mc.mirror(img, horizontal=True)
                else:
                    out = mc.mirror(img, horizontal=False)
                enc = mc.encode_image(np.ascontiguousarray(out))
                o_id.append(int(ids[i]))
                o_op.append(op)
                o_h.append(out.shape[0])
                o_w.append(out.shape[1])
                o_b.append(len(enc))
                o_px.append(int(out[0, 0, 0]))
        return pa.table({
            "doc_id": pa.array(o_id, pa.int64()),
            "op": pa.array(o_op, pa.string()),
            "width": pa.array(o_w, pa.int64()),
            "height": pa.array(o_h, pa.int64()),
            "out_bytes": pa.array(o_b, pa.int64()),
            "corner_px": pa.array(o_px, pa.int64()),
        })


def media_rotated(sf_dir: str, ops=ROTATE_OPS):
    """(doc_id, op, width, height, out_bytes, corner_px) per image per
    rotate/mirror op — corner_px is the top-left red value AFTER the
    permutation, recomputed arithmetically by the oracle."""
    return media_table(sf_dir).map_batches(
        _per_worker(_Rotator, ops=tuple(ops)),
        batch_format="pyarrow", batch_size=MEDIA_BATCH)


def media_rotated_sql(ops=ROTATE_OPS) -> str:
    """Pixel (y, x, 0) of a synth image = (doc_id + (y*w + x)*3*31) %
    256 (media_codec.synth_payload). Each op's new top-left maps to a
    known source pixel: rot90cw->(h-1, 0), rot180->(h-1, w-1),
    mirror_h->(0, w-1), mirror_v->(h-1, 0)."""
    lst = ", ".join(f"'{o}'" for o in ops)
    return f"""
        WITH img AS (
          SELECT doc_id, 16 + (doc_id*7919)%49 AS w,
                 16 + (doc_id*104729)%33 AS h
          FROM documents WHERE doc_id % 3 = 0
        ), op AS (SELECT unnest([{lst}]) AS op)
        SELECT doc_id, op,
               CASE WHEN op = 'rot90' THEN h ELSE w END AS width,
               CASE WHEN op = 'rot90' THEN w ELSE h END AS height,
               16 + 3*w*h AS out_bytes,
               (doc_id + 31 * 3 * (
                 CASE op
                   WHEN 'rot90'    THEN (h-1)*w
                   WHEN 'rot180'   THEN (h-1)*w + (w-1)
                   WHEN 'mirror_h' THEN (w-1)
                   ELSE                 (h-1)*w
                 END)) % 256 AS corner_px
        FROM img CROSS JOIN op
    """


class _FrameSampler:
    """Video frame sampling: every ``stride``-th frame re-encoded as a
    standalone image row (the video analog of miniature fan-out)."""

    def __init__(self, stride=FRAME_STRIDE):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = _ids(batch)
        payloads = _payloads(batch)
        o_id, o_fi, o_b = [], [], []
        for i, p in enumerate(payloads):
            if p[:4] != mc.MAGIC_VIDEO:
                continue
            frames = mc.decode_video(p)
            for fi in range(0, frames.shape[0], self.stride):
                enc = mc.encode_image(frames[fi])
                o_id.append(int(ids[i]))
                o_fi.append(fi)
                o_b.append(len(enc))
        return pa.table({
            "doc_id": pa.array(o_id, pa.int64()),
            "frame_idx": pa.array(o_fi, pa.int64()),
            "frame_bytes": pa.array(o_b, pa.int64()),
        })


def media_frame_sample(sf_dir: str, stride: int = FRAME_STRIDE):
    """(doc_id, frame_idx, frame_bytes) for every sampled frame."""
    return media_table(sf_dir).map_batches(
        _per_worker(_FrameSampler, stride=stride),
        batch_format="pyarrow", batch_size=MEDIA_BATCH)


def media_frame_sample_sql(stride: int = FRAME_STRIDE) -> str:
    fw, fh = mc.VIDEO_FRAME_W, mc.VIDEO_FRAME_H
    return f"""
        SELECT doc_id,
               unnest(range(0, 4 + doc_id%13, {stride})) AS frame_idx,
               {16 + fw * fh * 3} AS frame_bytes
        FROM documents WHERE doc_id % 3 = 2
    """


class _FeatureExtractor:
    """Feature extraction (T2 analog): deterministic per-payload
    descriptor vector. The interface is the real contract — decoded
    array in, fixed-width float vector out, batched; a learned model
    would replace the body, loaded once per actor in __init__."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = _ids(batch)
        payloads = _payloads(batch)
        kinds, feats = [], []
        for p in payloads:
            magic = p[:4]
            if magic == mc.MAGIC_IMAGE:
                kinds.append("image")
                x = mc.decode_image(p).astype(np.float64)
            elif magic == mc.MAGIC_AUDIO:
                kinds.append("audio")
                x = mc.decode_audio(p)[1].astype(np.float64)
            else:
                kinds.append("video")
                x = mc.decode_video(p).astype(np.float64)
            feats.append([
                round(float(x.mean()), 4),
                round(float(x.std()), 4),
                float(x.min()),
                float(x.max()),
            ])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "media_kind": pa.array(kinds, pa.string()),
            "feature": pa.array(feats, pa.list_(pa.float64())),
        })


def media_features(sf_dir: str):
    """(doc_id, media_kind, feature:list<double>[4]) — decoded-content
    descriptor per media row (rows-only check: no SQL for pixel
    stats)."""
    return media_table(sf_dir).map_batches(
        _per_worker(_FeatureExtractor), batch_format="pyarrow",
        batch_size=MEDIA_BATCH)
