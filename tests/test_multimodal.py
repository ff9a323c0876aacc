"""Multimodal binary-column stages: codec roundtrips, fan-out shapes,
real-format stub seam, and the integer-arithmetic oracle contract.

Reference test analog: imaging round-trip property specs
(`modules/imaging/src/test/scala/.../BasicImagingSpec.scala:34-171` —
resize ratio preservation, dimension behavior) and miniature fan-out
(`processor/MiniaturizeProcessor.scala:16-84`).
"""

import numpy as np
import pytest

from sotohp_ray.functions import media_codec as mc

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- codec


def test_image_roundtrip():
    img = np.arange(20 * 30 * 3, dtype=np.uint8).reshape(30, 20, 3)
    assert np.array_equal(mc.decode_image(mc.encode_image(img)), img)


def test_audio_roundtrip():
    s = (np.arange(777) * 999 % 65536 - 32768).astype(np.int16)
    sr, back = mc.decode_audio(mc.encode_audio(44100, s))
    assert sr == 44100
    assert np.array_equal(back, s)


def test_video_roundtrip():
    fr = np.arange(5 * 12 * 16 * 3, dtype=np.uint8).reshape(5, 12, 16, 3)
    assert np.array_equal(mc.decode_video(mc.encode_video(fr)), fr)


def test_real_format_stub_seam():
    with pytest.raises(NotImplementedError, match="jpeg"):
        mc.decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)
    with pytest.raises(NotImplementedError, match="png"):
        mc.decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)
    with pytest.raises(ValueError):
        mc.decode_image(b"XXXX" + b"\x00" * 32)


def test_synth_matches_arithmetic():
    for doc_id in (0, 1, 2, 17, 1000, 31337):
        p = mc.synth_payload(doc_id)
        kind = mc.media_kind_of(doc_id)
        if kind == "image":
            w, h = mc.image_dims_of(doc_id)
            assert len(p) == 16 + w * h * 3
            assert mc.decode_image(p).shape == (h, w, 3)
        elif kind == "audio":
            sr, n = mc.audio_shape_of(doc_id)
            assert len(p) == 16 + 2 * n
            got_sr, samples = mc.decode_audio(p)
            assert (got_sr, len(samples)) == (sr, n)
        else:
            nf = mc.video_frames_of(doc_id)
            assert len(p) == 20 + nf * 16 * 12 * 3
            assert mc.decode_video(p).shape == (nf, 12, 16, 3)


def test_thumbnail_dims_ratio_preserving():
    # square box fit, floor division, never 0 (BasicImaging ratio rule)
    assert mc.thumbnail_dims(64, 32, 32) == (32, 16)
    assert mc.thumbnail_dims(32, 64, 32) == (16, 32)
    assert mc.thumbnail_dims(1000, 1, 32) == (32, 1)
    w, h = mc.thumbnail_dims(40, 30, 32)
    assert max(w, h) == 32 and w * 30 // 40 == h


def test_resize_nearest_shape_and_determinism():
    img = (np.arange(24 * 36 * 3, dtype=np.int64) * 7 % 256).astype(
        np.uint8).reshape(24, 36, 3)
    out = mc.resize_nearest(img, 9, 6)
    assert out.shape == (6, 9, 3)
    assert np.array_equal(out, mc.resize_nearest(img, 9, 6))


# ------------------------------------------------------------ pipelines


def test_media_inventory_vs_duckdb(ray_session):
    import duckdb

    from sotohp_ray.pipelines.multimodal import (
        media_inventory, media_inventory_sql)

    got = media_inventory(SF).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    exp = con.execute(media_inventory_sql()).df().sort_values(
        "doc_id").reset_index(drop=True)
    assert len(got) == len(exp)
    for c in ("media_kind", "payload_bytes", "width", "height",
              "sample_rate", "n_samples", "n_frames"):
        assert (got[c].values == exp[c].values).all(), c


def test_media_thumbnails_fanout(ray_session):
    from sotohp_ray.pipelines.multimodal import media_thumbnails

    df = media_thumbnails(SF).to_pandas()
    n_images = len(df["doc_id"].unique())
    assert len(df) == 2 * n_images  # one row per size
    assert set(df["size"]) == {32, 64}
    assert (df[["width", "height"]].max(axis=1) <= 64).all()
    assert (df["thumb_bytes"] == 16 + 3 * df["width"] * df["height"]).all()


def test_media_frame_sample(ray_session):
    from sotohp_ray.pipelines.multimodal import media_frame_sample

    df = media_frame_sample(SF).to_pandas()
    assert (df["frame_idx"] % 4 == 0).all()
    assert (df["frame_bytes"] == 16 + 16 * 12 * 3).all()
    # every video doc (doc_id % 3 == 2) has >= 1 sampled frame
    assert (df["doc_id"] % 3 == 2).all()
    assert df.groupby("doc_id").size().min() >= 1


def test_media_features_deterministic(ray_session):
    from sotohp_ray.pipelines.multimodal import media_features

    df = media_features(SF).to_pandas().set_index("doc_id")
    # golden: doc 0 is an image with pixels (0 + i*31) % 256
    w, h = mc.image_dims_of(0)
    px = (np.arange(w * h * 3, dtype=np.int64) * 31 % 256).astype(float)
    f = df.loc[0, "feature"]
    assert f[0] == round(float(px.mean()), 4)
    assert f[2] == float(px.min()) and f[3] == float(px.max())
    assert set(df["media_kind"]) == {"image", "audio", "video"}
