"""Deterministic binary media containers for the multimodal pipeline.

The reference processes opaque binary media per record — load/resize/
mirror in `media/imaging/BasicImaging.scala:23-70` (ratio-preserving
reshape), miniature fan-out per configured size in
`processor/MiniaturizeProcessor.scala:16-84`, canonical normalized
artifact in `processor/NormalizeProcessor.scala:16-66`, and 512-d
feature extraction in `processor/FaceFeaturesProcessor.scala:18-127`.
Real image/audio codec libraries are NOT available in this environment,
so the codec layer is split:

- three tiny self-describing containers (SIMG / SAUD / SVID) with
  deterministic integer-arithmetic payloads, so the Ray-side plumbing
  (binary columns, actor pools, fan-out, schemas) is REAL and the
  outputs are verifiable by a pure-SQL oracle;
- recognisable real-world magics (JPEG/PNG/RIFF/MP4) raise
  ``NotImplementedError`` at the exact seam where PIL/libvips/ffmpeg
  would plug in.

All payload shapes are pure functions of ``doc_id`` (documented next to
each function) so DuckDB can recompute byte counts and dimensions
without ever seeing the bytes.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC_IMAGE = b"SIMG"
MAGIC_AUDIO = b"SAUD"
MAGIC_VIDEO = b"SVID"

# real-world magics we recognise but cannot decode in this sandbox
_REAL_MAGICS = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"RIFF": "riff/wav",
    b"\x00\x00\x00\x18ftyp": "mp4",
    b"\x00\x00\x00 ftyp": "mp4",
}

VIDEO_FRAME_W = 16
VIDEO_FRAME_H = 12


# ------------------------------------------------------------ synthesis
# Pure integer arithmetic on doc_id — mirrored verbatim in the SQL
# oracles (pipelines/multimodal.py).


def media_kind_of(doc_id: int) -> str:
    return ("image", "audio", "video")[doc_id % 3]


def image_dims_of(doc_id: int) -> tuple[int, int]:
    return 16 + (doc_id * 7919) % 49, 16 + (doc_id * 104729) % 33


def audio_shape_of(doc_id: int) -> tuple[int, int]:
    """(sample_rate, n_samples)."""
    return 8000 + 1000 * (doc_id % 5), 512 + (doc_id * 13) % 1024


def video_frames_of(doc_id: int) -> int:
    return 4 + doc_id % 13


def synth_payload(doc_id: int) -> bytes:
    """Deterministic container for one doc_id (no RNG: resumable)."""
    kind = media_kind_of(doc_id)
    if kind == "image":
        w, h = image_dims_of(doc_id)
        px = ((doc_id + np.arange(w * h * 3, dtype=np.int64) * 31) % 256
              ).astype(np.uint8)
        return encode_image(px.reshape(h, w, 3))
    if kind == "audio":
        sr, n = audio_shape_of(doc_id)
        samples = (((doc_id * 7 + np.arange(n, dtype=np.int64) * 131) %
                    65536) - 32768).astype(np.int16)
        return encode_audio(sr, samples)
    n_frames = video_frames_of(doc_id)
    w, h = VIDEO_FRAME_W, VIDEO_FRAME_H
    px = ((doc_id * 3 + np.arange(n_frames * w * h * 3, dtype=np.int64) * 17)
          % 256).astype(np.uint8)
    return encode_video(px.reshape(n_frames, h, w, 3))


# ---------------------------------------------------------------- codec


def encode_image(arr: np.ndarray) -> bytes:
    """arr: (h, w, 3) uint8 -> 16-byte header + raw pixels."""
    h, w, c = arr.shape
    return MAGIC_IMAGE + struct.pack("<III", w, h, c) + arr.tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    _check_magic(payload, MAGIC_IMAGE)
    w, h, c = struct.unpack_from("<III", payload, 4)
    return np.frombuffer(payload, np.uint8, w * h * c, 16).reshape(h, w, c)


def encode_audio(sample_rate: int, samples: np.ndarray) -> bytes:
    """samples: (n,) int16 -> 16-byte header + LE int16 PCM."""
    return (MAGIC_AUDIO + struct.pack("<III", sample_rate, len(samples), 0)
            + samples.astype("<i2").tobytes())


def decode_audio(payload: bytes) -> tuple[int, np.ndarray]:
    _check_magic(payload, MAGIC_AUDIO)
    sr, n, _ = struct.unpack_from("<III", payload, 4)
    return sr, np.frombuffer(payload, "<i2", n, 16)


def encode_video(frames: np.ndarray) -> bytes:
    """frames: (n, h, w, 3) uint8 -> 20-byte header + raw frames."""
    n, h, w, c = frames.shape
    return (MAGIC_VIDEO + struct.pack("<IIII", n, w, h, c)
            + frames.tobytes())


def decode_video(payload: bytes) -> np.ndarray:
    _check_magic(payload, MAGIC_VIDEO)
    n, w, h, c = struct.unpack_from("<IIII", payload, 4)
    return np.frombuffer(payload, np.uint8, n * w * h * c, 20).reshape(
        n, h, w, c)


def _check_magic(payload: bytes, expected: bytes) -> None:
    if payload[:4] == expected:
        return
    for magic, name in _REAL_MAGICS.items():
        if payload.startswith(magic):
            raise NotImplementedError(
                f"detected real-world {name} payload: codec libraries "
                "(PIL/libvips/ffmpeg) are not available in this "
                "environment — plug the decoder in here"
            )
    raise ValueError(f"unknown media container magic {payload[:4]!r}")


# ----------------------------------------------------------- transforms


def thumbnail_dims(w: int, h: int, size: int) -> tuple[int, int]:
    """Ratio-preserving integer bounding-box fit (the
    `BasicImaging.resize` ratio rule, BasicImaging.scala:43-55, with
    floor division so SQL can reproduce it exactly)."""
    m = max(w, h)
    return max(1, (w * size) // m), max(1, (h * size) // m)


def resize_nearest(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbour resample (h, w, c) -> (th, tw, c)."""
    h, w, _ = arr.shape
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return arr[ys][:, xs]


def rotate(arr: np.ndarray, degrees: int) -> np.ndarray:
    """Rotate (h, w, c) by a multiple of 90 degrees clockwise — the
    exact-pixel subset of ``BasicImaging.rotate`` (BasicImaging.scala:
    57-70 rotates with bicubic resampling for arbitrary angles; right-
    angle rotations are pixel permutations and need no resampling)."""
    if degrees % 90 != 0:
        raise NotImplementedError(
            "non-right-angle rotation needs a resampling imaging "
            "library (BasicImaging.scala:57-70 bicubic path)"
        )
    return np.rot90(arr, -(degrees // 90) % 4, axes=(0, 1))


def mirror(arr: np.ndarray, horizontal: bool) -> np.ndarray:
    """Mirror (h, w, c): horizontal flips columns, vertical flips rows
    (BasicImaging.scala:160-180 mirrorHorizontally/mirrorVertically)."""
    return arr[:, ::-1] if horizontal else arr[::-1]
