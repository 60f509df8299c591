"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages, swappable via the ``decoder=``
hook.

Two decoders ship:

- ``numpy_decode`` (default for the driver entry since round 3): a
  REAL decode path for pure-NumPy-decodable container formats —
  uncompressed 24-bit BMP images and 16-bit PCM WAV audio (video =
  concatenated BMP frames) — exercising the full
  bytes→pixels/samples→features pipeline with no external media libs.
- ``fake_decode``: the deterministic byte-stat stand-in, kept for
  plumbing tests and as the documented seam where PIL/librosa/ffmpeg
  slot in on a real cluster for compressed formats (absent in this
  sandbox); only the decoder changes, the Spark plumbing stays.

Scale notes: media rows are orders of magnitude wider than text rows —
``repartition`` by size budget before the UDF stage so one Arrow batch
stays within worker memory, and keep metadata in columns (not inside
the blob) so Catalyst can prune/filter WITHOUT touching bytes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"


# ---- real pure-NumPy codecs (BMP / PCM WAV) -----------------------
def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 array as an uncompressed 24-bit BMP
    (BITMAPINFOHEADER, bottom-up, BGR, rows padded to 4 bytes)."""
    import struct

    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3
    # bottom-up rows, RGB→BGR
    body = bytearray()
    for y in range(h - 1, -1, -1):
        body += img[y, :, ::-1].tobytes() + b"\x00" * pad
    data_size = len(body)
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    return bytes(header + info + body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP to (H, W, 3) uint8 RGB —
    vectorized NumPy only (header parse + one reshape/slice)."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    hdr_sz, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    row_bytes = (w * 3 + 3) & ~3
    flat = np.frombuffer(payload, dtype=np.uint8, count=abs(h) * row_bytes, offset=off)
    rows = flat.reshape(abs(h), row_bytes)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:  # bottom-up
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR→RGB


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode int16 samples as a mono 16-bit PCM WAV (RIFF)."""
    import struct

    assert samples.dtype == np.int16
    data = samples.tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
    hdr = struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a mono 16-bit PCM WAV to (int16 samples, sample_rate) —
    RIFF chunk walk + one frombuffer."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid, sz = struct.unpack_from("<4sI", payload, pos)
        if cid == b"fmt ":
            fmt_code, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", payload, pos + 8)
            if fmt_code != 1 or ch != 1 or bits != 16:
                raise ValueError("unsupported WAV (need mono 16-bit PCM)")
        elif cid == b"data":
            samples = np.frombuffer(payload, dtype="<i2", count=sz // 2, offset=pos + 8)
        pos += 8 + sz + (sz & 1)
    if rate is None or samples is None:
        raise ValueError("truncated WAV")
    return samples, rate


def numpy_decode(payload: bytes, kind: str) -> np.ndarray:
    """REAL decode → 8-float feature vector, NumPy only.

    image: BMP → [mean R, mean G, mean B, global std, H, W, min, max]
    audio: WAV → [mean, std, RMS, zero-crossing rate, n/1000, rate/1000,
                  min/32768, max/32768]
    video: concatenated BMP frames (each frame's byte length is in its
           own header) → per-frame luma means reduced to
           [n_frames, mean luma, std of frame means, first, last, min,
           max, H*W/1000].
    """
    import struct

    if payload is None or len(payload) == 0:
        return np.zeros(8, dtype=np.float32)
    if kind == "image":
        img = decode_bmp(payload).astype(np.float64)
        return np.array(
            [img[..., 0].mean(), img[..., 1].mean(), img[..., 2].mean(),
             img.std(), img.shape[0], img.shape[1], img.min(), img.max()],
            dtype=np.float32,
        )
    if kind == "audio":
        s, rate = decode_wav(payload)
        x = s.astype(np.float64) / 32768.0
        zc = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0
        return np.array(
            [x.mean(), x.std(), np.sqrt((x * x).mean()), zc,
             len(x) / 1000.0, rate / 1000.0, x.min(), x.max()],
            dtype=np.float32,
        )
    if kind == "video":
        means, pos, shape = [], 0, (0, 0)
        while pos + 6 <= len(payload) and payload[pos : pos + 2] == b"BM":
            sz = struct.unpack_from("<I", payload, pos + 2)[0]
            frame = decode_bmp(payload[pos : pos + sz])
            shape = frame.shape[:2]
            # ITU-R 601 luma
            luma = (
                frame[..., 0] * 0.299 + frame[..., 1] * 0.587 + frame[..., 2] * 0.114
            )
            means.append(float(luma.mean()))
            pos += sz
        if not means:
            raise ValueError("no BMP frames in video payload")
        m = np.asarray(means)
        return np.array(
            [len(m), m.mean(), m.std(), m[0], m[-1], m.min(), m.max(),
             shape[0] * shape[1] / 1000.0],
            dtype=np.float32,
        )
    raise ValueError(f"unknown media kind {kind!r}")


def fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for a real decoder: 8 floats derived from
    the payload bytes. Replace with PIL/librosa/ffmpeg on a real
    cluster — only this function changes; the Spark plumbing stays."""
    if payload is None or len(payload) == 0:
        return np.zeros(8, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    chunks = np.array_split(arr.astype(np.float32), 8)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32)


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] = fake_decode,
    batch_rows: int = 256,
) -> DataFrame:
    """binary payload → feature vector via Arrow-batched mapInPandas.

    The iterator-of-batches shape means one task never materializes
    its whole partition; ``spark.sql.execution.arrow.maxRecordsPerBatch``
    (set here per-plan via repartitioning guidance) bounds batch RAM.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(p, k).astype(np.float32).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: expands each video row into frame
    timestamps JVM-side (sequence+explode); the actual frame decode is
    the stubbed kernel above. Demonstrates fan-out stays declarative."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))),
        )
        .select("media_id", "frame_ts_ms", "payload")
    )


def synthetic_media_real(spark, n: int = 64) -> DataFrame:
    """Deterministic media table with REAL container payloads:
    images are gradient 24-bit BMPs, audio is a sine-chirp 16-bit PCM
    WAV, video is 3 concatenated BMP frames of stepped brightness —
    all decodable by :func:`numpy_decode` with known statistics."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            h, w = 8 + (i % 3) * 4, 12
            y, x = np.mgrid[0:h, 0:w]
            img = np.stack(
                [(x * 7 + i) % 256, (y * 11 + i) % 256, (x + y + i) % 256], axis=-1
            ).astype(np.uint8)
            payload, wdt, hgt, dur = encode_bmp(img), w, h, None
        elif kind == "audio":
            t = np.arange(800 + (i % 5) * 100)
            s = (3000 * np.sin(2 * np.pi * t * (i % 7 + 1) / 100.0)).astype(np.int16)
            payload, wdt, hgt, dur = encode_wav(s), None, None, len(t) * 1000 // 8000
        else:
            frames = []
            for f in range(3):
                img = np.full((6, 8, 3), (i * 20 + f * 40) % 256, dtype=np.uint8)
                frames.append(encode_bmp(img))
            payload, wdt, hgt, dur = b"".join(frames), 8, 6, 3000
        rows.append((i, kind, f"x/{kind}", wdt, hgt, dur, payload))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = repeatable
    byte pattern)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(((i * 37 + j * 11) % 251 for j in range(64 + (i % 5) * 32)))
        rows.append(
            (
                i,
                kind,
                f"x/{kind}",
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                3000 if kind != "image" else None,
                payload,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
