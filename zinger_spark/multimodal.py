"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The engine-side contract (real and tested):
  - a multimodal column is ``binary`` payload + a metadata struct
    (modality, format, width/height/duration, byte length, content hash)
  - transforms run as Arrow-batched ``mapInPandas``/pandas UDFs so
    payload bytes never round-trip through Python row-at-a-time
  - partitioning guidance: payload tables are stored one-blob-per-row
    parquet with a small row-group target so a 100-TB corpus scans with
    bounded executor memory; metadata-only queries never touch payload
    bytes thanks to parquet column pruning

Decode tiers:
  - PNG images and PCM WAV audio decode FOR REAL on every executor via
    the pure-stdlib codecs in ``codecs/media.py`` (zlib/struct/wave +
    numpy — no PIL/librosa needed).
  - JPEG (and anything else PIL reads) decodes FOR REAL when PIL is
    importable on the executors — auto-detected at import
    (``media.HAS_PIL``), same luma/histogram feature contract as the
    PNG tier, so installing PIL upgrades decode coverage without any
    code or query change.
  - Remaining formats (MP3/video; JPEG where PIL is absent, as in this
    container) raise NotImplementedError unless ``fake=True`` routes
    them to a deterministic stub (seeded by the content hash) so the
    Spark-side plumbing — schema, batch shape, partition flow — is
    still fully exercised in tests.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from .codecs import media as _media

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType()),      # image | audio | video
        T.StructField("format", T.StringType()),        # png, wav, mp4, ...
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),  # md5 hex
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("content_hash", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def attach_meta(df: DataFrame, payload_col: str, modality: str, fmt: str) -> DataFrame:
    """Wrap a binary column with its metadata struct. Hash and length are
    JVM-side expressions; width/height/duration stay null until decode."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(fmt).alias("format"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
            F.md5(F.col(payload_col)).alias("content_hash"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic fake decoder: dimensions/luma derived from the
    content hash, so tests are stable and partition-order independent."""
    h = hashlib.md5(payload).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "mean_luma": round(h[2] / 255.0, 6),
        "features": [round(b / 255.0, 6) for b in h[:8]],
    }


def decode_image_batches(fake: bool = False):
    """mapInPandas kernel: (id, payload) batches -> IMAGE_FEATURES rows.

    Arrow moves the binary column in bulk; each pandas batch is decoded
    in-process.  PNG payloads decode FOR REAL (pure-stdlib codec,
    codecs/media.py); other formats need PIL/ffmpeg and fall back to
    the deterministic stub only when ``fake=True``.
    """

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                d = None
                if _media.is_png(raw):
                    d = _media.decode_png(raw)
                elif _media.HAS_PIL and _media.is_jpeg(raw):
                    d = _media.decode_pil(raw)
                if d is not None:
                    rows.append(
                        {
                            "content_hash": hashlib.md5(raw).hexdigest(),
                            "width": d["width"],
                            "height": d["height"],
                            "mean_luma": d["mean_luma"],
                            "features": d["features"],
                        }
                    )
                    continue
                if not fake:
                    raise NotImplementedError(
                        "image decode beyond PNG (or JPEG-with-PIL) requires "
                        "PIL/ffmpeg, not present in this container; pass "
                        "fake=True for the deterministic stub"
                    )
                d = _fake_decode(raw)
                rows.append(
                    {
                        "content_hash": hashlib.md5(raw).hexdigest(),
                        "width": d["width"],
                        "height": d["height"],
                        "mean_luma": d["mean_luma"],
                        "features": d["features"],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA])

    return _kernel


def extract_image_features(df: DataFrame, payload_col: str = "payload", fake: bool = False) -> DataFrame:
    """Distributed decode/feature-extract over a binary column."""
    return df.select(F.col(payload_col).alias("payload")).mapInPandas(
        decode_image_batches(fake=fake), IMAGE_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("content_hash", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_image_batches(target: tuple[int, int], fake: bool = False):
    """mapInPandas kernel: payload -> resized payload (binary in, binary
    out — the transcode shape; Arrow carries bytes both ways so nothing
    is serialized row-at-a-time through Python objects).

    PNG payloads run a REAL nearest-neighbor resize + PNG re-encode
    (pure-stdlib codec); other formats need PIL and use the
    deterministic stub only when ``fake=True``."""

    w, h = target

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                d = None
                if _media.is_png(raw):
                    d = _media.decode_png(raw)
                elif _media.HAS_PIL and _media.is_jpeg(raw):
                    # decode via PIL, re-encode as PNG (the stdlib
                    # encoder): resize output format is normalized, so
                    # downstream readers need only the PNG tier
                    d = _media.decode_pil(raw)
                if d is not None:
                    resized = _media.resize_nearest(d["pixels"], (w, h))
                    rows.append(
                        {
                            "content_hash": hashlib.md5(raw).hexdigest(),
                            "payload": _media.encode_png(resized),
                            "width": w,
                            "height": h,
                        }
                    )
                    continue
                if not fake:
                    raise NotImplementedError(
                        "image resize beyond PNG (or JPEG-with-PIL) requires "
                        "PIL, not present in this container; pass fake=True "
                        "for the stub"
                    )
                digest = hashlib.md5(raw + f"{w}x{h}".encode()).digest()
                # stub payload: hash-seeded bytes, length ~ w*h/64 so
                # byte volume tracks the requested resolution
                size = max(16, (w * h) // 64)
                fake_bytes = (digest * (size // len(digest) + 1))[:size]
                rows.append(
                    {
                        "content_hash": hashlib.md5(raw).hexdigest(),
                        "payload": fake_bytes,
                        "width": w,
                        "height": h,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA])

    return _kernel


def resize_images(
    df: DataFrame,
    target: tuple[int, int],
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Distributed resize/transcode over a binary column."""
    return df.select(F.col(payload_col).alias("payload")).mapInPandas(
        resize_image_batches(target, fake=fake), RESIZED_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("content_hash", T.StringType()),
        T.StructField("chunk_idx", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def audio_chunk_plan(df: DataFrame, chunk_ms: int = 5000) -> DataFrame:
    """Audio chunking *plan*: explode fixed-length chunk indices per
    clip (same scale shape as frame_sample_plan — decode parallelism =
    chunks, not clips).  A ``payload`` column, when present, rides
    along so the real WAV decode can slice the chunk's samples."""
    n_chunks = F.greatest(
        F.ceil(F.col("media_meta.duration_ms") / F.lit(chunk_ms)).cast("int"), F.lit(1)
    )
    cols = [
        F.col("media_meta"),
        F.col("media_meta.content_hash").alias("content_hash"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    ]
    if "payload" in df.columns:
        cols.append(F.col("payload"))
    return df.select(*cols)


def extract_audio_features(
    df: DataFrame, fake: bool = False, chunk_ms: int = 5000
) -> DataFrame:
    """Per-chunk feature extraction over an exploded chunk plan.

    With a ``payload`` column present, PCM WAV payloads decode FOR REAL
    (pure-stdlib codec) and each chunk's features (rms, mean |x|, peak,
    zero-crossing rate, amplitude histogram — a 13-dim MFCC-shaped
    vector) come from the chunk's actual samples; the per-batch decode
    is cached by content hash so a clip exploded into N chunks in one
    Arrow batch decodes once.  Non-WAV audio needs librosa/ffmpeg and
    uses the hash-seeded stub only when ``fake=True``."""

    has_payload = "payload" in df.columns

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            cache: dict[str, dict] = {}
            for i in range(len(pdf)):
                ch = pdf["content_hash"].iloc[i]
                idx = int(pdf["chunk_idx"].iloc[i])
                if has_payload:
                    raw = bytes(pdf["payload"].iloc[i])
                    if _media.is_wav(raw):
                        if ch not in cache:
                            cache[ch] = _media.decode_wav(raw)
                        d = cache[ch]
                        feats = _media.wav_chunk_features(
                            d["samples"], d["sample_rate"], chunk_ms, idx
                        )
                        rows.append(
                            {
                                "content_hash": ch,
                                "chunk_idx": idx,
                                "rms": feats["rms"],
                                "features": feats["features"],
                            }
                        )
                        continue
                if not fake:
                    raise NotImplementedError(
                        "non-WAV audio decode requires librosa/ffmpeg, not "
                        "present in this container; pass fake=True for the stub"
                    )
                digest = hashlib.md5(f"{ch}:{idx}".encode()).digest()
                rows.append(
                    {
                        "content_hash": ch,
                        "chunk_idx": idx,
                        "rms": round(digest[0] / 255.0, 6),
                        "features": [round(b / 255.0, 6) for b in digest[:13]],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA])

    cols = ["content_hash", "chunk_idx"] + (["payload"] if has_payload else [])
    return df.select(*cols).mapInPandas(_kernel, AUDIO_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode target timestamps per clip so
    each (clip, ts) decode lands on its own task — the shape that scales
    (decode parallelism = frames, not clips). Decode itself is stubbed."""
    return df.select(
        "media_meta",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("media_meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


IMAGE_HASH_SCHEMA = T.StructType(
    [
        T.StructField("img_id", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("dhash", T.LongType()),
        T.StructField("ahash", T.LongType()),
    ]
)


def image_hash_batches(fake: bool = False):
    """mapInPandas kernel: (img_id, payload) -> perceptual hashes
    (dHash + aHash, codecs/media.py).  PNG hashes FOR REAL via the
    stdlib decoder (JPEG too when PIL is present); other formats fall
    back to a deterministic content-hash-derived stub only when
    ``fake=True`` — the plumbing (schema, Arrow batching, downstream
    hamming join) is identical either way."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for img_id, payload in zip(pdf["img_id"], pdf["payload"]):
                raw = bytes(payload)
                px = None
                if _media.is_png(raw):
                    px = _media.decode_png(raw)["pixels"]
                elif _media.HAS_PIL and _media.is_jpeg(raw):
                    px = _media.decode_pil(raw)["pixels"]
                if px is not None:
                    dh, ah = _media.dhash(px), _media.ahash(px)
                elif fake:
                    h = hashlib.md5(raw).digest()
                    dh = int.from_bytes(h[:8], "little", signed=True)
                    ah = int.from_bytes(h[8:16], "little", signed=True)
                else:
                    raise NotImplementedError(
                        "perceptual hash beyond PNG (or JPEG-with-PIL) "
                        "requires PIL/ffmpeg; pass fake=True for the stub"
                    )
                rows.append(
                    {
                        "img_id": int(img_id),
                        "content_hash": hashlib.md5(raw).hexdigest(),
                        "dhash": dh,
                        "ahash": ah,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_HASH_SCHEMA])

    return _kernel


def image_hashes(
    df: DataFrame, id_col: str = "img_id", payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Distributed perceptual hashing over a binary image column."""
    return df.select(
        F.col(id_col).cast("long").alias("img_id"),
        F.col(payload_col).alias("payload"),
    ).mapInPandas(image_hash_batches(fake=fake), IMAGE_HASH_SCHEMA)


def image_dup_pairs(
    df: DataFrame,
    id_col: str = "img_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    max_bucket: int | None = 10000,
    fake: bool = False,
) -> DataFrame:
    """Image near-dup pairs: perceptual dHash + the pigeonhole-banded
    Hamming join (operators.dedup.hamming_dup_pairs) — the image-side
    twin of SimHash text dedup.  The decode/hash pass is the only
    Python (Arrow-batched); candidate generation and verification stay
    JVM-side equi-joins."""
    from .operators.dedup import hamming_dup_pairs

    fps = image_hashes(df, id_col, payload_col, fake=fake)
    return hamming_dup_pairs(
        fps,
        fp_col="dhash",
        id_col="img_id",
        bits=64,
        max_hamming=max_hamming,
        max_bucket=max_bucket,
    )


AUDIO_HASH_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("afp", T.LongType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)


def audio_hash_batches(fake: bool = False):
    """mapInPandas kernel: (clip_id, payload) -> spectral-contour
    fingerprints (codecs/media.audio_fingerprint).  PCM WAV hashes FOR
    REAL via the stdlib decoder + numpy FFT; other formats fall back to
    a deterministic stub only when ``fake=True``."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for clip_id, payload in zip(pdf["clip_id"], pdf["payload"]):
                raw = bytes(payload)
                if _media.is_wav(raw):
                    d = _media.decode_wav(raw)
                    fp = _media.audio_fingerprint(d["samples"], d["sample_rate"])
                    dur = d["duration_ms"]
                elif fake:
                    h = hashlib.md5(raw).digest()
                    fp = int.from_bytes(h[:8], "little", signed=True)
                    dur = int.from_bytes(h[8:10], "little")
                else:
                    raise NotImplementedError(
                        "audio fingerprint beyond PCM WAV requires ffmpeg/"
                        "librosa; pass fake=True for the stub"
                    )
                rows.append(
                    {
                        "clip_id": int(clip_id),
                        "content_hash": hashlib.md5(raw).hexdigest(),
                        "afp": fp,
                        "duration_ms": int(dur),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_HASH_SCHEMA])

    return _kernel


def audio_hashes(
    df: DataFrame, id_col: str = "clip_id", payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    return df.select(
        F.col(id_col).cast("long").alias("clip_id"),
        F.col(payload_col).alias("payload"),
    ).mapInPandas(audio_hash_batches(fake=fake), AUDIO_HASH_SCHEMA)


def audio_dup_pairs(
    df: DataFrame,
    id_col: str = "clip_id",
    payload_col: str = "payload",
    max_hamming: int = 6,
    max_bucket: int | None = 10000,
    fake: bool = False,
) -> DataFrame:
    """Audio near-dup pairs: spectral-contour fingerprints + the banded
    Hamming join — re-encoded/volume-scaled/noised copies of a clip
    land within a few bits while different material lands ~32 bits out."""
    from .operators.dedup import hamming_dup_pairs

    fps = audio_hashes(df, id_col, payload_col, fake=fake)
    return hamming_dup_pairs(
        fps,
        fp_col="afp",
        id_col="clip_id",
        bits=64,
        max_hamming=max_hamming,
        max_bucket=max_bucket,
    )


# --------------------------------------------------------------------------
# Video: frame sampling + per-frame perceptual hashing + near-dup pairs.
# ZVID payloads (codecs/media.py) decode FOR REAL — PNG frames behind a
# seekable directory; mp4/webm remain env-gated behind ffmpeg at the
# single demuxer seam (zvid_index/decode_zvid_frame), everything
# downstream is container-agnostic.

VIDEO_FRAME_HASH_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("fhash", T.LongType()),
    ]
)


def video_frame_hash_batches(every_ms: int = 1000, fake: bool = False):
    """mapInPandas kernel: (video_id, payload) -> one dHash per SAMPLED
    frame.  Sampling step = round(every_ms * fps / 1000) frames, so the
    decode cost is proportional to sampled frames, not stored frames
    (the directory seek keeps unsampled frames' bytes untouched)."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for video_id, payload in zip(pdf["video_id"], pdf["payload"]):
                raw = bytes(payload)
                chash = hashlib.md5(raw).hexdigest()
                if _media.is_zvid(raw):
                    fps, spans = _media.zvid_index(raw)
                    step = max(1, round(every_ms * fps / 1000))
                    for idx in range(0, len(spans), step):
                        px = _media.decode_zvid_frame(raw, spans[idx])["pixels"]
                        rows.append(
                            {
                                "video_id": int(video_id),
                                "content_hash": chash,
                                "frame_idx": idx,
                                "ts_ms": idx * 1000 // fps,
                                "fhash": _media.dhash(px),
                            }
                        )
                elif fake:
                    h = hashlib.md5(raw).digest()
                    rows.append(
                        {
                            "video_id": int(video_id),
                            "content_hash": chash,
                            "frame_idx": 0,
                            "ts_ms": 0,
                            "fhash": int.from_bytes(h[:8], "little", signed=True),
                        }
                    )
                else:
                    raise NotImplementedError(
                        "video decode beyond ZVID requires ffmpeg; pass "
                        "fake=True for the stub"
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_FRAME_HASH_SCHEMA]
            )

    return _kernel


def video_frame_hashes(
    df: DataFrame,
    id_col: str = "video_id",
    payload_col: str = "payload",
    every_ms: int = 1000,
    fake: bool = False,
) -> DataFrame:
    return df.select(
        F.col(id_col).cast("long").alias("video_id"),
        F.col(payload_col).alias("payload"),
    ).mapInPandas(video_frame_hash_batches(every_ms, fake=fake), VIDEO_FRAME_HASH_SCHEMA)


# frame_idx is packed next to video_id for the frame-level join; bounds
# the per-video frame count the pair join can see
_VIDEO_FRAME_CAP = 100_000


def video_dup_pairs(
    df: DataFrame,
    id_col: str = "video_id",
    payload_col: str = "payload",
    every_ms: int = 1000,
    max_hamming: int = 3,
    min_matching_frames: int = 2,
    max_bucket: int | None = 10000,
    fake: bool = False,
) -> DataFrame:
    """Video near-dup pairs: per-sampled-frame dHashes -> banded Hamming
    join at the FRAME level (Manku pigeonhole, operators.dedup) -> pairs
    of videos sharing >= min_matching_frames near-identical frames.

    Scale shape: candidates come from frame-fingerprint band equi-joins
    (never video x video), the video-level reduction is one partial-agg
    groupBy on the (id_a, id_b) pair — re-encoded or lightly-edited
    copies land with most frames matching, unrelated footage shares ~0
    frames.  Returns (id_a, id_b, n_matching_frames)."""
    from .operators.dedup import hamming_dup_pairs

    fh = video_frame_hashes(df, id_col, payload_col, every_ms, fake=fake)
    fid = (F.col("video_id") * _VIDEO_FRAME_CAP + F.col("frame_idx")).alias("fid")
    pairs = hamming_dup_pairs(
        fh.select(fid, "fhash"),
        fp_col="fhash",
        id_col="fid",
        bits=64,
        max_hamming=max_hamming,
        max_bucket=max_bucket,
    )
    va = F.expr(f"id_a div {_VIDEO_FRAME_CAP}")
    vb = F.expr(f"id_b div {_VIDEO_FRAME_CAP}")
    return (
        pairs.select(va.alias("va"), vb.alias("vb"))
        .filter(F.col("va") != F.col("vb"))
        .select(
            F.least("va", "vb").alias("id_a"),
            F.greatest("va", "vb").alias("id_b"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_matching_frames"))
        .filter(F.col("n_matching_frames") >= min_matching_frames)
    )
