"""Real (pure-stdlib) PNG/WAV codec tests + Spark integration.

The forward filters used to build test PNGs are implemented HERE,
independently of the decoder's unfilter code, so a sign/order bug in
either side fails the round-trip instead of cancelling out.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pytest

from zinger_spark.codecs import media
from zinger_spark import multimodal as mm


# -- PNG helpers (independent forward-filtering) ----------------------------


def _filter_scanlines(px: np.ndarray, ftype: int) -> bytes:
    """Forward-filter an (H, W, C) image with one filter type for every
    scanline, per the PNG spec definitions."""
    h, w, c = px.shape
    stride = w * c
    flat = px.reshape(h, stride).astype(np.int32)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        line = flat[y]
        out.append(ftype)
        for x in range(stride):
            a = int(line[x - c]) if x >= c else 0
            b = int(prev[x])
            cc = int(prev[x - c]) if x >= c else 0
            if ftype == 0:
                v = line[x]
            elif ftype == 1:
                v = line[x] - a
            elif ftype == 2:
                v = line[x] - b
            elif ftype == 3:
                v = line[x] - ((a + b) >> 1)
            elif ftype == 4:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                v = line[x] - pr
            out.append(v & 0xFF)
        prev = line
    return bytes(out)


def _build_png(px: np.ndarray, ftype: int, color_type: int, palette=None) -> bytes:
    h, w = px.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = _filter_scanlines(px if px.ndim == 3 else px[:, :, None], ftype)
    chunks = media._chunk(b"IHDR", ihdr)
    if palette is not None:
        chunks += media._chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    chunks += media._chunk(b"IDAT", zlib.compress(raw))
    chunks += media._chunk(b"IEND", b"")
    return media.PNG_SIG + chunks


_RGB_2x2 = np.array(
    [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
)


def test_decode_png_known_luma():
    d = media.decode_png(media.encode_png(_RGB_2x2))
    assert (d["width"], d["height"], d["channels"]) == (2, 2, 3)
    assert np.array_equal(d["pixels"], _RGB_2x2)
    # lumas: R 76.245, G 149.685, B 29.07, white 255 -> mean 127.5 -> 0.5
    assert d["mean_luma"] == 0.5
    assert abs(sum(d["features"]) - 1.0) < 1e-9


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_decode_png_all_filters(ftype):
    rng = np.random.default_rng(ftype + 7)
    px = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    data = _build_png(px, ftype, color_type=2)
    d = media.decode_png(data)
    assert np.array_equal(d["pixels"], px), f"filter {ftype} round-trip"


@pytest.mark.parametrize(
    "channels,color_type", [(1, 0), (2, 4), (4, 6)]
)
def test_decode_png_color_types(channels, color_type):
    rng = np.random.default_rng(channels)
    px = rng.integers(0, 256, size=(3, 3, channels), dtype=np.uint8)
    d = media.decode_png(_build_png(px, 0, color_type))
    assert np.array_equal(d["pixels"], px)


def test_decode_png_palette():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)[:, :, None]
    d = media.decode_png(_build_png(idx, 0, color_type=3, palette=palette))
    assert d["channels"] == 3
    assert np.array_equal(d["pixels"], palette[idx[:, :, 0]])


def test_resize_nearest_exact():
    px = np.arange(4 * 4 * 1, dtype=np.uint8).reshape(4, 4, 1)
    out = media.resize_nearest(px, (2, 2))
    assert out.shape == (2, 2, 1)
    assert np.array_equal(out[:, :, 0], np.array([[0, 2], [8, 10]]))


def test_wav_round_trip_known_rms():
    rate = 8000
    t = np.arange(rate, dtype=np.float64) / rate
    amp = 0.5
    sine = amp * np.sin(2 * np.pi * 440 * t)
    d = media.decode_wav(media.encode_wav(sine, rate))
    assert d["sample_rate"] == rate
    assert d["n_frames"] == rate
    assert d["duration_ms"] == 1000
    # sine rms = amp / sqrt(2)
    assert abs(d["rms"] - amp / np.sqrt(2)) < 1e-3


def test_wav_chunk_features_localize_energy():
    rate = 4000
    silent = np.zeros(rate // 2)
    loud = 0.8 * np.sin(2 * np.pi * 200 * np.arange(rate // 2) / rate)
    d = media.decode_wav(media.encode_wav(np.concatenate([silent, loud]), rate))
    f0 = media.wav_chunk_features(d["samples"], rate, 500, 0)
    f1 = media.wav_chunk_features(d["samples"], rate, 500, 1)
    assert f0["rms"] < 1e-6
    assert abs(f1["rms"] - 0.8 / np.sqrt(2)) < 1e-2
    assert len(f1["features"]) == 13


# -- Spark integration (real decode on executors) ---------------------------


def test_extract_image_features_real_png(spark):
    payloads = [
        (1, bytearray(media.encode_png(_RGB_2x2))),
        (2, bytearray(media.encode_png(np.full((3, 5, 3), 128, dtype=np.uint8)))),
    ]
    df = spark.createDataFrame(payloads, "id int, payload binary")
    rows = {r["width"]: r for r in mm.extract_image_features(df).collect()}
    assert rows[2]["height"] == 2 and rows[2]["mean_luma"] == 0.5
    assert rows[5]["height"] == 3
    assert abs(rows[5]["mean_luma"] - 128.0 / 255.0) < 1e-6


def test_resize_images_real_png_round_trip(spark):
    src = media.encode_png(np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3))
    df = spark.createDataFrame([(1, bytearray(src))], "id int, payload binary")
    out = mm.resize_images(df, target=(4, 4)).collect()[0]
    assert (out["width"], out["height"]) == (4, 4)
    d = media.decode_png(bytes(out["payload"]))
    assert (d["width"], d["height"]) == (4, 4)
    assert out["content_hash"] == hashlib.md5(src).hexdigest()


def test_extract_audio_features_real_wav(spark):
    rate = 4000
    silent = np.zeros(rate // 2)
    loud = 0.8 * np.sin(2 * np.pi * 200 * np.arange(rate // 2) / rate)
    wav = media.encode_wav(np.concatenate([silent, loud]), rate)
    df = spark.createDataFrame([(1, bytearray(wav))], "id int, payload binary")
    with_meta = mm.attach_meta(df, "payload", "audio", "wav").withColumn(
        "media_meta",
        mm.F.col("media_meta").withField("duration_ms", mm.F.lit(1000).cast("long")),
    )
    chunks = mm.audio_chunk_plan(with_meta, chunk_ms=500)
    feats = {
        r["chunk_idx"]: r
        for r in mm.extract_audio_features(chunks, chunk_ms=500).collect()
    }
    assert feats[0]["rms"] < 1e-6
    assert abs(feats[1]["rms"] - 0.8 / np.sqrt(2)) < 1e-2


def test_non_png_without_fake_raises_in_kernel():
    import pandas as pd

    kernel = mm.decode_image_batches(fake=False)
    jpegish = pd.DataFrame({"payload": [b"\xff\xd8\xff\xe0 not a png"]})
    with pytest.raises(NotImplementedError, match="PIL"):
        list(kernel(iter([jpegish])))


def test_decode_png_mixed_filters_per_row():
    """Adaptive encoders pick a different filter per scanline; decode
    must handle an arbitrary interleaving (incl. the vectorized Sub
    path against sequential Paeth/Average neighbors)."""
    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    h, w, c = px.shape
    stride = w * c
    flat = px.reshape(h, stride).astype(np.int32)
    ftypes = [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        line = flat[y]
        ftype = ftypes[y]
        out.append(ftype)
        for x in range(stride):
            a = int(line[x - c]) if x >= c else 0
            b = int(prev[x])
            cc = int(prev[x - c]) if x >= c else 0
            if ftype == 0:
                v = line[x]
            elif ftype == 1:
                v = line[x] - a
            elif ftype == 2:
                v = line[x] - b
            elif ftype == 3:
                v = line[x] - ((a + b) >> 1)
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                v = line[x] - pr
            out.append(v & 0xFF)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        media.PNG_SIG
        + media._chunk(b"IHDR", ihdr)
        + media._chunk(b"IDAT", zlib.compress(bytes(out)))
        + media._chunk(b"IEND", b"")
    )
    d = media.decode_png(data)
    assert np.array_equal(d["pixels"], px)
