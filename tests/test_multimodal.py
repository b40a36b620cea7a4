"""Multimodal plumbing tests: schema, metadata, Arrow batch flow, and
the stub-vs-real gating. The decode itself is a deterministic fake (no
media libs in this container); everything around it is real Spark."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from zinger_spark import multimodal as mm


@pytest.fixture()
def media_df(spark):
    rows = [(i, f"blob-{i}".encode() * 10) for i in range(20)]
    return spark.createDataFrame(rows, "id bigint, payload binary")


def test_attach_meta(media_df):
    out = mm.attach_meta(media_df, "payload", "image", "png")
    row = out.filter(F.col("id") == 3).collect()[0]["media_meta"]
    assert row["modality"] == "image" and row["format"] == "png"
    assert row["n_bytes"] == len(b"blob-3" * 10)
    assert row["content_hash"] == hashlib.md5(b"blob-3" * 10).hexdigest()
    assert row["width"] is None  # not decoded yet


def test_extract_image_features_fake(media_df):
    feats = mm.extract_image_features(media_df, fake=True)
    rows = feats.collect()
    assert len(rows) == 20
    # deterministic: same payload -> same features regardless of partitioning
    by_hash = {r["content_hash"]: r for r in rows}
    expect_hash = hashlib.md5(b"blob-7" * 10).hexdigest()
    r = by_hash[expect_hash]
    assert 64 <= r["width"] < 256 and 64 <= r["height"] < 256
    assert len(r["features"]) == 8
    repart = mm.extract_image_features(media_df.repartition(7), fake=True)
    assert {x["content_hash"]: tuple(x["features"]) for x in repart.collect()} == {
        k: tuple(v["features"]) for k, v in by_hash.items()
    }


def test_extract_without_lib_raises(media_df):
    feats = mm.extract_image_features(media_df, fake=False)
    with pytest.raises(Exception, match="NotImplementedError|image decode"):
        feats.collect()


def test_is_jpeg_detection():
    from zinger_spark.codecs import media

    assert media.is_jpeg(b"\xff\xd8\xff\xe0" + b"0" * 16)
    assert not media.is_jpeg(b"\x89PNG\r\n\x1a\n")
    assert not media.is_jpeg(b"")


@pytest.mark.skipif(
    not __import__("zinger_spark.codecs.media", fromlist=["HAS_PIL"]).HAS_PIL,
    reason="PIL not installed in this container (env-gated tier)",
)
def test_jpeg_decode_with_pil(spark):
    """When PIL is present, JPEG payloads decode FOR REAL through the
    same luma/histogram feature contract as the stdlib PNG tier."""
    import io

    from PIL import Image

    from zinger_spark.codecs import media

    buf = io.BytesIO()
    Image.new("RGB", (40, 30), (200, 10, 10)).save(buf, format="JPEG")
    raw = buf.getvalue()
    d = media.decode_pil(raw)
    assert (d["width"], d["height"]) == (40, 30)
    assert len(d["features"]) == 8 and abs(sum(d["features"]) - 1.0) < 1e-6
    df = spark.createDataFrame([(1, raw)], "id bigint, payload binary")
    rows = mm.extract_image_features(df, fake=False).collect()
    assert rows[0]["width"] == 40 and rows[0]["height"] == 30
    resized = mm.resize_images(df, (8, 8), fake=False).collect()
    assert media.is_png(bytes(resized[0]["payload"]))  # normalized to PNG


@pytest.mark.skipif(
    __import__("zinger_spark.codecs.media", fromlist=["HAS_PIL"]).HAS_PIL,
    reason="covers the PIL-absent gating only",
)
def test_jpeg_without_pil_gates(spark):
    """Without PIL, JPEG hits the env gate: raise on fake=False, stub on
    fake=True — never a silent wrong decode."""
    raw = b"\xff\xd8\xff\xe0" + b"JFIF-ish" * 4
    df = spark.createDataFrame([(1, raw)], "id bigint, payload binary")
    with pytest.raises(Exception, match="NotImplementedError|image decode"):
        mm.extract_image_features(df, fake=False).collect()
    rows = mm.extract_image_features(df, fake=True).collect()
    assert len(rows) == 1 and len(rows[0]["features"]) == 8


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [((None, None, None, None, None, None, 3500),)],
        "media_meta struct<modality:string,format:string,n_bytes:bigint,"
        "content_hash:string,width:int,height:int,duration_ms:bigint>",
    )
    out = mm.frame_sample_plan(df, every_ms=1000)
    assert [r["frame_ts_ms"] for r in out.collect()] == [0, 1000, 2000, 3000]


def test_metadata_only_scan_prunes_payload(spark, tmp_path, media_df):
    """Metadata queries must not read payload bytes: check the parquet
    scan's ReadSchema excludes the payload column."""
    p = str(tmp_path / "media")
    mm.attach_meta(media_df, "payload", "image", "png").write.parquet(p)
    scan = spark.read.parquet(p).select("media_meta.n_bytes")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan.split("ReadSchema:")[1]


def test_resize_images_fake(media_df):
    out = mm.resize_images(media_df, (224, 224), fake=True)
    rows = out.collect()
    assert len(rows) == 20
    assert all(r["width"] == 224 and r["height"] == 224 for r in rows)
    # payload volume tracks the target resolution; deterministic per input
    assert all(len(r["payload"]) == (224 * 224) // 64 for r in rows)
    again = {r["content_hash"]: bytes(r["payload"])
             for r in mm.resize_images(media_df.repartition(5), (224, 224), fake=True).collect()}
    assert {r["content_hash"]: bytes(r["payload"]) for r in rows} == again


def test_resize_without_lib_raises(media_df):
    with pytest.raises(Exception, match="NotImplementedError|image resize"):
        mm.resize_images(media_df, (64, 64), fake=False).collect()


def test_audio_chunk_plan_and_features(spark):
    df = spark.createDataFrame(
        [(("audio", "wav", 10, "h1", None, None, 12_500),),
         (("audio", "wav", 10, "h2", None, None, 3_000),)],
        "media_meta struct<modality:string,format:string,n_bytes:bigint,"
        "content_hash:string,width:int,height:int,duration_ms:bigint>",
    )
    plan = mm.audio_chunk_plan(df, chunk_ms=5000)
    got = sorted((r["content_hash"], r["chunk_idx"]) for r in plan.collect())
    # 12.5s -> 3 chunks; 3s -> 1 chunk
    assert got == [("h1", 0), ("h1", 1), ("h1", 2), ("h2", 0)]
    feats = mm.extract_audio_features(plan, fake=True).collect()
    assert len(feats) == 4
    assert all(len(r["features"]) == 13 and 0 <= r["rms"] <= 1 for r in feats)
    # deterministic per (hash, chunk)
    by_key = {(r["content_hash"], r["chunk_idx"]): tuple(r["features"]) for r in feats}
    feats2 = mm.extract_audio_features(plan.repartition(3), fake=True).collect()
    assert {(r["content_hash"], r["chunk_idx"]): tuple(r["features"]) for r in feats2} == by_key


def test_image_perceptual_hash_dedup(spark):
    """dHash/aHash over REAL PNG payloads: identical content hashes
    equal, a one-pixel edit stays within the Hamming bound, a different
    image lands far away — and the banded Hamming join finds exactly
    the near pair."""
    import numpy as np

    from zinger_spark.codecs import media
    from zinger_spark.multimodal import image_dup_pairs, image_hashes

    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    near = base.copy()
    near[0, 0] = 255 - near[0, 0]
    other = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    d_base, d_near, d_other = media.dhash(base), media.dhash(near), media.dhash(other)
    assert bin((d_base ^ d_near) & (2**64 - 1)).count("1") <= 3
    assert bin((d_base ^ d_other) & (2**64 - 1)).count("1") > 10

    df = spark.createDataFrame(
        [(1, media.encode_png(base)), (2, media.encode_png(near)),
         (3, media.encode_png(other))],
        "img_id long, payload binary",
    )
    hashes = {r["img_id"]: r for r in image_hashes(df).collect()}
    assert hashes[1]["dhash"] == d_base and hashes[3]["dhash"] == d_other
    pairs = [(r["id_a"], r["id_b"]) for r in image_dup_pairs(df).collect()]
    assert pairs == [(1, 2)]


def test_image_hash_fake_tier_gates(spark):
    """Non-PNG payloads raise without fake=True; with it, the stub is
    deterministic and the plumbing (schema, join) is identical."""
    import pytest as _pytest

    from zinger_spark.multimodal import image_hashes

    df = spark.createDataFrame([(1, b"not an image")], "img_id long, payload binary")
    with _pytest.raises(Exception, match="NotImplementedError|perceptual"):
        image_hashes(df).collect()
    rows = image_hashes(df, fake=True).collect()
    assert rows[0]["dhash"] == image_hashes(df, fake=True).collect()[0]["dhash"]


def test_audio_fingerprint_dedup(spark):
    """Spectral-contour fingerprints over REAL PCM WAV: a re-gained +
    lightly-noised copy of a clip stays within a few bits; a different
    tone mix lands far away; the Hamming join finds exactly the pair."""
    import numpy as np

    from zinger_spark.codecs import media
    from zinger_spark.multimodal import audio_dup_pairs, audio_hashes

    rate = 16000
    t = np.arange(rate * 2) / rate  # 2 s
    rng = np.random.default_rng(3)

    # harmonically rich signals (pure sines are the degenerate case:
    # empty bands have noise-driven delta signs)
    def rich(f0):
        # 0.2x keeps the 16-bit PCM encode out of clipping
        return 0.2 * sum(np.sin(2 * np.pi * k * f0 * t) / k for k in range(1, 41))

    clip = rich(110.0)
    near = 0.8 * clip + 0.0004 * rng.standard_normal(clip.size)
    other = rich(137.0)

    f0 = media.audio_fingerprint(clip, rate)
    f1 = media.audio_fingerprint(near, rate)
    f2 = media.audio_fingerprint(other, rate)
    assert bin((f0 ^ f1) & (2**64 - 1)).count("1") <= 6
    assert bin((f0 ^ f2) & (2**64 - 1)).count("1") > 12

    df = spark.createDataFrame(
        [(1, media.encode_wav(clip, rate)), (2, media.encode_wav(near, rate)),
         (3, media.encode_wav(other, rate))],
        "clip_id long, payload binary",
    )
    rows = {r["clip_id"]: r for r in audio_hashes(df).collect()}
    # 16-bit PCM quantization drifts a few near-zero-delta bits
    assert bin((rows[1]["afp"] ^ f0) & (2**64 - 1)).count("1") <= 6
    assert rows[1]["duration_ms"] == 2000
    pairs = [(r["id_a"], r["id_b"]) for r in audio_dup_pairs(df).collect()]
    assert pairs == [(1, 2)]


# --------------------------------------------------------------------------
# Video: ZVID container + frame sampling + near-dup pairs (all real —
# PNG frames decode via the stdlib codec)


def _mk_frames(seed: int, n: int = 4):
    import numpy as np

    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (8, 8, 1)).astype("uint8") for _ in range(n)]


def test_zvid_roundtrip_and_seek():
    import numpy as np

    from zinger_spark.codecs import media

    frames = _mk_frames(1)
    blob = media.encode_zvid(frames, fps=4)
    assert media.is_zvid(blob)
    fps, spans = media.zvid_index(blob)
    assert fps == 4 and len(spans) == 4
    for i, span in enumerate(spans):
        px = media.decode_zvid_frame(blob, span)["pixels"]
        assert np.array_equal(px, frames[i])
    with pytest.raises(ValueError, match="truncated"):
        media.zvid_index(blob[:-3])


def test_video_frame_sampling_step(spark):
    from zinger_spark.codecs import media

    blob = media.encode_zvid(_mk_frames(2, n=8), fps=4)  # 2 s clip
    df = spark.createDataFrame([(1, bytearray(blob))], "video_id long, payload binary")
    # every 1000 ms at 4 fps -> step 4 -> frames 0 and 4
    out = mm.video_frame_hashes(df, every_ms=1000).collect()
    assert [(r["frame_idx"], r["ts_ms"]) for r in sorted(out, key=lambda r: r["frame_idx"])] == [
        (0, 0),
        (4, 1000),
    ]
    # every 250 ms -> step 1 -> all 8 frames
    assert mm.video_frame_hashes(df, every_ms=250).count() == 8


def test_video_dup_pairs_finds_edited_copy(spark):
    import numpy as np

    from zinger_spark.codecs import media

    a = _mk_frames(10)
    b = [f.copy() for f in a]
    b[3] = 255 - b[3]  # re-edit one frame wholesale
    c = _mk_frames(99)  # unrelated footage
    rows = [
        (1, bytearray(media.encode_zvid(a, fps=4))),
        (2, bytearray(media.encode_zvid(b, fps=4))),
        (3, bytearray(media.encode_zvid(c, fps=4))),
    ]
    df = spark.createDataFrame(rows, "video_id long, payload binary")
    out = mm.video_dup_pairs(df, every_ms=250, min_matching_frames=2).collect()
    pairs = {(r["id_a"], r["id_b"]): r["n_matching_frames"] for r in out}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 3
    assert all(k == (1, 2) for k in pairs)


def test_video_non_zvid_gates(spark):
    df = spark.createDataFrame([(1, b"\x00\x01mp4?")], "video_id long, payload binary")
    with pytest.raises(Exception, match="ffmpeg|NotImplemented"):
        mm.video_frame_hashes(df).collect()
    out = mm.video_frame_hashes(df, fake=True).collect()
    assert len(out) == 1 and out[0]["frame_idx"] == 0
