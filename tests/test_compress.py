"""Pure-stdlib compression fallbacks (zinger_spark.compress) and the
wire-transport compression matrix: every Kafka codec x both record
generations round-tripped over a real socket against the stub broker.

Reference parity: franz-go gives the reference all four codecs on both
the produce and fetch sides natively; here the optional packages are
preferred and these fallbacks close the gap when they are absent
(which is the case in this container — so these tests exercise the
fallback paths for real).
"""

from __future__ import annotations

import pytest

from zinger_spark.compress import (
    CompressError,
    lz4_frame_compress,
    lz4_frame_decompress,
    snappy_compress,
    snappy_decompress,
    xxh32,
    zstd_frame_compress,
    zstd_frame_decompress,
)
from zinger_spark.kafka_stub import StubBroker
from zinger_spark.kafka_wire import KafkaWireClient, _compress, _decompress

PAYLOADS = [
    b"",
    b"x",
    b"hello, kafka wire",
    b"ab" * 40_000,  # > one 64 KB chunk
    bytes(range(256)) * 300,
]


# ---------------------------------------------------------------------------
# xxHash32 — spec test vectors (github.com/Cyan4973/xxHash: known
# digests for empty/short inputs at seeds 0 and a prime)


def test_xxh32_vectors():
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"", seed=0x9E3779B1) == 0x36B78AE7
    assert xxh32(b"Hello World") == 0xB1FD16EE
    # >16 bytes: exercises the 4-lane stripe loop
    assert xxh32(b"xxhash tests are fun and useful!") == xxh32(
        b"xxhash tests are fun and useful!"
    )
    assert xxh32(b"a") != xxh32(b"b")


# ---------------------------------------------------------------------------
# snappy


@pytest.mark.parametrize("payload", PAYLOADS)
def test_snappy_round_trip(payload):
    assert snappy_decompress(snappy_compress(payload)) == payload


def test_snappy_decodes_copy_elements():
    """Hand-built stream with all three copy tag types (what a real
    compressor emits; our encoder is literal-only)."""
    # "abcd" literal, then copy len=4 off=4 -> "abcdabcd"
    stream = bytes([8]) + bytes([(4 - 1) << 2]) + b"abcd" + bytes(
        [(0 << 5) | ((4 - 4) << 2) | 1, 4]
    )
    assert snappy_decompress(stream) == b"abcdabcd"
    # overlapping copy: "ab" literal + copy len=6 off=2 -> "abababab"
    stream = bytes([8]) + bytes([(2 - 1) << 2]) + b"ab" + bytes(
        [((6 - 4) << 2) | 1, 2]
    )
    assert snappy_decompress(stream) == b"abababab"
    # 2-byte-offset copy (tag type 2)
    stream = bytes([8]) + bytes([(4 - 1) << 2]) + b"wxyz" + bytes(
        [((4 - 1) << 2) | 2, 4, 0]
    )
    assert snappy_decompress(stream) == b"wxyzwxyz"


def test_snappy_rejects_bad_offset_and_length():
    with pytest.raises(CompressError, match="offset"):
        snappy_decompress(bytes([4, 1, 9, 9]))  # copy before any output
    with pytest.raises(CompressError, match="declared"):
        snappy_decompress(bytes([99]) + bytes([(3 - 1) << 2]) + b"abc")


# ---------------------------------------------------------------------------
# lz4


@pytest.mark.parametrize("payload", PAYLOADS)
def test_lz4_round_trip(payload):
    assert lz4_frame_decompress(lz4_frame_compress(payload)) == payload


def test_lz4_decodes_match_sequences():
    """Hand-built compressed block: 4 literals + an 8-byte match at
    offset 4 (overlapping), then the literal-only tail sequence."""
    block = bytes([(4 << 4) | (8 - 4)]) + b"abcd" + bytes([4, 0])
    block += bytes([1 << 4]) + b"!"
    frame = bytearray((0x184D2204).to_bytes(4, "little"))
    flg, bd = 0x60, 0x40
    frame += bytes([flg, bd, (xxh32(bytes([flg, bd])) >> 8) & 0xFF])
    frame += len(block).to_bytes(4, "little") + block
    frame += b"\x00\x00\x00\x00"
    assert lz4_frame_decompress(bytes(frame)) == b"abcd" + b"abcd" * 2 + b"!"


def test_lz4_header_checksum_verified():
    frame = bytearray(lz4_frame_compress(b"data"))
    frame[6] ^= 0xFF  # corrupt HC
    with pytest.raises(CompressError, match="header checksum"):
        lz4_frame_decompress(bytes(frame))


# ---------------------------------------------------------------------------
# zstd


@pytest.mark.parametrize("payload", PAYLOADS)
def test_zstd_round_trip(payload):
    assert zstd_frame_decompress(zstd_frame_compress(payload)) == payload


def test_zstd_rle_block():
    # single-segment frame, 1-byte FCS, one RLE block: 'z' x 10
    frame = (0xFD2FB528).to_bytes(4, "little") + bytes([0x20, 10])
    frame += ((10 << 3) | (1 << 1) | 1).to_bytes(3, "little") + b"z"
    assert zstd_frame_decompress(frame) == b"z" * 10


def test_zstd_compressed_block_raises_loudly():
    frame = (0xFD2FB528).to_bytes(4, "little") + bytes([0x20, 4])
    frame += ((4 << 3) | (2 << 1) | 1).to_bytes(3, "little") + b"\x00" * 4
    with pytest.raises(CompressError, match="zstandard"):
        zstd_frame_decompress(frame)


# ---------------------------------------------------------------------------
# kafka_wire codec dispatch (attributes bits -> codec id)


@pytest.mark.parametrize("codec,name", [(1, "gzip"), (2, "snappy"),
                                        (3, "lz4"), (4, "zstd")])
def test_wire_codec_dispatch_round_trip(codec, name):
    data = b"the quick brown fox " * 100
    assert _decompress(codec, _compress(codec, data)) == data


# ---------------------------------------------------------------------------
# the matrix: codec x record generation over the socket


@pytest.mark.parametrize("compression", ["none", "gzip", "snappy", "lz4", "zstd"])
@pytest.mark.parametrize("produce_version", [2, 3])
def test_produce_fetch_matrix(compression, produce_version):
    """Produce (MessageSet v1 at v2 / RecordBatch v2 at v3) compressed
    with each codec; fetch back through BOTH fetch generations, with
    the stub also re-compressing its fetch responses."""
    msgs = [(b"k%d" % i, b"payload-%d" % i * 10) for i in range(5)]
    with StubBroker(fetch_compression=compression) as b:
        b.seed("t", 1)
        with KafkaWireClient(b.bootstrap) as c:
            base = c.produce(
                "t", 0, msgs,
                compression=compression, api_version=produce_version,
            )
            assert base == 0
            for fetch_version in (2, 4):
                _, got = c.fetch("t", 0, 0, api_version=fetch_version)
                assert [(m.key, m.value) for m in got] == [
                    (k, v) for k, v in msgs
                ]
