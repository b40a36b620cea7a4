"""Dependency-free fallback codecs for the Kafka wire transport.

The reference gets snappy/lz4/zstd natively from franz-go
(kgo.ProducerBatchCompression, cli/flags.go consumers inherit broker
defaults); this repo prefers the optional python-snappy / lz4 /
zstandard packages when installed and falls back to these pure-stdlib
implementations of the PUBLIC formats so the wire client can produce
and consume every Kafka compression type with zero dependencies:

* **snappy** (github.com/google/snappy format description): full
  decoder (literals + all three copy element types, overlap-correct);
  the encoder emits literal-only streams — valid snappy any decoder
  accepts, with no size reduction (install python-snappy for real
  compression).  The xerial block framing the java client wraps
  around MessageSet payloads is handled by the caller (kafka_wire).
* **LZ4 frame** (github.com/lz4/lz4/blob/dev/doc/lz4_Frame_format.md +
  lz4_Block_format.md): full frame+block decoder (linked and
  independent blocks decode into one rolling window) with xxHash32
  header/content checksum verification; the encoder emits frames of
  uncompressed blocks (bit 31 of the block size word), again valid
  for any decoder.
* **zstd** (RFC 8878): encoder emits Raw_Block frames; decoder handles
  Raw and RLE blocks and raises a clear error on Compressed_Block
  (FSE/Huffman entropy decode is what the zstandard package is for).

xxHash32 (github.com/Cyan4973/xxHash spec) is implemented here for the
LZ4 frame checksums.
"""

from __future__ import annotations


class CompressError(Exception):
    pass


# ---------------------------------------------------------------------------
# xxHash32 (needed by the LZ4 frame format's header/content checksums)

_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while i <= n - 16:
            for off, v in ((0, 1), (4, 2), (8, 3), (12, 4)):
                lane = int.from_bytes(data[i + off : i + off + 4], "little")
                if v == 1:
                    v1 = (_rotl32((v1 + lane * _P2) & _M32, 13) * _P1) & _M32
                elif v == 2:
                    v2 = (_rotl32((v2 + lane * _P2) & _M32, 13) * _P1) & _M32
                elif v == 3:
                    v3 = (_rotl32((v3 + lane * _P2) & _M32, 13) * _P1) & _M32
                else:
                    v4 = (_rotl32((v4 + lane * _P2) & _M32, 13) * _P1) & _M32
            i += 16
        h = (
            _rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)
        ) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i <= n - 4:
        h = (h + int.from_bytes(data[i : i + 4], "little") * _P3) & _M32
        h = (_rotl32(h, 17) * _P4) & _M32
        i += 4
    while i < n:
        h = (h + data[i] * _P5) & _M32
        h = (_rotl32(h, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# ---------------------------------------------------------------------------
# snappy block format


def _uvarint_decode(data: bytes, pos: int) -> tuple[int, int]:
    shift = out = 0
    while True:
        if pos >= len(data):
            raise CompressError("snappy: truncated length preamble")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 35:
            raise CompressError("snappy: length preamble overflows 32 bits")


def _uvarint_encode(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """Literal-only snappy stream (valid, uncompressed payload)."""
    out = bytearray(_uvarint_encode(len(data)))
    i = 0
    while i < len(data):
        chunk = data[i : i + 65536]
        i += len(chunk)
        ln = len(chunk) - 1
        if ln < 60:
            out.append(ln << 2)
        else:
            nb = max(1, (ln.bit_length() + 7) // 8)
            out.append((59 + nb) << 2)
            out += ln.to_bytes(nb, "little")
        out += chunk
    return bytes(out)


def snappy_decompress(data: bytes) -> bytes:
    total, pos = _uvarint_decode(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        t = tag & 3
        if t == 0:  # literal
            ln = (tag >> 2) + 1
            if ln > 60:
                nb = ln - 60
                if pos + nb > n:
                    raise CompressError("snappy: truncated literal length")
                ln = int.from_bytes(data[pos : pos + nb], "little") + 1
                pos += nb
            if pos + ln > n:
                raise CompressError("snappy: truncated literal")
            out += data[pos : pos + ln]
            pos += ln
            continue
        if t == 1:  # copy, 1-byte offset
            ln = 4 + ((tag >> 2) & 0x7)
            if pos >= n:
                raise CompressError("snappy: truncated copy")
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif t == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise CompressError(f"snappy: copy offset {off} out of range")
        for _ in range(ln):  # byte-wise: overlapping copies are defined
            out.append(out[-off])
    if len(out) != total:
        raise CompressError(
            f"snappy: declared {total} bytes, decoded {len(out)}"
        )
    return bytes(out)


# ---------------------------------------------------------------------------
# LZ4 frame + block formats

_LZ4_MAGIC = 0x184D2204


def lz4_frame_compress(data: bytes) -> bytes:
    """LZ4 frame of uncompressed blocks (size word bit 31 set)."""
    # FLG: version=01, block independence=1, no block checksum, no
    # content size, no content checksum, no dict
    flg, bd = 0x60, 0x40  # BD: 64 KB block max size
    out = bytearray(_LZ4_MAGIC.to_bytes(4, "little"))
    out.append(flg)
    out.append(bd)
    out.append((xxh32(bytes([flg, bd])) >> 8) & 0xFF)
    i = 0
    while i < len(data):
        chunk = data[i : i + 65536]
        i += len(chunk)
        out += (len(chunk) | 0x80000000).to_bytes(4, "little")
        out += chunk
    out += b"\x00\x00\x00\x00"  # EndMark
    return bytes(out)


def _lz4_block_decompress(block: bytes, window: bytearray) -> None:
    """Decode one LZ4 block into ``window`` (shared across blocks so
    linked-block frames, the lz4 CLI/python default, decode too)."""
    pos, n = 0, len(block)
    while pos < n:
        token = block[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if pos >= n:
                    raise CompressError("lz4: truncated literal length")
                b = block[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if pos + lit > n:
            raise CompressError("lz4: truncated literals")
        window += block[pos : pos + lit]
        pos += lit
        if pos == n:
            return  # last sequence: literals only, no match
        off = int.from_bytes(block[pos : pos + 2], "little")
        pos += 2
        if off == 0 or off > len(window):
            raise CompressError(f"lz4: match offset {off} out of range")
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                if pos >= n:
                    raise CompressError("lz4: truncated match length")
                b = block[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        for _ in range(mlen):
            window.append(window[-off])


def lz4_frame_decompress(data: bytes) -> bytes:
    if int.from_bytes(data[:4], "little") != _LZ4_MAGIC:
        raise CompressError("lz4: bad frame magic")
    flg, bd = data[4], data[5]
    if flg >> 6 != 1:
        raise CompressError(f"lz4: unsupported frame version {flg >> 6}")
    has_bchk = (flg >> 4) & 1
    has_csize = (flg >> 3) & 1
    has_cchk = (flg >> 2) & 1
    has_dict = flg & 1
    pos = 6
    if has_csize:
        pos += 8
    if has_dict:
        pos += 4
    hc = data[pos]
    pos += 1
    if (xxh32(data[4:pos - 1]) >> 8) & 0xFF != hc:
        raise CompressError("lz4: frame header checksum mismatch")
    _ = bd  # block max size: decoder does not need to pre-allocate
    out = bytearray()
    while True:
        if pos + 4 > len(data):
            raise CompressError("lz4: truncated block header")
        word = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        if word == 0:
            break  # EndMark
        size = word & 0x7FFFFFFF
        if pos + size > len(data):
            raise CompressError("lz4: truncated block")
        block = data[pos : pos + size]
        pos += size
        if word >> 31:
            out += block  # stored uncompressed
        else:
            _lz4_block_decompress(block, out)
        if has_bchk:
            if xxh32(block) != int.from_bytes(data[pos : pos + 4], "little"):
                raise CompressError("lz4: block checksum mismatch")
            pos += 4
    if has_cchk:
        if xxh32(bytes(out)) != int.from_bytes(data[pos : pos + 4], "little"):
            raise CompressError("lz4: content checksum mismatch")
        pos += 4
    return bytes(out)


# ---------------------------------------------------------------------------
# zstd frames (RFC 8878) — Raw/RLE blocks only

_ZSTD_MAGIC = 0xFD2FB528


def zstd_frame_compress(data: bytes) -> bytes:
    """zstd frame of Raw_Blocks (RFC 8878 §3.1.1.2.2 Block_Type 0)."""
    out = bytearray(_ZSTD_MAGIC.to_bytes(4, "little"))
    # FHD: FCS_flag=3 (8-byte content size), single_segment=1
    out.append(0xC0 | 0x20)
    out += len(data).to_bytes(8, "little")
    if not data:
        out += (1).to_bytes(3, "little")  # last=1, type=raw, size=0
        return bytes(out)
    i = 0
    while i < len(data):
        chunk = data[i : i + 65536]
        i += len(chunk)
        last = 1 if i >= len(data) else 0
        out += ((len(chunk) << 3) | last).to_bytes(3, "little")
        out += chunk
    return bytes(out)


def zstd_frame_decompress(data: bytes) -> bytes:
    if int.from_bytes(data[:4], "little") != _ZSTD_MAGIC:
        raise CompressError("zstd: bad frame magic")
    fhd = data[4]
    fcs_flag = fhd >> 6
    single_segment = (fhd >> 5) & 1
    has_checksum = (fhd >> 2) & 1
    dict_flag = fhd & 3
    pos = 5
    if not single_segment:
        pos += 1  # window descriptor
    pos += (0, 1, 2, 4)[dict_flag]
    fcs_len = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
    declared = (
        int.from_bytes(data[pos : pos + fcs_len], "little") if fcs_len else None
    )
    if declared is not None and fcs_flag == 1:
        declared += 256  # 2-byte FCS stores size - 256, per the RFC
    pos += fcs_len
    out = bytearray()
    while True:
        if pos + 3 > len(data):
            raise CompressError("zstd: truncated block header")
        hdr = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        last, btype, size = hdr & 1, (hdr >> 1) & 3, hdr >> 3
        if btype == 0:  # Raw_Block
            out += data[pos : pos + size]
            pos += size
        elif btype == 1:  # RLE_Block: one byte, repeated `size` times
            out += data[pos : pos + 1] * size
            pos += 1
        elif btype == 2:
            raise CompressError(
                "zstd: Compressed_Block needs the optional zstandard "
                "package (the stdlib fallback decodes Raw/RLE frames only)"
            )
        else:
            raise CompressError("zstd: reserved block type")
        if last:
            break
    if has_checksum:
        pos += 4  # xxh64 low half: stdlib fallback does not verify
    if declared is not None and len(out) != declared:
        raise CompressError(
            f"zstd: declared {declared} bytes, decoded {len(out)}"
        )
    return bytes(out)
