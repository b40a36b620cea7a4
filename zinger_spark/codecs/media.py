"""Pure-stdlib media codecs: real PNG and WAV decode with no external
image/audio libraries (zlib + struct + wave + numpy only — all baked
into the runtime).

This is the REAL-decode tier of the multimodal column support
(multimodal.py): PNG images and PCM WAV audio decode natively on every
executor; JPEG/MP3/video remain environment-gated behind PIL/ffmpeg.

Scope (and honest limits):
  - PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA), non-interlaced, all five scanline
    filters. Interlaced or 16-bit PNGs raise NotImplementedError.
  - WAV: integer PCM (8/16/32-bit) via the stdlib ``wave`` module.

Encoders exist so resize/transcode round-trips stay pure-stdlib too
(encoded output uses filter 0; any standard reader accepts it).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# Optional PIL tier: auto-detected once per executor import.  When
# present, JPEG (and anything else PIL reads) decodes for real through
# the SAME feature contract as decode_png; when absent, non-PNG images
# stay environment-gated (multimodal.py raises or uses the fake=True
# stub).  Never a hard dependency — the container has no PIL today.
try:  # pragma: no cover - exercised only where PIL is installed
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:
    _PILImage = None
    HAS_PIL = False

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def is_png(data: bytes) -> bool:
    return data[:8] == PNG_SIG


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def is_jpeg(data: bytes) -> bool:
    return data[:3] == b"\xff\xd8\xff"


def _luma_features(px: np.ndarray) -> dict:
    """Shared feature contract for every image decode tier: mean luma
    (0..1) + 8-bin normalized luma histogram, identical math to
    decode_png so the decode tier (stdlib vs PIL) never changes query
    results for the same pixels."""
    if px.ndim == 2:
        px = px[:, :, None]
    if px.shape[2] >= 3:
        luma = (
            0.299 * px[:, :, 0].astype(np.float64)
            + 0.587 * px[:, :, 1].astype(np.float64)
            + 0.114 * px[:, :, 2].astype(np.float64)
        )
    else:
        luma = px[:, :, 0].astype(np.float64)
    hist = np.histogram(luma, bins=8, range=(0.0, 256.0))[0] / luma.size
    return {
        "mean_luma": round(float(luma.mean()) / 255.0, 6),
        "features": [round(float(v), 6) for v in hist],
    }


def decode_pil(data: bytes) -> dict:
    """Decode any PIL-supported image payload (JPEG being the one the
    stdlib tier cannot do) to the decode_png return contract.  Only
    callable when HAS_PIL; multimodal.py routes here after its own
    availability check."""
    if not HAS_PIL:  # pragma: no cover - guarded by callers
        raise NotImplementedError("PIL not installed")
    img = _PILImage.open(io.BytesIO(data))
    img = img.convert("RGB") if img.mode not in ("L", "RGB") else img
    px = np.asarray(img, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    return {
        "width": int(img.width),
        "height": int(img.height),
        "channels": int(px.shape[2]),
        "pixels": px,
        **_luma_features(px),
    }


# ---------------------------------------------------------------------------
# PNG


def _unfilter(raw: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Reverse PNG scanline filtering -> (height, width*channels) u8."""
    stride = width * channels
    bpp = channels
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        f = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).copy()
        pos += stride
        if f == 0:
            cur = line
        elif f == 1:  # Sub: per-channel prefix sum (mod-256 distributes
            # over addition, so cumsum-then-truncate equals the
            # sequential reconstruction); vectorized because adaptive
            # encoders emit Sub constantly on photographic rows
            cur = (
                line.reshape(width, bpp)
                .cumsum(axis=0, dtype=np.uint64)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif f == 2:  # Up (u8 addition wraps mod 256, exactly the spec)
            cur = line + prev
        elif f == 3:  # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            # in-place so later pixels see reconstructed (not filtered)
            # left neighbors, per spec
            cur = line
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(line[x]) + pr) & 0xFF
        else:
            raise ValueError(f"PNG: bad filter byte {f}")
        out[y] = cur
        prev = out[y]
    return out


def decode_png(data: bytes) -> dict:
    """Decode a PNG to pixels + features.

    Returns {width, height, channels, pixels (H,W,C u8 ndarray),
    mean_luma (0..1), features (8-bin normalized luma histogram)}.
    """
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = None
    palette = None
    idat = b""
    while pos + 8 <= len(data):
        ln, ctype = struct.unpack(">I4s", data[pos : pos + 8])
        pos += 8
        chunk = data[pos : pos + ln]
        pos += ln + 4  # skip CRC
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", chunk)
            )
            if bit_depth != 8:
                raise NotImplementedError(f"PNG bit depth {bit_depth} (only 8)")
            if interlace:
                raise NotImplementedError("interlaced PNG unsupported")
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG: missing IHDR")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    rows = _unfilter(zlib.decompress(idat), width, height, channels)
    px = rows.reshape(height, width, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("PNG: palette image without PLTE")
        px = palette[px[:, :, 0]]
        channels = 3
    return {
        "width": int(width),
        "height": int(height),
        "channels": int(channels),
        "pixels": px,
        **_luma_features(px),
    }


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (H, W, C) u8 array (C in {1, 2, 3, 4}) as a PNG
    (filter 0, one zlib stream — valid for any standard reader)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    stride_rows = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), px.reshape(h, w * c)], axis=1
    )  # filter byte 0 per scanline
    idat = zlib.compress(stride_rows.tobytes(), 6)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def resize_nearest(pixels: np.ndarray, target: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resample (H,W,C) -> (th,tw,C). Deterministic,
    pure numpy — the real resize path for PNG payloads."""
    tw, th = target
    h, w = pixels.shape[:2]
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return pixels[ys][:, xs]


# ---------------------------------------------------------------------------
# WAV


def decode_wav(data: bytes) -> dict:
    """Decode integer-PCM WAV to samples + features.

    Returns {sample_rate, n_channels, n_frames, duration_ms,
    samples (float64 ndarray in [-1, 1], first channel), rms}.
    """
    if not is_wav(data):
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    with wave.open(io.BytesIO(data), "rb") as f:
        rate = f.getframerate()
        n_ch = f.getnchannels()
        n_frames = f.getnframes()
        width = f.getsampwidth()
        raw = f.readframes(n_frames)
    if width == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # u8 PCM is unsigned, offset-128
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 4:
        arr = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"WAV sample width {width} bytes")
    samples = arr[::n_ch] if n_ch > 1 else arr  # first channel
    duration_ms = int(round(n_frames * 1000.0 / rate)) if rate else 0
    rms = float(np.sqrt(np.mean(samples**2))) if samples.size else 0.0
    return {
        "sample_rate": int(rate),
        "n_channels": int(n_ch),
        "n_frames": int(n_frames),
        "duration_ms": duration_ms,
        "samples": samples,
        "rms": round(rms, 6),
    }


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode float samples in [-1, 1] as 16-bit mono PCM WAV."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    ints = np.round(pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(ints.tobytes())
    return buf.getvalue()


def wav_chunk_features(samples: np.ndarray, rate: int, chunk_ms: int, idx: int) -> dict:
    """Features for one fixed-length chunk of a decoded WAV: rms, mean
    |x|, peak, zero-crossing rate + a 9-bin |x| histogram (13 dims,
    MFCC-shaped vector length)."""
    start = int(idx * chunk_ms * rate / 1000)
    end = int((idx + 1) * chunk_ms * rate / 1000)
    seg = samples[start:end]
    if seg.size == 0:
        return {"rms": 0.0, "features": [0.0] * 13}
    rms = float(np.sqrt(np.mean(seg**2)))
    mean_abs = float(np.mean(np.abs(seg)))
    peak = float(np.max(np.abs(seg)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(seg).astype(np.int8))))) if seg.size > 1 else 0.0
    hist = np.histogram(np.abs(seg), bins=9, range=(0.0, 1.0))[0] / seg.size
    feats = [rms, mean_abs, peak, zcr] + [float(v) for v in hist]
    return {"rms": round(rms, 6), "features": [round(v, 6) for v in feats]}


# ---------------------------------------------------------------------------
# Perceptual hashes (image near-dup)


def _luma_plane(px: np.ndarray) -> np.ndarray:
    if px.ndim == 2:
        return px.astype(np.float64)
    if px.shape[2] >= 3:
        return (
            0.299 * px[:, :, 0].astype(np.float64)
            + 0.587 * px[:, :, 1].astype(np.float64)
            + 0.114 * px[:, :, 2].astype(np.float64)
        )
    return px[:, :, 0].astype(np.float64)


def dhash(px: np.ndarray, size: int = 8) -> int:
    """Difference hash: luma -> nearest-resize to (size x size+1) ->
    bit = left pixel brighter than its right neighbor, row-major.
    64 bits at the default size; robust to re-encode/resize, flips a
    few bits under small edits — pair via
    operators.dedup.hamming_dup_pairs."""
    luma = _luma_plane(px)
    small = resize_nearest(luma[:, :, None], (size + 1, size))[:, :, 0]
    bits = (small[:, 1:] < small[:, :-1]).flatten()
    return _bits_to_signed64(bits)


def _bits_to_signed64(bits: np.ndarray) -> int:
    """Pack <=64 bits little-endian into a SIGNED 64-bit int (two's
    complement), so the value survives a Spark LongType column."""
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    return out - (1 << 64) if out >= (1 << 63) else out


def ahash(px: np.ndarray, size: int = 8) -> int:
    """Average hash: luma -> size x size -> bit = pixel above the mean.
    Cheaper and coarser than dhash; same pairing machinery."""
    luma = _luma_plane(px)
    small = resize_nearest(luma[:, :, None], (size, size))[:, :, 0]
    mean = small.mean()
    return _bits_to_signed64((small > mean).flatten())


def audio_fingerprint(samples: np.ndarray, rate: int, bits: int = 64) -> int:
    """Spectral-contour fingerprint (Haitsma–Kalker 2002 simplified):
    frame the signal, FFT each frame, average energy into bits+1
    log-spaced bands across frames, and take the sign of adjacent-band
    energy DELTAS as the bit string.  Robust to volume scaling (deltas
    compare ratios of shared energy), additive low-level noise, and
    small trims; different spectral shapes land far apart.  Pair with
    operators.dedup.hamming_dup_pairs like any other b-bit sketch.
    """
    x = np.asarray(samples, dtype=np.float64)
    frame = 2048
    hop = 1024
    if x.size < frame:
        x = np.pad(x, (0, frame - x.size))
    n_frames = 1 + (x.size - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    window = np.hanning(frame)
    spec = np.abs(np.fft.rfft(x[idx] * window, axis=1)) ** 2
    # log-spaced band edges over 300..min(6000, nyquist*0.9) Hz — the
    # speech/music energy region HK use
    nyq = rate / 2.0
    lo, hi = 300.0, min(6000.0, 0.9 * nyq)
    edges = np.geomspace(lo, hi, bits + 2)
    bin_hz = rate / frame
    band_e = np.empty(bits + 1)
    for m in range(bits + 1):
        a = int(edges[m] / bin_hz)
        b = max(int(edges[m + 1] / bin_hz), a + 1)
        band_e[m] = spec[:, a:b].mean()
    deltas = band_e[:-1] - band_e[1:]
    return _bits_to_signed64(deltas > 0)


# --------------------------------------------------------------------------
# ZVID: a deliberately-simple video container (length-prefixed PNG
# frames + a fixed frame rate) so the VIDEO pipeline — frame sampling,
# per-frame perceptual hashing, near-dup pair joins — runs END TO END
# with a real decoder on a box with no ffmpeg.  Real-world containers
# (mp4/webm) slot in at exactly one seam: zvid_index/decode_zvid_frame
# below become a demuxer call; every schema, kernel signature, and join
# downstream is container-agnostic.  Layout:
#   b"ZVID" | u16 fps | u32 nframes | nframes x (u32 len | PNG bytes)

ZVID_MAGIC = b"ZVID"


def is_zvid(data: bytes) -> bool:
    return data[:4] == ZVID_MAGIC


def encode_zvid(frames: list[np.ndarray], fps: int = 4) -> bytes:
    if not frames:
        raise ValueError("encode_zvid needs at least one frame")
    if not 1 <= fps <= 65535:
        raise ValueError("fps out of range")
    out = [ZVID_MAGIC, struct.pack("<HI", fps, len(frames))]
    for px in frames:
        png = encode_png(px)
        out.append(struct.pack("<I", len(png)))
        out.append(png)
    return b"".join(out)


def zvid_index(data: bytes) -> tuple[int, list[tuple[int, int]]]:
    """Parse the container directory WITHOUT decoding any frame:
    returns (fps, [(offset, length), ...]).  Frame sampling reads only
    the sampled frames' byte ranges — the cheap-seek property a real
    demuxer gives you, kept here so the sampling kernel's cost model
    (decode ∝ sampled frames, not stored frames) is honest."""
    if not is_zvid(data):
        raise ValueError("not a ZVID payload")
    fps, n = struct.unpack_from("<HI", data, 4)
    off = 10
    spans: list[tuple[int, int]] = []
    for _ in range(n):
        if off + 4 > len(data):
            raise ValueError("truncated ZVID directory")
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        if off + ln > len(data):
            raise ValueError("truncated ZVID frame")
        spans.append((off, ln))
        off += ln
    return fps, spans


def decode_zvid_frame(data: bytes, span: tuple[int, int]) -> dict:
    off, ln = span
    return decode_png(data[off : off + ln])
