"""From-scratch media codecs for the multimodal pipeline: PNG and WAV.

The container has no PIL/libjpeg/ffmpeg, but two of the common training
-data media formats are fully decodable with the standard library plus
numpy — PNG's compression is stdlib ``zlib`` and its scanline filters
are pure arithmetic (PNG spec, RFC 2083 §6), WAV PCM is a RIFF header
walk plus a dtype view. These decoders make ``media_features`` REAL for
PNG images and WAV audio; JPEG/MP4 remain the documented swap point for
clusters with the native libs.

Scope (deliberately the well-specified core of each format):

- PNG: 8-bit greyscale / RGB / RGBA / grey+alpha, non-interlaced,
  all five scanline filters (None/Sub/Up/Average/Paeth). The encoder
  (test fixtures + a usable writer) emits filter-0 scanlines.
- WAV: RIFF/WAVE with PCM (format 1) 8/16/32-bit, any channel count.

Everything is deterministic and byte-precise — the round-trip tests
compare full pixel/sample matrices, not summaries.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# PNG color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def png_encode(img: np.ndarray) -> bytes:
    """Minimal PNG writer: 8-bit, non-interlaced, filter 0 scanlines.
    ``img``: (H, W) greyscale or (H, W, C) with C in {2, 3, 4}."""
    a = np.ascontiguousarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8),           # filter byte 0
         a.reshape(h, w * c)], axis=1).tobytes()

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to (H, W) or (H, W, C)
    uint8. Implements the full filter set from the spec; scanlines
    with filters 0/1/2 unfilter vectorized (None / Sub-as-cumsum /
    Up), 3/4 (Average/Paeth) walk pixels — they are sequentially
    defined. Raises ValueError on non-PNG bytes and
    NotImplementedError on the out-of-scope corners (16-bit, palette,
    interlaced)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = []
    while pos + 8 <= len(payload):
        (ln,), tag = struct.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise NotImplementedError(f"bit depth {depth}")
            if color not in _PNG_CHANNELS:
                raise NotImplementedError(f"color type {color}"
                                          " (palette)")
            if interlace:
                raise NotImplementedError("interlaced PNG")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG without IHDR")
    c = _PNG_CHANNELS[color]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    lines = raw[:, 1:].astype(np.int16)   # headroom for the adds
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        ln = lines[y]
        up = out[y - 1].astype(np.int16) if y else np.zeros(
            stride, dtype=np.int16)
        if f == 0:                                   # None
            rec = ln
        elif f == 1:                                 # Sub
            # recon[x] = raw[x] + recon[x-c]: per-channel cumsum mod 256
            rec = ln.reshape(w, c).astype(np.int64).cumsum(axis=0) % 256
            rec = rec.reshape(stride)
        elif f == 2:                                 # Up
            rec = ln + up
        elif f == 3:                                 # Average
            rec = np.empty(stride, dtype=np.int16)
            for x in range(stride):
                left = rec[x - c] if x >= c else 0
                rec[x] = (int(ln[x]) + ((int(left) + int(up[x])) >> 1)) \
                    & 0xFF
        elif f == 4:                                 # Paeth
            rec = np.empty(stride, dtype=np.int16)
            for x in range(stride):
                left = int(rec[x - c]) if x >= c else 0
                ul = int(up[x - c]) if x >= c else 0
                rec[x] = (int(ln[x]) + _paeth(left, int(up[x]), ul)) \
                    & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = (rec & 0xFF).astype(np.uint8)
    img = out.reshape(h, w, c)
    return img[:, :, 0] if c == 1 else img


def wav_encode(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Minimal WAV writer: PCM 16-bit. ``samples``: (n,) mono or
    (n, channels) int16."""
    a = np.ascontiguousarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE PCM to ((n, channels) int32 samples, rate).
    8-bit (unsigned, recentered), 16-bit and 32-bit PCM supported."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)            # chunks are word-aligned
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV without fmt/data chunks")
    audio_fmt, ch, rate, _, _, bits = fmt
    if audio_fmt != 1:
        raise NotImplementedError(f"WAV format {audio_fmt} (non-PCM)")
    if bits == 8:
        s = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    elif bits == 16:
        s = np.frombuffer(data, dtype="<i2").astype(np.int32)
    elif bits == 32:
        s = np.frombuffer(data, dtype="<i4").astype(np.int32)
    else:
        raise NotImplementedError(f"{bits}-bit PCM")
    n = len(s) // ch
    return s[:n * ch].reshape(n, ch), rate


# ---------------------------------------------------------------------------
# Y4M video (YUV4MPEG2): plain-text header + uncompressed frames — the
# interchange format ffmpeg pipes produce; fully parseable without any
# native library. 4:2:0 (default) and 4:4:4 subsampling supported.
# ---------------------------------------------------------------------------

def y4m_encode(frames: np.ndarray, rate: tuple[int, int] = (25, 1)
               ) -> bytes:
    """Minimal Y4M writer: ``frames`` is (n, H, W) uint8 — luma-only
    content written as 4:2:0 with neutral chroma (the fixture/writer
    side of the frame sampler)."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w = f.shape
    if h % 2 or w % 2:
        raise ValueError("4:2:0 needs even dimensions")
    head = f"YUV4MPEG2 W{w} H{h} F{rate[0]}:{rate[1]} Ip A1:1 C420\n"
    chroma = np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
    out = [head.encode("ascii")]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(f[i].tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def y4m_decode(payload: bytes, every: int = 1, max_frames: int = 0
               ) -> tuple[np.ndarray, tuple[int, int]]:
    """Parse a YUV4MPEG2 stream and return (luma frames (n, H, W)
    uint8, (fps_num, fps_den)). ``every`` samples every k-th frame —
    the frame-sample primitive: the un-sampled frames' bytes are
    SKIPPED, not decoded. Chroma planes are skipped entirely (features
    ride the luma)."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M payload")
    nl = payload.index(b"\n")
    w = h = None
    rate = (25, 1)
    chroma = "420"
    for tok in payload[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            a, b = t[1:].split(":")
            rate = (int(a), int(b))
        elif t[0] == "C":
            chroma = t[1:]
    if w is None or h is None:
        raise ValueError("Y4M without W/H")
    if chroma.startswith("420"):
        frame_bytes = h * w + 2 * (h // 2) * (w // 2)
    elif chroma.startswith("444"):
        frame_bytes = 3 * h * w
    else:
        raise NotImplementedError(f"chroma {chroma}")
    frames = []
    pos = nl + 1
    i = 0
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError("bad Y4M frame marker")
        body = fnl + 1
        if i % every == 0 and (not max_frames
                               or len(frames) < max_frames):
            luma = np.frombuffer(payload, dtype=np.uint8,
                                 offset=body, count=h * w)
            frames.append(luma.reshape(h, w))
        pos = body + frame_bytes
        i += 1
    return (np.stack(frames) if frames
            else np.zeros((0, h, w), dtype=np.uint8)), rate


# ---------------------------------------------------------------------------
# Resize: pure-numpy nearest-neighbor (any scale) and exact area mean
# (integer downscale) — the standard training-data normalization step.
# ---------------------------------------------------------------------------

def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of (H, W[, C]) uint8 — one fancy index."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * (h / out_h)).astype(np.int64).clip(0, h - 1)
    xs = (np.arange(out_w) * (w / out_w)).astype(np.int64).clip(0, w - 1)
    return img[ys[:, None], xs[None, :]]


def downscale_area(img: np.ndarray, factor: int) -> np.ndarray:
    """Exact area (mean-pool) downscale by an integer factor; trailing
    rows/cols that don't fill a block are cropped (the ffmpeg 'area'
    semantics for exact multiples)."""
    h, w = img.shape[:2]
    h2, w2 = h // factor, w // factor
    a = img[:h2 * factor, :w2 * factor]
    if a.ndim == 2:
        a = a[:, :, None]
    c = a.shape[2]
    out = a.reshape(h2, factor, w2, factor, c).astype(np.float64) \
        .mean(axis=(1, 3))
    out = np.round(out).astype(np.uint8)
    return out[:, :, 0] if img.ndim == 2 else out
