"""Pure-stdlib media codecs: PNG (zlib + numpy unfiltering) and WAV (wave).

The reference decodes images with native libraries (reference:
loaders/ImageNetLoaderUtils.scala JPEG decode via javax.imageio;
utils/images/ImageConversions.scala). This container has no PIL/opencv/
soundfile, so the real-decode path is built on what IS here: PNG is
zlib-compressed filtered scanlines (RFC 2083) — fully decodable with
``zlib`` + numpy; WAV is stdlib ``wave``. JPEG needs a Huffman+DCT
implementation and stays a clearly-marked NotImplementedError hook.

These run inside Arrow-batched ``mapInPandas`` kernels (one Python call
per payload). At 100 TB the per-payload cost is the codec itself, not the
framework: scanline unfiltering is vectorized per row-lane (Sub = cumsum
mod 256; Up = vectorized add), with a per-pixel loop only for
Average/Paeth rows. A production cluster would swap `_decode_png` for a
wheel-installed native codec behind the same function signature; every
schema/partitioning/null-propagation property is identical.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# channels per PNG color type (3 = palette: 1 index byte/pixel pre-expansion)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff_media(payload: bytes) -> str:
    """Best-effort container sniff from magic bytes."""
    if payload.startswith(PNG_SIG):
        return "png"
    if payload.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload.startswith(b"ID3") or (
        len(payload) >= 2 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0
    ):
        return "mp3"
    if payload.startswith(b"OggS"):
        return "ogg"
    if payload.startswith(b"fLaC"):
        return "flac"
    return "unknown"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters. Returns (height, stride) uint8.

    Fast paths: None is a copy, Sub is a cumulative sum mod 256 per
    byte-lane, Up is one vectorized add against the prior row. Average and
    Paeth keep a per-byte loop (their recurrences mix the running row with
    the row above, so no closed form) — they are rare in encoder output.
    """
    expect = height * (stride + 1)
    if len(raw) < expect:
        raise ValueError(f"PNG data truncated: {len(raw)} < {expect}")
    data = np.frombuffer(raw[:expect], dtype=np.uint8).reshape(height, stride + 1)
    filters = data[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        line = data[y, 1:].copy()
        f = int(filters[y])
        if f == 0:
            rec = line
        elif f == 1:  # Sub: per-lane cumsum mod 256 (uint8 wraps natively)
            rec = line.reshape(-1, bpp).cumsum(axis=0, dtype=np.uint64)
            rec = (rec & 0xFF).astype(np.uint8).reshape(-1)
        elif f == 2:  # Up
            rec = line + prior
        elif f == 3:  # Average
            rec = line
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                rec[i] = (int(line[i]) + ((a + int(prior[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = line
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                c = int(prior[i - bpp]) if i >= bpp else 0
                rec[i] = (int(line[i]) + _paeth(a, int(prior[i]), c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f} on row {y}")
        out[y] = rec
        prior = out[y]
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, c) float32 in [0, 1].

    Supports bit depths 8 and 16, color types 0/2/3/4/6 (palette expands
    to RGB), non-interlaced only (Adam7 raises). Raises ValueError on
    malformed input — callers in the Spark kernels map that to a null
    image so one corrupt payload can't fail a 100 TB job.
    """
    if not payload.startswith(PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_SIG)
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # skip CRC (integrity is the transport's job here)
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if bit_depth not in (8, 16) or (color_type == 3 and bit_depth != 8):
        raise ValueError(f"unsupported PNG bit depth {bit_depth}")
    channels = _PNG_CHANNELS[color_type]
    sampbytes = bit_depth // 8
    bpp = channels * sampbytes
    stride = width * bpp
    raw = zlib.decompress(bytes(idat))
    rows = _unfilter(raw, height, stride, bpp)
    if bit_depth == 16:
        arr = rows.reshape(height, width, channels, 2).astype(np.uint16)
        arr = ((arr[..., 0] << 8) | arr[..., 1]).astype(np.float32) / 65535.0
    else:
        arr = rows.reshape(height, width, channels).astype(np.float32) / 255.0
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        idx = (arr[..., 0] * 255.0).round().astype(np.intp)
        if idx.max(initial=0) >= len(palette):
            raise ValueError("palette index out of range")
        arr = palette[idx].astype(np.float32) / 255.0
    return arr


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w) or (h, w, c) array -> PNG bytes (8-bit, filter 0).

    Accepts float in [0, 1] or uint8; c in {1, 3, 4}. Minimal writer for
    tests/fixtures — one IDAT, no ancillary chunks.
    """
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.dtype != np.uint8:
        a = np.clip(np.round(np.asarray(a, dtype=np.float64) * 255.0), 0, 255).astype(
            np.uint8
        )
    h, w, c = a.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    scan = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan, 9))
        + chunk(b"IEND", b"")
    )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, mono float32 PCM in [-1, 1]).

    stdlib ``wave`` handles the RIFF parsing; sample widths 1 (unsigned),
    2, 3 and 4 bytes (signed) are normalized; multi-channel audio is
    averaged to mono. Raises on malformed/compressed WAV (mapped to a
    null audio struct by the Spark kernel).
    """
    with wave.open(io.BytesIO(payload), "rb") as f:
        sr = f.getframerate()
        nch = f.getnchannels()
        sw = f.getsampwidth()
        frames = f.readframes(f.getnframes())
    if sw == 1:
        x = np.frombuffer(frames, dtype=np.uint8).astype(np.float32)
        x = (x - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 3:
        b = np.frombuffer(frames, dtype=np.uint8).reshape(-1, 3).astype(np.uint32)
        v = (b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)).astype(np.int32)
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        x = v.astype(np.float32) / float(1 << 23)
    elif sw == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float32) / float(1 << 31)
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return sr, x


def encode_wav(pcm: np.ndarray, sample_rate: int, n_channels: int = 1) -> bytes:
    """float PCM in [-1, 1] -> 16-bit WAV bytes (test/fixture helper).

    For n_channels > 1 the mono input is duplicated into each channel.
    """
    x = np.clip(np.asarray(pcm, dtype=np.float64), -1.0, 1.0)
    q = np.round(x * 32767.0).astype("<i2")
    if n_channels > 1:
        q = np.repeat(q[:, None], n_channels, axis=1).reshape(-1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(n_channels)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(q.tobytes())
    return buf.getvalue()
