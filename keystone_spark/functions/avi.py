"""MJPEG-in-AVI container support (pure stdlib).

The reference has no video surface at all (SURVEY §2.1); this makes
``frame_sample(decode='real')`` work for ONE real container — AVI files
whose video stream is Motion-JPEG, i.e. every '00dc' chunk is a complete
baseline/progressive JPEG that the existing ``codecs.decode_jpeg``
decoder handles. Anything else (H.264 in MP4, VP9 in WebM, ...) keeps
the honest ffmpeg NotImplementedError hook in operators/multimodal.py —
interframe codecs are not decodable without a native library.

The RIFF walk is a dumb recursive chunk scan: AVI is chunk-aligned, so
frames are located without trusting the optional idx1 index (many
MJPEG writers omit or corrupt it). The writer emits a minimal spec-shaped
file (hdrl: avih + one 'vids'/'MJPG' strl; movi: 00dc chunks) so tests
can build fixtures without any video tooling in the container.
"""

from __future__ import annotations

import struct

__all__ = ["parse_avi_mjpeg_frames", "encode_avi_mjpeg"]

_JPEG_SOI = b"\xff\xd8\xff"


def _walk_chunks(data: bytes, pos: int, end: int, out: list[bytes]) -> None:
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        size = int.from_bytes(data[pos + 4:pos + 8], "little")
        if pos + 8 + size > len(data):
            raise ValueError("AVI chunk overruns file")
        if fourcc == b"LIST":
            _walk_chunks(data, pos + 12, pos + 8 + size, out)
        elif fourcc in (b"00dc", b"00db"):
            out.append(data[pos + 8:pos + 8 + size])
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def parse_avi_mjpeg_frames(payload: bytes) -> list[bytes]:
    """AVI bytes -> list of per-frame JPEG payloads (stream 0).

    Raises ValueError if the payload is not RIFF/AVI or its frames are
    not JPEGs (-> the caller's unsupported-codec path)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ') container")
    frames: list[bytes] = []
    _walk_chunks(payload, 12, len(payload), frames)
    if not frames:
        raise ValueError("AVI contains no stream-0 video chunks")
    if not all(f.startswith(_JPEG_SOI) for f in frames):
        raise ValueError("AVI video stream is not MJPEG")
    return frames


def encode_avi_mjpeg(
    jpeg_frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """JPEG payloads -> minimal MJPEG AVI (fixture helper)."""

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + len(body).to_bytes(4, "little") + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    n = len(jpeg_frames)
    buf = max((len(f) for f in jpeg_frames), default=0)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        buf * fps,         # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # AVIF_HASINDEX off; 0x10 = was captured (benign)
        n, 0, 1, buf,
        width, height,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids", b"MJPG",
        0, 0, 0, 0,
        1, fps,            # dwScale / dwRate -> fps
        0, n, buf, 0, -1,  # start, length, bufsize, quality, sampleSize(-1?0)
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + len(riff_body).to_bytes(4, "little") + riff_body
