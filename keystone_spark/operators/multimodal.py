"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference's image stack (loaders/CifarLoader.scala,
loaders/ImageNetLoader.scala, utils/Image.scala#ImageMetadata) decodes
bytes into dense pixel arrays per record. Spark-first: media rows are a
struct of ``binary`` payload + metadata; decode / resize / frame-sample /
feature-extract run as Arrow-batched ``mapInPandas`` stages.

Decode modes: ``decode=fake`` produces a deterministic pseudo-image
derived from the payload's content hash (schema, batching, partitioning
and UDF signatures exercised without any codec); ``decode=real`` runs
the pure-numpy/stdlib codecs in functions/codecs.py — PNG (zlib + numpy
unfiltering), JPEG (baseline AND progressive), WAV. Formats needing a
native library that is not in this container (mp3/ogg/flac; video) keep
honest NotImplementedError hooks — ``errors='null'`` converts those to
quarantined NULL rows (optionally counted via a Spark accumulator) so
one stray exotic file cannot fail a 100 TB ingest, while corrupt
payloads are governed separately by ``on_error``.

Scale notes: binary payloads make wide rows — keep media in its own table
keyed by content hash, read with ``spark.read.format("binaryFile")`` or a
parquet of (id, bytes, meta), and repartition by size so Arrow batches
stay under spark.sql.execution.arrow.maxRecordsPerBatch * avg_payload.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

# mirror of Spark's built-in ImageSchema struct, array-typed for Arrow
IMAGE_STRUCT = StructType(
    [
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("data", ArrayType(FloatType())),
    ]
)


def _fake_decode(payload: bytes, h: int = 8, w: int = 8, c: int = 3) -> np.ndarray:
    """Deterministic stand-in for a codec: seed a PRNG from the content
    hash so the 'pixels' are stable across runs/executors."""
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.random(size=(h, w, c), dtype=np.float32)


def decode_images(
    df: DataFrame,
    payload_col: str = "content",
    out_col: str = "image",
    height: int = 8,
    width: int = 8,
    channels: int = 3,
    decode: str = "fake",
    on_error: str = "null",
    errors: str = "strict",
    quarantine=None,
) -> DataFrame:
    """binary payload -> IMAGE_STRUCT column.

    decode='real' decodes PNG and JPEG (baseline AND progressive) via
    functions/codecs.py (output keeps the image's NATIVE dims —
    height/width/channels params apply to the fake path only; chain
    ``resize_images`` to normalize). Reference parity:
    loaders/ImageNetLoaderUtils.scala decodes JPEG via javax.imageio.

    Error policy, two independent axes:
    - ``on_error``: corrupt payloads (codec ValueError). 'null' (default)
      -> NULL image; 'raise' surfaces the error for debugging.
    - ``errors``: UNSUPPORTED formats (codec NotImplementedError —
      arithmetic/lossless/12-bit JPEG). 'strict' (default) raises — you
      find out your corpus needs a codec; 'null' quarantines the row as a
      NULL image so one stray exotic file cannot kill a 100 TB ingest.
    ``quarantine``: optional Spark accumulator (sc.accumulator(0));
    incremented once per quarantined/nulled payload on either axis, so
    the job can report how much of the corpus was dropped.
    """
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")
    if on_error not in ("null", "raise"):
        raise ValueError("on_error must be 'null' or 'raise'")
    if errors not in ("strict", "null"):
        raise ValueError("errors must be 'strict' or 'null'")

    fields = [f for f in df.schema.fields]
    out_schema = StructType(fields + [StructField(out_col, IMAGE_STRUCT)])
    cols = [f.name for f in fields]

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from keystone_spark.functions.codecs import (
            decode_jpeg,
            decode_png,
            sniff_media,
        )

        for pdf in batches:
            if pdf.empty:
                continue
            imgs = []
            for payload in pdf[payload_col]:
                if payload is None:  # null media column -> null image
                    imgs.append(None)
                    continue
                raw = bytes(payload)
                if decode == "real":
                    codec = decode_jpeg if sniff_media(raw) == "jpeg" else decode_png
                    try:
                        arr = codec(raw)
                    except ValueError:
                        if on_error == "raise":
                            raise
                        if quarantine is not None:
                            quarantine.add(1)
                        imgs.append(None)  # corrupt/unknown -> null image
                        continue
                    except NotImplementedError:
                        if errors == "strict":
                            raise
                        if quarantine is not None:
                            quarantine.add(1)
                        imgs.append(None)  # unsupported format -> null image
                        continue
                    h, w, c = arr.shape
                    imgs.append(
                        {"height": int(h), "width": int(w), "n_channels": int(c),
                         "data": arr.ravel().tolist()}
                    )
                    continue
                arr = _fake_decode(raw, height, width, channels)
                imgs.append(
                    {
                        "height": height,
                        "width": width,
                        "n_channels": channels,
                        "data": arr.ravel().tolist(),
                    }
                )
            pdf = pdf.copy()
            pdf[out_col] = imgs
            yield pdf[cols + [out_col]]

    return df.mapInPandas(part, out_schema)


def resize_images(
    df: DataFrame,
    height: int,
    width: int,
    image_col: str = "image",
    out_col: str = "resized",
) -> DataFrame:
    """Bilinear resize to (height, width) — normalizes natively-sized
    decoded images to the fixed shape downstream featurizers expect
    (reference: the ImageNet pipeline's resize step in
    pipelines/images/imagenet/ImageNetSiftLcsFV.scala preprocessing).
    Pure-numpy gather (two axis-aligned lerps), Arrow-batched."""
    fields = [f for f in df.schema.fields]
    out_schema = StructType(fields + [StructField(out_col, IMAGE_STRUCT)])
    cols = [f.name for f in fields]

    def one(arr: np.ndarray) -> np.ndarray:
        h, w = arr.shape[:2]
        # align-corners=False sampling (pixel centers), edge-clamped
        ys = (np.arange(height) + 0.5) * h / height - 0.5
        xs = (np.arange(width) + 0.5) * w / width - 0.5
        y0 = np.clip(np.floor(ys).astype(np.intp), 0, h - 1)
        x0 = np.clip(np.floor(xs).astype(np.intp), 0, w - 1)
        y1 = np.minimum(y0 + 1, h - 1)
        x1 = np.minimum(x0 + 1, w - 1)
        wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
        wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
        top = arr[y0][:, x0] * (1 - wx) + arr[y0][:, x1] * wx
        bot = arr[y1][:, x0] * (1 - wx) + arr[y1][:, x1] * wx
        return top * (1 - wy) + bot * wy

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for img in pdf[image_col]:
                if img is None:
                    out.append(None)
                    continue
                arr = np.asarray(img["data"], dtype=np.float64).reshape(
                    img["height"], img["width"], img["n_channels"]
                )
                r = one(arr)
                out.append(
                    {"height": height, "width": width,
                     "n_channels": int(arr.shape[2]),
                     "data": r.astype(np.float32).ravel().tolist()}
                )
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf[cols + [out_col]]

    return df.mapInPandas(part, out_schema)


def image_features(
    df: DataFrame,
    image_col: str = "image",
    out_col: str = "img_features",
) -> DataFrame:
    """Per-channel mean/std features (the LCSExtractor-style statistic
    kernel — reference: nodes/images/LCSExtractor.scala), numpy per batch."""
    fields = [f for f in df.schema.fields]
    out_schema = StructType(fields + [StructField(out_col, ArrayType(DoubleType()))])
    cols = [f.name for f in fields]

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = []
            for img in pdf[image_col]:
                if img is None:
                    feats.append(None)
                    continue
                arr = np.asarray(img["data"], dtype=np.float64).reshape(
                    img["height"], img["width"], img["n_channels"]
                )
                feats.append(
                    np.concatenate([arr.mean(axis=(0, 1)), arr.std(axis=(0, 1))]).tolist()
                )
            pdf = pdf.copy()
            pdf[out_col] = feats
            yield pdf[cols + [out_col]]

    return df.mapInPandas(part, out_schema)


def grayscale(df: DataFrame, image_col: str = "image", out_col: str = "gray") -> DataFrame:
    """RGB -> luminance (reference: nodes/images/GrayScaler.scala),
    ITU-R 601 weights, numpy per batch."""
    fields = [f for f in df.schema.fields]
    out_schema = StructType(fields + [StructField(out_col, IMAGE_STRUCT)])
    cols = [f.name for f in fields]
    wts = np.array([0.299, 0.587, 0.114])

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for img in pdf[image_col]:
                if img is None:
                    out.append(None)
                    continue
                h, w, c = img["height"], img["width"], img["n_channels"]
                arr = np.asarray(img["data"], dtype=np.float64).reshape(h, w, c)
                g = arr @ wts[:c] if c == 3 else arr.mean(axis=2)
                out.append(
                    {"height": h, "width": w, "n_channels": 1,
                     "data": g.astype(np.float32).ravel().tolist()}
                )
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf[cols + [out_col]]

    return df.mapInPandas(part, out_schema)


def frame_sample(
    df: DataFrame,
    payload_col: str = "content",
    n_frames: int = 4,
    out_col: str = "frames",
    decode: str = "fake",
) -> DataFrame:
    """video binary -> up to n_frames decoded frames, evenly sampled over
    the video's timeline (1->N via the batched mapInPandas kernel;
    ``frame_idx`` is the frame's ORIGINAL index in the stream, so samples
    are traceable back to a timestamp via fps).

    decode='real' decodes MJPEG-in-AVI containers for real: RIFF chunk
    walk (functions/avi.py) -> per-frame JPEG payloads -> the existing
    pure-numpy ``decode_jpeg``. Other containers/codecs (H.264, VP9, ...)
    raise NotImplementedError — interframe codecs need ffmpeg, which is
    not in this container."""
    fields = [f for f in df.schema.fields]
    out_schema = StructType(
        fields
        + [
            StructField("frame_idx", LongType()),
            StructField(out_col, IMAGE_STRUCT),
        ]
    )
    cols = [f.name for f in fields]

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from keystone_spark.functions.avi import parse_avi_mjpeg_frames
        from keystone_spark.functions.codecs import decode_jpeg

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[payload_col])
                if decode == "real":
                    try:
                        jpegs = parse_avi_mjpeg_frames(payload)
                    except ValueError as exc:
                        raise NotImplementedError(
                            "real video decode beyond MJPEG-in-AVI requires "
                            f"ffmpeg (not in container): {exc}"
                        ) from exc
                    take = np.unique(
                        np.linspace(
                            0, len(jpegs) - 1, min(n_frames, len(jpegs))
                        ).round().astype(int)
                    )
                    for k in take.tolist():
                        arr = decode_jpeg(jpegs[k])
                        if arr.ndim == 2:
                            arr = arr[:, :, None]
                        r = {c: row[c] for c in cols}
                        r["frame_idx"] = int(k)
                        r[out_col] = {
                            "height": arr.shape[0],
                            "width": arr.shape[1],
                            "n_channels": arr.shape[2],
                            "data": arr.ravel().tolist(),
                        }
                        rows.append(r)
                    continue
                for k in range(n_frames):
                    arr = _fake_decode(payload + k.to_bytes(4, "little"))
                    r = {c: row[c] for c in cols}
                    r["frame_idx"] = k
                    r[out_col] = {
                        "height": arr.shape[0],
                        "width": arr.shape[1],
                        "n_channels": arr.shape[2],
                        "data": arr.ravel().tolist(),
                    }
                    rows.append(r)
            yield pd.DataFrame(rows, columns=cols + ["frame_idx", out_col])

    return df.mapInPandas(part, out_schema)


AUDIO_STRUCT = StructType(
    [
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("pcm", ArrayType(FloatType())),
    ]
)


def decode_audio(
    df: DataFrame,
    payload_col: str = "content",
    out_col: str = "audio",
    sample_rate: int = 16000,
    n_samples: int = 1024,
    decode: str = "fake",
    on_error: str = "null",
    errors: str = "strict",
    quarantine=None,
) -> DataFrame:
    """binary payload -> AUDIO_STRUCT (sample_rate, n_samples, float PCM).

    decode='real' decodes PCM WAV via stdlib ``wave`` and FLAC via the
    pure-numpy decoder (functions/flac.py) — multi-channel averaged to
    mono, native sample rate/length kept; sample_rate / n_samples params
    apply to the fake path only. 'fake' derives deterministic PCM from
    the content hash so plumbing, schema and batch shape are testable
    without any codec.

    Error policy, two independent axes (same contract as decode_images):
    - ``on_error``: corrupt payloads. 'null' (default) -> NULL audio;
      'raise' surfaces the error.
    - ``errors``: UNSUPPORTED formats (mp3/ogg — no native codec in
      container; transcode to PCM WAV/FLAC upstream). 'strict' (default)
      raises NotImplementedError; 'null' quarantines the row as NULL so
      one stray compressed file cannot kill a 100 TB ingest.
    ``quarantine``: optional Spark accumulator counting nulled rows.
    """
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")
    if on_error not in ("null", "raise"):
        raise ValueError("on_error must be 'null' or 'raise'")
    if errors not in ("strict", "null"):
        raise ValueError("errors must be 'strict' or 'null'")

    fields = [f for f in df.schema.fields]
    out_schema = StructType(fields + [StructField(out_col, AUDIO_STRUCT)])
    cols = [f.name for f in fields]

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from keystone_spark.functions.codecs import decode_wav, sniff_media
        from keystone_spark.functions.flac import decode_flac

        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for payload in pdf[payload_col]:
                if payload is None:
                    out.append(None)
                    continue
                raw = bytes(payload)
                if decode == "real":
                    kind = sniff_media(raw)
                    if kind in ("mp3", "ogg"):
                        if errors == "strict":
                            raise NotImplementedError(
                                f"{kind} decode requires a native codec "
                                "(soundfile/ffmpeg, not in container); "
                                "transcode to PCM WAV or FLAC upstream"
                            )
                        if quarantine is not None:
                            quarantine.add(1)
                        out.append(None)  # unsupported format -> null audio
                        continue
                    try:
                        if kind == "flac":
                            sr, pcm = decode_flac(raw)
                        else:
                            sr, pcm = decode_wav(raw)
                    except Exception:
                        if on_error == "raise":
                            raise
                        if quarantine is not None:
                            quarantine.add(1)
                        out.append(None)  # corrupt/unknown -> null audio
                        continue
                    out.append(
                        {"sample_rate": int(sr), "n_samples": int(len(pcm)),
                         "pcm": pcm.tolist()}
                    )
                    continue
                digest = hashlib.sha256(raw).digest()
                rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
                pcm = (rng.random(n_samples, dtype=np.float32) * 2 - 1)
                out.append(
                    {"sample_rate": sample_rate, "n_samples": n_samples,
                     "pcm": pcm.tolist()}
                )
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf[cols + [out_col]]

    return df.mapInPandas(part, out_schema)


def audio_features(
    df: DataFrame,
    audio_col: str = "audio",
    out_col: str = "audio_features",
) -> DataFrame:
    """[rms, zero_crossing_rate, spectral_centroid_hz] per clip — the
    PaddedFFT-style numeric kernel (reference: nodes/stats/PaddedFFT.scala)
    applied to audio frames, numpy FFT per Arrow batch."""
    fields = [f for f in df.schema.fields]
    out_schema = StructType(fields + [StructField(out_col, ArrayType(DoubleType()))])
    cols = [f.name for f in fields]

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = []
            for a in pdf[audio_col]:
                if a is None:  # undecodable/null audio -> null features
                    feats.append(None)
                    continue
                x = np.asarray(a["pcm"], dtype=np.float64)
                sr = a["sample_rate"]
                rms = float(np.sqrt(np.mean(x**2)))
                zcr = float(np.mean(np.signbit(x[:-1]) != np.signbit(x[1:])))
                spec = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(len(x), d=1.0 / sr)
                centroid = float((freqs * spec).sum() / max(spec.sum(), 1e-12))
                feats.append([rms, zcr, centroid])
            pdf = pdf.copy()
            pdf[out_col] = feats
            yield pdf[cols + [out_col]]

    return df.mapInPandas(part, out_schema)


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (the JPEG/pHash transform)."""
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    c = np.cos(np.pi * (2 * x + 1) * k / (2 * n))
    c[0] *= 1.0 / np.sqrt(2)
    return c * np.sqrt(2.0 / n)


def phash64(
    df: DataFrame,
    image_col: str = "image",
    out_col: str = "phash",
    resize: int = 32,
    hash_size: int = 8,
) -> DataFrame:
    """64-bit perceptual hash (classic pHash) per image — the image-side
    near-dup signature (LAION-style multimodal dedup): grayscale ->
    area-resize to ``resize``² -> 2-D DCT-II -> keep the top-left
    ``hash_size``² low-frequency block -> bit i = coefficient > median.
    Robust to recompression/resizing/small edits; Hamming distance on
    the LongType output measures perceptual closeness, so the banded
    64-bit candidate machinery (dedup.hash64_candidates) applies as-is.

    One Arrow pass, numpy matmuls per batch; emits a plain LongType so
    everything downstream (banding, bit_count verify, joins) is codegen.
    """
    fields = [f for f in df.schema.fields]
    out_schema = StructType(fields + [StructField(out_col, LongType())])
    cols = [f.name for f in fields]
    wts = np.array([0.299, 0.587, 0.114])
    D = _dct_matrix(resize)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            hashes = []
            for img in pdf[image_col]:
                if img is None:
                    hashes.append(None)
                    continue
                h, w, c = img["height"], img["width"], img["n_channels"]
                arr = np.asarray(img["data"], dtype=np.float64).reshape(h, w, c)
                g = arr @ wts[:c] if c == 3 else arr.mean(axis=2)
                # deterministic resize: sample the source at each target
                # cell's center (nearest) — hole-free for up- AND
                # down-scaling, and scale-aligned so a 2x copy maps to
                # the same source pixels (the invariance pHash needs)
                ys = ((np.arange(resize) + 0.5) * h / resize).astype(int).clip(max=h - 1)
                xs = ((np.arange(resize) + 0.5) * w / resize).astype(int).clip(max=w - 1)
                small = g[ys[:, None], xs[None, :]]
                t = D @ small @ D.T
                block = t[:hash_size, :hash_size].ravel()
                med = np.median(block)
                bits = block > med
                val = 0
                for bit in bits:
                    val = (val << 1) | int(bit)
                # wrap to signed 64-bit for LongType
                if val >= 1 << 63:
                    val -= 1 << 64
                hashes.append(val)
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(hashes, dtype="object")
            yield pdf[cols + [out_col]]

    return df.mapInPandas(part, out_schema)


def _mel_filterbank(n_mels: int, n_fft: int, sr: float) -> np.ndarray:
    """Triangular HTK-mel filterbank, (n_mels, n_fft//2 + 1)."""
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    n_bins = n_fft // 2 + 1
    mel_pts = np.linspace(0.0, hz_to_mel(sr / 2.0), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    bins = np.floor((n_fft + 1) * hz_pts / sr).astype(int).clip(max=n_bins - 1)
    fb = np.zeros((n_mels, n_bins))
    for m in range(1, n_mels + 1):
        lo, c, hi = bins[m - 1], bins[m], bins[m + 1]
        if c > lo:
            fb[m - 1, lo:c] = (np.arange(lo, c) - lo) / (c - lo)
        if hi > c:
            fb[m - 1, c:hi] = (hi - np.arange(c, hi)) / (hi - c)
    return fb


def mfcc_features(
    df: DataFrame,
    audio_col: str = "audio",
    out_col: str = "mfcc",
    n_mfcc: int = 13,
    n_mels: int = 26,
    n_fft: int = 512,
    hop: int = 256,
) -> DataFrame:
    """Mel-frequency cepstral coefficients per clip — the real version of
    the speech front-end the reference consumed pre-computed (SURVEY
    §2.1 TimitFeaturesDataLoader ate MFCC-ish frames from disk; this
    computes them from PCM): Hann-windowed framing -> rFFT power
    spectrum -> HTK mel filterbank -> log -> DCT-II -> first ``n_mfcc``
    coefficients, summarized as per-coefficient mean then std over
    frames (2*n_mfcc values per clip, a fixed-width feature row ready
    for the solvers).

    Whole clip batches flow through one Arrow pass; every step is a
    numpy matmul over a (frames, bins) matrix — no per-sample Python.
    Clips shorter than one frame window are zero-padded to ``n_fft``.
    """
    fields = [f for f in df.schema.fields]
    out_schema = StructType(fields + [StructField(out_col, ArrayType(DoubleType()))])
    cols = [f.name for f in fields]
    window = np.hanning(n_fft)
    Dct = _dct_matrix(n_mels)[:n_mfcc]  # orthonormal DCT-II rows

    def one(sr: float, pcm: np.ndarray) -> list:
        fb = _mel_filterbank(n_mels, n_fft, sr)
        if len(pcm) < n_fft:
            pcm = np.pad(pcm, (0, n_fft - len(pcm)))
        n_frames = 1 + (len(pcm) - n_fft) // hop
        idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
        frames = pcm[idx] * window[None, :]
        power = np.abs(np.fft.rfft(frames, axis=1)) ** 2 / n_fft
        mel = power @ fb.T
        logmel = np.log(np.maximum(mel, 1e-10))
        cc = logmel @ Dct.T  # (frames, n_mfcc)
        return np.concatenate([cc.mean(axis=0), cc.std(axis=0)]).tolist()

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = []
            for au in pdf[audio_col]:
                if au is None:
                    feats.append(None)
                    continue
                pcm = np.asarray(au["pcm"], dtype=np.float64)
                feats.append(one(float(au["sample_rate"]), pcm))
            pdf = pdf.copy()
            pdf[out_col] = feats
            yield pdf[cols + [out_col]]

    return df.mapInPandas(part, out_schema)
