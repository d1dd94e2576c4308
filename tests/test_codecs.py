"""PNG/WAV codec correctness + real-decode Spark kernels (multimodal)."""

import struct
import zlib

import numpy as np
import pytest

from keystone_spark.functions.codecs import (
    PNG_SIG,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    sniff_media,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def _png_from_rows(rows: list[bytes], w: int, h: int, bit_depth: int,
                   color_type: int, plte: bytes | None = None) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    out = PNG_SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(b"".join(rows))) + _chunk(b"IEND", b"")


def _spec_filter(raw: np.ndarray, ftype: int, bpp: int) -> list[bytes]:
    """Reference-spec scanline filtering (RFC 2083 §6), the inverse of the
    decoder under test — written independently, straight from the spec."""
    h, stride = raw.shape

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    rows = []
    prior = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        line = raw[y].astype(np.int64)
        f = bytearray([ftype])
        for i in range(stride):
            a = int(line[i - bpp]) if i >= bpp else 0
            b = int(prior[i])
            c = int(prior[i - bpp]) if i >= bpp else 0
            if ftype == 0:
                v = line[i]
            elif ftype == 1:
                v = line[i] - a
            elif ftype == 2:
                v = line[i] - b
            elif ftype == 3:
                v = line[i] - (a + b) // 2
            else:
                v = line[i] - paeth(a, b, c)
            f.append(int(v) & 0xFF)
        rows.append(bytes(f))
        prior = line
    return rows


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_roundtrip(channels):
    rng = np.random.default_rng(channels)
    img = rng.integers(0, 256, size=(11, 7, channels), dtype=np.uint8)
    arr = decode_png(encode_png(img))
    assert arr.shape == (11, 7, channels)
    assert np.array_equal((arr * 255).round().astype(np.uint8), img)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_all_filter_types(ftype):
    """Decoder must invert every scanline filter, checked against an
    independent spec-side filter implementation."""
    rng = np.random.default_rng(ftype)
    img = rng.integers(0, 256, size=(9, 5, 3), dtype=np.uint8)
    rows = _spec_filter(img.reshape(9, 15), ftype, bpp=3)
    arr = decode_png(_png_from_rows(rows, 5, 9, 8, 2))
    assert np.array_equal((arr * 255).round().astype(np.uint8), img)


def test_png_16bit_gray():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 65536, size=(4, 6), dtype=np.uint16)
    rows = [b"\x00" + img[y].astype(">u2").tobytes() for y in range(4)]
    arr = decode_png(_png_from_rows(rows, 6, 4, 16, 0))
    assert arr.shape == (4, 6, 1)
    assert np.allclose(arr[:, :, 0], img / 65535.0, atol=1e-7)


def test_png_palette():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    rows = [b"\x00" + idx[y].tobytes() for y in range(2)]
    arr = decode_png(_png_from_rows(rows, 3, 2, 8, 3, plte=plte))
    assert arr.shape == (2, 3, 3)
    assert np.array_equal(arr[0, 0], [1.0, 0.0, 0.0])
    assert np.array_equal(arr[0, 2], [0.0, 0.0, 1.0])
    assert np.array_equal(arr[1, 0], [0.0, 0.0, 1.0])


def _spec_adam7_passes(img: np.ndarray, bpp: int) -> bytes:
    """Independent spec-side Adam7 interlacer (RFC 2083 §2.6): extract the
    7 passes, each serialized as its own filtered sub-image (filter 0)."""
    h, w = img.shape[0], img.shape[1] // bpp
    grid = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    out = bytearray()
    px = img.reshape(h, w, bpp)
    for x0, y0, dx, dy in grid:
        sub = px[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            out += b"\x00" + row.tobytes()
    return bytes(out)


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("dims", [(1, 1), (3, 2), (7, 5), (13, 11), (16, 16)])
def test_png_adam7_interlaced(channels, dims):
    """Adam7 decode must reproduce the original pixels exactly, for sizes
    above/below/equal to the 8x8 pass grid (small images skip passes)."""
    h, w = dims
    rng = np.random.default_rng(h * 100 + w + channels)
    img = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
    raw = _spec_adam7_passes(img.reshape(h, w * channels), channels)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2, 4: 6}[channels], 0, 0, 1)
    png = (PNG_SIG + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    arr = decode_png(png)
    assert arr.shape == (h, w, channels)
    assert np.array_equal((arr * 255).round().astype(np.uint8), img)


@pytest.mark.parametrize("ftype", [1, 2, 4])
def test_png_adam7_with_filters(ftype):
    """Scanline filters inside an interlaced pass reference the PASS's
    own previous row, not the full image's — pinned with the independent
    spec-side filter over each extracted pass."""
    rng = np.random.default_rng(ftype)
    h, w, c = 12, 10, 3
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    px = img.reshape(h, w, c)
    grid = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    out = bytearray()
    for x0, y0, dx, dy in grid:
        sub = px[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        ph, pw = sub.shape[0], sub.shape[1]
        out += b"".join(_spec_filter(sub.reshape(ph, pw * c), ftype, bpp=c))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    png = (PNG_SIG + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(bytes(out))) + _chunk(b"IEND", b""))
    arr = decode_png(png)
    assert np.array_equal((arr * 255).round().astype(np.uint8), img)


def test_png_adam7_16bit_gray():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 65536, size=(9, 6), dtype=np.uint16)
    big = img.astype(">u2").view(np.uint8).reshape(9, 12)
    raw = _spec_adam7_passes(big, 2)
    ihdr = struct.pack(">IIBBBBB", 6, 9, 16, 0, 0, 0, 1)
    png = (PNG_SIG + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    arr = decode_png(png)
    assert arr.shape == (9, 6, 1)
    assert np.allclose(arr[:, :, 0], img / 65535.0, atol=1e-7)


def test_png_malformed_raises():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    good = encode_png(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises((ValueError, zlib.error)):
        decode_png(good[:-20])  # truncated IDAT/IEND


def test_sniff_media():
    assert sniff_media(encode_png(np.zeros((2, 2), np.uint8))) == "png"
    assert sniff_media(encode_wav(np.zeros(8), 16000)) == "wav"
    assert sniff_media(b"\xff\xd8\xff\xe0rest") == "jpeg"
    assert sniff_media(b"ID3\x04tag") == "mp3"
    assert sniff_media(b"garbage") == "unknown"


def test_wav_roundtrip_mono():
    t = np.arange(800) / 8000.0
    pcm = 0.5 * np.sin(2 * np.pi * 440 * t)
    sr, got = decode_wav(encode_wav(pcm, 8000))
    assert sr == 8000 and len(got) == 800
    assert np.allclose(got, pcm, atol=1.0 / 32767)


def test_wav_stereo_averages_to_mono():
    pcm = np.linspace(-0.9, 0.9, 100)
    sr, got = decode_wav(encode_wav(pcm, 44100, n_channels=2))
    assert sr == 44100 and len(got) == 100  # duplicated channels -> same mono
    # encode quantizes at 1/32767, decode normalizes by 1/32768: 2 ulp slack
    assert np.allclose(got, pcm, atol=2.0 / 32767)


def test_wav_8bit():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(1)
        f.setframerate(16000)
        f.writeframes(bytes([0, 128, 255]))
    sr, got = decode_wav(buf.getvalue())
    assert sr == 16000
    assert np.allclose(got, [-1.0, 0.0, 127 / 128], atol=1e-6)


def test_decode_images_real_png_null_and_garbage(spark):
    from keystone_spark.operators.multimodal import decode_images

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    rows = [(1, bytearray(encode_png(img))), (2, None), (3, bytearray(b"garbage"))]
    df = spark.createDataFrame(rows, "id long, content binary")
    got = {r.id: r.image for r in decode_images(df, decode="real").collect()}
    assert got[2] is None and got[3] is None
    assert (got[1].height, got[1].width, got[1].n_channels) == (6, 5, 3)
    back = (np.array(got[1].data).reshape(6, 5, 3) * 255).round().astype(np.uint8)
    assert np.array_equal(back, img)


def _psnr(a, b) -> float:
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-12))


@pytest.mark.parametrize("subsample", ["444", "420"])
def test_jpeg_roundtrip_smooth(subsample):
    from keystone_spark.functions.codecs import decode_jpeg, encode_jpeg

    y, x = np.mgrid[0:24, 0:32]
    img = np.stack([x / 31.0, y / 23.0, (x + y) / 54.0], axis=2)
    dec = decode_jpeg(encode_jpeg(img, quality=95, subsample=subsample))
    assert dec.shape == (24, 32, 3)
    assert _psnr(img, dec) > (50 if subsample == "444" else 35)


def test_jpeg_roundtrip_gray_and_odd_dims():
    from keystone_spark.functions.codecs import decode_jpeg, encode_jpeg

    y, x = np.mgrid[0:13, 0:11]
    g = (np.sin(x / 3.0) + np.cos(y / 4.0) + 2) / 4
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert dec.shape == (13, 11, 1)
    assert _psnr(g[:, :, None], dec) > 45


def test_jpeg_420_matches_ideal_chroma_decimation():
    """The decoded 4:2:0 image must match the mathematically-ideal
    RGB->YCbCr -> 2x2 box-down -> nearest-up -> RGB reconstruction; this
    isolates codec error from inherent subsampling loss."""
    from keystone_spark.functions.codecs import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(1)
    img = rng.random((13, 19, 3))
    dec = decode_jpeg(encode_jpeg(img, quality=95, subsample="420"))

    a = np.clip(np.round(img * 255), 0, 255)
    r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
    yy = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128

    def ds_us(p):
        py, px = -(-p.shape[0] // 2) * 2, -(-p.shape[1] // 2) * 2
        q = np.pad(p, ((0, py - p.shape[0]), (0, px - p.shape[1])), mode="edge")
        d = q.reshape(py // 2, 2, px // 2, 2).mean(axis=(1, 3))
        u = np.repeat(np.repeat(d, 2, axis=0), 2, axis=1)
        return u[: p.shape[0], : p.shape[1]]

    cb2, cr2 = ds_us(cb) - 128, ds_us(cr) - 128
    ideal = np.clip(
        np.stack([yy + 1.402 * cr2, yy - 0.344136 * cb2 - 0.714136 * cr2,
                  yy + 1.772 * cb2], axis=2), 0, 255
    ) / 255.0
    assert _psnr(ideal, dec) > 40


def test_jpeg_flat_color_channels():
    """Flat-color reconstruction pins the YCbCr matrix + level shift (a
    channel swap or sign error would be way off)."""
    from keystone_spark.functions.codecs import decode_jpeg, encode_jpeg

    flat = np.zeros((8, 8, 3))
    flat[:, :, 0], flat[:, :, 1], flat[:, :, 2] = 0.8, 0.3, 0.1
    dec = decode_jpeg(encode_jpeg(flat, quality=95))
    assert np.allclose(dec.mean(axis=(0, 1)), [0.8, 0.3, 0.1], atol=0.02)


def test_jpeg_malformed_raises():
    from keystone_spark.functions.codecs import decode_jpeg

    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0garbage-after-soi")
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")


def test_decode_images_real_jpeg(spark):
    """Real JPEG payloads decode in the Spark kernel; malformed JPEG
    yields null (on_error default)."""
    from keystone_spark.functions.codecs import encode_jpeg
    from keystone_spark.operators.multimodal import decode_images

    y, x = np.mgrid[0:16, 0:16]
    img = np.stack([x / 15.0, y / 15.0, 0.5 * np.ones((16, 16))], axis=2)
    rows = [
        (1, bytearray(encode_jpeg(img, quality=95))),
        (2, bytearray(b"\xff\xd8\xff\xe0fakejpeg")),
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    got = {r.id: r.image for r in decode_images(df, decode="real").collect()}
    assert got[2] is None
    assert (got[1].height, got[1].width, got[1].n_channels) == (16, 16, 3)
    back = np.array(got[1].data).reshape(16, 16, 3)
    assert _psnr(img, back) > 40


def test_real_decode_resize_gray_features_pipeline(spark):
    """PNG bytes -> decode(real) -> resize -> grayscale -> features,
    end-to-end through the Arrow kernels."""
    import pyspark.sql.functions as F

    from keystone_spark.operators.multimodal import (
        decode_images,
        grayscale,
        image_features,
        resize_images,
    )

    rng = np.random.default_rng(9)
    rows = [
        (i, bytearray(encode_png(rng.integers(0, 256, size=(10 + i, 8, 3),
                                              dtype=np.uint8))))
        for i in range(3)
    ] + [(99, None)]
    df = spark.createDataFrame(rows, "id long, content binary")
    out = decode_images(df, decode="real")
    out = resize_images(out, 6, 6, image_col="image", out_col="image6")
    out = grayscale(out, image_col="image6", out_col="gray")
    out = image_features(out, image_col="gray", out_col="feats")
    got = {r.id: r for r in out.collect()}
    for i in range(3):
        assert (got[i].image6.height, got[i].image6.width) == (6, 6)
        assert got[i].gray.n_channels == 1
        assert len(got[i].feats) == 2  # mean + std of the single channel
        assert 0.0 <= got[i].feats[0] <= 1.0
    assert got[99].image6 is None and got[99].gray is None and got[99].feats is None


def test_resize_identity_and_upscale(spark):
    from keystone_spark.operators.multimodal import decode_images, resize_images

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:, :, 0] = np.arange(16).reshape(4, 4) * 16
    df = spark.createDataFrame([(1, bytearray(encode_png(img)))],
                               "id long, content binary")
    dec = decode_images(df, decode="real")
    same = resize_images(dec, 4, 4).collect()[0].resized
    orig = dec.collect()[0].image
    assert np.allclose(same.data, orig.data, atol=1e-6)  # identity resize
    up = resize_images(dec, 8, 8).collect()[0].resized
    a = np.array(up.data).reshape(8, 8, 3)
    assert a.shape == (8, 8, 3)
    # bilinear keeps values within the source range and preserves mean-ish
    assert a.min() >= 0.0 and a.max() <= 1.0
    assert abs(a[:, :, 0].mean() - img[:, :, 0].mean() / 255.0) < 0.02


def test_decode_audio_real_wav(spark):
    from keystone_spark.operators.multimodal import audio_features, decode_audio

    t = np.arange(1600) / 16000.0
    pcm = 0.4 * np.sin(2 * np.pi * 220 * t)
    rows = [
        (1, bytearray(encode_wav(pcm, 16000))),
        (2, bytearray(encode_wav(pcm, 8000, n_channels=2))),
        (3, None),
        (4, bytearray(b"definitely not audio")),
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    out = audio_features(decode_audio(df, decode="real"))
    got = {r.id: r for r in out.collect()}
    assert got[1].audio.sample_rate == 16000 and got[1].audio.n_samples == 1600
    assert got[2].audio.sample_rate == 8000
    assert got[3].audio is None and got[4].audio is None
    assert got[3].audio_features is None and got[4].audio_features is None
    rms, zcr, centroid = got[1].audio_features
    assert abs(rms - 0.4 / np.sqrt(2)) < 1e-3
    assert abs(centroid - 220.0) < 25.0  # spectral centroid near the tone


def test_decode_audio_real_mp3_raises(spark):
    from keystone_spark.operators.multimodal import decode_audio

    df = spark.createDataFrame([(1, bytearray(b"ID3\x04\x00tag"))],
                               "id long, content binary")
    with pytest.raises(Exception, match="mp3"):
        decode_audio(df, decode="real").collect()


@pytest.mark.parametrize("subsample", ["444", "420"])
def test_jpeg_progressive_bit_matches_baseline(subsample):
    """decode(progressive encode) must equal decode(baseline encode)
    EXACTLY — both encoders share one coefficient plan, and successive
    approximation (DC Al=1 + refine, AC Al=1 + refine) reconstructs the
    quantized coefficients losslessly."""
    from keystone_spark.functions.codecs import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(7)
    for img in (
        rng.random((17, 23, 3)),            # noise: dense AC, ZRL paths
        np.full((24, 40, 3), 0.5),          # flat: maximal EOB runs
        np.stack([*np.mgrid[0:16, 0:24]], 2).sum(2) / 38.0,  # smooth gray
    ):
        for q in (95, 55):
            base = decode_jpeg(encode_jpeg(img, quality=q, subsample=subsample))
            prog = decode_jpeg(
                encode_jpeg_progressive(img, quality=q, subsample=subsample)
            )
            assert np.array_equal(base, prog)


def test_decode_images_progressive_jpeg(spark):
    """Progressive JPEG payloads decode through the Spark kernel (the
    reference's javax.imageio path handles them; so do we now)."""
    from keystone_spark.functions.codecs import encode_jpeg_progressive
    from keystone_spark.operators.multimodal import decode_images

    y, x = np.mgrid[0:16, 0:16]
    img = np.stack([x / 15.0, y / 15.0, 0.5 * np.ones((16, 16))], axis=2)
    df = spark.createDataFrame(
        [(1, bytearray(encode_jpeg_progressive(img, quality=95)))],
        "id long, content binary",
    )
    got = decode_images(df, decode="real").collect()[0].image
    assert (got.height, got.width, got.n_channels) == (16, 16, 3)
    assert _psnr(img, np.array(got.data).reshape(16, 16, 3)) > 40


# minimal JPEG with a lossless SOF3 frame: sniffs as jpeg, decode raises
# NotImplementedError — the 'unsupported format' axis, distinct from corrupt
_LOSSLESS_JPEG = b"\xff\xd8\xff\xc3\x00\x04\x08\x00"


def test_decode_images_errors_null_quarantines(spark):
    """errors='null': unsupported-format payloads become NULL rows and
    are counted in the quarantine accumulator; supported payloads in the
    same batch still decode; errors='strict' (default) raises."""
    from keystone_spark.operators.multimodal import decode_images

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(encode_png(img))),
        (2, bytearray(_LOSSLESS_JPEG)),
        (3, bytearray(b"garbage")),  # corrupt -> on_error axis, also counted
    ]
    df = spark.createDataFrame(rows, "id long, content binary")

    with pytest.raises(Exception, match="SOF3"):
        decode_images(df, decode="real").collect()  # strict default

    acc = spark.sparkContext.accumulator(0)
    got = {
        r.id: r.image
        for r in decode_images(
            df, decode="real", errors="null", quarantine=acc
        ).collect()
    }
    assert got[2] is None and got[3] is None
    assert got[1] is not None and got[1].height == 6
    assert acc.value == 2


def test_decode_audio_errors_null_quarantines(spark):
    from keystone_spark.operators.multimodal import decode_audio

    t = np.arange(160) / 16000.0
    rows = [
        (1, bytearray(encode_wav(0.3 * np.sin(880 * t), 16000))),
        (2, bytearray(b"ID3\x04\x00tag")),  # mp3: unsupported format
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    acc = spark.sparkContext.accumulator(0)
    got = {
        r.id: r.audio
        for r in decode_audio(
            df, decode="real", errors="null", quarantine=acc
        ).collect()
    }
    assert got[1] is not None and got[1].sample_rate == 16000
    assert got[2] is None
    assert acc.value == 1
