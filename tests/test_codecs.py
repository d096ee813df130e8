"""Pure-numpy media codecs + their wiring into the multimodal ops.

The PNG encoder can emit any of the five scanline filters, so every
unfilter path is roundtrip-tested without a reference codec; BMP and
WAV are crafted byte-exact. PIL-specific paths skip when PIL is
absent (this container).
"""

import io
import wave

import numpy as np
import pytest

from parq_tools_spark.operators.codecs import (
    decode_audio,
    decode_bmp,
    decode_image,
    decode_media,
    decode_png,
    encode_bmp,
    encode_png,
    have_pil,
    media_features,
    probe_media_header,
    resize_nearest,
    sniff_format,
)


def _img(h, w, c, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_filters(filter_type, channels):
    arr = _img(13, 7, channels, seed=filter_type * 10 + channels)
    blob = encode_png(arr, filter_type=filter_type)
    assert sniff_format(blob) == "png"
    out = decode_png(blob)
    np.testing.assert_array_equal(out, arr)


def test_png_palette_decode():
    """Handcrafted color-type-3 PNG: indices expand through PLTE."""
    import struct
    import zlib

    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], dtype=np.uint8
    )
    idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)
    raw = b"".join(b"\x00" + row.tobytes() for row in idx)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = decode_png(blob)
    np.testing.assert_array_equal(out, palette[idx])


def test_png_rejects_unsupported():
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    sixteen_bit = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_png(sixteen_bit)


def test_bmp_roundtrip_with_row_padding():
    # width 5 -> 15-byte rows pad to 16: exercises the stride logic
    arr = _img(4, 5, 3, seed=3)
    blob = encode_bmp(arr)
    assert sniff_format(blob) == "bmp"
    np.testing.assert_array_equal(decode_bmp(blob), arr)
    np.testing.assert_array_equal(decode_image(blob), arr)


def _wav_blob(n=800, rate=8000, n_ch=1):
    t = np.arange(n)
    wave16 = (np.sin(2 * np.pi * 440 * t / rate) * 20000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(n_ch)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(np.repeat(wave16, n_ch).tobytes())
    return buf.getvalue(), wave16


def test_wav_decode():
    blob, wave16 = _wav_blob()
    assert sniff_format(blob) == "wav"
    samples, rate = decode_audio(blob)
    assert rate == 8000 and samples.shape == (800, 1)
    np.testing.assert_allclose(
        samples[:, 0], wave16.astype(np.float64) / 32768.0
    )


def test_probe_media_header():
    png = encode_png(_img(6, 9, 3))
    h = probe_media_header(png)
    assert (h["format"], h["width"], h["height"]) == ("png", 9, 6)
    bmp = encode_bmp(_img(2, 3, 3))
    h = probe_media_header(bmp)
    assert (h["format"], h["width"], h["height"]) == ("bmp", 3, 2)
    wav, _ = _wav_blob(n=4000, rate=8000)
    h = probe_media_header(wav)
    assert (h["format"], h["modality"], h["duration_ms"]) == (
        "wav",
        "audio",
        500,
    )
    assert probe_media_header(b"just some text, no magic") is None
    assert probe_media_header(None) is None


def test_resize_nearest():
    arr = np.arange(24, dtype=np.uint8).reshape(4, 6)
    out = resize_nearest(arr, width=3, height=2)
    np.testing.assert_array_equal(out, arr[::2, ::2])
    up = resize_nearest(arr, width=12, height=4)
    assert up.shape == (4, 12)
    np.testing.assert_array_equal(up[:, ::2], arr)


def test_media_features_real_values():
    arr = np.full((10, 20, 3), 128, dtype=np.uint8)
    f = media_features(encode_png(arr))
    assert f[:3].tolist() == [20.0, 10.0, 3.0]
    assert abs(f[3] - 128 / 255) < 1e-12 and f[4] < 1e-12
    wav, _ = _wav_blob()
    fa = media_features(wav)
    assert fa[0] == 800.0 and fa[1] == 8000.0 and fa[2] == 1.0
    assert 0.0 < fa[7] < 0.5  # zero-crossing rate of a 440 Hz tone
    assert media_features(b"not media at all") is None


@pytest.mark.skipif(not have_pil(), reason="PIL not installed")
def test_pil_path_decodes_jpeg():
    import PIL.Image

    arr = _img(8, 8, 3)
    buf = io.BytesIO()
    PIL.Image.fromarray(arr).save(buf, format="JPEG")
    out = decode_image(buf.getvalue())
    assert out.shape == (8, 8, 3)


# ------------------------------------------------- Spark-side wiring
def test_extract_features_real_decode_in_spark(spark):
    """Default extract_features must return REAL dims for decodable
    blobs and the sha256 stub for opaque ones — in the same frame."""
    from parq_tools_spark.operators.multimodal import extract_features

    png = encode_png(_img(6, 9, 3, seed=1))
    wav, _ = _wav_blob()
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(wav)), (3, bytearray(b"opaque"))],
        "media_id long, blob binary",
    )
    rows = {r.media_id: r for r in extract_features(df).collect()}
    assert rows[1].features[:3] == [9.0, 6.0, 3.0]  # real w/h/c
    assert rows[2].features[:2] == [800.0, 8000.0]  # real frames/rate
    stub = media_features(b"opaque")
    assert stub is None  # confirms row 3 fell through to the stub
    assert all(0.0 <= v < 1.0 for v in rows[3].features)


def test_attach_media_metadata_probe_in_spark(spark):
    from parq_tools_spark.operators.multimodal import attach_media_metadata

    png = encode_png(_img(4, 5, 3))
    wav, _ = _wav_blob(n=4000, rate=8000)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(wav)), (3, bytearray(b"zz-unknown-zz"))],
        "media_id long, blob binary",
    )
    out = {r.media_id: r.meta for r in attach_media_metadata(df, probe=True).collect()}
    assert (out[1]["format"], out[1]["width"], out[1]["height"]) == ("png", 5, 4)
    assert (out[2]["modality"], out[2]["duration_ms"]) == ("audio", 500)
    assert out[3]["format"] == "bin" and out[3]["width"] is None
    assert out[3]["n_bytes"] == 13


def test_resize_media_real_path_in_spark(spark):
    from parq_tools_spark.operators.multimodal import resize_media

    src = _img(16, 16, 3, seed=2)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(src))), (2, bytearray(b"opaque"))],
        "media_id long, blob binary",
    )
    rows = {r.media_id: r for r in resize_media(df, width=4, height=4).collect()}
    resized = decode_media(bytes(rows[1].blob))
    assert resized is not None
    assert (resized["width"], resized["height"]) == (4, 4)
    np.testing.assert_array_equal(resized["array"], resize_nearest(src, 4, 4))
    # opaque blob keeps the md5 stand-in contract (32 hex bytes)
    assert rows[2].n_bytes == 32


# ------------------------------------------------------------- GIF
def test_gif_roundtrip_animated():
    from parq_tools_spark.operators.codecs import decode_gif, encode_gif

    rng = np.random.RandomState(7)
    frames = [rng.randint(0, 256, (5, 9), dtype=np.uint8) for _ in range(3)]
    blob = encode_gif(frames, delays_ms=[100, 250, 400])
    assert sniff_format(blob) == "gif"
    decoded = decode_gif(blob)
    assert [d for d, _ in decoded] == [100, 250, 400]
    for src, (_, rgba) in zip(frames, decoded):
        assert rgba.shape == (5, 9, 4)
        # grayscale identity palette: every channel equals the index
        np.testing.assert_array_equal(rgba[:, :, 0], src)
        np.testing.assert_array_equal(rgba[:, :, 1], src)
        np.testing.assert_array_equal(rgba[:, :, 2], src)
        assert (rgba[:, :, 3] == 255).all()


def test_gif_scan_meta_and_probe():
    from parq_tools_spark.operators.codecs import _gif_scan_meta, encode_gif

    frames = [np.zeros((4, 6), dtype=np.uint8)] * 4
    blob = encode_gif(frames, delays_ms=[50, 50, 100, 100])
    meta = _gif_scan_meta(blob)
    assert meta == {
        "width": 6,
        "height": 4,
        "n_frames": 4,
        "duration_ms": 300,
    }
    h = probe_media_header(blob)
    assert (h["modality"], h["width"], h["height"], h["duration_ms"]) == (
        "video",
        6,
        4,
        300,
    )
    # single-frame GIF probes as an image
    h1 = probe_media_header(encode_gif([frames[0]]))
    assert h1["modality"] == "image" and h1["duration_ms"] is None


def test_gif_decode_media_and_features():
    from parq_tools_spark.operators.codecs import encode_gif

    frames = [
        np.full((3, 3), 0, dtype=np.uint8),
        np.full((3, 3), 255, dtype=np.uint8),
    ]
    blob = encode_gif(frames, delays_ms=[100, 100])
    m = decode_media(blob)
    assert m["modality"] == "video" and m["n_frames"] == 2
    assert m["duration_ms"] == 200
    f = media_features(blob)
    # width, height, n_frames; mean over RGBA = (0.25 + 1.0)/2 (the
    # opaque alpha plane contributes 1.0 to both frames); duration
    assert f[:3].tolist() == [3.0, 3.0, 2.0]
    assert abs(f[3] - 0.625) < 0.01 and f[7] == 200.0


def test_gif_interlaced_decode():
    """Handcraft an interlaced image block: rows stored in the four
    GIF passes must come back in display order."""
    import struct

    from parq_tools_spark.operators.codecs import decode_gif, encode_gif

    h, w = 9, 4
    img = np.arange(h * w, dtype=np.uint8).reshape(h, w)
    passes = [0, 8], [4, 8], [2, 4], [1, 2]
    order = [r for start, step in passes for r in range(start, h, step)]
    blob = bytearray(encode_gif([img[order]]))  # rows pre-permuted
    # flip the interlace bit in the image descriptor's packed field:
    # descriptor starts right after header+LSD+GCT(768)+GCE(8)
    desc = 6 + 7 + 768 + 8
    assert blob[desc] == 0x2C
    blob[desc + 9] |= 0x40
    (_, rgba), = decode_gif(bytes(blob))
    np.testing.assert_array_equal(rgba[:, :, 0], img)


def test_sample_frames_real_gif_frames(spark):
    """sample_frames must return REAL PNG-encoded GIF frames at the
    sampled timestamps (and keep the slice stub for opaque blobs)."""
    from parq_tools_spark.operators.codecs import decode_media, encode_gif
    from parq_tools_spark.operators.multimodal import (
        attach_media_metadata,
        sample_frames,
    )

    frames = [
        np.full((4, 4), 10, dtype=np.uint8),
        np.full((4, 4), 200, dtype=np.uint8),
    ]
    gif = encode_gif(frames, delays_ms=[1000, 1000])
    df = spark.createDataFrame(
        [(1, bytearray(gif)), (2, bytearray(b"not-a-video-blob"))],
        "media_id long, blob binary",
    )
    media = attach_media_metadata(df, probe=True, modality="video")
    out = sample_frames(media, every_ms=1000).collect()
    by_key = {(r.media_id, r.frame_idx): r for r in out}
    # gif: 2000ms / 1000ms -> 2 sampled frames, each the REAL frame
    m0 = decode_media(bytes(by_key[(1, 0)].frame_blob))
    m1 = decode_media(bytes(by_key[(1, 1)].frame_blob))
    assert m0["array"][0, 0, 0] == 10 and m1["array"][0, 0, 0] == 200
    assert by_key[(1, 1)].ts_ms == 1000
    # opaque blob: stub slice, single frame (no duration known)
    assert len(bytes(by_key[(2, 0)].frame_blob)) == 16


# ------------------------------------------------------------ JPEG
def test_jpeg_roundtrip_gray_flat_exact():
    from parq_tools_spark.operators.jpeg import decode_jpeg, encode_jpeg

    arr = np.full((16, 24), 128, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(arr, quality=95))
    assert out.shape == (16, 24)
    np.testing.assert_array_equal(out, arr)


def test_jpeg_roundtrip_rgb_gradient_close():
    from parq_tools_spark.operators.jpeg import decode_jpeg, encode_jpeg

    g = np.zeros((32, 32, 3), dtype=np.uint8)
    g[:, :, 0] = np.linspace(0, 255, 32).astype(np.uint8)[None, :]
    g[:, :, 1] = np.linspace(255, 0, 32).astype(np.uint8)[:, None]
    g[:, :, 2] = 100
    out = decode_jpeg(encode_jpeg(g, quality=95))
    err = np.abs(out.astype(int) - g.astype(int))
    assert err.max() <= 4 and err.mean() < 1.5


def test_jpeg_roundtrip_420_subsampled():
    """4:2:0 exercises the MCU interleave + chroma upsample path."""
    from parq_tools_spark.operators.jpeg import decode_jpeg, encode_jpeg

    g = np.zeros((40, 24, 3), dtype=np.uint8)
    g[:, :, 0] = np.linspace(10, 240, 24).astype(np.uint8)[None, :]
    g[:, :, 1] = 80
    g[:, :, 2] = np.linspace(240, 10, 40).astype(np.uint8)[:, None]
    out = decode_jpeg(encode_jpeg(g, quality=90, subsample=True))
    assert out.shape == g.shape
    err = np.abs(out.astype(int) - g.astype(int))
    assert err.mean() < 6 and err.max() < 40  # chroma edges are soft


def test_jpeg_non_multiple_of_8_dims():
    from parq_tools_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(1)
    arr = rng.randint(0, 256, (13, 21, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(arr, quality=85))
    assert out.shape == (13, 21, 3)


@pytest.mark.parametrize(
    "shape,subsample",
    [((16, 24), False), ((32, 32, 3), False), ((40, 24, 3), True), ((13, 21, 3), False)],
)
def test_jpeg_progressive_decodes_identical_to_baseline(shape, subsample):
    """A progressive (SOF2) stream of the same quantized coefficients
    must reconstruct to EXACTLY the baseline pixels — the strongest
    oracle available without a reference codec. Exercises DC
    successive approximation, AC spectral-selection first scans and
    AC refinement bit planes."""
    from parq_tools_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(11)
    arr = rng.randint(0, 256, shape, dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(arr, quality=90, subsample=subsample))
    prog = decode_jpeg(
        encode_jpeg(arr, quality=90, subsample=subsample, progressive=True)
    )
    np.testing.assert_array_equal(base, prog)


def test_jpeg_progressive_eob_runs_and_zrl():
    """Mostly-flat images drive cross-block EOB runs; isolated spikes
    drive ZRL paths in both first and refinement scans."""
    from parq_tools_spark.operators.jpeg import decode_jpeg, encode_jpeg

    flat = np.full((64, 80, 3), 130, dtype=np.uint8)
    flat[30, 40] = 250
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg(flat, 85)),
        decode_jpeg(encode_jpeg(flat, 85, progressive=True)),
    )
    sparse = np.full((48, 48), 128, dtype=np.uint8)
    for y, x in [(0, 47), (7, 0), (40, 40), (23, 23)]:
        sparse[y, x] = 255
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg(sparse, 95)),
        decode_jpeg(encode_jpeg(sparse, 95, progressive=True)),
    )


def test_jpeg_arithmetic_coding_rejected():
    from parq_tools_spark.operators.jpeg import decode_jpeg, encode_jpeg

    blob = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    # flip SOF0 (0xC0) to SOF9 (0xC9, arithmetic sequential)
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="unsupported"):
        decode_jpeg(bytes(blob))


def test_jpeg_in_codecs_dispatch():
    from parq_tools_spark.operators.jpeg import encode_jpeg

    g = np.zeros((12, 18, 3), dtype=np.uint8)
    g[:, :, 0] = 200
    blob = encode_jpeg(g, quality=95)
    assert sniff_format(blob) == "jpeg"
    h = probe_media_header(blob)
    assert (h["format"], h["width"], h["height"]) == ("jpeg", 18, 12)
    m = decode_media(blob)
    assert m["modality"] == "image"
    assert (m["width"], m["height"], m["channels"]) == (18, 12, 3)
    f = media_features(blob)
    assert f[:3].tolist() == [18.0, 12.0, 3.0]
    out = decode_image(blob)
    assert abs(int(out[:, :, 0].mean()) - 200) <= 3
    assert int(out[:, :, 1].mean()) <= 3


def test_wav_24bit_decode():
    from parq_tools_spark.operators.codecs import decode_wav

    vals = np.array([0, 1 << 22, -(1 << 22), (1 << 23) - 1, -(1 << 23)], dtype=np.int64)
    raw = bytearray()
    for v in vals:
        raw += int(v & 0xFFFFFF).to_bytes(3, "little")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(3)
        wf.setframerate(48000)
        wf.writeframes(bytes(raw))
    samples, rate = decode_wav(buf.getvalue())
    assert rate == 48000
    np.testing.assert_allclose(
        samples[:, 0], vals.astype(np.float64) / (1 << 23)
    )


# -------------------------------------------------- perceptual hash
def _phash_fixtures():
    from parq_tools_spark.operators.jpeg import encode_jpeg

    rng = np.random.RandomState(42)
    base = np.zeros((64, 64, 3), dtype=np.uint8)
    # structured content (gradients + a block), not pure noise — pHash
    # is designed for natural-image structure
    base[:, :, 0] = np.linspace(0, 255, 64)[None, :]
    base[:, :, 1] = np.linspace(255, 0, 64)[:, None]
    base[16:40, 16:40, 2] = 220
    noisy = base.astype(np.int16) + rng.randint(-8, 9, base.shape)
    noisy = np.clip(noisy, 0, 255).astype(np.uint8)
    other = np.zeros_like(base)
    other[:, :, 2] = np.linspace(0, 255, 64)[None, :]
    other[8:20, 40:60, 0] = 255
    other[40:64, :, 1] = 128
    return base, noisy, other, encode_jpeg


def test_perceptual_hash_invariance_and_discrimination():
    from parq_tools_spark.operators.codecs import perceptual_hash

    base, noisy, other, encode_jpeg = _phash_fixtures()
    h_png = perceptual_hash(encode_png(base))
    h_jpeg = perceptual_hash(encode_jpeg(base, quality=85))
    h_noisy = perceptual_hash(encode_png(noisy))
    h_other = perceptual_hash(encode_png(other))
    assert h_png is not None and 0 <= h_png < (1 << 63)

    def ham(a, b):
        return bin(a ^ b).count("1")

    # same content, different codec/compression -> near
    assert ham(h_png, h_jpeg) <= 6
    # mild noise -> near
    assert ham(h_png, h_noisy) <= 6
    # different image -> far
    assert ham(h_png, h_other) > 12
    assert perceptual_hash(b"not an image") is None


def test_image_near_duplicate_pairs_in_spark(spark):
    from parq_tools_spark.operators.multimodal import (
        image_near_duplicate_pairs,
        with_image_phash,
    )

    base, noisy, other, encode_jpeg = _phash_fixtures()
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_png(base))),
            (2, bytearray(encode_jpeg(base, quality=85))),
            (3, bytearray(encode_png(noisy))),
            (4, bytearray(encode_png(other))),
            (5, bytearray(b"opaque-not-an-image")),
        ],
        "media_id long, blob binary",
    )
    hashed = {r.media_id: r.phash for r in with_image_phash(df).collect()}
    assert hashed[5] is None and hashed[1] is not None

    pairs = {
        (r.id1, r.id2)
        for r in image_near_duplicate_pairs(df, max_hamming=6).collect()
    }
    # the three variants of `base` pair up; `other` and the opaque
    # blob pair with nothing
    assert pairs == {(1, 2), (1, 3), (2, 3)}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="pigeonhole"):
        image_near_duplicate_pairs(df, max_hamming=8, n_bands=8)


# ------------------------------------------------------------ audio
def test_wav_float32_decode_and_roundtrip():
    from parq_tools_spark.operators.codecs import decode_wav, encode_wav

    t = np.arange(1000)
    mono = np.sin(2 * np.pi * 440 * t / 16000)
    blob = encode_wav(mono, 16000, float_fmt=True)
    assert sniff_format(blob) == "wav"
    samples, rate = decode_wav(blob)
    assert rate == 16000 and samples.shape == (1000, 1)
    np.testing.assert_allclose(samples[:, 0], mono, atol=1e-7)
    # header probe handles format-3 files too
    h = probe_media_header(blob)
    assert h["modality"] == "audio"


def test_resample_linear_preserves_tone():
    from parq_tools_spark.operators.codecs import resample_linear

    rate, target = 8000, 16000
    t = np.arange(800) / rate
    tone = np.sin(2 * np.pi * 200 * t)[:, None]
    up = resample_linear(tone, rate, target)
    assert up.shape == (1600, 1)
    tt = np.arange(1600) / target
    # np.interp holds the edge value beyond the last source sample, so
    # exclude the extrapolated tail from the tolerance check
    np.testing.assert_allclose(
        up[:-2, 0], np.sin(2 * np.pi * 200 * tt[:-2]), atol=0.01
    )
    assert resample_linear(tone, rate, rate) is tone


def test_resample_audio_in_spark(spark):
    from parq_tools_spark.operators.codecs import decode_wav
    from parq_tools_spark.operators.multimodal import resample_audio

    wav, _ = _wav_blob(n=800, rate=8000)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"not audio"))],
        "media_id long, blob binary",
    )
    rows = {r.media_id: r for r in resample_audio(df, 16000).collect()}
    assert rows[1].resampled and rows[1].sample_rate == 16000
    assert rows[1].n_frames == 1600
    samples, rate = decode_wav(bytes(rows[1].blob))
    assert rate == 16000 and samples.shape == (1600, 1)
    assert not rows[2].resampled and rows[2].blob is None


# ------------------------------------------------------- robustness
def test_truncated_and_corrupt_blobs_degrade_not_crash():
    """At corpus scale a corrupt blob must degrade (None -> stub),
    never raise out of the decode ladder: every prefix of every valid
    blob and bit-flipped bodies go through decode_media /
    probe_media_header / media_features / perceptual_hash."""
    from parq_tools_spark.operators.codecs import (
        encode_gif,
        encode_wav,
        perceptual_hash,
    )
    from parq_tools_spark.operators.jpeg import encode_jpeg

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    blobs = [
        encode_png(img),
        encode_bmp(img),
        encode_jpeg(img, quality=85),
        encode_jpeg(img, quality=85, progressive=True),
        encode_gif([img[:, :, 0], img[:, :, 1]], delays_ms=[100, 100]),
        encode_wav(np.sin(np.arange(400) / 10.0), 8000),
        encode_wav(np.sin(np.arange(400) / 10.0), 8000, float_fmt=True),
    ]
    for blob in blobs:
        assert decode_media(blob) is not None  # sanity: valid decodes
        for cut in range(0, len(blob), max(1, len(blob) // 23)):
            trunc = blob[:cut]
            decode_media(trunc)
            probe_media_header(trunc)
            media_features(trunc)
            perceptual_hash(trunc)
        # flip bytes mid-body (headers intact enough to enter parsers)
        for seed in range(3):
            r = np.random.RandomState(seed)
            corrupt = bytearray(blob)
            for pos in r.randint(12, len(blob), size=8):
                corrupt[pos] ^= 0xFF
            decode_media(bytes(corrupt))
            probe_media_header(bytes(corrupt))
            media_features(bytes(corrupt))


def test_corrupt_blobs_in_spark_pipeline(spark):
    """End-to-end: a frame mixing valid, truncated and opaque blobs
    must flow through features/resize/resample without task failure."""
    from parq_tools_spark.operators.codecs import encode_wav
    from parq_tools_spark.operators.multimodal import (
        attach_media_metadata,
        extract_features,
        resample_audio,
        resize_media,
        sample_frames,
    )

    png = encode_png(_img(8, 8, 3))
    wav = encode_wav(np.sin(np.arange(400) / 7.0), 8000)
    df = spark.createDataFrame(
        [
            (1, bytearray(png)),
            (2, bytearray(png[: len(png) // 2])),   # truncated PNG
            (3, bytearray(wav[:30])),                # truncated WAV
            (4, bytearray(b"\x89PNG\r\n\x1a\nJUNK")),
        ],
        "media_id long, blob binary",
    )
    assert extract_features(df).count() == 4
    assert resize_media(df, 4, 4).count() == 4
    res = {r.media_id: r for r in resample_audio(df, 16000).collect()}
    assert not res[3].resampled  # truncated WAV routed, not crashed
    probed = attach_media_metadata(df, probe=True, modality="video")
    assert sample_frames(probed).count() == 4


def test_gif_disposal_restore_to_previous():
    """Disposal 3 (restore-to-previous): the canvas must revert to its
    pre-frame state before the next frame composes, so a transparent
    pixel in the next frame shows what was there BEFORE the disposed
    frame drew — not the disposed frame's pixels."""
    import struct

    from parq_tools_spark.operators.codecs import decode_gif

    def lzw(pixels):
        data = bytearray()
        bits = buffer = 0

        def push(code):
            nonlocal bits, buffer
            buffer |= code << bits
            bits += 9
            while bits >= 8:
                data.append(buffer & 0xFF)
                buffer >>= 8
                bits -= 8

        for px in pixels:
            push(256)  # clear
            push(px)
        push(257)  # end
        if bits:
            data.append(buffer & 0xFF)
        return data

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 1, 0x87, 0, 0)
    out += bytes(v for i in range(256) for v in (i, i, i))
    # (gce_flags, transparent_idx, pixels): frame 2 sets disposal 3
    # (flags 3<<2), frame 3 has a transparent pixel (flags 1)
    for flags, tidx, pixels in (
        (0x00, 0, [10, 10]),
        (0x0C, 0, [20, 20]),
        (0x01, 0, [0, 30]),
    ):
        out += b"\x21\xf9\x04" + bytes([flags])
        out += struct.pack("<H", 10) + bytes([tidx]) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 1, 0)
        out.append(8)  # min LZW code size
        data = lzw(pixels)
        for i in range(0, len(data), 255):
            out.append(len(data[i : i + 255]))
            out += data[i : i + 255]
        out.append(0)
    out += b"\x3b"

    frames = decode_gif(bytes(out))
    assert len(frames) == 3
    f3 = frames[2][1]
    # pixel 0 is transparent in frame 3: with disposal 3 honored it
    # shows frame 1's value (10); the draw-over bug would show 20
    assert f3[0, 0, 0] == 10
    assert f3[0, 1, 0] == 30
