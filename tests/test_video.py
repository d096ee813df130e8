"""Video containers (operators/video.py): AVI (MJPEG + raw DIB) and
Y4M decode/encode, header probes, and the multimodal integration.

Roundtrip strategy mirrors test_codecs.py: raw-DIB and mono-Y4M paths
are EXACT; MJPEG and chroma-subsampled paths assert closeness (JPEG /
4:2:0 are lossy); the DHT-less MJPEG stream must decode IDENTICAL to
its DHT-carrying twin (the Annex K injection oracle)."""

import numpy as np
import pytest

from parq_tools_spark.operators.codecs import (
    decode_media,
    media_features,
    probe_media_header,
    sniff_format,
)
from parq_tools_spark.operators.video import (
    avi_scan_meta,
    decode_avi,
    decode_y4m,
    encode_avi,
    encode_y4m,
    ensure_mjpeg_huffman,
    y4m_scan_meta,
)


def _frames(n=4, h=32, w=40):
    out = []
    for i in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        out.append(
            np.stack(
                [(xx * 3 + i * 20) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256],
                axis=2,
            ).astype(np.uint8)
        )
    return out


def test_avi_dib_roundtrip_exact():
    frames = _frames()
    blob = encode_avi(frames, fps=5, codec="dib")
    assert sniff_format(blob) == "avi"
    d = decode_avi(blob)
    assert (d["width"], d["height"], d["n_frames"]) == (40, 32, 4)
    assert d["duration_ms"] == 4 * 200
    for (delay, fr), src in zip(d["frames"], frames):
        assert delay == 200
        np.testing.assert_array_equal(fr, src)


def test_avi_mjpeg_roundtrip_close_and_dhtless_identical():
    frames = _frames()
    with_dht = encode_avi(frames, fps=10, codec="mjpeg", quality=95)
    spec_classic = encode_avi(
        frames, fps=10, codec="mjpeg", quality=95, omit_huffman=True
    )
    assert len(spec_classic) < len(with_dht)  # DHT really stripped
    d1, d2 = decode_avi(with_dht), decode_avi(spec_classic)
    for (_, f1), (_, f2), src in zip(d1["frames"], d2["frames"], frames):
        np.testing.assert_array_equal(f1, f2)  # injection == original tables
        assert np.abs(f1.astype(int) - src.astype(int)).mean() < 3.0


def test_ensure_mjpeg_huffman_passthrough():
    from parq_tools_spark.operators.jpeg import encode_jpeg

    j = encode_jpeg(_frames(1)[0], quality=90)
    assert ensure_mjpeg_huffman(j) is j  # DHT present: untouched


def test_avi_scan_meta_and_probe_header_only():
    frames = _frames(n=6)
    blob = encode_avi(frames, fps=3, codec="dib")
    meta = avi_scan_meta(blob)
    assert meta == {
        "width": 40,
        "height": 32,
        "n_frames": 6,
        "duration_ms": 2000,  # round(6 x 333333us) — matches decode
    }
    h = probe_media_header(blob)
    assert (h["modality"], h["format"]) == ("video", "avi")
    assert (h["width"], h["height"]) == (40, 32)
    # the probe must not need the frame payloads: truncate after the
    # headers and it still answers
    h2 = probe_media_header(blob[:300])
    assert h2 is not None and h2["width"] == 40


def test_avi_dropped_frame_repeats_previous():
    frames = _frames(n=2)
    blob = bytearray(encode_avi(frames, fps=5, codec="dib"))
    # append a zero-length 00db chunk inside movi by rebuilding: easier
    # to decode the original then splice — instead encode 3 frames and
    # zero out the middle chunk's size is fragile; exercise via API:
    d = decode_avi(bytes(blob))
    assert d["n_frames"] == 2  # baseline sanity for the splice below

    import struct

    # hand-build a movi with frame0, empty chunk, frame1
    from parq_tools_spark.operators.video import _encode_dib_frame

    p0 = _encode_dib_frame(frames[0])
    p1 = _encode_dib_frame(frames[1])

    def chunk(fourcc, body):
        return fourcc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    one = encode_avi([frames[0]], fps=5, codec="dib")
    movi_old = chunk(b"LIST", b"movi" + chunk(b"00db", p0))
    movi_new = chunk(
        b"LIST",
        b"movi" + chunk(b"00db", p0) + chunk(b"00db", b"") + chunk(b"00db", p1),
    )
    assert movi_old in one
    spliced = one.replace(movi_old, movi_new)
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    d2 = decode_avi(spliced)
    assert d2["n_frames"] == 3
    np.testing.assert_array_equal(d2["frames"][1][1], frames[0])  # repeat
    np.testing.assert_array_equal(d2["frames"][2][1], frames[1])


def test_avi_unsupported_codec_raises_and_degrades():
    blob = bytearray(encode_avi(_frames(1), fps=5, codec="mjpeg"))
    i = blob.find(b"MJPG")  # strh fccHandler
    j = blob.find(b"MJPG", i + 1)  # strf biCompression
    for k in (i, j):
        blob[k : k + 4] = b"H264"
    with pytest.raises(NotImplementedError):
        decode_avi(bytes(blob))
    assert decode_media(bytes(blob)) is None  # callers degrade to stub


def test_y4m_roundtrips_and_meta():
    frames = _frames(n=3, h=18, w=22)  # odd-ish dims exercise chroma pad
    for cs, tol in (("444", 1.0), ("420jpeg", 6.0)):
        blob = encode_y4m(frames, fps=(25, 1), colorspace=cs)
        assert sniff_format(blob) == "y4m"
        d = decode_y4m(blob)
        assert (d["width"], d["height"], d["n_frames"]) == (22, 18, 3)
        for (_, fr), src in zip(d["frames"], frames):
            assert np.abs(fr.astype(int) - src.astype(int)).mean() < tol
    meta = y4m_scan_meta(encode_y4m(frames, fps=(25, 1)))
    assert meta == {"width": 22, "height": 18, "n_frames": 3, "duration_ms": 120}


def test_y4m_mono_exact():
    gray = [np.full((6, 8), v, dtype=np.uint8) for v in (0, 128, 255)]
    blob = encode_y4m(gray, fps=(10, 1), colorspace="mono")
    d = decode_y4m(blob)
    for (_, fr), src in zip(d["frames"], gray):
        np.testing.assert_array_equal(fr[:, :, 0], src)
        np.testing.assert_array_equal(fr[:, :, 1], src)


def test_video_decode_media_and_features_dispatch():
    frames = _frames(n=5)
    for blob, fmt in (
        (encode_avi(frames, fps=5, codec="dib"), "avi"),
        (encode_y4m(frames, fps=(5, 1)), "y4m"),
    ):
        m = decode_media(blob)
        assert m["modality"] == "video" and m["format"] == fmt
        assert m["n_frames"] == 5 and m["duration_ms"] == 1000
        f = media_features(blob)
        assert f[:3].tolist() == [40.0, 32.0, 5.0]
        assert f[7] == 1000.0


def test_corrupt_and_truncated_video_degrade_not_crash():
    frames = _frames(n=2)
    avi = encode_avi(frames, fps=5, codec="mjpeg")
    y4m = encode_y4m(frames, fps=(5, 1))
    corrupt = [
        avi[: len(avi) // 3],  # truncated mid-movi
        avi[:40],  # headers cut off
        b"RIFF\x10\x00\x00\x00AVI LIST\x04\x00\x00\x00hdrl",  # no streams
        y4m[:30],  # header only, no frames
        b"YUV4MPEG2 W4 H4 F0:0 C444\n",  # zero fps
        bytes(y4m).replace(b"C444", b"C999", 1),  # unknown colourspace
    ]
    for blob in corrupt:
        assert decode_media(blob) is None
    # probe degrades too (None or partial, never raises)
    for blob in corrupt:
        probe_media_header(blob)


def test_sample_frames_real_avi_and_y4m_frames(spark):
    """sample_frames yields REAL PNG frames for AVI (DHT-less MJPEG)
    and Y4M at the right timestamps; mp4 stays on the slice stub."""
    from parq_tools_spark.operators.codecs import decode_png
    from parq_tools_spark.operators.multimodal import (
        attach_media_metadata,
        sample_frames,
    )

    frames = _frames(n=6)
    avi = encode_avi(frames, fps=2, codec="mjpeg", quality=95, omit_huffman=True)
    y4m = encode_y4m(frames, fps=(2, 1), colorspace="444")
    mp4 = b"\x00\x00\x00\x18ftypmp42" + bytes(64)
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(y4m)), (3, bytearray(mp4))],
        "media_id long, blob binary",
    )
    media = attach_media_metadata(df, probe=True, modality="video", fmt="mp4")
    out = sample_frames(media, every_ms=1000).collect()
    by_key = {(r.media_id, r.frame_idx): r for r in out}
    # 3000ms / 1000ms -> 3 frames each for avi + y4m, 1 stub for mp4
    assert sorted(k for k in by_key) == [
        (1, 0), (1, 1), (1, 2), (2, 0), (2, 1), (2, 2), (3, 0),
    ]
    for mid in (1, 2):
        r = by_key[(mid, 1)]
        assert r.ts_ms == 1000
        arr = decode_png(bytes(r.frame_blob))[:, :, :3]
        # ts=1000 at 2fps (500ms/frame) falls in frame index 2
        err = np.abs(arr.astype(int) - frames[2].astype(int)).mean()
        assert err < 3.0
    assert len(bytes(by_key[(3, 0)].frame_blob)) == 16


# ------------------------------------------------- property roundtrips
from hypothesis import given, settings
from hypothesis import strategies as st


def _rand_frames(draw, max_frames=4, max_dim=24):
    n = draw(st.integers(1, max_frames))
    h = draw(st.integers(1, max_dim))
    w = draw(st.integers(1, max_dim))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_avi_dib_roundtrip_property(data):
    """Any frame stack (odd dims included — row padding) roundtrips
    EXACTLY through raw-DIB AVI."""
    frames = _rand_frames(data.draw)
    d = decode_avi(encode_avi(frames, fps=7, codec="dib"))
    assert d["n_frames"] == len(frames)
    for (_, fr), src in zip(d["frames"], frames):
        np.testing.assert_array_equal(fr, src)


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_y4m_mono_roundtrip_property(data):
    """Grayscale Y4M stores Y raw: exact for any size/count."""
    frames = [f[:, :, 0] for f in _rand_frames(data.draw)]
    blob = encode_y4m(frames, fps=(13, 1), colorspace="mono")
    d = decode_y4m(blob)
    meta = y4m_scan_meta(blob)
    assert meta["n_frames"] == d["n_frames"] == len(frames)
    for (_, fr), src in zip(d["frames"], frames):
        np.testing.assert_array_equal(fr[:, :, 0], src)


@settings(max_examples=15, deadline=None)
@given(st.data())
def test_y4m_444_roundtrip_bounded_error(data):
    """Full-chroma Y4M roundtrip error is bounded by the YCbCr<->RGB
    integer rounding (never structural)."""
    frames = _rand_frames(data.draw, max_frames=2)
    d = decode_y4m(encode_y4m(frames, fps=(10, 1), colorspace="444"))
    for (_, fr), src in zip(d["frames"], frames):
        assert np.abs(fr.astype(int) - src.astype(int)).max() <= 3


def test_avi_top_down_dib_decodes_unflipped():
    """biHeight < 0 marks top-down rows: the decoder must NOT apply
    the bottom-up flip. Patch the header sign on an encoded AVI — the
    stored rows are bottom-up, so a top-down interpretation yields the
    vertically mirrored image."""
    import struct

    frames = _frames(n=1)
    blob = bytearray(encode_avi(frames, fps=5, codec="dib"))
    i = blob.find(b"strf") + 8  # BITMAPINFOHEADER start
    w, h = struct.unpack_from("<ii", blob, i + 4)
    struct.pack_into("<i", blob, i + 8, -h)
    d = decode_avi(bytes(blob))
    np.testing.assert_array_equal(d["frames"][0][1], frames[0][::-1])


def test_avi_leading_dropped_frame_fills_with_first():
    import struct

    from parq_tools_spark.operators.video import _encode_dib_frame

    frames = _frames(n=2)

    def chunk(fourcc, body):
        return fourcc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    one = encode_avi([frames[0]], fps=5, codec="dib")
    p0 = _encode_dib_frame(frames[0])
    movi_old = chunk(b"LIST", b"movi" + chunk(b"00db", p0))
    movi_new = chunk(
        b"LIST",
        b"movi" + chunk(b"00db", b"") + chunk(b"00db", p0)
        + chunk(b"00db", _encode_dib_frame(frames[1])),
    )
    spliced = one.replace(movi_old, movi_new)
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    d = decode_avi(spliced)
    assert d["n_frames"] == 3  # the leading drop still occupies a slot
    np.testing.assert_array_equal(d["frames"][0][1], frames[0])
    np.testing.assert_array_equal(d["frames"][2][1], frames[1])


def test_y4m_frame_parameter_headers():
    """Frame headers may carry parameters ('FRAME Ixyz\\n'): decode
    walks them exactly; the probe measures the first header's length
    instead of assuming the bare 6 bytes."""
    frames = _frames(n=4)
    blob = encode_y4m(frames, fps=(5, 1), colorspace="mono").replace(
        b"FRAME\n", b"FRAME Ixyz\n"
    )
    d = decode_y4m(blob)
    assert d["n_frames"] == 4
    meta = y4m_scan_meta(blob)
    assert meta["n_frames"] == 4 and meta["duration_ms"] == 800


def test_ntsc_rate_timeline_does_not_drift():
    """29.97 fps (F30000:1001): cumulative rounding keeps the decode
    timeline within 1 ms of n * period; probe and decode agree."""
    frames = [np.zeros((2, 2), dtype=np.uint8)] * 30
    blob = encode_y4m(frames, fps=(30000, 1001), colorspace="mono")
    d = decode_y4m(blob)
    assert d["duration_ms"] == round(30 * 1001000 / 30000) == 1001
    assert y4m_scan_meta(blob)["duration_ms"] == 1001
    delays = [dl for dl, _ in d["frames"]]
    assert set(delays) <= {33, 34} and sum(delays) == 1001
