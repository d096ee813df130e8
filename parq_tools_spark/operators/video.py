"""Pure-Python/numpy video containers: AVI and Y4M (beyond-reference).

The reference (parq-tools) has no media surface at all; this module
extends the repo's LLM-pipeline tier so that ``sample_frames`` /
``extract_features`` operate on REAL video containers without ffmpeg:

- **AVI** (RIFF): MJPEG streams decode through the repo's own baseline
  JPEG codec (``operators/jpeg.py``) — including spec-classic MJPEG
  frames that OMIT Huffman tables (the decoder injects the Annex K
  tables, per the OpenDML/MJPEG convention); uncompressed 24-bit DIB
  streams decode exactly. The encoder writes both flavours (plus an
  ``idx1`` index) so the decode paths roundtrip-test in codec-less
  environments.
- **Y4M** (YUV4MPEG2): the trivial raw-frame interchange format —
  C444 / C422 / C420* / Cmono colourspaces, full-range BT.601
  YCbCr<->RGB (the same coefficients as the JPEG codec, so AVI/MJPEG
  and Y4M roundtrips agree).

Containers this cannot express (H.264-in-MP4, VP9-in-WebM) still
resolve to the deterministic stub — inter-frame codecs genuinely
require ffmpeg; that divergence stays documented, not faked.

Like the rest of the codec tier these are plain ``bytes <-> numpy``
functions called from ``mapInPandas`` closures on executors: one blob
decodes entirely inside one task, the driver never sees pixels, and a
corrupt container raises (the callers in ``operators/codecs.py`` /
``operators/multimodal.py`` degrade per blob, never killing a batch).
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

__all__ = [
    "decode_avi",
    "encode_avi",
    "avi_scan_meta",
    "decode_y4m",
    "encode_y4m",
    "y4m_scan_meta",
    "ensure_mjpeg_huffman",
]


# --------------------------------------------------------------- RIFF
def _riff_chunks(blob: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for the chunk run in
    [pos, end); chunks are word-aligned (odd sizes get a pad byte)."""
    while pos + 8 <= end:
        fourcc = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = pos + 8
        if body + size > end:
            size = max(0, end - body)  # truncated final chunk
        yield fourcc, body, size
        pos = body + size + (size & 1)


def _find_list(blob: bytes, pos: int, end: int, list_type: bytes):
    """(body_start, body_end) of the first LIST of ``list_type``."""
    for fourcc, body, size in _riff_chunks(blob, pos, end):
        if fourcc == b"LIST" and blob[body : body + 4] == list_type:
            return body + 4, body + size
    return None


def _parse_avi_headers(blob: bytes) -> dict:
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not an AVI container")
    top_end = min(len(blob), 8 + struct.unpack_from("<I", blob, 4)[0])
    hdrl = _find_list(blob, 12, top_end, b"hdrl")
    if hdrl is None:
        raise ValueError("AVI: no hdrl list")
    h0, h1 = hdrl
    meta = {
        "width": None,
        "height": None,
        "n_frames": None,
        "us_per_frame": None,
        "stream_no": None,
        "compression": None,
        "bit_count": None,
        "top_down": False,
        "top_end": top_end,
    }
    stream_idx = 0
    for fourcc, body, size in _riff_chunks(blob, h0, h1):
        if fourcc == b"avih" and size >= 40:
            (uspf, _, _, _, total, _, _, _, w, h) = struct.unpack_from(
                "<10I", blob, body
            )
            meta["us_per_frame"] = uspf
            meta["n_frames"] = total
            meta["width"], meta["height"] = w, h
        elif fourcc == b"LIST" and blob[body : body + 4] == b"strl":
            is_video = False
            for f2, b2, s2 in _riff_chunks(blob, body + 4, body + size):
                if f2 == b"strh" and s2 >= 36:
                    if blob[b2 : b2 + 4] == b"vids":
                        is_video = True
                        scale, rate = struct.unpack_from("<II", blob, b2 + 20)
                        if rate and meta["us_per_frame"] is None:
                            meta["us_per_frame"] = int(1_000_000 * scale / rate)
                elif f2 == b"strf" and is_video and s2 >= 40:
                    # BITMAPINFOHEADER; biHeight < 0 = top-down rows
                    (_, w, h, _, bc, comp) = struct.unpack_from(
                        "<IiiHHI", blob, b2
                    )
                    meta["stream_no"] = stream_idx
                    meta["compression"] = struct.pack("<I", comp)
                    meta["bit_count"] = bc
                    meta["top_down"] = h < 0
                    if meta["width"] is None:
                        meta["width"], meta["height"] = w, abs(h)
            stream_idx += 1
    if meta["stream_no"] is None:
        raise ValueError("AVI: no video stream")
    return meta


def avi_scan_meta(blob: bytes) -> dict:
    """Header-only probe (no frame decode): width/height/n_frames/
    duration_ms from ``avih``/``strh`` — O(header bytes) regardless of
    container size, the shape ``attach_media_metadata(probe=True)``
    needs at corpus scale."""
    m = _parse_avi_headers(blob)
    uspf = m["us_per_frame"] or 0
    n = m["n_frames"] or 0
    return {
        "width": m["width"],
        "height": m["height"],
        "n_frames": n,
        # cumulative rounding matches decode_avi's summed delays
        "duration_ms": round(n * uspf / 1000) if uspf else None,
    }


# Annex K Huffman tables as raw DHT payloads, built lazily from the
# JPEG codec's constants (single source of truth).
_STD_DHT_SEGMENT: Optional[bytes] = None


def _std_dht_segment() -> bytes:
    global _STD_DHT_SEGMENT
    if _STD_DHT_SEGMENT is None:
        from parq_tools_spark.operators.jpeg import (
            STD_AC_CHROMA,
            STD_AC_LUMA,
            STD_DC_CHROMA,
            STD_DC_LUMA,
        )

        out = b""
        for tc, th, (bits, values) in (
            (0, 0, STD_DC_LUMA),
            (1, 0, STD_AC_LUMA),
            (0, 1, STD_DC_CHROMA),
            (1, 1, STD_AC_CHROMA),
        ):
            body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
            out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
        _STD_DHT_SEGMENT = out
    return _STD_DHT_SEGMENT


def ensure_mjpeg_huffman(frame: bytes) -> bytes:
    """Spec-classic MJPEG omits DHT from every frame (the decoder is
    supposed to know Annex K). Insert the standard tables before the
    first SOS if the frame carries none; frames that already have DHT
    pass through untouched."""
    if len(frame) < 4 or frame[:2] != b"\xff\xd8":
        return frame
    p = 2
    while p + 4 <= len(frame):
        if frame[p] != 0xFF:
            break
        marker = frame[p + 1]
        if marker == 0xC4:  # DHT present: nothing to do
            return frame
        if marker == 0xDA:  # SOS reached without DHT: inject
            return frame[:p] + _std_dht_segment() + frame[p:]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            p += 2
            continue
        (seglen,) = struct.unpack_from(">H", frame, p + 2)
        p += 2 + seglen
    return frame


def _strip_jpeg_huffman(frame: bytes) -> bytes:
    """Drop every DHT segment (encoder option: emit spec-classic
    MJPEG so tests exercise the injection path)."""
    out = bytearray()
    p = 0
    out += frame[:2]
    p = 2
    while p + 4 <= len(frame):
        if frame[p] != 0xFF:
            break
        marker = frame[p + 1]
        if marker == 0xDA:
            out += frame[p:]
            return bytes(out)
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            out += frame[p : p + 2]
            p += 2
            continue
        (seglen,) = struct.unpack_from(">H", frame, p + 2)
        if marker != 0xC4:
            out += frame[p : p + 2 + seglen]
        p += 2 + seglen
    return bytes(out)


def _decode_dib_frame(
    data: bytes, width: int, height: int, top_down: bool = False
) -> np.ndarray:
    """24-bit BGR rows padded to 4 bytes -> (H, W, 3) RGB. Rows are
    bottom-up unless the header's biHeight was negative."""
    stride = (width * 3 + 3) & ~3
    need = stride * height
    if len(data) < need:
        raise ValueError(f"DIB frame short: {len(data)} < {need}")
    rows = np.frombuffer(data[:need], dtype=np.uint8).reshape(height, stride)
    bgr = rows[:, : width * 3].reshape(height, width, 3)
    if not top_down:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR -> RGB


def _encode_dib_frame(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    return rows.tobytes()


def _with_uniform_delays(
    arrs: List[np.ndarray], us_per_frame: float
) -> List[Tuple[int, np.ndarray]]:
    """(delay_ms, frame) with delays from CUMULATIVE rounding —
    delay_i = round((i+1)*T) - round(i*T) — so the summed timeline
    never drifts more than 1 ms from i * T, however long the stream
    (naive per-frame int(T) truncation loses ~0.37 ms/frame at NTSC
    rates: 11 frames of drift over 1000)."""
    ms = us_per_frame / 1000.0
    return [
        (max(1, round((i + 1) * ms) - round(i * ms)), a)
        for i, a in enumerate(arrs)
    ]


def _as_rgb(frame: np.ndarray) -> np.ndarray:
    if frame.ndim == 2:
        return np.repeat(frame[:, :, None], 3, axis=2)
    if frame.shape[2] >= 3:
        return frame[:, :, :3]
    return np.repeat(frame[:, :, :1], 3, axis=2)


def decode_avi(blob: bytes) -> dict:
    """Decode an AVI container's video stream to RGB frames.

    Returns ``{"width", "height", "n_frames", "duration_ms",
    "frames": [(delay_ms, (H, W, 3) uint8), ...]}`` — the same frame
    list shape as ``codecs.decode_gif``, so every video consumer
    (``media_features``, ``sample_frames``) treats GIF/AVI uniformly.
    MJPEG ('MJPG') and uncompressed DIB (BI_RGB 24-bit) streams are
    supported; zero-length frame chunks (the dropped-frame
    convention) repeat the previous frame; other codecs raise
    ``NotImplementedError`` (-> the callers' documented stub tier).
    """
    m = _parse_avi_headers(blob)
    movi = _find_list(blob, 12, m["top_end"], b"movi")
    if movi is None:
        raise ValueError("AVI: no movi list")
    comp = (m["compression"] or b"\x00\x00\x00\x00").upper()
    is_mjpeg = comp in (b"MJPG", b"JPEG", b"DMB1")
    is_rgb = comp == b"\x00\x00\x00\x00"
    if not (is_mjpeg or is_rgb):
        raise NotImplementedError(
            f"AVI codec {comp!r} needs ffmpeg (only MJPG / raw DIB here)"
        )
    if is_rgb and m["bit_count"] != 24:
        raise NotImplementedError(
            f"AVI raw DIB bit depth {m['bit_count']} unsupported (24 only)"
        )
    prefix = b"%02d" % m["stream_no"]
    want = (prefix + b"dc", prefix + b"db")

    from parq_tools_spark.operators.jpeg import decode_jpeg

    arrs: List[np.ndarray] = []
    pending_drops = 0  # zero-size chunks seen before any decoded frame

    def walk(pos: int, end: int):
        nonlocal pending_drops
        for fourcc, body, size in _riff_chunks(blob, pos, end):
            if fourcc == b"LIST" and blob[body : body + 4] == b"rec ":
                walk(body + 4, body + size)
            elif fourcc in want:
                data = blob[body : body + size]
                if size == 0:  # dropped frame: repeat previous
                    if arrs:
                        arrs.append(arrs[-1])
                    else:
                        # a leading drop still occupies a frame slot;
                        # fill with the first real frame once it lands
                        pending_drops += 1
                    continue
                if is_mjpeg:
                    arr = _as_rgb(decode_jpeg(ensure_mjpeg_huffman(data)))
                else:
                    arr = _decode_dib_frame(
                        data, m["width"], m["height"], m["top_down"]
                    )
                if pending_drops:
                    arrs.extend([arr] * pending_drops)
                    pending_drops = 0
                arrs.append(arr)

    walk(movi[0], movi[1])
    if not arrs:
        raise ValueError("AVI: video stream has no frames")
    frames = _with_uniform_delays(arrs, m["us_per_frame"] or 33_333)
    return {
        "width": arrs[0].shape[1],
        "height": arrs[0].shape[0],
        "n_frames": len(arrs),
        "duration_ms": sum(d for d, _ in frames),
        "frames": frames,
    }


def encode_avi(
    frames,
    fps: int = 10,
    codec: str = "mjpeg",
    quality: int = 90,
    omit_huffman: bool = False,
) -> bytes:
    """Write (H, W, 3)/(H, W) uint8 frames as an AVI.

    ``codec="mjpeg"`` entropy-codes each frame with the repo JPEG
    encoder (``omit_huffman=True`` strips DHT for spec-classic MJPEG,
    exercising the decoder's Annex K injection); ``codec="dib"``
    writes exact 24-bit BI_RGB frames. Emits avih/strh/strf + an
    idx1 index like real muxers do."""
    if not frames:
        raise ValueError("encode_avi: no frames")
    arrs = [_as_rgb(np.asarray(f, dtype=np.uint8)) for f in frames]
    h, w = arrs[0].shape[:2]
    if any(a.shape[:2] != (h, w) for a in arrs):
        raise ValueError("encode_avi: frames must share one size")
    if codec == "mjpeg":
        from parq_tools_spark.operators.jpeg import encode_jpeg

        payloads = [encode_jpeg(a, quality=quality) for a in arrs]
        if omit_huffman:
            payloads = [_strip_jpeg_huffman(p) for p in payloads]
        fourcc_comp = b"MJPG"
        chunk_id = b"00dc"
    elif codec == "dib":
        payloads = [_encode_dib_frame(a) for a in arrs]
        fourcc_comp = b"\x00\x00\x00\x00"
        chunk_id = b"00db"
    else:
        raise ValueError(f"encode_avi: unknown codec {codec!r}")

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    uspf = max(1, 1_000_000 // fps)
    maxbuf = max(len(p) for p in payloads)
    avih = struct.pack(
        "<14I", uspf, maxbuf * fps, 0, 0x10, len(arrs), 0, 1, maxbuf, w, h,
        0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + fourcc_comp
        + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, 1, fps, 0, len(arrs),
                      maxbuf, -1, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24,
        struct.unpack("<I", fourcc_comp)[0] if codec == "mjpeg" else 0,
        len(payloads[0]), 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    idx_entries = []
    for p in payloads:
        idx_entries.append((len(movi_body), len(p)))
        movi_body += chunk(chunk_id, p)
    movi = chunk(b"LIST", movi_body)
    idx1 = b"".join(
        chunk_id + struct.pack("<III", 0x10, off, size)
        for off, size in idx_entries
    )
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------- Y4M
_Y4M_MAGIC = b"YUV4MPEG2"


def _parse_y4m_header(blob: bytes) -> dict:
    nl = blob.find(b"\n", 0, 512)
    if not blob.startswith(_Y4M_MAGIC) or nl < 0:
        raise ValueError("not a YUV4MPEG2 stream")
    params = {"C": "420jpeg", "F": "30:1"}
    for tok in blob[len(_Y4M_MAGIC) : nl].split(b" "):
        if tok:
            params[chr(tok[0])] = tok[1:].decode("ascii", "replace")
    if "W" not in params or "H" not in params:
        raise ValueError("Y4M: missing W/H")
    w, h = int(params["W"]), int(params["H"])
    num, den = (int(x) for x in params["F"].split(":"))
    cs = params["C"]
    if cs.startswith("420"):
        frame_bytes = w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2)
    elif cs.startswith("422"):
        frame_bytes = w * h + 2 * ((w + 1) // 2) * h
    elif cs.startswith("444"):
        frame_bytes = 3 * w * h
    elif cs.startswith("mono"):
        frame_bytes = w * h
    else:
        raise NotImplementedError(f"Y4M colourspace {cs!r}")
    return {
        "width": w,
        "height": h,
        "fps": (num, den),
        "colorspace": cs,
        "frame_bytes": frame_bytes,
        "data_start": nl + 1,
    }


def y4m_scan_meta(blob: bytes) -> dict:
    """Header-only probe: frame size is fixed per stream, so the frame
    COUNT is byte arithmetic — O(1) however long the stream. The
    per-frame header length is measured from the FIRST frame (frame
    headers may carry parameters, e.g. 'FRAME Ixyz\\n'); streams whose
    frame headers vary in length need the full decode for an exact
    count."""
    m = _parse_y4m_header(blob)
    ds = m["data_start"]
    nl = blob.find(b"\n", ds, ds + 256)
    header_len = (nl - ds + 1) if nl > 0 and blob[ds : ds + 5] == b"FRAME" else 6
    per = m["frame_bytes"] + header_len
    n = max(0, (len(blob) - ds)) // per
    num, den = m["fps"]
    return {
        "width": m["width"],
        "height": m["height"],
        "n_frames": int(n),
        "duration_ms": round(n * 1000 * den / num) if num else None,
    }


def _yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Full-range BT.601 (JPEG-style) — matches operators/jpeg.py."""
    yf = y.astype(np.float64)
    cb = u.astype(np.float64) - 128.0
    cr = v.astype(np.float64) - 128.0
    r = yf + 1.402 * cr
    g = yf - 0.344136 * cb - 0.714136 * cr
    b = yf + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2).round(), 0, 255).astype(np.uint8)


def _rgb_to_yuv(arr: np.ndarray):
    r = arr[:, :, 0].astype(np.float64)
    g = arr[:, :, 1].astype(np.float64)
    b = arr[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    clip = lambda p: np.clip(p.round(), 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(cb), clip(cr)


def _upsample2(p: np.ndarray, h: int, w: int, horiz_only: bool = False) -> np.ndarray:
    out = np.repeat(p, 2, axis=1)[:, :w]
    if not horiz_only:
        out = np.repeat(out, 2, axis=0)[:h]
    return out[:h, :w]


def decode_y4m(blob: bytes) -> dict:
    """Decode a YUV4MPEG2 stream to RGB frames (same dict shape as
    :func:`decode_avi`)."""
    m = _parse_y4m_header(blob)
    w, h = m["width"], m["height"]
    cs = m["colorspace"]
    num, den = m["fps"]
    cw = (w + 1) // 2
    ch = (h + 1) // 2
    arrs: List[np.ndarray] = []
    pos = m["data_start"]
    while pos < len(blob):
        nl = blob.find(b"\n", pos, pos + 256)
        if nl < 0 or blob[pos : pos + 5] != b"FRAME":
            break
        pos = nl + 1
        if pos + m["frame_bytes"] > len(blob):
            break  # truncated tail frame
        raw = np.frombuffer(blob, dtype=np.uint8, count=m["frame_bytes"], offset=pos)
        pos += m["frame_bytes"]
        y = raw[: w * h].reshape(h, w)
        if cs.startswith("mono"):
            rgb = np.repeat(y[:, :, None], 3, axis=2).copy()
        elif cs.startswith("444"):
            u = raw[w * h : 2 * w * h].reshape(h, w)
            v = raw[2 * w * h :].reshape(h, w)
            rgb = _yuv_to_rgb(y, u, v)
        elif cs.startswith("422"):
            u = raw[w * h : w * h + cw * h].reshape(h, cw)
            v = raw[w * h + cw * h :].reshape(h, cw)
            rgb = _yuv_to_rgb(
                y, _upsample2(u, h, w, True), _upsample2(v, h, w, True)
            )
        else:  # 420 family
            u = raw[w * h : w * h + cw * ch].reshape(ch, cw)
            v = raw[w * h + cw * ch :].reshape(ch, cw)
            rgb = _yuv_to_rgb(y, _upsample2(u, h, w), _upsample2(v, h, w))
        arrs.append(rgb)
    if not arrs:
        raise ValueError("Y4M: no complete frames")
    frames = _with_uniform_delays(
        arrs, 1_000_000 * den / num if num else 33_333
    )
    return {
        "width": w,
        "height": h,
        "n_frames": len(arrs),
        "duration_ms": sum(d for d, _ in frames),
        "frames": frames,
    }


def encode_y4m(frames, fps=(30, 1), colorspace: str = "444") -> bytes:
    """Write frames as YUV4MPEG2. ``colorspace``: 444 (lossless chroma,
    the roundtrip-test flavour), 420jpeg (2x2 box-averaged chroma), or
    mono (grayscale)."""
    if not frames:
        raise ValueError("encode_y4m: no frames")
    arrs = [_as_rgb(np.asarray(f, dtype=np.uint8)) for f in frames]
    h, w = arrs[0].shape[:2]
    if any(a.shape[:2] != (h, w) for a in arrs):
        raise ValueError("encode_y4m: frames must share one size")
    num, den = fps
    out = bytearray(
        b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C%s\n"
        % (w, h, num, den, colorspace.encode())
    )
    for a in arrs:
        out += b"FRAME\n"
        if colorspace.startswith("mono"):
            y = np.clip(
                (0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]).round(),
                0, 255,
            ).astype(np.uint8)
            out += y.tobytes()
            continue
        y, u, v = _rgb_to_yuv(a)
        if colorspace.startswith("444"):
            out += y.tobytes() + u.tobytes() + v.tobytes()
        elif colorspace.startswith("420"):
            hh, ww = (h + 1) // 2 * 2, (w + 1) // 2 * 2

            def down2(p):
                pp = np.pad(
                    p.astype(np.float64),
                    ((0, hh - h), (0, ww - w)),
                    mode="edge",
                )
                q = (
                    pp[0::2, 0::2] + pp[1::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 1::2]
                ) / 4.0
                return np.clip(q.round(), 0, 255).astype(np.uint8)

            out += y.tobytes() + down2(u).tobytes() + down2(v).tobytes()
        else:
            raise ValueError(f"encode_y4m: unknown colourspace {colorspace!r}")
    return bytes(out)
