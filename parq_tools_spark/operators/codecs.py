"""Self-contained media codecs for the multimodal operators.

Decode priority per blob: (1) PIL / ffmpeg when importable (probed
lazily, absent in this container), (2) the pure-numpy decoders — PNG
(8-bit, non-interlaced), BMP (24-bit uncompressed), WAV (PCM, via
stdlib ``wave``), GIF (LZW, incl. animation — the video-like path)
here, baseline+progressive JPEG in ``operators/jpeg.py``, and the
AVI (MJPEG / raw DIB) + Y4M video containers in
``operators/video.py`` — which need NO third-party codec, so the
decode path is real wherever numpy runs, (3) none: the caller falls
back to its documented deterministic stub
(``multimodal.decode_stub``; in practice that now means only esoteric
image formats and inter-frame video codecs (H.264/VP9 in mp4/webm) —
ffmpeg genuinely required).

Everything here is a plain ``bytes -> numpy`` function: executors call
it from inside ``mapInPandas`` closures, the driver never sees a blob.
The pure decoders favour clarity over speed (per-row unfilter loop) —
at production scale you install PIL and the probe picks it up; these
keep the pipeline REAL, not stubbed, in codec-less environments and
serve as the oracle for the plumbing tests.
"""

from __future__ import annotations

import io
import struct
import zlib
from typing import Optional

import numpy as np

__all__ = [
    "have_pil",
    "sniff_format",
    "probe_media_header",
    "decode_image",
    "decode_audio",
    "decode_media",
    "decode_gif",
    "encode_gif",
    "media_features",
    "encode_png",
    "resize_nearest",
    "perceptual_hash",
    "encode_wav",
    "resample_linear",
]

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def have_pil() -> bool:
    """True when PIL is importable (probed per call; cheap after the
    first import either way)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def sniff_format(blob: Optional[bytes]) -> Optional[str]:
    """Identify a blob by magic bytes: png/bmp/wav/jpeg/gif, else None."""
    if not blob or len(blob) < 12:
        return None
    if blob[:8] == _PNG_MAGIC:
        return "png"
    if blob[:2] == b"BM":
        return "bmp"
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "wav"
    if blob[:4] == b"RIFF" and blob[8:12] == b"AVI ":
        return "avi"
    if blob[:9] == b"YUV4MPEG2":
        return "y4m"
    if blob[:2] == b"\xff\xd8":
        return "jpeg"
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return None


# ------------------------------------------------------------------ PNG
def _png_chunks(blob: bytes):
    pos = 8
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(blob: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to (H, W, C) uint8.

    Color types: 0 gray, 2 RGB, 3 palette (expanded to RGB), 4
    gray+alpha, 6 RGBA. All five scanline filters are unfiltered.
    """
    if blob[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    for ctype, data in _png_chunks(blob):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
    if width is None:
        raise ValueError("PNG without IHDR")
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"pure decoder handles 8-bit non-interlaced PNG only "
            f"(bit_depth={bit_depth}, color_type={color_type}, "
            f"interlace={interlace}); install PIL for the rest"
        )
    channels = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = channels  # bytes per pixel at bit depth 8
    for y in range(height):
        line = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype = line[0]
        cur = np.frombuffer(line[1:], dtype=np.uint8).astype(np.int32)
        if ftype == 0:
            pass
        elif ftype == 2:  # Up
            cur = (cur + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth scan left-to-right
            cur = cur.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    cur[x] = (cur[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (cur[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = c
                    cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    arr = out.reshape(height, width, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        arr = palette[arr[:, :, 0]]
    return arr


def _filter_row(ftype: int, cur: np.ndarray, prev: np.ndarray, bpp: int):
    """Apply PNG filter ``ftype`` to a raw row (encode side)."""
    cur = cur.astype(np.int32)
    prev = prev.astype(np.int32)
    left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
    upleft = np.concatenate([np.zeros(bpp, dtype=np.int32), prev[:-bpp]])
    if ftype == 0:
        return cur & 0xFF
    if ftype == 1:
        return (cur - left) & 0xFF
    if ftype == 2:
        return (cur - prev) & 0xFF
    if ftype == 3:
        return (cur - ((left + prev) >> 1)) & 0xFF
    p = left + prev - upleft
    pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
    pred = np.where(
        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
    )
    return (cur - pred) & 0xFF


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode (H, W) or (H, W, C) uint8 to PNG (8-bit, non-interlaced).

    ``filter_type`` picks the scanline filter for every row (0-4) —
    the decoder roundtrips all five, which is how the unfilter paths
    are tested without a reference codec.
    """
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise ValueError(f"unsupported channel count {c}")
    flat = arr.reshape(h, w * c)
    rows = bytearray()
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        filtered = _filter_row(filter_type, flat[y], prev, c)
        rows.append(filter_type)
        rows.extend(filtered.astype(np.uint8).tobytes())
        prev = flat[y]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(rows)))
        + chunk(b"IEND", b"")
    )


# ------------------------------------------------------------------ BMP
def decode_bmp(blob: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to (H, W, 3) uint8 RGB."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_offset,) = struct.unpack_from("<I", blob, 10)
    width, height = struct.unpack_from("<ii", blob, 18)
    (bpp,) = struct.unpack_from("<H", blob, 28)
    (compression,) = struct.unpack_from("<I", blob, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"pure decoder handles 24-bit uncompressed BMP only "
            f"(bpp={bpp}, compression={compression}); install PIL"
        )
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3  # rows pad to 4 bytes
    px = np.frombuffer(
        blob, dtype=np.uint8, count=height * stride, offset=data_offset
    ).reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        px = px[::-1]
    return px[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode (H, W, 3) uint8 RGB to a 24-bit bottom-up BMP."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("BMP encoder takes (H, W, 3) RGB")
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
    pixel_data = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(pixel_data), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    return header + pixel_data


# ------------------------------------------------------------------ GIF
def _lzw_decode(data: bytes, min_code_size: int) -> list:
    """GIF-flavoured LZW: variable code width starting at
    min_code_size+1, clear/end codes, dictionary grows to 4096."""
    clear = 1 << min_code_size
    end = clear + 1
    out: list = []
    table: list = []

    def reset_table():
        table.clear()
        table.extend([i] for i in range(clear))
        table.append(None)  # clear
        table.append(None)  # end

    reset_table()
    code_size = min_code_size + 1
    buffer = 0
    bits = 0
    prev: Optional[list] = None
    for byte in data:
        buffer |= byte << bits
        bits += 8
        while bits >= code_size:
            code = buffer & ((1 << code_size) - 1)
            buffer >>= code_size
            bits -= code_size
            if code == clear:
                reset_table()
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError(f"corrupt LZW stream (code {code})")
            out.extend(entry)
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
            prev = entry
    return out


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(blob: bytes) -> list:
    """Decode a GIF87a/89a to ``[(delay_ms, frame), ...]``: one
    (H, W, 4) uint8 RGBA frame per image block, composed per the
    draw-over disposal model (dispose-to-background clears the
    sub-rectangle). Pure Python LZW — no PIL needed. Animated GIFs
    are the one 'video-like' format decodable without ffmpeg, which
    is what makes real frame sampling possible in codec-less
    environments (:func:`multimodal.sample_frames`).
    """
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    width, height = struct.unpack_from("<HH", blob, 6)
    packed = blob[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(blob, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((height, width, 4), dtype=np.uint8)
    frames: list = []
    delay_ms = 0
    transparent = None
    disposal = 0
    while pos < len(blob):
        block = blob[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = blob[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = blob[pos]
                flags = blob[pos + 1]
                (delay_cs,) = struct.unpack_from("<H", blob, pos + 2)
                delay_ms = delay_cs * 10
                transparent = blob[pos + 4] if flags & 1 else None
                disposal = (flags >> 2) & 0x07
                pos += size + 1
            while blob[pos] != 0:  # skip (remaining) sub-blocks
                pos += blob[pos] + 1
            pos += 1
        elif block == 0x2C:  # image descriptor
            left, top, w, h = struct.unpack_from("<HHHH", blob, pos)
            ipacked = blob[pos + 8]
            pos += 9
            lct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                lct = np.frombuffer(blob, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if lct is None:
                raise ValueError("GIF image without a color table")
            min_code_size = blob[pos]
            pos += 1
            data = bytearray()
            while blob[pos] != 0:
                data.extend(blob[pos + 1 : pos + 1 + blob[pos]])
                pos += blob[pos] + 1
            pos += 1
            idx = np.array(
                _lzw_decode(bytes(data), min_code_size)[: w * h],
                dtype=np.int32,
            ).reshape(h, w)
            if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
                de = np.empty_like(idx)
                src = 0
                for start, step in _GIF_INTERLACE_PASSES:
                    rows = range(start, h, step)
                    de[list(rows)] = idx[src : src + len(rows)]
                    src += len(rows)
                idx = de
            rgba = np.dstack(
                [lct[idx], np.full((h, w), 255, dtype=np.uint8)]
            )
            if transparent is not None:
                rgba[idx == transparent, 3] = 0
            region = canvas[top : top + h, left : left + w]
            # disposal 3 = restore-to-previous: the canvas as it was
            # BEFORE this frame drew must come back afterwards
            before = region.copy() if disposal == 3 else None
            opaque = rgba[:, :, 3] == 255
            region[opaque] = rgba[opaque]
            frames.append((delay_ms, canvas.copy()))
            if disposal == 2:  # restore to background: clear the rect
                canvas[top : top + h, left : left + w] = 0
            elif disposal == 3:
                canvas[top : top + h, left : left + w] = before
            delay_ms = 0
            transparent = None
            disposal = 0
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
    return frames


def _gif_scan_meta(blob: bytes) -> dict:
    """Walk a GIF's block structure WITHOUT LZW-decoding pixels:
    dimensions, frame count, total duration. O(bytes) skip-scan."""
    width, height = struct.unpack_from("<HH", blob, 6)
    packed = blob[10]
    pos = 13
    if packed & 0x80:
        pos += (2 << (packed & 0x07)) * 3
    n_frames = 0
    duration_ms = 0
    while pos < len(blob):
        block = blob[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            label = blob[pos]
            pos += 1
            if label == 0xF9 and blob[pos] >= 4:
                (delay_cs,) = struct.unpack_from("<H", blob, pos + 2)
                duration_ms += delay_cs * 10
            while blob[pos] != 0:
                pos += blob[pos] + 1
            pos += 1
        elif block == 0x2C:
            ipacked = blob[pos + 8]
            pos += 9
            if ipacked & 0x80:
                pos += (2 << (ipacked & 0x07)) * 3
            pos += 1  # LZW min code size
            while blob[pos] != 0:
                pos += blob[pos] + 1
            pos += 1
            n_frames += 1
        else:
            break
    return {
        "width": int(width),
        "height": int(height),
        "n_frames": n_frames,
        "duration_ms": duration_ms,
    }


def encode_gif(frames, delays_ms=None) -> bytes:
    """Encode uint8 frames -> animated GIF87a/89a with a 256-entry
    grayscale-cube color table, UNCOMPRESSED LZW (clear code before
    every pixel — valid per spec, code width never grows). Frames are
    (H, W) palette indices into an identity grayscale table, so
    roundtrips are exact; the encoder exists to test the decoder and
    to fabricate video-like fixtures."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    if delays_ms is None:
        delays_ms = [100] * len(frames)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)
    out += bytes(v for i in range(256) for v in (i, i, i))  # gray GCT
    min_code = 8
    clear, end = 256, 257
    for frame, delay in zip(frames, delays_ms):
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay // 10) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        # 9-bit codes, clear before each pixel keeps the table fixed
        bits = 0
        buffer = 0
        data = bytearray()

        def push(code):
            nonlocal bits, buffer
            buffer |= code << bits
            bits += 9
            while bits >= 8:
                data.append(buffer & 0xFF)
                buffer >>= 8
                bits -= 8

        for px in frame.reshape(-1):
            push(clear)
            push(int(px))
        push(end)
        if bits:
            data.append(buffer & 0xFF)
        for i in range(0, len(data), 255):
            chunk_ = data[i : i + 255]
            out.append(len(chunk_))
            out += chunk_
        out.append(0)
    out += b"\x3b"
    return bytes(out)


# ------------------------------------------------------------------ WAV
def _decode_wav_float(blob: bytes):
    """WAVE_FORMAT_IEEE_FLOAT (format 3), which stdlib ``wave``
    refuses: manual RIFF chunk walk for fmt + data."""
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even
    if fmt is None or data is None:
        raise ValueError("WAV without fmt/data chunks")
    audio_fmt, n_ch, rate = struct.unpack_from("<HHI", fmt, 0)
    (bits_per,) = struct.unpack_from("<H", fmt, 14)
    if audio_fmt != 3:
        raise NotImplementedError(f"WAV format {audio_fmt}")
    dt = "<f4" if bits_per == 32 else "<f8"
    samples = np.frombuffer(data, dtype=dt).astype(np.float64)
    return samples.reshape(-1, n_ch), rate


def decode_wav(blob: bytes):
    """Decode WAV to ``(samples, sample_rate)``: samples is
    (n_frames, n_channels) float64 in [-1, 1]. PCM 8/16/24/32-bit via
    stdlib ``wave``; IEEE-float (format 3) via a manual RIFF walk."""
    import wave

    try:
        wf_ctx = wave.open(io.BytesIO(blob))
    except wave.Error:
        return _decode_wav_float(blob)
    with wf_ctx as wf:
        n_ch = wf.getnchannels()
        rate = wf.getframerate()
        sampwidth = wf.getsampwidth()
        frames = wf.readframes(wf.getnframes())
    if sampwidth == 1:
        samples = (
            np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    elif sampwidth == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sampwidth == 3:
        # 24-bit: widen each little-endian triple to int32, sign-extend
        raw = np.frombuffer(frames, dtype=np.uint8).reshape(-1, 3)
        widened = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int32) << 16)
        )
        widened = np.where(widened >= 1 << 23, widened - (1 << 24), widened)
        samples = widened.astype(np.float64) / float(1 << 23)
    elif sampwidth == 4:
        samples = (
            np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
        )
    else:
        raise NotImplementedError(f"sample width {sampwidth} bytes")
    return samples.reshape(-1, n_ch), rate


# ----------------------------------------------------------- dispatch
def decode_image(blob: bytes) -> np.ndarray:
    """Decode any supported image blob to (H, W, C) uint8 — PIL when
    importable, pure PNG/BMP decoders otherwise."""
    fmt = sniff_format(blob)
    if have_pil():
        import PIL.Image

        return np.asarray(PIL.Image.open(io.BytesIO(blob)))
    if fmt == "png":
        return decode_png(blob)
    if fmt == "bmp":
        return decode_bmp(blob)
    if fmt == "gif":
        return decode_gif(blob)[0][1]
    if fmt == "jpeg":
        from parq_tools_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(blob)
    raise NotImplementedError(
        f"no decoder for format {fmt!r} without PIL installed"
    )


def decode_audio(blob: bytes):
    """Decode a supported audio blob -> (samples, sample_rate)."""
    if sniff_format(blob) == "wav":
        return decode_wav(blob)
    raise NotImplementedError("only PCM WAV decodes without ffmpeg")


def _wav_scan_duration_ms(blob: bytes):
    """Duration from the RIFF fmt/data chunk HEADERS only — no sample
    decode; works for PCM and IEEE-float alike."""
    pos = 12
    rate = block_align = data_size = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        if cid == b"fmt ":
            _, _, rate = struct.unpack_from("<HHI", blob, pos + 8)
            (block_align,) = struct.unpack_from("<H", blob, pos + 8 + 12)
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)
    if rate and block_align and data_size is not None:
        return int(data_size * 1000 // (rate * block_align))
    return None


def _jpeg_scan_dims(blob: bytes):
    """(width, height) from the first SOFn marker; header walk only."""
    pos = 2
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            pos += 1
            continue
        marker = blob[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", blob, pos + 2)
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            h, w = struct.unpack_from(">HH", blob, pos + 5)
            return int(w), int(h)
        pos += 2 + seglen
    return None


def probe_media_header(blob: Optional[bytes]) -> Optional[dict]:
    """Header-only metadata probe — no pixel/sample decode, O(bytes
    read) = a few dozen: (format, modality, width, height,
    duration_ms). None when the format is unknown."""
    fmt = sniff_format(blob)
    if fmt is None:
        return None
    meta = {
        "format": fmt,
        "modality": "audio"
        if fmt == "wav"
        else ("video" if fmt in ("avi", "y4m") else "image"),
        "width": None,
        "height": None,
        "duration_ms": None,
    }
    try:
        if fmt in ("avi", "y4m"):
            from parq_tools_spark.operators.video import (
                avi_scan_meta,
                y4m_scan_meta,
            )

            v = avi_scan_meta(blob) if fmt == "avi" else y4m_scan_meta(blob)
            meta["width"], meta["height"] = v["width"], v["height"]
            meta["duration_ms"] = v["duration_ms"]
            return meta
        if fmt == "gif":
            g = _gif_scan_meta(blob)
            meta["width"], meta["height"] = g["width"], g["height"]
            if g["n_frames"] > 1:
                meta["modality"] = "video"
                meta["duration_ms"] = g["duration_ms"]
            return meta
        if fmt == "png":
            for ctype, data in _png_chunks(blob):
                if ctype == b"IHDR":
                    w, h = struct.unpack(">II", data[:8])
                    meta["width"], meta["height"] = int(w), int(h)
                break  # IHDR is required first; one chunk is enough
        elif fmt == "bmp":
            w, h = struct.unpack_from("<ii", blob, 18)
            meta["width"], meta["height"] = int(w), abs(int(h))
        elif fmt == "wav":
            meta["duration_ms"] = _wav_scan_duration_ms(blob)
        elif fmt == "jpeg":
            if have_pil():
                import PIL.Image

                with PIL.Image.open(io.BytesIO(blob)) as im:
                    meta["width"], meta["height"] = im.size
            else:
                dims = _jpeg_scan_dims(blob)
                if dims:
                    meta["width"], meta["height"] = dims
    except Exception:
        return None
    return meta


def decode_media(blob: bytes) -> Optional[dict]:
    """Full decode of any supported blob. Returns a dict with
    ``modality`` plus either ``array``/``width``/``height``/
    ``channels`` (image) or ``samples``/``sample_rate``/
    ``duration_ms`` (audio); None when undecodable here."""
    fmt = sniff_format(blob)
    try:
        if fmt in ("avi", "y4m"):
            from parq_tools_spark.operators.video import decode_avi, decode_y4m

            v = decode_avi(blob) if fmt == "avi" else decode_y4m(blob)
            return {
                "modality": "video",
                "format": fmt,
                "frames": v["frames"],
                "width": v["width"],
                "height": v["height"],
                "n_frames": v["n_frames"],
                "duration_ms": v["duration_ms"],
            }
        if fmt == "gif" and not have_pil():
            decoded = decode_gif(blob)
            if not decoded or decoded[0][1].size == 0:
                return None
            if len(decoded) > 1:  # animated: the video-like modality
                total_ms = sum(d for d, _ in decoded)
                first = decoded[0][1]
                return {
                    "modality": "video",
                    "format": fmt,
                    "frames": decoded,
                    "width": first.shape[1],
                    "height": first.shape[0],
                    "n_frames": len(decoded),
                    "duration_ms": total_ms,
                }
            arr = decoded[0][1]
            return {
                "modality": "image",
                "format": fmt,
                "array": arr,
                "width": arr.shape[1],
                "height": arr.shape[0],
                "channels": arr.shape[2],
            }
        if fmt in ("png", "bmp", "jpeg") or (fmt == "gif" and have_pil()):
            arr = decode_image(blob)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            if arr.size == 0:  # corrupt header claiming 0-dim image
                return None
            return {
                "modality": "image",
                "format": fmt,
                "array": arr,
                "width": arr.shape[1],
                "height": arr.shape[0],
                "channels": arr.shape[2],
            }
        if fmt == "wav":
            samples, rate = decode_wav(blob)
            if samples.size == 0 or rate <= 0:
                return None
            return {
                "modality": "audio",
                "format": fmt,
                "samples": samples,
                "sample_rate": rate,
                "duration_ms": int(len(samples) * 1000 / rate),
            }
    except Exception:
        # corrupt/truncated blobs surface as struct/index/zlib errors
        # from whichever parser got furthest — at corpus scale one bad
        # blob must degrade (None -> caller's stub), never kill the
        # executor batch. Unsupported-but-valid formats take the same
        # path via NotImplementedError.
        return None
    return None


def media_features(blob: bytes, feature_dim: int = 8) -> Optional[np.ndarray]:
    """Real decoded features for a supported blob, None otherwise.

    Image: (width, height, channels, mean, std, min, max, 0) over
    pixel intensities scaled to [0, 1]. Audio: (n_frames, rate,
    channels, mean, std, min, max, zero-crossing rate). Truncated /
    zero-padded to ``feature_dim``.
    """
    m = decode_media(blob)
    if m is None:
        return None
    if m["modality"] == "video":
        stack = np.stack([f for _, f in m["frames"]]).astype(np.float64) / 255.0
        feats = [
            float(m["width"]),
            float(m["height"]),
            float(m["n_frames"]),
            float(stack.mean()),
            float(stack.std()),
            float(stack.min()),
            float(stack.max()),
            float(m["duration_ms"]),
        ]
    elif m["modality"] == "image":
        px = m["array"].astype(np.float64) / 255.0
        feats = [
            float(m["width"]),
            float(m["height"]),
            float(m["channels"]),
            float(px.mean()),
            float(px.std()),
            float(px.min()),
            float(px.max()),
            0.0,
        ]
    else:
        s = m["samples"]
        mono = s.mean(axis=1)
        zcr = (
            float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
            if len(mono) > 1
            else 0.0
        )
        feats = [
            float(s.shape[0]),
            float(m["sample_rate"]),
            float(s.shape[1]),
            float(s.mean()),
            float(s.std()),
            float(s.min()),
            float(s.max()),
            zcr,
        ]
    out = np.zeros(feature_dim, dtype=np.float64)
    n = min(feature_dim, len(feats))
    out[:n] = feats[:n]
    return out


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resample of (H, W[, C]) to (height, width)."""
    arr = np.asarray(arr)
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return arr[ys][:, xs]


def _dct_basis(n: int) -> np.ndarray:
    """n-point orthonormal DCT-II basis matrix."""
    u, x = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    m = np.cos((2 * x + 1) * u * np.pi / (2 * n))
    m[0] *= np.sqrt(1.0 / n)
    m[1:] *= np.sqrt(2.0 / n)
    return m


_DCT32 = None


def perceptual_hash(blob: Optional[bytes]) -> Optional[int]:
    """63-bit pHash of a decodable image blob; None otherwise.

    Standard construction: grayscale -> 32x32 resample -> 2-D DCT ->
    8x8 low-frequency block -> threshold each coefficient (DC
    excluded) against the block median -> one bit per coefficient.
    Near-duplicate images (recompression, mild noise, small edits)
    land within a few bits of Hamming distance; 63 bits keeps the
    value in positive int64 range so it joins the same banded-Hamming
    infrastructure as text SimHash (``dedup.hamming_pairs``).
    """
    global _DCT32
    m = decode_media(blob)
    if m is None or m["modality"] != "image":
        return None
    arr = m["array"].astype(np.float64)
    if arr.shape[2] >= 3:
        gray = 0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
    else:
        gray = arr[:, :, 0]
    small = resize_nearest(gray, 32, 32)
    if _DCT32 is None:
        _DCT32 = _dct_basis(32)
    coef = _DCT32 @ small @ _DCT32.T
    block = coef[:8, :8].reshape(64)[1:]  # drop DC
    med = np.median(block)
    bits = block > med
    h = 0
    for i, b in enumerate(bits):
        if b:
            h |= 1 << i
    return h


def encode_wav(samples: np.ndarray, rate: int, float_fmt: bool = False) -> bytes:
    """Encode (n_frames, n_channels) float64 in [-1, 1] to WAV —
    16-bit PCM by default, IEEE float32 (format 3) with
    ``float_fmt=True``. Exists to roundtrip-test the decoder and to
    re-emit resampled audio."""
    samples = np.asarray(samples, dtype=np.float64)
    if samples.ndim == 1:
        samples = samples[:, None]  # mono
    n_ch = samples.shape[1]
    if float_fmt:
        data = samples.astype("<f4").tobytes()
        fmt = struct.pack("<HHIIHH", 3, n_ch, rate, rate * 4 * n_ch, 4 * n_ch, 32)
        body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    import wave

    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(n_ch)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def resample_linear(samples: np.ndarray, rate: int, target_rate: int) -> np.ndarray:
    """Linear-interpolation resample of (n_frames, n_channels) to
    ``target_rate``; identity when the rates match."""
    if rate == target_rate:
        return samples
    n = samples.shape[0]
    out_n = max(1, int(round(n * target_rate / rate)))
    src_t = np.arange(n, dtype=np.float64) / rate
    dst_t = np.arange(out_n, dtype=np.float64) / target_rate
    return np.stack(
        [np.interp(dst_t, src_t, samples[:, c]) for c in range(samples.shape[1])],
        axis=1,
    )
