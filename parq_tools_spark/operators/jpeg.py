"""Pure-numpy baseline JPEG codec (ITU-T T.81 sequential DCT).

The last common image format the repo could not decode without PIL.
Supports what baseline JPEG writers actually emit: 8-bit samples,
Huffman entropy coding, grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0
sampling, restart markers. Progressive (SOF2) and arithmetic coding
raise ``NotImplementedError`` (install PIL for those).

The encoder exists to roundtrip-test the decoder in codec-less
environments (standard Annex K quantization + Huffman tables, 4:4:4
or 4:2:0). JPEG is lossy, so tests assert closeness, not equality —
the only correctness oracle available without a reference codec.

Like the rest of ``operators/codecs.py``, these are plain
``bytes <-> numpy`` functions called from ``mapInPandas`` closures on
executors; clarity over speed (production installs PIL/turbojpeg and
the probe in ``codecs.decode_image`` prefers it automatically).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K tables
STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
])
STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
])

# (bits[1..16], values) — Annex K
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """8x8 orthonormal DCT-II basis: spatial = M.T @ coef @ M."""
    u, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    m = np.cos((2 * x + 1) * u * np.pi / 16)
    m[0] *= np.sqrt(1 / 8)
    m[1:] *= np.sqrt(2 / 8)
    return m


_DCT_M = _dct_matrix()


# ----------------------------------------------------------- decoder
class _HuffTable:
    def __init__(self, bits, values):
        self.lookup = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, reader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            v = self.lookup.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code")


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    de-stuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.acc = 0

    def read_bit(self) -> int:
        if self.bits == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:  # a marker: byte-align virtual padding
                    self.pos -= 1
                    b = 0  # pad with zero bits (spec: fill bits)
            self.acc = b
            self.bits = 8
        self.bits -= 1
        return (self.acc >> self.bits) & 1

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = 0
        for _ in range(s):
            v = (v << 1) | self.read_bit()
        if v < (1 << (s - 1)):
            v -= (1 << s) - 1
        return v

    def align_restart(self):
        """Consume a RSTn marker at the current (byte-aligned) spot."""
        self.bits = 0
        while self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2
            return


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Decode baseline JPEG -> (H, W) uint8 grayscale or (H, W, 3)
    uint8 RGB (BT.601 YCbCr conversion)."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables = {}
    htables = {}
    frame = None
    restart_interval = 0
    while pos < len(blob):
        if blob[pos] != 0xFF:
            pos += 1
            continue
        marker = blob[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", blob, pos)
        seg = blob[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qtables[tq] = np.frombuffer(seg, np.uint8, 64, p).astype(
                    np.int32
                )
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                values = list(seg[p + 17 : p + 17 + n])
                htables[(tc, th)] = _HuffTable(bits, values)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError("12-bit JPEG")
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02x}); install PIL"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS: entropy data follows
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, td_ta = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append(
                    (comp, htables[(0, td_ta >> 4)], htables[(1, td_ta & 0x0F)])
                )
            data_start = pos + seglen
            return _decode_scan(
                blob, data_start, frame, scan, qtables, restart_interval
            )
        pos += seglen
    raise ValueError("no SOS segment found")


def _decode_scan(blob, start, frame, scan, qtables, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {
        c["id"]: np.zeros(
            (mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64
        )
        for c in frame["comps"]
    }
    reader = _BitReader(blob, start)
    pred = {c["id"]: 0 for c in frame["comps"]}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_restart()
                pred = {c["id"]: 0 for c in frame["comps"]}
            for comp, dc_tab, ac_tab in scan:
                q = qtables[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        s = dc_tab.decode(reader)
                        diff = reader.receive_extend(s)
                        pred[comp["id"]] += diff
                        zz[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = ac_tab.decode(reader)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index out of range")
                            zz[k] = reader.receive_extend(s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz * q[np.arange(64)]
                        block = _DCT_M.T @ coef.reshape(8, 8) @ _DCT_M
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    out_planes = []
    for c in frame["comps"]:
        p = planes[c["id"]] + 128.0
        # upsample to full resolution (nearest) then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(out_planes[0].round(), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(rgb.round(), 0, 255).astype(np.uint8)


# ----------------------------------------------------------- encoder
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def write(self, value: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.bits += 1
            if self.bits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # stuffing
                self.acc = 0
                self.bits = 0

    def flush(self):
        while self.bits:  # pad with 1s per spec
            self.acc = (self.acc << 1) | 1
            self.bits += 1
            if self.bits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.bits = 0


def _enc_table(bits, values):
    """(code, length) per symbol from a (bits, values) spec."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _scale_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _encode_block(bw, block, qz, dc_tab, ac_tab, pred):
    """qz is the quant table in ZIGZAG order (file order): zz[i] =
    coef_flat[ZIGZAG[i]] / qz[i], matching the decoder's dequant."""
    coef = _DCT_M @ (block - 128.0) @ _DCT_M.T
    zz = np.round(coef.reshape(64)[ZIGZAG] / qz).astype(np.int64)
    diff = int(zz[0]) - pred
    s = _category(diff)
    code, length = dc_tab[s]
    bw.write(code, length)
    if s:
        v = diff if diff >= 0 else diff + (1 << s) - 1
        bw.write(v & ((1 << s) - 1), s)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_tab[(run << 4) | s]
        bw.write(code, length)
        vv = v if v >= 0 else v + (1 << s) - 1
        bw.write(vv & ((1 << s) - 1), s)
        run = 0
    if last_nz < 63:
        code, length = ac_tab[0x00]
        bw.write(code, length)
    return int(zz[0])


def encode_jpeg(
    arr: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 to baseline
    JPEG. ``subsample=True`` uses 4:2:0 chroma (exercises the
    decoder's MCU interleave/upsample path); default 4:4:4."""
    arr = np.asarray(arr, dtype=np.float64)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    # zigzag (file) order throughout the encoder
    ql = _scale_q(STD_LUMA_Q, quality)[ZIGZAG]
    qc = _scale_q(STD_CHROMA_Q, quality)[ZIGZAG]

    if gray:
        comps = [("Y", arr, ql, 1, 1)]
    else:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            def down2(p):
                hh = (p.shape[0] + 1) // 2 * 2
                ww = (p.shape[1] + 1) // 2 * 2
                pp = np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])),
                            mode="edge")
                return (pp[0::2, 0::2] + pp[1::2, 0::2] + pp[0::2, 1::2]
                        + pp[1::2, 1::2]) / 4.0
            comps = [
                ("Y", y, ql, 2, 2),
                ("Cb", down2(cb), qc, 1, 1),
                ("Cr", down2(cr), qc, 1, 1),
            ]
        else:
            comps = [
                ("Y", y, ql, 1, 1),
                ("Cb", cb, qc, 1, 1),
                ("Cr", cr, qc, 1, 1),
            ]

    out = bytearray(b"\xff\xd8")
    # DQT
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(ql[i]) for i in range(64)
    )
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(
            int(qc[i]) for i in range(64)
        )
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    hmax = max(c[3] for c in comps)
    vmax = max(c[4] for c in comps)
    for i, (_, _, _, ch, cv) in enumerate(comps):
        sof += bytes([i + 1, (ch << 4) | cv, 0 if i == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT x4 (or x2 for gray)
    specs = [(0, 0, STD_DC_LUMA), (1, 0, STD_AC_LUMA)]
    if not gray:
        specs += [(0, 1, STD_DC_CHROMA), (1, 1, STD_AC_CHROMA)]
    for tc, th, (bits, values) in specs:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    # SOS
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_l = _enc_table(*STD_DC_LUMA)
    ac_l = _enc_table(*STD_AC_LUMA)
    dc_c = _enc_table(*STD_DC_CHROMA)
    ac_c = _enc_table(*STD_AC_CHROMA)
    bw = _BitWriter()
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    pred = [0] * len(comps)
    padded = []
    for _, plane, _, ch, cv in comps:
        ph = mcus_y * cv * 8
        pw = mcus_x * ch * 8
        padded.append(
            np.pad(
                plane,
                ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                mode="edge",
            )
        )
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (name, _, q, ch, cv) in enumerate(comps):
                dct, act = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        pred[ci] = _encode_block(
                            bw, block, q, dct, act, pred[ci]
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
