"""Pure-numpy baseline JPEG codec (ITU-T T.81 sequential DCT).

The last common image format the repo could not decode without PIL.
Supports what JPEG writers actually emit: 8-bit samples, Huffman
entropy coding, grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0
sampling, restart markers, and PROGRESSIVE (SOF2) streams — spectral
selection, successive approximation (DC and AC refinement bit
planes), and EOB runs per ITU-T T.81 G.2. Arithmetic coding and
hierarchical/lossless modes raise ``NotImplementedError``.

The encoder exists to roundtrip-test the decoder in codec-less
environments (standard Annex K quantization + Huffman tables, 4:4:4
or 4:2:0, baseline or progressive). JPEG is lossy, so tests assert
closeness, not equality — except that the progressive and baseline
streams of the same input decode to IDENTICAL pixels, which is the
strongest oracle available without a reference codec.

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


# Progressive AC scans need EOBn symbols (r<<4, r=1..14), which the
# standard baseline tables do not carry. This uniform 9-bit table holds
# every symbol a progressive AC scan can emit (r 0..15 x s 0..10) — a
# valid, deliberately compression-light Huffman table (176 codes at
# length 9; Kraft sum 176/512 < 1) used by the test-oriented encoder.
PROG_AC = (
    [0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(11)],
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
    """Decode baseline (SOF0/1) or progressive (SOF2) JPEG ->
    (H, W) uint8 grayscale or (H, W, 3) uint8 RGB (BT.601).

    Both modes accumulate quantized coefficients per component and
    reconstruct once at the end; progressive folds each scan
    (spectral selection band + successive-approximation bit plane)
    into the same arrays per ITU-T T.81 G.2.
    """
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables = {}
    htables = {}
    frame = None
    restart_interval = 0
    while pos + 1 < len(blob):
        if blob[pos] != 0xFF:
            pos += 1
            continue
        marker = blob[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
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
            frame = {
                "h": h,
                "w": w,
                "comps": comps,
                "progressive": marker == 0xC2,
            }
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            frame["mcus_x"] = -(-w // (8 * hmax))
            frame["mcus_y"] = -(-h // (8 * vmax))
            for c in comps:
                # full (MCU-padded) block grid + the true block counts
                # a non-interleaved scan iterates (B.2.3):
                # ceil(ceil(dim * sampling / max_sampling) / 8)
                c["bx_pad"] = frame["mcus_x"] * c["h"]
                c["by_pad"] = frame["mcus_y"] * c["v"]
                comp_w = -(-(w * c["h"]) // hmax)
                comp_h = -(-(h * c["v"]) // vmax)
                c["bx"] = -(-comp_w // 8)
                c["by"] = -(-comp_h // 8)
                c["coefs"] = np.zeros(
                    (c["by_pad"], c["bx_pad"], 64), dtype=np.int32
                )
                c["pred"] = 0
                c["eobrun"] = 0
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG coding (SOF marker 0x{marker:02x}); "
                "install PIL"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, td_ta = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append(
                    (
                        comp,
                        htables.get((0, td_ta >> 4)),
                        htables.get((1, td_ta & 0x0F)),
                    )
                )
            ss, se, ah_al = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ah_al >> 4, ah_al & 0x0F
            pos = _decode_scan_coefs(
                blob, pos + seglen, frame, scan, ss, se, ah, al,
                restart_interval,
            )
            continue
        pos += seglen
    if frame is None:
        raise ValueError("no SOF segment found")
    return _reconstruct(frame, qtables)


def _next_marker(data: bytes, p: int) -> int:
    """Position of the next real marker (skips stuffed FF00 and fill
    FFs inside entropy data; RST markers are consumed by the reader)."""
    n = len(data)
    while p + 1 < n:
        if data[p] == 0xFF and data[p + 1] != 0x00 and not (
            0xD0 <= data[p + 1] <= 0xD7
        ):
            return p
        p += 1
    return n


def _decode_scan_coefs(blob, start, frame, scan, ss, se, ah, al,
                       restart_interval):
    """Decode ONE scan's entropy data into the components' coefficient
    arrays (zigzag order). Returns the stream position after the scan.
    Handles baseline full-block scans and all four progressive scan
    kinds (DC/AC x first/refinement)."""
    reader = _BitReader(blob, start)
    for comp, _, _ in scan:
        comp["pred"] = 0
        comp["eobrun"] = 0
    progressive = frame["progressive"]
    interleaved = len(scan) > 1
    if interleaved:
        units_x, units_y = frame["mcus_x"], frame["mcus_y"]
    else:
        comp0 = scan[0][0]
        units_x, units_y = comp0["bx"], comp0["by"]
    unit_count = 0
    for uy in range(units_y):
        for ux in range(units_x):
            if (
                restart_interval
                and unit_count
                and unit_count % restart_interval == 0
            ):
                reader.align_restart()
                for comp, _, _ in scan:
                    comp["pred"] = 0
                    comp["eobrun"] = 0
            for comp, dc_tab, ac_tab in scan:
                blocks = (
                    [
                        (uy * comp["v"] + by, ux * comp["h"] + bx)
                        for by in range(comp["v"])
                        for bx in range(comp["h"])
                    ]
                    if interleaved
                    else [(uy, ux)]
                )
                for by, bx in blocks:
                    zz = comp["coefs"][by, bx]
                    if not progressive:
                        _block_baseline(reader, zz, comp, dc_tab, ac_tab)
                    elif ss == 0 and ah == 0:
                        s = dc_tab.decode(reader)
                        comp["pred"] += reader.receive_extend(s)
                        zz[0] = comp["pred"] << al
                    elif ss == 0:
                        if reader.read_bit():
                            zz[0] |= 1 << al
                    elif ah == 0:
                        _block_ac_first(reader, zz, comp, ac_tab, ss, se, al)
                    else:
                        _block_ac_refine(reader, zz, comp, ac_tab, ss, se, al)
            unit_count += 1
    return _next_marker(blob, reader.pos)


def _block_baseline(reader, zz, comp, dc_tab, ac_tab):
    s = dc_tab.decode(reader)
    comp["pred"] += reader.receive_extend(s)
    zz[0] = comp["pred"]
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


def _block_ac_first(reader, zz, comp, ac_tab, ss, se, al):
    """Progressive AC first scan (Ah=0): spectral band [ss..se] at
    bit-plane al, with EOB-run skipping (G.1.2.2)."""
    if comp["eobrun"] > 0:
        comp["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = ac_tab.decode(reader)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:  # EOBn: this block + (2^r - 1 + received) more
                comp["eobrun"] = (1 << r) - 1
                if r:
                    comp["eobrun"] += _read_bits(reader, r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC index out of band")
        zz[k] = reader.receive_extend(s) << al
        k += 1


def _read_bits(reader, n):
    v = 0
    for _ in range(n):
        v = (v << 1) | reader.read_bit()
    return v


def _block_ac_refine(reader, zz, comp, ac_tab, ss, se, al):
    """Progressive AC refinement scan (Ah>0): one correction bit per
    already-nonzero coefficient, newly-significant coefficients
    +-1<<al, zero-runs count zero-HISTORY positions only (G.1.2.3)."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if comp["eobrun"] == 0:
        while k <= se:
            rs = ac_tab.decode(reader)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    # run length INCLUDES this block, whose remaining
                    # band still takes correction bits below — so no
                    # -1 here; the tail pass decrements
                    comp["eobrun"] = 1 << r
                    if r:
                        comp["eobrun"] += _read_bits(reader, r)
                    break
                # r == 15: run over 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refinement scan with s > 1")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if zz[k]:
                    if reader.read_bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                zz[k] = val
            k += 1
    if comp["eobrun"] > 0:
        while k <= se:
            if zz[k]:
                if reader.read_bit() and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        comp["eobrun"] -= 1


def _reconstruct(frame, qtables):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    out_planes = []
    for c in frame["comps"]:
        q = qtables[c["tq"]]
        by_pad, bx_pad = c["by_pad"], c["bx_pad"]
        plane = np.zeros((by_pad * 8, bx_pad * 8), dtype=np.float64)
        deq = c["coefs"].astype(np.float64) * q[None, None, :]
        # dezigzag every block at once; per-block IDCT loop is clear
        # and fast enough for the pure tier
        nat = np.zeros_like(deq)
        nat[:, :, ZIGZAG] = deq
        blocks = nat.reshape(by_pad, bx_pad, 8, 8)
        for by in range(by_pad):
            for bx in range(bx_pad):
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _DCT_M.T @ blocks[by, bx] @ _DCT_M
                )
        plane += 128.0
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:h, :w])
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


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    progressive: bool = False,
) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 to baseline
    JPEG. ``subsample=True`` uses 4:2:0 chroma (exercises the
    decoder's MCU interleave/upsample path); default 4:4:4.
    ``progressive=True`` emits an SOF2 stream (DC first at Al=1 + DC
    refinement + per-component full-band AC first at Al=1 + AC
    refinement scans, with EOB-run accumulation in the first scans) —
    it reconstructs to the SAME pixels as the baseline stream for the
    same quality, which is how the progressive decode paths are
    roundtrip-tested without a reference codec."""
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
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") + struct.pack(
        ">H", len(sof) + 2
    ) + sof
    # DHT x4 (or x2 for gray)
    specs = [(0, 0, STD_DC_LUMA), (1, 0, STD_AC_LUMA)]
    if not gray:
        specs += [(0, 1, STD_DC_CHROMA), (1, 1, STD_AC_CHROMA)]
    for tc, th, (bits, values) in specs:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body

    dc_l = _enc_table(*STD_DC_LUMA)
    ac_l = _enc_table(*STD_AC_LUMA)
    dc_c = _enc_table(*STD_DC_CHROMA)
    ac_c = _enc_table(*STD_AC_CHROMA)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # quantize every block up front: qblocks[ci][by, bx, 64] zigzag ints
    qblocks = []
    for _, plane, q, ch, cv in comps:
        by_pad, bx_pad = mcus_y * cv, mcus_x * ch
        padded = np.pad(
            plane,
            ((0, by_pad * 8 - plane.shape[0]), (0, bx_pad * 8 - plane.shape[1])),
            mode="edge",
        )
        zz = np.zeros((by_pad, bx_pad, 64), dtype=np.int64)
        for by in range(by_pad):
            for bx in range(bx_pad):
                block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = _DCT_M @ (block - 128.0) @ _DCT_M.T
                zz[by, bx] = np.round(coef.reshape(64)[ZIGZAG] / q)
        qblocks.append(zz)

    def sos_header(comp_idx, ss, se, ah, al, with_ac=True, ac_tab_id=None):
        seg = bytes([len(comp_idx)])
        for ci in comp_idx:
            td = 0 if ci == 0 else 1
            ta = (0 if ci == 0 else 1) if with_ac else 0
            if ac_tab_id is not None:
                ta = ac_tab_id
            seg += bytes([ci + 1, (td << 4) | ta])
        seg += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(seg) + 2) + seg

    if not progressive:
        out += sos_header(list(range(ncomp)), 0, 63, 0, 0)
        bw = _BitWriter()
        pred = [0] * len(comps)
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (_, _, _, ch, cv) in enumerate(comps):
                    dct, act = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                    for by in range(cv):
                        for bx in range(ch):
                            zz = qblocks[ci][my * cv + by, mx * ch + bx]
                            pred[ci] = _emit_block_baseline(
                                bw, zz, dct, act, pred[ci]
                            )
        bw.flush()
        out += bw.out
        out += b"\xff\xd9"
        return bytes(out)

    # ---- progressive: DC first (Al=1) -> DC refine -> per-component
    # AC first (Al=1, EOB-run accumulated) -> AC refine
    al = 1
    out += sos_header(list(range(ncomp)), 0, 0, 0, al, with_ac=False)
    bw = _BitWriter()
    pred = [0] * len(comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (_, _, _, ch, cv) in enumerate(comps):
                dct = dc_l if ci == 0 else dc_c
                for by in range(cv):
                    for bx in range(ch):
                        dc = int(qblocks[ci][my * cv + by, mx * ch + bx, 0])
                        cur = dc >> al  # arithmetic shift per F.1.4.1
                        diff = cur - pred[ci]
                        pred[ci] = cur
                        s = _category(diff)
                        code, length = dct[s]
                        bw.write(code, length)
                        if s:
                            v = diff if diff >= 0 else diff + (1 << s) - 1
                            bw.write(v & ((1 << s) - 1), s)
    bw.flush()
    out += bw.out

    out += sos_header(list(range(ncomp)), 0, 0, 1, 0, with_ac=False)
    bw = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (_, _, _, ch, cv) in enumerate(comps):
                for by in range(cv):
                    for bx in range(ch):
                        dc = int(qblocks[ci][my * cv + by, mx * ch + bx, 0])
                        bw.write(dc & 1, 1)
    bw.flush()
    out += bw.out

    # progressive AC scans use the EOBn-capable custom table: emit a
    # DHT redefining AC table 0 mid-stream (legal per B.2.4.2), then
    # reference it from every AC scan
    body = bytes([(1 << 4) | 0]) + bytes(PROG_AC[0]) + bytes(PROG_AC[1])
    out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    ac_p = _enc_table(*PROG_AC)

    for ci, (_, plane, _, ch, cv) in enumerate(comps):
        act = ac_p
        bx_n = -(-plane.shape[1] // 8)
        by_n = -(-plane.shape[0] // 8)
        out += sos_header([ci], 1, 63, 0, al, ac_tab_id=0)
        bw = _BitWriter()
        _emit_ac_first_scan(bw, qblocks[ci], by_n, bx_n, act, al)
        bw.flush()
        out += bw.out
        out += sos_header([ci], 1, 63, 1, 0, ac_tab_id=0)
        bw = _BitWriter()
        for by in range(by_n):
            for bx in range(bx_n):
                _emit_ac_refine_block(bw, qblocks[ci][by, bx], act, 0)
        bw.flush()
        out += bw.out

    out += b"\xff\xd9"
    return bytes(out)


def _emit_block_baseline(bw, zz, dc_tab, ac_tab, pred):
    """Huffman-encode one quantized zigzag block (baseline scan)."""
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


def _flush_eobrun(bw, ac_tab, eobrun):
    """Emit an EOBn code covering ``eobrun`` consecutive ended blocks."""
    if eobrun <= 0:
        return
    r = eobrun.bit_length() - 1
    code, length = ac_tab[r << 4]
    bw.write(code, length)
    if r:
        bw.write(eobrun - (1 << r), r)


def _emit_ac_first_scan(bw, blocks, by_n, bx_n, ac_tab, al):
    """Progressive AC first scan (Ah=0) for one component's true block
    grid, with cross-block EOB-run accumulation (G.1.2.2)."""
    eobrun = 0
    for by in range(by_n):
        for bx in range(bx_n):
            zz = blocks[by, bx]
            band = np.sign(zz[1:]) * (np.abs(zz[1:]) >> al)
            nz = np.nonzero(band)[0]
            if len(nz) == 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    _flush_eobrun(bw, ac_tab, eobrun)
                    eobrun = 0
                continue
            _flush_eobrun(bw, ac_tab, eobrun)
            eobrun = 0
            run = 0
            last = int(nz[-1])
            for i in range(last + 1):
                v = int(band[i])
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
            if last < 62:  # trailing zeros: this block joins an EOB run
                eobrun = 1
    _flush_eobrun(bw, ac_tab, eobrun)


def _emit_ac_refine_block(bw, zz, ac_tab, al):
    """Progressive AC refinement (Ah=al+1 -> Al=al) for one block,
    mirroring the decoder's walk (G.1.2.3): ZRLs are flushed at every
    nonzero-current position up to the last newly-significant
    coefficient (keeping every buffered correction bit inside the next
    emitted window), and the trailing region folds into an EOB whose
    correction bits follow it."""
    mag = np.abs(zz[1:]) >> al
    sig_pos = np.nonzero(mag == 1)[0]
    last_sig = int(sig_pos[-1]) if len(sig_pos) else -1
    corr = []
    r = 0
    for i in range(63):
        a = int(mag[i])
        if a == 0:
            r += 1
            continue
        if i <= last_sig:
            while r > 15:
                code, length = ac_tab[0xF0]
                bw.write(code, length)
                for bit in corr:
                    bw.write(bit, 1)
                corr = []
                r -= 16
        if a > 1:  # already significant at the previous bit plane
            corr.append(a & 1)
            continue
        code, length = ac_tab[(r << 4) | 1]
        bw.write(code, length)
        bw.write(1 if zz[1 + i] > 0 else 0, 1)
        for bit in corr:
            bw.write(bit, 1)
        corr = []
        r = 0
    if r or corr:
        code, length = ac_tab[0x00]  # EOB0: run of exactly this block
        bw.write(code, length)
        for bit in corr:
            bw.write(bit, 1)
