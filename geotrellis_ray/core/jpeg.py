"""Baseline JFIF/JPEG codec — own from-scratch implementation (public spec:
ITU-T T.81 / ISO 10918-1; quantization + Huffman tables from Annex K).

Closes the round-2 "JPEG refused" gap with real code instead of a stub:
- encode_jpeg: RGB -> YCbCr (BT.601 full-range JFIF) -> 8x8 DCT-II
  (orthonormal matrix form) -> quality-scaled Annex-K quantization ->
  zigzag -> DC-diff + run-length AC -> standard Huffman tables -> JFIF
  stream (SOI/APP0/DQT/SOF0/DHT/SOS/EOI, 4:4:4, byte stuffing).
- decode_jpeg: segment parse -> Huffman decode (per-length code tables) ->
  dequantize -> IDCT -> YCbCr -> RGB, clipped uint8.

Baseline sequential, 8-bit, 4:4:4 only (no subsampling, no progressive,
no restart markers) — the codec is self-consistent (round-trip PSNR
tested) and decodes its own streams; wide-gamut libjpeg interop is NOT
claimed. Per-8x8-block Python loops are inherent to entropy coding; the
DCT/quantization math is vectorized numpy per block row.
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg"]

# --- constants (public Annex K) ---------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int64)

_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], np.int64).reshape(8, 8)

_Q_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], np.int64).reshape(8, 8)

# standard Huffman tables (Annex K): (BITS counts per code length 1..16, VALS)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8x8 DCT-II matrix
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0)
_C *= np.sqrt(2.0 / 8.0)
_C[0] /= np.sqrt(2.0)


def _huff_codes(bits, vals):
    """(BITS, VALS) -> {symbol: (code, length)} per T.81 C.2."""
    out = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _huff_decode_table(bits, vals):
    """(BITS, VALS) -> {(length, code): symbol}."""
    out = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return out


def _quality_tables(quality: int):
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    qy = np.clip((_Q_LUM * scale + 50) // 100, 1, 255)
    qc = np.clip((_Q_CHR * scale + 50) // 100, 1, 255)
    return qy.astype(np.int64), qc.astype(np.int64)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _encode_coeff_bits(v: int) -> tuple[int, int]:
    """JPEG magnitude category: (size, value-bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=0)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[0], ycc[1] - 128.0, ycc[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def encode_jpeg(rgb: np.ndarray, quality: int = 75) -> bytes:
    """(H, W, 3) uint8 RGB or (H, W) grayscale -> baseline JFIF bytes
    (4:4:4 / single component)."""
    rgb = np.asarray(rgb)
    gray = rgb.ndim == 2
    if not gray and (rgb.ndim != 3 or rgb.shape[2] != 3):
        raise ValueError("encode_jpeg expects (H, W, 3) RGB or (H, W) gray")
    H, W = rgb.shape[:2]
    qy, qc = _quality_tables(quality)
    if gray:
        ycc = rgb.astype(np.float64)[None, :, :] - 128.0
    else:
        ycc = _rgb_to_ycbcr(rgb) - 128.0
    ph, pw = (-H) % 8, (-W) % 8
    ycc = np.pad(ycc, ((0, 0), (0, ph), (0, pw)), mode="edge")
    HB, WB = ycc.shape[1] // 8, ycc.shape[2] // 8

    dc_tabs = [_huff_codes(*_DC_LUM), _huff_codes(*_DC_CHR)]
    ac_tabs = [_huff_codes(*_AC_LUM), _huff_codes(*_AC_CHR)]

    ncomp = 1 if gray else 3
    w = _BitWriter()
    prev_dc = [0, 0, 0]
    for by in range(HB):
        for bx in range(WB):
            for comp in range(ncomp):
                tab = 0 if comp == 0 else 1
                q = qy if comp == 0 else qc
                block = ycc[comp, by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                coef = _C @ block @ _C.T
                qz = np.round(coef / q).astype(np.int64).ravel()[ZIGZAG]
                # DC
                diff = int(qz[0]) - prev_dc[comp]
                prev_dc[comp] = int(qz[0])
                size, bits = _encode_coeff_bits(diff)
                code, ln = dc_tabs[tab][size]
                w.write(code, ln)
                if size:
                    w.write(bits, size)
                # AC
                run = 0
                for k in range(1, 64):
                    v = int(qz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        code, ln = ac_tabs[tab][0xF0]
                        w.write(code, ln)
                        run -= 16
                    size, bits = _encode_coeff_bits(v)
                    code, ln = ac_tabs[tab][(run << 4) | size]
                    w.write(code, ln)
                    w.write(bits, size)
                    run = 0
                if run:
                    code, ln = ac_tabs[tab][0x00]  # EOB
                    w.write(code, ln)
    w.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def dqt(tid, q):
        return seg(0xDB, bytes([tid]) + bytes(int(x) for x in q.ravel()[ZIGZAG]))

    def dht(cls, tid, bits, vals):
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, qy)
    if not gray:
        out += dqt(1, qc)
    sof = bytes([8]) + struct.pack(">HH", H, W) + bytes([ncomp])
    comp_specs = ((1, 0),) if gray else ((1, 0), (2, 1), (3, 1))
    for cid, qtid in comp_specs:
        sof += bytes([cid, 0x11, qtid])
    out += seg(0xC0, sof)
    out += dht(0, 0, *_DC_LUM) + dht(1, 0, *_AC_LUM)
    if not gray:
        out += dht(0, 1, *_DC_CHR) + dht(1, 1, *_AC_CHR)
    sos = bytes([ncomp])
    scan_specs = ((1, 0x00),) if gray else ((1, 0x00), (2, 0x11), (3, 0x11))
    for cid, tids in scan_specs:
        sos += bytes([cid, tids])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += w.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: bitstream exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # stuffed
                else:
                    raise ValueError("jpeg: unexpected marker in scan")
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_huff(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (H, W, 3) uint8 RGB (own streams; baseline
    sequential 4:4:4 with 8-bit precision)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    H = W = None
    comps: list[tuple[int, int]] = []  # (component id, quant table id)
    scan_tabs: dict[int, tuple[int, int]] = {}
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("jpeg: bad marker alignment")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        ln = struct.unpack(">H", buf[pos:pos + 2])[0]
        payload = buf[pos + 2:pos + ln]
        body_start = pos + ln
        pos = body_start
        if marker == 0xDB:
            i = 0
            while i < len(payload):
                tid = payload[i] & 0x0F
                raw = np.frombuffer(payload[i + 1:i + 65], np.uint8).astype(np.int64)
                q = np.zeros(64, np.int64)
                q[ZIGZAG] = raw
                qtabs[tid] = q.reshape(8, 8)
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(payload):
                cls_tid = payload[i]
                bits = list(payload[i + 1:i + 17])
                n = sum(bits)
                vals = list(payload[i + 17:i + 17 + n])
                htabs[(cls_tid >> 4, cls_tid & 0x0F)] = _huff_decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0:
            H, W = struct.unpack(">HH", payload[1:5])
            nc = payload[5]
            if nc not in (1, 3):
                raise ValueError("decode_jpeg: 1- or 3-component 4:4:4 only")
            for c in range(nc):
                cid, samp, qtid = payload[6 + 3 * c:9 + 3 * c]
                if samp != 0x11:
                    raise ValueError("decode_jpeg: no chroma subsampling support")
                comps.append((cid, qtid))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("decode_jpeg: baseline sequential (SOF0) only")
        elif marker == 0xDA:
            nc = payload[0]
            for c in range(nc):
                cid, tids = payload[1 + 2 * c:3 + 2 * c]
                scan_tabs[cid] = (tids >> 4, tids & 0x0F)
            # entropy data runs from body_start to EOI
            scan = buf[body_start:]
            eoi = scan.rfind(b"\xff\xd9")
            reader = _BitReader(scan[:eoi if eoi >= 0 else len(scan)])
            HB, WB = (H + 7) // 8, (W + 7) // 8
            planes = np.zeros((3, HB * 8, WB * 8))
            prev_dc = [0, 0, 0]
            for by in range(HB):
                for bx in range(WB):
                    for ci, (cid, qtid) in enumerate(comps):
                        dct_id, act_id = scan_tabs[cid]
                        dct = htabs[(0, dct_id)]
                        act = htabs[(1, act_id)]
                        q = qtabs[qtid]
                        zz = np.zeros(64, np.int64)
                        size = _decode_huff(reader, dct)
                        diff = _extend(reader.read_bits(size), size) if size else 0
                        prev_dc[ci] += diff
                        zz[0] = prev_dc[ci]
                        k = 1
                        while k < 64:
                            sym = _decode_huff(reader, act)
                            if sym == 0x00:
                                break
                            if sym == 0xF0:
                                k += 16
                                continue
                            run, size = sym >> 4, sym & 0x0F
                            k += run
                            if k > 63:
                                raise ValueError("jpeg: AC overflow")
                            zz[k] = _extend(reader.read_bits(size), size)
                            k += 1
                        coef = np.zeros(64, np.float64)
                        coef[ZIGZAG] = zz
                        block = _C.T @ ((coef.reshape(8, 8)) * q) @ _C
                        planes[ci, by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = block
            ycc = planes[:len(comps), :H, :W] + 128.0
            if len(comps) == 1:
                g = np.clip(ycc[0], 0, 255).astype(np.uint8)
                return np.stack([g, g, g], axis=2)
            return _ycbcr_to_rgb(ycc)
    raise ValueError("jpeg: no scan found")
