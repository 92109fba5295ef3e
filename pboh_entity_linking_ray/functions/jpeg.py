"""Baseline-DCT JPEG codec, stdlib+numpy only.

Closes the last honestly-stubbed lossy codec in the multimodal family
(pipelines/multimodal.py): a REAL baseline sequential JFIF decoder —
marker walk, stream-defined quant + Huffman tables (the decoder trusts
NOTHING from the encoder beyond the bytes), entropy decode with byte
unstuffing, dequantize, inverse zigzag, orthonormal 2-D IDCT, YCbCr →
RGB — plus the matching encoder used to synthesize the corpus payloads
(4:4:4, no subsampling, interleaved single-block MCUs).

Scope (rejected explicitly, the PNG-codec precedent): baseline
sequential only — progressive (SOF2), arithmetic coding, subsampled
chroma and restart markers raise instead of mis-decoding.

Everything here is from the public JPEG spec (ITU-T T.81): the zigzag
scan, the Annex K example quantization tables, canonical Huffman
construction from (BITS, HUFFVAL), DC differential + AC run-length
categories, and the JFIF color transform.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan: scan position -> row-major coefficient index (T.81 fig. 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K.1/K.2 example quantization tables (row-major)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 example Huffman specs: (BITS[1..16], HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix."""
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    c = np.cos((2 * n + 1) * k * np.pi / 16)
    c[0] *= 1 / np.sqrt(2)
    return c / 2


_DCT = _dct_matrix()


def _canonical_codes(bits, vals):
    """(BITS, HUFFVAL) → {symbol: (code, length)} (T.81 C.2)."""
    codes = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return codes


def _category(v: int) -> int:
    """DC/AC magnitude category = bit length of |v|."""
    return int(abs(v)).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.acc &= (1 << self.nbits) - 1   # keep the int small
            self.out.append(b)
            if b == 0xFF:          # byte stuffing
                self.out.append(0x00)

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)    # 1-fill to byte boundary


def _encode_block(zz: np.ndarray, prev_dc: int, dc_codes, ac_codes,
                  w: _BitWriter) -> int:
    """One zigzagged quantized block → entropy-coded bits; returns DC."""
    diff = int(zz[0]) - prev_dc
    s = _category(diff)
    code, ln = dc_codes[s]
    w.put(code, ln)
    if s:
        w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]        # ZRL
            w.put(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        w.put(code, ln)
        w.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
        if i == last_nz:
            break
    if last_nz < 63:
        code, ln = ac_codes[0x00]            # EOB
        w.put(code, ln)
    return int(zz[0])


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                   0, 255).astype(np.uint8)


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def jpeg_encode(img: np.ndarray, qt_luma: np.ndarray = QT_LUMA,
                qt_chroma: np.ndarray = QT_CHROMA) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes (4:4:4)."""
    h, w, _ = img.shape
    ycc = _rgb_to_ycbcr(img)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw, 3))
    padded[:h, :w] = ycc
    padded[h:] = padded[h - 1: h]             # edge replication
    padded[:, w:] = padded[:, w - 1: w]

    qts = (qt_luma, qt_chroma, qt_chroma)
    dc_specs = (_DC_LUMA, _DC_CHROMA, _DC_CHROMA)
    ac_specs = (_AC_LUMA, _AC_CHROMA, _AC_CHROMA)
    dc_codes = [_canonical_codes(*s) for s in dc_specs]
    ac_codes = [_canonical_codes(*s) for s in ac_specs]

    wtr = _BitWriter()
    prev_dc = [0, 0, 0]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for c in range(3):                # interleaved Y, Cb, Cr MCU
                blk = padded[by:by + 8, bx:bx + 8, c] - 128.0
                coef = _DCT @ blk @ _DCT.T
                q = np.round(coef / qts[c].reshape(8, 8)).astype(np.int64)
                zz = q.reshape(-1)[ZIGZAG]
                prev_dc[c] = _encode_block(zz, prev_dc[c], dc_codes[c],
                                           ac_codes[c], wtr)
    wtr.flush()

    out = bytearray(b"\xFF\xD8")              # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, qt in ((0, qt_luma), (1, qt_chroma)):
        out += _seg(0xDB, bytes([tq]) + bytes(
            int(qt[z]) for z in ZIGZAG))      # DQT stores zigzag order
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid in range(3):
        sof += bytes([cid + 1, 0x11, 0 if cid == 0 else 1])
    out += _seg(0xC0, sof)                    # SOF0 baseline
    for tc_th, spec in ((0x00, _DC_LUMA), (0x01, _DC_CHROMA),
                        (0x10, _AC_LUMA), (0x11, _AC_CHROMA)):
        out += _seg(0xC4, bytes([tc_th]) + bytes(spec[0])
                    + bytes(spec[1]))
    sos = bytes([3])
    for cid in range(3):
        sos += bytes([cid + 1, 0x00 if cid == 0 else 0x11])
    sos += b"\x00\x3F\x00"
    out += _seg(0xDA, sos)
    out += wtr.out
    out += b"\xFF\xD9"                        # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2                 # stuffed byte
            elif nxt == 0xD9:                 # EOI reached mid-fill: pad
                b = 0
                self.pos += 0
                self.acc = (self.acc << 8)
                self.nbits += 8
                return
            else:
                raise NotImplementedError(
                    f"marker 0xFF{nxt:02X} inside scan (restart markers "
                    "not supported)")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        v = (self.acc >> self.nbits) & 1
        self.acc &= (1 << self.nbits) - 1       # keep the int small
        return v

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _decode_table(codes: dict) -> dict:
    """{symbol: (code, len)} → {(len, code): symbol} for stream decode."""
    return {(ln, code): sym for sym, (code, ln) in codes.items()}


def _read_symbol(rd: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | rd.bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, 3) uint8 RGB.

    Stream-defined everything: DQT and DHT tables are parsed from the
    file, SOF0 must be baseline 8-bit with 1×1 sampling (4:4:4) —
    progressive / subsampled / arithmetic streams raise."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    h = w = None
    scan_comp = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zzvals = np.frombuffer(body[b + 1:b + 65], dtype=np.uint8)
                qt = np.zeros(64, dtype=np.int64)
                qt[ZIGZAG] = zzvals           # DQT is in zigzag order
                qts[tq] = qt
                b += 65
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1:b + 17])
                nv = sum(bits)
                vals = list(body[b + 17:b + 17 + nv])
                huff[(tc, th)] = _decode_table(_canonical_codes(bits, vals))
                b += 17 + nv
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit baseline")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                if hv != 0x11:
                    raise NotImplementedError(
                        "subsampled chroma not supported (4:4:4 only)")
                comps.append((cid, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline SOF 0xFF{marker:02X} (progressive/"
                "arithmetic) not supported")
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals not supported")
        elif marker == 0xDA:
            nc = body[0]
            scan_comp = [(body[1 + 2 * i], body[2 + 2 * i] >> 4,
                          body[2 + 2 * i] & 0x0F) for i in range(nc)]
            break                             # entropy data follows
    if comps is None or scan_comp is None:
        raise ValueError("truncated JPEG (no SOF/SOS)")

    nc = len(comps)
    rd = _BitReader(data, pos)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = np.zeros((nc, ph, pw))
    prev_dc = [0] * nc
    tq_of = {cid: tq for cid, tq in comps}
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci, (cid, td, ta) in enumerate(scan_comp):
                zz = np.zeros(64, dtype=np.int64)
                s = _read_symbol(rd, huff[(0, td)])
                diff = _extend(rd.bits(s), s) if s else 0
                prev_dc[ci] += diff
                zz[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    rs = _read_symbol(rd, huff[(1, ta)])
                    r, s = rs >> 4, rs & 0x0F
                    if rs == 0x00:            # EOB
                        break
                    if rs == 0xF0:            # ZRL
                        k += 16
                        continue
                    k += r
                    if k > 63:
                        raise ValueError("AC run past block end")
                    zz[k] = _extend(rd.bits(s), s)
                    k += 1
                blk = np.zeros(64, dtype=np.float64)
                blk[ZIGZAG] = zz * qts[tq_of[cid]][ZIGZAG]
                px = _DCT.T @ blk.reshape(8, 8) @ _DCT + 128.0
                planes[ci, by:by + 8, bx:bx + 8] = px
    ycc = np.stack([planes[i, :h, :w] for i in range(nc)], axis=-1)
    if nc == 1:
        g = np.clip(np.round(ycc[..., 0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    return _ycbcr_to_rgb(ycc)
