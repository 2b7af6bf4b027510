"""Baseline JPEG codec in pure numpy (no PIL/libjpeg anywhere).

Implements the subset of ISO/IEC 10918-1 (baseline sequential DCT,
8-bit, sampling factors up to 2 — 4:4:4 / 4:2:0 / 4:2:2, standard
Annex-K quantization and Huffman tables) needed to decode — and, for tests, encode — real JFIF images
inside the multimodal pipeline's Arrow decode workers. Everything here
derives from the public JPEG specification.

Decode path: marker parse (SOI/DQT/SOF0/DHT/SOS/EOI) → entropy-decode
the interleaved MCUs (Huffman DC deltas + AC run/size, byte-stuffing
aware) → dequantize → de-zigzag → 8×8 inverse DCT (matrix form) →
level shift → YCbCr→RGB.

The encoder exists so tests can round-trip: encode a known texture,
decode it, and assert PSNR against the original — validating both
directions against each other with no external reference codec.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K.1 quantization tables (luminance / chrominance)
QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QT_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 Huffman specs: (BITS counts per code length 1..16, HUFFVAL)
HT_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
             list(range(12)))
HT_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
HT_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
HT_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# 8×8 DCT-II orthonormal basis (type-II matrix form)
_k = np.arange(8)
_DCT = np.sqrt(2.0 / 8) * np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16)
_DCT[0, :] = np.sqrt(1.0 / 8)


def _dct2(block):
    return _DCT @ block @ _DCT.T


def _idct2(coef):
    return _DCT.T @ coef @ _DCT


def _build_huffman(bits, vals):
    """(code, length) per symbol, canonical order (spec C.2)."""
    codes, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return codes


def _build_decoder(bits, vals):
    """(code, length) → symbol lookup for decoding."""
    return {v: k for k, v in _build_huffman(bits, vals).items()}


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code, length):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self):
        while self.n <= 24 and self.pos < len(self.data):
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:
                    byte = 0xFF  # marker: shouldn't happen mid-scan here
            self.acc = (self.acc << 8) | byte
            self.n += 8

    def read(self, length):
        self._fill()
        if length == 0:
            return 0
        if self.n < length:
            raise ValueError("JPEG bitstream underrun")
        v = (self.acc >> (self.n - length)) & ((1 << length) - 1)
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return v

    def read_symbol(self, table):
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.read(1)
            length += 1
            sym = table.get((code, length))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")


def _extend(v, size):
    """Spec F.12: map `size`-bit magnitude to signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _magnitude(v):
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    code = v if v >= 0 else v + (1 << size) - 1
    return size, code


# ------------------------------------------------------------------ encode
def _encode_block(bw, block, qt, dc_codes, ac_codes, pred):
    """DCT → quantize → entropy-code one 8×8 block; returns new DC pred."""
    import numpy as np

    coef = _dct2(block)
    qf = coef.flatten()[ZIGZAG] / qt[ZIGZAG].astype(np.float64).reshape(-1)
    zz = np.round(qf).astype(np.int32)
    diff = int(zz[0]) - pred
    size, code = _magnitude(diff) if diff else (0, 0)
    hc, hl = dc_codes[size]
    bw.write(hc, hl)
    if size:
        bw.write(code, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            hc, hl = ac_codes[0xF0]
            bw.write(hc, hl)
            run -= 16
        size, code = _magnitude(v)
        hc, hl = ac_codes[(run << 4) | size]
        bw.write(hc, hl)
        bw.write(code, size)
        run = 0
    if run:
        hc, hl = ac_codes[0x00]  # EOB
        bw.write(hc, hl)
    return int(zz[0])


def _pad_block(plane, ys, xs):
    """8×8 block at (ys, xs), edge-replicated past the plane border."""
    import numpy as np

    h, w = plane.shape
    block = np.zeros((8, 8))
    yh, xw = max(0, min(8, h - ys)), max(0, min(8, w - xs))
    block[:yh, :xw] = plane[ys:ys + yh, xs:xs + xw]
    if 0 < yh < 8:
        block[yh:, :] = block[yh - 1, :]
    if 0 < xw < 8:
        block[:, xw:] = block[:, xw - 1:xw]
    return block


def encode_jpeg(pix: "np.ndarray", subsample: bool = False) -> bytes:
    """Baseline JFIF encode of an (h, w, 3) uint8 RGB array with the
    Annex-K tables — 4:4:4 by default, 4:2:0 with ``subsample=True``
    (2×2 luma blocks per MCU, chroma averaged 2×2). Pure numpy; exists
    to give the decoder a real round-trip test partner."""
    h, w, _ = pix.shape
    r, g, b = (pix[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b
    if subsample:
        # pad to even dims, then 2×2 block means
        he, we = (h + 1) // 2 * 2, (w + 1) // 2 * 2
        def half(p):
            q = np.empty((he, we))
            q[:h, :w] = p
            if he > h:
                q[h:, :w] = p[h - 1, :]
            if we > w:
                q[:h, w:] = p[:, w - 1:w]
            if he > h and we > w:
                q[h:, w:] = p[h - 1, w - 1]
            return (q[0::2, 0::2] + q[1::2, 0::2] + q[0::2, 1::2] + q[1::2, 1::2]) / 4.0
        cb, cr = half(cb), half(cr)
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1), (1, 1), (1, 1)]
    planes = [y, cb, cr]
    qts = [QT_LUM, QT_CHR, QT_CHR]
    dc_codes = [_build_huffman(*s) for s in (HT_DC_LUM, HT_DC_CHR, HT_DC_CHR)]
    ac_codes = [_build_huffman(*s) for s in (HT_AC_LUM, HT_AC_CHR, HT_AC_CHR)]

    hmax = max(sx for sx, _ in samp)
    vmax = max(sy for _, sy in samp)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    bw = _BitWriter()
    pred = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for c in range(3):
                sx, sy = samp[c]
                for v in range(sy):
                    for u in range(sx):
                        ys = (my * sy + v) * 8
                        xs = (mx * sx + u) * 8
                        block = _pad_block(planes[c], ys, xs)
                        pred[c] = _encode_block(
                            bw, block, qts[c], dc_codes[c], ac_codes[c], pred[c]
                        )
    bw.flush()

    out = bytearray(b"\xFF\xD8")  # SOI
    def seg(marker, body):
        out.extend(marker + struct.pack(">H", len(body) + 2) + body)
    for tid, qt in ((0, QT_LUM), (1, QT_CHR)):
        seg(b"\xFF\xDB", bytes([tid]) + bytes(int(qt[z]) for z in ZIGZAG))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, (sx, sy), tq in ((1, samp[0], 0), (2, samp[1], 1), (3, samp[2], 1)):
        sof += bytes([cid, (sx << 4) | sy, tq])
    seg(b"\xFF\xC0", sof)
    for tc_th, (bits, vals) in ((0x00, HT_DC_LUM), (0x01, HT_DC_CHR),
                                (0x10, HT_AC_LUM), (0x11, HT_AC_CHR)):
        seg(b"\xFF\xC4", bytes([tc_th]) + bytes(bits) + bytes(vals))
    sos = bytes([3]) + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])
    seg(b"\xFF\xDA", sos)
    out.extend(bw.buf)
    out.extend(b"\xFF\xD9")  # EOI
    return bytes(out)


# ------------------------------------------------------------------ decode
def decode_jpeg(data: bytes) -> "np.ndarray":
    """Baseline JFIF decode to an (h, w, 3) uint8 RGB array. Supports
    8-bit baseline sequential with sampling factors up to 2 (4:4:4,
    4:2:0, 4:2:2 in either orientation) or single-component, with the
    tables carried in the stream (not only Annex K). Raises ValueError
    on progressive streams."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, "np.ndarray"] = {}
    htabs: dict[int, dict] = {}
    comps = []
    h = w = None
    scan_data = None
    scan_comps = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        ln = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        body = data[pos + 4:pos + 2 + ln]
        if marker == 0xDB:
            b = 0
            while b < len(body):
                pq_tq = body[b]
                if pq_tq >> 4:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(body[b + 1:b + 65], dtype=np.uint8)
                qtabs[pq_tq & 0xF] = tbl
                b += 65
        elif marker == 0xC0:
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            b = 6
            for _ in range(nc):
                cid, hv, tq = body[b], body[b + 1], body[b + 2]
                sx, sy = hv >> 4, hv & 0xF
                if sx > 2 or sy > 2 or sx < 1 or sy < 1:
                    raise ValueError("sampling factors above 2 unsupported")
                comps.append({"id": cid, "tq": tq, "sx": sx, "sy": sy})
                b += 3
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("only baseline sequential JPEG supported")
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                tc_th = body[b]
                bits = list(body[b + 1:b + 17])
                nv = sum(bits)
                vals = list(body[b + 17:b + 17 + nv])
                htabs[tc_th] = _build_decoder(bits, vals)
                b += 17 + nv
        elif marker == 0xDA:
            ns = body[0]
            scan_comps = []
            b = 1
            for _ in range(ns):
                cs, tdta = body[b], body[b + 1]
                scan_comps.append({"id": cs, "dc": tdta >> 4, "ac": tdta & 0xF})
                b += 2
            scan_start = pos + 2 + ln
            end = data.rfind(b"\xFF\xD9")
            scan_data = data[scan_start:end if end > 0 else len(data)]
            pos = (end if end > 0 else len(data))
            continue
        pos += 2 + ln
    if h is None or scan_data is None:
        raise ValueError("JPEG missing SOF0/SOS")

    hmax = max(c["sx"] for c in comps)
    vmax = max(c["sy"] for c in comps)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    br = _BitReader(scan_data)
    nc = len(comps)
    planes = [
        np.zeros((mcus_y * c["sy"] * 8, mcus_x * c["sx"] * 8)) for c in comps
    ]
    pred = [0] * nc
    by_id = {c["id"]: i for i, c in enumerate(comps)}
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for sc in scan_comps:
                ci = by_id[sc["id"]]
                comp = comps[ci]
                dc_tab = htabs[0x00 | sc["dc"]]
                ac_tab = htabs[0x10 | sc["ac"]]
                for v in range(comp["sy"]):
                    for u in range(comp["sx"]):
                        zz = np.zeros(64, dtype=np.int32)
                        size = br.read_symbol(dc_tab)
                        diff = _extend(br.read(size), size) if size else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = br.read_symbol(ac_tab)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0xF
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.read(size), size)
                            k += 1
                        coef = np.zeros(64)
                        coef[ZIGZAG] = zz * qtabs[comp["tq"]][ZIGZAG]
                        block = _idct2(coef.reshape(8, 8))
                        ys = (my * comp["sy"] + v) * 8
                        xs = (mx * comp["sx"] + u) * 8
                        planes[ci][ys:ys + 8, xs:xs + 8] = block
    # upsample each component to full resolution, crop
    full = []
    for i, c in enumerate(comps):
        p = np.repeat(np.repeat(planes[i], vmax // c["sy"], axis=0),
                      hmax // c["sx"], axis=1)
        full.append(p[:h, :w])
    if nc == 1:
        gray = np.clip(full[0] + 128.0, 0, 255).astype(np.uint8)
        return np.stack([gray] * 3, axis=-1)
    y, cb, cr = full[0] + 128.0, full[1], full[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
