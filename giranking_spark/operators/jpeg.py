"""Pure-Python baseline JPEG (JFIF) codec — no external codec libraries.

Real web-crawl multimodal corpora are overwhelmingly JPEG; a pipeline whose
image path only reads PPM/BMP punts on the dominant format.  This module
implements baseline sequential DCT JPEG (ITU-T T.81) end to end in
numpy-vectorized Python:

  * decoder: SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS marker walk, canonical
    Huffman decode with byte-unstuffing and RST handling, DC-predictor
    differential decode, dequantize, float64 matrix IDCT, sampling factors
    up to 2 (4:4:4 and 4:2:0), BT.601 YCbCr->RGB with clamping
  * encoder: the matching baseline writer (Annex K standard Huffman tables,
    caller-supplied or standard quant tables, optional 4:2:0) — used to
    build fixtures and to round-trip-test the decoder

Only 8-bit baseline sequential is supported; progressive / arithmetic /
12-bit streams raise ValueError (honest, like the other codecs here).

Exactness contract used by the oracle-checked query (queries/mmq.py
``mm_jpeg_features``): with all-ones quant tables and 4:4:4 sampling, an
image that is CONSTANT WITHIN EACH 8x8 BLOCK decodes to exactly the encoded
YCbCr integers (DC = 8*(v-128) is exact in the DCT, survives quantization
by 1 unchanged, and the IDCT's float error is ~1 ulp — far inside the
floor(x+0.5) rounding margin).  The only lossy step left is the color
transform's integer rounding, a closed-form map SQL can replicate — so a
DuckDB oracle can predict the decoded pixels without any JPEG machinery.

Spark integration: `decode_pixels` (operators/multimodal.py) dispatches
0xFFD8 payloads here, so image_features / resize_images / image_ahash run
unchanged over JPEG columns via the same Arrow-batched mapInPandas stages.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants (ITU-T T.81 / JFIF, all public spec material) ---------------

#: zig-zag scan order: zigzag index -> (row, col) flat index
ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: Annex K.1 example luminance / chrominance quant tables (quality ~50)
STD_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
STD_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 standard Huffman tables: (bits[1..16], values)
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
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
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
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

#: 8x8 DCT-II basis matrix A: forward F = A @ f @ A.T, inverse f = A.T @ F @ A
_K = np.arange(8).reshape(8, 1).astype(np.float64)
_N = np.arange(8).reshape(1, 8).astype(np.float64)
DCT_A = 0.5 * np.where(_K == 0, 1.0 / np.sqrt(2.0), 1.0) * np.cos(
    (2.0 * _N + 1.0) * _K * np.pi / 16.0
)

# BT.601 color-transform constants, shared verbatim with the SQL oracle
# (queries/mmq.py renders them via repr with forced-DOUBLE notation)
YCC = {
    "yr": 0.299, "yg": 0.587, "yb": 0.114,
    "cbr": -0.168735892, "cbg": -0.331264108, "cbb": 0.5,
    "crr": 0.5, "crg": -0.418687589, "crb": -0.081312411,
    "rcr": 1.402, "gcb": -0.344136286, "gcr": -0.714136286, "bcb": 1.772,
}


def _round_half_up(x: np.ndarray) -> np.ndarray:
    """floor(x + 0.5): the explicit rounding both the codec and the SQL
    oracle use (python round / numpy rint are banker's; DuckDB round is
    half-away — floor(x+0.5) is the one portable spelling)."""
    return np.floor(x + 0.5)


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """HxWx3 uint8 RGB -> HxWx3 int16 YCbCr (BT.601, rounded + clamped) —
    association order matches the oracle SQL exactly."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = (YCC["yr"] * r + YCC["yg"] * g) + YCC["yb"] * b
    cb = ((YCC["cbr"] * r + YCC["cbg"] * g) + YCC["cbb"] * b) + 128.0
    cr = ((YCC["crr"] * r + YCC["crg"] * g) + YCC["crb"] * b) + 128.0
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.int16)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """HxWx3 float/int YCbCr -> HxWx3 uint8 RGB (BT.601 inverse, rounded +
    clamped) — association order matches the oracle SQL exactly."""
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + YCC["rcr"] * cr
    g = (y + YCC["gcb"] * cb) + YCC["gcr"] * cr
    b = y + YCC["bcb"] * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


# --- Huffman machinery ------------------------------------------------------

def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical JPEG Huffman codes: value -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_map(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-at-a-time decoder."""
    return {(ln, code): sym for sym, (code, ln) in _build_codes(bits, values).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    """Entropy-coded-segment reader: un-stuffs FF00, stops at markers; RSTn
    markers are consumed by `restart()`."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG scan (ran off entropy data)")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG scan (dangling 0xFF)")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartPending()
            else:
                raise ValueError(f"marker 0x{nxt:02x} inside scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        bit = (self.acc >> self.nbits) & 1
        # drop the consumed bit: without this the accumulator grows one bit
        # per bit read for the life of the scan (big-int arithmetic turns
        # O(n) decode into O(n^2) on megapixel images)
        self.acc &= (1 << self.nbits) - 1
        return bit

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Consume an RSTn marker and realign to a byte boundary."""
        self.acc = 0
        self.nbits = 0
        # skip any pad bits already consumed implicitly; find the marker
        while self.pos + 1 < len(self.data) and (
            self.data[self.pos] != 0xFF
            or not (0xD0 <= self.data[self.pos + 1] <= 0xD7)
        ):
            self.pos += 1
        if self.pos + 1 >= len(self.data):
            raise ValueError("truncated JPEG scan (missing RSTn marker)")
        self.pos += 2


class _RestartPending(Exception):
    pass


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude v to signed coefficient."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """Signed value -> (category t, t-bit code) for Huffman coding."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, (v if v > 0 else v + (1 << t) - 1)


# --- encoder ---------------------------------------------------------------

def encode_jpeg(
    rgb: np.ndarray,
    quant_luma: np.ndarray | None = None,
    quant_chroma: np.ndarray | None = None,
    subsample_420: bool = False,
) -> bytes:
    """Baseline sequential JFIF encoder. ``rgb`` is HxWx3 uint8; quant
    tables are 64-long int arrays in NATURAL (row-major) order, default
    Annex K. 4:4:4 unless ``subsample_420``."""
    h, w = rgb.shape[:2]
    ql = (STD_QUANT_LUMA if quant_luma is None else np.asarray(quant_luma)).reshape(64)
    qc = (STD_QUANT_CHROMA if quant_chroma is None else np.asarray(quant_chroma)).reshape(64)
    ycc = rgb_to_ycbcr(rgb).astype(np.float64)

    hs = vs = 2 if subsample_420 else 1
    mcu_w, mcu_h = 8 * hs, 8 * vs
    pw = -(-w // mcu_w) * mcu_w
    ph = -(-h // mcu_h) * mcu_h
    padded = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    planes = [padded[..., 0], padded[..., 1], padded[..., 2]]
    if subsample_420:
        for c in (1, 2):
            p = planes[c]
            planes[c] = _round_half_up(
                (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
            )

    dc_l = _build_codes(*STD_DC_LUMA)
    ac_l = _build_codes(*STD_AC_LUMA)
    dc_c = _build_codes(*STD_DC_CHROMA)
    ac_c = _build_codes(*STD_AC_CHROMA)
    bw = _BitWriter()
    pred = [0, 0, 0]

    def emit_block(plane: np.ndarray, by: int, bx: int, comp: int) -> None:
        q = ql if comp == 0 else qc
        dct, act = (dc_l, ac_l) if comp == 0 else (dc_c, ac_c)
        f = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
        coef = DCT_A @ f @ DCT_A.T
        zz = np.where(
            coef.reshape(64)[ZIGZAG] >= 0,
            np.floor(coef.reshape(64)[ZIGZAG] / q[ZIGZAG] + 0.5),
            -np.floor(-coef.reshape(64)[ZIGZAG] / q[ZIGZAG] + 0.5),
        ).astype(np.int64)
        diff = int(zz[0]) - pred[comp]
        pred[comp] = int(zz[0])
        t, code = _magnitude(diff)
        dc_code, dc_len = dct[t]
        bw.write(dc_code, dc_len)
        if t:
            bw.write(code, t)
        run = 0
        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c0, l0 = act[0xF0]
                bw.write(c0, l0)
                run -= 16
            t2, code2 = _magnitude(v)
            c1, l1 = act[(run << 4) | t2]
            bw.write(c1, l1)
            bw.write(code2, t2)
            run = 0
        if last_nz < 63:
            c2, l2 = act[0x00]
            bw.write(c2, l2)

    n_mcu_x, n_mcu_y = pw // mcu_w, ph // mcu_h
    for my in range(n_mcu_y):
        for mx in range(n_mcu_x):
            for byy in range(vs):
                for bxx in range(hs):
                    emit_block(planes[0], my * vs + byy, mx * hs + bxx, 0)
            for comp in (1, 2):
                emit_block(planes[comp], my, mx, comp)
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dht(tc: int, th: int, table: tuple[list[int], list[int]]) -> bytes:
        bits, vals = table
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(int(x) for x in ql[ZIGZAG]))
    out += seg(0xFFDB, b"\x01" + bytes(int(x) for x in qc[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, (hs << 4) | vs, 0])
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    out += seg(0xFFC0, sof)
    out += seg(0xFFC4, dht(0, 0, STD_DC_LUMA) )
    out += seg(0xFFC4, dht(1, 0, STD_AC_LUMA))
    out += seg(0xFFC4, dht(0, 1, STD_DC_CHROMA))
    out += seg(0xFFC4, dht(1, 1, STD_AC_CHROMA))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return out


# --- decoder ---------------------------------------------------------------

def decode_jpeg(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a baseline sequential JFIF/JPEG payload: returns
    (width, height, HxWx3 uint8 RGB).  Grayscale streams are expanded to
    RGB.  Progressive (SOF2) and arithmetic coding raise ValueError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0

    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8)
                quant[tq] = tbl
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                huff[(tc, th)] = _build_decode_map(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise ValueError("only 8-bit JPEG supported")
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "hs": hv >> 4, "vs": hv & 0x0F, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF marker 0x{marker:02x}) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cs, td_ta = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                scan_comps.append(
                    {**comp, "td": td_ta >> 4, "ta": td_ta & 0x0F}
                )
            pos += seglen
            return _decode_scan(
                payload, pos, w, h, scan_comps, quant, huff, restart_interval
            )
        pos += seglen
    raise ValueError("no SOS marker — truncated JPEG")


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _decode_scan(
    data: bytes,
    pos: int,
    w: int,
    h: int,
    comps: list[dict],
    quant: dict[int, np.ndarray],
    huff: dict[tuple[int, int], dict],
    restart_interval: int,
) -> tuple[int, int, np.ndarray]:
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    n_mcu_x = -(-w // mcu_w)
    n_mcu_y = -(-h // mcu_h)
    planes = [
        np.zeros((n_mcu_y * c["vs"] * 8, n_mcu_x * c["hs"] * 8), dtype=np.float64)
        for c in comps
    ]
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    inv_zigzag = ZIGZAG  # zigzag index -> natural index

    for my in range(n_mcu_y):
        for mx in range(n_mcu_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                for byy in range(c["vs"]):
                    for bxx in range(c["hs"]):
                        try:
                            zz = _decode_block(br, huff, c, pred, ci)
                        except _RestartPending:
                            br.restart()
                            pred = [0] * len(comps)
                            zz = _decode_block(br, huff, c, pred, ci)
                        coef = np.zeros(64, dtype=np.float64)
                        coef[inv_zigzag] = zz * quant[c["tq"]][inv_zigzag]
                        block = DCT_A.T @ coef.reshape(8, 8) @ DCT_A + 128.0
                        y0 = (my * c["vs"] + byy) * 8
                        x0 = (mx * c["hs"] + bxx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    # upsample each plane to full MCU-grid resolution, then crop
    full = []
    for c, p in zip(comps, planes):
        if c["hs"] != hmax or c["vs"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["vs"], axis=0), hmax // c["hs"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        ycc = np.stack([full[0], np.full((h, w), 128.0), np.full((h, w), 128.0)], axis=-1)
    else:
        ycc = np.stack(full, axis=-1)
    return w, h, ycbcr_to_rgb(ycc)


def _decode_block(
    br: _BitReader, huff: dict, c: dict, pred: list[int], ci: int
) -> np.ndarray:
    zz = np.zeros(64, dtype=np.int64)
    t = _huff_decode(br, huff[(0, c["td"])])
    diff = _extend(br.receive(t), t)
    pred[ci] += diff
    zz[0] = pred[ci]
    k = 1
    ac = huff[(1, c["ta"])]
    while k < 64:
        rs = _huff_decode(br, ac)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(br.receive(s), s)
        k += 1
    return zz
