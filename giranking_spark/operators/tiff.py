"""Pure-Python baseline TIFF codec — no external imaging libraries.

TIFF is the scanned-document / OCR-corpus format; its baseline profiles
need no codec library at all: the container is an IFD tag walk and the two
dependency-free compressions are None (raw strips) and PackBits (the
byte-oriented RLE of TIFF 6.0 §9).  This module implements both, for 8-bit
RGB and grayscale:

  * decoder: header (II/MM byte order), first IFD, the baseline tags
    (ImageWidth/Length, BitsPerSample, Compression, PhotometricInterp,
    StripOffsets/StripByteCounts, RowsPerStrip, SamplesPerPixel), raw or
    PackBits strip assembly, gray broadcast to RGB.  LZW/JPEG-in-TIFF,
    tiled layouts, planar configuration 2, and 16-bit samples raise
    ValueError (honest).
  * encoder: little-endian single-IFD writer, raw or PackBits strips —
    fixture/round-trip fodder.

Lossless, so the ``mm_tiff_features`` oracle (queries/mmq.py) is the
generative fixture formula verbatim.

Spark integration: `decode_pixels` (operators/multimodal.py) dispatches
``II*\\0`` / ``MM\\0*`` payloads here, sharing the Arrow-batched
mapInPandas stages with every other image format.
"""

from __future__ import annotations

import struct

import numpy as np


def _packbits_encode(data: bytes) -> bytes:
    """TIFF 6.0 PackBits: literal runs and repeat runs, 128-byte max."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find a repeat run of >= 3 (2-byte repeats aren't worth breaking
        # a literal for; the spec allows either choice)
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3 or (run == 2 and (i + 2 >= n)):
            out.append((257 - run) & 0xFF)  # -(run-1) as unsigned
            out.append(data[i])
            i += run
            continue
        # literal run: until the next >=3 repeat or 128 bytes
        start = i
        i += 1
        while i < n and i - start < 128:
            if i + 2 < n and data[i] == data[i + 1] == data[i + 2]:
                break
            i += 1
        out.append(i - start - 1)
        out += data[start:i]
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        b = data[i]
        i += 1
        if b < 128:  # literal: next b+1 bytes
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:  # repeat: next byte 257-b times
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # b == 128: no-op per spec
    if len(out) < expected:
        raise ValueError("PackBits stream ended short of the raster")
    return bytes(out[:expected])


def encode_tiff(
    width: int,
    height: int,
    rgb: bytes,
    packbits: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """Little-endian 8-bit RGB TIFF, raw (compression 1) or PackBits
    (compression 32773) strips."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"raster is {len(rgb)} bytes, want {width * height * 3}")
    rps = rows_per_strip or max(height, 1)
    strips = []
    for y0 in range(0, height, rps):
        chunk = rgb[y0 * width * 3 : min(y0 + rps, height) * width * 3]
        strips.append(_packbits_encode(chunk) if packbits else chunk)

    tags = []  # (tag, type, count, value_or_offset) — SHORT=3, LONG=4

    def tag(t: int, typ: int, count: int, val: int) -> None:
        tags.append((t, typ, count, val))

    n_tags = 9
    ifd_off = 8
    data_off = ifd_off + 2 + n_tags * 12 + 4
    # BitsPerSample needs 3 SHORTs -> stored out-of-line
    bps_off = data_off
    data_off += 6
    strip_offs = []
    for s in strips:
        strip_offs.append(data_off)
        data_off += len(s)
    if len(strips) > 1:
        so_off = data_off
        data_off += 4 * len(strips)
        sc_off = data_off
        data_off += 4 * len(strips)
    tag(256, 4, 1, width)            # ImageWidth
    tag(257, 4, 1, height)           # ImageLength
    tag(258, 3, 3, bps_off)          # BitsPerSample [8,8,8]
    tag(259, 3, 1, 32773 if packbits else 1)  # Compression
    tag(262, 3, 1, 2)                # Photometric: RGB
    tag(273, 4, len(strips), strip_offs[0] if len(strips) == 1 else so_off)
    tag(277, 3, 1, 3)                # SamplesPerPixel
    tag(278, 4, 1, rps)              # RowsPerStrip
    tag(279, 4, len(strips), len(strips[0]) if len(strips) == 1 else sc_off)

    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += struct.pack("<H", n_tags)
    for t, typ, count, val in tags:
        out += struct.pack("<HHII", t, typ, count, val)
    out += struct.pack("<I", 0)  # next-IFD pointer
    out += struct.pack("<HHH", 8, 8, 8)
    for s in strips:
        out += s
    if len(strips) > 1:
        for o in strip_offs:
            out += struct.pack("<I", o)
        for s in strips:
            out += struct.pack("<I", len(s))
    return bytes(out)


_TYPE_SIZE = {1: 1, 3: 2, 4: 4}


def decode_tiff(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a baseline 8-bit raw/PackBits TIFF (first IFD): returns
    (width, height, HxWx3 uint8 RGB); grayscale broadcasts to RGB."""
    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF payload (bad byte-order header)")
    (ifd_off,) = struct.unpack_from(e + "I", payload, 4)
    (n_tags,) = struct.unpack_from(e + "H", payload, ifd_off)
    # tag -> (type, count, offset of the 4-byte value word in the IFD entry)
    tags: dict[int, tuple[int, int, int]] = {}
    for i in range(n_tags):
        entry = ifd_off + 2 + i * 12
        t, typ, count = struct.unpack_from(e + "HHI", payload, entry)
        tags[t] = (typ, count, entry + 8)

    def values(t: int, default: list[int] | None = None) -> list[int]:
        if t not in tags:
            if default is None:
                raise ValueError(f"missing required TIFF tag {t}")
            return default
        typ, count, word_off = tags[t]
        size = _TYPE_SIZE.get(typ)
        if size is None:
            raise ValueError(f"unsupported TIFF tag type {typ}")
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        if size * count <= 4:  # packed inline in the value word
            return list(struct.unpack_from(e + fmt * count, payload, word_off))
        (data_off,) = struct.unpack_from(e + "I", payload, word_off)
        return list(struct.unpack_from(e + fmt * count, payload, data_off))

    w = values(256)[0]
    h = values(257)[0]
    comp = values(259, [1])[0]
    photo = values(262, [1])[0]
    spp = values(277, [1])[0]
    bps = values(258, [8] * spp)
    if any(b != 8 for b in bps):
        raise ValueError(f"only 8-bit samples supported (BitsPerSample={bps})")
    if comp not in (1, 32773):
        raise ValueError(
            f"only raw (1) and PackBits (32773) compression supported, got {comp}"
        )
    if values(284, [1])[0] != 1:
        raise ValueError("planar configuration 2 unsupported")
    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF unsupported")
    if photo not in (0, 1, 2):
        raise ValueError(f"unsupported photometric interpretation {photo}")
    rps = values(278, [h])[0]
    offs = values(273)
    counts = values(279)
    if len(offs) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    raster = bytearray()
    for i, (o, c) in enumerate(zip(offs, counts)):
        rows = min(rps, h - i * rps)
        expected = rows * w * spp
        blob = payload[o : o + c]
        raster += _packbits_decode(blob, expected) if comp == 32773 else blob[:expected]
    if len(raster) != h * w * spp:
        raise ValueError("strip data does not cover the raster")
    px = np.frombuffer(bytes(raster), dtype=np.uint8).reshape(h, w, spp)
    if spp == 1:
        if photo == 0:  # WhiteIsZero: invert
            px = 255 - px
        return w, h, np.repeat(px, 3, axis=2)
    return w, h, px[:, :, :3]
