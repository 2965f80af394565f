"""Pure-Python GIF codec (GIF87a/89a) — no external imaging libraries.

GIF's compression is LZW with variable-width codes, implementable directly
from the GIF89a specification; nothing else in the format needs a library.
This completes the web-crawl image matrix next to PPM/BMP (raw), JPEG
(DCT) and PNG (DEFLATE):

  * decoder: header + logical screen descriptor, global/local color
    tables, extension-block skipping (GCE/comment/application), image
    descriptor, full variable-code-width LZW decompression (clear/EOI
    codes, code-width growth, 4095-entry dictionary), non-interlaced and
    Adam-style GIF interlaced row ordering, transparent-index handling
    (transparent pixels resolve to the GCE-declared index's palette color
    — this engine extracts features, it does not composite).  Animated
    streams decode their FIRST frame (the standard thumbnail semantics).
  * encoder: GIF89a writer with a caller-supplied palette (global color
    table), LZW compression with the same variable-width rules — used for
    fixtures and round-trip tests.

GIF is lossless over its palette, so the ``mm_gif_features`` oracle
(queries/mmq.py) predicts decoded pixels straight from the generative
formula: pixel index -> palette entry is a closed-form map.

Spark integration: `decode_pixels` (operators/multimodal.py) dispatches
``GIF8`` payloads here; image_features / resize_images / image_ahash run
unchanged over GIF columns via the same Arrow-batched mapInPandas stages.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_gif(
    width: int, height: int, palette: bytes, indices: bytes
) -> bytes:
    """GIF89a with a global color table.  ``palette`` is RGB triples (its
    length must be 3 * 2^n, 2 <= 2^n <= 256); ``indices`` is one palette
    index per pixel, row-major."""
    n_colors = len(palette) // 3
    if len(palette) % 3 or n_colors & (n_colors - 1) or not 2 <= n_colors <= 256:
        raise ValueError("palette must hold a power-of-two color count in 2..256")
    if len(indices) != width * height:
        raise ValueError(f"index raster is {len(indices)} bytes, want {width * height}")
    if any(i >= n_colors for i in indices):
        raise ValueError("pixel index out of palette range")
    depth = max((n_colors - 1).bit_length(), 1)
    out = bytearray(b"GIF89a")
    # logical screen descriptor: global color table flag + size
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    out += palette
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)  # image descriptor
    out.append(depth if depth >= 2 else 2)  # LZW minimum code size
    out += _lzw_compress(indices, max(depth, 2))
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def _lzw_compress(data: bytes, min_code_size: int) -> bytes:
    """GIF LZW: emits sub-blocks (<=255 bytes each) of LSB-first packed
    variable-width codes, bracketed by CLEAR and EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1

    acc = 0
    nbits = 0
    packed = bytearray()

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    prefix = b""
    for byte in data:
        trial = prefix + bytes([byte])
        if trial in table:
            prefix = trial
            continue
        emit(table[prefix], width)
        table[trial] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > 4095:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([byte])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        packed.append(acc & 0xFF)
    out = bytearray()
    for i in range(0, len(packed), 255):
        chunk = packed[i : i + 255]
        out.append(len(chunk))
        out += chunk
    return bytes(out)


def _lzw_decompress(blocks: bytes, min_code_size: int, n_pixels: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in blocks:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out[:n_pixels])
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                # spec caps the table at 4096 entries; deferred-clear streams
                # (common on the real web) keep emitting codes past a full
                # table, and a full table must stop growing (GIF89a App. F)
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                if len(table) < 4096:
                    table.append(entry)
            else:
                raise ValueError("corrupt LZW stream (code beyond table)")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                return bytes(out[:n_pixels])
    raise ValueError("LZW stream ended without EOI/full raster")


#: Adam-style GIF interlace: 4 passes over rows (start, step)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a GIF87a/89a payload: returns (width, height, HxWx3 uint8 RGB)
    of the FIRST image block, palette-resolved.  Handles global and local
    color tables, interlacing, and skips all extension blocks."""
    if payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF payload (bad signature)")
    try:
        return _parse_gif(payload)
    except (IndexError, struct.error) as exc:
        # normalize malformed-input failures to the module's documented
        # ValueError contract (real crawl archives truncate mid-block)
        raise ValueError(f"truncated GIF payload: {exc}") from exc


def _parse_gif(payload: bytes) -> tuple[int, int, np.ndarray]:
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            _x, _y, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            table = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                table = np.frombuffer(
                    payload, dtype=np.uint8, count=3 * n, offset=pos
                ).reshape(n, 3)
                pos += 3 * n
            if table is None:
                raise ValueError("no color table for image block")
            min_code = payload[pos]
            pos += 1
            blocks = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                blocks += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = np.frombuffer(
                _lzw_decompress(bytes(blocks), min_code, w * h), dtype=np.uint8
            )
            if len(idx) != w * h:
                raise ValueError("decoded raster has wrong pixel count")
            if idx.max(initial=0) >= len(table):
                raise ValueError("pixel index out of palette range")
            grid = idx.reshape(h, w)
            if iflags & 0x40:  # interlaced: reorder rows
                ordered = np.zeros_like(grid)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    for y in range(start, h, step):
                        ordered[y] = grid[src]
                        src += 1
                grid = ordered
            return w, h, table[grid]
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("no image block — truncated GIF")
