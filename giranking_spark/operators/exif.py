"""Pure-Python EXIF reader/writer (TIFF-structured APP1 inside JPEG).

EXIF is the image-metadata sidecar every crawled photo carries (camera
make/model, orientation, capture time, dimensions, ISO): an APP1 marker
segment whose payload is ``Exif\\0\\0`` followed by a self-contained TIFF
byte structure (EXIF 2.3 §4.5; TIFF 6.0 §2). The IFD walk is the same one
operators/tiff.py does for whole images — here it reads tag VALUES instead
of strip pixels, covering IFD0 plus the Exif sub-IFD.

  * writer: little-endian TIFF blob with IFD0 (Make, Model, Orientation,
    DateTime, ExifIFD pointer) and the Exif sub-IFD (PixelXDimension,
    PixelYDimension, ISOSpeedRatings) — fixture fodder, spliced after the
    JPEG SOI as an APP1 segment.
  * reader: JPEG marker walk to the Exif APP1, byte-order-aware (II/MM)
    IFD walk, ASCII/SHORT/LONG value decode. Malformed input raises
    ValueError (the module-wide error contract).

Spark integration: exif_meta (queries/mmq.py) runs the parser in the same
Arrow-batched mapInPandas stage as every other codec; the oracle never
parses bytes — it predicts every field from the generative fixture formula,
so a green row certifies write→splice→walk→decode end to end.
"""

from __future__ import annotations

import struct

#: (tag, name, type) — type 2 = ASCII (NUL-terminated), 3 = SHORT, 4 = LONG
IFD0_TAGS = (
    (0x010F, "make", 2),
    (0x0110, "model", 2),
    (0x0112, "orientation", 3),
    (0x0132, "datetime", 2),
)
EXIF_IFD_POINTER = 0x8769
SUB_TAGS = (
    (0xA002, "pixel_x", 4),
    (0xA003, "pixel_y", 4),
    (0x8827, "iso", 3),
)
EXIF_FIELDS = tuple(n for _, n, _t in IFD0_TAGS) + tuple(
    n for _, n, _t in SUB_TAGS
)


def _build_ifd(
    entries: list[tuple[int, int, object]], ifd_offset: int, next_ifd: int = 0
) -> bytes:
    """One little-endian IFD at ``ifd_offset`` (offset within the TIFF
    blob): 12-byte entries sorted by tag, out-of-line values appended
    directly after the next-IFD word."""
    entries = sorted(entries)
    head_len = 2 + 12 * len(entries) + 4
    data = bytearray()
    body = struct.pack("<H", len(entries))
    for tag, typ, value in entries:
        if typ == 2:
            raw = value.encode("ascii") + b"\x00"
            count = len(raw)
            if count <= 4:
                inline = raw.ljust(4, b"\x00")
            else:
                inline = struct.pack("<I", ifd_offset + head_len + len(data))
                data += raw
        elif typ == 3:
            count = 1
            inline = struct.pack("<HH", int(value), 0)
        elif typ == 4:
            count = 1
            inline = struct.pack("<I", int(value))
        else:  # pragma: no cover - writer only emits 2/3/4
            raise ValueError(f"unsupported EXIF type {typ}")
        body += struct.pack("<HHI", tag, typ, count) + inline
    body += struct.pack("<I", next_ifd)
    return bytes(body) + bytes(data)


def encode_exif_app1(**fields: object) -> bytes:
    """APP1 payload (``Exif\\0\\0`` + TIFF) carrying the 7 supported
    fields. IFD0 first, its out-of-line strings after it, then the Exif
    sub-IFD — a fixed two-IFD layout, computed in two passes so the
    pointer is exact."""
    ifd0_entries = [
        (tag, typ, fields[name]) for tag, name, typ in IFD0_TAGS
    ]
    # pass 1 with a placeholder pointer to size IFD0 (+1 pointer entry)
    probe = _build_ifd(
        ifd0_entries + [(EXIF_IFD_POINTER, 4, 0)], ifd_offset=8
    )
    sub_offset = 8 + len(probe)
    ifd0 = _build_ifd(
        ifd0_entries + [(EXIF_IFD_POINTER, 4, sub_offset)], ifd_offset=8
    )
    assert len(ifd0) == len(probe)
    sub = _build_ifd(
        [(tag, typ, fields[name]) for tag, name, typ in SUB_TAGS],
        ifd_offset=sub_offset,
    )
    tiff = b"II*\x00" + struct.pack("<I", 8) + ifd0 + sub
    return b"Exif\x00\x00" + tiff


def splice_app1(jpeg: bytes, app1_payload: bytes) -> bytes:
    """Insert an APP1 segment immediately after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    seg = b"\xff\xe1" + struct.pack(">H", len(app1_payload) + 2) + app1_payload
    return jpeg[:2] + seg + jpeg[2:]


def _read_ifd(tiff: bytes, off: int, fmt: str) -> dict[int, tuple[int, int, bytes]]:
    if off + 2 > len(tiff):
        raise ValueError("truncated EXIF IFD")
    (n,) = struct.unpack_from(fmt + "H", tiff, off)
    out = {}
    for k in range(n):
        base = off + 2 + 12 * k
        if base + 12 > len(tiff):
            raise ValueError("truncated EXIF IFD entry")
        tag, typ, count = struct.unpack_from(fmt + "HHI", tiff, base)
        out[tag] = (typ, count, tiff[base + 8 : base + 12])
    return out


def _value(tiff: bytes, fmt: str, typ: int, count: int, inline: bytes):
    if typ == 2:
        if count <= 4:
            raw = inline[:count]
        else:
            (off,) = struct.unpack(fmt + "I", inline)
            if off + count > len(tiff):
                raise ValueError("EXIF ASCII value out of bounds")
            raw = tiff[off : off + count]
        return raw.split(b"\x00", 1)[0].decode("ascii", "replace")
    if typ == 3:
        return struct.unpack(fmt + "H", inline[:2])[0]
    if typ == 4:
        return struct.unpack(fmt + "I", inline)[0]
    raise ValueError(f"unsupported EXIF value type {typ}")


def parse_exif(jpeg: bytes) -> dict[str, object]:
    """Extract the supported EXIF fields from a JPEG payload. Missing
    fields come back None; a payload without SOI or without an Exif APP1,
    or with a corrupt TIFF structure, raises ValueError."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    i = 2
    tiff = None
    while i + 4 <= len(jpeg):
        if jpeg[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = jpeg[i + 1]
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no APP1 found
            break
        (seg_len,) = struct.unpack_from(">H", jpeg, i + 2)
        seg = jpeg[i + 4 : i + 2 + seg_len]
        if marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
            tiff = seg[6:]
            break
        i += 2 + seg_len
    if tiff is None:
        raise ValueError("no Exif APP1 segment")
    if tiff[:2] == b"II":
        fmt = "<"
    elif tiff[:2] == b"MM":
        fmt = ">"
    else:
        raise ValueError("bad EXIF byte-order mark")
    magic, ifd0_off = struct.unpack_from(fmt + "HI", tiff, 2)
    if magic != 42:
        raise ValueError("bad EXIF TIFF magic")
    ifd0 = _read_ifd(tiff, ifd0_off, fmt)
    out: dict[str, object] = {name: None for name in EXIF_FIELDS}
    for tag, name, _typ in IFD0_TAGS:
        if tag in ifd0:
            out[name] = _value(tiff, fmt, *ifd0[tag])
    if EXIF_IFD_POINTER in ifd0:
        typ, count, inline = ifd0[EXIF_IFD_POINTER]
        sub_off = _value(tiff, fmt, typ, count, inline)
        sub = _read_ifd(tiff, int(sub_off), fmt)
        for tag, name, _typ in SUB_TAGS:
            if tag in sub:
                out[name] = _value(tiff, fmt, *sub[tag])
    return out
