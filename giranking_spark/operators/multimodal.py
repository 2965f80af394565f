"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

Spark-side design (the part that matters at 100 TB and IS real and tested):
  * payloads are `binary` columns + a metadata struct (mime, n_bytes, fp) —
    parquet stores them page-compressed; column pruning means metadata-only
    queries never touch payload bytes
  * decode / feature-extract run as Arrow-batched mapInPandas stages —
    batch-shaped Python, never per-row UDFs; partitioning is preserved
  * REAL decoders exist for the dependency-free formats: PPM (P6), BMP
    (24-bit BITMAPINFOHEADER), baseline JPEG (pure-Python Huffman+IDCT
    codec, operators/jpeg.py), non-interlaced PNG (stdlib-zlib inflate +
    full filter reconstruction, operators/png.py), GIF87a/89a (pure-Python
    variable-width LZW, operators/gif.py), baseline TIFF (raw +
    PackBits strips, operators/tiff.py) and lossless WebP (full VP8L
    bitstream: prefix codes, LZ77, color cache, meta prefix images and
    all four transforms, operators/webp.py) — `image_features` parses
    headers and raster bytes and computes true pixel statistics. Formats
    that still need external codec libraries (WebP's lossy VP8, HEIC)
    raise NotImplementedError (`decode_image`) so nobody mistakes
    plumbing for decoding.

The reference has no multimodal surface; this is extension scope mandated by
the build target (BASELINE.json north star).
"""

from __future__ import annotations

import re
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

ASSET_SCHEMA = (
    "asset_id long, payload binary, mime string, n_bytes long, content_fp string"
)


def pack_assets(
    df: DataFrame, id_col: str, payload_col, mime: str = "application/octet-stream"
) -> DataFrame:
    """Wrap a binary-producing column into the canonical asset schema."""
    payload = payload_col
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        payload.alias("payload"),
        F.lit(mime).alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_fp"),
    )


def decode_image(payload: bytes) -> bytes:
    """STUB for formats still needing external codec libraries (lossy-VP8
    WebP, HEIC, AVIF, ...).  Raises so nobody mistakes undecoded bytes for
    decoded pixels; PPM, BMP, baseline JPEG, non-interlaced PNG, GIF,
    baseline TIFF and lossless (VP8L) WebP have REAL decoders
    (`decode_pixels` — see operators/jpeg.py, png.py, gif.py, tiff.py,
    webp.py)."""
    raise NotImplementedError(
        "lossy-VP8 WebP / HEIC decode libs are not available in this "
        "container; PPM (P6), 24-bit BMP, baseline JPEG, 8-bit PNG, GIF, "
        "raw/PackBits TIFF and lossless WebP (VP8L) decode natively via "
        "decode_pixels"
    )


# ---------------------------------------------------------------------------
# real dependency-free codecs: PPM (P6) and BMP (24bpp BITMAPINFOHEADER)

def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM: 'P6\\n<w> <h>\\n255\\n' + row-major RGB raster."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"raster is {len(rgb)} bytes, want {width * height * 3}")
    return f"P6\n{width} {height}\n255\n".encode() + rgb


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a binary PPM (P6): returns (width, height, HxWx3 uint8 RGB)."""
    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", payload)
    if not m:
        raise ValueError("not a binary PPM (P6) payload")
    w, h, maxval = int(m[1]), int(m[2]), int(m[3])
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported (maxval={maxval})")
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=m.end())
    return w, h, raster.reshape(h, w, 3)


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """24-bit uncompressed BMP (BITMAPINFOHEADER): bottom-up rows, BGR byte
    order, rows padded to 4 bytes — the classic on-disk layout."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"raster is {len(rgb)} bytes, want {width * height * 3}")
    row_pad = (-(width * 3)) % 4
    img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        rows.append(img[y, :, ::-1].tobytes() + b"\x00" * row_pad)  # RGB->BGR
    raster = b"".join(rows)
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(raster), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return header + info + raster


def decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a 24-bit uncompressed BMP: returns (width, height, HxWx3 uint8
    RGB, top-down). Handles bottom-up rows, BGR order and row padding."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24bpp uncompressed BMP supported (bpp={bpp})")
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up storage -> flip to top-down
        rows = rows[::-1]
    return w, h, rows[:, :, ::-1]  # BGR -> RGB


def encode_wav(sample_rate: int, pcm: np.ndarray) -> bytes:
    """Mono 16-bit PCM WAV (RIFF/WAVE fmt+data) — the classic uncompressed
    layout, no codec library needed."""
    data = pcm.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Parse a mono 16-bit PCM WAV: returns (sample_rate, int16 samples).
    Walks the RIFF chunk list (fmt then data), rejecting compressed or
    non-16-bit streams."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body)
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only mono 16-bit PCM WAV supported")
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, data


def audio_features(assets: DataFrame) -> DataFrame:
    """REAL audio decode + feature extraction, Arrow-batched: parses each
    WAV payload with the native PCM codec and emits
    (asset_id, sample_rate, n_samples, duration_s, rms, zero_crossings).
    rms is sqrt of the exact integer power sum / n, so any engine deriving
    the same samples reaches bit-identical doubles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("asset_id", "sample_rate", "n_samples", "duration_s", "rms", "zero_crossings")
        for pdf in batches:
            out = {k: [] for k in cols}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                rate, pcm = decode_wav(bytes(payload))
                v = pcm.astype(np.int64)
                n = len(v)
                out["asset_id"].append(asset_id)
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["duration_s"].append(n / rate)
                out["rms"].append(float(np.sqrt(int((v * v).sum()) / n)) if n else 0.0)
                out["zero_crossings"].append(int(((v[1:] * v[:-1]) < 0).sum()) if n > 1 else 0)
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        run,
        "asset_id long, sample_rate long, n_samples long, duration_s double, "
        "rms double, zero_crossings long",
    )


def _bmp_raster(width: int, height: int, rgb: bytes) -> bytes:
    """BMP-style raster: bottom-up rows, BGR, rows padded to 4 bytes — the
    layout both BMP files and uncompressed ('DIB ') AVI frames use."""
    row_pad = (-(width * 3)) % 4
    img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    return b"".join(
        img[y, :, ::-1].tobytes() + b"\x00" * row_pad for y in range(height - 1, -1, -1)
    )


def _bmp_unraster(width: int, height: int, raster: bytes) -> np.ndarray:
    stride = (width * 3 + 3) & ~3
    rows = np.frombuffer(raster, dtype=np.uint8, count=stride * height).reshape(
        height, stride
    )[:, : width * 3].reshape(height, width, 3)
    return rows[::-1, :, ::-1]  # bottom-up -> top-down, BGR -> RGB


def encode_avi(width: int, height: int, frames: list[bytes], fps: int = 10) -> bytes:
    """Minimal VALID uncompressed AVI (RIFF 'AVI ': hdrl(avih + strl(strh
    'vids'/'DIB ' + strf BITMAPINFOHEADER) ) + movi('00db' raw DIB frames))."""
    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    frame_bytes = [_bmp_raster(width, height, f) for f in frames]
    bufsize = max(len(b) for b in frame_bytes) if frame_bytes else 0
    avih = struct.pack(
        "<10I", 1_000_000 // fps, bufsize * fps, 0, 0x10, len(frames), 0, 1, bufsize, width, height
    ) + b"\x00" * 16
    strh = b"vids" + b"DIB " + struct.pack(
        "<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), bufsize, 0xFFFFFFFF, 0, 0
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, bufsize, 2835, 2835, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", b) for b in frame_bytes))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def decode_avi_frames(payload: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Parse an uncompressed AVI: returns (width, height, [HxWx3 uint8 RGB
    frames]). Walks the RIFF tree for the strf BITMAPINFOHEADER (dims, 24bpp
    uncompressed check) and the movi '00db'/'00dc' frame chunks."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    w = h = None
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h
        while pos + 8 <= end:
            cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
            body_start = pos + 8
            if cid == b"LIST":
                walk(body_start + 4, body_start + size)
            elif cid == b"strf":
                _, w_, h_, _, bpp, compression = struct.unpack_from("<IiiHHI", payload, body_start)
                if bpp != 24 or compression != 0:
                    raise ValueError("only 24bpp uncompressed AVI supported")
                w, h = w_, abs(h_)
            elif cid in (b"00db", b"00dc"):
                if w is None:
                    raise ValueError("frame chunk before strf header")
                frames.append(
                    _bmp_unraster(w, h, payload[body_start : body_start + size])
                )
            pos = body_start + size + (size & 1)

    walk(12, len(payload))
    if w is None:
        raise ValueError("missing strf header")
    return w, h, frames


def video_frame_features(assets: DataFrame) -> DataFrame:
    """REAL video frame extraction, Arrow-batched fan-out: parses each
    uncompressed AVI, emits one row PER FRAME with exact channel means —
    (asset_id, frame_idx, width, height, mean_r, mean_g, mean_b). The
    one-input-row → many-output-rows shape a production frame sampler needs,
    now over genuinely decoded frames."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("asset_id", "frame_idx", "width", "height", "mean_r", "mean_g", "mean_b")
        for pdf in batches:
            out = {k: [] for k in cols}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, frames = decode_avi_frames(bytes(payload))
                for fi, px in enumerate(frames):
                    sums = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
                    out["asset_id"].append(asset_id)
                    out["frame_idx"].append(fi)
                    out["width"].append(w)
                    out["height"].append(h)
                    for c, name in enumerate(("mean_r", "mean_g", "mean_b")):
                        out[name].append(int(sums[c]) / (w * h))
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        run,
        "asset_id long, frame_idx long, width long, height long, "
        "mean_r double, mean_g double, mean_b double",
    )


def decode_pixels(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Magic-byte dispatch to the native decoders; raises NotImplementedError
    for formats that need external libraries."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"\xff\xd8":
        from giranking_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from giranking_spark.operators.png import decode_png

        return decode_png(payload)
    if payload[:4] == b"GIF8":
        from giranking_spark.operators.gif import decode_gif

        return decode_gif(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from giranking_spark.operators.tiff import decode_tiff

        return decode_tiff(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from giranking_spark.operators.webp import decode_webp

        w, h, px = decode_webp(payload)  # lossy VP8 raises NotImplementedError
        return w, h, px
    decode_image(payload)  # raises NotImplementedError
    raise AssertionError("unreachable")


def image_features(assets: DataFrame) -> DataFrame:
    """REAL image decode + feature extraction, Arrow-batched (mapInPandas):
    parses each payload with the native PPM/BMP codecs and emits true pixel
    statistics (asset_id, width, height, mean_r, mean_g, mean_b).

    Channel means are computed as exact integer sums / pixel count, so any
    engine that derives the same pixels arrives at bit-identical doubles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("asset_id", "width", "height", "mean_r", "mean_g", "mean_b")}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, px = decode_pixels(bytes(payload))
                sums = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
                out["asset_id"].append(asset_id)
                out["width"].append(w)
                out["height"].append(h)
                for c, name in enumerate(("mean_r", "mean_g", "mean_b")):
                    out[name].append(int(sums[c]) / (w * h))
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        run,
        "asset_id long, width long, height long, "
        "mean_r double, mean_g double, mean_b double",
    )


def resize_images(assets: DataFrame, out_w: int = 3, out_h: int = 2) -> DataFrame:
    """REAL nearest-neighbor image resize, Arrow-batched (mapInPandas):
    decodes each payload with the native codecs, samples
    ``src[(y*h)//out_h, (x*w)//out_w]``, and emits the resized raster's
    exact channel means alongside the source/target dims. A production
    pipeline would re-encode the resized raster back into the payload
    column; the scalar stats keep the result cross-engine checkable while
    exercising the same decode → index → gather path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("asset_id", "width", "height", "out_w", "out_h", "mean_r", "mean_g", "mean_b")
        for pdf in batches:
            out = {k: [] for k in cols}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, px = decode_pixels(bytes(payload))
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                r = px[np.ix_(ys, xs)]
                sums = r.reshape(-1, 3).astype(np.int64).sum(axis=0)
                n = out_w * out_h
                out["asset_id"].append(asset_id)
                out["width"].append(w)
                out["height"].append(h)
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                for c, name in enumerate(("mean_r", "mean_g", "mean_b")):
                    out[name].append(int(sums[c]) / n)
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        run,
        "asset_id long, width long, height long, out_w long, out_h long, "
        "mean_r double, mean_g double, mean_b double",
    )


def _fake_feature_vector(payload: bytes) -> list[float]:
    """Deterministic stand-in for a decoded feature vector: bytes of the
    payload folded into FEATURE_DIM buckets, normalized. Replace with a real
    decoder + model when codecs are available — same signature, same schema."""
    acc = [0] * FEATURE_DIM
    for i, byte in enumerate(payload):
        acc[i % FEATURE_DIM] += byte
    total = sum(acc) or 1
    return [a / total for a in acc]


def extract_features(assets: DataFrame, batch_hint: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction: (asset_id, features array<double>).

    mapInPandas keeps the decode vectorized per Arrow batch; swap
    `_fake_feature_vector` for a real decoder without touching the Spark
    plumbing (schema, batching, partitioning are what this operator owns)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(lambda p: _fake_feature_vector(bytes(p)))
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "features": feats})

    return assets.mapInPandas(run, "asset_id long, features array<double>")


def sample_frames(assets: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """'Frame sampling' plumbing demo over opaque payloads: emits one row per
    sampled offset (a video decoder would emit real frames here).
    mapInPandas with a fan-out output schema — one input row, many output
    rows — the shape a real frame sampler needs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_off, out_fp = [], [], []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                for off in range(0, max(len(payload), 1), every_n_bytes):
                    chunk = payload[off : off + every_n_bytes]
                    out_id.append(row["asset_id"])
                    out_off.append(off)
                    out_fp.append(sum(chunk) % 997)
            yield pd.DataFrame(
                {"asset_id": out_id, "frame_offset": out_off, "frame_sig": out_fp}
            )

    return assets.mapInPandas(run, "asset_id long, frame_offset long, frame_sig long")


def image_ahash(assets: DataFrame, grid: int = 6) -> DataFrame:
    """REAL average-hash (aHash) perceptual fingerprint over decoded
    rasters, Arrow-batched: nearest-neighbor downsample to grid×grid (same
    index mapping as resize_images), per-cell integer gray sum (r+g+b), and
    bit j = 1 iff cell_j's gray SUM × n_cells > total gray sum — an
    integer-exact mean threshold (no float division anywhere, so an oracle
    can reproduce the hash bit-for-bit from first principles). Emits
    (asset_id, ahash) with a grid²-bit signature packed little-endian
    (cell (x, y) → bit y·grid + x).

    Near-identical images (resamples, small edits) land within a few bits;
    pair them with dedup.banded_hamming_pairs — the image-dedup analogue of
    SimHash for text. grid ≤ 7 keeps the signature inside a signed 64-bit."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, px = decode_pixels(bytes(payload))
                ys = (np.arange(grid) * h) // grid
                xs = (np.arange(grid) * w) // grid
                cells = px[np.ix_(ys, xs)].astype(np.int64).sum(axis=2)  # gray sums
                total = int(cells.sum())
                n = grid * grid
                bits = (cells * n > total).astype(np.int64)  # exact integer mean test
                hval = 0
                for y in range(grid):
                    for x in range(grid):
                        hval |= int(bits[y, x]) << (y * grid + x)
                ids.append(asset_id)
                hashes.append(hval)
            yield pd.DataFrame({"asset_id": ids, "ahash": hashes})

    return assets.mapInPandas(run, "asset_id long, ahash long")


def audio_fingerprint(assets: DataFrame, frames: int = 33) -> DataFrame:
    """REAL audio fingerprint over decoded PCM, Arrow-batched:
    (asset_id, afp) — a (frames−1)-bit energy-delta signature.

    Haitsma–Kalker-style sign-of-difference fingerprint reduced to one
    band: sample i belongs to frame (i·frames)//n, frame energy is the
    INTEGER Σ sample² (int16 → int64, no float anywhere — an oracle can
    re-derive every bit from a generative formula exactly), and bit j = 1
    iff E[j+1] > E[j]. Robust to gain-preserving perturbations of a few
    samples (≤ a couple of frame energies move → ≤ a couple of bits), so
    near-identical clips pair up under dedup.banded_hamming_pairs — the
    audio analogue of image_ahash. frames ≤ 64 keeps the signature in a
    signed 64-bit."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                _rate, pcm = decode_wav(bytes(payload))
                n = len(pcm)
                s = pcm.astype(np.int64)
                f = (np.arange(n, dtype=np.int64) * frames) // max(n, 1)
                energy = np.zeros(frames, dtype=np.int64)
                np.add.at(energy, f, s * s)
                bits = (energy[1:] > energy[:-1]).astype(np.int64)
                v = 0
                for j in range(frames - 1):
                    v |= int(bits[j]) << j
                ids.append(asset_id)
                fps.append(v)
            yield pd.DataFrame({"asset_id": ids, "afp": fps})

    return assets.mapInPandas(run, "asset_id long, afp long")


def image_histograms(assets: DataFrame, bins: int = 8) -> DataFrame:
    """REAL decode → per-channel intensity histogram rows
    (asset_id, channel, bin, cnt), Arrow-batched: bin = value // (256/bins),
    counts by ``np.bincount`` — exact integers, so any engine deriving the
    same pixels produces identical rows. The downstream aggregate (not the
    decoder) decides the output size; the Python pass stays linear in
    pixel bytes with no shuffle."""
    width = 256 // int(bins)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("asset_id", "channel", "bin", "cnt")
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                _, _, px = decode_pixels(bytes(payload))
                flat = px.reshape(-1, 3)
                for c in range(3):
                    counts = np.bincount(
                        flat[:, c] // width, minlength=int(bins)
                    )
                    for b in np.nonzero(counts)[0]:
                        out["asset_id"].append(int(asset_id))
                        out["channel"].append(int(c))
                        out["bin"].append(int(b))
                        out["cnt"].append(int(counts[b]))
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        run, "asset_id long, channel int, bin int, cnt long"
    )


def png_filter_profile(assets: DataFrame) -> DataFrame:
    """REAL chunk-walk + inflate → one row per scanline
    (asset_id, y, filter_type): the encoder's actual per-row filter
    choices (operators/png.py:png_row_filters). Arrow-batched and linear
    in scanline bytes; the downstream aggregate decides output size."""
    from giranking_spark.operators.png import png_row_filters

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("asset_id", "y", "filter_type")
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                for y, f in enumerate(png_row_filters(bytes(payload))):
                    out["asset_id"].append(int(asset_id))
                    out["y"].append(int(y))
                    out["filter_type"].append(int(f))
            yield pd.DataFrame(out)

    return assets.mapInPandas(run, "asset_id long, y long, filter_type long")
