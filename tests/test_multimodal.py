"""Native image codec tests (PPM P6 + 24-bit BMP) and the real-decode
mapInPandas operator (operators/multimodal.py)."""

from __future__ import annotations

import numpy as np
import pytest

from giranking_spark.operators.multimodal import (
    decode_bmp,
    decode_pixels,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    image_features,
    pack_assets,
)


def _rgb(w: int, h: int, seed: int = 0) -> bytes:
    return bytes((seed * 7 + i) % 256 for i in range(w * h * 3))


def test_ppm_roundtrip():
    w, h = 5, 3
    rgb = _rgb(w, h, seed=9)
    got_w, got_h, px = decode_ppm(encode_ppm(w, h, rgb))
    assert (got_w, got_h) == (w, h)
    assert px.tobytes() == rgb


@pytest.mark.parametrize("w,h", [(4, 3), (5, 2), (1, 1), (7, 4)])
def test_bmp_roundtrip_with_padding(w, h):
    """Widths not divisible by 4 exercise the row-padding path; the decoder
    must undo bottom-up row order and BGR byte order."""
    rgb = _rgb(w, h, seed=w * 31 + h)
    got_w, got_h, px = decode_bmp(encode_bmp(w, h, rgb))
    assert (got_w, got_h) == (w, h)
    assert px.tobytes() == rgb


def test_bmp_and_ppm_decode_agree():
    w, h = 6, 5
    rgb = _rgb(w, h, seed=42)
    _, _, via_ppm = decode_ppm(encode_ppm(w, h, rgb))
    _, _, via_bmp = decode_bmp(encode_bmp(w, h, rgb))
    assert np.array_equal(via_ppm, via_bmp)


def test_unknown_format_raises():
    # WebP (VP8 inside RIFF) still needs an external codec — honest raise
    with pytest.raises(NotImplementedError):
        decode_pixels(b"RIFF\x00\x00\x00\x00WEBPVP8 xxxx")


def test_image_features_mixed_formats(spark):
    """One PPM and one BMP with identical pixel content must produce
    identical statistics through the distributed operator."""
    w, h = 5, 4
    rgb = _rgb(w, h, seed=3)
    rows = [(1, bytearray(encode_ppm(w, h, rgb))), (2, bytearray(encode_bmp(w, h, rgb)))]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    assets = pack_assets(df, "asset_id", df.payload)
    out = {r["asset_id"]: r for r in image_features(assets).collect()}
    assert out[1]["width"] == out[2]["width"] == w
    assert out[1]["height"] == out[2]["height"] == h
    for c in ("mean_r", "mean_g", "mean_b"):
        assert out[1][c] == out[2][c]
    # independent expected mean: exact integer arithmetic
    exp_r = sum((3 * 7 + i) % 256 for i in range(0, w * h * 3, 3)) / (w * h)
    assert out[1]["mean_r"] == pytest.approx(exp_r, abs=0)


def test_wav_roundtrip():
    import numpy as np

    from giranking_spark.operators.multimodal import decode_wav, encode_wav

    pcm = np.array([0, 1000, -32768, 32767, -1], dtype=np.int16)
    rate, back = decode_wav(encode_wav(8000, pcm))
    assert rate == 8000
    assert (back == pcm).all()


def test_avi_roundtrip_odd_width_padding():
    import numpy as np

    from giranking_spark.operators.multimodal import decode_avi_frames, encode_avi

    w, h = 3, 2  # stride 9 -> padded to 12: exercises row padding
    frames = [bytes((f * 50 + i) % 256 for i in range(w * h * 3)) for f in range(3)]
    w2, h2, out = decode_avi_frames(encode_avi(w, h, frames))
    assert (w2, h2, len(out)) == (w, h, 3)
    for f, px in enumerate(out):
        want = np.frombuffer(frames[f], dtype=np.uint8).reshape(h, w, 3)
        assert (px == want).all()


# --- baseline JPEG codec (operators/jpeg.py) -------------------------------


def test_jpeg_idct_matches_naive_dct3_definition():
    """The matrix IDCT must agree with the O(N^4) textbook DCT-III sum —
    an independent spelling of the same transform."""
    from giranking_spark.operators.jpeg import DCT_A

    rng = np.random.default_rng(7)
    coef = rng.normal(0, 50, (8, 8))
    naive = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            naive[x, y] = s / 4
    assert np.allclose(DCT_A.T @ coef @ DCT_A, naive, atol=1e-9)


def test_jpeg_block_constant_unit_quant_is_exact():
    """The exactness contract the mm_jpeg_features oracle relies on:
    block-constant image + all-ones quant + 4:4:4 decodes to exactly the
    BT.601-rounded colors (the DCT/quant/Huffman chain is lossless here)."""
    from giranking_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )

    ones = np.ones(64, dtype=np.int64)
    img = np.zeros((16, 24, 3), dtype=np.uint8)
    for by in range(2):
        for bx in range(3):
            img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = [
                (by * 80 + bx * 30 + 10) % 256,
                (bx * 90 + 5) % 256,
                (by * 60 + 200) % 256,
            ]
    w, h, dec = decode_jpeg(encode_jpeg(img, ones, ones))
    assert (w, h) == (24, 16)
    expected = ycbcr_to_rgb(rgb_to_ycbcr(img).astype(np.float64))
    assert np.array_equal(dec, expected)


def test_jpeg_random_unit_quant_near_lossless():
    """Full AC Huffman path: random pixels with quant 1 round-trip to
    within a few counts of the pure color-transform round-trip (the only
    expected error is +/-0.5-per-coefficient DCT rounding, which can stack
    to ~3 in the pixel domain on noise)."""
    from giranking_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )

    rng = np.random.default_rng(11)
    ones = np.ones(64, dtype=np.int64)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    _, _, dec = decode_jpeg(encode_jpeg(img, ones, ones))
    ref = ycbcr_to_rgb(rgb_to_ycbcr(img).astype(np.float64))
    assert np.abs(dec.astype(int) - ref.astype(int)).max() <= 4


def test_jpeg_std_quant_and_subsampling_sane():
    """Standard Annex K tables on a smooth gradient: visually-lossy-grade
    error bounds; 4:2:0 keeps luma near-exact and shapes correct."""
    from giranking_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        rgb_to_ycbcr,
    )

    yy, xx = np.mgrid[0:32, 0:32]
    grad = np.stack(
        [np.minimum(xx * 6, 255), np.minimum(yy * 6, 255),
         np.minimum((xx + yy) * 3, 255)],
        axis=-1,
    ).astype(np.uint8)
    _, _, dec = decode_jpeg(encode_jpeg(grad))
    assert np.abs(dec.astype(int) - grad.astype(int)).mean() < 12
    ones = np.ones(64, dtype=np.int64)
    w, h, dec420 = decode_jpeg(encode_jpeg(grad, ones, ones, subsample_420=True))
    assert dec420.shape == grad.shape
    y_err = np.abs(
        rgb_to_ycbcr(dec420)[..., 0].astype(int)
        - rgb_to_ycbcr(grad)[..., 0].astype(int)
    )
    assert y_err.max() <= 3


def test_jpeg_odd_dims_and_grayscale_padding():
    from giranking_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(5)
    ones = np.ones(64, dtype=np.int64)
    img = rng.integers(0, 256, (13, 21, 3), dtype=np.uint8)
    w, h, dec = decode_jpeg(encode_jpeg(img, ones, ones))
    assert (w, h) == (21, 13) and dec.shape == (13, 21, 3)


def test_jpeg_progressive_and_garbage_raise():
    import struct

    from giranking_spark.operators.jpeg import decode_jpeg

    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(b"\xff\xd8" + struct.pack(">HH", 0xFFC2, 10) + b"\x00" * 8)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_jpeg_dispatches_through_decode_pixels(spark):
    """A JPEG asset flows through the same image_features stage as PPM —
    the dispatch by magic bytes is the 'mostly-JPEG web corpus' path."""
    from giranking_spark.operators.jpeg import (
        encode_jpeg,
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )

    ones = np.ones(64, dtype=np.int64)
    img = np.full((8, 8, 3), [40, 90, 200], dtype=np.uint8)
    rows = [(1, bytearray(encode_jpeg(img, ones, ones)))]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    out = image_features(pack_assets(df, "asset_id", df.payload)).first()
    exp = ycbcr_to_rgb(rgb_to_ycbcr(img).astype(np.float64))[0, 0]
    assert (out["width"], out["height"]) == (8, 8)
    assert (out["mean_r"], out["mean_g"], out["mean_b"]) == tuple(
        float(v) for v in exp
    )


# --- PNG codec (operators/png.py, stdlib zlib) -----------------------------


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_png_each_filter_type_roundtrips_exact(f):
    from giranking_spark.operators.png import decode_png, encode_png

    w, h = 7, 4
    rgb = bytes((i * 37 + f) % 256 for i in range(w * h * 3))
    w2, h2, px = decode_png(encode_png(w, h, rgb, [f] * h))
    assert (w2, h2) == (w, h)
    assert px.tobytes() == rgb


@pytest.mark.parametrize("seed", range(4))
def test_png_random_mixed_filters_roundtrip_exact(seed):
    """Random dims + random per-row filter types: PNG is lossless, so the
    decode must reproduce every byte."""
    from giranking_spark.operators.png import decode_png, encode_png

    rng = np.random.default_rng(seed)
    w, h = int(rng.integers(1, 25)), int(rng.integers(1, 25))
    rgb = rng.integers(0, 256, w * h * 3, dtype=np.uint8).tobytes()
    filters = [int(rng.integers(0, 5)) for _ in range(h)]
    _, _, px = decode_png(encode_png(w, h, rgb, filters))
    assert px.tobytes() == rgb


def test_png_rejections():
    import struct
    import zlib

    from giranking_spark.operators.png import PNG_SIG, decode_png

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png")
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)  # interlace=1
    bad = (
        PNG_SIG
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    with pytest.raises(ValueError, match="Adam7"):
        decode_png(bad)


def test_png_dispatches_through_decode_pixels(spark):
    """PNG and PPM assets with identical pixels produce identical stats
    through the shared image_features stage."""
    from giranking_spark.operators.png import encode_png

    w, h = 5, 4
    rgb = _rgb(w, h, seed=3)
    rows = [
        (1, bytearray(encode_ppm(w, h, rgb))),
        (2, bytearray(encode_png(w, h, rgb, [4] * h))),
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    out = {r["asset_id"]: r for r in image_features(
        pack_assets(df, "asset_id", df.payload)
    ).collect()}
    for c in ("width", "height", "mean_r", "mean_g", "mean_b"):
        assert out[1][c] == out[2][c]


# --- GIF codec (operators/gif.py, pure-Python LZW) -------------------------


@pytest.mark.parametrize("seed", range(5))
def test_gif_roundtrip_exact(seed):
    from giranking_spark.operators.gif import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    w, h = int(rng.integers(1, 30)), int(rng.integers(1, 30))
    nc = int(2 ** rng.integers(1, 9))
    palette = rng.integers(0, 256, nc * 3, dtype=np.uint8).tobytes()
    idx = rng.integers(0, nc, w * h, dtype=np.uint8).tobytes()
    w2, h2, px = decode_gif(encode_gif(w, h, palette, idx))
    pal = np.frombuffer(palette, dtype=np.uint8).reshape(nc, 3)
    want = pal[np.frombuffer(idx, dtype=np.uint8)].reshape(h, w, 3)
    assert (w2, h2) == (w, h) and np.array_equal(px, want)


def test_gif_lzw_width_growth_and_reset():
    """A large repetitive raster drives the LZW dictionary through every
    code width up to 12 bits and a table reset — decode must stay exact."""
    from giranking_spark.operators.gif import decode_gif, encode_gif

    w, h, nc = 200, 120, 4
    palette = bytes(range(nc * 3))
    idx = bytes(((x // 3 + y // 2) % nc) for y in range(h) for x in range(w))
    _, _, px = decode_gif(encode_gif(w, h, palette, idx))
    pal = np.frombuffer(palette, dtype=np.uint8).reshape(nc, 3)
    assert np.array_equal(px, pal[np.frombuffer(idx, dtype=np.uint8)].reshape(h, w, 3))


def test_gif_interlaced_rows_reordered():
    """Flip the interlace flag on a GIF whose rows were stored in the four
    Adam-style passes: the decoder must reassemble sequential order."""
    from giranking_spark.operators.gif import (
        _INTERLACE_PASSES,
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(9)
    w, h, nc = 6, 11, 8
    palette = rng.integers(0, 256, nc * 3, dtype=np.uint8).tobytes()
    grid = rng.integers(0, nc, (h, w), dtype=np.uint8)
    pass_rows = [
        grid[y] for start, step in _INTERLACE_PASSES for y in range(start, h, step)
    ]
    payload = bytearray(
        encode_gif(w, h, palette, np.concatenate(pass_rows).tobytes())
    )
    iflags_pos = 13 + nc * 3 + 9  # header+LSD, GCT, descriptor's flag byte
    assert payload[13 + nc * 3] == 0x2C
    payload[iflags_pos] |= 0x40
    w2, h2, px = decode_gif(bytes(payload))
    pal = np.frombuffer(palette, dtype=np.uint8).reshape(nc, 3)
    assert (w2, h2) == (w, h) and np.array_equal(px, pal[grid])


def test_gif_extension_blocks_skipped_and_garbage_rejected():
    import struct

    from giranking_spark.operators.gif import decode_gif, encode_gif

    payload = encode_gif(2, 2, bytes(range(6)), bytes([0, 1, 1, 0]))
    # splice a Graphic Control Extension before the image descriptor
    head, img = payload[: 13 + 6], payload[13 + 6 :]
    gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    w, h, px = decode_gif(head + gce + img)
    assert (w, h) == (2, 2)
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"JPEGnope")


def test_gif_dispatches_through_decode_pixels(spark):
    from giranking_spark.operators.gif import encode_gif

    pal = bytes([10, 20, 30, 200, 210, 220])
    rows = [(1, bytearray(encode_gif(2, 1, pal, bytes([1, 0]))))]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    out = image_features(pack_assets(df, "asset_id", df.payload)).first()
    assert (out["width"], out["height"]) == (2, 1)
    assert out["mean_r"] == (200 + 10) / 2


# --- TIFF codec (operators/tiff.py, raw + PackBits) ------------------------


@pytest.mark.parametrize("packbits", [False, True])
@pytest.mark.parametrize("rps", [1, 2, 100])
def test_tiff_roundtrip_exact(packbits, rps):
    from giranking_spark.operators.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(rps + packbits)
    w, h = 9, 7
    rgb = rng.integers(0, 256, w * h * 3, dtype=np.uint8).tobytes()
    w2, h2, px = decode_tiff(
        encode_tiff(w, h, rgb, packbits=packbits, rows_per_strip=rps)
    )
    assert (w2, h2) == (w, h)
    assert px.tobytes() == rgb


def test_tiff_packbits_runs_and_literals():
    from giranking_spark.operators.tiff import _packbits_decode, _packbits_encode

    rng = np.random.default_rng(0)
    for _ in range(10):
        n = int(rng.integers(0, 600))
        data = (
            rng.integers(0, 4, n, dtype=np.uint8)  # run-heavy
            if rng.random() < 0.5
            else rng.integers(0, 256, n, dtype=np.uint8)
        ).tobytes()
        assert _packbits_decode(_packbits_encode(data), n) == data


def test_tiff_rejections():
    import struct

    from giranking_spark.operators.tiff import decode_tiff, encode_tiff

    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"PK\x03\x04")
    # flip compression tag to LZW (5) — must raise, not mis-decode
    payload = bytearray(encode_tiff(2, 2, bytes(12)))
    # compression tag (259) is the 4th IFD entry; value word at +8
    ifd = 8
    for i in range(9):
        entry = ifd + 2 + i * 12
        if struct.unpack_from("<H", payload, entry)[0] == 259:
            struct.pack_into("<H", payload, entry + 8, 5)
    with pytest.raises(ValueError, match="PackBits"):
        decode_tiff(bytes(payload))


def test_tiff_dispatches_through_decode_pixels(spark):
    from giranking_spark.operators.tiff import encode_tiff

    w, h = 5, 4
    rgb = _rgb(w, h, seed=3)
    rows = [
        (1, bytearray(encode_ppm(w, h, rgb))),
        (2, bytearray(encode_tiff(w, h, rgb, packbits=True, rows_per_strip=2))),
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    out = {r["asset_id"]: r for r in image_features(
        pack_assets(df, "asset_id", df.payload)
    ).collect()}
    for c in ("width", "height", "mean_r", "mean_g", "mean_b"):
        assert out[1][c] == out[2][c]
