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
    with pytest.raises(NotImplementedError):
        decode_pixels(b"\x89PNG\r\n\x1a\nxxxx")


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
