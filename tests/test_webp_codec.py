"""VP8L (lossless WebP) codec tests.

The encoder only emits transform-free literal streams, so the decoder's
remaining feature set (LZ77 backrefs, color cache, the four transforms,
meta prefix images) is exercised with hand-built bitstreams assembled from
the codec's own bit-writer primitives."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from giranking_spark.operators.webp import (
    _DIST_MAP,
    _BitWriter,
    _write_prefix_code,
    decode_vp8l,
    decode_webp,
    encode_webp_lossless,
)


def _container(vp8l: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _header(bw: _BitWriter, w: int, h: int) -> None:
    bw.write(14, w - 1)
    bw.write(14, h - 1)
    bw.write(1, 0)  # alpha hint
    bw.write(3, 0)  # version


def _emit(bw: _BitWriter, codes: dict[int, tuple[int, int]], sym: int) -> None:
    n, c = codes[sym]
    bw.write_code(n, c)


def _literal(bw, g, r, b, a, green, red, blue, alpha) -> None:
    _emit(bw, green, g)
    _emit(bw, red, r)
    _emit(bw, blue, b)
    _emit(bw, alpha, a)


class TestRoundtrip:
    def test_random_images(self):
        rng = np.random.default_rng(42)
        for w, h in [(1, 1), (2, 3), (7, 5), (16, 16), (33, 9)]:
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            w2, h2, out = decode_webp(encode_webp_lossless(img))
            assert (w2, h2) == (w, h)
            assert np.array_equal(out, img)

    def test_two_color_simple_codes(self):
        img = np.zeros((4, 6, 3), dtype=np.uint8)
        img[:, ::2] = [200, 10, 30]
        assert np.array_equal(decode_webp(encode_webp_lossless(img))[2], img)

    def test_uniform_single_symbol(self):
        img = np.full((5, 9, 3), 77, dtype=np.uint8)
        assert np.array_equal(decode_webp(encode_webp_lossless(img))[2], img)

    def test_alpha_channel(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
        alpha = rng.integers(0, 256, size=(6, 4), dtype=np.uint8)
        payload = encode_webp_lossless(img, alpha)
        body = payload[20 : 20 + struct.unpack("<I", payload[16:20])[0]]
        _, _, pix = decode_vp8l(body)
        got = np.array([v >> 24 for v in pix], dtype=np.uint8).reshape(6, 4)
        assert np.array_equal(got, alpha)


class TestDecoderFeatures:
    def test_lz77_backref(self):
        # 2x2: one literal then a length-3 copy at distance 1 (plane code 2)
        bw = _BitWriter()
        _header(bw, 2, 2)
        bw.write(1, 0)  # no transform
        bw.write(1, 0)  # no cache
        bw.write(1, 0)  # no meta
        green = _write_prefix_code(bw, {40: 1, 258: 1})  # literal g + len code 2
        red = _write_prefix_code(bw, {10: 1})
        blue = _write_prefix_code(bw, {20: 1})
        alpha = _write_prefix_code(bw, {255: 1})
        dist = _write_prefix_code(bw, {1: 1})  # LZ77 value 2 -> plane (1,0) d=1
        _literal(bw, 40, 10, 20, 255, green, red, blue, alpha)
        _emit(bw, green, 258)  # length code 2 -> length 3, no extra bits
        _emit(bw, dist, 1)
        w, h, pix = decode_vp8l(b"\x2f" + bw.bytes())
        assert (w, h) == (2, 2)
        assert pix == [0xFF0A2814] * 4

    def test_lz77_long_distance(self):
        # distance > 120 path: 5x2, copy row 0 into row 1 (d=5 -> code 125)
        bw = _BitWriter()
        _header(bw, 5, 2)
        bw.write(1, 0)
        bw.write(1, 0)
        bw.write(1, 0)
        green = _write_prefix_code(bw, {i: 1 for i in range(5)} | {259: 1})
        red = _write_prefix_code(bw, {7: 1})
        blue = _write_prefix_code(bw, {9: 1})
        alpha = _write_prefix_code(bw, {255: 1})
        # d=125: LZ77 value 125 -> code: extra=4, offset=(2+1)<<4=48? find code
        # 124 = value-1; codes >=4: value = ((2+(c&1))<<((c-2)>>1)) + extra + 1
        # c=12: extra_bits=5, offset=(2+0)<<5=64, values 65..96; c=13: (3<<5)=96,
        # 97..128 -> c=13, extra value 124-96=28
        dist = _write_prefix_code(bw, {13: 1})
        for g in range(5):
            _literal(bw, g, 7, 9, 255, green, red, blue, alpha)
        _emit(bw, green, 259)  # length code 3 -> length 4
        _emit(bw, dist, 13)
        bw.write(5, 28)
        # one trailing literal for the final pixel
        _literal(bw, 4, 7, 9, 255, green, red, blue, alpha)
        w, h, pix = decode_vp8l(b"\x2f" + bw.bytes())
        assert pix[5:9] == pix[0:4]
        assert pix[9] == pix[4]

    def test_color_cache(self):
        bw = _BitWriter()
        _header(bw, 3, 1)
        bw.write(1, 0)  # no transform
        bw.write(1, 1)  # cache present
        bw.write(4, 4)  # 16 entries
        bw.write(1, 0)  # no meta prefix
        argb = 0xFF316273
        idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> 28
        cache_sym = 256 + 24 + idx
        green = _write_prefix_code(bw, {0x62: 1, cache_sym: 1})
        red = _write_prefix_code(bw, {0x31: 1})
        blue = _write_prefix_code(bw, {0x73: 1})
        alpha = _write_prefix_code(bw, {0xFF: 1})
        _write_prefix_code(bw, {})  # distance (unused)
        _literal(bw, 0x62, 0x31, 0x73, 0xFF, green, red, blue, alpha)
        _emit(bw, green, cache_sym)
        _emit(bw, green, cache_sym)
        w, h, pix = decode_vp8l(b"\x2f" + bw.bytes())
        assert pix == [argb] * 3

    def test_subtract_green_transform(self):
        bw = _BitWriter()
        _header(bw, 2, 1)
        bw.write(1, 1)  # transform present
        bw.write(2, 2)  # subtract-green
        bw.write(1, 0)  # no more transforms
        bw.write(1, 0)  # no cache
        bw.write(1, 0)  # no meta
        green = _write_prefix_code(bw, {100: 1})
        red = _write_prefix_code(bw, {30: 1})
        blue = _write_prefix_code(bw, {250: 1})
        alpha = _write_prefix_code(bw, {255: 1})
        _write_prefix_code(bw, {})
        for _ in range(2):
            _literal(bw, 100, 30, 250, 255, green, red, blue, alpha)
        _, _, pix = decode_vp8l(b"\x2f" + bw.bytes())
        r, g, b = (30 + 100) & 0xFF, 100, (250 + 100) & 0xFF
        assert pix == [(0xFF << 24) | (r << 16) | (g << 8) | b] * 2

    def _sub_image(self, bw: _BitWriter, argb_pixels: list[int]) -> None:
        """Entropy-code a small sub-image (transform data / meta / palette)."""
        bw.write(1, 0)  # no color cache
        green = _write_prefix_code(bw, {(p >> 8) & 0xFF: 1 for p in argb_pixels})
        red = _write_prefix_code(bw, {(p >> 16) & 0xFF: 1 for p in argb_pixels})
        blue = _write_prefix_code(bw, {p & 0xFF: 1 for p in argb_pixels})
        alpha = _write_prefix_code(bw, {p >> 24: 1 for p in argb_pixels})
        _write_prefix_code(bw, {})
        for p in argb_pixels:
            _literal(
                bw, (p >> 8) & 0xFF, (p >> 16) & 0xFF, p & 0xFF, p >> 24,
                green, red, blue, alpha,
            )

    def test_predictor_transform(self):
        # 2x2, size_bits=2 -> one 1x1 tile image, mode 2 (top) for pixel (1,1)
        bw = _BitWriter()
        _header(bw, 2, 2)
        bw.write(1, 1)
        bw.write(2, 0)  # predictor
        bw.write(3, 0)  # size_bits = 2
        self._sub_image(bw, [0xFF000200])  # green channel = mode 2
        bw.write(1, 0)  # no more transforms
        bw.write(1, 0)  # no cache
        bw.write(1, 0)  # no meta
        # residuals: all four pixels literal (10, 20, 30) with alpha residual 0
        green = _write_prefix_code(bw, {20: 1})
        red = _write_prefix_code(bw, {10: 1})
        blue = _write_prefix_code(bw, {30: 1})
        alpha = _write_prefix_code(bw, {0: 1})
        _write_prefix_code(bw, {})
        for _ in range(4):
            _literal(bw, 20, 10, 30, 0, green, red, blue, alpha)
        _, _, pix = decode_vp8l(b"\x2f" + bw.bytes())
        # (0,0): residual + black = a=0xff, (10,20,30)
        p00 = 0xFF0A141E
        assert pix[0] == p00
        # (1,0): + left -> channels doubled (alpha 0xff+0 = 0xff? residual a=0:
        # a = 0 + 0xff = 0xff; rgb = 2*(10,20,30)
        assert pix[1] == (0xFF << 24) | (20 << 16) | (40 << 8) | 60
        # (0,1): + top = same as pix[1] arithmetic vs pix[0]
        assert pix[2] == (0xFF << 24) | (20 << 16) | (40 << 8) | 60
        # (1,1): mode 2 (top) -> pix[1] + residual
        assert pix[3] == (0xFF << 24) | (30 << 16) | (60 << 8) | 90

    def test_color_transform(self):
        # one tile, green_to_red=16 (i.e. +g/2), others 0
        bw = _BitWriter()
        _header(bw, 1, 1)
        bw.write(1, 1)
        bw.write(2, 1)  # color transform
        bw.write(3, 0)  # size_bits = 2
        self._sub_image(bw, [0xFF000010])  # blue channel = g2r = 16
        bw.write(1, 0)
        bw.write(1, 0)
        bw.write(1, 0)
        green = _write_prefix_code(bw, {64: 1})
        red = _write_prefix_code(bw, {5: 1})
        blue = _write_prefix_code(bw, {7: 1})
        alpha = _write_prefix_code(bw, {255: 1})
        _write_prefix_code(bw, {})
        _literal(bw, 64, 5, 7, 255, green, red, blue, alpha)
        _, _, pix = decode_vp8l(b"\x2f" + bw.bytes())
        # delta = (16 * 64) >> 5 = 32 -> r = 5 + 32
        assert pix == [(0xFF << 24) | (37 << 16) | (64 << 8) | 7]

    def test_color_indexing_packed(self):
        # 4 colors -> 2-bit packing, image 4x1 packs into one coded pixel
        bw = _BitWriter()
        _header(bw, 4, 1)
        bw.write(1, 1)
        bw.write(2, 3)  # color indexing
        bw.write(8, 3)  # n_colors - 1
        # palette deltas: entries are cumulative sums
        colors = [0xFF101010, 0xFF202020, 0xFF000000, 0xFF805040]
        deltas = []
        prev = 0
        for c in colors:
            d = 0
            for sh in (24, 16, 8, 0):
                d |= (((c >> sh) - (prev >> sh)) & 0xFF) << sh
            deltas.append(d)
            prev = c
        self._sub_image(bw, deltas)
        bw.write(1, 0)  # no more transforms
        bw.write(1, 0)  # no cache
        bw.write(1, 0)  # no meta
        # packed green byte: indices 3,2,1,0 -> 3 | 2<<2 | 1<<4 | 0<<6
        packed = 3 | (2 << 2) | (1 << 4)
        green = _write_prefix_code(bw, {packed: 1})
        red = _write_prefix_code(bw, {0: 1})
        blue = _write_prefix_code(bw, {0: 1})
        alpha = _write_prefix_code(bw, {255: 1})
        _write_prefix_code(bw, {})
        _literal(bw, packed, 0, 0, 255, green, red, blue, alpha)
        _, _, pix = decode_vp8l(b"\x2f" + bw.bytes())
        assert pix == [colors[3], colors[2], colors[1], colors[0]]

    def test_meta_prefix_groups(self):
        # 8x1 with meta_bits=2: tiles [0..3] group 0, [4..7] group 1
        bw = _BitWriter()
        _header(bw, 8, 1)
        bw.write(1, 0)  # no transforms
        bw.write(1, 0)  # no cache
        bw.write(1, 1)  # meta prefix present
        bw.write(3, 0)  # meta_bits = 2
        self._sub_image(bw, [0xFF000000, 0xFF000100])  # meta codes 0, 1
        g0 = {
            "green": _write_prefix_code(bw, {11: 1}),
            "red": _write_prefix_code(bw, {12: 1}),
            "blue": _write_prefix_code(bw, {13: 1}),
            "alpha": _write_prefix_code(bw, {255: 1}),
        }
        _write_prefix_code(bw, {})
        g1 = {
            "green": _write_prefix_code(bw, {21: 1}),
            "red": _write_prefix_code(bw, {22: 1}),
            "blue": _write_prefix_code(bw, {23: 1}),
            "alpha": _write_prefix_code(bw, {255: 1}),
        }
        _write_prefix_code(bw, {})
        for i in range(8):
            g = g0 if i < 4 else g1
            _literal(
                bw, 11 if i < 4 else 21, 12 if i < 4 else 22,
                13 if i < 4 else 23, 255,
                g["green"], g["red"], g["blue"], g["alpha"],
            )
        _, _, pix = decode_vp8l(b"\x2f" + bw.bytes())
        assert pix[:4] == [0xFF0C0B0D] * 4
        assert pix[4:] == [0xFF161517] * 4


class TestDistanceMap:
    def test_internal_consistency(self):
        assert len(_DIST_MAP) == 120
        assert len(set(_DIST_MAP)) == 120
        norms = [dx * dx + dy * dy for dx, dy in _DIST_MAP]
        assert norms == sorted(norms)
        for dx, dy in _DIST_MAP:
            assert 0 <= dy <= 7 and -7 <= dx <= 8
            if dy == 0:
                assert dx > 0  # strictly earlier in scan order


class TestErrors:
    def test_bad_container(self):
        with pytest.raises(ValueError):
            decode_webp(b"RIFFxxxxNOPE")

    def test_bad_signature(self):
        with pytest.raises(ValueError):
            decode_vp8l(b"\x00\x01\x02\x03\x04\x05")

    def test_truncated_stream(self):
        img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        payload = encode_webp_lossless(img)
        body = payload[20 : 20 + struct.unpack("<I", payload[16:20])[0]]
        with pytest.raises(ValueError):
            decode_vp8l(body[: len(body) // 2])

    def test_lossy_vp8_raises(self):
        chunk = b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
        payload = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
        with pytest.raises(NotImplementedError):
            decode_webp(payload)

    def test_backref_out_of_range(self):
        bw = _BitWriter()
        _header(bw, 2, 1)
        bw.write(1, 0)
        bw.write(1, 0)
        bw.write(1, 0)
        green = _write_prefix_code(bw, {40: 1, 258: 1})
        red = _write_prefix_code(bw, {10: 1})
        blue = _write_prefix_code(bw, {20: 1})
        alpha = _write_prefix_code(bw, {255: 1})
        dist = _write_prefix_code(bw, {13: 1})  # far distance, pos=1
        _literal(bw, 40, 10, 20, 255, green, red, blue, alpha)
        _emit(bw, green, 258)
        _emit(bw, dist, 13)
        bw.write(5, 28)
        with pytest.raises(ValueError):
            decode_vp8l(b"\x2f" + bw.bytes())


class TestLossyVP8Header:
    """Lossy VP8 frame-header layer (RFC 6386 §7.2, §9.1-§9.6): boolean
    arithmetic coder + the uniform-literal header fields. Pixel decode
    stays gated (default token probability tables unverifiable offline)."""

    def test_bool_coder_roundtrip_randomized(self):
        import random

        from giranking_spark.operators.webp import _BoolDecoder, _BoolEncoder

        rng = random.Random(0xC0DEC)
        for _ in range(500):
            seq = [
                (rng.randint(1, 254), rng.randint(0, 1))
                for _ in range(rng.randint(1, 200))
            ]
            enc = _BoolEncoder()
            for p, b in seq:
                enc.write_bool(p, b)
            dec = _BoolDecoder(enc.bytes())
            assert [dec.read_bool(p) for p, _ in seq] == [b for _, b in seq]

    def test_bool_decoder_canonical_stream(self):
        """The decoder is the spec formulation, pinned against a hand-run
        trace: stream 0x80 0x00 at prob 128 — split = 1 + (254*128 >> 8)
        = 128, value = 0x8000 >= 128<<8 → first bool is 1, then value
        0x0000 < split<<8 → 0."""
        from giranking_spark.operators.webp import _BoolDecoder

        dec = _BoolDecoder(b"\x80\x00\x00")
        assert dec.read_bool(128) == 1
        assert dec.read_bool(128) == 0

    def test_header_roundtrip_all_fields(self):
        from giranking_spark.operators.webp import (
            decode_webp_lossy_header,
            encode_webp_lossy_header,
        )

        h = decode_webp_lossy_header(
            encode_webp_lossy_header(
                641, 479, version=3, show_frame=0, horiz_scale=2,
                vert_scale=1, filter_type=1, filter_level=63, sharpness=7,
                log2_partitions=3, y_ac_qi=127, y_dc_delta=-15,
                y2_dc_delta=7, y2_ac_delta=-1, uv_dc_delta=15,
                uv_ac_delta=0, refresh_entropy_probs=1,
            )
        )
        assert h["width"] == 641 and h["height"] == 479
        assert h["horiz_scale"] == 2 and h["vert_scale"] == 1
        assert h["version"] == 3 and h["show_frame"] == 0
        assert h["filter_type"] == 1 and h["filter_level"] == 63
        assert h["sharpness"] == 7 and h["n_dct_partitions"] == 8
        assert h["y_ac_qi"] == 127
        assert h["y_dc_delta"] == -15 and h["y2_dc_delta"] == 7
        assert h["y2_ac_delta"] == -1 and h["uv_dc_delta"] == 15
        assert h["uv_ac_delta"] == 0
        assert h["refresh_entropy_probs"] == 1
        # uv_ac_delta=0 written as an explicit present-flag delta decodes
        # as 0 — indistinguishable from absent, matching spec semantics

    def test_frame_tag_layout(self):
        """Frame tag bits (RFC 6386 §9.1): keyframe=bit0(0), version
        bits1-3, show_frame bit4, first_part_size bits5-23, then the
        9D 01 2A start code and LE scale-tagged dims."""
        from giranking_spark.operators.webp import encode_vp8_header

        data = encode_vp8_header(100, 200, version=2, show_frame=1)
        tag = int.from_bytes(data[:3], "little")
        assert tag & 1 == 0
        assert (tag >> 1) & 7 == 2
        assert (tag >> 4) & 1 == 1
        assert tag >> 5 == len(data) - 10
        assert data[3:6] == b"\x9d\x01\x2a"
        assert int.from_bytes(data[6:8], "little") == 100
        assert int.from_bytes(data[8:10], "little") == 200

    def test_rejects_interframe_and_bad_start_code(self):
        from giranking_spark.operators.webp import (
            decode_vp8_header,
            encode_vp8_header,
        )

        good = bytearray(encode_vp8_header(10, 10))
        bad_kf = bytearray(good)
        bad_kf[0] |= 1
        with pytest.raises(ValueError, match="keyframe"):
            decode_vp8_header(bytes(bad_kf))
        bad_sc = bytearray(good)
        bad_sc[4] = 0x02
        with pytest.raises(ValueError, match="start code"):
            decode_vp8_header(bytes(bad_sc))

    def test_lossy_pixel_decode_still_gated(self):
        from giranking_spark.operators.webp import (
            decode_webp,
            encode_webp_lossy_header,
        )

        with pytest.raises(NotImplementedError, match="frame-header"):
            decode_webp(encode_webp_lossy_header(16, 16))
