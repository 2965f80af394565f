"""Round-9 operator unit tests: corrupt-input gates (webp/png), the exact
partial-top-k trim, and small hand-checked pins for the new queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---- VP8 corrupt-input gates (ADVICE r8 #1) ---------------------------------

def test_vp8_header_rejects_truncated_first_partition():
    from giranking_spark.operators.webp import (
        decode_vp8_header,
        encode_webp_lossy_header,
    )

    payload = encode_webp_lossy_header(32, 24)
    # locate the 'VP8 ' chunk body (skip fourcc + size)
    idx = payload.index(b"VP8 ")
    body = payload[idx + 8 :]
    assert decode_vp8_header(body)["width"] == 32
    # declare more first-partition bytes than the chunk carries
    tag = int.from_bytes(body[:3], "little")
    huge = (len(body) + 100) << 5 | (tag & 0x1F)
    corrupt = huge.to_bytes(3, "little") + body[3:]
    with pytest.raises(ValueError, match="truncated"):
        decode_vp8_header(corrupt)


def test_bool_decoder_raises_on_exhausted_stream():
    from giranking_spark.operators.webp import _BoolDecoder

    dec = _BoolDecoder(b"\x80\x00")
    with pytest.raises(ValueError, match="exhausted"):
        for _ in range(200):
            dec.read_bool()


# ---- PNG filter census --------------------------------------------------------

def test_png_row_filters_roundtrip_and_gates():
    from giranking_spark.operators.png import encode_png, png_row_filters

    rgb = bytes((i * 7) % 256 for i in range(5 * 4 * 3))
    p = encode_png(5, 4, rgb, [0, 1, 2, 4])
    assert png_row_filters(p) == [0, 1, 2, 4]
    with pytest.raises(ValueError, match="signature"):
        png_row_filters(b"nonsense")
    with pytest.raises(ValueError):
        png_row_filters(p[:8] + p[8:40])  # IHDR only, no IDAT


# ---- partial top-k exactness ---------------------------------------------------

def test_partial_topk_matches_full_window(spark):
    """The per-batch trim must reproduce the full-sort answer exactly,
    including ties broken by neighbor_id, for every k."""
    from pyspark.sql.window import Window

    from giranking_spark.operators.similarity import _partial_topk

    rows = [
        (q, n, float((q * 7 + n * 13) % 5))  # heavy ties
        for q in range(3)
        for n in range(200)
    ]
    scored = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, cos double"
    ).repartition(8)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    for k in (1, 5):
        want = {
            (r["query_id"], r["neighbor_id"], r["cos"])
            for r in scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .collect()
        }
        got = {
            (r["query_id"], r["neighbor_id"], r["cos"])
            for r in _partial_topk(scored, k, "cos")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .collect()
        }
        assert got == want


# ---- hand-checked pins ----------------------------------------------------------

def test_skyline_hand_checked(spark):
    """4-point set with a dominated point, a tie pair, and a corner — run
    through the PRODUCTION skyline_2d helper (the exact desc rows-frame
    q_rel_skyline_2d ships), so a regression in the shipped window logic
    fails here."""
    from giranking_spark.queries.relational import skyline_2d

    o = spark.createDataFrame(
        [(1, 100, 10), (2, 100, 12), (3, 90, 20), (4, 80, 5)],
        "o_orderkey long, price_cents long, day long",
    )
    sky = {r["o_orderkey"] for r in skyline_2d(o).collect()}
    # 1 dominated by 2; 4 dominated by 3; skyline = {2 (max price), 3}
    assert sky == {2, 3}


def test_theta_band_rewrite_covers_both_directions(spark):
    """A pair whose smaller KEY has the LARGER day (the direction the
    2-bucket rewrite missed) must be found."""
    from giranking_spark.queries.relational import BAND_DAYS

    o = spark.createDataFrame(
        [(1, 4), (2, 2), (3, 100)], "okey long, day long"
    )
    left = o.select(
        "okey", "day",
        F.explode(
            F.array(
                F.expr(f"day div {BAND_DAYS} - 1"),
                F.expr(f"day div {BAND_DAYS}"),
                F.expr(f"day div {BAND_DAYS} + 1"),
            )
        ).alias("bucket"),
    )
    right = o.select(
        F.col("okey").alias("okey2"), F.col("day").alias("day2"),
        F.expr(f"day div {BAND_DAYS}").alias("bucket"),
    )
    pairs = (
        left.join(right, "bucket")
        .filter(
            (F.col("okey") < F.col("okey2"))
            & (F.abs(F.col("day") - F.col("day2")) <= BAND_DAYS)
        )
        .select("okey", "okey2")
        .distinct()
        .collect()
    )
    assert {(r["okey"], r["okey2"]) for r in pairs} == {(1, 2)}
