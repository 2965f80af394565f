"""Property-based and regression tests the reference lacks (SURVEY.md §5
implications #4): raw-mass conservation, CDF output range, permutation /
id-renaming invariance, and the documented cycle-inflation problem
(reference README.md:11-14) asserted as BEHAVIOR, not fixed silently.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from giranking_spark.config import LinkRankConfig
from giranking_spark.operators.linkrank import linkrank_raw, run_linkrank


def _random_edges(seed: int, n_vertices: int = 30, n_edges: int = 80):
    rng = random.Random(seed)
    out = set()
    while len(out) < n_edges:
        a, b = rng.randrange(n_vertices), rng.randrange(n_vertices)
        if a != b:
            out.add((f"v{a}", f"v{b}"))
    return sorted(out)


@pytest.mark.parametrize("seed", [7, 42])
def test_raw_mass_conservation(spark, seed):
    """Pre-normalization invariant: with damping d and float32 teleport t,
    each update maps total mass M -> N·(t/N) + d·(Σmsgs + dangling) = t + d·M
    because every vertex's score is either forwarded along edges or counted
    as dangling. From M_0 = N the closed form is
    M_k = t·(1-d^k)/(1-d) + d^k·N  (decaying from N toward t/(1-d)).
    Check it to 1e-9 relative."""
    cfg = LinkRankConfig()
    edges = spark.createDataFrame(_random_edges(seed), "src string, dst string")
    raw = linkrank_raw(None, edges, cfg)
    n = raw.count()
    total = raw.agg(F.sum("score")).first()[0]
    t, d, k = cfg.teleport, cfg.damping, cfg.num_updates
    expected = t * (1 - d**k) / (1 - d) + (d**k) * n
    assert total == pytest.approx(expected, rel=1e-9)


@pytest.mark.parametrize("seed", [3])
def test_cdf_output_range_and_mean(spark, seed):
    """Normalized scores live in [0, scale]; the CDF of the mean log-score is
    0.5, so scores straddle scale/2."""
    edges = spark.createDataFrame(_random_edges(seed), "src string, dst string")
    out = run_linkrank(None, edges, LinkRankConfig()).collect()
    scores = [r["score"] for r in out]
    assert all(0.0 <= s <= 10.0 for s in scores)
    assert min(scores) < 5.0 < max(scores)


def test_id_renaming_invariance(spark):
    """Scores depend only on graph shape, not vertex names or input order:
    renaming every id through a bijection and shuffling rows yields the same
    multiset of scores and the same per-vertex mapping."""
    base = _random_edges(11)
    edges = spark.createDataFrame(base, "src string, dst string")
    ren = {f"v{i}": f"node_{i*7%97:02d}_{i}" for i in range(100)}
    renamed_rows = [(ren[a], ren[b]) for a, b in base]
    random.Random(5).shuffle(renamed_rows)
    renamed = spark.createDataFrame(renamed_rows, "src string, dst string")

    out_a = {r["id"]: r["score"] for r in run_linkrank(None, edges, LinkRankConfig()).collect()}
    out_b = {r["id"]: r["score"] for r in run_linkrank(None, renamed, LinkRankConfig()).collect()}
    assert len(out_a) == len(out_b)
    for vid, score in out_a.items():
        assert out_b[ren[vid]] == pytest.approx(score, abs=1e-9)


def test_cycle_inflation_documented_behavior(spark):
    """reference README.md:11-14: link cycles inflate member scores toward
    the top of the scale (9.9+). This is intentional parity — assert the
    behavior exists rather than silently fixing it: a tight 3-cycle fed by
    a long tail of one-way contributors lands its members far above the
    contributors."""
    feeders = [(f"f{i}", c) for i in range(30) for c in ("x",)]
    cycle = [("x", "y"), ("y", "z"), ("z", "x")]
    edges = spark.createDataFrame(feeders + cycle, "src string, dst string")
    out = {r["id"]: r["score"] for r in run_linkrank(None, edges, LinkRankConfig()).collect()}
    cyc = [out["x"], out["y"], out["z"]]
    tail = [v for k, v in out.items() if k.startswith("f")]
    assert min(cyc) > max(tail)
    assert max(cyc) > 9.0  # inflated toward the top of the [0, 10] scale


@pytest.mark.parametrize("seed", [3, 19])
def test_sweepline_concurrency_equals_bruteforce(spark, seed):
    """The distributed sweep line (±1 boundaries + running sum) must agree
    with the O(n²)-but-obviously-correct check: for each interval start,
    count intervals containing it — with half-open [s, e) semantics the max
    over starts IS the max concurrency."""
    from pyspark.sql import Window

    rng = random.Random(seed)
    hold = 50
    rows = [(f"g{rng.randrange(3)}", rng.randrange(300)) for _ in range(120)]
    ev = spark.createDataFrame(rows, "event_type string, t long")

    starts = ev.select("event_type", F.col("t").alias("x"), F.lit(1).alias("d"))
    ends = ev.select(
        "event_type", (F.col("t") + hold).alias("x"), F.lit(-1).alias("d")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("x", "d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sweep = (
        starts.union(ends)
        .withColumn("cur", F.sum("d").over(w))
        .groupBy("event_type")
        .agg(F.max("cur").alias("max_concurrent"))
    )
    got = {r["event_type"]: r["max_concurrent"] for r in sweep.collect()}

    by_group: dict[str, list[int]] = {}
    for g, t in rows:
        by_group.setdefault(g, []).append(t)
    for g, ts in by_group.items():
        brute = max(sum(1 for s in ts if s <= q < s + hold) for q in ts)
        assert got[g] == brute, g


# --- JPEG codec properties (operators/jpeg.py) -----------------------------


@pytest.mark.parametrize("seed", range(8))
def test_jpeg_block_constant_exactness_property(seed):
    """For ANY block-constant image under all-ones quant + 4:4:4, decode is
    exactly the BT.601 round-trip of the source colors — the invariant the
    mm_jpeg_features oracle is built on, over random shapes and colors."""
    import numpy as np

    from giranking_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )

    rng = np.random.default_rng(seed)
    ones = np.ones(64, dtype=np.int64)
    nbx, nby = int(rng.integers(1, 5)), int(rng.integers(1, 4))
    img = np.zeros((8 * nby, 8 * nbx, 3), dtype=np.uint8)
    for by in range(nby):
        for bx in range(nbx):
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = rng.integers(
                0, 256, 3
            )
    _, _, dec = decode_jpeg(encode_jpeg(img, ones, ones))
    assert np.array_equal(dec, ycbcr_to_rgb(rgb_to_ycbcr(img).astype(float)))


@pytest.mark.parametrize("seed", range(4))
def test_jpeg_arbitrary_image_bounded_error_property(seed):
    """For ANY image (random dims, random pixels) the unit-quant round-trip
    error stays within the DCT rounding budget — the decoder never derails
    on odd sizes, high frequencies, or saturation."""
    import numpy as np

    from giranking_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )

    rng = np.random.default_rng(100 + seed)
    ones = np.ones(64, dtype=np.int64)
    h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    got_w, got_h, dec = decode_jpeg(encode_jpeg(img, ones, ones))
    assert (got_w, got_h) == (w, h)
    ref = ycbcr_to_rgb(rgb_to_ycbcr(img).astype(float))
    assert np.abs(dec.astype(int) - ref.astype(int)).max() <= 5


# ---------------------------------------------------------------------------
# EXIF writer/parser roundtrip (pure Python — no Spark session needed)

@given(
    make=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                 min_size=0, max_size=24),
    model=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                  min_size=0, max_size=24),
    orientation=st.integers(min_value=0, max_value=65535),
    iso=st.integers(min_value=0, max_value=65535),
    px=st.integers(min_value=0, max_value=2**32 - 1),
    py=st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_exif_roundtrip_property(make, model, orientation, iso, px, py):
    """parse(splice(encode(x))) == x for arbitrary printable-ASCII strings
    and full-range integer fields — including the inline (<=4 byte) vs
    out-of-line ASCII layout switch."""
    from giranking_spark.operators.exif import (
        encode_exif_app1,
        parse_exif,
        splice_app1,
    )

    app1 = encode_exif_app1(
        make=make, model=model, orientation=orientation,
        datetime="2024:01:01 00:00:00", pixel_x=px, pixel_y=py, iso=iso,
    )
    fake_jpeg = b"\xff\xd8" + b"\xff\xd9"
    got = parse_exif(splice_app1(fake_jpeg, app1))
    assert got["make"] == make and got["model"] == model
    assert got["orientation"] == orientation and got["iso"] == iso
    assert got["pixel_x"] == px and got["pixel_y"] == py
