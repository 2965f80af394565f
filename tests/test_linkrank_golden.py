"""Primary correctness gate: the reference's golden fixtures (FIXTURES.md §4).

G1 triangle + G2 2-cycle goldens from LinkRankComputationTest.java:42-169,
tolerance 1e-3 (DELTA, :40). G3 webpage-mirror scan-clean path reproduces G1.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from giranking_spark.config import LinkRankConfig, TrustRankConfig
from giranking_spark.operators.linkrank import run_linkrank, run_trustrank
from giranking_spark.sources.nutch import (
    host_edges,
    host_vertices,
    webpage_edges,
    webpage_vertices,
)

DELTA = 1e-3  # LinkRankComputationTest.java:40

G1_EXPECTED = {
    "a": 1.3515060339386287,
    "b": 4.144902009567587,
    "c": 9.06389778197704,
}  # LinkRankComputationTest.java:81-83


def scores_of(df):
    return {r["id"]: r["score"] for r in df.collect()}


def test_g1_triangle(spark):
    vertices = spark.createDataFrame(
        [("a", 1.0), ("b", 1.0), ("c", 1.0)], "id string, score double"
    )
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "src string, dst string"
    )
    out = scores_of(run_linkrank(vertices, edges, LinkRankConfig()))
    for k, v in G1_EXPECTED.items():
        assert out[k] == pytest.approx(v, abs=DELTA), (k, out)


def test_g1_uniform_vertices(spark):
    """Uniform input (no explicit scores) gives identical goldens
    (LinkRankComputationTest.java:87-130)."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "src string, dst string"
    )
    out = scores_of(run_linkrank(None, edges, LinkRankConfig()))
    for k, v in G1_EXPECTED.items():
        assert out[k] == pytest.approx(v, abs=DELTA)


def test_g2_two_cycle(spark):
    """Symmetric 2-cycle: both exactly scale/2 (LinkRankComputationTest.java:132-169)."""
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    out = scores_of(run_linkrank(None, edges, LinkRankConfig()))
    assert out["a"] == pytest.approx(5.0, abs=DELTA)
    assert out["b"] == pytest.approx(5.0, abs=DELTA)


def _webpage_mirror(spark):
    """G3 fixture — LinkRankHBaseTest.java:144-172 as a Parquet-style mirror."""
    g = "http://www.google.com/"
    y = "http://www.yahoo.com/"
    b = "http://www.bing.com/"
    rows = [
        ("com.google.www:http/", {y: "", b: "", g: ""}, {}, 1.0),  # self-link dropped
        ("com.yahoo.www:http/", {b: "", "http://": ""}, {}, 1.0),  # empty-host dropped
        ("com.bing.www:http/", {"http://invalidurl": ""}, {}, 1.0),  # dotless dropped
        ("dummy", {y: ""}, {}, 1.0),  # invalid row key dropped
    ]
    return spark.createDataFrame(
        rows,
        "row_key string, outlinks map<string,string>, "
        "metadata map<string,string>, score_legacy double",
    )


def test_g3_webpage_mirror_scan_clean(spark):
    mirror = _webpage_mirror(spark)
    v = webpage_vertices(mirror)
    e = webpage_edges(mirror)
    assert {r["id"] for r in v.collect()} == {
        "http://www.google.com/", "http://www.yahoo.com/", "http://www.bing.com/",
    }
    assert {(r["src"], r["dst"]) for r in e.collect()} == {
        ("http://www.google.com/", "http://www.yahoo.com/"),
        ("http://www.google.com/", "http://www.bing.com/"),
        ("http://www.yahoo.com/", "http://www.bing.com/"),
    }
    out = scores_of(run_linkrank(v, e, LinkRankConfig()))
    expected = {
        "http://www.google.com/": G1_EXPECTED["a"],
        "http://www.yahoo.com/": G1_EXPECTED["b"],
        "http://www.bing.com/": G1_EXPECTED["c"],
    }
    for k, val in expected.items():
        assert out[k] == pytest.approx(val, abs=DELTA)


def test_scan_self_loop_trim_case_insensitive(spark):
    """Scan-time self-loop drop is trim + equalsIgnoreCase
    (Nutch2WebpageInputFormat.java:187-191, Nutch2HostInputFormat.java:176-180):
    mixed-case and whitespace-padded self-loops must drop, and padded
    spellings of one target must dedup to a single trimmed edge."""
    g = "http://www.google.com/"
    y = "http://www.yahoo.com/"
    mirror = spark.createDataFrame(
        [(
            "com.google.www:http/",
            {
                "http://www.GOOGLE.com/": "",   # mixed-case self-loop -> drop
                "  " + g + "  ": "",            # padded self-loop -> drop
                " " + y: "",                    # padded spellings of one
                y + " ": "",                    #   target -> ONE edge
            },
            {},
            1.0,
        )],
        "row_key string, outlinks map<string,string>, "
        "metadata map<string,string>, score_legacy double",
    )
    e = webpage_edges(mirror)
    assert [(r["src"], r["dst"]) for r in e.collect()] == [(g, y)]

    host_mirror = spark.createDataFrame(
        [(
            "com.google.www",
            {
                "www.GOOGLE.com": "",           # mixed-case self-loop -> drop
                " www.google.com ": "",         # padded self-loop -> drop
                " www.yahoo.com": "",
                "www.yahoo.com ": "",
            },
            {},
            1.0,
        )],
        "row_key string, outlinks map<string,string>, "
        "metadata map<string,string>, score_legacy double",
    )
    he = host_edges(host_mirror)
    assert [(r["src"], r["dst"]) for r in he.collect()] == [
        ("www.google.com", "www.yahoo.com")
    ]


def _host_trust_mirror(spark):
    """G4 fixture — TrustRankHBaseTest.java:145-192: trusted google/yahoo/bing
    triangle + untrusted spam subgraph."""
    rows = [
        ("com.google.www", {"www.yahoo.com": "", "www.bing.com": ""}, {"_tf_": "1"}, None),
        ("com.yahoo.www", {"www.bing.com": ""}, {"_tf_": "1"}, None),
        ("com.bing.www", {}, {"_tf_": "1"}, None),
        ("com.spam.www", {"www.spam2.com": "", "www.spam3.com": ""}, {"_tf_": "0"}, None),
        ("com.spam3.www", {"www.spam2.com": ""}, {"_tf_": "garbage"}, None),
        ("com.spam4.www", {"spam.com": ""}, {}, None),
    ]
    return spark.createDataFrame(
        rows,
        "row_key string, outlinks map<string,string>, "
        "metadata map<string,string>, score_legacy double",
    )


def test_g4_trustrank_structural(spark):
    """No golden values exist (reference asserts commented out due to its own
    bugs) — gate on structural properties instead (FIXTURES.md §4 G4)."""
    mirror = _host_trust_mirror(spark)
    v = host_vertices(mirror, with_trust=True)
    e = host_edges(mirror)
    cfg = TrustRankConfig(damping=0.20, superstep_count=3, float32_teleport=True)
    out = scores_of(run_trustrank(v, e, cfg))
    # every surviving vertex scored, scores within [0, scale]
    assert len(out) >= 6
    assert all(0.0 <= s <= cfg.scale for s in out.values())
    trusted = ["www.yahoo.com", "www.bing.com"]
    spam = ["www.spam2.com"]
    # trusted targets outrank the spam sink
    assert min(out[t] for t in trusted) > max(out[s] for s in spam)


def test_trustrank_bug_compat_drops_dangling(spark):
    """bug_compat reproduces the shipped behavior: dangling mass vanishes, so
    scores differ from intended semantics on a graph with dangling mass."""
    mirror = _host_trust_mirror(spark)
    v = host_vertices(mirror, with_trust=True)
    e = host_edges(mirror)
    intended = scores_of(run_trustrank(v, e, TrustRankConfig(damping=0.2, superstep_count=3)))
    buggy = scores_of(
        run_trustrank(v, e, TrustRankConfig(damping=0.2, superstep_count=3, bug_compat=True))
    )
    assert set(intended) == set(buggy)
    assert any(abs(intended[k] - buggy[k]) > 1e-9 for k in intended)


def test_g1_reliable_checkpoint_identical(spark, tmp_path):
    """cfg.checkpoint_dir switches the loop to reliable df.checkpoint();
    goldens must be identical to the localCheckpoint path (the checkpoint
    mechanism is pure lineage truncation, never semantics)."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "src string, dst string"
    )
    local = scores_of(run_linkrank(None, edges, LinkRankConfig()))
    cfg = LinkRankConfig(checkpoint_dir=str(tmp_path / "ckpt"))
    reliable = scores_of(run_linkrank(None, edges, cfg))
    assert reliable == local  # bit-identical: same arithmetic, same order
    for k, v in G1_EXPECTED.items():
        assert reliable[k] == pytest.approx(v, abs=DELTA)


def test_g1_salted_aggregation_identical(spark):
    """salt_buckets two-phase message sum reproduces the goldens (within the
    reference DELTA — float sums reassociate across the two phases)."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "src string, dst string"
    )
    out = scores_of(run_linkrank(None, edges, LinkRankConfig(salt_buckets=4)))
    for k, v in G1_EXPECTED.items():
        assert out[k] == pytest.approx(v, abs=DELTA), (k, out)


def test_hub_skew_salted_matches_unsalted(spark):
    """100-TB skew insurance: on a power-law graph with one hot destination
    (400 sources all pointing at ``hub``), the salt_buckets two-phase
    aggregate must reproduce the unsalted fixpoint scores to 1e-12 — the
    salt changes only the reduction tree of the per-dst message sum, never
    its value.  (The two-phase plan shape itself is pinned by
    tests/test_scale_plans.py::test_salted_message_sum_is_two_stage.)"""
    rows = []
    for i in range(400):
        s = f"s{i}"
        rows.append((s, "hub"))            # the hot key
        rows.append((s, f"t{i % 7}"))      # thin tail so outdeg varies
    for j in range(7):
        rows.append((f"t{j}", f"s{(j * 53) % 400}"))  # tail feeds back
    rows.append(("hub", "t0"))             # hub is not dangling
    edges = spark.createDataFrame(rows, "src string, dst string")
    base = scores_of(run_linkrank(None, edges, LinkRankConfig()))
    salted = scores_of(run_linkrank(None, edges, LinkRankConfig(salt_buckets=8)))
    assert set(base) == set(salted)
    for k in base:
        assert salted[k] == pytest.approx(base[k], abs=1e-12), (
            k, base[k], salted[k],
        )


def test_mass_conservation_pre_normalization(spark):
    """Property G5: per-iteration total mass = teleport + d*(msgs+dangling)
    is conserved as Σscore = (1-d32) + d for a stochastic-complete graph.
    Weaker general form: all raw scores positive and finite after the loop —
    checked via the normalized output being in range and monotone."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")], "src string, dst string"
    )
    out = run_linkrank(None, edges, LinkRankConfig())
    rows = out.collect()
    assert all(0.0 <= r["score"] <= 10.0 for r in rows)


def test_trust_flag_unparseable_is_zero_under_ansi(spark):
    """Round-3 gate regression: the driver's ANSI session crashed on
    cast('x' AS INT) for the deliberately-unparseable trust flag. try_cast
    now mirrors the reference's try/catch (unparseable -> 0.0,
    Nutch2HostTrustInputFormat.java:160-180) in BOTH ANSI modes."""
    mirror = _host_trust_mirror(spark)
    v = {r["id"]: r["score"] for r in host_vertices(mirror, with_trust=True).collect()}
    assert v["www.google.com"] == 1.0
    assert v["www.spam.com"] == 0.0        # parseable "0"
    assert v["www.spam3.com"] == 0.0       # "garbage" -> unparseable -> 0.0
    assert v["www.spam4.com"] == 0.0       # flag absent -> NULL -> 0.0
