"""Unit tests for the round-3 wave-4 operators (chunking, simhash pairs,
PPR, k-core, URL normalization) — behavioral checks that complement the
oracle-parity gate with hand-built fixtures and invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from giranking_spark.functions.urls import url_normalize
from giranking_spark.operators.chunking import chunk_documents
from giranking_spark.operators.components import kcore_peel
from giranking_spark.operators.dedup import simhash_pairs
from giranking_spark.operators.ppr import ppr_scores


def test_chunk_short_doc_single_chunk(spark):
    docs = spark.createDataFrame([(1, "alpha beta gamma")], "doc_id LONG, text STRING")
    rows = chunk_documents(docs, width=64, stride=48).collect()
    assert len(rows) == 1
    assert rows[0].chunk_idx == 0
    assert rows[0].n_tokens == 3
    assert rows[0].chunk_text == "alpha beta gamma"


def test_chunk_overlap_and_tail(spark):
    text = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
    rows = {r.chunk_idx: r for r in chunk_documents(docs, width=4, stride=3).collect()}
    # starts 0,3,6,9 -> 4 chunks, the last a 1-token tail
    assert sorted(rows) == [0, 1, 2, 3]
    assert rows[0].chunk_text == "w0 w1 w2 w3"
    assert rows[1].chunk_text == "w3 w4 w5 w6"  # stride 3 overlaps 1 token
    assert rows[3].chunk_text == "w9"
    assert rows[3].n_tokens == 1


def test_chunk_empty_and_whitespace_docs_yield_nothing(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one")], "doc_id LONG, text STRING"
    )
    out = chunk_documents(docs).collect()
    assert {r.doc_id for r in out} == {3}


def test_simhash_pairs_rejects_uncovered_hamming(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id LONG, text STRING")
    with pytest.raises(AssertionError):
        simhash_pairs(docs, bits=32, bands=4, max_hamming=4)


def test_simhash_pairs_identical_docs_distance_zero(spark):
    text = "the quick brown fox jumps over the lazy dog " * 3
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "completely different words entirely here")],
        "doc_id LONG, text STRING",
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_pairs(docs).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ppr_mass_conservation_and_seed_localization(spark):
    # star out of the seed plus a far component; the default seed predicate
    # (key % 7 == 3) matches 'c10' only
    edges = spark.createDataFrame(
        [("c10", "s1"), ("c10", "s2"), ("s1", "s2"), ("x1", "x2")],
        "src STRING, dst STRING",
    )
    scores = {
        r.id: r.score
        for r in ppr_scores(edges, iterations=4).collect()
    }
    # all restart mass flows from the single seed: total stays 1 (scores are
    # rounded to 6 decimals on output, so allow n_vertices ulps of that)
    assert abs(sum(scores.values()) - 1.0) < 5e-6
    # unreachable component gets nothing
    assert scores["x1"] == 0.0 and scores["x2"] == 0.0
    assert scores["c10"] > 0 and scores["s2"] > scores["x1"]


def test_kcore_extracts_triangle_from_path(spark):
    # path a-b-c-d (max 2-core: empty) + triangle t1-t2-t3 (the 2-core)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("t1", "t2"), ("t2", "t3"), ("t1", "t3")],
        "src STRING, dst STRING",
    )
    out = {r.id: r.degree for r in kcore_peel(edges, k=2, rounds=4).collect()}
    assert out == {"t1": 2, "t2": 2, "t3": 2}


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("HTTP://WWW.Example.COM:80/Path/", "http://www.example.com/Path/"),
        ("https://h.example.org:443/a?b=2&a=1", "https://h.example.org/a?a=1&b=2"),
        ("http://h.example.net/p#frag", "http://h.example.net/p"),
        ("http://h.io:8080/x?z=1&y=2", "http://h.io:8080/x?y=2&z=1"),
        ("https://Sub.EXAMPLE.com", "https://sub.example.com/"),
    ],
)
def test_url_normalize_cases(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], "raw STRING")
    got = df.select(url_normalize(F.col("raw")).alias("u")).collect()[0].u
    assert got == expected


def test_url_normalize_idempotent(spark):
    urls = [
        ("HTTP://WWW.Example.COM:80/Path/",),
        ("https://h.example.org:443/a?b=2&a=1",),
        ("https://Sub.EXAMPLE.com",),
    ]
    df = spark.createDataFrame(urls, "raw STRING")
    once = df.select(url_normalize(F.col("raw")).alias("u"))
    twice = once.select(url_normalize(F.col("u")).alias("u"))
    assert [r.u for r in once.collect()] == [r.u for r in twice.collect()]


class TestRandomWalks:
    def test_walks_follow_edges_and_are_deterministic(self, spark):
        from pyspark.sql import functions as F

        from giranking_spark.operators.components import undirected_edges
        from giranking_spark.operators.walks import random_walks
        from giranking_spark.sources.tables import derive_edges
        from tests.conftest import SF_SMALL

        und = undirected_edges(derive_edges(spark, SF_SMALL)).persist()
        walks = random_walks(und, 2).persist()
        # every consecutive (step k -> k+1) hop is a real edge
        a = walks.alias("a")
        b = walks.alias("b")
        hops = a.join(
            b,
            (F.col("a.walk_id") == F.col("b.walk_id"))
            & (F.col("b.step") == F.col("a.step") + 1),
        ).select(
            F.col("a.node").alias("src"), F.col("b.node").alias("dst")
        )
        assert hops.join(und, ["src", "dst"], "left_anti").count() == 0
        # deterministic: a second run is row-identical
        again = random_walks(und, 2)
        assert walks.exceptAll(again).count() == 0
        assert again.exceptAll(walks).count() == 0
        # one walk per vertex, all complete on the undirected graph
        n_vertices = und.select("src").distinct().count()
        assert walks.filter("step = 0").count() == n_vertices
        assert walks.filter("step = 2").count() == n_vertices
