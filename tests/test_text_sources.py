"""Text graph format tests (SURVEY.md §2.1: src_vertex_text,
src_vertex_uniform, src_edge_text, sink_vertex_text).

The reference splits lines on the regex [\\t ] (tab OR space,
LinkRankVertexInputFormat.java:46) — both separators must parse.
"""

from __future__ import annotations

import glob

import pytest

from giranking_spark.sources.text import (
    read_edge_text,
    read_vertex_text,
    read_vertex_uniform_text,
    write_vertex_text,
)


def test_vertex_text_tab_and_space(spark, tmp_path):
    p = tmp_path / "v.txt"
    p.write_text("a\t1.5\nb 2.0\nc\t0.25\n")
    rows = {r["id"]: r["score"] for r in read_vertex_text(spark, str(p)).collect()}
    assert rows == {"a": 1.5, "b": 2.0, "c": 0.25}


def test_vertex_uniform_scores_one(spark, tmp_path):
    p = tmp_path / "vu.txt"
    p.write_text("a\nb\nc\n")
    rows = {r["id"]: r["score"] for r in read_vertex_uniform_text(spark, str(p)).collect()}
    assert rows == {"a": 1.0, "b": 1.0, "c": 1.0}


def test_vertex_uniform_id_verbatim(spark, tmp_path):
    """preprocessLine passes the line through with NO trim
    (LinkRankVertexUniformInputFormat.java:81-83)."""
    p = tmp_path / "vu_pad.txt"
    p.write_text(" a \n\tb\n")
    rows = {r["id"]: r["score"] for r in read_vertex_uniform_text(spark, str(p)).collect()}
    assert rows == {" a ": 1.0, "\tb": 1.0}


def test_split_is_single_char_like_java(spark, tmp_path):
    """SEPARATOR is Pattern.compile("[\\t ]") — a doubled separator yields an
    empty middle token, exactly like Java's Pattern.split
    (LinkRankEdgeInputFormat.java:45)."""
    p = tmp_path / "e_dbl.txt"
    p.write_text("a  b\nc\td\n")
    rows = {(r["src"], r["dst"]) for r in read_edge_text(spark, str(p)).collect()}
    assert rows == {("a", ""), ("c", "d")}


def test_edge_text_tab_and_space(spark, tmp_path):
    p = tmp_path / "e.txt"
    p.write_text("a\tb\nb c\na\tc\n")
    rows = {(r["src"], r["dst"]) for r in read_edge_text(spark, str(p)).collect()}
    assert rows == {("a", "b"), ("b", "c"), ("a", "c")}


def test_sink_vertex_text_roundtrip(spark, tmp_path):
    src = spark.createDataFrame(
        [("a", 1.25), ("b", 3.5)], "id string, score double"
    )
    out = tmp_path / "out"
    write_vertex_text(src, str(out))
    lines = set()
    for f in glob.glob(f"{out}/part*"):
        with open(f) as fh:
            lines.update(line.strip() for line in fh if line.strip())
    assert lines == {"a\t1.25", "b\t3.5"}
    back = {r["id"]: r["score"] for r in read_vertex_text(spark, str(out)).collect()}
    assert back == {"a": pytest.approx(1.25), "b": pytest.approx(3.5)}
