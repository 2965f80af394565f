"""Graph cleaning operators (SURVEY.md §2.2, §2.3).

The reference cleans the link graph in two places — at scan time inside the
HBase input formats and (optionally) at superstep 0 inside compute(). Here
each cleaning step is a standalone DataFrame->DataFrame operator so Catalyst
can fuse them with the scan (predicate pushdown / codegen).

Reference semantics:
    filter_valid_url_vertex  io/LinkRankVertexFilter.java:28-39
    filter_valid_host_vertex io/HostRankVertexFilter.java:28-39
    filter_valid_url_edge    generic/LinkRankEdgeFilter.java:29-40
    dedup_edges              LinkRankComputation.java:304-339 — normalize
        (trim + strip #fragment), drop self-loops (case-insensitive compare
        with source), dedup targets; a vertex's edge list is only REPLACED
        when the cleaned list is non-empty (:336-338) — i.e. a vertex whose
        outlinks were all self-loops keeps its original edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from giranking_spark.functions.urls import host_is_valid, strip_fragment, url_is_valid


def filter_valid_url_vertices(vertices: DataFrame, id_col: str = "id") -> DataFrame:
    return vertices.filter(url_is_valid(F.col(id_col)))


def filter_valid_host_vertices(vertices: DataFrame, id_col: str = "id") -> DataFrame:
    return vertices.filter(host_is_valid(F.col(id_col)))


def filter_valid_url_edges(edges: DataFrame) -> DataFrame:
    return edges.filter(url_is_valid(F.col("src")) & url_is_valid(F.col("dst")))


def dedup_edges(edges: DataFrame) -> DataFrame:
    """Per-source normalize + self-loop drop + dedup, with the reference's
    "keep old edges if the cleaned list is empty" guard.

    Reference parity (LinkRankComputation.java:304-339): only the TARGET is
    normalized (trim + strip #fragment — the source is the vertex id and is
    never modified), and a source whose cleaned list came out empty keeps its
    ORIGINAL edge list verbatim — untrimmed, fragment-bearing, duplicates and
    all (:336-338 replaces edges only when the new list is non-empty).

    One wide shuffle on (src, dst) for the distinct; the guard is a
    broadcast-friendly anti-join on the (small) set of fully-self-loop
    sources. Scale note: distinct is a partial-aggregate shuffle — no
    driver-side state, and AQE coalesces the output partitions.
    """
    normalized = edges.select(
        F.col("src"),
        strip_fragment(F.col("dst")).alias("dst"),
    )
    # The reference compares against the TRIMMED source id
    # (`vertex.getId().toString().trim()`, LinkRankComputation.java:306) —
    # a whitespace-padded src must still drop its self-loops. Output columns
    # stay unmodified (the vertex id itself is never rewritten).
    cleaned = normalized.filter(
        F.lower(F.trim(F.col("src"))) != F.lower(F.col("dst"))
    ).distinct()
    # sources whose outlinks were ALL self-loops: present in input, absent in cleaned
    dropped_srcs = (
        edges.select("src").distinct()
        .join(cleaned.select("src").distinct(), "src", "left_anti")
    )
    kept_original = edges.join(dropped_srcs, "src", "left_semi")
    return cleaned.unionByName(kept_original)
