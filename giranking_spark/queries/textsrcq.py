"""Text-format source/sink queries with DuckDB oracles (SURVEY.md §2.1).

The reference's PRIMARY test entry point is the line-oriented text formats
(generic/LinkRankVertexInputFormat.java:46,86-91,
LinkRankVertexUniformInputFormat.java:81-83, LinkRankEdgeInputFormat.java:64-69,
LinkRankVertexOutputFormat.java:35-57). Each query here materializes a
deterministic text file derived from ``customer`` keys (mixing the two legal
separators, tab and space, plus whitespace fodder the uniform reader must
preserve VERBATIM), reads it back through the reader under test, and the
DuckDB oracle derives the EXPECTED parse directly from the base table — the
oracle never touches the file, so the read path (single-char line split on
[\\t ], score cast, verbatim uniform ids) is checked independently.

The write happens under /tmp at query time (distributed ``df.write.text`` —
no driver-side row handling); paths are per-application, per-sf and per-query
so concurrent runs never collide (two sessions on the same sf would otherwise
overwrite each other's files mid-read).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from giranking_spark.sources.tables import load_table
from giranking_spark.sources.text import (
    read_edge_text,
    read_vertex_text,
    read_vertex_uniform_text,
    write_vertex_text,
)

_TMP_ROOT = "/tmp/giranking_spark_textsrc"


def _scratch(spark: SparkSession, sf_dir: str, name: str) -> str:
    return os.path.join(
        _TMP_ROOT,
        spark.sparkContext.applicationId,
        os.path.basename(os.path.normpath(sf_dir)),
        name,
    )


def _lines(spark: SparkSession, sf_dir: str, line_sql: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        F.expr(line_sql).alias("value")
    )


# line fodder, shared shapes with the oracles below:
#  - separator alternates tab / space (the reference splits on [\t ])
#  - scores use a '.5' suffix so the string->double parse is IEEE-exact
#    in both engines (no decimal rounding noise)
_VERTEX_LINE_SQL = (
    "'v' || c_custkey || (CASE WHEN c_custkey % 2 = 0 THEN chr(9) ELSE ' ' END) "
    "|| c_custkey || '.5'"
)
# whitespace-padded lines stay padded: the reference's preprocessLine does
# NOT trim (LinkRankVertexUniformInputFormat.java:81-83) and the oracle below
# expects the padded id verbatim
_UNIFORM_LINE_SQL = (
    "CASE WHEN c_custkey % 3 = 0 THEN ' v' || c_custkey || ' ' "
    "ELSE 'v' || c_custkey END"
)
_EDGE_LINE_SQL = (
    "'v' || c_custkey || (CASE WHEN c_custkey % 2 = 0 THEN chr(9) ELSE ' ' END) "
    "|| 'w' || (c_custkey * 7 % 1000)"
)


def q_src_vertex_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"<id>[\\t ]<score>" lines -> (id, score) (LinkRankVertexInputFormat.java:86-91)."""
    path = _scratch(spark, sf_dir, "vertex_text")
    _lines(spark, sf_dir, _VERTEX_LINE_SQL).write.mode("overwrite").text(path)
    return read_vertex_text(spark, path)


def q_src_vertex_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"<id>" lines -> (id, 1.0), id VERBATIM — no trim
    (LinkRankVertexUniformInputFormat.java:81-83)."""
    path = _scratch(spark, sf_dir, "vertex_uniform")
    _lines(spark, sf_dir, _UNIFORM_LINE_SQL).write.mode("overwrite").text(path)
    return read_vertex_uniform_text(spark, path)


def q_src_edge_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"<src>[\\t ]<dst>" lines -> (src, dst) (LinkRankEdgeInputFormat.java:64-69)."""
    path = _scratch(spark, sf_dir, "edge_text")
    _lines(spark, sf_dir, _EDGE_LINE_SQL).write.mode("overwrite").text(path)
    return read_edge_text(spark, path)


def q_sink_vertex_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """write_vertex_text -> read_vertex_text roundtrip
    (LinkRankVertexOutputFormat.java:35-57 "<id>\\t<score>")."""
    path = _scratch(spark, sf_dir, "sink_vertex_text")
    scores = load_table(spark, sf_dir, "customer").select(
        F.concat(F.lit("v"), F.col("c_custkey")).alias("id"),
        (F.col("c_custkey") + F.lit(0.5)).alias("score"),
    )
    write_vertex_text(scores, path)
    return read_vertex_text(spark, path)


QUERIES = {
    "src_vertex_text": q_src_vertex_text,
    "src_vertex_uniform": q_src_vertex_uniform,
    "src_edge_text": q_src_edge_text,
    "sink_vertex_text": q_sink_vertex_text,
}

ORACLES = {
    "src_vertex_text": (
        "SELECT 'v' || c_custkey AS id, c_custkey + 0.5 AS score FROM customer"
    ),
    "src_vertex_uniform": (
        "SELECT CASE WHEN c_custkey % 3 = 0 THEN ' v' || c_custkey || ' ' "
        "ELSE 'v' || c_custkey END AS id, 1.0 AS score FROM customer"
    ),
    "src_edge_text": (
        "SELECT 'v' || c_custkey AS src, 'w' || (c_custkey * 7 % 1000) AS dst "
        "FROM customer"
    ),
    "sink_vertex_text": (
        "SELECT 'v' || c_custkey AS id, c_custkey + 0.5 AS score FROM customer"
    ),
}
