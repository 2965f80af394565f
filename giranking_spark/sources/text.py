"""Text graph formats (SURVEY.md §2.1).

Reference formats (all line-oriented, separator = tab OR space):
    src_vertex_text     generic/LinkRankVertexInputFormat.java:40-114
                        line = "<id>[\\t ]<score>"
    src_vertex_uniform  generic/LinkRankVertexUniformInputFormat.java:40-106
                        line = "<id>", score fixed 1.0
    src_edge_text       generic/LinkRankEdgeInputFormat.java:39-89
                        line = "<src>[\\t ]<dst>"
    sink_vertex_text    generic/LinkRankVertexOutputFormat.java:35-57
                        line = "<id>\\t<score>"

The reference splits on the regex [\\t ] — SINGLE occurrence, not [\\t ]+
(Pattern.compile("[\t ]"), LinkRankVertexInputFormat.java:47,
LinkRankEdgeInputFormat.java:45): a doubled separator yields an empty token,
exactly as Java's Pattern.split does. csv's single-char separator can't
express "tab OR space", so lines are read as text and split JVM-side
(F.split delegates to the same java.util.regex engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SEP = r"[\t ]"


def read_vertex_text(spark: SparkSession, path: str) -> DataFrame:
    parts = F.split(F.col("value"), _SEP)
    return spark.read.text(path).select(
        parts.getItem(0).alias("id"),
        parts.getItem(1).cast("double").alias("score"),
    )


def read_vertex_uniform_text(spark: SparkSession, path: str) -> DataFrame:
    # The reference's preprocessLine passes the line through VERBATIM — no
    # trim, no split (LinkRankVertexUniformInputFormat.java:81-83:
    # `new StringDoublePair(line.toString(), UNIFORM_VALUE)`).
    return spark.read.text(path).select(
        F.col("value").alias("id"), F.lit(1.0).alias("score")
    )


def read_edge_text(spark: SparkSession, path: str) -> DataFrame:
    parts = F.split(F.col("value"), _SEP)
    return spark.read.text(path).select(
        parts.getItem(0).alias("src"), parts.getItem(1).alias("dst")
    )


def write_vertex_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.select("id", "score").write.mode(mode).csv(path, sep="\t")
