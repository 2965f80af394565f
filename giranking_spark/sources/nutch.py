"""Nutch 2.x HBase table mirrors — scan/clean readers and score sinks
(SURVEY.md §2.1 src_webpage_hbase / src_host_hbase / src_host_trust_hbase,
sink_webpage_hbase / sink_host_hbase).

The reference reads HBase `webpage` / `host` tables (row key = reversed
URL/host, `ol` family = outlink map, `mtdt` family = metadata). Here the
mirror is any DataFrame with schema
    (row_key STRING, outlinks MAP<STRING,STRING>,
     metadata MAP<STRING,STRING>, score_legacy DOUBLE)
(FIXTURES.md §2) — Parquet-friendly, HBase-connector-pluggable.

Reference behaviors reproduced:
  * row-key un-reversal with reversed/unreversed autodetection
    (Nutch2WebpageInputFormat.java:128-136)
  * outlink target validation + self-loop drop + dedup
    (Nutch2WebpageInputFormat.java:166-202)
  * host path prepends http:// before validation
    (Nutch2HostInputFormat.java:179-180)
  * trust flag `mtdt:_tf_` -> initial score 1.0/0.0
    (Nutch2HostTrustInputFormat.java:99-104,160-180)
  * score write-back into `mtdt` under a configurable qualifier
    (_lr_/_hr_/_tr_, Nutch2WebpageOutputFormat.java:79-99)
  * the legacy `s` family column is IGNORED (Nutch2HostInputFormat.java:155-157)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from giranking_spark.functions.urls import (
    host_is_valid,
    host_unreverse,
    url_is_valid,
    url_reverse,
    url_source_detect,
)

QUAL_LINKRANK = "_lr_"
QUAL_HOSTRANK = "_hr_"
QUAL_TRUSTRANK = "_tr_"
QUAL_TRUST_FLAG = "_tf_"


def webpage_vertices(mirror: DataFrame) -> DataFrame:
    """Vertices from the webpage table: unreversed valid-URL row keys,
    initial score fixed 1.0 (Nutch2WebpageInputFormat.java:97,207)."""
    v = mirror.select(url_source_detect(F.col("row_key")).alias("id"))
    return v.filter(url_is_valid(F.col("id"))).withColumn("score", F.lit(1.0))


def webpage_edges(mirror: DataFrame) -> DataFrame:
    """Edges from the `ol` outlink map: explode → validate target → drop
    self-loops → dedup (Nutch2WebpageInputFormat.java:166-202).
    Source keys are also validated (LinkRankVertexFilter.java:28-39)."""
    e = (
        mirror.select(
            url_source_detect(F.col("row_key")).alias("src"),
            F.explode(F.map_keys(F.col("outlinks"))).alias("dst"),
        )
        # The reference trims each outlink key before any check and the
        # TRIMMED string becomes the edge target
        # (Nutch2WebpageInputFormat.java:187 `.trim()`).
        .withColumn("dst", F.trim(F.col("dst")))
        .filter(url_is_valid(F.col("src")) & url_is_valid(F.col("dst")))
        # Self-loop drop is case-INsensitive: `target.equalsIgnoreCase(source)`
        # (Nutch2WebpageInputFormat.java:189-191).
        .filter(F.lower(F.col("src")) != F.lower(F.col("dst")))
        .distinct()
    )
    return e


def host_vertices(mirror: DataFrame, with_trust: bool = False) -> DataFrame:
    """Vertices from the host table: row key is a reversed bare host.
    Trust variant: score = 1.0 iff mtdt['_tf_'] parses to 1, else 0.0
    (Nutch2HostTrustInputFormat.java:160-180; unparseable flags -> 0.0)."""
    v = mirror.select(
        host_unreverse(F.col("row_key")).alias("id"),
        F.col("metadata").getItem(QUAL_TRUST_FLAG).alias("_tf_"),
    ).filter(host_is_valid(F.col("id")))
    if with_trust:
        # try_cast: unparseable flags must yield 0.0 (the reference wraps
        # Integer.parseInt in try/catch — Nutch2HostTrustInputFormat.java:
        # 160-180); a plain cast crashes under ANSI mode.
        flag = F.when(F.col("_tf_").try_cast("int") == 1, F.lit(1.0)).otherwise(F.lit(0.0))
    else:
        flag = F.lit(1.0)  # Nutch2HostInputFormat.java:99,197
    return v.select("id", flag.alias("score"))


def host_edges(mirror: DataFrame) -> DataFrame:
    """Edges from the host table `ol` map: keys are bare hosts; validation
    wraps with http:// (Nutch2HostInputFormat.java:179-180)."""
    return (
        mirror.select(
            host_unreverse(F.col("row_key")).alias("src"),
            F.explode(F.map_keys(F.col("outlinks"))).alias("dst"),
        )
        # Trim-then-use, exactly like the webpage scan
        # (Nutch2HostInputFormat.java:176 `.trim()`).
        .withColumn("dst", F.trim(F.col("dst")))
        .filter(host_is_valid(F.col("src")) & host_is_valid(F.col("dst")))
        # `target.equalsIgnoreCase(source)` (Nutch2HostInputFormat.java:179-180)
        .filter(F.lower(F.col("src")) != F.lower(F.col("dst")))
        .distinct()
    )


def scores_to_webpage_mirror(scores: DataFrame, qualifier: str = QUAL_LINKRANK) -> DataFrame:
    """Sink shape for the webpage table: re-reversed row key + mtdt put
    (Nutch2WebpageOutputFormat.java:79-129)."""
    return scores.select(
        url_reverse(F.col("id")).alias("row_key"),
        F.create_map(F.lit(qualifier), F.col("score").cast("string")).alias("metadata"),
    )


def scores_to_host_mirror(scores: DataFrame, qualifier: str = QUAL_HOSTRANK) -> DataFrame:
    """Sink shape for the host table: reversed-host row key
    (Nutch2HostOutputFormat.java:79-130)."""
    from giranking_spark.functions.urls import host_reverse

    return scores.select(
        host_reverse(F.col("id")).alias("row_key"),
        F.create_map(F.lit(qualifier), F.col("score").cast("string")).alias("metadata"),
    )
