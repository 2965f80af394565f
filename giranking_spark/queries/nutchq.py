"""Nutch HBase-mirror scan/clean/sink queries (SURVEY.md §2.1-§2.3).

Covers src_webpage_hbase, src_host_hbase, src_host_trust_hbase,
sink_webpage_hbase (row-key re-reversal shape), dedup_targets_at_scan and
dedup_edges (reference: io/Nutch2*Format.java, LinkRankComputation.java:304-339).

The mirror tables are built IN-QUERY from the derived graph (orders ⋈
lineitem), with deterministically injected dirt that the scan must clean:
an invalid outlink (``http://``), a self-loop outlink, a ``dummy`` row key
(no scheme — LinkRankHBaseTest.java:144-172 fixture shapes), and
unparseable trust flags. The DuckDB oracle never builds the mirror — it
derives the expected CLEANED output directly from the base tables, so the
scan pipeline (unreverse → validate → self-loop drop → dedup) is checked
independently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from giranking_spark.operators.clean import dedup_edges
from giranking_spark.queries.graph import EDGES_SQL, HOST_EDGES_SQL
from giranking_spark.sources.nutch import (
    QUAL_HOSTRANK,
    host_edges,
    host_vertices,
    scores_to_host_mirror,
    scores_to_webpage_mirror,
    webpage_edges,
    webpage_vertices,
)
from giranking_spark.sources.tables import derive_host_edges
from giranking_spark.sources.tables import derive_edges, load_table

MAPSS = "map<string,string>"


def _url(col: str) -> Column:
    """id ('c123' / 's45') -> canonical URL."""
    return F.concat(F.lit("http://www."), F.col(col), F.lit(".example.com/"))


def _rev_key(col: str) -> Column:
    """id -> reversed-URL row key (com.example.<id>.www:http/)."""
    return F.concat(F.lit("com.example."), F.col(col), F.lit(".www:http/"))


URL_OF = "'http://www.' || {} || '.example.com/'"
HOST_OF = "{} || '.example.com'"

# Shared padded-target fodder: injected into every mirror row in two padded
# spellings, must come out of the scan as exactly one edge per source.
PAD_URL = "http://www.pad.example.com/"
PAD_HOST = "pad.example.com"


def _webpage_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """webpage-table mirror: one row per graph source, reversed row key,
    outlinks = clean targets + injected dirt the scan must clean: an invalid
    target, a self-loop, a MIXED-CASE self-loop (equalsIgnoreCase,
    Nutch2WebpageInputFormat.java:189-191), a whitespace-PADDED self-loop and
    two padded spellings of one shared target (trim-then-dedup, :187); plus a
    dummy row."""
    e = derive_edges(spark, sf_dir)
    upper_self = F.concat(
        F.lit("http://www."), F.upper(F.col("src")), F.lit(".example.com/")
    )
    rows = (
        e.groupBy("src")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(_url("dst").alias("k"), F.lit("").alias("v")))
            ).alias("clean_ol")
        )
        .select(
            _rev_key("src").alias("row_key"),
            F.map_concat(
                F.col("clean_ol"),
                F.create_map(
                    F.lit("http://"), F.lit(""),          # invalid target
                    _url("src"), F.lit(""),               # self-loop
                    upper_self, F.lit(""),                # mixed-case self-loop
                    F.concat(F.lit("  "), _url("src"), F.lit("  ")), F.lit(""),
                    # two padded spellings of one target -> ONE edge after trim
                    F.lit(" " + PAD_URL), F.lit(""),
                    F.lit(PAD_URL + " "), F.lit(""),
                ),
            ).alias("outlinks"),
            F.lit(None).cast(MAPSS).alias("metadata"),
        )
    )
    dummy = spark.range(1).select(
        F.lit("dummy").alias("row_key"),
        F.create_map(F.lit("http://x.example.com/"), F.lit("")).alias("outlinks"),
        F.lit(None).cast(MAPSS).alias("metadata"),
    )
    return rows.unionByName(dummy)


def q_src_webpage_vertices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row keys → unreversed valid URLs, score fixed 1.0; dummy row dropped."""
    return webpage_vertices(_webpage_mirror(spark, sf_dir))


def q_src_webpage_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ol map → validated, self-loop-free, deduped URL edges."""
    return webpage_edges(_webpage_mirror(spark, sf_dir))


def _host_trust_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """host-table mirror with mtdt:_tf_ flags: '1' (trusted) when
    custkey%10==0, 'x' (unparseable → 0.0) when %10==1, else '0'."""
    c = load_table(spark, sf_dir, "customer").select(
        F.concat(F.lit("c"), F.col("c_custkey")).alias("h"),
        F.col("c_custkey").alias("k"),
    )
    flag = (
        F.when(F.col("k") % 10 == 0, F.lit("1"))
        .when(F.col("k") % 10 == 1, F.lit("x"))
        .otherwise(F.lit("0"))
    )
    rows = c.select(
        F.concat(F.lit("com.example."), F.col("h")).alias("row_key"),
        F.lit(None).cast(MAPSS).alias("outlinks"),
        F.create_map(F.lit("_tf_"), flag).alias("metadata"),
    )
    dummy = spark.range(1).select(
        F.lit("invalidhost").alias("row_key"),       # dotless → invalid
        F.lit(None).cast(MAPSS).alias("outlinks"),
        F.create_map(F.lit("_tf_"), F.lit("1")).alias("metadata"),
    )
    return rows.unionByName(dummy)


def _host_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """host-table mirror from the host-level graph: reversed bare-host row
    keys, outlinks keyed by bare target hosts + injected dirt (a dotless
    host and a self-loop, Nutch2HostInputFormat.java:164-192)."""
    e = derive_host_edges(spark, sf_dir)
    host = lambda c: F.concat(F.col(c), F.lit(".example.com"))  # noqa: E731
    upper_self = F.concat(F.upper(F.col("src")), F.lit(".EXAMPLE.COM"))
    return (
        e.groupBy("src")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(host("dst").alias("k"), F.lit("").alias("v")))
            ).alias("clean_ol")
        )
        .select(
            F.concat(F.lit("com.example."), F.col("src")).alias("row_key"),
            F.map_concat(
                F.col("clean_ol"),
                F.create_map(
                    F.lit("invalidhost"), F.lit(""),      # dotless → invalid
                    host("src"), F.lit(""),               # self-loop
                    upper_self, F.lit(""),                # mixed-case self-loop
                    F.concat(F.lit(" "), host("src"), F.lit(" ")), F.lit(""),
                    # two padded spellings of one target -> ONE edge after trim
                    F.lit(" " + PAD_HOST), F.lit(""),
                    F.lit(PAD_HOST + " "), F.lit(""),
                ),
            ).alias("outlinks"),
            F.lit(None).cast(MAPSS).alias("metadata"),
        )
    )


def q_src_host_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-table ol scan: unreversed bare hosts, validated with the
    http:// wrap, self-loops dropped, deduped."""
    return host_edges(_host_mirror(spark, sf_dir))


def q_src_host_trust_vertices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trust-flag scan: score 1.0 iff _tf_ parses to 1
    (Nutch2HostTrustInputFormat.java:160-180)."""
    return host_vertices(_host_trust_mirror(spark, sf_dir), with_trust=True)


def q_sink_webpage_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sink shape: re-reversed row key + mtdt qualifier map
    (Nutch2WebpageOutputFormat.java:79-129). Scores are deterministic
    (custkey/1000) so the oracle can rebuild the rows exactly."""
    c = load_table(spark, sf_dir, "customer")
    scores = c.select(
        F.concat(F.lit("http://www.c"), F.col("c_custkey"), F.lit(".example.com/")).alias("id"),
        F.round(F.col("c_custkey") / 1000.0, 6).alias("score"),
    )
    out = scores_to_webpage_mirror(scores)
    return out.select(
        "row_key", F.col("metadata").getItem("_lr_").alias("lr_score")
    )


def q_sink_host_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-table sink shape: reversed-host row key + mtdt:_hr_ qualifier
    (Nutch2HostOutputFormat.java:113,117-130). Twin of the webpage sink;
    scores are deterministic (custkey/1000) so the oracle rebuilds the rows."""
    c = load_table(spark, sf_dir, "customer")
    scores = c.select(
        F.concat(F.lit("c"), F.col("c_custkey"), F.lit(".example.com")).alias("id"),
        F.round(F.col("c_custkey") / 1000.0, 6).alias("score"),
    )
    out = scores_to_host_mirror(scores, qualifier=QUAL_HOSTRANK)
    return out.select(
        "row_key", F.col("metadata").getItem(QUAL_HOSTRANK).alias("hr_score")
    )


def q_dedup_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compute-time dedup (LinkRankComputation.java:304-339): duplicates,
    #fragment variants and self-loops collapse; a source whose targets were
    ALL self-loops keeps its original edges VERBATIM (fragment and all,
    :336-338 only replaces the list when the cleaned list is non-empty)."""
    e = derive_edges(spark, sf_dir).select(
        _url("src").alias("src"), _url("dst").alias("dst")
    )
    frag = e.select("src", F.concat(F.col("dst"), F.lit("#frag")).alias("dst"))
    # per-source all-self-loop fodder: one vertex per customer key %13==0
    selfx = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 13 == 0)
        .select(
            F.concat(F.lit("http://x"), F.col("c_custkey"), F.lit(".example.com/")).alias("src"),
            F.concat(F.lit("http://x"), F.col("c_custkey"), F.lit(".example.com/#f")).alias("dst"),
        )
    )
    # padded-source fodder: the reference compares self-loops against the
    # TRIMMED vertex id (LinkRankComputation.java:306) — a padded src with a
    # self-loop AND a real target must keep only the real target.
    padded = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 17 == 0)
        .select(
            F.concat(F.lit(" http://y"), F.col("c_custkey"), F.lit(".example.com/ ")).alias("src"),
            F.concat(F.lit("http://y"), F.col("c_custkey"), F.lit(".example.com/#x")).alias("dst"),
        )
    )
    padded_real = padded.select("src", F.lit("http://z.example.com/").alias("dst"))
    dirty = e.unionAll(e).unionAll(frag).unionAll(selfx).unionAll(padded).unionAll(padded_real)
    return dedup_edges(dirty)


_URL_SRC = URL_OF.format("src")
_URL_DST = URL_OF.format("dst")

QUERIES = {
    "src_webpage_vertices": q_src_webpage_vertices,
    "src_webpage_edges": q_src_webpage_edges,
    "src_host_edges": q_src_host_edges,
    "src_host_trust_vertices": q_src_host_trust_vertices,
    "sink_webpage_mirror": q_sink_webpage_mirror,
    "sink_host_mirror": q_sink_host_mirror,
    "dedup_edges": q_dedup_edges,
}

ORACLES = {
    "src_webpage_vertices": (
        f"WITH e AS ({EDGES_SQL}) "
        f"SELECT DISTINCT {_URL_SRC} AS id, CAST(1.0 AS DOUBLE) AS score FROM e"
    ),
    "src_webpage_edges": (
        f"WITH e AS ({EDGES_SQL}) "
        f"SELECT {_URL_SRC} AS src, {_URL_DST} AS dst FROM e "
        # the two padded PAD_URL spellings trim+dedup to ONE edge per source;
        # plain, mixed-case and padded self-loops all drop
        f"UNION SELECT DISTINCT {_URL_SRC} AS src, '{PAD_URL}' AS dst FROM e"
    ),
    "src_host_edges": (
        f"WITH e AS ({HOST_EDGES_SQL}) "
        "SELECT src || '.example.com' AS src, dst || '.example.com' AS dst FROM e "
        f"UNION SELECT DISTINCT src || '.example.com' AS src, '{PAD_HOST}' AS dst FROM e"
    ),
    "src_host_trust_vertices": (
        "SELECT 'c' || c_custkey || '.example.com' AS id, "
        "CASE WHEN c_custkey % 10 = 0 THEN 1.0 ELSE 0.0 END AS score "
        "FROM customer"
    ),
    "sink_webpage_mirror": (
        "SELECT 'com.example.c' || c_custkey || '.www:http/' AS row_key, "
        "CAST(round(c_custkey / 1000.0, 6) AS VARCHAR) AS lr_score "
        "FROM customer"
    ),
    "sink_host_mirror": (
        "SELECT 'com.example.c' || c_custkey AS row_key, "
        "CAST(round(c_custkey / 1000.0, 6) AS VARCHAR) AS hr_score "
        "FROM customer"
    ),
    "dedup_edges": (
        f"WITH e AS ({EDGES_SQL}) "
        f"SELECT {_URL_SRC} AS src, {_URL_DST} AS dst FROM e "
        "UNION ALL "
        # all-self-loop sources keep their RAW edge list (fragment-bearing)
        "SELECT 'http://x' || c_custkey || '.example.com/' AS src, "
        "'http://x' || c_custkey || '.example.com/#f' AS dst "
        "FROM customer WHERE c_custkey % 13 = 0 "
        "UNION ALL "
        # padded sources drop their trimmed self-loop, keep the real target
        "SELECT ' http://y' || c_custkey || '.example.com/ ' AS src, "
        "'http://z.example.com/' AS dst "
        "FROM customer WHERE c_custkey % 17 = 0"
    ),
}
