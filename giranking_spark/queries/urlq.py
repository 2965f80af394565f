"""URL / host scalar-function queries with DuckDB oracles (SURVEY.md §2.8).

Covers url_reverse, url_unreverse (roundtrip), host_reverse,
url_get_reversed_host, url_is_valid, url_source_detect and
proj_fragment_strip (reference: NutchUtil.java:44-217,
Nutch2WebpageInputFormat.java:128-136, LinkRankComputation.java:306-313).

Oracle strategy: the input strings are constructed deterministically from
``customer`` keys by a SQL fragment shared verbatim between Spark
(``F.expr``) and DuckDB, while the EXPECTED outputs are constructed directly
from the key by an independent SQL derivation — the oracle never re-runs the
string function under test, so it independently checks the transformation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from giranking_spark.functions.urls import (
    host_reverse,
    strip_fragment,
    url_get_reversed_host,
    url_is_valid,
    url_reverse,
    url_source_detect,
    url_unreverse,
)
from giranking_spark.sources.tables import load_table

# 4 URL shapes: bare host / port+path+query / path+fragment / multi-label
# deep host with userinfo. Shared verbatim by both engines (k = c_custkey).
URL_SQL = (
    "CASE c_custkey % 4 "
    "WHEN 0 THEN 'http://www.c' || c_custkey || '.example.com/' "
    "WHEN 1 THEN 'https://sub.c' || c_custkey || '.example.org:8983/path/' "
    "|| c_custkey || '?q=' || c_custkey "
    "WHEN 2 THEN 'http://c' || c_custkey || '.example.net/p#frag' || c_custkey "
    "ELSE 'ftp://u' || c_custkey || '@deep.sub.c' || c_custkey || '.example.io/' END"
)

# Expected reversal of URL_SQL, derived independently from k
# (com.foo.bar:scheme[:port]/rest — NutchUtil.java:44-99). The fragment and
# userinfo are DROPPED: the reference builds keys from URL.getHost()/getFile(),
# which exclude both.
URL_REV_SQL = (
    "CASE c_custkey % 4 "
    "WHEN 0 THEN 'com.example.c' || c_custkey || '.www:http/' "
    "WHEN 1 THEN 'org.example.c' || c_custkey || '.sub:https:8983/path/' "
    "|| c_custkey || '?q=' || c_custkey "
    "WHEN 2 THEN 'net.example.c' || c_custkey || ':http/p' "
    "ELSE 'io.example.c' || c_custkey || '.sub.deep:ftp/' END"
)

# reverse→unreverse roundtrip target: URL_SQL minus fragment and userinfo
# (reversal is lossy for both, exactly as in the reference row-key format).
URL_CANON_SQL = (
    "CASE c_custkey % 4 "
    "WHEN 0 THEN 'http://www.c' || c_custkey || '.example.com/' "
    "WHEN 1 THEN 'https://sub.c' || c_custkey || '.example.org:8983/path/' "
    "|| c_custkey || '?q=' || c_custkey "
    "WHEN 2 THEN 'http://c' || c_custkey || '.example.net/p' "
    "ELSE 'ftp://deep.sub.c' || c_custkey || '.example.io/' END"
)

# Validity mix: 3 dirty shapes from the reference fixtures
# (LinkRankHBaseTest.java:144-172) + 2 valid ones.
DIRTY_URL_SQL = (
    "CASE c_custkey % 5 "
    "WHEN 0 THEN 'dummy' "                       # no scheme
    "WHEN 1 THEN 'http://' "                      # empty host
    "WHEN 2 THEN 'http://invalidurl' "            # dotless host
    "WHEN 3 THEN 'http://www.c' || c_custkey || '.example.com/' "
    "ELSE 'https://c' || c_custkey || '.example.org:81/x' END"
)
DIRTY_VALID_SQL = "(c_custkey % 5 >= 3)"

# Bare hosts with 2..4 labels for the involution test.
HOST_SQL = (
    "CASE c_custkey % 3 "
    "WHEN 0 THEN 'c' || c_custkey || '.com' "
    "WHEN 1 THEN 'www.c' || c_custkey || '.example.com' "
    "ELSE 'a.b.c' || c_custkey || '.org' END"
)
HOST_REV_SQL = (
    "CASE c_custkey % 3 "
    "WHEN 0 THEN 'com.c' || c_custkey "
    "WHEN 1 THEN 'com.example.c' || c_custkey || '.www' "
    "ELSE 'org.c' || c_custkey || '.b.a' END"
)

# Row keys for source-detection: half already reversed, half plain URLs
# (Nutch2WebpageInputFormat.java:128-136).
KEY_SQL = (
    "CASE c_custkey % 2 "
    "WHEN 0 THEN 'com.example.c' || c_custkey || '.www:http/' "
    "ELSE 'http://www.c' || c_custkey || '.example.com/' END"
)
KEY_DETECTED_SQL = "'http://www.c' || c_custkey || '.example.com/'"

# Fragment/trim fodder (LinkRankComputation.java:306-313).
FRAG_SQL = (
    "CASE c_custkey % 3 "
    "WHEN 0 THEN '  http://c' || c_custkey || '.example.com/p#sec' || c_custkey || '  ' "
    "WHEN 1 THEN 'http://c' || c_custkey || '.example.com/p' "
    "ELSE ' http://c' || c_custkey || '.example.com/#' END"
)
FRAG_STRIPPED_SQL = (
    "CASE c_custkey % 3 "
    "WHEN 0 THEN 'http://c' || c_custkey || '.example.com/p' "
    "WHEN 1 THEN 'http://c' || c_custkey || '.example.com/p' "
    "ELSE 'http://c' || c_custkey || '.example.com/' END"
)


# Messy-URL fodder for canonicalization: uppercase scheme/host, default
# ports, unsorted query params, fragments, missing path.
MESSY_URL_SQL = (
    "CASE c_custkey % 5 "
    "WHEN 0 THEN 'HTTP://WWW.C' || c_custkey || '.Example.COM:80/Path/' "
    "WHEN 1 THEN 'https://c' || c_custkey || '.example.org:443/a?b=2&a=' || c_custkey || ' ' "
    "WHEN 2 THEN 'http://c' || c_custkey || '.example.net/p#frag' || c_custkey || ' ' "
    "WHEN 3 THEN 'http://c' || c_custkey || '.example.io:8080/x?z=1&y=' || c_custkey || ' ' "
    "ELSE 'https://Sub.C' || c_custkey || '.EXAMPLE.com' END"
)
# expected canonical form, derived independently from the key (never by
# re-running the function under test)
MESSY_NORM_SQL = (
    "CASE c_custkey % 5 "
    "WHEN 0 THEN 'http://www.c' || c_custkey || '.example.com/Path/' "
    "WHEN 1 THEN 'https://c' || c_custkey || '.example.org/a?a=' || c_custkey || '&b=2' "
    "WHEN 2 THEN 'http://c' || c_custkey || '.example.net/p' "
    "WHEN 3 THEN 'http://c' || c_custkey || '.example.io:8080/x?y=' || c_custkey || '&z=1' "
    "ELSE 'https://sub.c' || c_custkey || '.example.com/' END"
)


def _base(spark: SparkSession, sf_dir: str, expr: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.expr(expr).alias(name)
    )


def q_url_reverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _base(spark, sf_dir, URL_SQL, "url")
    return d.select("c_custkey", "url", url_reverse(F.col("url")).alias("rev"))


def q_url_unreverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roundtrip: unreverse(reverse(url)) gives the url back modulo the
    lossy parts (fragment, userinfo) the row-key format never stores."""
    d = _base(spark, sf_dir, URL_SQL, "url")
    return d.select(
        "c_custkey", "url", url_unreverse(url_reverse(F.col("url"))).alias("back")
    )


def q_url_get_reversed_host(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _base(spark, sf_dir, URL_SQL, "url")
    return d.select(
        "c_custkey",
        url_get_reversed_host(url_reverse(F.col("url"))).alias("rev_host"),
    )


def q_url_is_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _base(spark, sf_dir, DIRTY_URL_SQL, "url")
    return d.select("c_custkey", "url", url_is_valid(F.col("url")).alias("valid"))


def q_host_reverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _base(spark, sf_dir, HOST_SQL, "host")
    return d.select(
        "c_custkey",
        "host",
        host_reverse(F.col("host")).alias("rev"),
        host_reverse(host_reverse(F.col("host"))).alias("back"),
    )


def q_url_source_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _base(spark, sf_dir, KEY_SQL, "row_key")
    return d.select(
        "c_custkey", url_source_detect(F.col("row_key")).alias("url")
    )


def q_proj_fragment_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _base(spark, sf_dir, FRAG_SQL, "raw")
    return d.select("c_custkey", strip_fragment(F.col("raw")).alias("url"))


def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from giranking_spark.functions.urls import url_normalize

    d = _base(spark, sf_dir, MESSY_URL_SQL, "raw")
    return d.select("c_custkey", url_normalize(F.col("raw")).alias("url"))


QUERIES = {
    "url_normalize": q_url_normalize,
    "url_reverse": q_url_reverse,
    "url_unreverse": q_url_unreverse,
    "url_get_reversed_host": q_url_get_reversed_host,
    "url_is_valid": q_url_is_valid,
    "host_reverse": q_host_reverse,
    "url_source_detect": q_url_source_detect,
    "proj_fragment_strip": q_proj_fragment_strip,
}

ORACLES = {
    "url_normalize": (
        f"SELECT c_custkey, {MESSY_NORM_SQL} AS url FROM customer"
    ),
    "url_reverse": (
        f"SELECT c_custkey, {URL_SQL} AS url, {URL_REV_SQL} AS rev FROM customer"
    ),
    "url_unreverse": (
        f"SELECT c_custkey, {URL_SQL} AS url, {URL_CANON_SQL} AS back FROM customer"
    ),
    "url_get_reversed_host": (
        "SELECT c_custkey, CASE c_custkey % 4 "
        "WHEN 0 THEN 'com.example.c' || c_custkey || '.www' "
        "WHEN 1 THEN 'org.example.c' || c_custkey || '.sub' "
        "WHEN 2 THEN 'net.example.c' || c_custkey "
        "ELSE 'io.example.c' || c_custkey || '.sub.deep' END AS rev_host "
        "FROM customer"
    ),
    "url_is_valid": (
        f"SELECT c_custkey, {DIRTY_URL_SQL} AS url, {DIRTY_VALID_SQL} AS valid "
        "FROM customer"
    ),
    "host_reverse": (
        f"SELECT c_custkey, {HOST_SQL} AS host, {HOST_REV_SQL} AS rev, "
        f"{HOST_SQL} AS back FROM customer"
    ),
    "url_source_detect": (
        f"SELECT c_custkey, {KEY_DETECTED_SQL} AS url FROM customer"
    ),
    "proj_fragment_strip": (
        f"SELECT c_custkey, {FRAG_STRIPPED_SQL} AS url FROM customer"
    ),
}
