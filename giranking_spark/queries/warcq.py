"""WARC crawl-archive queries with DuckDB oracles.

The reference ranks pages stored by Nutch (reference: giraph-nutch/.../
LinkRank/io/Nutch2WebpageInputFormat.java:47-211); the crawl format feeding
that store is WARC. These queries certify a full dependency-free WARC path:

    src_warc_records   encode -> parse roundtrip; title/status/body fields
    warc_cdx_index     CDX offset index (SURT urlkey + byte offsets) from
                       parser-measured record lengths — the oracle
                       reconstructs every record's bytes in SQL, so a green
                       row certifies writer + parser byte-exactly
    warc_link_hosts    href extraction from response HTML (JVM regexp) ->
                       outlink host aggregation (a webgraph build step)
    url_robots_filter  robots.txt longest-match allow/deny over the
                       extracted outlinks (Google robots semantics:
                       longest rule wins, allow wins ties, no rule=allow)

Archive fodder is synthesized deterministically per document (one
warcinfo + one HTTP response record whose HTML embeds 1 + doc_id%3
outlinks), so every oracle derives the expected output from the generative
formula without touching the parser.

Scale posture: the parse is one Arrow mapInPandas pass per archive (linear,
no shuffle); link extraction and robots matching are whole-stage-codegen
regexp/joins with the rules side broadcast; CDX offsets are one window per
archive shard — exactly the per-WARC-file layout real CDX indexers use.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from giranking_spark.functions.urls import host_reverse, url_host, url_rest
from giranking_spark.operators.multimodal import pack_assets
from giranking_spark.sources.tables import load_table
from giranking_spark.sources.warc import (
    WARC_DATE,
    encode_http_response,
    encode_warc_record,
    encode_warcinfo,
    read_warc,
)

DOC_HOSTS = 37      # page-URI host modulus
LINK_HOSTS = 50     # outlink host modulus
CDX_SHARDS = 8      # archives per CDX "file" (offset window partition)

_CRLF_CTE = "WITH c AS (SELECT chr(13) || chr(10) AS crlf)"


def _page_html(doc_id: int, lang: str, atext: str) -> str:
    links = "".join(
        f'<a href="http://www.h{(doc_id * 7 + j) % LINK_HOSTS}.example'
        f'/p/{doc_id}-{j}">l{j}</a>'
        for j in range(1 + doc_id % 3)
    )
    return (
        f"<html><head><title>Doc {doc_id} [{lang}]</title></head><body>"
        f"<p>{atext}</p>{links}</body></html>"
    )


def _synth_warc_archives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One archive per document: warcinfo + HTTP response whose HTML body,
    URI and status derive from the doc row (status 404 when doc_id%17==0,
    else 200). ASCII throughout so SQL length() == byte length."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("asset_id"),
        F.col("lang"),
        F.regexp_replace(F.lower("text"), "[^a-z ]", "").alias("atext"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for a, lang, atext in zip(
                pdf["asset_id"], pdf["lang"], pdf["atext"]
            ):
                a = int(a)
                html = _page_html(a, lang, atext).encode("ascii")
                status = 404 if a % 17 == 0 else 200
                http = encode_http_response(status, "text/html", html)
                resp = encode_warc_record(
                    "response",
                    f"resp-{a}",
                    http,
                    "application/http; msgtype=response",
                    target_uri=f"http://www.d{a % DOC_HOSTS}.example/page/{a}",
                )
                payloads.append(encode_warcinfo(f"info-{a}") + resp)
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "payload": payloads}
            )

    from giranking_spark.queries.mmq import _spread
    raw = _spread(docs).mapInPandas(gen, "asset_id long, payload binary")
    return pack_assets(raw, "asset_id", F.col("payload"), mime="application/warc")


# ---- shared SQL fragments (mirror _page_html / warc.py encoders) ----------

_ATEXT_SQL = "regexp_replace(lower(text), '[^a-z ]', '', 'g')"

_LINK_SQL = (
    "'<a href=\"http://www.h' || ((doc_id * 7 + {j}) % 50) || '.example/p/' "
    "|| doc_id || '-' || {j} || '\">l' || {j} || '</a>'"
)

_HTML_SQL = (
    "'<html><head><title>Doc ' || doc_id || ' [' || lang || "
    "']</title></head><body><p>' || " + _ATEXT_SQL + " || '</p>' || "
    + _LINK_SQL.format(j=0)
    + " || CASE WHEN doc_id % 3 >= 1 THEN " + _LINK_SQL.format(j=1)
    + " ELSE '' END || CASE WHEN doc_id % 3 >= 2 THEN " + _LINK_SQL.format(j=2)
    + " ELSE '' END || '</body></html>'"
)

_URI_SQL = "'http://www.d' || (doc_id % 37) || '.example/page/' || doc_id"
_STATUS_SQL = "CASE WHEN doc_id % 17 = 0 THEN 404 ELSE 200 END"
_REASON_SQL = "CASE WHEN doc_id % 17 = 0 THEN 'Not Found' ELSE 'OK' END"


def q_src_warc_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingest roundtrip: parse the synthesized archives and surface the
    response records' URI / HTTP status / title / body length; the oracle
    recomputes each from the generative formula without parsing."""
    recs = read_warc(_synth_warc_archives(spark, sf_dir))
    body = F.col("body").cast("string")
    return (
        recs.where(F.col("warc_type") == "response")
        .select(
            F.col("archive_id").alias("doc_id"),
            F.col("target_uri"),
            F.col("http_status"),
            F.regexp_extract(body, "<title>([^<]*)</title>", 1).alias("title"),
            F.octet_length("body").cast("long").alias("body_len"),
        )
    )


_SRC_WARC_SQL = f"""
SELECT doc_id,
       {_URI_SQL} AS target_uri,
       {_STATUS_SQL} AS http_status,
       'Doc ' || doc_id || ' [' || lang || ']' AS title,
       CAST(length({_HTML_SQL}) AS BIGINT) AS body_len
FROM documents
"""


def q_warc_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX capture index over sharded archives: SURT-style urlkey plus the
    byte offset/length of each response record, offsets from a single
    cumulative window over parser-measured record lengths per shard — the
    layout a real per-WARC-file CDX indexer produces."""
    recs = read_warc(_synth_warc_archives(spark, sf_dir))
    is_resp = F.col("warc_type") == "response"
    per_doc = recs.groupBy("archive_id").agg(
        F.sum("record_len").alias("doc_len"),
        F.sum(F.when(~is_resp, F.col("record_len"))).alias("info_len"),
        F.max(F.when(is_resp, F.col("record_len"))).alias("resp_len"),
        F.max(F.when(is_resp, F.col("target_uri"))).alias("uri"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("archive_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        per_doc.withColumn("shard", (F.col("archive_id") % CDX_SHARDS).cast("int"))
        .select(
            F.col("archive_id").alias("doc_id"),
            "shard",
            F.concat(
                host_reverse(url_host(F.col("uri"))),
                F.lit(")"),
                url_rest(F.col("uri")),
            ).alias("urlkey"),
            (F.coalesce(F.sum("doc_len").over(w), F.lit(0)) + F.col("info_len"))
            .cast("long")
            .alias("cdx_offset"),
            F.col("resp_len").cast("long").alias("cdx_length"),
        )
    )


# SQL reconstruction of both records' exact bytes (mirrors sources/warc.py).
_CDX_SQL = f"""
{_CRLF_CTE},
base AS (
    SELECT doc_id,
           {_HTML_SQL} AS html,
           {_URI_SQL} AS uri,
           {_STATUS_SQL} AS status,
           {_REASON_SQL} AS reason
    FROM documents
),
blocks AS (
    SELECT doc_id, uri,
           length('HTTP/1.1 ' || status || ' ' || reason || crlf ||
                  'Content-Type: text/html' || crlf ||
                  'Content-Length: ' || length(html) || crlf || crlf)
               + length(html) AS http_len,
           length('software: giranking-spark' || crlf ||
                  'format: WARC file version 1.0' || crlf) AS info_block_len
    FROM base, c
),
recs AS (
    SELECT doc_id, uri,
           length('WARC/1.0' || crlf || 'WARC-Type: warcinfo' || crlf ||
                  'WARC-Record-ID: <urn:giranking:info-' || doc_id || '>' || crlf ||
                  'WARC-Date: {WARC_DATE}' || crlf ||
                  'Content-Type: application/warc-fields' || crlf ||
                  'Content-Length: ' || info_block_len || crlf || crlf)
               + info_block_len + 4 AS info_len,
           length('WARC/1.0' || crlf || 'WARC-Type: response' || crlf ||
                  'WARC-Record-ID: <urn:giranking:resp-' || doc_id || '>' || crlf ||
                  'WARC-Date: {WARC_DATE}' || crlf ||
                  'WARC-Target-URI: ' || uri || crlf ||
                  'Content-Type: application/http; msgtype=response' || crlf ||
                  'Content-Length: ' || http_len || crlf || crlf)
               + http_len + 4 AS resp_len
    FROM blocks, c
)
SELECT doc_id,
       CAST(doc_id % {CDX_SHARDS} AS INTEGER) AS shard,
       'example.d' || (doc_id % 37) || '.www)/page/' || doc_id AS urlkey,
       CAST(COALESCE(SUM(info_len + resp_len) OVER (
                PARTITION BY doc_id % {CDX_SHARDS} ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + info_len AS BIGINT) AS cdx_offset,
       CAST(resp_len AS BIGINT) AS cdx_length
FROM recs
"""


def q_warc_link_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink host aggregation — the first step of a crawl webgraph build:
    parse responses, extract every href JVM-side (regexp_extract_all inside
    whole-stage codegen; the Python stage ended at the parser), resolve the
    link host, count links and distinct source docs per host."""
    recs = read_warc(_synth_warc_archives(spark, sf_dir))
    body = F.col("body").cast("string")
    links = (
        recs.where(F.col("warc_type") == "response")
        .select(
            F.col("archive_id").alias("doc_id"),
            F.explode(
                F.regexp_extract_all(body, F.lit('href="([^"]+)"'), 1)
            ).alias("href"),
        )
    )
    return (
        links.groupBy(url_host(F.col("href")).alias("link_host"))
        .agg(
            F.count("*").alias("n_links"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


_LINKS_FROM_FORMULA_SQL = """
links AS (
    SELECT doc_id, j,
           'www.h' || ((doc_id * 7 + j) % 50) || '.example' AS link_host,
           '/p/' || doc_id || '-' || j AS path
    FROM documents, (SELECT 0 AS j UNION ALL SELECT 1 UNION ALL SELECT 2) js
    WHERE j <= doc_id % 3
)
"""

_LINK_HOSTS_SQL = f"""
WITH {_LINKS_FROM_FORMULA_SQL.strip()}
SELECT link_host,
       COUNT(*) AS n_links,
       COUNT(DISTINCT doc_id) AS n_docs
FROM links
GROUP BY link_host
"""

# robots rules per outlink host k (k = 0..LINK_HOSTS-1), longest-match:
#   k%3==0          Disallow /p/        (blocks that host's outlinks)
#   k%3==0 & k%2==0 Allow    /p/1       (longer rule re-allows doc_ids 1*)
#   k%5==1          Disallow /          (blanket block)
# no matching rule -> allowed.


def _robots_rules(spark: SparkSession) -> DataFrame:
    k = F.col("id").cast("long")
    rule = "struct<prefix: string, allow: boolean>"
    rules = spark.range(LINK_HOSTS).select(
        k.alias("host_k"),
        F.explode(
            F.filter(
                F.array(
                    F.when(k % 3 == 0, F.struct(
                        F.lit("/p/").alias("prefix"), F.lit(False).alias("allow")
                    )).cast(rule),
                    F.when((k % 3 == 0) & (k % 2 == 0), F.struct(
                        F.lit("/p/1").alias("prefix"), F.lit(True).alias("allow")
                    )).cast(rule),
                    F.when(k % 5 == 1, F.struct(
                        F.lit("/").alias("prefix"), F.lit(False).alias("allow")
                    )).cast(rule),
                ),
                lambda r: r.isNotNull(),
            )
        ).alias("rule"),
    ).select("host_k", "rule.prefix", "rule.allow")
    return rules


def q_url_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt filtering over the extracted outlinks: broadcast the
    per-host rule table, keep rules whose prefix matches, pick the longest
    (allow wins ties), default allow — Google robots.txt semantics.
    Output: per host, urls seen / allowed / blocked."""
    docs = load_table(spark, sf_dir, "documents")
    links = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(F.sequence(F.lit(0), (F.col("doc_id") % 3).cast("int"))).alias("j"),
    ).select(
        "doc_id",
        "j",
        ((F.col("doc_id") * 7 + F.col("j")) % LINK_HOSTS).alias("host_k"),
        F.concat(F.lit("/p/"), F.col("doc_id"), F.lit("-"), F.col("j")).alias("path"),
    )
    rules = _robots_rules(spark)
    matched = links.join(
        F.broadcast(rules),
        (links["host_k"] == rules["host_k"])
        & F.col("path").startswith(F.col("prefix")),
        "left",
    ).select(links["host_k"], "doc_id", "j", "prefix", "allow")
    w = Window.partitionBy("host_k", "doc_id", "j").orderBy(
        F.length("prefix").desc(), F.col("allow").desc()
    )
    decided = (
        matched.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .withColumn("allowed", F.coalesce(F.col("allow"), F.lit(True)))
    )
    return decided.groupBy(
        F.concat(F.lit("www.h"), F.col("host_k"), F.lit(".example")).alias(
            "link_host"
        )
    ).agg(
        F.count("*").alias("n_urls"),
        F.sum(F.when(F.col("allowed"), 1).otherwise(0)).alias("n_allowed"),
        F.sum(F.when(~F.col("allowed"), 1).otherwise(0)).alias("n_blocked"),
    )


_ROBOTS_SQL = f"""
WITH {_LINKS_FROM_FORMULA_SQL.strip()},
hosts AS (
    SELECT CAST(range AS BIGINT) AS host_k FROM range(0, {LINK_HOSTS})
),
rules AS (
    SELECT host_k, '/p/' AS prefix, FALSE AS allow FROM hosts WHERE host_k % 3 = 0
    UNION ALL
    SELECT host_k, '/p/1', TRUE FROM hosts WHERE host_k % 3 = 0 AND host_k % 2 = 0
    UNION ALL
    SELECT host_k, '/', FALSE FROM hosts WHERE host_k % 5 = 1
),
matched AS (
    SELECT l.doc_id, l.j,
           (l.doc_id * 7 + l.j) % 50 AS host_k,
           r.prefix, r.allow
    FROM links l
    LEFT JOIN rules r
      ON r.host_k = (l.doc_id * 7 + l.j) % 50
     AND substr(l.path, 1, length(r.prefix)) = r.prefix
),
decided AS (
    SELECT host_k, doc_id, j,
           COALESCE(allow, TRUE) AS allowed,
           ROW_NUMBER() OVER (
               PARTITION BY host_k, doc_id, j
               ORDER BY length(prefix) DESC NULLS LAST, allow DESC NULLS LAST
           ) AS rn
    FROM matched
)
SELECT 'www.h' || host_k || '.example' AS link_host,
       COUNT(*) AS n_urls,
       CAST(SUM(CASE WHEN allowed THEN 1 ELSE 0 END) AS BIGINT) AS n_allowed,
       CAST(SUM(CASE WHEN allowed THEN 0 ELSE 1 END) AS BIGINT) AS n_blocked
FROM decided
WHERE rn = 1
GROUP BY host_k
"""


RANK_SUPERSTEPS = 5   # 4 score updates — enough to mix dangling mass


def q_warc_rank_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end crawl-to-rank: WARC archives -> parse -> href extraction ->
    host-level link graph -> LinkRank fixpoint -> CDF-normalized host scores.
    This is the reference's whole production flow (crawl store in, ranked
    hosts out — reference: giraph-nutch/.../LinkRank/LinkRankComputation.java)
    driven from raw crawl archives instead of HBase. The oracle replays the
    identical unrolled fixpoint (graph.py:linkrank_oracle_sql) over the
    formula-derived edge set, so parse + extraction + ranking are certified
    together."""
    from giranking_spark.config import LinkRankConfig
    from giranking_spark.operators.linkrank import run_linkrank

    recs = read_warc(_synth_warc_archives(spark, sf_dir))
    body = F.col("body").cast("string")
    edges = (
        recs.where(F.col("warc_type") == "response")
        .select(
            url_host(F.col("target_uri")).alias("src"),
            F.explode(
                F.regexp_extract_all(body, F.lit('href="([^"]+)"'), 1)
            ).alias("href"),
        )
        .select("src", url_host(F.col("href")).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    scores = run_linkrank(
        None, edges, LinkRankConfig(superstep_count=RANK_SUPERSTEPS)
    )
    return scores.withColumn("score", F.round(F.col("score"), 6))


_WARC_EDGES_SQL = (
    "SELECT DISTINCT 'www.d' || (doc_id % 37) || '.example' AS src, "
    "'www.h' || ((doc_id * 7 + j) % 50) || '.example' AS dst "
    "FROM documents, (SELECT 0 AS j UNION ALL SELECT 1 UNION ALL SELECT 2) js "
    "WHERE j <= doc_id % 3"
)


def _warc_rank_oracle() -> str:
    from giranking_spark.config import LinkRankConfig
    from giranking_spark.queries.graph import linkrank_oracle_sql

    return linkrank_oracle_sql(
        LinkRankConfig(superstep_count=RANK_SUPERSTEPS), edges_sql=_WARC_EDGES_SQL
    )


QUERIES = {
    "src_warc_records": q_src_warc_records,
    "warc_rank_pipeline": q_warc_rank_pipeline,
    "warc_cdx_index": q_warc_cdx_index,
    "warc_link_hosts": q_warc_link_hosts,
    "url_robots_filter": q_url_robots_filter,
}

ORACLES = {
    "src_warc_records": _SRC_WARC_SQL,
    "warc_rank_pipeline": _warc_rank_oracle(),
    "warc_cdx_index": _CDX_SQL,
    "warc_link_hosts": _LINK_HOSTS_SQL,
    "url_robots_filter": _ROBOTS_SQL,
}


# ---- WET extracted-text derivative ----------------------------------------


def q_warc_wet_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET derivative generation (the Common Crawl conversion format: plain
    text extracted from each successful response record): tag-strip the
    HTML body with JVM regexp, collapse whitespace, and emit per-record
    (uri, word count, md5 of the extracted text). 404s are excluded —
    WET files only carry conversions of successful fetches.

    The oracle rebuilds each page's HTML from the generative formula and
    applies the SAME two regexes, so a green hash certifies the parse +
    extraction pipeline byte-for-byte (md5 agrees cross-engine).

    Scale shape: one Arrow mapInPandas parse pass (linear, shared with the
    whole WARC family) then pure whole-stage-codegen regexp projections —
    no shuffle at all after the parse."""
    recs = read_warc(_synth_warc_archives(spark, sf_dir))
    stripped = F.regexp_replace(
        F.col("body").cast("string"), "<[^>]*>", " "
    )
    text = F.trim(F.regexp_replace(stripped, r"\s+", " "))
    return (
        recs.where(
            (F.col("warc_type") == "response") & (F.col("http_status") == 200)
        )
        .select(
            F.col("archive_id").alias("doc_id"),
            F.col("target_uri"),
            F.size(F.split(text, " ")).cast("long").alias("n_words"),
            F.md5(text).alias("text_md5"),
        )
    )


_WET_SQL = f"""
WITH h AS (SELECT doc_id, {_URI_SQL} AS target_uri, {_HTML_SQL} AS html
           FROM documents WHERE doc_id % 17 <> 0),
t AS (SELECT doc_id, target_uri,
             trim(regexp_replace(regexp_replace(html, '<[^>]*>', ' ', 'g'),
                  '\\s+', ' ', 'g')) AS text
      FROM h)
SELECT doc_id, target_uri,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       md5(text) AS text_md5
FROM t
"""

QUERIES["warc_wet_extract"] = q_warc_wet_extract
ORACLES["warc_wet_extract"] = _WET_SQL


# ---- robots.txt parse-from-bytes ------------------------------------------
#
# The robots bodies ENCODE the same per-host rule formula _robots_rules
# broadcasts (k%3==0 -> Disallow /p/; & k%2==0 -> Allow /p/1; k%5==1 ->
# Disallow /), plus a Crawl-delay, a decoy `badbot` group the parser must
# NOT attribute to `*`, comment/blank lines, per-host directive-case
# variation, and a 404 host (k%17==0) that must yield zero rules — so a
# green row certifies parse(build(rules)) == rules against real WARC bytes
# (reference crawl semantics: Nutch fetches robots.txt like any URL and
# parses the payload; SURVEY.md §2.3 crawl family).


def _robots_body(k: int) -> str:
    lc = k % 2 == 1

    def d(name: str) -> str:
        return name.lower() if lc else name

    lines = [f"# robots for www.h{k}.example"]
    lines.append(f"{d('User-agent')}: *")
    lines.append(f"{d('Crawl-delay')}: {1 + k % 7}")
    if k % 3 == 0:
        lines.append(f"{d('Disallow')}: /p/")
        if k % 2 == 0:
            lines.append(f"{d('Allow')}: /p/1")
    if k % 5 == 1:
        lines.append(f"{d('Disallow')}: /")
    lines.append("")
    lines.append(f"{d('User-agent')}: badbot")
    lines.append(f"{d('Disallow')}: /")
    if k % 4 == 0:
        lines.append("")
        lines.append(f"{d('Sitemap')}: http://www.h{k}.example/sitemap.xml")
    return "\n".join(lines) + "\n"


def _synth_robots_archives(spark: SparkSession) -> DataFrame:
    """One WARC archive per outlink host: warcinfo + the robots.txt HTTP
    response (text/plain; status 404 with empty body when k%17==0)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for k in pdf["asset_id"]:
                k = int(k)
                status = 404 if k % 17 == 0 else 200
                body = b"" if status == 404 else _robots_body(k).encode("ascii")
                http = encode_http_response(status, "text/plain", body)
                resp = encode_warc_record(
                    "response",
                    f"robots-{k}",
                    http,
                    "application/http; msgtype=response",
                    target_uri=f"http://www.h{k}.example/robots.txt",
                )
                payloads.append(encode_warcinfo(f"rinfo-{k}") + resp)
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "payload": payloads}
            )

    from giranking_spark.queries.mmq import _spread

    raw = _spread(
        spark.range(LINK_HOSTS).select(
            F.col("id").cast("long").alias("asset_id")
        )
    ).mapInPandas(gen, "asset_id long, payload binary")
    return pack_assets(raw, "asset_id", F.col("payload"), mime="application/warc")


def q_crawl_robots_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse robots.txt rules OUT OF WARC response bytes (not from a rule
    formula): read the archives, keep 200 text/plain responses, split the
    body into lines, strip comments, key each directive, and attribute it
    to the nearest preceding User-agent group with one running window per
    host — the stateful line-grouping robots semantics, expressed as a
    single partitioned window (whole-stage codegen, one shuffle on the
    host key; linear in body bytes at any corpus size). Per-host output:
    group count, star-group disallow/allow counts, crawl delay (-1 when
    absent), sitemap presence."""
    recs = read_warc(_synth_robots_archives(spark))
    txt = recs.filter(
        (F.col("warc_type") == "response") & (F.col("http_status") == 200)
    ).select(
        F.col("archive_id").alias("k"),
        F.col("body").cast("string").alias("txt"),
    )
    lines = txt.select(
        "k", F.posexplode(F.split("txt", "\n")).alias("pos", "line")
    )
    cleaned = F.trim(F.regexp_replace("line", "#.*$", ""))
    parsed = lines.select(
        "k",
        "pos",
        F.lower(F.regexp_extract(cleaned, r"^([A-Za-z-]+)\s*:", 1)).alias(
            "key"
        ),
        F.trim(F.regexp_extract(cleaned, r"^[A-Za-z-]+\s*:(.*)$", 1)).alias(
            "val"
        ),
    ).filter(F.col("key") != "")
    w = (
        Window.partitionBy("k")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grouped = parsed.withColumn(
        "ua",
        F.last(
            F.when(F.col("key") == "user-agent", F.col("val")),
            ignorenulls=True,
        ).over(w),
    )
    star = F.col("ua") == "*"
    agg = grouped.groupBy("k").agg(
        F.countDistinct(
            F.when(F.col("key") == "user-agent", F.col("val"))
        ).cast("long").alias("n_groups"),
        F.sum(
            (star & (F.col("key") == "disallow")).cast("long")
        ).alias("n_disallow_star"),
        F.sum(
            (star & (F.col("key") == "allow")).cast("long")
        ).alias("n_allow_star"),
        F.max(
            F.when(
                star & (F.col("key") == "crawl-delay"),
                F.col("val").cast("long"),
            )
        ).alias("delay"),
        (F.sum((F.col("key") == "sitemap").cast("long")) > 0).alias(
            "has_sitemap"
        ),
    )
    hosts = spark.range(LINK_HOSTS).select(F.col("id").cast("long").alias("k"))
    return hosts.join(agg, "k", "left").select(
        F.concat(F.lit("www.h"), F.col("k"), F.lit(".example")).alias(
            "link_host"
        ),
        F.coalesce("n_groups", F.lit(0)).cast("long").alias("n_groups"),
        F.coalesce("n_disallow_star", F.lit(0)).cast("long").alias(
            "n_disallow_star"
        ),
        F.coalesce("n_allow_star", F.lit(0)).cast("long").alias(
            "n_allow_star"
        ),
        F.coalesce("delay", F.lit(-1)).cast("long").alias("crawl_delay_s"),
        F.coalesce("has_sitemap", F.lit(False)).alias("has_sitemap"),
    )


_ROBOTS_PARSE_SQL = f"""
WITH hosts AS (SELECT range::BIGINT AS k FROM range(0, {LINK_HOSTS}))
SELECT 'www.h' || k || '.example' AS link_host,
       CASE WHEN k % 17 = 0 THEN 0 ELSE 2 END::BIGINT AS n_groups,
       CASE WHEN k % 17 = 0 THEN 0 ELSE
            (CASE WHEN k % 3 = 0 THEN 1 ELSE 0 END
             + CASE WHEN k % 5 = 1 THEN 1 ELSE 0 END) END::BIGINT
           AS n_disallow_star,
       CASE WHEN k % 17 <> 0 AND k % 3 = 0 AND k % 2 = 0 THEN 1 ELSE 0
           END::BIGINT AS n_allow_star,
       CASE WHEN k % 17 = 0 THEN -1 ELSE 1 + k % 7 END::BIGINT
           AS crawl_delay_s,
       (k % 17 <> 0 AND k % 4 = 0) AS has_sitemap
FROM hosts
"""

QUERIES["crawl_robots_parse"] = q_crawl_robots_parse
ORACLES["crawl_robots_parse"] = _ROBOTS_PARSE_SQL


def q_crawl_host_politeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness-aware frontier drain plan: per outlink host, the URL
    count from the extracted link frontier joined with the Crawl-delay
    PARSED OUT OF THE ROBOTS WARC BYTES (q_crawl_robots_parse's path) —
    drain_sec = n_urls × effective delay is the time a single polite
    fetcher needs per host, the number a crawl scheduler shards its fetch
    lists by (Nutch generator politeness semantics). Hosts without a
    usable robots.txt (the 404 k%17 hosts) fall back to a 1 s default.
    The rules side is 50 rows — broadcast; the frontier side aggregates
    before the join, so the shuffle carries one row per host."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.explode(
                F.sequence(F.lit(0), (F.col("doc_id") % 3).cast("int"))
            ).alias("j"),
        )
        .select(
            ((F.col("doc_id") * 7 + F.col("j")) % LINK_HOSTS).alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_urls"))
    )
    delays = q_crawl_robots_parse(spark, sf_dir).select(
        F.regexp_extract("link_host", r"www\.h(\d+)\.example", 1)
        .cast("long")
        .alias("k"),
        F.when(F.col("crawl_delay_s") < 0, F.lit(1))
        .otherwise(F.col("crawl_delay_s"))
        .cast("long")
        .alias("delay_s"),
    )
    return counts.join(F.broadcast(delays), "k").select(
        F.concat(F.lit("www.h"), F.col("k"), F.lit(".example")).alias(
            "link_host"
        ),
        "n_urls",
        F.col("delay_s").alias("effective_delay_s"),
        (F.col("n_urls") * F.col("delay_s")).cast("long").alias("drain_sec"),
    )


_POLITENESS_SQL = f"""
WITH {_LINKS_FROM_FORMULA_SQL.strip()},
counts AS (
    SELECT (doc_id * 7 + j) % {LINK_HOSTS} AS k, count(*)::BIGINT AS n_urls
    FROM links GROUP BY 1
),
delays AS (
    SELECT range::BIGINT AS k,
           CASE WHEN range % 17 = 0 THEN 1 ELSE 1 + range % 7 END::BIGINT
               AS delay_s
    FROM range(0, {LINK_HOSTS})
)
SELECT 'www.h' || c.k || '.example' AS link_host, c.n_urls,
       d.delay_s AS effective_delay_s,
       (c.n_urls * d.delay_s)::BIGINT AS drain_sec
FROM counts c JOIN delays d ON c.k = d.k
"""

QUERIES["crawl_host_politeness"] = q_crawl_host_politeness
ORACLES["crawl_host_politeness"] = _POLITENESS_SQL
