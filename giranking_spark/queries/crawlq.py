"""Crawl-database queries: the production loop AROUND the ranking engine.

The reference scores a webgraph that Apache Nutch maintains (reference:
giraph-nutch/src/main/java/org/apache/giraph/ranking/LinkRank/io/
Nutch2WebpageInputFormat.java:47-211 reads the Nutch webpage store; the
scores flow back into Nutch's generate/fetch/update cycle).  These queries
re-express that surrounding cycle — all public Apache Nutch semantics —
as Spark relational plans with DuckDB oracles:

    crawl_generator_topk   Generator: pick the next fetchlist — per-host cap
                           (politeness) then global topN by score
    crawl_db_update        CrawlDb update: merge fetch outcomes + newly
                           discovered outlinks into the frontier (status
                           transition matrix out)
    crawl_fetch_schedule   fetcher politeness queues: hosts sharded across
                           fetchers, per-queue makespan under 1 req/s/host
    warc_anchor_text       LinkDb inversion with anchor text: per target
                           host, inlink count + dominant anchor
    crawl_revisit_dedup    WARC revisit records (ISO 28500 dedup): first
                           copy per payload digest stays a response, later
                           copies become revisits; bytes saved per host
    crawl_mirror_hosts     mirror-site detection: host pairs sharing many
                           identical payload digests

Everything derives arithmetically from the `documents` table, so every
oracle recomputes the expected output from the generative formula.

Scale posture: Generator/schedule are one hash-partition window per host
plus a TakeOrdered global top-k (no global sort); the CrawlDb merge is a
single full-outer equi-join on url; anchor inversion is JVM regexp then one
partial-agg shuffle on host; revisit/mirror are equi-joins on the payload
digest (dup groups are tiny by construction — never host x host or
doc x doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from giranking_spark.sources.tables import load_table

HOST_CAP = 3        # Generator: max urls per host per fetchlist
TOTAL_K = 100       # Generator: fetchlist size (binds: 37 hosts x cap 3 = 111 eligible)
N_FETCHERS = 8      # schedule: politeness queue shards
MIRROR_MIN = 3      # mirror detection: shared-digest threshold


# ---- shared synthetic frontier (formula-derived from `documents`) ---------

_SCORE_SQL = "round(((doc_id * 2654435761) % 1000003) / 1000003.0, 6)"
_HOST_SQL = "'www.d' || (doc_id % 37) || '.example'"
_URL_SQL = "'http://www.d' || (doc_id % 37) || '.example/page/' || doc_id"
_STATUS_SQL = (
    "CASE doc_id % 5 WHEN 0 THEN 'unfetched' WHEN 1 THEN 'fetched' "
    "WHEN 2 THEN 'gone' WHEN 3 THEN 'redir' ELSE 'retry' END"
)

_FRONTIER_SQL = f"""
SELECT {_URL_SQL} AS url,
       {_HOST_SQL} AS host,
       {_SCORE_SQL} AS score,
       {_STATUS_SQL} AS status,
       doc_id % 4 <> 0 AS due,
       doc_id
FROM documents
"""


def _frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc_id = F.col("doc_id").cast("long")
    return load_table(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("http://www.d"), (doc_id % 37).cast("string"),
            F.lit(".example/page/"), doc_id.cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("www.d"), (doc_id % 37).cast("string"), F.lit(".example")
        ).alias("host"),
        F.round((doc_id * F.lit(2654435761)) % 1000003 / 1000003.0, 6)
        .alias("score"),
        F.element_at(
            F.array(
                F.lit("unfetched"), F.lit("fetched"), F.lit("gone"),
                F.lit("redir"), F.lit("retry"),
            ),
            (doc_id % 5 + 1).cast("int"),
        ).alias("status"),
        (doc_id % 4 != 0).alias("due"),
        doc_id.alias("doc_id"),
    )


# ---- Generator ------------------------------------------------------------

def q_crawl_generator_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nutch Generator semantics (public org.apache.nutch.crawl.Generator):
    from the due, fetchable frontier take at most HOST_CAP urls per host
    (politeness), then the global TOTAL_K best by score.  One window over
    hash(host) + a TakeOrderedAndProject — no global sort of the frontier."""
    fr = _frontier(spark, sf_dir).where(
        F.col("due") & F.col("status").isin("unfetched", "redir", "retry")
    )
    w = Window.partitionBy("host").orderBy(F.desc("score"), F.asc("url"))
    return (
        fr.withColumn("host_rank", F.row_number().over(w))
        .where(F.col("host_rank") <= HOST_CAP)
        .select("url", "host", "score", "host_rank")
        .orderBy(F.desc("score"), F.asc("url"))
        .limit(TOTAL_K)
    )


_GENERATOR_SQL = f"""
WITH frontier AS ({_FRONTIER_SQL}),
eligible AS (
    SELECT url, host, score,
           row_number() OVER (PARTITION BY host
                              ORDER BY score DESC, url ASC) AS host_rank
    FROM frontier
    WHERE due AND status IN ('unfetched', 'redir', 'retry')
)
SELECT url, host, score, host_rank
FROM eligible WHERE host_rank <= {HOST_CAP}
ORDER BY score DESC, url ASC LIMIT {TOTAL_K}
"""


# ---- CrawlDb update -------------------------------------------------------

def q_crawl_db_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nutch CrawlDb update (public org.apache.nutch.crawl.CrawlDb): merge
    fetch outcomes and newly discovered outlinks into the frontier.  Fetch
    success -> 'fetched', permanent failure -> 'gone', unfetched rows keep
    their status, discovered urls enter as 'unfetched'.  Output is the
    status transition matrix.  One full-outer equi-join on url."""
    fr = _frontier(spark, sf_dir)
    fetched = fr.where(F.col("doc_id") % 3 == 0).select(
        F.col("url"),
        F.when(F.col("doc_id") % 7 != 0, F.lit("success"))
        .otherwise(F.lit("notfound"))
        .alias("outcome"),
    )
    doc_id = F.col("doc_id")
    discovered = fr.where(doc_id % 6 == 0).select(
        F.concat(
            F.lit("http://www.x"), (doc_id % 11).cast("string"),
            F.lit(".example/new/"), doc_id.cast("string"),
        ).alias("url"),
        F.lit("discovered").alias("outcome"),
    )
    merged = fr.select("url", "status").join(
        fetched.unionByName(discovered), "url", "full_outer"
    )
    new_status = (
        F.when(F.col("outcome") == "success", F.lit("fetched"))
        .when(F.col("outcome") == "notfound", F.lit("gone"))
        .when(F.col("outcome") == "discovered", F.lit("unfetched"))
        .otherwise(F.col("status"))
    )
    return (
        merged.select(
            F.coalesce(F.col("status"), F.lit("(new)")).alias("old_status"),
            new_status.alias("new_status"),
        )
        .groupBy("old_status", "new_status")
        .agg(F.count(F.lit(1)).alias("n_urls"))
        .orderBy("old_status", "new_status")
    )


_DB_UPDATE_SQL = f"""
WITH frontier AS ({_FRONTIER_SQL}),
fetched AS (
    SELECT url,
           CASE WHEN doc_id % 7 <> 0 THEN 'success' ELSE 'notfound' END
               AS outcome
    FROM frontier WHERE doc_id % 3 = 0
    UNION ALL
    SELECT 'http://www.x' || (doc_id % 11) || '.example/new/' || doc_id,
           'discovered'
    FROM frontier WHERE doc_id % 6 = 0
),
merged AS (
    SELECT coalesce(f.status, '(new)') AS old_status,
           CASE outcome
               WHEN 'success' THEN 'fetched'
               WHEN 'notfound' THEN 'gone'
               WHEN 'discovered' THEN 'unfetched'
               ELSE f.status
           END AS new_status
    FROM frontier f FULL OUTER JOIN fetched USING (url)
)
SELECT old_status, new_status, count(*) AS n_urls
FROM merged GROUP BY old_status, new_status
ORDER BY old_status, new_status
"""


# ---- fetcher politeness schedule ------------------------------------------

def q_crawl_fetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fetcher politeness queues (public Nutch Fetcher queue-per-host
    model): hosts shard across N_FETCHERS byHost, each host serialized at
    1 req/s, so a fetcher's makespan is its deepest host queue.  Output per
    fetcher: hosts, urls, makespan.  One partial agg per host, then a tiny
    N_FETCHERS-row rollup."""
    fr = _frontier(spark, sf_dir).where(
        F.col("due") & (F.col("status") == "unfetched")
    )
    per_host = fr.groupBy(
        ((F.col("doc_id") % 37) % N_FETCHERS).cast("int").alias("fetcher_id"),
        F.col("host"),
    ).agg(F.count(F.lit(1)).alias("n_urls"))
    return (
        per_host.groupBy("fetcher_id")
        .agg(
            F.count(F.lit(1)).alias("n_hosts"),
            F.sum("n_urls").alias("n_urls"),
            (F.max("n_urls") - 1).alias("makespan_sec"),
        )
        .orderBy("fetcher_id")
    )


_SCHEDULE_SQL = f"""
WITH frontier AS ({_FRONTIER_SQL}),
per_host AS (
    SELECT CAST((doc_id % 37) % {N_FETCHERS} AS INT) AS fetcher_id,
           host, count(*) AS n_urls
    FROM frontier
    WHERE due AND status = 'unfetched'
    GROUP BY 1, 2
)
SELECT fetcher_id, count(*) AS n_hosts, sum(n_urls)::BIGINT AS n_urls,
       max(n_urls) - 1 AS makespan_sec
FROM per_host GROUP BY fetcher_id ORDER BY fetcher_id
"""


# ---- revisit dedup + mirror detection -------------------------------------

def _records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl record set with true duplicates: every doc served from its
    primary host; every 5th doc also mirrored on a www.mK host with an
    identical payload.  Digest = md5 of the normalized payload — computed
    by the engine's builtin md5 on BOTH sides, so dedup keys agree."""
    doc_id = F.col("doc_id").cast("long")
    base = load_table(spark, sf_dir, "documents").select(
        doc_id.alias("doc_id"),
        F.regexp_replace(F.lower("text"), "[^a-z ]", "").alias("payload"),
    )
    primary = base.select(
        F.concat(
            F.lit("http://www.d"), (F.col("doc_id") % 37).cast("string"),
            F.lit(".example/page/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("www.d"), (F.col("doc_id") % 37).cast("string"),
            F.lit(".example"),
        ).alias("host"),
        "payload",
    )
    mirror_k = (F.col("doc_id") % 37) % 4  # mirrors track primary hosts,
    # so the same (primary, mirror) pair recurs and pair counts grow with SF
    mirror = base.where(F.col("doc_id") % 5 == 0).select(
        F.concat(
            F.lit("http://www.m"), mirror_k.cast("string"),
            F.lit(".example/copy/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("www.m"), mirror_k.cast("string"), F.lit(".example")
        ).alias("host"),
        "payload",
    )
    return primary.unionByName(mirror).select(
        "url", "host", F.md5(F.col("payload")).alias("digest"),
        F.length("payload").alias("nbytes"),
    )


_RECORDS_SQL = """
WITH base AS (
    SELECT doc_id,
           regexp_replace(lower(text), '[^a-z ]', '', 'g') AS payload
    FROM documents
),
records AS (
    SELECT 'http://www.d' || (doc_id % 37) || '.example/page/' || doc_id
               AS url,
           'www.d' || (doc_id % 37) || '.example' AS host,
           md5(payload) AS digest, length(payload) AS nbytes
    FROM base
    UNION ALL
    SELECT 'http://www.m' || ((doc_id % 37) % 4) || '.example/copy/' || doc_id,
           'www.m' || ((doc_id % 37) % 4) || '.example',
           md5(payload), length(payload)
    FROM base WHERE doc_id % 5 = 0
)
"""


def q_crawl_revisit_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC revisit records (ISO 28500 §6.7.2 response dedup, as produced
    by public crawlers like Heritrix): within each payload digest the first
    copy (by url) stays a full response, later copies are stored as
    revisit records.  Output per host: records kept, revisits, bytes saved.
    One window over hash(digest) — dup groups are 2-3 rows."""
    recs = _records(spark, sf_dir)
    w = Window.partitionBy("digest").orderBy("url")
    return (
        recs.withColumn("rn", F.row_number().over(w))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.sum((F.col("rn") > 1).cast("long")).alias("n_revisits"),
            F.sum(
                F.when(F.col("rn") > 1, F.col("nbytes")).otherwise(F.lit(0))
            ).alias("bytes_saved"),
        )
        .orderBy("host")
    )


_REVISIT_SQL = _RECORDS_SQL + """
SELECT host, count(*) AS n_records,
       sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_revisits,
       sum(CASE WHEN rn > 1 THEN nbytes ELSE 0 END)::BIGINT AS bytes_saved
FROM (
    SELECT host, nbytes,
           row_number() OVER (PARTITION BY digest ORDER BY url) AS rn
    FROM records
)
GROUP BY host ORDER BY host
"""


def q_crawl_mirror_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror-site detection: host pairs sharing >= MIRROR_MIN identical
    payload digests.  The pair join is an equi-join on digest (group sizes
    are the duplicate multiplicity, ~2), never host x host — the shape that
    survives 100 TB."""
    recs = _records(spark, sf_dir).select("host", "digest").distinct()
    left = recs.alias("a")
    right = recs.alias("b")
    pairs = left.join(right, "digest").where(F.col("a.host") < F.col("b.host"))
    return (
        pairs.groupBy(
            F.col("a.host").alias("host_a"), F.col("b.host").alias("host_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_docs"))
        .where(F.col("shared_docs") >= MIRROR_MIN)
        .orderBy("host_a", "host_b")
    )


_MIRROR_SQL = _RECORDS_SQL + f"""
, uniq AS (SELECT DISTINCT host, digest FROM records)
SELECT a.host AS host_a, b.host AS host_b, count(*) AS shared_docs
FROM uniq a JOIN uniq b ON a.digest = b.digest AND a.host < b.host
GROUP BY 1, 2 HAVING count(*) >= {MIRROR_MIN}
ORDER BY host_a, host_b
"""


# ---- LinkDb anchor-text inversion (reads the WARC archives) ---------------

def q_warc_anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nutch LinkDb inversion with anchor text (public
    org.apache.nutch.crawl.LinkDb): invert the outlink graph from parsed
    WARC responses and aggregate, per target host, the inlink count and the
    dominant anchor text (count desc, text asc).  Anchor extraction stays
    JVM-side regexp on the parsed body; the aggregate is one partial-agg
    shuffle on target host."""
    from giranking_spark.functions.urls import url_host
    from giranking_spark.queries.warcq import _synth_warc_archives
    from giranking_spark.sources.warc import read_warc

    recs = read_warc(_synth_warc_archives(spark, sf_dir))
    body = F.col("body").cast("string")
    tags = (
        recs.where(F.col("warc_type") == "response")
        .select(
            F.explode(
                F.regexp_extract_all(
                    body, F.lit('<a href="([^"]+)">[^<]*</a>'), 0
                )
            ).alias("tag")
        )
        .select(
            url_host(
                F.regexp_extract(F.col("tag"), '<a href="([^"]+)">', 1)
            ).alias("link_host"),
            F.regexp_extract(F.col("tag"), ">([^<]*)</a>", 1).alias("anchor"),
        )
    )
    per_anchor = tags.groupBy("link_host", "anchor").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("link_host").orderBy(F.desc("n"), F.asc("anchor"))
    return (
        per_anchor.withColumn("rn", F.row_number().over(w))
        .groupBy("link_host")
        .agg(
            F.sum("n").alias("n_inlinks"),
            F.count(F.lit(1)).alias("anchor_kinds"),
            F.max(F.when(F.col("rn") == 1, F.col("anchor"))).alias(
                "anchor_top"
            ),
        )
        .orderBy("link_host")
    )


# Oracle mirrors the WARC generative formula (warcq._page_html): doc_id
# emits links j = 0 .. doc_id%3 to host h{(doc_id*7+j)%50} with anchor 'l'||j.
_ANCHOR_SQL = """
WITH links AS (
    SELECT 'www.h' || ((doc_id * 7 + j) % 50) || '.example' AS link_host,
           'l' || j AS anchor
    FROM documents,
         (SELECT 0 AS j UNION ALL SELECT 1 UNION ALL SELECT 2) js
    WHERE j <= doc_id % 3
),
per_anchor AS (
    SELECT link_host, anchor, count(*) AS n
    FROM links GROUP BY 1, 2
)
SELECT link_host, sum(n)::BIGINT AS n_inlinks, count(*) AS anchor_kinds,
       max(CASE WHEN rn = 1 THEN anchor END) AS anchor_top
FROM (
    SELECT *, row_number() OVER (PARTITION BY link_host
                                 ORDER BY n DESC, anchor ASC) AS rn
    FROM per_anchor
)
GROUP BY link_host ORDER BY link_host
"""


QUERIES = {
    "crawl_generator_topk": q_crawl_generator_topk,
    "crawl_db_update": q_crawl_db_update,
    "crawl_fetch_schedule": q_crawl_fetch_schedule,
    "crawl_revisit_dedup": q_crawl_revisit_dedup,
    "crawl_mirror_hosts": q_crawl_mirror_hosts,
    "warc_anchor_text": q_warc_anchor_text,
}

ORACLES = {
    "crawl_generator_topk": _GENERATOR_SQL,
    "crawl_db_update": _DB_UPDATE_SQL,
    "crawl_fetch_schedule": _SCHEDULE_SQL,
    "crawl_revisit_dedup": _REVISIT_SQL,
    "crawl_mirror_hosts": _MIRROR_SQL,
    "warc_anchor_text": _ANCHOR_SQL,
}


# ---- adaptive re-fetch scheduling -----------------------------------------

MIN_INTERVAL = 3600          # 1 h floor
MAX_INTERVAL = 604800        # 7 d ceiling


def q_crawl_adaptive_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive re-fetch interval update (public
    org.apache.nutch.crawl.AdaptiveFetchSchedule): pages seen modified
    shrink their re-fetch interval by 20%, unmodified pages grow it by 20%,
    clamped to [1h, 7d].  floor() keeps the arithmetic integral so both
    engines agree bit-for-bit.  Output: the interval histogram after one
    update sweep — the signal a crawl operator watches."""
    doc_id = F.col("doc_id").cast("long")
    fr = load_table(spark, sf_dir, "documents").select(
        doc_id.alias("doc_id"),
        (F.lit(3600) * (1 + doc_id % 24)).alias("interval_sec"),
    )
    fetched = fr.where(F.col("doc_id") % 2 == 0)
    modified = F.col("doc_id") % 3 == 0
    new_iv = F.when(
        modified, F.floor(F.col("interval_sec") * 4 / F.lit(5.0))
    ).otherwise(F.floor(F.col("interval_sec") * 6 / F.lit(5.0)))
    clamped = F.greatest(
        F.lit(MIN_INTERVAL), F.least(F.lit(MAX_INTERVAL), new_iv)
    ).cast("long")
    return (
        fetched.select(clamped.alias("new_interval_sec"))
        .groupBy("new_interval_sec")
        .agg(F.count(F.lit(1)).alias("n_urls"))
        .orderBy("new_interval_sec")
    )


_ADAPTIVE_SQL = f"""
WITH fetched AS (
    SELECT doc_id, 3600 * (1 + doc_id % 24) AS interval_sec
    FROM documents WHERE doc_id % 2 = 0
),
updated AS (
    SELECT greatest({MIN_INTERVAL}, least({MAX_INTERVAL},
        CASE WHEN doc_id % 3 = 0
             THEN floor(interval_sec * 4 / 5.0)
             ELSE floor(interval_sec * 6 / 5.0) END))::BIGINT
        AS new_interval_sec
    FROM fetched
)
SELECT new_interval_sec, count(*) AS n_urls
FROM updated GROUP BY new_interval_sec ORDER BY new_interval_sec
"""


# ---- sitemap build + parse roundtrip --------------------------------------

def q_src_sitemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap protocol roundtrip (public sitemaps.org XML schema, consumed
    by Nutch's sitemap plugin): per host, BUILD the sitemap.xml from its
    pages (sorted <url> entries with loc/lastmod/priority), then PARSE it
    back with JVM regexp and aggregate.  The oracle recomputes the expected
    aggregate straight from the generative formula, certifying
    parse(build(pages)) == pages.  Build is one collect-sort-concat agg per
    host; parse is explode + regexp — all whole-stage codegen."""
    doc_id = F.col("doc_id").cast("long")
    pages = load_table(spark, sf_dir, "documents").select(
        doc_id.alias("doc_id"),
        F.concat(
            F.lit("www.d"), (doc_id % 37).cast("string"), F.lit(".example")
        ).alias("host"),
        F.concat(
            F.lit("http://www.d"), (doc_id % 37).cast("string"),
            F.lit(".example/page/"), doc_id.cast("string"),
        ).alias("loc"),
        F.concat(
            F.lit("2026-"),
            F.lpad((1 + doc_id % 12).cast("string"), 2, "0"),
            F.lit("-"),
            F.lpad((1 + doc_id % 28).cast("string"), 2, "0"),
        ).alias("lastmod"),
        F.round((doc_id % 10) / 10.0, 1).alias("priority"),
    )
    entry = F.concat(
        F.lit("<url><loc>"), F.col("loc"),
        F.lit("</loc><lastmod>"), F.col("lastmod"),
        F.lit("</lastmod><priority>"),
        F.format_number(F.col("priority"), 1),
        F.lit("</priority></url>"),
    )
    sitemaps = pages.groupBy("host").agg(
        F.concat(
            F.lit('<?xml version="1.0"?><urlset>'),
            F.concat_ws("", F.array_sort(F.collect_list(entry))),
            F.lit("</urlset>"),
        ).alias("xml")
    )
    parsed = sitemaps.select(
        "host",
        F.explode(
            F.regexp_extract_all(
                F.col("xml"), F.lit("<url>(.*?)</url>"), 1
            )
        ).alias("e"),
    ).select(
        "host",
        F.regexp_extract("e", "<lastmod>([^<]+)</lastmod>", 1).alias(
            "lastmod"
        ),
        F.regexp_extract("e", "<priority>([^<]+)</priority>", 1)
        .cast("double")
        .alias("priority"),
    )
    return (
        parsed.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.round(F.sum("priority"), 1).alias("priority_sum"),
            F.sum((F.col("lastmod") >= "2026-07").cast("long")).alias(
                "n_recent"
            ),
        )
        .orderBy("host")
    )


_SITEMAP_SQL = """
WITH pages AS (
    SELECT 'www.d' || (doc_id % 37) || '.example' AS host,
           '2026-' || lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0') ||
           '-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') AS lastmod,
           round((doc_id % 10) / 10.0, 1) AS priority
    FROM documents
)
SELECT host, count(*) AS n_urls,
       round(sum(priority), 1) AS priority_sum,
       sum(CASE WHEN lastmod >= '2026-07' THEN 1 ELSE 0 END)::BIGINT
           AS n_recent
FROM pages GROUP BY host ORDER BY host
"""


QUERIES.update({
    "crawl_adaptive_refresh": q_crawl_adaptive_refresh,
    "src_sitemap": q_src_sitemap,
})

ORACLES.update({
    "crawl_adaptive_refresh": _ADAPTIVE_SQL,
    "src_sitemap": _SITEMAP_SQL,
})


# ---- OPIC importance (the score LinkRank replaces inside Nutch) -----------


def q_crawl_opic_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPIC batch importance (operators/opic.py) over the fixture webgraph —
    the public Nutch scoring-opic semantics; the oracle unrolls the fixed
    step count cash-distribution for cash-distribution."""
    from giranking_spark.operators.opic import opic_scores
    from giranking_spark.sources.tables import derive_edges

    return opic_scores(derive_edges(spark, sf_dir))


def _opic_sql(iters: int) -> str:
    """Unrolled batch OPIC mirroring operators/opic.py step for step:
    distribute cash/outdeg along edges, dangling cash uniformly, hist
    accumulates the distributed cash.  MATERIALIZED CTEs against
    multiplicative re-execution (same rationale as the other unrolled
    ranking oracles)."""
    from giranking_spark.queries.graph import EDGES_SQL

    parts = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        "verts AS MATERIALIZED (SELECT id FROM "
        "(SELECT src AS id FROM edges UNION SELECT dst FROM edges))",
        "nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM verts)",
        "od AS MATERIALIZED (SELECT v.id, coalesce(o.d, 0) AS outdeg "
        "FROM verts v LEFT JOIN (SELECT src AS id, count(*) AS d "
        "FROM edges GROUP BY src) o USING (id))",
        "s0 AS MATERIALIZED (SELECT od.id, od.outdeg, 1.0 / nn.n AS cash, "
        "0.0 AS hist FROM od, nn)",
    ]
    prev = "s0"
    for i in range(1, iters + 1):
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT v.id, v.outdeg, "
            "coalesce(x.s, 0.0) + d.dang / nn.n AS cash, "
            "v.hist + v.cash AS hist "
            f"FROM {prev} v LEFT JOIN (SELECT e.dst AS id, "
            "sum(v2.cash / v2.outdeg) AS s FROM edges e "
            f"JOIN {prev} v2 ON e.src = v2.id GROUP BY e.dst) x "
            "ON v.id = x.id "
            "CROSS JOIN (SELECT coalesce(sum(cash), 0.0) AS dang "
            f"FROM {prev} WHERE outdeg = 0) d CROSS JOIN nn)"
        )
        prev = f"s{i}"
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT id, round(hist + cash, 6) AS opic FROM {prev}"
    )


QUERIES["crawl_opic_scores"] = q_crawl_opic_scores
from giranking_spark.operators.opic import OPIC_ITERATIONS  # noqa: E402

ORACLES["crawl_opic_scores"] = _opic_sql(OPIC_ITERATIONS)


# ---- sitemap-driven frontier discovery -------------------------------------

def q_crawl_sitemap_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier discovery from sitemaps: PARSE the per-host sitemap.xml
    (the same build+parse path q_src_sitemap certifies), anti-join the
    extracted <loc> URLs against the crawl db's already-fetched set
    (doc_id%2==0, crawl_fetch_schedule's fetched convention) and report
    per-host discovery counts — the Nutch inject/generate step that turns
    sitemaps into new frontier entries. The diff is a string-keyed
    LEFT ANTI join; both sides aggregate before anything data-sized
    moves."""
    doc_id = F.col("doc_id").cast("long")
    docs = load_table(spark, sf_dir, "documents").select(
        doc_id.alias("doc_id"),
        F.concat(
            F.lit("www.d"), (doc_id % 37).cast("string"), F.lit(".example")
        ).alias("host"),
        F.concat(
            F.lit("http://www.d"), (doc_id % 37).cast("string"),
            F.lit(".example/page/"), doc_id.cast("string"),
        ).alias("loc"),
    )
    entry = F.concat(F.lit("<url><loc>"), F.col("loc"), F.lit("</loc></url>"))
    sitemaps = docs.groupBy("host").agg(
        F.concat(
            F.lit('<?xml version="1.0"?><urlset>'),
            F.concat_ws("", F.array_sort(F.collect_list(entry))),
            F.lit("</urlset>"),
        ).alias("xml")
    )
    parsed = sitemaps.select(
        "host",
        F.explode(
            F.regexp_extract_all(
                F.col("xml"), F.lit("<loc>([^<]+)</loc>"), 1
            )
        ).alias("loc"),
    )
    # frontier diff keyed on (host, loc) explicitly: loc strings happen to
    # be globally unique (doc_id embedded), but the politeness/frontier
    # contract is per-host, so the key says so rather than relying on a
    # formula accident that a future loc change could silently break
    known = docs.filter(F.col("doc_id") % 2 == 0).select("host", "loc")
    new = parsed.join(known, ["host", "loc"], "left_anti")
    return (
        parsed.groupBy("host")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sitemap"))
        .join(
            new.groupBy("host").agg(
                F.count(F.lit(1)).cast("long").alias("n_new")
            ),
            "host",
            "left",
        )
        .select(
            "host",
            "n_sitemap",
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
            (F.col("n_sitemap") - F.coalesce("n_new", F.lit(0)))
            .cast("long")
            .alias("n_known"),
        )
    )


_SITEMAP_DIFF_SQL = """
SELECT 'www.d' || (doc_id % 37) || '.example' AS host,
       count(*)::BIGINT AS n_sitemap,
       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
       CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_known
FROM documents GROUP BY 1
"""

QUERIES["crawl_sitemap_diff"] = q_crawl_sitemap_diff
ORACLES["crawl_sitemap_diff"] = _SITEMAP_DIFF_SQL
