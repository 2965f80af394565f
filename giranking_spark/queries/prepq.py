"""Training-data prep / CDC queries with DuckDB oracles.

Extension surface (not in the reference): document chunking with overlap,
SCD2 validity intervals, MERGE-style upsert reconciliation, and a
data-quality audit report. These are the table-maintenance and corpus-prep
primitives a 100 TB training-data pipeline runs daily.

Timestamp discipline: o_orderdate is TIMESTAMP(MICROS) — interval endpoints
travel as epoch-µs BIGINTs on both sides (Spark ``unix_micros`` vs DuckDB
``epoch_us``), so cross-engine comparison is integer-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from giranking_spark.operators.chunking import (
    CDC_DIVISOR,
    CDC_WINDOW,
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    cdc_chunk_documents,
    chunk_documents,
)
from giranking_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Spark callables


def q_text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(load_table(spark, sf_dir, "documents"))


def q_text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking over documents
    (operators/chunking.cdc_chunk_documents): hash-anchored boundaries that
    survive token insertions/deletions — the edit-robust complement to the
    fixed windows of ``text_chunk`` and the front half of rsync/FastCDC-style
    chunk-level dedup."""
    return cdc_chunk_documents(load_table(spark, sf_dir, "documents"))


def q_rel_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build: each customer's orders become validity intervals
    [valid_from, valid_to) with the newest row open-ended. One shuffle on
    the key (the window), no self-joins — the standard snapshot-to-history
    pattern for CDC feeds."""
    o = load_table(spark, sf_dir, "orders")
    # o_orderdate is TIMESTAMP_NTZ; session TZ is UTC, so the cast is the
    # identity mapping onto epoch-µs (matches DuckDB epoch_us on the NTZ value)
    us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        us.alias("valid_from_us"),
        F.lead(us).over(w).alias("valid_to_us"),
    ).withColumn("is_current", F.col("valid_to_us").isNull())


def q_rel_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style reconciliation: a base snapshot (orders missing every 7th
    key — a stale copy) receives a changeset (every 3rd key, price uplifted
    10%). Full-outer join on the key; changes win, unmatched base rows pass
    through. At scale both sides shuffle on the merge key once; with bucketed
    tables the shuffle disappears entirely."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    base = o.filter(F.col("o_orderkey") % 7 != 0)
    # 10% uplift in exact integer cents (floats at the .005 boundary round
    # differently across engines — money stays integral end to end)
    changes = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.expr("cents * 11 div 10").alias("cents"),
    )
    b = base.alias("b")
    c = changes.alias("c")
    return (
        b.join(c, F.col("b.o_orderkey") == F.col("c.o_orderkey"), "full_outer")
        .select(
            F.coalesce(F.col("c.o_orderkey"), F.col("b.o_orderkey")).alias(
                "o_orderkey"
            ),
            F.coalesce(F.col("c.o_custkey"), F.col("b.o_custkey")).alias(
                "o_custkey"
            ),
            F.coalesce(F.col("c.cents"), F.col("b.cents")).alias("cents"),
            F.col("c.o_orderkey").isNotNull().alias("from_changeset"),
        )
    )


def q_rel_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: a materialized per-customer
    aggregate (built from the base partition) merged with a delta batch's
    partial aggregate must equal the full recompute — which is exactly what
    the oracle runs. The merge is a full-outer join on the group key with
    summed partials: the standard pattern for refreshing a 100 TB rollup
    from a day's delta without rescanning history."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )

    def _agg(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("cents"),
        )

    base = _agg(o.filter(F.col("o_orderkey") % 5 != 0))
    delta = _agg(o.filter(F.col("o_orderkey") % 5 == 0))
    b, d = base.alias("b"), delta.alias("d")
    return (
        b.join(d, F.col("b.o_custkey") == F.col("d.o_custkey"), "full_outer")
        .select(
            F.coalesce(F.col("b.o_custkey"), F.col("d.o_custkey")).alias(
                "o_custkey"
            ),
            (
                F.coalesce(F.col("b.n_orders"), F.lit(0))
                + F.coalesce(F.col("d.n_orders"), F.lit(0))
            ).alias("n_orders"),
            (
                F.coalesce(F.col("b.cents"), F.lit(0))
                + F.coalesce(F.col("d.cents"), F.lit(0))
            ).alias("cents"),
        )
    )


DQ_CHECKS = [
    # (check name, violation predicate over one scan of the named table)
    ("orders_null_custkey", "orders", "o_custkey IS NULL"),
    ("orders_nonpositive_price", "orders", "o_totalprice <= 0"),
    ("lineitem_negative_qty", "lineitem", "l_quantity < 0"),
]


def q_rel_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: one row per check with its violation count.
    Predicate checks are conditional sums sharing one scan per table
    (map-side combinable); referential checks are key-only anti-joins whose
    build side projects a single column. The report is O(checks) rows
    regardless of data volume."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    tables = {"orders": orders, "lineitem": lineitem}

    per_table: dict[str, list] = {}
    for name, tbl, pred in DQ_CHECKS:
        per_table.setdefault(tbl, []).append(
            F.sum(F.when(F.expr(pred), 1).otherwise(0)).cast("bigint").alias(name)
        )
    parts = []
    for tbl, aggs in per_table.items():
        wide = tables[tbl].agg(*aggs)
        for name in [a for (a, t, _) in DQ_CHECKS if t == tbl]:
            parts.append(
                wide.select(F.lit(name).alias("check"), F.col(name).alias("n_bad"))
            )
    # duplicate-key check: count(*) - count(DISTINCT key), one hash agg
    parts.append(
        orders.agg(
            (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
            .cast("bigint")
            .alias("n_bad")
        ).select(F.lit("orders_dup_orderkey").alias("check"), "n_bad")
    )
    # referential check: orders whose customer is missing (key-only anti-join)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orphans = (
        orders.select("o_custkey")
        .join(cust, orders.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_bad"))
        .select(F.lit("orders_orphan_custkey").alias("check"), "n_bad")
    )
    parts.append(orphans)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


FUZZY_MAX_DIST = 2


def q_rel_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage by edit distance with blocking: a probe set of
    corrupted part names (deterministic typo: first character dropped, every
    50th part) is matched back to the catalog via levenshtein ≤ 2. The join
    is BLOCKED on the last name token — invariant under the typo model — so
    candidate generation is an equi-join, never all-pairs; the edit-distance
    filter then runs only inside blocks. At 100 TB the block key caps
    comparisons the same way LSH bands do for near-dup."""
    parts = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("cat_key"),
        F.col("p_name").alias("cat_name"),
        F.regexp_extract(F.col("p_name"), "[^ ]+$", 0).alias("blk"),
    )
    probes = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 50 == 0)
        .select(
            F.col("p_partkey").alias("probe_key"),
            F.expr("substring(p_name, 2)").alias("probe_name"),
            F.regexp_extract(F.col("p_name"), "[^ ]+$", 0).alias("blk"),
        )
    )
    dist = F.levenshtein(F.col("probe_name"), F.col("cat_name"))
    return (
        probes.join(parts, "blk")
        .filter(dist <= FUZZY_MAX_DIST)
        .select(
            "probe_key",
            "cat_key",
            dist.cast("bigint").alias("edit_dist"),
        )
    )


QUERIES = {
    "text_chunk": q_text_chunk,
    "text_cdc_chunks": q_text_cdc_chunks,
    "rel_fuzzy_match": q_rel_fuzzy_match,
    "rel_incremental_agg": q_rel_incremental_agg,
    "rel_scd2": q_rel_scd2,
    "rel_merge_upsert": q_rel_merge_upsert,
    "rel_dq_checks": q_rel_dq_checks,
}

# ---------------------------------------------------------------------------
# oracles

_TOKS_SQL = "list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')"

ORACLES = {
    "text_chunk": (
        f"WITH w AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents), "
        "st AS (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 1, "
        f"{CHUNK_STRIDE})) AS s FROM w WHERE len(toks) >= 1) "
        f"SELECT doc_id, CAST(s // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx, "
        f"CAST(len(toks[s + 1 : s + {CHUNK_TOKENS}]) AS BIGINT) AS n_tokens, "
        f"array_to_string(toks[s + 1 : s + {CHUNK_TOKENS}], ' ') AS chunk_text "
        "FROM st"
    ),
    # boundary flags from the portable 32-bit md5 hash over the same
    # window-token run, running-sum chunk index, md5 over reassembled text
    "text_cdc_chunks": (
        f"WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents), "
        "t AS (SELECT doc_id, toks, s.i AS i, toks[s.i + 1] AS tok "
        "FROM d, unnest(generate_series(0, len(toks) - 1)) AS s(i) "
        "WHERE len(toks) >= 1), "
        f"f AS (SELECT doc_id, i, tok, CASE WHEN i >= {CDC_WINDOW - 1} AND "
        "(('0x' || substr(md5(array_to_string("
        f"toks[(i - {CDC_WINDOW - 2}):(i + 1)], ' ')), 1, 8))::BIGINT) "
        f"% {CDC_DIVISOR} = 0 THEN 1 ELSE 0 END AS flag FROM t), "
        "c AS (SELECT doc_id, i, tok, coalesce(sum(flag) OVER ("
        "PARTITION BY doc_id ORDER BY i "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx "
        "FROM f) "
        "SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, "
        "CAST(count(*) AS BIGINT) AS n_tokens, "
        "md5(string_agg(tok, ' ' ORDER BY i)) AS chunk_hash "
        "FROM c GROUP BY doc_id, chunk_idx"
    ),
    "rel_scd2": (
        "SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS valid_from_us, "
        "lead(epoch_us(o_orderdate)) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate ASC, o_orderkey ASC) AS valid_to_us, "
        "lead(epoch_us(o_orderdate)) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate ASC, o_orderkey ASC) IS NULL AS is_current "
        "FROM orders"
    ),
    "rel_merge_upsert": (
        "WITH o AS (SELECT o_orderkey, o_custkey, "
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders), "
        "base AS (SELECT * FROM o WHERE o_orderkey % 7 <> 0), "
        "changes AS (SELECT o_orderkey, o_custkey, "
        "CAST(cents * 11 // 10 AS BIGINT) AS cents FROM o "
        "WHERE o_orderkey % 3 = 0) "
        "SELECT coalesce(c.o_orderkey, b.o_orderkey) AS o_orderkey, "
        "coalesce(c.o_custkey, b.o_custkey) AS o_custkey, "
        "coalesce(c.cents, b.cents) AS cents, "
        "c.o_orderkey IS NOT NULL AS from_changeset "
        "FROM base b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey"
    ),
    # full recompute on purpose: the incremental base+delta merge must equal
    # the one-shot aggregate exactly (integer partials commute)
    "rel_incremental_agg": (
        "SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders, "
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents "
        "FROM orders GROUP BY o_custkey"
    ),
    "rel_fuzzy_match": (
        "WITH cat AS (SELECT p_partkey AS cat_key, p_name AS cat_name, "
        "regexp_extract(p_name, '[^ ]+$') AS blk FROM part), "
        "probes AS (SELECT p_partkey AS probe_key, p_name[2:] AS probe_name, "
        "regexp_extract(p_name, '[^ ]+$') AS blk FROM part "
        "WHERE p_partkey % 50 = 0) "
        "SELECT p.probe_key, c.cat_key, "
        "CAST(levenshtein(p.probe_name, c.cat_name) AS BIGINT) AS edit_dist "
        "FROM probes p JOIN cat c USING (blk) "
        f"WHERE levenshtein(p.probe_name, c.cat_name) <= {FUZZY_MAX_DIST}"
    ),
    "rel_dq_checks": (
        "SELECT 'orders_null_custkey' AS check, "
        "CAST(count(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT) AS n_bad "
        "FROM orders "
        "UNION ALL SELECT 'orders_nonpositive_price', "
        "CAST(count(CASE WHEN o_totalprice <= 0 THEN 1 END) AS BIGINT) FROM orders "
        "UNION ALL SELECT 'lineitem_negative_qty', "
        "CAST(count(CASE WHEN l_quantity < 0 THEN 1 END) AS BIGINT) FROM lineitem "
        "UNION ALL SELECT 'orders_dup_orderkey', "
        "CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders "
        "UNION ALL SELECT 'orders_orphan_custkey', "
        "CAST(count(*) AS BIGINT) FROM orders "
        "WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)"
    ),
}
