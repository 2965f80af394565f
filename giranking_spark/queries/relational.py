"""General relational query surface + events (windowed/sessionized) queries.

The reference has no SQL layer — Spark provides the general surface for free
(SURVEY.md §2.10); these queries demonstrate it end-to-end against the oracle:
hash aggregation, broadcast joins, sort/limit, window functions, and the
batch equivalents of the streaming operators (tumbling windows, session
windows — giranking_spark/streaming reuses the same logic via readStream).

Timestamps are exported as epoch seconds (BIGINT) on both sides — Spark's
session timezone is data-dependent, epoch is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from giranking_spark.sources.tables import load_table


def q_rel_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: hash agg with partial aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 6
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_rel_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-join + agg + top-k: revenue per customer via orders,
    nation name attached (small dims broadcast)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        o.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 6).alias("revenue"))
    )
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(rev, c.c_custkey == rev.o_custkey)
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(25)
    )


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(MICROS) with isAdjustedToUTC=false,
    which Spark reads as TIMESTAMP_NTZ. The session timezone is pinned to
    UTC (session.py), so casting to TIMESTAMP interprets the naive value as
    UTC — exactly how DuckDB's epoch()/epoch_us() treat it. Exposes epoch
    microseconds (``ts_us``, BIGINT) and floored epoch seconds (``t``)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    ).withColumn("t", F.expr("ts_us div 1000000"))


def q_events_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window per event_type (batch form of the streaming
    windowed aggregation in giranking_spark/streaming, which uses F.window
    over proper timestamps)."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(
            (F.expr("ts_us div 3600000000") * 3600).alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) per user via lag + running sum —
    the classic window-function formulation; returns per-session stats."""
    ev = load_events(spark, sf_dir).select("user_id", "t", "value")
    w = Window.partitionBy("user_id").orderBy("t", "value")
    gap = 30 * 60
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            (F.col("t") - F.lag("t", 1).over(w)) > gap, F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "sess_id",
        F.sum(
            F.when(F.lag("t", 1).over(w).isNull(), F.lit(1)).otherwise(F.col("new_sess"))
        ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        flagged.groupBy("user_id", "sess_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("t").alias("sess_start"),
            (F.max("t") - F.min("t")).alias("duration_s"),
        )
    )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal-column plumbing demo: documents' text as an opaque binary
    payload column + typed metadata (byte length, content fingerprint). The
    heavy decode path lives in operators/multimodal.py; this query verifies
    the schema/roundtrip plumbing is oracle-exact."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.substring(F.md5(F.col("text")), 1, 16).alias("content_fp"),
        F.lit("text/plain").alias("mime"),
    )


def q_rel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregates via rollup (SURVEY.md §2.5 'grouping sets /
    rollup: built into Spark') — subtotal rows carry NULL group keys."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def q_rel_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped shipping-priority query: segment-filtered customers
    ⋈ orders ⋈ lineitem, revenue per order, top-10. The segment filter
    pushes to the customer scan; the filtered customer side broadcasts;
    orders⋈lineitem is the one big (equi-key) join. Ordering and the LIMIT
    cut happen on the ROUNDED revenue with an orderkey tiebreak, so the
    boundary is engine-stable."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
        # the ONLY registry query whose natural output is a temporal column;
        # emit it as a canonical date STRING — raw timestamps hash
        # differently across engines (pandas ns vs DuckDB µs epoch units),
        # and no driver-verified key has ever exercised a temporal dtype
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_rel_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped local-supplier-volume query: the full 6-table join
    (customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation ⋈ region) with the
    same-nation customer/supplier constraint, revenue per nation. All
    dimension sides broadcast; lineitem never shuffles for them."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    ).select("r_regionkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(c),
            (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
    )


def q_rel_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full grouping-set lattice via cube (completes the rollup surface:
    cube also emits the per-linestatus-only subtotals rollup omits). One
    expanded hash aggregate — Spark plans cube as a single shuffle over the
    grouping-id-expanded rows, not one pass per grouping set."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


def q_rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube specialize):
    ((returnflag, linestatus), (returnflag), ()) with grouping_id to
    disambiguate subtotal NULLs from data NULLs. Planned like cube — a
    single expanded hash aggregate, one shuffle."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "__li_gsets"
    )
    return spark.sql(
        "SELECT l_returnflag, l_linestatus, "
        "CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid, "
        "round(sum(l_quantity), 6) AS sum_qty, count(*) AS n "
        "FROM __li_gsets GROUP BY GROUPING SETS "
        "((l_returnflag, l_linestatus), (l_returnflag), ())"
    )


def q_rel_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations demo (SURVEY.md §2.10): nation keys having customers
    vs suppliers — intersect / except / union all tagged by provenance."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    )
    both = c.intersect(s).withColumn("side", F.lit("both"))
    conly = c.distinct().exceptAll(s.distinct()).withColumn("side", F.lit("cust_only"))
    sonly = s.distinct().exceptAll(c.distinct()).withColumn("side", F.lit("supp_only"))
    return both.unionByName(conly).unionByName(sonly)


def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar-function surface (SURVEY.md §2.10 'free from Spark'):
    parse the events props payload and aggregate on the extracted field."""
    ev = load_events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select(k.alias("k"), "value")
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def q_rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot surface (SURVEY.md §2.10 'free from Spark'): quantity totals per
    return flag pivoted on line status — compiles to one hash aggregate with
    conditional sums (map-side partial), not a self-join per column."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 6))
    )
    return p.select(
        "l_returnflag", F.col("F").alias("qty_f"), F.col("O").alias("qty_o")
    )


def q_events_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function surface (SURVEY.md §2.10): calendar parts extracted
    from event time (UTC session tz on both engines), aggregated per day."""
    ev = load_events(spark, sf_dir)
    t = F.timestamp_seconds(F.col("t"))
    return (
        ev.select(
            F.year(t).alias("y"),
            F.month(t).alias("m"),
            F.dayofmonth(t).alias("d"),
            F.dayofweek(t).alias("dow"),  # 1 = Sunday, matching DuckDB dow+1
            "value",
        )
        .groupBy("y", "m", "d", "dow")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


#: columns profiled by rel_profile — orders plus a deterministic
#: synthetic-null column (the fixture has no real nulls; the derived
#: clerk_note exercises the null-counting path honestly, mirroring the
#: synthetic-PII precedent in pipelineq)
PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
    "clerk_note",
]


def q_rel_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiler (operators/profiling.py): null counts,
    distinct cardinalities, min/max per column — the ingest-health check a
    pipeline runs before anything else."""
    from giranking_spark.operators.profiling import profile_columns

    # spread the single-split fixture scan to the shuffle width: the
    # distinct-expanded aggregate is the heavy stage and must not run at the
    # scan's parallelism (same rationale as simq._embeddings)
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    o = (
        load_table(spark, sf_dir, "orders")
        .repartition(n)
        .withColumn(
            "clerk_note",
            F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
                F.col("o_orderstatus")
            ),
        )
    )
    return profile_columns(o, PROFILE_COLS)


def _profile_oracle() -> str:
    parts = [
        f"SELECT '{c}' AS col_name, "
        f"(count(*) - count({c}))::BIGINT AS n_nulls, "
        f"count(DISTINCT {c})::BIGINT AS n_distinct, "
        f"min({c})::VARCHAR AS min_val, max({c})::VARCHAR AS max_val FROM t"
        for c in PROFILE_COLS
    ]
    return (
        "WITH t AS (SELECT *, CASE WHEN o_orderkey % 7 = 0 THEN NULL "
        "ELSE o_orderstatus END AS clerk_note FROM orders) "
        + " UNION ALL ".join(parts)
    )


QUERIES = {
    "rel_profile": q_rel_profile,
    "events_by_day": q_events_by_day,
    "rel_pivot": q_rel_pivot,
    "rel_pricing_summary": q_rel_pricing_summary,
    "rel_rollup": q_rel_rollup,
    "rel_cube": q_rel_cube,
    "rel_grouping_sets": q_rel_grouping_sets,
    "rel_shipping_priority": q_rel_shipping_priority,
    "rel_region_revenue": q_rel_region_revenue,
    "rel_setops": q_rel_setops,
    "events_json_extract": q_events_json_extract,
    "rel_top_customers": q_rel_top_customers,
    "events_window_agg": q_events_window_agg,
    "events_sessionize": q_events_sessionize,
    "multimodal_meta": q_multimodal_meta,
}

ORACLES = {
    "rel_profile": _profile_oracle(),
    "events_by_day": (
        "WITH e AS (SELECT to_timestamp(epoch(ts)::BIGINT) AS t, value FROM events) "
        "SELECT year(t)::INT AS y, month(t)::INT AS m, day(t)::INT AS d, "
        "(dayofweek(t) + 1)::INT AS dow, count(*) AS n, "
        "round(sum(value), 6) AS sum_value "
        "FROM e GROUP BY 1, 2, 3, 4"
    ),
    "rel_pivot": (
        "SELECT l_returnflag, "
        "round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 6) AS qty_f, "
        "round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 6) AS qty_o "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "rel_rollup": (
        "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 6) AS sum_qty, "
        "count(*) AS n FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"
    ),
    "rel_cube": (
        "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 6) AS sum_qty, "
        "count(*) AS n FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"
    ),
    "rel_grouping_sets": (
        "SELECT l_returnflag, l_linestatus, "
        "(grouping(l_returnflag) * 2 + grouping(l_linestatus))::BIGINT AS gid, "
        "round(sum(l_quantity), 6) AS sum_qty, count(*) AS n FROM lineitem "
        "GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())"
    ),
    "rel_shipping_priority": (
        "SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, "
        "o_orderpriority, "
        "round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue "
        "FROM customer, orders, lineitem "
        "WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey "
        "AND l_orderkey = o_orderkey "
        "AND o_orderdate < TIMESTAMP '1998-01-01' "
        "AND l_shipdate > TIMESTAMP '1998-01-01' "
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
        "ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"
    ),
    "rel_region_revenue": (
        "SELECT n_name, "
        "round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue "
        "FROM customer, orders, lineitem, supplier, nation, region "
        "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
        "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
        "AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey "
        "AND r_name = 'ASIA' "
        "AND o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1998-01-01' "
        "GROUP BY n_name"
    ),
    "rel_setops": (
        "WITH c AS (SELECT DISTINCT c_nationkey AS nk FROM customer), "
        "s AS (SELECT DISTINCT s_nationkey AS nk FROM supplier) "
        "SELECT nk, 'both' AS side FROM (SELECT nk FROM c INTERSECT SELECT nk FROM s) "
        "UNION ALL SELECT nk, 'cust_only' FROM (SELECT nk FROM c EXCEPT SELECT nk FROM s) "
        "UNION ALL SELECT nk, 'supp_only' FROM (SELECT nk FROM s EXCEPT SELECT nk FROM c)"
    ),
    "events_json_extract": (
        "SELECT (json_extract(props, '$.k')::BIGINT) % 10 AS k_bucket, "
        "count(*) AS n, round(sum(value), 6) AS sum_value "
        "FROM events GROUP BY 1"
    ),
    "rel_pricing_summary": (
        "SELECT l_returnflag, l_linestatus, "
        "round(sum(l_quantity), 6) AS sum_qty, "
        "round(sum(l_extendedprice), 6) AS sum_base_price, "
        "round(sum(l_extendedprice * (1.0 - l_discount)), 6) AS sum_disc_price, "
        "round(avg(l_quantity), 6) AS avg_qty, "
        "count(*) AS count_order "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
    "rel_top_customers": (
        "WITH rev AS (SELECT o_custkey, round(sum(o_totalprice), 6) AS revenue "
        "FROM orders GROUP BY o_custkey) "
        "SELECT c_custkey, c_name, n_name, revenue "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "JOIN rev ON c_custkey = o_custkey "
        "ORDER BY revenue DESC, c_custkey ASC LIMIT 25"
    ),
    "events_window_agg": (
        "SELECT epoch(date_trunc('hour', ts))::BIGINT AS window_start, event_type, "
        "count(*) AS n_events, round(sum(value), 6) AS sum_value "
        "FROM events GROUP BY 1, 2"
    ),  # date_trunc yields whole seconds, so epoch() is exact here
    "events_sessionize": (
        "WITH ev AS (SELECT user_id, floor(epoch(ts))::BIGINT AS t, value FROM events), "
        "flagged AS (SELECT user_id, t, value, "
        "CASE WHEN lag(t) OVER w IS NULL THEN 1 "
        "WHEN t - lag(t) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess "
        "FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t, value)), "
        "sess AS (SELECT user_id, t, (sum(new_sess) OVER "
        "(PARTITION BY user_id ORDER BY t, value ROWS UNBOUNDED PRECEDING))::BIGINT AS sess_id "
        "FROM flagged) "
        "SELECT user_id, sess_id, count(*) AS n_events, min(t) AS sess_start, "
        "max(t) - min(t) AS duration_s "
        "FROM sess GROUP BY user_id, sess_id"
    ),
    "multimodal_meta": (
        "SELECT doc_id, octet_length(encode(text)) AS n_bytes, "
        "substr(md5(text), 1, 16) AS content_fp, "
        "'text/plain' AS mime FROM documents"
    ),
}


# --- SQL-surface completeness batch (round 3): null-safe join, multiset
# set-ops, rank-family window functions ------------------------------------


def q_rel_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (Spark `<=>` / SQL IS NOT DISTINCT FROM):
    nation keys masked to NULL on both sides (every 7th customer, every 5th
    supplier) still pair up — the semantics UPSERT/dedup pipelines need for
    nullable business keys. Still a hash-joinable equi-join (null-safe keys
    hash like any other); (nk, n_pairs) per surviving key."""
    c = load_table(spark, sf_dir, "customer").select(
        F.when(F.col("c_custkey") % 7 == 0, None)
        .otherwise(F.col("c_nationkey"))
        .alias("nk")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.when(F.col("s_suppkey") % 5 == 0, None)
        .otherwise(F.col("s_nationkey"))
        .alias("snk")
    )
    return (
        c.join(s, F.col("nk").eqNullSafe(F.col("snk")))
        .groupBy("nk")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


def q_rel_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (ALL) set-operation surface: INTERSECT ALL keeps duplicate
    multiplicity min(l,r), EXCEPT ALL subtracts it — semantics DISTINCT-based
    set ops silently lose. Nation-key multisets of customers vs suppliers,
    (nk, op, n) per op."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    )
    both = c.intersectAll(s).withColumn("op", F.lit("intersect_all"))
    cminus = c.exceptAll(s).withColumn("op", F.lit("except_all"))
    return (
        both.unionByName(cminus)
        .groupBy("nk", "op")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def q_events_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist window surface (SURVEY §2.10), partitioned
    per event_type (parallel across types — no global window): the standard
    score-normalization used to compare values across heterogeneous event
    streams. Both functions are rank-based, so ties produce identical
    results in every engine."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(F.asc("value"), F.asc("event_id"))
    return ev.select(
        "event_id",
        "event_type",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


QUERIES["rel_nullsafe_join"] = q_rel_nullsafe_join
QUERIES["rel_setops_all"] = q_rel_setops_all
QUERIES["events_percent_rank"] = q_events_percent_rank

ORACLES["rel_nullsafe_join"] = (
    "WITH c AS (SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL "
    "ELSE c_nationkey END AS nk FROM customer), "
    "s AS (SELECT CASE WHEN s_suppkey % 5 = 0 THEN NULL "
    "ELSE s_nationkey END AS snk FROM supplier) "
    "SELECT nk, CAST(count(*) AS BIGINT) AS n_pairs "
    "FROM c JOIN s ON nk IS NOT DISTINCT FROM snk GROUP BY nk"
)

ORACLES["rel_setops_all"] = (
    "WITH c AS (SELECT c_nationkey AS nk FROM customer), "
    "s AS (SELECT s_nationkey AS nk FROM supplier), "
    "ia AS (SELECT nk FROM c INTERSECT ALL SELECT nk FROM s), "
    "ea AS (SELECT nk FROM c EXCEPT ALL SELECT nk FROM s) "
    "SELECT nk, 'intersect_all' AS op, CAST(count(*) AS BIGINT) AS n "
    "FROM ia GROUP BY nk "
    "UNION ALL SELECT nk, 'except_all' AS op, CAST(count(*) AS BIGINT) AS n "
    "FROM ea GROUP BY nk"
)

ORACLES["events_percent_rank"] = (
    "SELECT event_id, event_type, "
    "round(percent_rank() OVER "
    "(PARTITION BY event_type ORDER BY value ASC, event_id ASC), 6) AS pr, "
    "round(cume_dist() OVER "
    "(PARTITION BY event_type ORDER BY value ASC, event_id ASC), 6) AS cd "
    "FROM events"
)


def q_events_type_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface (SURVEY §2.10): per-user sorted distinct
    event-type array (collect_set → array_sort), re-exploded to
    (user_id, pos, event_type) scalars — arrays never cross the
    engine-comparison boundary (numpy vs list stringification differs), the
    exploded form is exact. One groupBy shuffle; the per-user array is
    bounded by the event-type vocabulary."""
    ev = load_events(spark, sf_dir)
    arr = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("types")
    )
    return arr.select(
        "user_id", F.posexplode("types").alias("pos", "event_type")
    ).select("user_id", F.col("pos").cast("long").alias("pos"), "event_type")


def q_events_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function surface (SURVEY §2.10): ISO week/quarter/day-of-year
    extraction + day arithmetic against a fixed epoch date, aggregated per
    (quarter, week) — the calendar bucketing layer every time-series rollup
    sits on."""
    ev = load_events(spark, sf_dir)
    t = F.timestamp_seconds(F.col("t"))
    return (
        ev.select(
            F.quarter(t).cast("long").alias("q"),
            F.weekofyear(t).cast("long").alias("iso_week"),
            F.dayofyear(t).cast("long").alias("doy"),
            F.datediff(F.to_date(t), F.lit("2024-01-01").cast("date"))
            .cast("long")
            .alias("days_since"),
            "value",
        )
        .groupBy("q", "iso_week")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("doy").cast("long").alias("min_doy"),
            F.max("days_since").cast("long").alias("max_days_since"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


QUERIES["events_type_array"] = q_events_type_array
QUERIES["events_date_parts"] = q_events_date_parts

ORACLES["events_type_array"] = (
    "WITH a AS (SELECT user_id, list_sort(list(DISTINCT event_type)) AS types "
    "FROM events GROUP BY user_id) "
    "SELECT user_id, CAST(i - 1 AS BIGINT) AS pos, types[i] AS event_type "
    "FROM a, unnest(generate_series(1, len(types))) AS t(i)"
)

ORACLES["events_date_parts"] = (
    "WITH e AS (SELECT to_timestamp(epoch(ts)::BIGINT) AS t, value FROM events), "
    "p AS (SELECT CAST(quarter(t) AS BIGINT) AS q, "
    "CAST(weekofyear(t) AS BIGINT) AS iso_week, "
    "CAST(dayofyear(t) AS BIGINT) AS doy, "
    "CAST(date_diff('day', DATE '2024-01-01', t::DATE) AS BIGINT) AS days_since, "
    "value FROM e) "
    "SELECT q, iso_week, CAST(count(*) AS BIGINT) AS n, "
    "CAST(min(doy) AS BIGINT) AS min_doy, "
    "CAST(max(days_since) AS BIGINT) AS max_days_since, "
    "round(sum(value), 6) AS sum_value "
    "FROM p GROUP BY q, iso_week"
)


def q_rel_sql_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure SQL-text front end: the same engine surface through
    ``spark.sql`` over registered views — ANSI SQL in, the identical
    Catalyst logical plan out, proving the DataFrame and SQL entry points
    are one engine (a reference user can port queries verbatim).  View
    names are prefixed to keep the session catalog collision-free."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("gr_sql_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("gr_sql_customer")
    return spark.sql(
        """
        SELECT c.c_mktsegment, o.o_orderpriority,
               count(*) AS n_orders,
               sum(cast(round(o.o_totalprice * 100) AS bigint)) AS revenue_cents
        FROM gr_sql_orders o
        JOIN gr_sql_customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderstatus <> 'F'
        GROUP BY c.c_mktsegment, o.o_orderpriority
        """
    )


QUERIES["rel_sql_frontend"] = q_rel_sql_frontend
ORACLES["rel_sql_frontend"] = (
    "SELECT c.c_mktsegment, o.o_orderpriority, count(*) AS n_orders, "
    "sum(round(o.o_totalprice * 100)::BIGINT)::BIGINT AS revenue_cents "
    "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
    "WHERE o.o_orderstatus <> 'F' "
    "GROUP BY c.c_mktsegment, o.o_orderpriority"
)


# ---- Spark 4 VARIANT over semi-structured props -----------------------------

def q_events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type: parse the
    props JSON once into a variant column (open-format binary encoding —
    the modern replacement for schema-on-read JSON strings), extract the typed field
    with variant_get, and aggregate. The DuckDB oracle reads the same
    field with its native JSON extraction — engine-specific encodings,
    identical semantics."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
        )
    )


QUERIES["events_variant_extract"] = q_events_variant_extract
ORACLES["events_variant_extract"] = (
    "SELECT event_type, count(*)::BIGINT AS n, "
    "sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k, "
    "min(json_extract(props, '$.k')::BIGINT)::BIGINT AS min_k, "
    "max(json_extract(props, '$.k')::BIGINT)::BIGINT AS max_k "
    "FROM events GROUP BY event_type"
)


def q_rel_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt surface (the inverse of q_rel_pivot, Spark 3.4+
    ``DataFrame.unpivot``): the wide per-returnflag quantity columns melt
    back to (flag, status, qty) long form — compiles to a single generate
    (expand) over the aggregated relation, never a union of per-column
    scans."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 6))
    )
    return wide.unpivot(
        ["l_returnflag"], ["F", "O"], "l_linestatus", "sum_qty"
    ).filter(F.col("sum_qty").isNotNull())


QUERIES["rel_unpivot"] = q_rel_unpivot
ORACLES["rel_unpivot"] = (
    "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 6) AS sum_qty "
    "FROM lineitem GROUP BY 1, 2"
)


def q_rel_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprint for cross-system reconciliation
    (the standard 'did the migration copy every row' audit at 100 TB):
    per order-status segment, XOR-fold the portable 60-bit hash of each
    row's canonical string plus the exact row count. XOR is commutative/
    associative, so the aggregate is partition-order-independent and needs
    no sort; a single flipped row flips the fingerprint. Money rides as
    integer cents inside the hashed representation (text-exact)."""
    from giranking_spark.functions.hashing import md5_u60

    o = load_table(spark, sf_dir, "orders")
    row_repr = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
    )
    return (
        o.select("o_orderstatus", md5_u60(row_repr).alias("_h"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.expr("bit_xor(_h)").cast("long").alias("fingerprint"),
        )
    )


QUERIES["rel_table_fingerprint"] = q_rel_table_fingerprint
from giranking_spark.functions.hashing import md5_u60_sql_duckdb as _m60fp  # noqa: E402

ORACLES["rel_table_fingerprint"] = (
    "SELECT o_orderstatus, count(*)::BIGINT AS n_rows, "
    "CAST(bit_xor("
    + _m60fp(
        "o_orderkey::VARCHAR || '|' || o_custkey::VARCHAR || '|' || "
        "o_orderstatus || '|' || round(o_totalprice * 100)::BIGINT::VARCHAR"
    )
    + ") AS BIGINT) AS fingerprint "
    "FROM orders GROUP BY o_orderstatus"
)


K_ANON_K = 5  # minimum safe group size for the quasi-identifier report


def q_rel_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (nation, market-segment) quasi-identifier
    pair — the privacy screen a training-data release runs before shipping
    tabular PII-adjacent data: how many equivalence classes exist, how many
    rows sit in classes smaller than k (re-identifiable), and the smallest
    class. One partial-agg shuffle to classes (never row-sized output),
    then a 1-row summary."""
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("sz").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("sz") < K_ANON_K, F.col("sz")).otherwise(0))
        .cast("long")
        .alias("n_rows_at_risk"),
        F.min("sz").cast("long").alias("min_class"),
        F.lit(K_ANON_K).cast("long").alias("k"),
    )


QUERIES["rel_k_anonymity"] = q_rel_k_anonymity
ORACLES["rel_k_anonymity"] = f"""
WITH g AS (
    SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS sz
    FROM customer GROUP BY 1, 2
)
SELECT count(*)::BIGINT AS n_classes,
       CAST(sum(sz) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN sz < {K_ANON_K} THEN sz ELSE 0 END) AS BIGINT)
           AS n_rows_at_risk,
       min(sz)::BIGINT AS min_class,
       {K_ANON_K}::BIGINT AS k
FROM g
"""


# ---- CDC hash-diff change detection -----------------------------------------

def q_rel_cdc_hashdiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-vault-style hash-diff change detection between two snapshot
    versions of the orders table: the "new" snapshot derives
    deterministically from the base (keys %17==0 deleted, %5==0 price
    re-stated, 100 fresh keys appended), each row carries
    md5(concat_ws('|', attrs)), and ONE full-outer join on the key
    classifies every row as unchanged / updated / inserted / deleted —
    the standard warehouse delta audit without comparing attributes
    column by column.

    Scale shape: one equi-join on the key; the hashdiff collapses any
    attribute width to 32 bytes before the shuffle, which is the entire
    point of the pattern at 100 TB. Output is the 4-row class census plus
    a changed-keys checksum (bit_xor of key hashes — order-independent,
    exact) so the diff itself is verifiable, not just countable."""
    from giranking_spark.functions.hashing import md5_u60

    o = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey").cast("long")
    price_cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")

    def hashed(df, cents_col):
        return df.select(
            key.alias("k"),
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("o_orderstatus"),
                    cents_col.cast("string"),
                    F.col("o_orderpriority"),
                )
            ).alias("hd"),
        )

    old = hashed(o, price_cents)
    base_new = o.filter(key % 17 != 0)
    mx = o.agg(F.max(key).alias("mx"))
    inserted = (
        spark.range(1, 101)
        .crossJoin(F.broadcast(mx))
        .select(
            (F.col("mx") + F.col("id")).alias("k"),
            F.md5(F.concat_ws("|", F.lit("N"), F.col("id").cast("string"))).alias("hd"),
        )
    )
    new = hashed(
        base_new,
        F.when(key % 5 == 0, price_cents + 100).otherwise(price_cents),
    ).unionByName(inserted)
    j = old.withColumnRenamed("hd", "hd_old").join(
        new.withColumnRenamed("hd", "hd_new"), "k", "full_outer"
    )
    cls = (
        F.when(F.col("hd_old").isNull(), F.lit("inserted"))
        .when(F.col("hd_new").isNull(), F.lit("deleted"))
        .when(F.col("hd_old") == F.col("hd_new"), F.lit("unchanged"))
        .otherwise(F.lit("updated"))
    )
    return (
        j.select(cls.alias("change_class"), "k")
        .groupBy("change_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.bit_xor(md5_u60(F.col("k").cast("string"))).cast("long").alias("keys_xor"),
        )
    )


from giranking_spark.functions.hashing import md5_u60_sql_duckdb as _cdc_md60  # noqa: E402

QUERIES["rel_cdc_hashdiff"] = q_rel_cdc_hashdiff
ORACLES["rel_cdc_hashdiff"] = (
    "WITH old AS (SELECT o_orderkey AS k, md5(o_orderstatus || '|' || "
    "CAST(round(o_totalprice * 100, 0) AS BIGINT) || '|' || o_orderpriority) "
    "AS hd FROM orders), "
    "mx AS (SELECT max(o_orderkey) AS mx FROM orders), "
    "new AS (SELECT o_orderkey AS k, md5(o_orderstatus || '|' || "
    "(CAST(round(o_totalprice * 100, 0) AS BIGINT) + "
    "CASE WHEN o_orderkey % 5 = 0 THEN 100 ELSE 0 END) || '|' || "
    "o_orderpriority) AS hd FROM orders WHERE o_orderkey % 17 <> 0 "
    "UNION ALL SELECT mx + i AS k, md5('N' || '|' || i) AS hd "
    "FROM mx, unnest(generate_series(1, 100)) AS t(i)), "
    "j AS (SELECT coalesce(old.k, new.k) AS k, old.hd AS hd_old, "
    "new.hd AS hd_new FROM old FULL OUTER JOIN new ON old.k = new.k) "
    "SELECT CASE WHEN hd_old IS NULL THEN 'inserted' "
    "WHEN hd_new IS NULL THEN 'deleted' "
    "WHEN hd_old = hd_new THEN 'unchanged' ELSE 'updated' END "
    "AS change_class, count(*)::BIGINT AS n_rows, "
    "CAST(bit_xor(" + _cdc_md60("k::VARCHAR") + ") AS BIGINT) AS keys_xor "
    "FROM j GROUP BY 1"
)


# ---- interval coalescing (merge overlapping sessions) -----------------------

#: interval half-width around each event (seconds)
COALESCE_SPAN_S = 300


def q_rel_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing (the ranges flavor of gaps-and-islands): each
    event opens a [t, t+300 s) activity interval; overlapping/touching
    intervals per user merge into maximal covered spans. Output per user:
    raw interval count, merged span count, total covered seconds — the
    dedup step behind billing meters, on-call coverage and session
    stitching.

    Classic running-max construction: a new span starts where the start
    exceeds the running max of all previous ends; the span id is a
    cumulative sum of those flags — two windows on the SAME user-keyed
    shuffle, exact integer seconds throughout."""
    ev = load_events(spark, sf_dir).select(
        "user_id",
        F.col("t").alias("s"),
        (F.col("t") + COALESCE_SPAN_S).alias("e"),
    )
    w_order = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = ev.withColumn(
        "new_span",
        F.when(
            prev_max_e.isNull() | (F.col("s") > prev_max_e), 1
        ).otherwise(0),
    ).withColumn(
        "span_id",
        F.sum("new_span").over(
            w_order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    spans = flagged.groupBy("user_id", "span_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_in"),
        (F.max("e") - F.min("s")).cast("long").alias("covered"),
    )
    return spans.groupBy("user_id").agg(
        F.sum("n_in").cast("long").alias("n_intervals"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("covered").cast("long").alias("covered_sec"),
    )


QUERIES["rel_interval_coalesce"] = q_rel_interval_coalesce
ORACLES["rel_interval_coalesce"] = (
    "WITH ev AS (SELECT user_id, epoch_us(ts) // 1000000 AS s, "
    f"epoch_us(ts) // 1000000 + {COALESCE_SPAN_S} AS e FROM events), "
    "flagged AS (SELECT user_id, s, e, CASE WHEN max(e) OVER "
    "(PARTITION BY user_id ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING "
    "AND 1 PRECEDING) IS NULL OR s > max(e) OVER (PARTITION BY user_id "
    "ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
    "THEN 1 ELSE 0 END AS new_span FROM ev), "
    "spans AS (SELECT user_id, s, e, sum(new_span) OVER "
    "(PARTITION BY user_id ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING "
    "AND CURRENT ROW) AS span_id FROM flagged), "
    "agg AS (SELECT user_id, span_id, count(*)::BIGINT AS n_in, "
    "CAST(max(e) - min(s) AS BIGINT) AS covered FROM spans GROUP BY 1, 2) "
    "SELECT user_id, CAST(sum(n_in) AS BIGINT) AS n_intervals, "
    "count(*)::BIGINT AS n_spans, CAST(sum(covered) AS BIGINT) "
    "AS covered_sec FROM agg GROUP BY user_id"
)


# ---- referential-integrity orphan audit -------------------------------------

def q_rel_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: for each
    declared FK edge, total rows and orphan rows (no parent), plus the
    reverse "childless parent" count for customer→orders — the DQ gate a
    warehouse runs before letting a snapshot promote. Each line is one
    anti-join (broadcast where the parent is small); counts are exact."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")

    def audit(name, child, child_key, parent, parent_key):
        orphans = child.join(
            parent, child[child_key] == parent[parent_key], "left_anti"
        )
        return (
            child.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
            .crossJoin(
                F.broadcast(
                    orphans.agg(
                        F.count(F.lit(1)).cast("long").alias("n_orphans")
                    )
                )
            )
            .select(F.lit(name).alias("fk_edge"), "n_rows", "n_orphans")
        )

    rows = [
        audit("orders->customer", o, "o_custkey", c, "c_custkey"),
        audit("lineitem->orders", li, "l_orderkey", o, "o_orderkey"),
        audit("lineitem->part", li, "l_partkey", p, "p_partkey"),
        audit("lineitem->supplier", li, "l_suppkey", s, "s_suppkey"),
        audit("customer-no-orders", c, "c_custkey", o, "o_custkey"),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


QUERIES["rel_fk_orphans"] = q_rel_fk_orphans
ORACLES["rel_fk_orphans"] = (
    "SELECT 'orders->customer' AS fk_edge, "
    "(SELECT count(*) FROM orders)::BIGINT AS n_rows, "
    "(SELECT count(*) FROM orders ANTI JOIN customer "
    "ON o_custkey = c_custkey)::BIGINT AS n_orphans "
    "UNION ALL SELECT 'lineitem->orders', "
    "(SELECT count(*) FROM lineitem)::BIGINT, "
    "(SELECT count(*) FROM lineitem ANTI JOIN orders "
    "ON l_orderkey = o_orderkey)::BIGINT "
    "UNION ALL SELECT 'lineitem->part', "
    "(SELECT count(*) FROM lineitem)::BIGINT, "
    "(SELECT count(*) FROM lineitem ANTI JOIN part "
    "ON l_partkey = p_partkey)::BIGINT "
    "UNION ALL SELECT 'lineitem->supplier', "
    "(SELECT count(*) FROM lineitem)::BIGINT, "
    "(SELECT count(*) FROM lineitem ANTI JOIN supplier "
    "ON l_suppkey = s_suppkey)::BIGINT "
    "UNION ALL SELECT 'customer-no-orders', "
    "(SELECT count(*) FROM customer)::BIGINT, "
    "(SELECT count(*) FROM customer ANTI JOIN orders "
    "ON c_custkey = o_custkey)::BIGINT"
)


# ---- 2-D skyline (Pareto front) ---------------------------------------------

def q_rel_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-front) of orders on (totalprice, recency): an order
    survives iff NO other order is >= on both axes and > on at least one —
    the multi-criteria shortlist query (BKS01). Naive evaluation is an
    O(n^2) anti-join; the dominance test here needs only per-price maxima:
    a row survives iff its day equals its price's max day AND the max day
    among STRICTLY higher prices stays below it. The strictly-higher max
    is a running max over the per-price relation sorted price DESC with a
    ROWS UNBOUNDED PRECEDING .. 1 PRECEDING frame — prices are distinct
    after the aggregate, so the rows-frame is exact, and unbounded-
    PRECEDING frames evaluate incrementally (O(n)) in Spark, unlike
    UNBOUNDED FOLLOWING frames which recompute per row (measured O(n^2):
    a single task pinned for >10 min over 150k distinct prices at sf0.1).
    The window runs over ONE ROW PER DISTINCT PRICE (map-side-combined
    aggregate first) and the qualifying prices broadcast back to recover
    the full skyline rows. All comparisons on exact BIGINTs, so the front
    is engine-identical."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("price_cents"),
        F.expr("unix_micros(cast(o_orderdate as timestamp)) div 1000000 div 86400")
        .alias("day"),
    )
    return skyline_2d(o)


def skyline_2d(o: DataFrame) -> DataFrame:
    """Core skyline over an (o_orderkey, price_cents, day) relation —
    factored out of :func:`q_rel_skyline_2d` so hand-checked tests run the
    SHIPPED window logic (desc rows-frame), not a re-implementation."""
    per_price = o.groupBy("price_cents").agg(F.max("day").alias("_mx_eq"))
    w_gt = (
        Window.orderBy(F.desc("price_cents"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    winners = per_price.select(
        "price_cents", "_mx_eq",
        F.max("_mx_eq").over(w_gt).alias("_mx_gt"),
    ).filter(F.col("_mx_gt").isNull() | (F.col("_mx_gt") < F.col("_mx_eq")))
    return (
        o.join(F.broadcast(winners), "price_cents")
        .filter(F.col("day") == F.col("_mx_eq"))
        .select("o_orderkey", "price_cents", "day")
    )


QUERIES["rel_skyline_2d"] = q_rel_skyline_2d
ORACLES["rel_skyline_2d"] = (
    "WITH o AS (SELECT o_orderkey, "
    "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents, "
    "epoch_us(o_orderdate) // 1000000 // 86400 AS day FROM orders), "
    "per_price AS (SELECT price_cents, max(day) AS mx_eq FROM o GROUP BY 1), "
    "winners AS (SELECT price_cents, mx_eq, "
    "max(mx_eq) OVER (ORDER BY price_cents DESC "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx_gt "
    "FROM per_price) "
    "SELECT o.o_orderkey, o.price_cents, o.day "
    "FROM o JOIN winners w ON o.price_cents = w.price_cents "
    "WHERE (w.mx_gt IS NULL OR w.mx_gt < w.mx_eq) AND o.day = w.mx_eq"
)


# ---- SCD type-2 snapshot ------------------------------------------------------

SCD2_SNAPSHOT_DAY = 10500  # epoch day inside the order-date range (~1998-10)


def q_rel_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 reconstruction: each customer's
    orders, in (orderdate, orderkey) order, are treated as successive
    dimension versions valid [own date, next date); the query answers
    'which version was active on SCD2_SNAPSHOT_DAY' plus each customer's
    version count — the dimensional-warehouse bread-and-butter (Kimball
    SCD2 current-row lookup). One lead() window per customer; the as-of
    filter is two exact BIGINT comparisons; open-ended current versions
    use a NULL-high lead."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey",
        F.expr("unix_micros(cast(o_orderdate as timestamp)) div 1000000 div 86400")
        .alias("vfrom"),
    )
    w = Window.partitionBy("o_custkey").orderBy("vfrom", "o_orderkey")
    versions = o.select(
        "o_custkey", "o_orderkey", "vfrom",
        F.lead("vfrom").over(w).alias("vto"),
        F.count(F.lit(1)).over(Window.partitionBy("o_custkey")).cast("long")
        .alias("n_versions"),
    )
    return versions.filter(
        (F.col("vfrom") <= SCD2_SNAPSHOT_DAY)
        & (F.col("vto").isNull() | (F.col("vto") > SCD2_SNAPSHOT_DAY))
    ).select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("active_orderkey"),
        "vfrom",
        "n_versions",
    )


QUERIES["rel_scd2_snapshot"] = q_rel_scd2_snapshot
ORACLES["rel_scd2_snapshot"] = f"""
WITH o AS (SELECT o_custkey, o_orderkey,
                  epoch_us(o_orderdate) // 1000000 // 86400 AS vfrom
           FROM orders),
versions AS (SELECT o_custkey, o_orderkey, vfrom,
                    lead(vfrom) OVER (PARTITION BY o_custkey
                                      ORDER BY vfrom, o_orderkey) AS vto,
                    count(*) OVER (PARTITION BY o_custkey)::BIGINT AS n_versions
             FROM o)
SELECT o_custkey AS custkey, o_orderkey AS active_orderkey, vfrom, n_versions
FROM versions
WHERE vfrom <= {SCD2_SNAPSHOT_DAY}
  AND (vto IS NULL OR vto > {SCD2_SNAPSHOT_DAY})
"""


# ---- theta band join ----------------------------------------------------------

BAND_DAYS = 2


def q_rel_theta_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (theta) join: pairs of DISTINCT orders placed within BAND_DAYS
    epoch days of each other, counted per 30-day period — the time-window
    correlation join SQL engines execute as a cross product unless
    rewritten. Spark side is the scale rewrite (r14 symmetric 2-probe):
    bucket each order by floor(day / BAND_DAYS); each LEFT row probes its
    OWN bucket and the bucket ABOVE only (days within BAND_DAYS differ by
    at most one bucket, so every pair is either same-bucket — found via
    the home probe with an okey tie-break — or adjacent-bucket — found
    exactly once, when its lower-bucket member probes up). The r6..r13
    shape probed 3 buckets per left row (≈3·Σn_b² candidates); the
    symmetric probe emits ≈2·Σn_b² for the identical pair set. Because
    the up-probe orients pairs by BUCKET order, not okey order, the
    period is re-derived explicitly from the min-okey member's day —
    byte-identical to the oracle's a.day attribution. Pair identity and
    the band test are exact BIGINT comparisons."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.expr("unix_micros(cast(o_orderdate as timestamp)) div 1000000 div 86400")
        .alias("day"),
    )
    left = o.select(
        "okey", "day",
        F.explode(
            F.array(
                F.expr(f"day div {BAND_DAYS}"),
                F.expr(f"day div {BAND_DAYS} + 1"),
            )
        ).alias("bucket"),
    )
    right = o.select(
        F.col("okey").alias("okey2"), F.col("day").alias("day2"),
        F.expr(f"day div {BAND_DAYS}").alias("bucket"),
    )
    home = F.col("bucket") == F.expr(f"day div {BAND_DAYS}")
    pairs = left.join(right, "bucket").filter(
        # same bucket: keep one orientation by okey; adjacent buckets: the
        # up-probe fires exactly once (left strictly below right), no
        # tie-break needed — and okey equality is impossible across buckets
        F.when(home, F.col("okey") < F.col("okey2")).otherwise(F.lit(True))
        & (F.abs(F.col("day") - F.col("day2")) <= BAND_DAYS)
    )
    # each pair matches exactly once (home xor up probe), so no dedup is
    # needed — the count aggregates the join output directly (map-side
    # combinable). period = min-okey member's day div 30, exactly the
    # oracle's a.day (a.okey < b.okey) attribution.
    pday_div30 = F.expr(
        "(CASE WHEN okey < okey2 THEN day ELSE day2 END) div 30"
    )
    return (
        pairs.groupBy(pday_div30.alias("period"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


QUERIES["rel_theta_band_join"] = q_rel_theta_band_join
ORACLES["rel_theta_band_join"] = f"""
WITH o AS (SELECT o_orderkey AS okey,
                  epoch_us(o_orderdate) // 1000000 // 86400 AS day FROM orders)
SELECT a.day // 30 AS period, count(*)::BIGINT AS n_pairs
FROM o a JOIN o b ON a.okey < b.okey AND abs(a.day - b.day) <= {BAND_DAYS}
GROUP BY 1
"""


# ---- watermark dedup -----------------------------------------------------------

DEDUP_HORIZON_S = 1800


def q_rel_watermark_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded stream dedup accounting: events collide on a
    logical key (event_id div 2 — every key arrives twice in the fixture);
    the first arrival per key is kept, and each duplicate is classified by
    whether it lands within DEDUP_HORIZON_S of the first (a streaming
    dedup state with that watermark would drop it) or later (it would slip
    through and needs the batch reconciliation this query audits). One
    min-aggregation + one window-free join back; all tests on exact
    microsecond BIGINTs."""
    ev = load_events(spark, sf_dir).select(
        F.expr("event_id div 2").alias("key"), "ts_us", "event_id"
    )
    firsts = ev.groupBy("key").agg(
        F.min(F.struct("ts_us", "event_id")).alias("first")
    )
    dupes = (
        ev.join(firsts, "key")
        .filter(
            (F.col("ts_us") > F.col("first.ts_us"))
            | ((F.col("ts_us") == F.col("first.ts_us"))
               & (F.col("event_id") > F.col("first.event_id")))
        )
        .select(
            F.when(
                F.col("ts_us") - F.col("first.ts_us")
                <= DEDUP_HORIZON_S * 1_000_000,
                F.lit("in_window"),
            ).otherwise(F.lit("late")).alias("bucket")
        )
    )
    total = ev.groupBy().agg(
        F.lit("keys").alias("bucket"),
        F.countDistinct("key").cast("long").alias("n"),
    )
    return dupes.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).unionByName(total)


QUERIES["rel_watermark_dedup"] = q_rel_watermark_dedup
ORACLES["rel_watermark_dedup"] = f"""
WITH ev AS (SELECT event_id // 2 AS key, epoch_us(ts) AS ts_us, event_id
            FROM events),
firsts AS (SELECT key, min(struct_pack(ts_us := ts_us, event_id := event_id))
                  AS first FROM ev GROUP BY 1),
dupes AS (SELECT CASE WHEN e.ts_us - f.first.ts_us
                       <= {DEDUP_HORIZON_S}::BIGINT * 1000000
                      THEN 'in_window' ELSE 'late' END AS bucket
          FROM ev e JOIN firsts f ON e.key = f.key
          WHERE e.ts_us > f.first.ts_us
             OR (e.ts_us = f.first.ts_us AND e.event_id > f.first.event_id))
SELECT bucket, count(*)::BIGINT AS n FROM dupes GROUP BY 1
UNION ALL
SELECT 'keys', count(DISTINCT key)::BIGINT FROM ev
"""


# ---- bitemporal as-of reconstruction --------------------------------------------

BT_VALID_DAY = 10500   # valid-time as-of (epoch day, ~1998-10)
BT_SYS_PCT = 60        # system-time cutoff: first 60% of orderkeys ingested


def q_rel_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal as-of query: reconstruct each customer's active order
    version on VALID day BT_VALID_DAY *as the system knew it* at a
    transaction-time cutoff (orders ingest in orderkey sequence; only the
    first BT_SYS_PCT% of keys are known) — the audit/backfill staple SQL:2011
    bitemporal tables answer (Kimball late-arriving-facts pattern). The
    system dimension is a pre-filter, the valid dimension the same
    lead()-window SCD2 reconstruction as rel_scd2_snapshot — so comparing
    the two keys shows exactly what late arrivals change. All boundaries
    are exact BIGINT comparisons."""
    o = load_table(spark, sf_dir, "orders")
    cutoff = o.agg(
        F.expr(f"cast(max(o_orderkey) * {BT_SYS_PCT} div 100 as bigint)").alias("cut")
    )
    known = o.crossJoin(F.broadcast(cutoff)).filter(
        F.col("o_orderkey") <= F.col("cut")
    ).select(
        "o_custkey", "o_orderkey",
        F.expr("unix_micros(cast(o_orderdate as timestamp)) div 1000000 div 86400")
        .alias("vfrom"),
    )
    w = Window.partitionBy("o_custkey").orderBy("vfrom", "o_orderkey")
    versions = known.select(
        "o_custkey", "o_orderkey", "vfrom",
        F.lead("vfrom").over(w).alias("vto"),
    )
    return versions.filter(
        (F.col("vfrom") <= BT_VALID_DAY)
        & (F.col("vto").isNull() | (F.col("vto") > BT_VALID_DAY))
    ).select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("active_orderkey"),
        "vfrom",
    )


QUERIES["rel_bitemporal_asof"] = q_rel_bitemporal_asof
ORACLES["rel_bitemporal_asof"] = f"""
WITH cutoff AS (SELECT CAST(max(o_orderkey) * {BT_SYS_PCT} // 100 AS BIGINT)
                AS cut FROM orders),
known AS (SELECT o_custkey, o_orderkey,
                 epoch_us(o_orderdate) // 1000000 // 86400 AS vfrom
          FROM orders, cutoff WHERE o_orderkey <= cut),
versions AS (SELECT o_custkey, o_orderkey, vfrom,
                    lead(vfrom) OVER (PARTITION BY o_custkey
                                      ORDER BY vfrom, o_orderkey) AS vto
             FROM known)
SELECT o_custkey AS custkey, o_orderkey AS active_orderkey, vfrom
FROM versions
WHERE vfrom <= {BT_VALID_DAY} AND (vto IS NULL OR vto > {BT_VALID_DAY})
"""
