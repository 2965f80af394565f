"""Storage-format source/sink roundtrips (JSON lines, ORC) with oracles.

Extends the format surface beyond parquet (everywhere), TSV text
(queries/textsrcq.py) and the partitioned-parquet sink
(queries/pipelineq.py): JSONL is the interchange format crawl/annotation
feeds arrive in; ORC is the other columnar format a Spark warehouse must
read. Each query writes a deterministic projection to scratch, reads it
back through the format under test, and the oracle derives the expected
rows from the base table — the file never feeds the oracle, so the
serialize→parse path is independently checked.

Timestamps travel as epoch-µs BIGINTs inside the files (JSON has no
timestamp type; integer round-trip is exact in every format).

Scale: both writes are plain distributed ``df.write`` (no driver-side
rows); scratch paths are per-application like textsrcq's.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from giranking_spark.sources.tables import load_table

_TMP_ROOT = "/tmp/giranking_spark_formats"


def _scratch(spark: SparkSession, sf_dir: str, name: str) -> str:
    return os.path.join(
        _TMP_ROOT,
        spark.sparkContext.applicationId,
        os.path.basename(os.path.normpath(sf_dir)),
        name,
    )


_EVENTS_JSON_SCHEMA = (
    "event_id BIGINT, ts_us BIGINT, user_id BIGINT, event_type STRING, "
    "value DOUBLE"
)


def q_src_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → JSONL → schema-on-read parse. The value column keeps full
    double precision through the text roundtrip (Spark serializes doubles
    with round-trippable repr), so parity is exact, not rounded."""
    path = _scratch(spark, sf_dir, "events_json")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )
    ev.write.mode("overwrite").json(path)
    return spark.read.schema(_EVENTS_JSON_SCHEMA).json(path)


def q_sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders projection → ORC → read back (columnar sink/source twin of
    the parquet path; predicate pushdown and column pruning apply the same
    way on a cluster)."""
    path = _scratch(spark, sf_dir, "orders_orc")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    o.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


def q_sink_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table sink + co-located join: orders and customer are
    written ``bucketBy(8, custkey)`` into a scratch database, read back,
    and sort-merge-joined — because both sides share the bucket spec, the
    join plan has NO shuffle Exchange (asserted in
    tests/test_scale_plans.py). This is the 100 TB co-location story from
    the brief: pre-bucketing the fact table turns every subsequent
    key-join into a local merge. The ``merge`` hint pins SMJ so the demo
    exercises the bucketed path rather than a broadcast."""
    import re as _re

    db = "gr_buckets_" + _re.sub(
        r"[^0-9a-zA-Z]+",
        "_",
        spark.sparkContext.applicationId
        + "_"
        + os.path.basename(os.path.normpath(sf_dir)),
    )
    loc = _scratch(spark, sf_dir, "bucketdb")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    ).write.bucketBy(8, "o_custkey").sortBy("o_custkey").mode(
        "overwrite"
    ).saveAsTable(f"{db}.orders_b")
    load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    ).write.bucketBy(8, "o_custkey").sortBy("o_custkey").mode(
        "overwrite"
    ).saveAsTable(f"{db}.customer_b")
    ob = spark.table(f"{db}.orders_b").hint("merge")
    cb = spark.table(f"{db}.customer_b").hint("merge")
    return (
        ob.join(cb, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("revenue_cents"),
        )
    )


_CSV_SCHEMA = "c_custkey BIGINT, c_name STRING, note STRING, cents BIGINT"


def q_src_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer projection → CSV (header, quoted fields) → schema-on-read
    parse. The synthesized ``note`` column embeds commas AND double-quotes
    (`name, segment="X"`), so the writer must quote and escape-double the
    field and the reader must undo both — the actual failure modes of CSV
    interchange. Money rides as integer cents (text roundtrip exact); the
    oracle derives the expected rows from the base table, never the file."""
    path = _scratch(spark, sf_dir, "customer_csv")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.concat(
            F.col("c_name"), F.lit(', segment="'), F.col("c_mktsegment"), F.lit('"')
        ).alias("note"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
    )
    c.write.mode("overwrite").option("header", True).csv(path)
    return spark.read.schema(_CSV_SCHEMA).option("header", True).csv(path)


QUERIES = {
    "src_json_events": q_src_json_events,
    "sink_orc_roundtrip": q_sink_orc_roundtrip,
    "sink_bucketed_join": q_sink_bucketed_join,
    "src_csv_roundtrip": q_src_csv_roundtrip,
}

ORACLES = {
    "src_json_events": (
        "SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value "
        "FROM events"
    ),
    "sink_orc_roundtrip": (
        "SELECT o_orderkey, o_custkey, o_orderstatus, "
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders"
    ),
    "sink_bucketed_join": (
        "SELECT c.c_mktsegment, count(*)::BIGINT AS n_orders, "
        "sum(round(o.o_totalprice * 100)::BIGINT)::BIGINT AS revenue_cents "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "GROUP BY c.c_mktsegment"
    ),
    "src_csv_roundtrip": (
        "SELECT c_custkey, c_name, "
        "c_name || ', segment=\"' || c_mktsegment || '\"' AS note, "
        "CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer"
    ),
}


_XML_SCHEMA = "s_suppkey BIGINT, s_name STRING, note STRING, cents BIGINT"


def q_src_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier projection → XML (Spark 4 built-in XML source) →
    schema-on-read parse. The synthesized ``note`` embeds the XML-special
    characters ``< & >`` and a quote, so the writer must entity-escape and
    the reader must unescape — the actual failure modes of XML
    interchange. Money rides as integer cents (text roundtrip exact); the
    oracle derives the expected rows from the base table, never the
    file."""
    path = _scratch(spark, sf_dir, "supplier_xml")
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_name",
        F.concat(
            F.col("s_name"), F.lit(' <"&> nation='),
            F.col("s_nationkey").cast("string"),
        ).alias("note"),
        F.round(F.col("s_acctbal") * 100).cast("bigint").alias("cents"),
    )
    (
        s.write.mode("overwrite")
        .format("xml")
        .option("rowTag", "supplier")
        .option("rootTag", "suppliers")
        .save(path)
    )
    return (
        spark.read.schema(_XML_SCHEMA)
        .format("xml")
        .option("rowTag", "supplier")
        .load(path)
    )


QUERIES["src_xml_roundtrip"] = q_src_xml_roundtrip
ORACLES["src_xml_roundtrip"] = (
    "SELECT s_suppkey, s_name, "
    "s_name || ' <\"&> nation=' || s_nationkey AS note, "
    "CAST(round(s_acctbal * 100) AS BIGINT) AS cents FROM supplier"
)


#: fixed-width layout (mainframe/COBOL interchange): name-padded columns,
#: right-aligned space-padded money (sign-safe) — offsets shared with the oracle
FW_KEY_W = 10
FW_NAME_W = 20
FW_SEG_W = 10
FW_CENTS_W = 12


def q_src_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width text roundtrip (the mainframe interchange format Spark
    has no native reader for): WRITE customer rows as padded fixed-offset
    lines via `spark.write.text`, then parse them back with pure-JVM
    substring/trim/cast at the shared offsets — schema-on-read over
    `spark.read.text`. Exercises the two real failure modes (padding must
    be stripped; right-aligned signed money must parse exact as integer
    cents). The oracle derives expected rows from the base table, never
    the file."""
    path = _scratch(spark, sf_dir, "customer_fw")
    c = load_table(spark, sf_dir, "customer").select(
        F.concat(
            F.lpad(F.col("c_custkey").cast("string"), FW_KEY_W, "0"),
            F.rpad(F.col("c_name"), FW_NAME_W, " "),
            F.rpad(F.col("c_mktsegment"), FW_SEG_W, " "),
            F.lpad(
                F.round(F.col("c_acctbal") * 100).cast("bigint").cast("string"),
                FW_CENTS_W,
                " ",
            ),
        ).alias("value")
    )
    c.write.mode("overwrite").text(path)
    raw = spark.read.text(path)
    k0, k1 = 1, FW_KEY_W
    n0 = k0 + FW_KEY_W
    s0 = n0 + FW_NAME_W
    m0 = s0 + FW_SEG_W
    return raw.select(
        F.substring("value", k0, k1).cast("long").alias("c_custkey"),
        F.rtrim(F.substring("value", n0, FW_NAME_W)).alias("c_name"),
        F.rtrim(F.substring("value", s0, FW_SEG_W)).alias("c_mktsegment"),
        F.trim(F.substring("value", m0, FW_CENTS_W)).cast("long").alias(
            "cents"
        ),
    )


QUERIES["src_fixed_width"] = q_src_fixed_width
ORACLES["src_fixed_width"] = (
    "SELECT c_custkey, c_name, c_mktsegment, "
    "CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer"
)
