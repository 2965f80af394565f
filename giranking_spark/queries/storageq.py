"""Storage-layout queries: partition pruning, dynamic partition pruning,
small-file compaction, and parquet schema evolution.

These are the table-layout disciplines that decide whether a 100 TB scan
reads 100 TB or 1 TB:

* ``src_partition_pruned`` — a Hive-partitioned write plus a read with a
  partition-key predicate; the scan's ``PartitionFilters`` prune whole
  directories before any file is opened (plan-asserted in
  tests/test_scale_plans.py).
* ``rel_dpp_join`` — dynamic partition pruning: the partition-key filter is
  only implied by a join against a filtered dimension, and Catalyst pushes a
  runtime subquery filter into the fact scan (``dynamicpruning`` in the
  plan).  THE mechanism that makes star-schema joins over partitioned facts
  viable at warehouse scale.
* ``sink_compacted`` — the OPTIMIZE/compact maintenance step over a
  fragmented layout (operators/maintenance.py); parity proves rewriting
  loses no rows.
* ``src_schema_merge`` — parquet schema evolution: files written before a
  column existed read NULL for it under ``mergeSchema`` — how a long-lived
  corpus adds columns without rewriting history.

Oracles always derive expectations from the base tables, never from the
files, so the write→layout→read path is independently checked.  Scratch
paths are per-application (no cross-run collisions); money/value doubles
ride as integer cents so parity is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from giranking_spark.operators.maintenance import compact_parquet
from giranking_spark.queries.textsrcq import _scratch
from giranking_spark.sources.tables import load_table


def q_src_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → partitionBy(lang) parquet → read WHERE lang IN (en, de).

    The filter is on the partition column only, so the scan lists just the
    ``lang=en`` / ``lang=de`` directories — at scale, 2 of N directory
    subtrees instead of the whole table."""
    path = _scratch(spark, sf_dir, "storage_part_docs")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.mode("overwrite").partitionBy("lang").parquet(path)
    back = spark.read.parquet(path).filter(F.col("lang").isin("en", "de"))
    return back.groupBy(
        F.col("lang").cast("string").alias("lang"), "source"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


def build_dpp_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write the partitioned fact (events by event_type) and the small dim
    (event_type, category) used by ``rel_dpp_join``; returns their paths."""
    fact_path = _scratch(spark, sf_dir, "storage_dpp_fact")
    dim_path = _scratch(spark, sf_dir, "storage_dpp_dim")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    ev.write.mode("overwrite").partitionBy("event_type").parquet(fact_path)
    dim = (
        load_table(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .withColumn("category", F.substring("event_type", 1, 1))
    )
    dim.write.mode("overwrite").parquet(dim_path)
    return fact_path, dim_path


def q_rel_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema join where the fact-side partition filter exists only at
    runtime: dim is filtered on ``category``, the fact is partitioned on the
    join key, and Catalyst inserts a ``dynamicpruning`` subquery into the
    fact scan so unmatched partitions are never read.  Static pruning can't
    do this — the pruning values aren't known until the dim is filtered."""
    fact_path, dim_path = build_dpp_tables(spark, sf_dir)
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("category").isin("c", "e"))
    return (
        fact.join(F.broadcast(dim), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )


COMPACT_TARGET_BYTES = 64 * 1024


def q_sink_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fragmented write (64 task files) → byte-sized compaction → read back.

    The rewrite is coalesce-only (no shuffle) and the output file count is
    computed from actual bytes / 64 KiB (so the test fixture genuinely
    produces >1 file and exercises the sizing arithmetic, not a constant).
    Row-level parity against the base table proves the maintenance step is
    lossless."""
    frag = _scratch(spark, sf_dir, "storage_frag")
    compacted = _scratch(spark, sf_dir, "storage_compacted")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    ev.repartition(64).write.mode("overwrite").parquet(frag)
    back, _ = compact_parquet(
        spark, frag, compacted, target_file_bytes=COMPACT_TARGET_BYTES
    )
    return back


def q_src_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two parquet generations — v1 without ``o_orderstatus``, v2 with it —
    read as one table under ``mergeSchema``: v1 rows surface NULL for the
    late-added column.  This is how a multi-year corpus gains a column
    without rewriting petabytes of history."""
    path = _scratch(spark, sf_dir, "storage_evolve")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderstatus",
    )
    o.filter(F.col("o_orderkey") % 2 == 0).drop("o_orderstatus").write.mode(
        "overwrite"
    ).parquet(path + "/gen=1")
    o.filter(F.col("o_orderkey") % 2 == 1).write.mode("overwrite").parquet(
        path + "/gen=2"
    )
    return (
        spark.read.option("mergeSchema", True)
        .parquet(path)
        .select("o_orderkey", "cents", "o_orderstatus")
    )


#: deterministic range-bucket width on o_orderkey — fixed boundaries (not
#: repartitionByRange's sampled ones) so the layout, and therefore the
#: oracle, is reproducible run-to-run
SORTED_BUCKET_WIDTH = 8192


def q_sink_sorted_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-optimized sorted layout: orders are range-bucketed on
    ``floor(o_orderkey / 8192)`` (deterministic fixed-width boundaries),
    shuffled once so each bucket is one task, written
    ``partitionBy(bucket)`` with ``sortWithinPartitions(o_orderkey)`` —
    every parquet file is internally SORTED on the key, so its row-group
    min/max statistics are tight and a point/range predicate skips whole
    row groups at read time (the single biggest data-skipping lever after
    directory pruning).  tests assert file-level sortedness from the actual
    parquet row-group metadata.  Returned contract: per-bucket
    (n_rows, min/max key, exact cents total), derived by reading the files
    back — parity against the base table proves the layout rewrite is
    lossless."""
    path = _scratch(spark, sf_dir, "storage_sorted")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    (
        o.withColumn(
            "bucket", F.floor(F.col("o_orderkey") / SORTED_BUCKET_WIDTH)
        )
        .repartition("bucket")
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.groupBy(F.col("bucket").cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("o_orderkey").cast("long").alias("min_key"),
        F.max("o_orderkey").cast("long").alias("max_key"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )


QUERIES = {
    "sink_sorted_layout": q_sink_sorted_layout,
    "src_partition_pruned": q_src_partition_pruned,
    "rel_dpp_join": q_rel_dpp_join,
    "sink_compacted": q_sink_compacted,
    "src_schema_merge": q_src_schema_merge,
}

ORACLES = {
    "sink_sorted_layout": (
        f"SELECT floor(o_orderkey / {SORTED_BUCKET_WIDTH})::BIGINT AS bucket, "
        "count(*)::BIGINT AS n_rows, min(o_orderkey)::BIGINT AS min_key, "
        "max(o_orderkey)::BIGINT AS max_key, "
        "sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS sum_cents "
        "FROM orders GROUP BY 1"
    ),
    "src_partition_pruned": (
        "SELECT lang, source, count(*)::BIGINT AS n_docs, "
        "sum(n_chars)::BIGINT AS sum_chars FROM documents "
        "WHERE lang IN ('en', 'de') GROUP BY lang, source"
    ),
    "rel_dpp_join": (
        "SELECT event_type, count(*)::BIGINT AS n_events, "
        "sum(round(value * 100)::BIGINT)::BIGINT AS sum_cents FROM events "
        "WHERE substr(event_type, 1, 1) IN ('c', 'e') GROUP BY event_type"
    ),
    "sink_compacted": (
        "SELECT event_id, user_id, event_type, "
        "round(value * 100)::BIGINT AS cents FROM events"
    ),
    "src_schema_merge": (
        "SELECT o_orderkey, round(o_totalprice * 100)::BIGINT AS cents, "
        "CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END AS o_orderstatus "
        "FROM orders"
    ),
}
