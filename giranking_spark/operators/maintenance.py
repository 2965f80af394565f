"""Table-maintenance operators: small-file compaction for parquet layouts.

A 100 TB ingest pipeline that writes per-micro-batch or per-task files
degrades into millions of small files; scan throughput then dies on file
open/seek overhead rather than bytes.  Every lakehouse engine grows an
OPTIMIZE/compact step for this.  Here it is Spark-native: list the data
files (driver-side METADATA work — the same listing Spark's own
InMemoryFileIndex performs on every read), size the output file count from
the actual byte total, and rewrite with ``coalesce`` (no shuffle: coalesce
only merges input splits; the rows never repartition).

At cluster scale the listing cost is one namenode/object-store LIST per
directory — identical to what any read of that path performs — and the
rewrite is a single map-only job.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def data_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """Return (total_bytes, n_files) over the ``part-*`` data files under
    ``path`` (recursive).  Metadata-only; no row data reaches the driver."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    total = 0
    n = 0
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().startswith("part-"):
            total += f.getLen()
            n += 1
    return total, n


def compacted_df(
    spark: SparkSession, src_path: str, target_file_bytes: int
) -> tuple[DataFrame, int]:
    """The coalesced rewrite plan + its real output file count.

    Compaction MERGES small files; it never splits large ones (that would
    need a shuffle, defeating the point), so the output count is
    ⌈total_bytes / target⌉ clamped to the read's own partition count —
    ``coalesce`` above that is a no-op and reporting the unclamped number
    would be a lie."""
    total, _ = data_file_stats(spark, src_path)
    df = spark.read.parquet(src_path)
    n_out = max(1, math.ceil(total / target_file_bytes))
    if n_out > 1:
        # Clamp to the scan's real (non-empty) partition count without
        # touching the RDD API: one column-pruned job counting distinct
        # spark_partition_id() — the parquet scan reads no data columns, and
        # empty partitions (which write no output file anyway) don't count.
        n_parts = (
            df.select(F.spark_partition_id().alias("p"))
            .agg(F.count_distinct("p").alias("n"))
            .first()[0]
        )
        n_out = max(1, min(n_out, n_parts or 1))
    return df.coalesce(n_out), n_out


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> tuple[DataFrame, int]:
    """Rewrite the parquet directory ``src_path`` into ``dst_path`` with
    min(⌈total_bytes / target_file_bytes⌉, input partitions) output files
    (≥1) and return (read-back DataFrame, output file count).

    ``coalesce`` (not ``repartition``) keeps this a map-only, shuffle-free
    rewrite — the whole point of compaction is to touch bytes once."""
    df, n_out = compacted_df(spark, src_path, target_file_bytes)
    df.write.mode("overwrite").parquet(dst_path)
    return spark.read.parquet(dst_path), n_out
