"""Distributed sketches with engine-portable determinism.

KMV (k-minimum-values) distinct-count estimation: hash every value with the
portable 60-bit md5 hash (functions/hashing.py), keep the k smallest distinct
hashes, estimate ``D ≈ (k-1) * M / h_(k)`` where M is the hash-space size.
Unlike HyperLogLog (whose register layout differs per engine) KMV is a pure
order statistic — Spark and DuckDB produce bit-identical sketches, so the
estimate itself is oracle-checkable, not just "close".

Scale notes:
- The k smallest distinct hashes are computed as distinct → sort → limit k;
  Spark plans the tail as TakeOrderedAndProject (per-partition top-k, then a
  single k-row merge at the driver) — no global sort materializes.
- The distinct is the only shuffle, on the 60-bit hash (uniformly
  distributed, skew-free by construction).
- Heavy hitters run as a plain count aggregation with map-side partial
  aggregation; the ``min_count`` filter applies post-agg, so the shuffle
  carries one row per distinct key (the same cost profile a SpaceSaving
  sketch merge would have at much higher implementation risk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from giranking_spark.functions.hashing import md5_u60

#: size of the 60-bit hash space (15 md5 hex digits)
KMV_SPACE = float(1 << 60)


def kmv_distinct(df: DataFrame, col: str, k: int) -> DataFrame:
    """1-row (k_used, kth_min, est_distinct) KMV distinct-count estimate.

    ``k_used`` < k means the exact distinct count was below k and
    ``est_distinct`` is exact (= k_used).
    """
    hashes = (
        df.select(md5_u60(F.col(col).cast("string")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(int(k))
    )
    return hashes.agg(
        F.count("*").alias("k_used"),
        F.max("h").alias("kth_min"),
        F.round(
            F.when(
                F.count("*") < F.lit(int(k)), F.count("*").cast("double")
            ).otherwise((F.lit(float(k - 1)) * F.lit(KMV_SPACE)) / F.max("h")),
            6,
        ).alias("est_distinct"),
    )


def heavy_hitters(df: DataFrame, col: str, min_count: int) -> DataFrame:
    """(value, cnt) for values occurring at least ``min_count`` times,
    heaviest first (value as tiebreak for determinism)."""
    return (
        df.groupBy(F.col(col).cast("string").alias("value"))
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= F.lit(int(min_count)))
        .orderBy(F.col("cnt").desc(), F.col("value").asc())
    )


def kmv_distinct_by(
    df: DataFrame, group_col: str, col: str, k: int
) -> DataFrame:
    """Per-group KMV distinct-count estimate: for every value of
    ``group_col``, the k smallest distinct 60-bit hashes of ``col`` and the
    order-statistic estimate — (grp, k_used, kth_min, est_distinct).

    The sketch state is k hashes per group, mergeable by min-merge — the
    per-segment cardinality primitive (distinct users per event type,
    distinct tokens per domain) where one global estimate isn't enough.

    Scale shape: ONE data-sized shuffle. The explicit ``repartition(grp)``
    is the only exchange — hash-partitioning on ``grp`` already satisfies
    the clustering the (grp, h) dedup aggregate and the per-grp rank window
    both require, so Catalyst inserts no further shuffle (CI-asserted in
    test_scale_plans); dedup and the rank-k cut ride the same partitioning,
    and the window sort spills rather than buffering a hot group."""
    from pyspark.sql import Window

    h = (
        df.select(
            F.col(group_col).alias("grp"),
            md5_u60(F.col(col).cast("string")).alias("h"),
        )
        .repartition("grp")
        .dropDuplicates(["grp", "h"])
    )
    w = Window.partitionBy("grp").orderBy("h")
    topk = h.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= F.lit(int(k))
    )
    return topk.groupBy("grp").agg(
        F.count("*").alias("k_used"),
        F.max("h").alias("kth_min"),
        F.round(
            F.when(
                F.count("*") < F.lit(int(k)), F.count("*").cast("double")
            ).otherwise((F.lit(float(k - 1)) * F.lit(KMV_SPACE)) / F.max("h")),
            6,
        ).alias("est_distinct"),
    )
