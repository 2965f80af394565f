"""Parquet table loading + graph derivation from relational tables.

TESTDATA.md tables live as one parquet per table under an sf dir. The ranking
graph for scale runs is derived deterministically from key relationships
(FIXTURES.md §3): customer→supplier edges via orders ⋈ lineitem.

Scale note: the derivation is a single equi-join + distinct; the join key
(o_orderkey = l_orderkey) is the natural partition key of both tables, and the
projection is 2 columns so the parquet scan prunes everything else
(ReadSchema shows only the key columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def derive_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """edges(src='c<custkey>', dst='s<suppkey>') — distinct customer→supplier
    links observed through orders ⋈ lineitem (FIXTURES.md §3)."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )


def derive_vertices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All distinct endpoints with initial score 1.0."""
    e = derive_edges(spark, sf_dir)
    return (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .withColumn("score", F.lit(1.0))
    )


def derive_host_edges(spark: SparkSession, sf_dir: str, buckets: int = 25) -> DataFrame:
    """Host-level coarsening of the derived graph — the HostRank input analog
    (reference runs the same computation on the host-level graph,
    HostRankHBaseTest.java:185-194). Vertices collapse into ``buckets``
    groups per side via key modulo; self-loops drop; edges dedup."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.concat(F.lit("hc"), F.col("o_custkey") % buckets).alias("src"),
            F.concat(F.lit("hs"), F.col("l_suppkey") % buckets).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
