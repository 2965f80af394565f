"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship query: LinkRank top-20 over the graph derived from
              /root/testdata/sf0.001 (clean → K=10 fixpoint → Normal-CDF
              normalize → top-k).
``queries`` — one callable per implemented operator (SURVEY.md §2 op ids +
              extension ops), from giranking_spark.queries.
``oracle_sql`` — matching DuckDB SQL; iterative fixpoints are unrolled into
              chained CTEs (fixed iteration count ⇒ plain SQL expresses them
              exactly). Keys without oracle entries (trustrank_scores) get
              the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from giranking_spark.queries import ORACLES, QUERIES

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: top-20 LinkRank scores on the sf0.001-derived graph."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return QUERIES["rank_topk"](spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
