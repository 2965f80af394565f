"""Plan-shape tests: encode the 100 TB posture in CI (SURVEY.md §4.2 #5).

These assert on ``explain``/plan text, not results — the properties that
decide whether a plan survives a 1000× scale-up:

* predicate pushdown reaches the parquet scan (PushedFilters)
* column pruning reaches the scan (ReadSchema carries only used columns)
* small dimensions broadcast (BroadcastHashJoin, no sort-merge on a 25-row
  nation table)
* bucketed tables co-locate equi-joins (no Exchange above the bucketed scan)
* the per-iteration rank join keeps Python out of the hot path (no
  BatchEvalPython / row-at-a-time UDF in the LinkRank plan)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from giranking_spark.config import LinkRankConfig
from giranking_spark.operators.linkrank import linkrank_raw
from giranking_spark.sources.tables import derive_edges, load_table
from tests.conftest import SF_SMALL


def plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_parquet(spark):
    li = load_table(spark, SF_SMALL, "lineitem").filter(F.col("l_quantity") > 30).select(
        "l_orderkey", "l_quantity"
    )
    plan = plan_of(li)
    assert "PushedFilters: [" in plan
    assert "GreaterThan(l_quantity" in plan


def test_column_pruning_reaches_parquet(spark):
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_suppkey")
    plan = plan_of(li)
    # the 16-column table is read with a 2-column schema
    assert "ReadSchema: struct<l_orderkey" in plan
    assert "l_extendedprice" not in plan


def test_small_dim_joins_broadcast(spark):
    c = load_table(spark, SF_SMALL, "customer")
    n = load_table(spark, SF_SMALL, "nation")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "n_name"
    )
    plan = plan_of(joined)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_rank_plan_has_no_python_udf(spark):
    """The whole rank pipeline (join + aggs + CDF epilogue) stays JVM-side:
    erf is a Column expression, not a Python UDF (SURVEY.md §2.7)."""
    e = derive_edges(spark, SF_SMALL)
    raw = linkrank_raw(None, e, LinkRankConfig(), num_updates=1)
    from giranking_spark.operators.linkrank import normalize_scores

    plan = plan_of(normalize_scores(raw.select("id", "score"), 10.0))
    assert "BatchEvalPython" not in plan
    assert "PythonUDF" not in plan


@pytest.fixture()
def bucketed_edges(spark, tmp_path):
    e = derive_edges(spark, SF_SMALL)
    (
        e.write.mode("overwrite")
        .option("path", str(tmp_path / "edges_bucketed"))  # external table:
        # avoids touching the static warehouse dir
        .bucketBy(8, "src")
        .sortBy("src")
        .saveAsTable("edges_bucketed")
    )
    yield spark.table("edges_bucketed")
    spark.sql("DROP TABLE IF EXISTS edges_bucketed")


def test_bucketed_join_avoids_shuffle(spark, bucketed_edges):
    """Bucketing by the join key co-locates the big side: the bucketed scan
    feeds the join without an Exchange (the technique that amortizes the
    per-iteration message join at 100 TB — one shuffle at write time, zero
    per query)."""
    deg = bucketed_edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    joined = bucketed_edges.join(deg, "src")
    plan = plan_of(joined)
    # both the aggregate and the join consume bucketed partitioning: the
    # only allowed exchange is a broadcast, never a hash repartition
    assert "Exchange hashpartitioning" not in plan
