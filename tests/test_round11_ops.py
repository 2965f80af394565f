"""Round-11 operator tests: adaptive triangle orientation dispatch."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _co(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def test_orientation_dispatch_rule():
    """Pin the dispatch rule against the measured sf0.1 substrates: the
    bipartite page-link graph (25.7M id-wedges over 587k edges, max degree
    102) stays on the compact id-oriented path; the near-complete supplier
    co-occurrence projection (274M id-wedges over 454k edges, max degree
    926) orients. Both the absolute and the relative budget must bind."""
    from giranking_spark.operators.triangles import (
        WEDGE_ABS_CAP,
        WEDGE_REL_CAP,
        should_orient,
    )

    # measured sf0.1 substrates (DuckDB over the shipped fixture)
    assert not should_orient(25_676_603, 586_871)  # local_bridges graph
    assert should_orient(274_376_050, 453_588)  # supplier co-occurrence
    # tiny graphs never orient, whatever the ratio (absolute budget)
    assert not should_orient(40_005, 203)  # the hub test fixture
    # the relative budget binds once past the absolute one
    m = 10_000_000
    assert not should_orient(WEDGE_REL_CAP * m, m)
    assert should_orient(WEDGE_REL_CAP * m + 1, m)


def test_triangle_paths_agree(spark):
    """Both forced paths (and the auto dispatch) enumerate the same
    triangle SET on a random graph — orientation is a physical choice."""
    from giranking_spark.operators.triangles import triangle_relation

    rnd = random.Random(11)
    pairs = sorted({tuple(sorted(rnd.sample(range(40), 2))) for _ in range(200)})
    co = _co(spark, [(int(u), int(v)) for u, v in pairs])

    def tri_set(df):
        return {tuple(sorted(r)) for r in df.collect()}

    auto = tri_set(triangle_relation(co))
    compact = tri_set(triangle_relation(co, orient=False))
    oriented = tri_set(triangle_relation(co, orient=True))
    assert auto == compact == oriented
    assert len(auto) > 0


def test_triangle_relation_plan_only_runs_no_job(spark):
    """materialize=False must build a plan without executing a Spark job
    (the r10 eager checkpoint broke plan-only consumers): the pre-action
    plan still contains the degree aggregate (nothing was checkpointed
    away), and explain() works on a plan-only DataFrame."""
    from giranking_spark.operators.triangles import triangle_relation

    co = _co(spark, [(1, 2), (1, 3), (2, 3)])
    sc = spark.sparkContext
    sc.setJobGroup("tri_plan_only", "plan-only construction")
    try:
        tri = triangle_relation(co, materialize=False)
        assert sc.statusTracker().getJobIdsForGroup("tri_plan_only") == []
    finally:
        sc.setJobGroup("tri_plan_only_exec", "execution")
    assert tri.count() == 1


def test_small_graph_broadcasts_wedge_join(spark):
    """Under BROADCAST_EDGE_CAP the enumeration's joins broadcast the
    edge/closing sides, so the wedge relation never hits an exchange."""
    from giranking_spark.operators.triangles import triangle_relation

    co = _co(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
    plan = triangle_relation(co)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
