"""Synchronous label propagation (community detection) with deterministic
tie-breaking.

Fourth graph-analytics family next to LinkRank/HITS/PPR: each vertex starts
labeled with its own id and, per round, adopts the most frequent label among
its undirected neighbors, ties broken by the smallest label — fully
deterministic, hence oracle-checkable (the classic async LPA is
order-dependent; the sync+min-tiebreak variant is the reproducible form).

Per round: one groupBy(v, label) count + one per-vertex top-1 window — two
shuffles on the vertex key, no driver state, lineage checkpoint-truncated
per round like every other fixpoint here. The FIXED round count is the
contract with the unrolled-CTE oracle (queries/compq.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from giranking_spark.operators.components import undirected_edges
from giranking_spark.operators.linkrank import _checkpoint, _gc_nudge

LPA_ROUNDS = 3


def label_propagation(edges: DataFrame, rounds: int = LPA_ROUNDS) -> DataFrame:
    """(id, label) after ``rounds`` synchronous updates; label = most
    frequent neighbor label, min on ties. Every vertex of the undirected
    graph has at least one neighbor, so no keep-own fallback is needed."""
    und = _checkpoint(undirected_edges(edges))
    state = und.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    )
    state = _checkpoint(state)
    n = state.count()  # cached blocks — cheap; gates the GC nudge
    w = Window.partitionBy("v").orderBy(F.col("c").desc(), F.col("label").asc())
    for _ in range(rounds):
        nb = und.join(state, und.src == state.id).select(
            F.col("dst").alias("v"), "label"
        )
        cnt = nb.groupBy("v", "label").agg(F.count(F.lit(1)).alias("c"))
        state = _checkpoint(
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("v").alias("id"), "label")
        )
        # same dead-shuffle lifecycle as linkrank_raw — see _gc_nudge
        _gc_nudge(state, n)
    return state
