"""Deterministic random-walk corpus generation (DeepWalk / node2vec prep).

Graph-embedding training consumes a corpus of random walks; at 100 TB the
walk generation itself must be a distributed join pipeline, not a
per-vertex loop.  Each step is ONE equi-join against the adjacency list:
the walker at vertex ``cur`` picks neighbor index ``H(walk_id, step) mod
degree``, where H is the engine's portable md5 hash family
(functions/hashing.py).  Hash-driven selection makes the walks
deterministic — reproducible across runs AND expressible in plain SQL, so
the whole corpus is oracle-checkable (no seeded RNG divergence between
engines).

Scale shape: the adjacency list (src, dst, idx, deg) is built with one
window shuffle, persisted, and re-joined once per step — L steps = L
shuffle joins of the (walks × 1) state against adjacency.  On a cluster
the adjacency would be bucketed by src so every step's join co-locates.
Walks from dangling vertices simply stop (inner join drops them) — the
walk corpus keeps variable lengths, like any real sampler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from giranking_spark.functions.hashing import md5_u32


def adjacency_index(edges: DataFrame) -> DataFrame:
    """(src, dst, idx, deg): neighbors of each vertex numbered 0..deg-1 in
    deterministic (sorted-dst) order, degree attached — the indexable
    adjacency list the per-step pick joins against."""
    w = Window.partitionBy("src").orderBy("dst")
    return edges.select(
        "src",
        "dst",
        (F.row_number().over(w) - F.lit(1)).alias("idx"),
        F.count(F.lit(1)).over(Window.partitionBy("src")).alias("deg"),
    )


def random_walks(edges: DataFrame, length: int) -> DataFrame:
    """One walk per distinct vertex with out-edges; ``length`` hash-driven
    steps.  Returns (walk_id, step, node) rows — step 0 is the start
    vertex; walks that hit a dangling vertex end early."""
    adj = adjacency_index(edges).persist()
    state = adj.select(F.col("src").alias("walk_id")).distinct().select(
        "walk_id", F.col("walk_id").alias("cur")
    )
    out = state.select(
        "walk_id", F.lit(0).cast("int").alias("step"), F.col("cur").alias("node")
    )
    for k in range(1, length + 1):
        pick = md5_u32(F.concat_ws(":", "walk_id", F.lit(str(k)))) % F.col("deg")
        # persist per step: the output union references every state once —
        # without this, union branch k re-executes joins 1..k (quadratic)
        state = (
            state.join(adj, state.cur == adj.src)
            .filter(F.col("idx") == pick)
            .select("walk_id", F.col("dst").alias("cur"))
            .persist()
        )
        out = out.unionByName(
            state.select(
                "walk_id",
                F.lit(k).cast("int").alias("step"),
                F.col("cur").alias("node"),
            )
        )
    return out
