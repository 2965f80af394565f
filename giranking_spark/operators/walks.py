"""Deterministic random-walk corpus generation (DeepWalk / node2vec prep).

Graph-embedding training consumes a corpus of random walks; at 100 TB the
walk generation itself must be a distributed join pipeline, not a
per-vertex loop.  Each step is ONE *selective* equi-join against the
adjacency index: the walker at vertex ``cur`` already carries ``deg``
(the out-degree of ``cur``), computes neighbor index
``pick = H(walk_id, step) mod deg`` map-side, and equi-joins on the
COMPOSITE key ``(src, idx) = (cur, pick)`` — so a hub vertex with 10^6
out-edges contributes exactly ONE row per walker per step, never a
degree-sized fan-out.  H is the engine's portable md5 hash family
(functions/hashing.py); hash-driven selection makes the walks
deterministic — reproducible across runs AND expressible in plain SQL, so
the whole corpus is oracle-checkable (no seeded RNG divergence between
engines).

Scale shape: the adjacency index (src, dst, idx, next_deg) is built with
one window shuffle, carries the DESTINATION's out-degree (so the state a
step produces already knows the degree the NEXT pick needs — no separate
degree join), is persisted, and is re-joined once per step.  L steps =
L equi-joins of the (one row per walker) state against adjacency on
(src, idx).  On a cluster the adjacency would be bucketed by src so every
step's join co-locates.  Walks from dangling vertices simply stop (null
next_deg → null pick → inner join drops them) — the walk corpus keeps
variable lengths, like any real sampler.

All per-step caches and the adjacency index are unpersisted before
returning: the result is materialized via an eager localCheckpoint, so it
stays valid after cleanup and never re-executes the join chain.
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


def random_walks(
    edges: DataFrame,
    length: int,
    materialize: bool = True,
    persisted_out: list[DataFrame] | None = None,
) -> DataFrame:
    """One walk per distinct vertex with out-edges; ``length`` hash-driven
    steps.  Returns (walk_id, step, node) rows — step 0 is the start
    vertex; walks that hit a dangling vertex end early.

    ``materialize=False`` skips the eager localCheckpoint + cache cleanup
    and returns the lazy plan (for plan-shape tests); pass ``persisted_out``
    (an empty list) to receive the persisted intermediates (adjacency + per-
    step states) so they can be ``unpersist()``-ed individually once the
    plan is done — without it the only cleanup is the blunt
    ``spark.catalog.clearCache()``, which evicts unrelated caches in a
    shared session."""
    # ONE pass over the (possibly expensive) edge lineage: the persisted
    # adjacency window feeds both the degree relation and the step index
    adj0 = adjacency_index(edges).persist()
    degs = adj0.groupBy("src").agg(F.max("deg").alias("deg"))
    # attach the destination's out-degree: the state row a step emits then
    # already carries the degree the NEXT step's pick needs, so every step
    # is exactly one (src, idx)-keyed equi-join — no degree fan-out
    nxt = degs.select(F.col("src").alias("dst"), F.col("deg").alias("next_deg"))
    # persisted PRE-PARTITIONED on the step-join key: the cached relation
    # keeps its hashpartitioning(src, idx), so every step's equi-join
    # shuffles only the one-row-per-walker state side — the (large)
    # adjacency is shuffled exactly once, at build
    adj = (
        adj0.select("src", "dst", "idx")
        .join(nxt, "dst", "left")
        .repartition("src", "idx")
        .persist()
    )
    state = degs.select(
        F.col("src").alias("walk_id"), F.col("src").alias("cur"), "deg"
    )
    frames = [
        state.select(
            "walk_id", F.lit(0).cast("int").alias("step"), F.col("cur").alias("node")
        )
    ]
    persisted: list[DataFrame] = [adj0, adj]
    for k in range(1, length + 1):
        # map-side pick over the walker's own (cur, deg) — 1 row per walker
        pick = md5_u32(F.concat_ws(":", "walk_id", F.lit(str(k)))) % F.col("deg")
        # persist per step: the output union references every state once —
        # without this, union branch k re-executes joins 1..k (quadratic)
        state = (
            state.withColumn("pick", pick)
            .join(adj, (F.col("cur") == adj.src) & (F.col("pick") == adj.idx))
            .select(
                "walk_id",
                F.col("dst").alias("cur"),
                F.col("next_deg").alias("deg"),
            )
            .persist()
        )
        persisted.append(state)
        frames.append(
            state.select(
                "walk_id",
                F.lit(k).cast("int").alias("step"),
                F.col("cur").alias("node"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    if persisted_out is not None:
        persisted_out.extend(persisted)
    if not materialize:
        return out
    # materialize, then release every intermediate cache (adjacency + all
    # step states) — callers get a self-contained result and executor
    # storage does not leak across invocations
    out = out.localCheckpoint(eager=True)
    for df in persisted:
        df.unpersist()
    return out
