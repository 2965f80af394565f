"""Connected components over the ranking graph (extension surface).

Hash-min label propagation: every vertex starts labeled with its own id and
repeatedly adopts the minimum label in its closed neighborhood until no label
changes. On convergence each component is labeled by its lexicographically
smallest member — a deterministic, engine-independent canonical label, which
is what makes an exact DuckDB oracle possible (recursive CTE over the same
undirected edge set; queries/compq.py).

Scale notes:
- Per iteration: one shuffle (groupBy dst of the propagated labels) + one
  join back to state; lineage is truncated every step with the same
  localCheckpoint/reliable-checkpoint discipline as the rank loop
  (operators/linkrank.py:_checkpoint) — state_{i+1} references state_i
  twice, so an uncheckpointed plan grows exponentially.
- Iteration count is bounded by the graph diameter. For web/host graphs the
  effective diameter is small (tens); for adversarial chain graphs the
  large-star/small-star transform (Kiveris et al., "Connected Components in
  MapReduce and Beyond") drops rounds to O(log n) — documented follow-up,
  not needed at current diameters.
- The convergence test ships ONE scalar (changed-label count) to the driver
  per iteration, same contract as the rank loop's aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from giranking_spark.operators.linkrank import _checkpoint, _set_checkpoint_dir_once

#: hard cap on propagation rounds — a backstop against pathological
#: diameters, far above any web-graph effective diameter.
MAX_ITERATIONS = 50


def undirected_edges(edges: DataFrame) -> DataFrame:
    """Symmetrize (src, dst): union with the reversed edges, distinct."""
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionByName(rev).distinct()


def connected_components(
    edges: DataFrame,
    max_iterations: int = MAX_ITERATIONS,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(id, component) — component = min member id, exact fixpoint.

    ``edges`` is treated as undirected. Vertices are implicit (every id
    appearing as src or dst), matching the rank loop's implicit-vertex
    semantics (operators/linkrank.py).
    """
    und = undirected_edges(edges).persist()
    state = (
        und.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
    )
    reliable = _set_checkpoint_dir_once(state, checkpoint_dir)
    state = _checkpoint(state, reliable)
    for _ in range(max_iterations):
        # min incoming neighbor label per vertex (shuffle #1: groupBy dst)
        incoming = (
            und.join(state, und.src == state.id)
            .groupBy("dst")
            .agg(F.min("component").alias("nbr_min"))
        )
        nxt = (
            state.join(incoming, state.id == incoming.dst, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("nbr_min"), F.col("component")) < F.col("component")).alias(
                    "_changed"
                ),
            )
        )
        nxt = _checkpoint(nxt, reliable)
        changed = nxt.filter(F.col("_changed")).count()
        state = nxt.drop("_changed")
        if changed == 0:
            break
    und.unpersist()
    return state


def component_sizes(components: DataFrame) -> DataFrame:
    """(component, n_members) per component, largest first."""
    return (
        components.groupBy("component")
        .agg(F.count("*").alias("n_members"))
        .orderBy(F.col("n_members").desc(), F.col("component").asc())
    )


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(id, dist) — undirected hop distance from the seed set, multi-source
    BFS by min-distance propagation; only reached vertices appear.

    ``max_depth`` is a CONTRACT, not just a safety valve: vertices farther
    than max_depth hops are absent, which is also exactly what the
    depth-bounded recursive-CTE oracle computes — parity holds by
    construction at any depth cutoff. Per level: one groupBy shuffle + one
    outer join, lineage checkpoint-truncated like the rank loop; converges
    in eccentricity(seeds) rounds, far under the cap on web-shaped graphs.
    """
    und = undirected_edges(edges).persist()
    state = seeds.select("id", F.lit(0).cast("long").alias("dist"))
    reliable = _set_checkpoint_dir_once(state, checkpoint_dir)
    state = _checkpoint(state, reliable)
    for _ in range(max_depth):
        nbr = (
            und.join(state, und.src == state.id)
            .groupBy("dst")
            .agg((F.min("dist") + 1).alias("nd"))
        )
        merged = state.join(nbr, state.id == nbr.dst, "full").select(
            F.coalesce(state.id, nbr.dst).alias("id"),
            F.least(
                F.coalesce(state.dist, nbr.nd), F.coalesce(nbr.nd, state.dist)
            ).alias("dist"),
            (state.dist.isNull() | (nbr.nd < state.dist)).alias("_changed"),
        )
        merged = _checkpoint(merged, reliable)
        changed = merged.filter(F.col("_changed")).count()
        state = merged.drop("_changed")
        if changed == 0:
            break
    und.unpersist()
    return state
