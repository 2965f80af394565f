"""Connected-components queries with a recursive-CTE DuckDB oracle.

The Spark side runs the iterative hash-min fixpoint
(operators/components.py); the oracle computes the same canonical labeling
(component = lexicographically smallest reachable id) via WITH RECURSIVE
reachability over the identical undirected edge set — two genuinely
different algorithms agreeing value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from giranking_spark.operators import linkrank as lr
from giranking_spark.operators.components import (
    bfs_distances,
    component_sizes,
    connected_components,
)
from giranking_spark.queries.graph import EDGES_SQL, TRUSTED_PRED
from giranking_spark.sources.tables import derive_edges

#: shared Spark/oracle depth cutoff — parity by construction (see
#: operators/components.py:bfs_distances)
BFS_MAX_DEPTH = 20

_REACH_SQL = (
    f"WITH RECURSIVE edges AS MATERIALIZED ({EDGES_SQL}), "
    "und AS MATERIALIZED (SELECT src, dst FROM edges "
    "UNION SELECT dst AS src, src AS dst FROM edges), "
    "verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM und), "
    "r AS (SELECT id AS v, id AS lbl FROM verts "
    "UNION SELECT u.dst AS v, r.lbl FROM r JOIN und u ON u.src = r.v), "
    "comp AS (SELECT v AS id, min(lbl) AS component FROM r GROUP BY v)"
)


def q_graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    return connected_components(derive_edges(spark, sf_dir))


def q_graph_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return component_sizes(connected_components(derive_edges(spark, sf_dir)))


def q_graph_bfs_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distance from the TrustRank seed set — the
    'distance from trusted core' spam signal (Gyöngyi et al., TrustRank)."""
    e = derive_edges(spark, sf_dir)
    seeds = lr.all_vertex_ids(None, e).filter(
        (F.substring("id", 1, 1) == "c")
        & (F.substring("id", 2, 100).cast("long") % 10 == 0)
    )
    return bfs_distances(e, seeds, BFS_MAX_DEPTH)


QUERIES = {
    "graph_components": q_graph_components,
    "graph_component_sizes": q_graph_component_sizes,
    "graph_bfs_dist": q_graph_bfs_dist,
}

ORACLES = {
    "graph_components": f"{_REACH_SQL} SELECT id, component FROM comp",
    "graph_component_sizes": (
        f"{_REACH_SQL} "
        "SELECT component, CAST(count(*) AS BIGINT) AS n_members "
        "FROM comp GROUP BY component"
    ),
    "graph_bfs_dist": (
        f"WITH RECURSIVE edges AS MATERIALIZED ({EDGES_SQL}), "
        "und AS MATERIALIZED (SELECT src, dst FROM edges "
        "UNION SELECT dst AS src, src AS dst FROM edges), "
        "verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM und), "
        f"seeds AS MATERIALIZED (SELECT id FROM verts WHERE {TRUSTED_PRED}), "
        "r AS (SELECT id AS v, 0 AS d FROM seeds "
        "UNION SELECT u.dst AS v, r.d + 1 AS d FROM r JOIN und u ON u.src = r.v "
        f"WHERE r.d < {BFS_MAX_DEPTH}) "
        "SELECT v AS id, CAST(min(d) AS BIGINT) AS dist FROM r GROUP BY v"
    ),
}
