"""Connected-components queries with a recursive-CTE DuckDB oracle.

The Spark side runs the iterative hash-min fixpoint
(operators/components.py); the oracle computes the same canonical labeling
(component = lexicographically smallest reachable id) via WITH RECURSIVE
reachability over the identical undirected edge set — two genuinely
different algorithms agreeing value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from giranking_spark.operators.components import component_sizes, connected_components
from giranking_spark.queries.graph import EDGES_SQL
from giranking_spark.sources.tables import derive_edges

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


QUERIES = {
    "graph_components": q_graph_components,
    "graph_component_sizes": q_graph_component_sizes,
}

ORACLES = {
    "graph_components": f"{_REACH_SQL} SELECT id, component FROM comp",
    "graph_component_sizes": (
        f"{_REACH_SQL} "
        "SELECT component, CAST(count(*) AS BIGINT) AS n_members "
        "FROM comp GROUP BY component"
    ),
}
