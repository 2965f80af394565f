"""Driver-contract query registry.

Each submodule contributes ``QUERIES`` (name -> callable(spark, sf_dir) ->
DataFrame) and ``ORACLES`` (name -> DuckDB SQL). Names are op ids from
SURVEY.md §2 plus the mandated extension ops. Column names/aliases match
between the two sides (driver hashes values after sorting columns by name);
double-typed outputs are rounded to 6 decimals on BOTH sides so cross-engine
float noise cannot break the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from giranking_spark.queries import (
    dedupq,
    graph,
    joinsq,
    mmq,
    nutchq,
    relational,
    simq,
    streamq,
    textq,
    textsrcq,
    urlq,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
for _m in (
    graph, relational, textq, dedupq, simq, urlq, nutchq, streamq, mmq, joinsq, textsrcq
):
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)
