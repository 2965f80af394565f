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
    analyticsq,
    compq,
    corpusq,
    crawlq,
    curationq,
    dedupq,
    fingerq,
    formatq,
    graph,
    joinsq,
    mmq,
    nutchq,
    pipelineq,
    prepq,
    relational,
    searchq,
    simq,
    storageq,
    streamq,
    textq,
    textsrcq,
    urlq,
    warcq,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
for _m in (
    corpusq, compq, pipelineq, analyticsq, prepq, formatq,
    nutchq, streamq, mmq, joinsq, textsrcq, searchq, curationq,
    graph, relational, textq, dedupq, fingerq, simq, storageq, urlq, warcq,
    crawlq,
):
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)

# Registry order is a contract, not cosmetics: the driver's correctness gate
# evaluates queries in insertion order and (observed r1→r2) records at most
# the first 50.  Round 2 appended 20 new queries at the end and none reached
# the driver file.  Keys that have never been driver-verified therefore go
# FIRST; keys already green in CORRECTNESS_r01/r02 follow.  If the driver has
# no cap, ordering is irrelevant and all 70 are checked either way.
_NEVER_DRIVER_VERIFIED = [
    # ROUND 8 rotation (tools/rotate_registry.py over CORRECTNESS_r01-r07):
    # all 45 round-7 gate keys came back green, so the cumulative
    # driver-verified count is 293/293 and this list RESET TO EMPTY.
    # New round-8 queries are appended here as they ship, keeping the list
    # <= the driver's 50-key gate so every key gets a driver CORRECTNESS
    # row this round.
    "mm_webp_lossy_meta", "mm_webp_lossy_header",
    "events_mann_whitney", "events_path_topk", "events_gaps_islands",
    "graph_bipartite_project", "mm_avi_meta", "text_hashing_vectorizer",
    "sketch_bloom_fpp", "embed_knn_graph",
    "graph_rich_club", "text_heaps_law", "text_burstiness",
    "rel_cdc_hashdiff", "events_lorenz_gini", "embed_silhouette",
    "text_tokenizer_fertility", "text_code_detect", "embed_centroid_drift",
    "rel_interval_coalesce", "graph_reciprocity",
    "events_autocorr", "events_late_arrivals", "rel_fk_orphans",
    "sketch_hll_error_eval", "mm_format_detect",
    "events_time_to_convert", "events_dau_mau", "simsearch_maxdot",
]
QUERIES = {
    **{k: QUERIES[k] for k in _NEVER_DRIVER_VERIFIED},
    **QUERIES,
}
