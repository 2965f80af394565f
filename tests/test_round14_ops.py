"""Round-14 optimization pins.

1. Unpersist discipline (r13 VERDICT item): the query-level persists added
   in r13 (fingerprint winnow/substring, dedup_recall_eval, the simq
   _recall_summary gates, text_dsir_weights, and the wedge-family caches)
   must not leave a cached relation behind once the caller drops the
   result — a 1000-query library session must not accumulate one persisted
   relation per call. The pattern under test: persist the reused relation,
   eagerly materialize the (result-sized) output via localCheckpoint,
   unpersist the big relation before returning; the output's checkpoint
   blocks die with the DataFrame via the ContextCleaner.

2. The wedge self-join shape: the r14 collect_list + combination-explode
   variant measured 2-2.6x SLOWER than the codegen'd self-join (interpreted
   higher-order array lambdas + per-pair slice copies), so the pair stage
   must stay a join on the shared-center key, hub-pruned before the
   quadratic stage.
"""

from __future__ import annotations

import gc
import os

import pytest

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


def _n_leaked(spark) -> int:
    """Persisted RDDs that are NOT localCheckpoint blocks.

    This is exactly the leak class: a ``.persist()`` without a matching
    ``.unpersist()`` keeps its map entry forever, and ``unpersist()``
    removes the entry synchronously — so this count is deterministic,
    needing no GC/drain loop. localCheckpoint blocks are excluded: their
    lifecycle is the ContextCleaner's documented die-with-the-DataFrame
    contract, which is asynchronous by design."""
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    n = 0
    while it.hasNext():
        if not it.next()._2().isLocallyCheckpointed():
            n += 1
    return n


QUERY_KEYS = [
    "dedup_winnow_pairs",
    "dedup_substring_run",
    "dedup_recall_eval",
    "embed_recall_at_k",
    "text_dsir_weights",
    "graph_adamic_adar",
    "graph_bipartite_project",
    "graph_feature_agg",
    "graph_neighbor_jaccard",
    # the r14 second wave: pre-r13 leaks found by auditing every
    # query-level persist for a matching unpersist
    "corpus_pipeline",
    "text_pmi",
    "simsearch_recall",
    "text_quality_deciles",
    "search_hybrid_rrf",
    "graph_transitivity",
]


@pytest.mark.parametrize("key", QUERY_KEYS)
def test_no_cached_relation_outlives_the_result(spark, key):
    """Every ``.persist()`` a query takes must be released by the time it
    returns: after building AND forcing the query, the count of
    persisted-non-checkpoint RDDs is back at its baseline. ``unpersist()``
    removes the map entry synchronously, so this needs no GC/drain loop —
    a leak (the r13 persist-without-unpersist pattern) deterministically
    leaves its relations in the map."""
    from giranking_spark.queries import QUERIES

    spark.catalog.clearCache()
    gc.collect()
    base = _n_leaked(spark)
    df = QUERIES[key](spark, SF_SMALL)
    df.write.format("noop").mode("overwrite").save()
    n = _n_leaked(spark)
    assert n <= base, (
        f"{key}: {n - base} persisted relations outlive the call "
        "(cache leak — the r13 persist-without-unpersist regression)"
    )


def test_wedge_pair_stage_is_codegen_join_not_hof_explode(spark):
    """The pair stage must be a self-join on the shared-center key; the
    measured-slower interpreted combination explode must not come back."""
    from giranking_spark.queries.compq import (
        q_graph_adamic_adar,
        q_graph_bipartite_project,
    )

    for fn in (q_graph_adamic_adar, q_graph_bipartite_project):
        df = fn(spark, SF_SMALL)
        # the returned plan is an eagerly checkpointed result; the honest
        # shape evidence is the code itself plus this execution check —
        # assert no higher-order transform/slice lambda ran (they would
        # appear in the analyzed plan of a lazy build, so rebuild the
        # module-level SQL-free way: source inspection)
        import inspect

        src = inspect.getsource(fn)
        # match expression usage, not the docstring's history note
        assert "flatten(transform(" not in src, fn.__name__
        assert "F.collect_list(" not in src, fn.__name__
        assert df.count() > 0
    spark.catalog.clearCache()
