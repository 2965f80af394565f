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
import time

import pytest
from pyspark.sql import functions as F

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _drain_persistent(spark, baseline: int, timeout_s: float = 60.0) -> int:
    """GC driver + JVM until the persistent-RDD map returns to ``baseline``
    (ContextCleaner cleanup of dead localCheckpoint blocks is async, and
    py4j detaches dead JVM references lazily — hence the finalization
    nudge and the generous window)."""
    deadline = time.time() + timeout_s
    n = _n_persistent(spark)
    while n > baseline and time.time() < deadline:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext._jvm.System.runFinalization()
        time.sleep(0.5)
        n = _n_persistent(spark)
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
]


@pytest.mark.parametrize("key", QUERY_KEYS)
def test_no_cached_relation_outlives_the_result(spark, key):
    from giranking_spark.queries import QUERIES

    spark.catalog.clearCache()
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    baseline = _drain_persistent(spark, 0)
    df = QUERIES[key](spark, SF_SMALL)
    df.write.format("noop").mode("overwrite").save()
    # while the caller holds the result, only result-sized checkpoint
    # blocks may remain — the big fingerprint/edge relations were
    # explicitly unpersisted before return (their map entries are removed
    # synchronously), so the live set is bounded per call, not per session
    del df
    n = _drain_persistent(spark, baseline)
    assert n <= baseline, (
        f"{key}: {n - baseline} persisted RDDs outlive the dropped result "
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
