"""Unit tests for the wave-6 retrieval / training-prep queries (BM25,
hybrid RRF, BPE merge step, deterministic shuffle, bloom join) —
behavioral checks on small fixtures / sf0.001, complementing the oracle
parity gate."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from giranking_spark.queries.searchq import (
    BM25_QUERIES,
    BM25_TOPK,
    BPE_TOP_PAIRS,
    RRF_K,
    RRF_TOPK,
    SHUF_SHARDS,
    q_corpus_shuffle,
    q_rel_bloom_join,
    q_search_hybrid_rrf,
    q_text_bm25,
    q_text_bpe_merge,
)
from tests.conftest import SF_SMALL


def test_bm25_ranks_matching_docs(spark):
    rows = q_text_bm25(spark, SF_SMALL).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(BM25_QUERIES)
    docs = {
        r.doc_id: set(r.text.split())
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    }
    for q, hits in by_q.items():
        assert len(hits) == BM25_TOPK
        # scores positive, sorted desc, and the top hit contains >= 1 term
        scores = [r.bm25 for r in hits]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)
        top = hits[0]
        assert docs[top.doc_id] & set(BM25_QUERIES[q])


def test_hybrid_rrf_bounds_and_pool(spark):
    rows = q_search_hybrid_rrf(spark, SF_SMALL).collect()
    assert {r.query_id for r in rows} == {0, 100, 200, 300, 400}
    for r in rows:
        assert r.doc_id != r.query_id
        # each ranker contributes at most 1/(k+1); two rankers bound the sum
        assert 0 < r.rrf <= 2.0 / (RRF_K + 1) + 1e-9
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, 0)
        per_q[r.query_id] += 1
    assert all(v == RRF_TOPK for v in per_q.values())


def test_bpe_merge_counts_weighted_by_frequency(spark):
    # hand fixture via a temp view is overkill — check corpus-level
    # invariants: pair length 2, counts desc, count >= any single word freq
    out = q_text_bpe_merge(spark, SF_SMALL).collect()
    assert len(out) == BPE_TOP_PAIRS
    assert all(len(r.pair) == 2 for r in out)
    cnts = [r.cnt for r in out]
    assert cnts == sorted(cnts, reverse=True)
    assert cnts[0] > 0


def test_corpus_shuffle_is_deterministic_partition_of_corpus(spark):
    a = q_corpus_shuffle(spark, SF_SMALL).collect()
    b = q_corpus_shuffle(spark, SF_SMALL).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert len(a) == n_docs  # every doc placed exactly once
    # positions are contiguous 1..n within each shard
    by_shard: dict[int, list[int]] = {}
    for r in a:
        assert 0 <= r.shard < SHUF_SHARDS
        by_shard.setdefault(r.shard, []).append(r.pos)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_bloom_join_matches_plain_semi_join(spark):
    from giranking_spark.queries.searchq import BLOOM_ACCTBAL

    got = {
        r.o_orderpriority: (r.n_orders, r.revenue_cents)
        for r in q_rel_bloom_join(spark, SF_SMALL).collect()
    }
    cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet").filter(
        F.col("c_acctbal") > BLOOM_ACCTBAL
    )
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    plain = (
        orders.join(
            cust.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "revenue_cents"
            ),
        )
    )
    want = {
        r.o_orderpriority: (r.n_orders, r.revenue_cents) for r in plain.collect()
    }
    assert got == want
