"""Unit tests for the training-pipeline utility operators: deterministic
sampling, KMV/heavy-hitter sketches, PII redaction, connected components."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from giranking_spark.operators.components import connected_components, component_sizes
from giranking_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
    train_test_split,
)
from giranking_spark.operators.sketches import heavy_hitters, kmv_distinct
from giranking_spark.operators.textops import redact_pii


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "doc_id")


def test_hash_sample_partition_invariant(spark, ids):
    """The selected id set must not depend on physical partitioning —
    the property DataFrame.sample does NOT have."""
    a = {r.doc_id for r in hash_sample(ids, "doc_id", 300_000).collect()}
    b = {
        r.doc_id
        for r in hash_sample(ids.repartition(13), "doc_id", 300_000).collect()
    }
    assert a == b
    # rate is approximate but must be in the right ballpark at n=2000
    assert 0.2 < len(a) / 2000 < 0.4


def test_train_test_split_total_and_disjoint(spark, ids):
    out = train_test_split(ids, "doc_id", 200_000).collect()
    assert len(out) == 2000
    splits = {r.split for r in out}
    assert splits == {"train", "test"}
    # split assignment agrees with hash_sample at the same threshold
    test_ids = {r.doc_id for r in out if r.split == "test"}
    assert test_ids == {r.doc_id for r in hash_sample(ids, "doc_id", 200_000).collect()}


def test_stratified_sample_exact_counts(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, lang=("en" if i % 3 else "de")) for i in range(300)]
    )
    out = stratified_sample(df, "lang", "doc_id", 25).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert len(by_lang["en"]) == 25 and len(by_lang["de"]) == 25
    # deterministic: same selection on re-run with different partitioning
    out2 = stratified_sample(df.repartition(7), "lang", "doc_id", 25).collect()
    assert {(r.lang, r.doc_id) for r in out} == {(r.lang, r.doc_id) for r in out2}


def test_kmv_exact_when_k_exceeds_distinct(spark):
    df = spark.createDataFrame([Row(v=i % 37) for i in range(500)])
    row = kmv_distinct(df, "v", 256).collect()[0]
    assert row.k_used == 37
    assert row.est_distinct == 37.0


def test_kmv_estimate_within_tolerance(spark):
    n = 5000
    df = spark.range(0, n).withColumnRenamed("id", "v")
    row = kmv_distinct(df, "v", 256).collect()[0]
    assert row.k_used == 256
    # KMV relative error ~ 1/sqrt(k-1) ≈ 6.3%; allow 4 sigma
    assert abs(row.est_distinct - n) / n < 0.25


def test_heavy_hitters(spark):
    rows = [Row(v="a")] * 50 + [Row(v="b")] * 10 + [Row(v="c")] * 3
    out = heavy_hitters(spark.createDataFrame(rows), "v", 10).collect()
    assert [(r.value, r.cnt) for r in out] == [("a", 50), ("b", 10)]


def test_redact_pii(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="mail bob.smith+x@corp.example.org now"),
            Row(doc_id=2, text="server at 192.168.0.1 port 80"),
            Row(doc_id=3, text="call 555-867-5309 or 555.123.4567"),
            Row(doc_id=4, text="nothing sensitive here"),
        ]
    )
    out = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert out[1].clean_text == "mail <EMAIL> now"
    assert out[2].clean_text == "server at <IP> port 80"
    assert out[3].clean_text == "call <PHONE> or <PHONE>"
    assert [out[i].n_redacted for i in (1, 2, 3, 4)] == [1, 1, 2, 0]


def test_connected_components_two_islands(spark):
    edges = spark.createDataFrame(
        [
            Row(src="b", dst="a"),
            Row(src="b", dst="c"),
            Row(src="c", dst="d"),  # island 1: a b c d  -> 'a'
            Row(src="z", dst="y"),
            Row(src="y", dst="x"),  # island 2: x y z    -> 'x'
        ]
    )
    comp = {r.id: r.component for r in connected_components(edges).collect()}
    assert comp == {
        "a": "a", "b": "a", "c": "a", "d": "a",
        "x": "x", "y": "x", "z": "x",
    }
    sizes = {r.component: r.n_members for r in component_sizes(
        connected_components(edges)).collect()}
    assert sizes == {"a": 4, "x": 3}


def test_connected_components_chain_converges(spark):
    # worst-case diameter for the iteration count: a 12-node path
    edges = spark.createDataFrame(
        [Row(src=f"n{i:02d}", dst=f"n{i + 1:02d}") for i in range(11)]
    )
    comp = {r.id: r.component for r in connected_components(edges).collect()}
    assert set(comp.values()) == {"n00"}
    assert len(comp) == 12


def test_bfs_distances_levels_and_cutoff(spark):
    # path graph s-a-b-c-d; seed {s}; cutoff at depth 2 must drop c,d
    from giranking_spark.operators.components import bfs_distances

    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in
         [("s", "a"), ("a", "b"), ("b", "c"), ("c", "d")]]
    )
    seeds = spark.createDataFrame([Row(id="s")])
    full = {r.id: r.dist for r in bfs_distances(edges, seeds, 20).collect()}
    assert full == {"s": 0, "a": 1, "b": 2, "c": 3, "d": 4}
    capped = {r.id: r.dist for r in bfs_distances(edges, seeds, 2).collect()}
    assert capped == {"s": 0, "a": 1, "b": 2}


def test_salted_sum_matches_plain_groupby(spark):
    from pyspark.sql import functions as F

    from giranking_spark.operators.skew import salted_sum

    # heavy skew: 90% of rows share one key
    df = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        (F.col("id") % 97).alias("v"),
    ).repartition(8)
    salted = {r.k: r.total for r in salted_sum(df, ["k"], "v").collect()}
    plain = {r.k: r.s for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    assert salted == plain


def test_build_vocab_rank_and_bound(spark):
    from giranking_spark.operators.textops import build_vocab

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="b b b a a c"), Row(doc_id=2, text="a b d")]
    )
    out = {r.word: (r.cnt, r.vocab_id) for r in build_vocab(docs, 3).collect()}
    # b:4 a:3 c:1/d:1 -> top-3 keeps b, a, then c (tie broken by word)
    assert out == {"b": (4, 1), "a": (3, 2), "c": (1, 3)}


def test_global_running_offset_sparse_ids_and_no_global_window(spark):
    """Two-phase prefix sum equals the naive cumsum on sparse, shuffled ids,
    and the physical plan never runs a window over an un-partitioned
    (single-task) exchange of the full relation."""
    import random

    from pyspark.sql import functions as F

    from giranking_spark.operators.packing import global_running_offset

    rng = random.Random(7)
    rows = [(i * 37 + rng.randrange(5), rng.randrange(0, 50)) for i in range(500)]
    rows = list({r[0]: r for r in rows}.values())  # unique sparse ids
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "doc_id long, n long").repartition(11)

    out = global_running_offset(df, "doc_id", "n", n_buckets=16)
    got = {r.doc_id: r.start_off for r in out.collect()}
    acc = 0
    for doc_id, n in sorted(rows):
        assert got[doc_id] == acc, doc_id
        acc += n

    # the only SinglePartition window allowed is the one over the bounded
    # n_buckets relation — identifiable by its tiny input aggregate; the
    # full-relation window must be hash-partitioned on the bucket column
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__b" in plan


def test_pack_offsets_chunk_spans(spark):
    from giranking_spark.operators.packing import pack_offsets

    df = spark.createDataFrame(
        [(1, 100), (2, 500), (3, 0), (4, 30)], "doc_id long, n long"
    )
    out = {r.doc_id: r for r in pack_offsets(df, "doc_id", "n", ctx=256).collect()}
    # doc1: [0,100) -> chunk 0 only; doc2: [100,600) -> chunks 0..2;
    # doc3: empty; doc4: [600,630) -> chunk 2
    assert (out[1].chunk_first, out[1].chunk_last, out[1].n_chunks) == (0, 0, 1)
    assert (out[2].chunk_first, out[2].chunk_last, out[2].n_chunks) == (0, 2, 3)
    assert (out[3].chunk_first, out[3].chunk_last, out[3].n_chunks) == (None, None, 0)
    assert (out[4].chunk_first, out[4].chunk_last, out[4].n_chunks) == (2, 2, 1)
    assert out[4].start_off == 600
