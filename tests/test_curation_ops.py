"""Unit tests for the curation-wave operators (SemDeDup, weighted SSSP) —
behavioral checks on hand-built fixtures, complementing the oracle gate."""

from __future__ import annotations

from giranking_spark.operators.components import sssp_distances
from giranking_spark.operators.similarity import semdedup


def _wedges(spark, rows):
    return spark.createDataFrame(rows, "src STRING, dst STRING, w LONG")


def _seeds(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id STRING")


def test_sssp_prefers_cheap_two_hop_over_expensive_direct(spark):
    e = _wedges(spark, [("a", "b", 5), ("b", "c", 1), ("a", "c", 10)])
    dist = {r.id: r.dist for r in sssp_distances(e, _seeds(spark, ["a"])).collect()}
    assert dist == {"a": 0, "b": 5, "c": 6}


def test_sssp_hop_bound_is_a_contract(spark):
    # with only 1 relaxation round the 2-edge path to c is invisible
    e = _wedges(spark, [("a", "b", 5), ("b", "c", 1), ("a", "c", 10)])
    dist = {
        r.id: r.dist
        for r in sssp_distances(e, _seeds(spark, ["a"]), max_rounds=1).collect()
    }
    assert dist == {"a": 0, "b": 5, "c": 10}


def test_sssp_multi_source_takes_nearest_seed_and_skips_unreached(spark):
    e = _wedges(spark, [("a", "b", 2), ("c", "b", 1), ("x", "y", 1)])
    dist = {
        r.id: r.dist
        for r in sssp_distances(e, _seeds(spark, ["a", "c"])).collect()
    }
    assert dist == {"a": 0, "c": 0, "b": 1}  # via c; x/y unreached -> absent


def test_sssp_is_undirected(spark):
    e = _wedges(spark, [("b", "a", 3)])
    dist = {r.id: r.dist for r in sssp_distances(e, _seeds(spark, ["a"])).collect()}
    assert dist == {"a": 0, "b": 3}


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")


def test_semdedup_drops_higher_id_duplicate_keeps_lowest(spark):
    # 2 exact duplicate pairs + 1 orthogonal singleton
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 1.0, 0.0]),
        (5, [0.0, 0.0, 1.0]),
    ]
    out = {r.vec_id: r for r in semdedup(_emb(spark, rows), 0.99, c=2, iters=1).collect()}
    assert set(out) == {2, 4}  # the lower id of each pair survives, 5 untouched
    assert out[2].dup_of == 1 and out[4].dup_of == 3
    assert out[2].cos == 1.0


def test_semdedup_chain_keeps_exactly_one_representative(spark):
    # 1~2~3 all mutually similar: 2 and 3 are dropped, 1 survives
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.01]),
        (3, [1.0, 0.02]),
    ]
    out = semdedup(_emb(spark, rows), 0.9, c=1, iters=1).collect()
    dropped = {r.vec_id for r in out}
    assert dropped == {2, 3}
    assert all(r.dup_of < r.vec_id for r in out)


def test_semdedup_below_threshold_drops_nothing(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
    assert semdedup(_emb(spark, rows), 0.5, c=1, iters=1).count() == 0


from giranking_spark.queries.curationq import line_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_line_dedup_removes_cross_doc_repeats_only(spark):
    # 6-word lines; "a b c d e f" appears in both docs -> removed from both;
    # the unique tails stay.
    d = _docs(
        spark,
        [
            (1, "a b c d e f x y z q r s"),
            (2, "a b c d e f u v w m n o"),
        ],
    )
    out = {r.doc_id: r for r in line_dedup(d).collect()}
    assert out[1].n_removed == 1 and out[2].n_removed == 1
    assert out[1].clean_text == "x y z q r s"
    assert out[2].clean_text == "u v w m n o"


def test_line_dedup_within_doc_repeat_survives(spark):
    # the same line twice in ONE doc is 1 distinct doc -> kept both times
    d = _docs(spark, [(1, "a b c d e f a b c d e f")])
    row = line_dedup(d).collect()[0]
    assert row.n_removed == 0
    assert row.clean_text == "a b c d e f\na b c d e f"


def test_line_dedup_fully_boilerplate_doc_keeps_empty_row(spark):
    d = _docs(spark, [(1, "a b c d e f"), (2, "a b c d e f")])
    out = {r.doc_id: r for r in line_dedup(d).collect()}
    assert set(out) == {1, 2}
    assert out[1].clean_text == "" and out[1].n_kept == 0
