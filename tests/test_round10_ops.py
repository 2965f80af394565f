"""Round-10 regression pins: the ADVICE-r9 fixes (short-doc sequence
guard, NaN partial-top-k, VP8 virtual zero bytes, strict gate lookup)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _doc_fixture(spark, tmp_path, texts):
    """Write a documents.parquet with controlled text lengths; returns the
    sf_dir-shaped directory the queries load from."""
    rows = [
        (i, t, "en", "web", len(t)) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _oracle_df(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    return con.execute(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("key", ["text_kgram_profile_js", "text_char_entropy"])
def test_short_doc_sequence_guard_parity(spark, tmp_path, key):
    """Docs shorter than the gram size (incl. empty) must contribute ZERO
    grams/chars on both engines: Spark's sequence(1, 0) descends to [1, 0]
    while DuckDB's generate_series(1, 0) is empty — the exact latent break
    ADVICE r9 flagged. Fixture mixes empty, 1-char, 2-char and normal docs
    so the unguarded version provably mismatches."""
    from giranking_spark.queries import QUERIES, ORACLES

    sf_dir = _doc_fixture(
        spark, tmp_path,
        ["", "a", "ab", "abc", "the quick brown fox", "lorem ipsum dolor"],
    )
    got = _normalize(QUERIES[key](spark, sf_dir).toPandas())
    want = _normalize(_oracle_df(ORACLES[key], sf_dir))
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_partial_topk_drops_nan_on_both_paths(spark):
    """A NaN score (zero-norm vector → cosine 0/0) must neither rank top
    (Spark desc windows order NaN first) nor silently change the trimmed
    vs untrimmed result: _partial_topk now drops NaN rows JVM-side, making
    'NaN never matches' the semantics by construction."""
    from pyspark.sql.window import Window

    from giranking_spark.operators.similarity import _partial_topk

    rows = [(0, n, float(n)) for n in range(1, 6)] + [(0, 99, float("nan"))]
    scored = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, cos double"
    ).repartition(4)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    got = {
        (r["neighbor_id"], r["cos"])
        for r in _partial_topk(scored, 3, "cos")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .collect()
    }
    assert got == {(5, 5.0), (4, 4.0), (3, 3.0)}  # NaN row gone, not top


def test_brute_force_topk_zero_norm_vector(spark):
    """End-to-end: a zero-norm corpus vector must never appear as a
    neighbor (its cosine is NULL via the guard — with ANSI on, the
    unguarded division was a hard DIVIDE_BY_ZERO error), and every query
    still gets k finite neighbors."""
    from giranking_spark.operators.similarity import brute_force_topk

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0]),
         (4, [0.0, 0.0]),  # zero-norm → NaN cosine vs everything
         (5, [0.5, 0.2])],
        "vec_id long, embedding array<double>",
    )
    queries = corpus.filter(F.col("vec_id") == 1)
    out = brute_force_topk(corpus, queries, k=3).collect()
    ids = {r["neighbor_id"] for r in out}
    assert 4 not in ids
    assert len(out) == 3
    assert all(r["cos"] == r["cos"] for r in out)  # all finite


def test_bool_decoder_tolerates_bounded_virtual_zeros():
    """libvpx legally reads a few virtual zero bytes past a partition's end
    (VP8_LOTS_OF_BITS); the decoder must serve a small bounded number of
    implicit zeros before declaring the stream corrupt."""
    from giranking_spark.operators.webp import _BoolDecoder

    d = _BoolDecoder(b"\x80\x00")
    # 2-byte stream: value window is fully primed; each literal(8) consumes
    # renormalization shifts that eventually read past the end. The first
    # several past-the-end bytes must decode as zeros, not raise.
    vals = [d.literal(8) for _ in range(4)]
    assert len(vals) == 4  # got here without raising
    # ...but an unbounded run must still be rejected as corrupt.
    with pytest.raises(ValueError, match="exhausted"):
        for _ in range(64):
            d.literal(8)


def test_gate_rotation_names_all_exist():
    """The strict gate lookup: every _NEVER_DRIVER_VERIFIED name resolves
    in the registry (a typo'd key now raises at import, so reaching this
    assertion at all proves the invariant — kept as an explicit pin)."""
    import giranking_spark.queries as q

    missing = [k for k in q._NEVER_DRIVER_VERIFIED if k not in q.QUERIES]
    assert missing == []
    # rotation front-loads the gate: first 50 registry keys == gate list
    assert list(q.QUERIES)[: len(q._NEVER_DRIVER_VERIFIED)] == list(
        q._NEVER_DRIVER_VERIFIED
    )


def test_skyline_production_helper_exists():
    """q_rel_skyline_2d routes through skyline_2d (the helper hand-checked
    tests exercise) — keep them from drifting apart."""
    import inspect

    from giranking_spark.queries import relational

    src = inspect.getsource(relational.q_rel_skyline_2d)
    assert "skyline_2d(o)" in src


# ---- degree-oriented triangles ---------------------------------------------------

def _co(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def test_triangle_relation_known_graphs(spark):
    from giranking_spark.operators.triangles import (
        triangle_edges,
        triangle_relation,
    )

    # K4: 4 triangles; every edge closes one
    k4 = _co(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)])
    assert triangle_relation(k4).count() == 4
    assert triangle_edges(k4).count() == 6
    # star S5: 0 triangles, 0 closing edges
    star = _co(spark, [(0, i) for i in range(1, 6)])
    assert triangle_relation(star).count() == 0
    assert triangle_edges(star).count() == 0
    # triangle + pendant edge: exactly 1 triangle, 3 closing edges
    g = _co(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
    rows = triangle_relation(g).collect()
    assert len(rows) == 1
    assert triangle_edges(g).count() == 3


def test_degree_orientation_bounds_hub_wedges(spark):
    """Adversarial celebrity hub: id-0 vertex connected to 200 leaves plus
    a 3-cycle among leaves. Id-orientation would make C(200,2)=19900
    wedges at the hub; degree orientation gives the hub OUT-degree 0, so
    the wedge relation stays tiny while the count stays exact."""
    from giranking_spark.operators.triangles import (
        degree_oriented,
        oriented_wedges,
        triangle_relation,
    )

    n = 200
    pairs = [(0, i) for i in range(1, n + 1)] + [(1, 2), (2, 3), (1, 3)]
    co = _co(spark, pairs)
    o = degree_oriented(co)
    # hub 0 has degree n; every incident edge orients leaf -> hub
    assert o.filter(F.col("a") == 0).count() == 0
    w = oriented_wedges(o).count()
    assert w <= 3 * n  # arboricity-bounded, nowhere near C(n,2)
    # {1,2,3} plus the three hub triangles {0,1,2},{0,2,3},{0,1,3}
    assert triangle_relation(co).count() == 4


def test_triangle_queries_match_id_oriented_baseline(spark):
    """The shipped degree-oriented enumeration must equal the id-oriented
    two-equi-join baseline (the oracle's form) on a random graph."""
    import random

    from giranking_spark.operators.triangles import triangle_relation

    rnd = random.Random(7)
    pairs = sorted({tuple(sorted(rnd.sample(range(30), 2))) for _ in range(120)})
    co = _co(spark, [(int(u), int(v)) for u, v in pairs]).persist()
    e1, e2, e3 = co.alias("e1"), co.alias("e2"), co.alias("e3")
    baseline = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
            "left_semi",
        )
        .count()
    )
    assert triangle_relation(co).count() == baseline


# ---- blocked GEMM kNN candidate stage (r10 second-decade fix) ---------------


def _rand_vectors(n, d, seed, zero_ids=()):
    import random as _r

    rng = _r.Random(seed)
    rows = []
    for i in range(n):
        v = [0.0] * d if i in zero_ids else [rng.uniform(-1, 1) for _ in range(d)]
        rows.append((i, i % 3, v))
    return rows


def test_blocked_knn_matches_all_pairs_baseline(spark):
    """The GEMM candidate stage + JVM re-rank must reproduce the all-pairs
    Column-expression kNN exactly (same comparator: cos round 6 desc,
    nbr_id asc) — the superset-margin proof, checked on a random fixture
    with deliberate duplicate vectors so rounded-cosine TIES exist."""
    from pyspark.sql.window import Window as W

    from giranking_spark.operators.similarity import (
        blocked_knn_candidates,
        cosine,
    )

    rows = _rand_vectors(60, 8, seed=7)
    rows += [(100 + i, lab, list(v)) for i, (j, lab, v) in enumerate(rows[:10])]
    e = spark.createDataFrame(rows, "vec_id long, label int, v array<double>")

    def rank(pairs):
        w = W.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
        return (
            pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("vec_id", "nbr_id", "cos")
        )

    b = e.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("label").alias("nbr_label"),
        F.col("v").alias("nv"),
    )
    baseline = rank(
        e.join(
            b,
            (F.col("label") == F.col("nbr_label"))
            & (F.col("vec_id") != F.col("nbr_id")),
        ).select(
            "vec_id", "nbr_id", F.round(cosine("v", "nv"), 6).alias("cos")
        )
    )
    cand = blocked_knn_candidates(e, k=3, block_col="label")
    gemm = rank(
        cand.join(e.select("vec_id", "v"), "vec_id")
        .join(
            e.select(F.col("vec_id").alias("nbr_id"), F.col("v").alias("nv")),
            "nbr_id",
        )
        .select("vec_id", "nbr_id", F.round(cosine("v", "nv"), 6).alias("cos"))
    )
    got = sorted(map(tuple, gemm.collect()))
    want = sorted(map(tuple, baseline.collect()))
    assert got == want


def test_blocked_knn_directed_with_threshold_matches_baseline(spark):
    """directed=True + min_score must reproduce the SemDeDup argmax shape:
    best lower-id neighbor with rounded cosine >= tau, ties to lowest id."""
    from pyspark.sql.window import Window as W

    from giranking_spark.operators.similarity import (
        blocked_knn_candidates,
        cosine,
    )

    rows = _rand_vectors(50, 6, seed=11)
    rows += [(200 + i, lab, list(v)) for i, (j, lab, v) in enumerate(rows[:15])]
    e = spark.createDataFrame(rows, "vec_id long, label int, v array<double>")
    tau = 0.6

    b = e.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("label").alias("nbr_label"),
        F.col("v").alias("nv"),
    )
    base_pairs = (
        e.join(
            b,
            (F.col("label") == F.col("nbr_label"))
            & (F.col("nbr_id") < F.col("vec_id")),
        )
        .select("vec_id", "nbr_id", F.round(cosine("v", "nv"), 6).alias("cos"))
        .filter(F.col("cos") >= tau)
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    baseline = (
        base_pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "nbr_id", "cos")
    )
    cand = blocked_knn_candidates(
        e, k=1, block_col="label", directed=True, min_score=tau
    )
    gemm_pairs = (
        cand.join(e.select("vec_id", "v"), "vec_id")
        .join(
            e.select(F.col("vec_id").alias("nbr_id"), F.col("v").alias("nv")),
            "nbr_id",
        )
        .select("vec_id", "nbr_id", F.round(cosine("v", "nv"), 6).alias("cos"))
        .filter(F.col("cos") >= tau)
    )
    gemm = (
        gemm_pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "nbr_id", "cos")
    )
    # every directed candidate must point at a LOWER id
    assert cand.filter(F.col("nbr_id") >= F.col("vec_id")).count() == 0
    assert sorted(map(tuple, gemm.collect())) == sorted(
        map(tuple, baseline.collect())
    )


def test_blocked_knn_zero_norm_and_tiny_blocks(spark):
    """Zero-norm vectors match nothing and are matched by nothing (the
    cosine-NULL contract); a single-vector block emits no candidates; the
    chunked path (chunk < block size) agrees with the unchunked answer."""
    from giranking_spark.operators.similarity import blocked_knn_candidates

    rows = _rand_vectors(20, 4, seed=3, zero_ids={5, 6})
    rows.append((999, 7, [1.0, 0.0, 0.0, 0.0]))  # singleton block label 7
    e = spark.createDataFrame(rows, "vec_id long, label int, v array<double>")
    cand = blocked_knn_candidates(e, k=2, block_col="label").toPandas()
    ids = set(cand.vec_id) | set(cand.nbr_id)
    assert 5 not in ids and 6 not in ids and 999 not in ids
    assert len(cand) > 0
    # forcing multi-chunk processing (chunk of ~3 rows) changes nothing:
    # every chunk row still scores against the FULL block
    tiny = blocked_knn_candidates(
        e, k=2, block_col="label", chunk_elems=60
    ).toPandas()
    key = lambda df: sorted(zip(df.vec_id, df.nbr_id))  # noqa: E731
    assert key(tiny) == key(cand)


def test_gemm_range_mode_matches_threshold_join(spark):
    """k=None range mode + JVM threshold filter must reproduce the exact
    all-pairs >= tau join (rounded-cosine boundary), including duplicate
    vectors sitting exactly AT the threshold via margin slack."""
    from giranking_spark.operators.similarity import (
        bucket_for_gemm,
        cosine,
        gemm_topk_candidates,
    )

    rows = _rand_vectors(40, 6, seed=5)
    rows += [(300 + i, lab, list(v)) for i, (j, lab, v) in enumerate(rows[:8])]
    e = spark.createDataFrame(rows, "vec_id long, label int, v array<double>")
    tau = 0.55
    q = e.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    baseline = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(cosine("qv", "cv"), 6).alias("cos"),
        )
        .filter(F.col("cos") >= tau)
    )
    cbk, qbk = bucket_for_gemm(
        c, q.withColumnRenamed("query_id", "qid"), buckets=7,
        id_col="neighbor_id",
    )
    cand = gemm_topk_candidates(
        cbk, qbk, k=None, metric="cos", id_col="neighbor_id",
        vec_col="cv", qid_col="qid", min_score=tau,
    ).withColumnRenamed("qid", "query_id")
    got = (
        cand.join(q, "query_id")
        .join(c, "neighbor_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(cosine("qv", "cv"), 6).alias("cos"),
        )
        .filter(F.col("cos") >= tau)
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, baseline.collect())
    )


def test_gemm_l2sq_metric_matches_distance_rank(spark):
    """metric='l2sq' candidates (smallest squared distance wins) + JVM
    re-rank must equal the exact per-query distance top-k — the ADC shape
    the PQ search paths ride."""
    from pyspark.sql.window import Window as W

    from giranking_spark.operators.similarity import gemm_topk_candidates

    rows = _rand_vectors(45, 5, seed=13)
    e = spark.createDataFrame(rows, "vec_id long, label int, v array<double>")
    l2 = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    q = e.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))

    def rank(pairs):
        w = W.partitionBy("query_id").orderBy(F.asc("d"), F.asc("neighbor_id"))
        return (
            pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 2)
            .select("query_id", "neighbor_id", "d")
        )

    baseline = rank(
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(l2, 6).alias("d"))
    )
    cand = gemm_topk_candidates(
        e.select(F.lit(0).alias("__b"), "vec_id", "v"),
        e.select(
            F.lit(0).alias("__b"),
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
        ),
        k=2,
        metric="l2sq",
        block_col="__b",
        vec_col="v",
    )
    got = rank(
        cand.join(q, "query_id")
        .join(c, "neighbor_id")
        .select("query_id", "neighbor_id", F.round(l2, 6).alias("d"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, baseline.collect())
    )


def test_gemm_candidate_volume_is_bounded(spark):
    """The candidate superset must stay ~k+ties per (query, block) — a
    margin regression that silently emitted far more would turn the JVM
    re-rank back into the quadratic relation the GEMM exists to avoid.
    Random floats make rounded-score ties vanishingly rare, so the bound
    is tight."""
    from giranking_spark.operators.similarity import (
        bucket_for_gemm,
        gemm_topk_candidates,
    )

    rows = _rand_vectors(120, 8, seed=21)
    e = spark.createDataFrame(rows, "vec_id long, label int, v array<double>")
    buckets, k = 6, 3
    cbk, qbk = bucket_for_gemm(
        e.select("vec_id", "v"),
        e.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv")),
        buckets=buckets,
    )
    cand = gemm_topk_candidates(cbk, qbk, k=k, metric="cos", vec_col="v")
    n_q = e.count()
    total = cand.count()
    assert total <= n_q * buckets * (k + 2), total
    per_q = cand.groupBy("query_id").count().agg(F.max("count")).first()[0]
    assert per_q <= buckets * (k + 2), per_q
