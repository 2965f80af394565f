"""Unit tests for the round-3 wave-8 queries (GraphSAGE-style neighborhood
aggregation, PMI collocations, LSH recall evaluation, histogram quantile
sketch, sorted range-bucketed sink) — behavioral and layout checks that
complement the oracle gate."""

from __future__ import annotations

import glob
import math

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


# ---------------------------------------------------------------------------
# graph_feature_agg


def test_feature_agg_hand_graph(spark, monkeypatch):
    """Path graph a-b-c (undirected): deg a=1 b=2 c=1.
    1-hop means: a→{b}=2, b→{a,c}=1, c→{b}=2.
    2-hop paths exclude returns-to-self: a→b→c, c→b→a; b has none
    (both 2-hop paths return to b)."""
    import giranking_spark.queries.compq as compq

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src STRING, dst STRING"
    )
    monkeypatch.setattr(
        compq, "derive_edges", lambda _spark, _sf: edges
    )
    rows = {r.id: r for r in compq.q_graph_feature_agg(spark, "x").collect()}
    assert rows["a"].n_nbr == 1 and rows["a"].mean_nbr_deg == 2.0
    assert rows["b"].n_nbr == 2 and rows["b"].mean_nbr_deg == 1.0
    assert rows["a"].n_2hop == 1 and rows["a"].mean_2hop_deg == 1.0
    assert rows["c"].n_2hop == 1 and rows["c"].mean_2hop_deg == 1.0
    assert rows["b"].n_2hop is None  # both 2-hop paths return to b


def test_feature_agg_hub_pruned_2hop(spark, monkeypatch):
    """A star hub with degree > FEATURE_AGG_MAX_FANOUT must not route
    2-hop expansion: leaves see NO 2-hop neighbors through the hub."""
    import giranking_spark.queries.compq as compq

    n = compq.FEATURE_AGG_MAX_FANOUT + 1
    edges = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(n)], "src STRING, dst STRING"
    )
    monkeypatch.setattr(compq, "derive_edges", lambda _s, _f: edges)
    rows = {r.id: r for r in compq.q_graph_feature_agg(spark, "x").collect()}
    assert rows["leaf0"].n_2hop is None  # hub exceeds the fanout cap
    assert rows["hub"].n_nbr == n


def test_feature_agg_plan_no_cartesian(spark):
    from giranking_spark.queries.compq import q_graph_feature_agg

    plan = q_graph_feature_agg(spark, SF_SMALL)._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# text_pmi


def test_pmi_values_match_formula(spark, monkeypatch):
    """PMI must equal ln(n*N / (m1*m2)) over the symmetric pair relation."""
    import giranking_spark.queries.textq as textq

    pairs = spark.createDataFrame(
        [("a", "b", 6), ("b", "a", 6), ("a", "c", 2), ("c", "a", 2)],
        "w1 STRING, w2 STRING, n LONG",
    )
    monkeypatch.setattr(textq, "q_text_cooc", lambda _s, _f: pairs)
    rows = {(r.w1, r.w2): r.pmi for r in textq.q_text_pmi(spark, "x").collect()}
    tot = 16
    marg = {"a": 8, "b": 6, "c": 2}
    for (w1, w2), pmi in rows.items():
        n = 6 if {w1, w2} == {"a", "b"} else 2
        expect = round(math.log(n * tot / (marg[w1] * marg[w2])), 6)
        assert pmi == pytest.approx(expect, abs=1e-9)


def test_pmi_symmetric(spark):
    from giranking_spark.queries.textq import q_text_pmi

    df = q_text_pmi(spark, SF_SMALL)
    a = df.select("w1", "w2", "pmi")
    b = df.select(
        F.col("w2").alias("w1"), F.col("w1").alias("w2"), F.col("pmi").alias("pmi2")
    )
    diff = a.join(b, ["w1", "w2"]).filter(F.col("pmi") != F.col("pmi2"))
    assert diff.count() == 0


# ---------------------------------------------------------------------------
# dedup_recall_eval


def test_recall_eval_bounds(spark):
    from giranking_spark.queries.dedupq import q_dedup_recall_eval

    row = q_dedup_recall_eval(spark, SF_SMALL).collect()[0]
    assert row.n_truth > 0
    assert row.n_hit <= min(row.n_truth, row.n_cand)
    assert 0.0 <= row.recall <= 1.0
    assert row.recall == pytest.approx(
        round(row.n_hit / row.n_truth, 6), abs=1e-9
    )


# ---------------------------------------------------------------------------
# rel_quantile_sketch


def test_quantile_sketch_brackets_exact(spark):
    """Each histogram estimate must lie within one bin width of the exact
    interpolated percentile (the sketch's error bound by construction)."""
    from giranking_spark.queries.analyticsq import (
        QSKETCH_QS,
        QSKETCH_WIDTH,
        q_rel_quantile_sketch,
    )
    from giranking_spark.sources.tables import load_table

    est = {r.q: r.est for r in q_rel_quantile_sketch(spark, SF_SMALL).collect()}
    exact = (
        load_table(spark, SF_SMALL, "orders")
        .agg(
            F.expr(
                "percentile(o_totalprice, array("
                + ", ".join(str(q) for q in QSKETCH_QS)
                + "))"
            ).alias("p")
        )
        .collect()[0]
        .p
    )
    assert set(est) == set(QSKETCH_QS)
    for q, ex in zip(QSKETCH_QS, exact):
        assert abs(est[q] - ex) <= QSKETCH_WIDTH


def test_quantile_sketch_monotone(spark):
    from giranking_spark.queries.analyticsq import q_rel_quantile_sketch

    rows = sorted(
        q_rel_quantile_sketch(spark, SF_SMALL).collect(), key=lambda r: r.q
    )
    ests = [r.est for r in rows]
    assert ests == sorted(ests)


# ---------------------------------------------------------------------------
# sink_sorted_layout


def test_sorted_layout_files_sorted_and_tight(spark):
    """Read the actual parquet footers: within every written file the
    row-group min/max ranges on o_orderkey must be non-overlapping and
    ordered — the property row-group skipping depends on."""
    from giranking_spark.queries.storageq import q_sink_sorted_layout
    from giranking_spark.queries.textsrcq import _scratch

    q_sink_sorted_layout(spark, SF_SMALL).collect()
    path = _scratch(spark, SF_SMALL, "storage_sorted")
    files = glob.glob(f"{path}/bucket=*/*.parquet")
    assert files, "sorted layout wrote no files"
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("o_orderkey")
        prev_max = None
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx).statistics
            assert stats is not None and stats.has_min_max
            if prev_max is not None:
                assert stats.min >= prev_max
            prev_max = stats.max


def test_sorted_layout_buckets_partition_dirs(spark):
    from giranking_spark.queries.storageq import (
        SORTED_BUCKET_WIDTH,
        q_sink_sorted_layout,
    )

    rows = q_sink_sorted_layout(spark, SF_SMALL).collect()
    for r in rows:
        assert r.min_key // SORTED_BUCKET_WIDTH == r.bucket
        assert r.max_key // SORTED_BUCKET_WIDTH == r.bucket


# ---------------------------------------------------------------------------
# wave 9: backoff LM, grouped KMV, dup rate, Adamic-Adar


def test_backoff_lm_both_branches(spark, monkeypatch):
    """Corpus 'a b'x3 + 'a c': bigram (a,b) has bc=3 >= 2 so P=3/4;
    bigram (a,c) has bc=1 < 2 so it backs off to 0.4 * c(c)/T."""
    import giranking_spark.queries.textq as textq

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c")],
        "doc_id LONG, text STRING",
    )
    monkeypatch.setattr(textq, "load_table", lambda _s, _f, _n: docs)
    rows = {
        r.doc_id: r for r in textq.q_text_backoff_logprob(spark, "x").collect()
    }
    assert rows[1].mean_logprob == pytest.approx(
        round(math.log(3 / 4), 6), abs=1e-9
    )
    assert rows[4].mean_logprob == pytest.approx(
        round(math.log(0.4 * 1 / 8), 6), abs=1e-9
    )


def test_kmv_grouped_small_groups_exact(spark):
    """Groups with < k distinct values report the EXACT count."""
    from giranking_spark.operators.sketches import kmv_distinct_by

    df = spark.createDataFrame(
        [("g1", i) for i in range(5)] + [("g2", i) for i in range(3)] * 2,
        "grp STRING, v LONG",
    )
    rows = {r.grp: r for r in kmv_distinct_by(df, "grp", "v", 64).collect()}
    assert rows["g1"].k_used == 5 and rows["g1"].est_distinct == 5.0
    assert rows["g2"].k_used == 3 and rows["g2"].est_distinct == 3.0


def test_dup_rate_bounds(spark):
    from giranking_spark.queries.curationq import q_corpus_dup_rate

    for r in q_corpus_dup_rate(spark, SF_SMALL).collect():
        assert r.n_unique <= r.n_docs
        assert 0.0 <= r.dup_rate < 1.0
        assert r.dup_rate == pytest.approx(
            round(1 - r.n_unique / r.n_docs, 6), abs=1e-9
        )


def test_adamic_adar_hand_graph(spark, monkeypatch):
    """Square a-b-c-d-a: every adjacent pair shares 0 common neighbors;
    diagonals (a,c) and (b,d) share 2, each of degree 2 → score 2/ln 2."""
    import giranking_spark.queries.compq as compq

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
        "src STRING, dst STRING",
    )
    monkeypatch.setattr(compq, "derive_edges", lambda _s, _f: edges)
    rows = {
        (r.id_a, r.id_b): r
        for r in compq.q_graph_adamic_adar(spark, "x").collect()
    }
    assert set(rows) == {("a", "c"), ("b", "d")}
    expect = round(2 / math.log(2), 6)
    for r in rows.values():
        assert r.n_common == 2
        assert r.aa_score == pytest.approx(expect, abs=1e-9)


def test_kmv_intersect_exact_when_under_k(spark, monkeypatch):
    """Union below k must degrade to exact counts: A={0..39}, B={20..59}
    → union 60 < 64, overlap 20, est_inter exactly 20."""
    import giranking_spark.queries.pipelineq as pipelineq

    rows = [(i, "click") for i in range(40)] + [
        (i, "purchase") for i in range(20, 60)
    ]
    ev = spark.createDataFrame(rows, "user_id LONG, event_type STRING")
    monkeypatch.setattr(pipelineq, "load_table", lambda _s, _f, _n: ev)
    r = pipelineq.q_sketch_kmv_intersect(spark, "x").collect()[0]
    assert r.k_used == 60
    assert r.n_overlap == 20
    assert r.est_union == 60.0
    assert r.est_inter == 20.0


def test_kmv_intersect_estimate_branch(spark, monkeypatch):
    """Union above k: the sample caps at k, the union estimate scales
    beyond k, and est_inter follows the overlap-fraction arithmetic
    exactly.  (Accuracy of one specific deterministic draw is luck —
    this asserts the sketch mechanics; the sf0.01 oracle run lands
    within ~4% of truth.)"""
    import giranking_spark.queries.pipelineq as pipelineq

    rows = [(i, "click") for i in range(300)] + [
        (i, "purchase") for i in range(150, 450)
    ]
    ev = spark.createDataFrame(rows, "user_id LONG, event_type STRING")
    monkeypatch.setattr(pipelineq, "load_table", lambda _s, _f, _n: ev)
    r = pipelineq.q_sketch_kmv_intersect(spark, "x").collect()[0]
    assert r.k_used == pipelineq.KMV_SETOP_K
    assert 0 < r.n_overlap <= r.k_used
    assert r.est_union > pipelineq.KMV_SETOP_K  # estimate branch taken
    assert r.est_inter == pytest.approx(
        round(r.n_overlap / r.k_used * r.est_union, 6), abs=1e-6
    )


def test_entropy_extremes(spark, monkeypatch):
    """'aaaa' → 0 bits (and +0.0, not -0.0); 'abcd' (uniform over 4) →
    ln 4."""
    import giranking_spark.queries.textq as textq

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abcd")], "doc_id LONG, text STRING"
    )
    monkeypatch.setattr(textq, "load_table", lambda _s, _f, _n: docs)
    rows = {r.doc_id: r for r in textq.q_text_entropy(spark, "x").collect()}
    assert rows[1].n_distinct_chars == 1
    assert rows[1].entropy == 0.0 and math.copysign(1, rows[1].entropy) == 1.0
    assert rows[2].entropy == pytest.approx(round(math.log(4), 6), abs=1e-9)


def test_pca_power_finds_dominant_axis(spark, monkeypatch):
    """Vectors concentrated on axis 0 with small axis-1 noise → the top
    component is ±e0 and the loading vector is unit-norm."""
    import giranking_spark.queries.simq as simq

    emb = spark.createDataFrame(
        [(1, [10.0, 0.1]), (2, [-8.0, 0.05]), (3, [9.0, -0.1]), (4, [7.0, 0.2])],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    monkeypatch.setattr(simq, "_embeddings", lambda _s, _f: emb)
    rows = {r.dim: r.loading for r in simq.q_embed_pca_power(spark, "x").collect()}
    assert set(rows) == {1, 2}
    assert abs(abs(rows[1]) - 1.0) < 1e-3
    assert abs(rows[2]) < 0.05
    assert sum(v * v for v in rows.values()) == pytest.approx(1.0, abs=1e-6)


@pytest.mark.parametrize(
    "qname",
    [
        "graph_adamic_adar",
        "text_backoff_logprob",
        "text_pmi",
        "text_entropy",
        "embed_pca_power",
        "rel_quantile_sketch",
        "dedup_recall_eval",
        "sketch_kmv_grouped",
        "sketch_kmv_intersect",
        "corpus_dup_rate",
    ],
)
def test_new_wave_plans_stay_jvm_side(spark, qname):
    """Every wave-8/9/10 query must plan without a cartesian product or
    row-at-a-time Python — the two anti-patterns the brief bans."""
    import __spark_entry__ as entry

    plan = (
        entry.queries()[qname](spark, SF_SMALL)
        ._jdf.queryExecution()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_incremental_dedup_flags_planted_dup(spark):
    """A batch doc that is an exact copy of a base doc must flag is_dup;
    a batch doc with disjoint vocabulary must not."""
    from giranking_spark.operators.dedup import incremental_lsh_matches

    base = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id LONG, text STRING",
    )
    batch = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta"),
            (20, "one two three four five six"),
        ],
        "doc_id LONG, text STRING",
    )
    rows = {
        r.doc_id: r for r in incremental_lsh_matches(base, batch).collect()
    }
    assert rows[10].is_dup and rows[10].n_base_matches == 1
    assert not rows[20].is_dup and rows[20].n_base_matches == 0


def test_incremental_dedup_never_pairs_base_with_base(spark):
    """Base-only duplication must not surface: the output keys are batch
    doc ids only."""
    from giranking_spark.operators.dedup import incremental_lsh_matches

    base = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "doc_id LONG, text STRING",
    )
    batch = spark.createDataFrame(
        [(10, "unrelated words entirely here")], "doc_id LONG, text STRING"
    )
    out = incremental_lsh_matches(base, batch)
    assert [r.doc_id for r in out.collect()] == [10]


def test_weighted_reservoir_quota_and_bias(spark):
    """Exactly k per group; heavy weights must be overrepresented: with
    weights 1000 vs 1, the k winners should be mostly heavy rows."""
    from giranking_spark.operators.sampling import weighted_reservoir

    rows = [(i, "g", 1000) for i in range(50)] + [
        (i, "g", 1) for i in range(50, 100)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, grp STRING, w LONG")
    out = weighted_reservoir(df, "grp", "doc_id", "w", 10).collect()
    assert len(out) == 10
    heavy = sum(1 for r in out if r.w == 1000)
    assert heavy >= 8  # P(light row beating heavy ones) is ~w_ratio


def test_weighted_reservoir_partition_invariant(spark):
    """The selection must not change when the input partitioning does."""
    from giranking_spark.operators.sampling import weighted_reservoir

    rows = [(i, "a" if i % 2 else "b", 1 + i % 7) for i in range(200)]
    df1 = spark.createDataFrame(rows, "doc_id LONG, grp STRING, w LONG")
    df2 = df1.repartition(13)
    pick = lambda df: sorted(
        (r.grp, r.doc_id)
        for r in weighted_reservoir(df, "grp", "doc_id", "w", 5).collect()
    )
    assert pick(df1) == pick(df2)


def test_interval_join_hand_cases(spark, monkeypatch):
    """Overlapping, touching, and disjoint same-user intervals; a
    cross-user overlap must never pair.  Durations are 1+id%10 minutes;
    with ids 0..3 (1..4 min) and starts chosen accordingly."""
    import datetime as dt

    import giranking_spark.queries.joinsq as joinsq
    from pyspark.sql import functions as F

    base = dt.datetime(2026, 1, 1)
    mk = lambda sec: base + dt.timedelta(seconds=sec)
    # user 1: id1 (2 min) at t=0 overlaps id2 (3 min) at t=60 by 60 s;
    #         id3 (4 min) at t=600 is disjoint from both
    # user 2: id4 at t=0 must not pair with user 1's events
    ev = spark.createDataFrame(
        [
            (1, mk(0), 1, "view", 0.0, "{}"),
            (2, mk(60), 1, "view", 0.0, "{}"),
            (3, mk(600), 1, "view", 0.0, "{}"),
            (4, mk(0), 2, "view", 0.0, "{}"),
        ],
        "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    monkeypatch.setattr(
        joinsq,
        "load_events",
        lambda _s, _f: ev.withColumn(
            "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
        ),
    )
    rows = {(r.id_a, r.id_b): r for r in joinsq.q_rel_interval_join(spark, "x").collect()}
    assert set(rows) == {(1, 2)}
    assert rows[(1, 2)].overlap_us == 60 * 1_000_000
    assert rows[(1, 2)].user_id == 1


# ---------------------------------------------------------------------------
# randomized properties (seeded, repo test_properties.py style)


@pytest.mark.parametrize("seed", [11, 97])
def test_interval_join_matches_brute_force(spark, monkeypatch, seed):
    """The chunk-bucketed plan must equal the O(n²) reference join on
    random same-user interval sets (incl. chunk-boundary starts)."""
    import datetime as dt
    import random

    import giranking_spark.queries.joinsq as joinsq
    from pyspark.sql import functions as F

    rng = random.Random(seed)
    base = dt.datetime(2026, 1, 1)
    rows = [
        (
            i,
            base + dt.timedelta(seconds=rng.randrange(0, 3600)),
            rng.randrange(1, 4),
            "view",
            0.0,
            "{}",
        )
        for i in range(60)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    monkeypatch.setattr(
        joinsq,
        "load_events",
        lambda _s, _f: ev.withColumn(
            "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
        ),
    )
    got = {
        (r.user_id, r.id_a, r.id_b): r.overlap_us
        for r in joinsq.q_rel_interval_join(spark, "x").collect()
    }
    # brute force in plain Python
    us = {
        i: (u, int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6))
        for (i, ts, u, *_rest) in rows
    }
    expect = {}
    for i, (u1, s1) in us.items():
        e1 = s1 + (1 + i % joinsq.OVERLAP_MAX_MIN) * 60_000_000
        for j, (u2, s2) in us.items():
            if j <= i or u1 != u2:
                continue
            e2 = s2 + (1 + j % joinsq.OVERLAP_MAX_MIN) * 60_000_000
            if s1 <= e2 and s2 <= e1:
                expect[(u1, i, j)] = min(e1, e2) - max(s1, s2)
    assert got == expect


@pytest.mark.parametrize("seed", [5, 23])
def test_reservoir_quota_property(spark, seed):
    """Every group yields exactly min(k, |group|) rows, all from the
    input."""
    import random

    from giranking_spark.operators.sampling import weighted_reservoir

    rng = random.Random(seed)
    rows = [
        (i, f"g{rng.randrange(4)}", rng.randrange(1, 100))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, grp STRING, w LONG")
    k = 7
    out = weighted_reservoir(df, "grp", "doc_id", "w", k).collect()
    from collections import Counter

    sizes = Counter(r[1] for r in rows)
    got = Counter(r.grp for r in out)
    assert got == {g: min(k, n) for g, n in sizes.items()}
    valid = {(r[0], r[1]) for r in rows}
    assert all((r.doc_id, r.grp) in valid for r in out)


@pytest.mark.parametrize("seed", [2])
def test_entropy_bounded_by_log_alphabet(spark, monkeypatch, seed):
    """0 ≤ H ≤ ln(n_distinct_chars) for random strings."""
    import random

    import giranking_spark.queries.textq as textq

    rng = random.Random(seed)
    docs = [
        (i, "".join(rng.choice("abcxyz !") for _ in range(rng.randrange(1, 200))))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    monkeypatch.setattr(textq, "load_table", lambda _s, _f, _n: df)
    for r in textq.q_text_entropy(spark, "x").collect():
        assert 0.0 <= r.entropy <= round(math.log(max(r.n_distinct_chars, 1)), 6) + 1e-9


def test_length_quantiles_per_source_bracket_exact(spark):
    """The sketch picks the first bin whose cumulative count reaches q·n,
    so the ⌈q·n⌉-th order statistic lies in that same bin — each estimate
    must sit within one bin width of it.  (Spark's interpolated
    `percentile` uses (n-1)·q indexing — a different convention that can
    differ by a full rank on tiny groups, so it is NOT the right
    reference.)"""
    from giranking_spark.queries.curationq import (
        LQ_QS,
        LQ_WIDTH,
        q_corpus_length_quantiles,
    )
    from giranking_spark.sources.tables import load_table

    est = {
        (r.source, r.q): r.est
        for r in q_corpus_length_quantiles(spark, SF_SMALL).collect()
    }
    by_source = {}
    for r in load_table(spark, SF_SMALL, "documents").select(
        "source", "n_chars"
    ).collect():
        by_source.setdefault(r.source, []).append(r.n_chars)
    assert by_source
    for source, vals in by_source.items():
        vals.sort()
        for q in LQ_QS:
            rank = math.ceil(q * len(vals))
            exact = vals[max(rank, 1) - 1]
            assert abs(est[(source, q)] - exact) <= LQ_WIDTH


def test_novelty_first_doc_full_copy_zero(spark, monkeypatch):
    """The earliest doc is 100% novel; an exact later copy is 0% novel;
    a half-overlapping doc sits strictly between."""
    import giranking_spark.queries.dedupq as dedupq

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d e f"),
            (3, "a b c x y z"),
        ],
        "doc_id LONG, text STRING",
    )
    monkeypatch.setattr(dedupq, "load_table", lambda _s, _f, _n: docs)
    rows = {r.doc_id: r for r in dedupq.q_text_novelty(spark, "x").collect()}
    assert rows[1].novelty == 1.0
    assert rows[2].novelty == 0.0
    assert 0.0 < rows[3].novelty < 1.0
    assert rows[3].n_novel == 3  # "c x y", "x y z", and "b c x" are new


def test_cusum_prefix_identity_matches_recursion(spark, monkeypatch):
    """The prefix-sum identity C_t = S_t − min(0, min_{j≤t} S_j) must
    reproduce the textbook recursion C_t = max(0, C_{t-1} + dev_t) on a
    hand series with a clamp in the middle.
    counts [5, 1, 1, 9] → mean 4 → dev [1, -3, -3, 5]
    → recursion: 1, 0, 0, 5."""
    import datetime as dt

    import giranking_spark.queries.analyticsq as analyticsq
    from pyspark.sql import functions as F

    base = dt.datetime(2026, 1, 1)
    rows = []
    eid = 0
    for day, cnt in enumerate([5, 1, 1, 9]):
        for _ in range(cnt):
            rows.append(
                (eid, base + dt.timedelta(days=day), 1, "view", 0.0, "{}")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    monkeypatch.setattr(
        analyticsq,
        "load_events",
        lambda _s, _f: ev.withColumn(
            "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
        ),
    )
    out = sorted(
        analyticsq.q_events_cusum(spark, "x").collect(), key=lambda r: r.day
    )
    assert [r.cusum for r in out] == [1.0, 0.0, 0.0, 5.0]


def test_nearest_join_picks_closer_side_and_breaks_ties_earlier(
    spark, monkeypatch
):
    """Purchase between two views: closer one wins; exactly equidistant →
    the earlier view wins; a user with no views drops out."""
    import datetime as dt

    import giranking_spark.queries.joinsq as joinsq
    from pyspark.sql import functions as F

    base = dt.datetime(2026, 1, 1)
    mk = lambda sec: base + dt.timedelta(seconds=sec)
    ev = spark.createDataFrame(
        [
            # user 1: views at 0 and 100; purchase at 70 → nearest is 100
            (1, mk(0), 1, "view", 1.0, "{}"),
            (2, mk(100), 1, "view", 2.0, "{}"),
            (3, mk(70), 1, "purchase", 0.0, "{}"),
            # user 2: views at 0 and 100; purchase at 50 → tie → earlier (0)
            (4, mk(0), 2, "view", 3.0, "{}"),
            (5, mk(100), 2, "view", 4.0, "{}"),
            (6, mk(50), 2, "purchase", 0.0, "{}"),
            # user 3: purchase with no views → dropped
            (7, mk(10), 3, "purchase", 0.0, "{}"),
        ],
        "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    monkeypatch.setattr(
        joinsq,
        "load_events",
        lambda _s, _f: ev.withColumn(
            "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
        ),
    )
    rows = {r.event_id: r for r in joinsq.q_rel_nearest_join(spark, "x").collect()}
    assert set(rows) == {3, 6}
    assert rows[3].rvalue == 2.0  # the view at t=100
    assert rows[6].rvalue == 3.0  # tie resolves to the earlier view (t=0)
