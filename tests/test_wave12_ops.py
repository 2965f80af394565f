"""Round-6 wave: SCC / bow-tie over directed graphs, Gopher quality rules,
DSIR importance weights, and the navigation-graph derivation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


class TestSCC:
    def test_two_cycles_bridge_and_tails(self, spark):
        """1→2→3→1 (SCC {1,2,3}), 3→4→5, 5→6→5 (SCC {5,6}), 7→1 feeder,
        3→8 sink: canonical min-member labels throughout."""
        from giranking_spark.operators.scc import strongly_connected_components

        e = _edges(
            spark,
            [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 5),
             (7, 1), (3, 8)],
        )
        got = {
            r.id: r.scc_id
            for r in strongly_connected_components(e).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7, 8: 8}

    def test_self_loop_is_its_own_scc(self, spark):
        from giranking_spark.operators.scc import strongly_connected_components

        e = _edges(spark, [(1, 1), (1, 2)])
        got = {
            r.id: r.scc_id
            for r in strongly_connected_components(e).collect()
        }
        assert got == {1: 1, 2: 2}

    def test_pure_dag_all_singletons(self, spark):
        """Trim alone must resolve an acyclic graph — every vertex is its
        own SCC."""
        from giranking_spark.operators.scc import strongly_connected_components

        e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
        got = {
            r.id: r.scc_id
            for r in strongly_connected_components(e).collect()
        }
        assert got == {i: i for i in (1, 2, 3, 4)}

    def test_empty_graph(self, spark):
        from giranking_spark.operators.scc import strongly_connected_components

        e = _edges(spark, []).filter(F.lit(False))
        assert strongly_connected_components(e).count() == 0

    def test_label_is_min_member_under_permuted_ids(self, spark):
        """Cycle 30→20→40→30: canonical label is the minimum member (20),
        regardless of insertion or id order."""
        from giranking_spark.operators.scc import strongly_connected_components

        e = _edges(spark, [(30, 20), (20, 40), (40, 30)])
        got = {
            r.id: r.scc_id
            for r in strongly_connected_components(e).collect()
        }
        assert got == {20: 20, 30: 20, 40: 20}


class TestBowtie:
    def test_full_class_map(self, spark):
        """Hand-built bow-tie: core {2,3} (pivot 2 has max degree 4);
        IN {1,5}; OUT {8}; 7 on an IN→OUT path avoiding core (tube);
        9 a dead end off IN (tendril_in); 6 feeds OUT from nowhere
        (tendril_out); {20,21} disconnected."""
        from giranking_spark.operators.scc import bowtie_classes

        e = _edges(
            spark,
            [(2, 3), (3, 2), (1, 2), (5, 2), (3, 8), (1, 7), (7, 8),
             (1, 9), (6, 8), (20, 21)],
        )
        got = {r.id: r.cls for r in bowtie_classes(e).collect()}
        assert got == {
            1: "in", 2: "core", 3: "core", 5: "in", 6: "tendril_out",
            7: "tube", 8: "out", 9: "tendril_in",
            20: "disconnected", 21: "disconnected",
        }

    def test_empty_graph(self, spark):
        from giranking_spark.operators.scc import bowtie_classes

        e = _edges(spark, []).filter(F.lit(False))
        assert bowtie_classes(e).count() == 0

    def test_single_cycle_all_core(self, spark):
        from giranking_spark.operators.scc import bowtie_classes

        e = _edges(spark, [(1, 2), (2, 3), (3, 1)])
        got = {r.id: r.cls for r in bowtie_classes(e).collect()}
        assert got == {1: "core", 2: "core", 3: "core"}


class TestNavEdges:
    def test_threshold_and_no_self_loops(self, spark):
        """sf0.001 has no transition seen NAV_MIN_COUNT times — empty by
        construction (documented in compq) — and the builder never emits
        self-loops at any SF."""
        from giranking_spark.queries.compq import derive_nav_edges

        e = derive_nav_edges(spark, SF_SMALL)
        assert e.count() == 0
        assert e.filter(F.col("src") == F.col("dst")).count() == 0


class TestGopherRules:
    def _signals(self, spark, texts):
        from giranking_spark.queries.textq import gopher_signals

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        return {r.doc_id: r for r in gopher_signals(df).collect()}

    def test_passing_document(self, spark):
        r = self._signals(spark, ["the with " + "word " * 48])[0]
        assert r.n_words == 50
        assert r.mean_word_len == pytest.approx(199 / 50, abs=1e-6)
        assert r.alpha_frac == 1.0
        assert r.n_stopwords == 2
        assert r.gopher_pass == 1

    def test_too_short_fails(self, spark):
        assert self._signals(spark, ["the with cat"])[0].gopher_pass == 0

    def test_missing_stopwords_fail(self, spark):
        r = self._signals(spark, ["word " * 60])[0]
        assert r.n_stopwords == 0 and r.gopher_pass == 0

    def test_symbol_ratio_fails(self, spark):
        # 6 hashes over 50 words = 0.12 > 0.1; hashes are not words
        text = "the with " + "word " * 48 + "# # # # # #"
        r = self._signals(spark, [text])[0]
        assert r.n_words == 50
        assert r.symbol_ratio == pytest.approx(0.12, abs=1e-6)
        assert r.gopher_pass == 0

    def test_ellipsis_counting(self, spark):
        r = self._signals(spark, ["the with word ... … ..."])[0]
        assert r.symbol_ratio == pytest.approx(3 / 3, abs=1e-6)

    def test_empty_document(self, spark):
        r = self._signals(spark, [""])[0]
        assert r.n_words == 0 and r.mean_word_len == 0.0
        assert r.gopher_pass == 0

    def test_mean_word_length_bounds(self, spark):
        # 60 two-char words: mwl 2 < 3 → fail that rule alone
        r = self._signals(spark, ["the with " + "ab " * 58])[0]
        assert r.gopher_pass == 0


class TestDsirWeights:
    def test_every_doc_scored_once_and_deterministic(self, spark):
        from giranking_spark.queries.textq import q_text_dsir_weights

        a = q_text_dsir_weights(spark, SF_SMALL)
        ids = [r.doc_id for r in a.select("doc_id").collect()]
        assert len(ids) == len(set(ids))
        b = {r.doc_id: r.dsir_logw for r in
             q_text_dsir_weights(spark, SF_SMALL).collect()}
        assert {r.doc_id: r.dsir_logw for r in a.collect()} == b

    def test_target_docs_score_higher_on_average(self, spark):
        """Importance weights must favor the target distribution: mean
        log-weight over target docs exceeds the corpus mean."""
        from giranking_spark.queries.textq import (
            DSIR_TARGET_MOD,
            q_text_dsir_weights,
        )

        rows = q_text_dsir_weights(spark, SF_SMALL).collect()
        tgt = [r.dsir_logw for r in rows if r.doc_id % DSIR_TARGET_MOD == 0]
        rest = [r.dsir_logw for r in rows if r.doc_id % DSIR_TARGET_MOD != 0]
        assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


class TestWave12Plans:
    def test_no_cartesian_or_python_in_new_queries(self, spark):
        from giranking_spark.queries.compq import derive_nav_edges
        from giranking_spark.queries.textq import (
            q_text_dsir_weights,
            q_text_gopher_rules,
        )

        for df in (
            derive_nav_edges(spark, SF_SMALL),
            q_text_gopher_rules(spark, SF_SMALL),
            q_text_dsir_weights(spark, SF_SMALL),
        ):
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "CartesianProduct" not in plan
            assert "BatchEvalPython" not in plan


class TestMotifCensus:
    def _census(self, spark, pairs):
        from giranking_spark.queries.compq import motif_census

        e = spark.createDataFrame(pairs, "src long, dst long")
        return {r.motif: r.n for r in motif_census(e).collect()}

    def test_cycle_ffl_reciprocal(self, spark):
        """{1→2, 2→3, 3→1, 1→3}: one 3-cycle, one feed-forward loop, one
        reciprocal dyad (1⇄3)."""
        got = self._census(spark, [(1, 2), (2, 3), (3, 1), (1, 3)])
        assert got == {"cycle": 1, "ffl": 1, "reciprocal_dyad": 1}

    def test_pure_ffl(self, spark):
        got = self._census(spark, [(1, 2), (2, 3), (1, 3)])
        assert got == {"cycle": 0, "ffl": 1, "reciprocal_dyad": 0}

    def test_cycle_counted_once_per_rotation_class(self, spark):
        got = self._census(spark, [(1, 2), (2, 3), (3, 1)])
        assert got == {"cycle": 1, "ffl": 0, "reciprocal_dyad": 0}

    def test_bidirectional_triangle(self, spark):
        """Full bidirectional triangle: 2 directed 3-cycles, 6 FFLs
        (each ordered pair of distinct roles), 3 reciprocal dyads."""
        pairs = [(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a != b]
        got = self._census(spark, pairs)
        assert got == {"cycle": 2, "ffl": 6, "reciprocal_dyad": 3}


class TestEwma:
    def test_matches_gap_aware_recursion(self, spark):
        """Closed-form weighted sum == the streaming recursion
        ewma_d = α·x_d + (1-α)^gap · ewma_prev, seeded with the first
        day's count."""
        from giranking_spark.queries.analyticsq import EWMA_ALPHA, q_events_ewma

        rows = q_events_ewma(spark, SF_SMALL).collect()
        by_type = {}
        for r in rows:
            by_type.setdefault(r.event_type, []).append(r)
        assert by_type
        for series in by_type.values():
            series.sort(key=lambda r: r.day)
            ewma, prev_day = None, None
            for r in series:
                if ewma is None:
                    ewma = float(r.cnt)
                else:
                    ewma = (
                        EWMA_ALPHA * r.cnt
                        + (1 - EWMA_ALPHA) ** (r.day - prev_day) * ewma
                    )
                prev_day = r.day
                assert abs(r.ewma - ewma) < 1e-5, (r, ewma)


class TestZipfSlope:
    def test_slope_nonpositive_and_bounded(self, spark):
        """ln(freq) is nonincreasing in ln(rank), so the OLS slope is
        <= 0 (Chebyshev's sum inequality); rank set is capped."""
        from giranking_spark.queries.textq import ZIPF_TOP_RANKS, q_text_zipf_slope

        r = q_text_zipf_slope(spark, SF_SMALL).collect()[0]
        assert 0 < r.n_ranks <= ZIPF_TOP_RANKS
        assert r.zipf_slope <= 0
        assert r.zipf_intercept == r.zipf_intercept  # not NaN


class TestWave13Plans:
    def test_no_cartesian_or_python(self, spark):
        from giranking_spark.queries.analyticsq import q_events_ewma
        from giranking_spark.queries.compq import q_graph_motifs
        from giranking_spark.queries.textq import q_text_zipf_slope

        for df in (
            q_events_ewma(spark, SF_SMALL),
            q_graph_motifs(spark, SF_SMALL),
            q_text_zipf_slope(spark, SF_SMALL),
        ):
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "CartesianProduct" not in plan
            assert "BatchEvalPython" not in plan


class TestKtruss:
    def _truss(self, spark, pairs, k):
        from giranking_spark.queries.compq import ktruss_edges

        e = spark.createDataFrame(pairs, "u long, v long")
        return {(r.u, r.v) for r in ktruss_edges(e, k=k).collect()}

    def test_triangle_survives_pendant_drops(self, spark):
        got = self._truss(spark, [(1, 2), (1, 3), (2, 3), (3, 4)], k=3)
        assert got == {(1, 2), (1, 3), (2, 3)}

    def test_k4_is_a_4_truss(self, spark):
        k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        assert self._truss(spark, k4, k=4) == set(k4)

    def test_iterative_unraveling(self, spark):
        """K4 minus one edge: (3,4) starts with support 2 but loses both
        triangles once the support-1 edges peel — the whole graph unravels
        only through ITERATION, not a single pass."""
        k4m = [(1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
        assert self._truss(spark, k4m, k=4) == set()

    def test_fixture_converges_within_round_cap(self, spark):
        """The oracle unrolls exactly KTRUSS_ROUNDS peels; pin that every
        fixture SF reaches its fixpoint within the cap (extra rounds are
        then no-ops on both engines)."""
        from giranking_spark.queries.compq import (
            KTRUSS_K,
            KTRUSS_ROUNDS,
            derive_nav_edges,
            ktruss_edges,
        )

        e = derive_nav_edges(spark, SF_SMALL)
        canon = e.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        ).distinct()
        a = {(r.u, r.v) for r in
             ktruss_edges(canon, k=KTRUSS_K, rounds=KTRUSS_ROUNDS).collect()}
        b = {(r.u, r.v) for r in
             ktruss_edges(canon, k=KTRUSS_K,
                          rounds=KTRUSS_ROUNDS + 2).collect()}
        assert a == b


class TestJlProjection:
    def test_distance_preservation(self, spark):
        from giranking_spark.queries.simq import q_embed_jl_projection

        rows = q_embed_jl_projection(spark, SF_SMALL).collect()
        assert len(rows) == 250
        ratios = [r.jl_ratio for r in rows]
        assert all(0.2 < x < 2.0 for x in ratios)
        mean = sum(ratios) / len(ratios)
        assert 0.85 < mean < 1.15, mean  # unbiased estimator, p=16


class TestStarComponents:
    def _star(self, spark, pairs):
        from giranking_spark.operators.components import (
            connected_components_star,
        )

        e = spark.createDataFrame(pairs, "src string, dst string")
        return {
            r.id: r.component for r in connected_components_star(e).collect()
        }

    def test_long_chain(self, spark):
        """The adversarial case the algorithm exists for: a 24-hop chain
        resolves to one component labeled by its minimum member."""
        pairs = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(24)]
        got = self._star(spark, pairs)
        assert set(got.values()) == {"n00"} and len(got) == 25

    def test_two_components_and_self_loop(self, spark):
        got = self._star(spark, [("a", "b"), ("b", "c"), ("x", "y"), ("z", "z")])
        assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x",
                       "z": "z"}

    def test_matches_label_propagation_on_fixture(self, spark):
        """Both CC strategies must produce the identical canonical
        labeling on the ranking graph."""
        from giranking_spark.operators.components import (
            connected_components,
            connected_components_star,
        )
        from giranking_spark.sources.tables import derive_edges

        e = derive_edges(spark, SF_SMALL)
        a = {r.id: r.component for r in connected_components(e).collect()}
        b = {r.id: r.component
             for r in connected_components_star(e).collect()}
        assert a == b


class _FakeState:
    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


class TestStreamEwmaState:
    def test_out_of_order_batches_fold_exactly(self):
        """Two micro-batches with day 2 arriving AFTER day 3: the day-map
        state makes the final EWMA identical to the in-order recursion."""
        import pandas as pd

        from giranking_spark.queries.analyticsq import EWMA_ALPHA
        from giranking_spark.streaming.ops import _ewma_state_fn

        st = _FakeState()
        b1 = pd.DataFrame({"day": [1, 1, 3]})          # days 1 (x2), 3
        out1 = list(_ewma_state_fn(("click",), iter([b1]), st))[0]
        assert out1.n_days[0] == 2
        b2 = pd.DataFrame({"day": [2, 2, 2, 3]})       # late day 2, more 3
        out2 = list(_ewma_state_fn(("click",), iter([b2]), st))[0]
        # in-order recursion over {1: 2, 2: 3, 3: 2}
        ewma = 2.0
        ewma = EWMA_ALPHA * 3 + (1 - EWMA_ALPHA) ** 1 * ewma
        ewma = EWMA_ALPHA * 2 + (1 - EWMA_ALPHA) ** 1 * ewma
        assert out2.n_days[0] == 3 and out2.last_day[0] == 3
        assert abs(out2.ewma[0] - ewma) < 1e-9

    def test_final_emission_matches_batch_closed_form(self, spark):
        from giranking_spark.queries.analyticsq import q_events_ewma
        from giranking_spark.queries.streamq import q_stream_ewma_state

        got = {
            r.event_type: (r.last_day, r.ewma)
            for r in q_stream_ewma_state(spark, SF_SMALL).collect()
        }
        batch = q_events_ewma(spark, SF_SMALL).collect()
        last = {}
        for r in batch:
            if r.event_type not in last or r.day > last[r.event_type][0]:
                last[r.event_type] = (r.day, r.ewma)
        assert got == last


class TestExif:
    def test_roundtrip_all_fields(self):
        import numpy as np

        from giranking_spark.operators.exif import (
            encode_exif_app1,
            parse_exif,
            splice_app1,
        )
        from giranking_spark.operators.jpeg import decode_jpeg, encode_jpeg

        img = np.zeros((8, 24, 3), dtype=np.uint8)
        jpg = encode_jpeg(img, np.ones(64, int), np.ones(64, int))
        app1 = encode_exif_app1(
            make="Maker1", model="Model2", orientation=7,
            datetime="2024:01:09 12:05:00", pixel_x=24, pixel_y=8, iso=1600,
        )
        tagged = splice_app1(jpg, app1)
        got = parse_exif(tagged)
        assert got == {
            "make": "Maker1", "model": "Model2", "orientation": 7,
            "datetime": "2024:01:09 12:05:00", "pixel_x": 24,
            "pixel_y": 8, "iso": 1600,
        }
        # the APP1 must not disturb the image decode
        w, h, _ = decode_jpeg(tagged)
        assert (w, h) == (24, 8)

    def test_big_endian_tiff_parses(self):
        """MM byte order: rewrite the writer's II blob by hand is overkill —
        construct a minimal big-endian TIFF with one SHORT tag."""
        import struct

        from giranking_spark.operators.exif import parse_exif

        tiff = b"MM" + struct.pack(">HI", 42, 8)
        tiff += struct.pack(">H", 1)
        tiff += struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">HH", 5, 0)
        tiff += struct.pack(">I", 0)
        jpeg = b"\xff\xd8" + b"\xff\xe1" + struct.pack(
            ">H", len(tiff) + 8
        ) + b"Exif\x00\x00" + tiff + b"\xff\xd9"
        assert parse_exif(jpeg)["orientation"] == 5

    def test_error_contract(self):
        import numpy as np
        import pytest as _pt

        from giranking_spark.operators.exif import parse_exif
        from giranking_spark.operators.jpeg import encode_jpeg

        with _pt.raises(ValueError):
            parse_exif(b"not a jpeg")
        plain = encode_jpeg(
            np.zeros((8, 8, 3), np.uint8), np.ones(64, int), np.ones(64, int)
        )
        with _pt.raises(ValueError):
            parse_exif(plain)  # no APP1
        with _pt.raises(ValueError):
            parse_exif(b"\xff\xd8\xff\xe1\x00\x10Exif\x00\x00IIxx" + b"\x00" * 4)


class TestDsirGumbel:
    def test_topk_deterministic_and_weight_biased(self, spark):
        """Gumbel-top-k: K rows, stable across runs, and the selected set's
        mean log-weight exceeds the corpus mean (selection is biased toward
        high importance weight by construction)."""
        from giranking_spark.queries.textq import (
            DSIR_SAMPLE_K,
            q_sample_dsir_gumbel,
            q_text_dsir_weights,
        )

        a = [(r.doc_id, r.gumbel_score)
             for r in q_sample_dsir_gumbel(spark, SF_SMALL).collect()]
        assert len(a) == DSIR_SAMPLE_K
        b = [(r.doc_id, r.gumbel_score)
             for r in q_sample_dsir_gumbel(spark, SF_SMALL).collect()]
        assert a == b
        w = {r.doc_id: r.dsir_logw
             for r in q_text_dsir_weights(spark, SF_SMALL).collect()}
        sel = {d for d, _ in a}
        mean_sel = sum(w[d] for d in sel) / len(sel)
        mean_all = sum(w.values()) / len(w)
        assert mean_sel > mean_all


class TestDiameterEst:
    def test_path_graph_eccentricities(self, spark):
        """Path a-b-c-d-e: per-seed BFS must give the exact hop distances
        regardless of which seeds the hash picks."""
        from giranking_spark.operators.components import per_seed_bfs

        e = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
        )
        seeds = spark.createDataFrame([(1,), (3,)], "id long")
        d = {(r.seed, r.id): r.dist for r in per_seed_bfs(e, seeds).collect()}
        assert d[(1, 5)] == 4 and d[(1, 1)] == 0 and d[(3, 1)] == 2
        assert d[(3, 5)] == 2 and len(d) == 10

    def test_depth_cap_is_a_contract(self, spark):
        from giranking_spark.operators.components import per_seed_bfs

        e = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
        )
        seeds = spark.createDataFrame([(1,)], "id long")
        d = per_seed_bfs(e, seeds, max_depth=2)
        assert d.count() == 3  # ids 1,2,3 only — beyond depth 2 absent


class TestPatternRegex:
    def test_hand_built_sequences(self, spark):
        """Known timeline: v c c p v p e e e p → 2 funnels (vccp, vp) and
        1 error burst (eee); timestamps deliberately out of insertion
        order to prove the sort-total ordering."""
        import datetime as dt

        from giranking_spark.queries import analyticsq

        base = dt.datetime(2024, 1, 1)
        types = ["view", "click", "click", "purchase", "view", "purchase",
                 "error", "error", "error", "purchase"]
        rows = [
            (i, base + dt.timedelta(seconds=i), 7, t, 0.0, "{}")
            for i, t in enumerate(types)
        ]
        rows = rows[::-1]  # shuffle insertion order
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string",
        )
        import os, tempfile
        d = tempfile.mkdtemp()
        ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = analyticsq.q_events_pattern_regex(spark, d).collect()[0]
        assert got.seq_len == 10
        assert got.n_funnels == 2
        assert got.n_error_bursts == 1


class TestGeoJoinAndVariant:
    def test_geo_join_is_bucketed_not_cartesian(self, spark):
        """The oracle may do all-pairs; the Spark plan must NOT — candidates
        come from the (cy, cx) cell equi-join."""
        from giranking_spark.queries.joinsq import q_rel_geo_join

        df = q_rel_geo_join(spark, SF_SMALL)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan
        rows = df.collect()
        assert len(rows) == 10  # every supplier present, zero-match rows kept
        assert all(r.n_within >= 0 for r in rows)
        for r in rows:
            assert (r.n_within == 0) == (r.nearest_km is None)

    def test_variant_extract_types(self, spark):
        from giranking_spark.queries.relational import q_events_variant_extract

        rows = q_events_variant_extract(spark, SF_SMALL).collect()
        assert {r.event_type for r in rows} == {
            "view", "click", "purchase", "signup", "error"
        }
        for r in rows:
            assert r.min_k >= 0 and r.max_k <= 99 and r.n > 0


class TestStatsQueries:
    def test_welch_ttest_sane(self, spark):
        from giranking_spark.queries.analyticsq import q_events_welch_ttest

        r = q_events_welch_ttest(spark, SF_SMALL).collect()[0]
        assert r.na > 1 and r.nb > 1
        assert r.welch_df > 1
        assert r.t_stat == r.t_stat  # not NaN

    def test_benford_terms(self, spark):
        import math

        from giranking_spark.queries.analyticsq import q_rel_benford_digits

        rows = q_rel_benford_digits(spark, SF_SMALL).collect()
        assert [r.digit for r in rows] == sorted({r.digit for r in rows})
        assert all(1 <= r.digit <= 9 for r in rows)
        for r in rows:
            assert abs(r.p_benford - round(math.log10(1 + 1 / r.digit), 6)) < 1e-9
            assert r.chi2_term >= 0
        assert abs(sum(r.p_obs for r in rows) - 1.0) < 1e-4


class TestNeymanSample:
    def test_allocation_favors_variable_strata(self, spark):
        """Per-stratum sample counts follow N_h * sigma_h shares; the total
        stays within the floor remainder of the budget; determinism."""
        from pyspark.sql import functions as F

        from giranking_spark.queries.pipelineq import (
            NEYMAN_BUDGET,
            q_sample_neyman,
        )
        from giranking_spark.sources.tables import load_table

        out = q_sample_neyman(spark, SF_SMALL)
        per = {r.lang: r.n for r in
               out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
        total = sum(per.values())
        assert NEYMAN_BUDGET - len(per) <= total <= NEYMAN_BUDGET
        docs = load_table(spark, SF_SMALL, "documents")
        stats = {
            r.lang: (r.n, r.sd)
            for r in docs.groupBy("lang").agg(
                F.count(F.lit(1)).alias("n"),
                F.stddev_pop("n_chars").alias("sd"),
            ).collect()
        }
        tot_w = sum(n * sd for n, sd in stats.values())
        for lang, k in per.items():
            n, sd = stats[lang]
            expected = (NEYMAN_BUDGET * n * sd) / tot_w
            assert abs(k - expected) <= 1.0 + 1e-6, (lang, k, expected)
        again = {r.lang: r.n for r in
                 q_sample_neyman(spark, SF_SMALL).groupBy("lang")
                 .agg(F.count(F.lit(1)).alias("n")).collect()}
        assert per == again


class TestRfm:
    def test_scores_partition_users_evenly(self, spark):
        from pyspark.sql import functions as F

        from giranking_spark.queries.analyticsq import RFM_BUCKETS, q_events_rfm

        out = q_events_rfm(spark, SF_SMALL)
        rows = out.collect()
        n = len(rows)
        assert n > 0
        for col in ("r_score", "f_score", "m_score"):
            per = {}
            for r in rows:
                per[r[col]] = per.get(r[col], 0) + 1
            assert set(per) <= set(range(1, RFM_BUCKETS + 1))
            # ntile: bucket sizes differ by at most 1
            assert max(per.values()) - min(per.values()) <= 1
        # recency rank 1 = most recent purchaser
        best = min(rows, key=lambda r: (r.recency_s, r.user_id))
        assert best.r_score == 1
