"""Round-7 wave 3: Holt linear-trend fold, PNG intensity histograms,
sitemap frontier diff."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


class TestHoltWinters:
    def test_fold_matches_python_recursion(self, spark):
        """The JVM array-fold must replay the textbook recursion exactly
        (same alpha/beta, same init l0=x0 b0=0, errors from t=1)."""
        from giranking_spark.queries.analyticsq import (
            HOLT_ALPHA,
            HOLT_BETA,
            q_events_holt_winters,
        )

        rows = {
            r.event_type: r
            for r in q_events_holt_winters(spark, SF_SMALL).collect()
        }
        # recompute the daily series + recursion in Python
        from giranking_spark.queries.relational import load_events

        daily = (
            load_events(spark, SF_SMALL)
            .groupBy("event_type", F.expr("t div 86400").alias("day"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        series: dict[str, list] = {}
        for r in daily:
            series.setdefault(r.event_type, []).append((r.day, r.cnt))
        for typ, pts in series.items():
            xs = [float(c) for _, c in sorted(pts)]
            l, b, prev, eh, en = xs[0], 0.0, xs[0], 0.0, 0.0
            for x in xs[1:]:
                f = l + b
                eh += abs(x - f)
                en += abs(x - prev)
                lnew = HOLT_ALPHA * x + (1.0 - HOLT_ALPHA) * f
                b = HOLT_BETA * (lnew - l) + (1.0 - HOLT_BETA) * b
                l, prev = lnew, x
            got = rows[typ]
            assert got.n_days == len(xs)
            assert got.level == round(l, 6)
            assert got.trend == round(b, 6)
            assert got.abs_err_holt == round(eh, 6)
            assert got.abs_err_naive == round(en, 6)

    def test_trend_beats_naive_on_linear_series(self, spark):
        """On a strictly linear series Holt locks onto the slope and its
        one-step error goes to ~0 while naive stays at the slope."""
        from giranking_spark.queries.analyticsq import HOLT_ALPHA, HOLT_BETA

        xs = [10.0 + 5.0 * t for t in range(20)]
        l, b, prev, eh, en = xs[0], 0.0, xs[0], 0.0, 0.0
        for x in xs[1:]:
            f = l + b
            eh += abs(x - f)
            en += abs(x - prev)
            lnew = HOLT_ALPHA * x + (1.0 - HOLT_ALPHA) * f
            b = HOLT_BETA * (lnew - l) + (1.0 - HOLT_BETA) * b
            l, prev = lnew, x
        assert eh < en  # Holt's cumulative error beats last-value forecast


class TestImageHistogram:
    def test_histogram_counts_match_formula(self, spark):
        """Corpus (channel, bin) pixel counts from REAL PNG decode equal
        the generative-formula counts."""
        from giranking_spark.queries.mmq import q_mm_image_histogram

        got = {
            (r.channel, r.bin): (r.n_px, r.n_assets)
            for r in q_mm_image_histogram(spark, SF_SMALL).collect()
        }
        import collections

        want_px: dict = collections.Counter()
        want_assets: dict = collections.defaultdict(set)
        # fixture ids = documents doc_id at sf0.001
        from giranking_spark.sources.tables import load_table

        ids = [
            r.doc_id
            for r in load_table(spark, SF_SMALL, "documents")
            .select("doc_id")
            .collect()
        ]
        for a in ids:
            w, h = 4 + a % 6, 3 + a % 5
            for i in range(w * h * 3):
                v = (a * 11 + i * 3) % 256
                key = (i % 3, v // 32)
                want_px[key] += 1
                want_assets[key].add(a)
        assert got == {
            k: (want_px[k], len(want_assets[k])) for k in want_px
        }

    def test_bins_partition_pixels(self, spark):
        from giranking_spark.queries.mmq import q_mm_image_histogram

        rows = q_mm_image_histogram(spark, SF_SMALL).collect()
        per_channel: dict = {}
        for r in rows:
            per_channel[r.channel] = per_channel.get(r.channel, 0) + r.n_px
        # every channel sees every pixel exactly once
        assert len(set(per_channel.values())) == 1


class TestSitemapDiff:
    def test_counts_and_partition(self, spark):
        from giranking_spark.queries.crawlq import q_crawl_sitemap_diff

        for r in q_crawl_sitemap_diff(spark, SF_SMALL).collect():
            assert r.n_sitemap == r.n_new + r.n_known
            assert r.n_new >= 0 and r.n_known >= 0

    def test_known_urls_are_even_docs(self, spark):
        from giranking_spark.queries.crawlq import q_crawl_sitemap_diff
        from giranking_spark.sources.tables import load_table

        got = {
            r.host: (r.n_new, r.n_known)
            for r in q_crawl_sitemap_diff(spark, SF_SMALL).collect()
        }
        docs = [
            r.doc_id
            for r in load_table(spark, SF_SMALL, "documents")
            .select("doc_id")
            .collect()
        ]
        import collections

        new_c: dict = collections.Counter()
        known_c: dict = collections.Counter()
        for a in docs:
            host = f"www.d{a % 37}.example"
            if a % 2 == 0:
                known_c[host] += 1
            else:
                new_c[host] += 1
        for host in set(new_c) | set(known_c):
            assert got[host] == (new_c[host], known_c[host])


class TestCoreness:
    @staticmethod
    def _exact(pairs):
        """Exact sequential core decomposition (min-degree peel)."""
        adj: dict = {}
        for s, d in pairs:
            if s == d:
                continue
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
        live = {v: len(ns) for v, ns in adj.items()}
        core, k = {}, 0
        while live:
            k = max(k, min(live.values()))
            rm = [v for v, dv in live.items() if dv <= k]
            while rm:
                v = rm.pop()
                if v not in live:
                    continue
                core[v] = k
                del live[v]
                for u in adj[v]:
                    if u in live:
                        live[u] -= 1
                        if live[u] <= k:
                            rm.append(u)
        return core

    def test_peel_matches_exact_on_toy(self, spark):
        """Triangle + pendant chain + K4: coreness 1/2/3 mix, with a chain
        long enough to need several peel rounds in one phase."""
        from giranking_spark.operators.components import coreness_peel

        pairs = (
            [(1, 2), (2, 3), (3, 1)]                      # triangle (core 2)
            + [(3, 10), (10, 11), (11, 12), (12, 13)]     # chain (core 1)
            + [(20, 21), (20, 22), (20, 23), (21, 22), (21, 23), (22, 23)]
        )                                                  # K4 (core 3)
        e = spark.createDataFrame(pairs, "src long, dst long")
        got = {r.id: r.coreness for r in coreness_peel(e).collect()}
        assert got == self._exact(pairs)

    def test_oracle_converges_within_caps_at_gate_scale(self):
        """The shared phase/round caps MUST cover the sf0.01 fixture: the
        unrolled DuckDB oracle (which caps exactly like the Spark loop)
        must equal the exact sequential peel. Catches a too-small
        CORENESS_ROUNDS, which the engine-parity hash cannot (both engines
        cap identically)."""
        import duckdb

        from giranking_spark.queries.compq import ORACLES, NAV_EDGES_SQL

        con = duckdb.connect()
        con.execute(
            "create view events as select * from "
            "'/root/testdata/sf0.01/events.parquet'"
        )
        got = {
            int(r[0]): int(r[1])
            for r in con.execute(ORACLES["graph_coreness"]).fetchall()
        }
        pairs = [
            (int(a), int(b))
            for a, b in con.execute(NAV_EDGES_SQL).fetchall()
        ]
        assert got == self._exact(pairs)


class TestBetweenness:
    @staticmethod
    def _exact_brandes(pairs, seeds, depth=100):
        """Textbook Brandes from the given sources (undirected, hop cap)."""
        adj: dict = {}
        for s, d in pairs:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
        bc: dict = {}
        for s in seeds:
            dist, sigma, order = {s: 0}, {s: 1}, [s]
            frontier = [s]
            while frontier:
                nxt = []
                for u in frontier:
                    for w in adj.get(u, ()):
                        if w not in dist:
                            if dist[u] + 1 > depth:
                                continue
                            dist[w] = dist[u] + 1
                            sigma[w] = 0
                            nxt.append(w)
                            order.append(w)
                        if dist[w] == dist[u] + 1:
                            sigma[w] += sigma[u]
                frontier = nxt
            delta = {v: 0.0 for v in order}
            for w in reversed(order):
                for u in adj.get(w, ()):
                    if dist.get(u, -2) == dist[w] - 1:
                        delta[u] += sigma[u] / sigma[w] * (1.0 + delta[w])
                if w != s:
                    bc[w] = bc.get(w, 0.0) + delta[w]
        return {v: round(x, 6) for v, x in bc.items() if round(x, 6) > 0}

    PAIRS = [
        (1, 2), (2, 3), (3, 4), (2, 5), (5, 4), (4, 6), (6, 7), (1, 7),
        (5, 8), (8, 9),
    ]

    def test_matches_exact_brandes_all_pivots(self, spark):
        """With every vertex as a pivot and an ample depth cap, the
        distributed sweep must equal textbook Brandes exactly."""
        from giranking_spark.operators.betweenness import betweenness_approx

        verts = sorted({v for p in self.PAIRS for v in p})
        e = spark.createDataFrame(self.PAIRS, "src long, dst long")
        seeds = spark.createDataFrame([(v,) for v in verts], "id long")
        got = {
            r.id: r.bc for r in betweenness_approx(e, seeds, 10).collect()
        }
        assert got == self._exact_brandes(self.PAIRS, verts)

    def test_depth_cap_truncates_both_sides(self, spark):
        """A 5-chain with depth cap 2: dependencies beyond 2 hops must not
        accumulate (the k-betweenness truncation)."""
        from giranking_spark.operators.betweenness import betweenness_approx

        pairs = [(1, 2), (2, 3), (3, 4), (4, 5)]
        e = spark.createDataFrame(pairs, "src long, dst long")
        seeds = spark.createDataFrame([(1,)], "id long")
        got = {r.id: r.bc for r in betweenness_approx(e, seeds, 2).collect()}
        assert got == self._exact_brandes(pairs, [1], depth=2)

    def test_disconnected_pivot_contributes_nothing(self, spark):
        from giranking_spark.operators.betweenness import betweenness_approx

        pairs = [(1, 2), (2, 3), (10, 11)]
        e = spark.createDataFrame(pairs, "src long, dst long")
        seeds = spark.createDataFrame([(10,)], "id long")
        got = {r.id: r.bc for r in betweenness_approx(e, seeds, 5).collect()}
        assert got == {}  # 10-11 has no intermediate vertex


class TestCloseness:
    def test_sumdist_tracks_exact_distances(self, spark):
        """On a path graph the HLL ball sizes are near-exact, so the
        estimated total distance is within 2% of the true Σ d(v, w)."""
        from giranking_spark.operators.hyperball import hyperball

        pairs = [(1, 2), (2, 3), (3, 4)]  # directed path
        import math

        from pyspark.sql import Window as W

        hb = hyperball(
            spark.createDataFrame(pairs, "src long, dst long"), 4
        )
        micro = F.round(F.col("est_distinct") * F.lit(1e6), 0).cast("long")
        w = W.partitionBy("id").orderBy("t")
        d = hb.select("t", "id", micro.alias("m")).withColumn(
            "diff", F.col("m") - F.lag("m", 1, 0).over(w)
        )
        got = {
            r.id: r.sd
            for r in d.groupBy("id")
            .agg(
                F.sum(
                    F.when(F.col("t") >= 1, F.col("t") * F.col("diff"))
                    .otherwise(F.lit(0))
                ).alias("sd")
            )
            .collect()
        }
        true = {1: 1 + 2 + 3, 2: 1 + 2, 3: 1, 4: 0}
        for v, sd in got.items():
            assert math.isclose(sd / 1e6, true[v], rel_tol=0.02, abs_tol=0.05)


class TestTableFingerprint:
    def test_flipped_row_flips_fingerprint(self, spark):
        """Reconciliation property: same rows in any order → same
        fingerprint; one changed cell → different fingerprint."""
        from giranking_spark.functions.hashing import md5_u60

        def fp(rows):
            df = spark.createDataFrame(rows, "k long, v string")
            return (
                df.select(
                    md5_u60(
                        F.concat_ws("|", F.col("k").cast("string"), "v")
                    ).alias("_h")
                )
                .agg(F.expr("bit_xor(_h)").alias("f"))
                .first()
                .f
            )

        base = [(1, "a"), (2, "b"), (3, "c")]
        assert fp(base) == fp(list(reversed(base)))
        assert fp(base) != fp([(1, "a"), (2, "B"), (3, "c")])

    def test_query_counts(self, spark):
        from giranking_spark.queries.relational import (
            q_rel_table_fingerprint,
        )
        from giranking_spark.sources.tables import load_table

        rows = q_rel_table_fingerprint(spark, SF_SMALL).collect()
        total = sum(r.n_rows for r in rows)
        assert total == load_table(spark, SF_SMALL, "orders").count()


class TestDiD:
    def test_did_identity(self, spark):
        """The did row equals the 2x2 cell means combined by hand."""
        from giranking_spark.queries.analyticsq import q_events_did

        rows = {r.cell: r for r in q_events_did(spark, SF_SMALL).collect()}
        want = (
            rows["treat_after"].mean - rows["treat_before"].mean
        ) - (rows["control_after"].mean - rows["control_before"].mean)
        assert abs(rows["did"].mean - want) < 2e-6
        for c in ("treat_after", "treat_before", "control_after",
                  "control_before"):
            r = rows[c]
            assert r.n > 0 and abs(r.mean - r.s / r.n) < 1e-6  # round(6)


class TestSurvivalKM:
    def test_km_matches_python(self, spark):
        """The fold replays the product-limit estimator exactly."""
        from giranking_spark.queries.analyticsq import (
            KM_CENSOR_TAIL,
            q_events_survival_km,
        )
        from giranking_spark.queries.relational import load_events

        per = (
            load_events(spark, SF_SMALL)
            .groupBy("user_id")
            .agg(
                F.min(F.expr("t div 86400")).alias("f"),
                F.max(F.expr("t div 86400")).alias("l"),
            )
            .collect()
        )
        mx = max(r.l for r in per)
        lts = {}
        for r in per:
            lt = r.l - r.f
            cens = (mx - r.l) < KM_CENSOR_TAIL
            d, m = lts.get(lt, (0, 0))
            lts[lt] = (d + (0 if cens else 1), m + 1)
        order = sorted(lts)
        total = sum(m for _, m in lts.values())
        want, s, seen = {}, 1.0, 0
        for lt in order:
            d, m = lts[lt]
            n = total - seen
            s = s * (1.0 - d / n)
            want[lt] = (n, d, round(s, 6))
            seen += m
        got = {
            r.lifetime_days: (r.n_risk, r.d_events, r.survival)
            for r in q_events_survival_km(spark, SF_SMALL).collect()
        }
        assert got == want

    def test_survival_monotone_nonincreasing(self, spark):
        from giranking_spark.queries.analyticsq import q_events_survival_km

        rows = sorted(
            q_events_survival_km(spark, SF_SMALL).collect(),
            key=lambda r: r.lifetime_days,
        )
        surv = [r.survival for r in rows]
        assert surv == sorted(surv, reverse=True)
        assert all(0.0 <= s <= 1.0 for s in surv)


class TestWavMeta:
    def test_header_fields_without_decode(self, spark):
        from giranking_spark.queries.mmq import WAV_RATE, q_mm_wav_meta

        for r in q_mm_wav_meta(spark, SF_SMALL).collect():
            assert r.header_ok
            assert r.channels == 1
            assert r.sample_rate == WAV_RATE
            assert r.bits == 16
            assert r.n_samples == 50 + r.asset_id % 50


class TestKAnonymity:
    def test_summary_consistency(self, spark):
        from giranking_spark.queries.relational import (
            K_ANON_K,
            q_rel_k_anonymity,
        )
        from giranking_spark.sources.tables import load_table

        r = q_rel_k_anonymity(spark, SF_SMALL).first()
        c = load_table(spark, SF_SMALL, "customer")
        assert r.n_rows == c.count()
        assert r.k == K_ANON_K
        assert 0 <= r.n_rows_at_risk <= r.n_rows
        assert r.min_class >= 1
        # recompute at-risk rows exactly
        import collections

        sizes = collections.Counter(
            (row.c_nationkey, row.c_mktsegment)
            for row in c.select("c_nationkey", "c_mktsegment").collect()
        )
        assert r.n_classes == len(sizes)
        assert r.n_rows_at_risk == sum(
            s for s in sizes.values() if s < K_ANON_K
        )
        assert r.min_class == min(sizes.values())


class TestDatasetCard:
    def test_counts_and_share(self, spark):
        from giranking_spark.queries.curationq import q_corpus_dataset_card

        rows = q_corpus_dataset_card(spark, SF_SMALL).collect()
        tot = sum(r.n_tokens for r in rows)
        assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-4
        for r in rows:
            assert 0 <= r.n_dup_docs < r.n_docs
            assert abs(r.token_share - r.n_tokens / tot) < 1e-6


class TestAssocRules:
    def test_rule_math(self, spark):
        from giranking_spark.queries.analyticsq import q_events_assoc_rules
        from giranking_spark.queries.relational import load_events

        basket = {
            (r.user_id, r.event_type)
            for r in load_events(spark, SF_SMALL)
            .select("user_id", "event_type")
            .distinct()
            .collect()
        }
        import collections

        per = collections.Counter(t for _, t in basket)
        users = {u for u, _ in basket}
        by_user = collections.defaultdict(set)
        for u, t in basket:
            by_user[u].add(t)
        for r in q_events_assoc_rules(spark, SF_SMALL).collect():
            n_ab = sum(
                1 for ts in by_user.values() if r.a in ts and r.b in ts
            )
            assert r.n_a == per[r.a]
            assert r.n_ab == n_ab
            assert abs(r.confidence - n_ab / per[r.a]) < 1e-6
            assert (
                abs(r.lift - n_ab * len(users) / (per[r.a] * per[r.b]))
                < 1e-6
            )


class TestBootstrapCI:
    def test_ci_brackets_mean_and_weights_poisson(self, spark):
        from giranking_spark.queries.analyticsq import (
            BOOT_B,
            BOOT_CUM,
            q_events_bootstrap_ci,
        )

        r = q_events_bootstrap_ci(spark, SF_SMALL).first()
        assert r.n_resamples == BOOT_B
        assert r.ci_lo_cents <= r.mean_cents <= r.ci_hi_cents
        # CI is a real interval, not collapsed
        assert r.ci_lo_cents < r.ci_hi_cents
        # thresholds are the Poisson(1) CDF
        import math

        e = math.exp(-1.0)
        assert abs(BOOT_CUM[0] - e) < 1e-12
        assert abs(BOOT_CUM[3] - e * (1 + 1 + 0.5 + 1 / 6)) < 1e-12


class TestFixedWidth:
    def test_roundtrip_exact(self, spark):
        from giranking_spark.queries.formatq import q_src_fixed_width
        from giranking_spark.sources.tables import load_table

        got = {
            r.c_custkey: (r.c_name, r.c_mktsegment, r.cents)
            for r in q_src_fixed_width(spark, SF_SMALL).collect()
        }
        want = {
            r.c_custkey: (
                r.c_name,
                r.c_mktsegment,
                round(r.c_acctbal * 100),
            )
            for r in load_table(spark, SF_SMALL, "customer").collect()
        }
        assert got == want

    def test_negative_balances_survive(self, spark):
        from giranking_spark.queries.formatq import q_src_fixed_width

        rows = q_src_fixed_width(spark, SF_SMALL).collect()
        assert any(r.cents < 0 for r in rows)  # fixture has debtors
