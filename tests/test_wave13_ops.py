"""Round-7 wave: HyperBall neighborhood function / harmonic centrality,
robots.txt parse-from-WARC-bytes, WebP metadata fast path, politeness
drain plan, and the fast prefix-decode table."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _exact_ball_sizes(pairs, t_max):
    """dict[(t, v)] -> exact |ball_out(v, t)| by Python BFS."""
    adj: dict[int, set[int]] = {}
    verts = set()
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
        verts |= {s, d}
    out = {}
    for v in verts:
        ball = {v}
        out[(0, v)] = 1
        frontier = {v}
        for t in range(1, t_max + 1):
            frontier = {
                w for u in frontier for w in adj.get(u, ())
            } - ball
            ball |= frontier
            out[(t, v)] = len(ball)
    return out


class TestHyperBall:
    PAIRS = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 3), (5, 1), (6, 1)]

    def test_matches_exact_ball_registers(self, spark):
        """The iterated sketch must equal the sketch of the exact ball
        membership (merge over union identity) — rebuild registers from
        Python-side BFS membership with the same hash and compare the
        finalized estimates exactly."""
        import hashlib

        from giranking_spark.operators.hyperball import hyperball
        from giranking_spark.operators.sketches import (
            HLL_M,
            HLL_P,
            HLL_SMALL_EST,
            HLL_ALPHA_M2,
            HLL_SCALE,
            HLL_W_BITS,
        )

        t_max = 3
        got = {
            (r.t, r.id): (r.m_used, r.n_zero, r.est_distinct)
            for r in hyperball(_edges(spark, self.PAIRS), t_max).collect()
        }
        # exact membership -> registers -> finalize, replayed in Python
        adj: dict[int, set[int]] = {}
        verts = set()
        for s, d in self.PAIRS:
            adj.setdefault(s, set()).add(d)
            verts |= {s, d}

        def h60(x: int) -> int:
            return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)

        for v in verts:
            ball = {v}
            for t in range(0, t_max + 1):
                if t:
                    ball |= {w for u in list(ball) for w in adj.get(u, ())}
                regs: dict[int, int] = {}
                for w in ball:
                    h = h60(w)
                    idx = h & (HLL_M - 1)
                    word = h >> HLL_P
                    rho = (
                        HLL_W_BITS + 1 - word.bit_length()
                        if word
                        else HLL_W_BITS + 1
                    )
                    regs[idx] = max(regs.get(idx, 0), rho)
                m_used = len(regs)
                s_used = sum(
                    1 << (HLL_W_BITS + 1 - r) for r in regs.values()
                )
                zeros = HLL_M - m_used
                s_total = float(s_used + zeros * HLL_SCALE)
                raw = HLL_ALPHA_M2 * float(HLL_SCALE) / s_total
                est = (
                    HLL_SMALL_EST[zeros - 1]
                    if raw <= 2.5 * HLL_M and zeros > 0
                    else raw
                )
                assert got[(t, v)] == (m_used, zeros, round(est, 6))

    def test_estimates_track_exact_ball_sizes(self, spark):
        """At tiny cardinalities the HLL estimate is near-exact — every
        (t, v) estimate within 2% of the true ball size."""
        from giranking_spark.operators.hyperball import hyperball

        t_max = 3
        exact = _exact_ball_sizes(self.PAIRS, t_max)
        for r in hyperball(_edges(spark, self.PAIRS), t_max).collect():
            true = exact[(r.t, r.id)]
            assert math.isclose(r.est_distinct, true, rel_tol=0.02), (
                r.t, r.id, r.est_distinct, true,
            )

    def test_fixpoint_emits_all_radii(self, spark):
        """A 2-path converges at t=1; radii up to t_max must still be
        emitted, equal to the fixpoint state."""
        from giranking_spark.operators.hyperball import hyperball

        rows = hyperball(_edges(spark, [(1, 2)]), 4).collect()
        assert sorted({r.t for r in rows}) == [0, 1, 2, 3, 4]
        by_t = {}
        for r in rows:
            by_t.setdefault(r.t, {})[r.id] = r.est_distinct
        for t in (2, 3, 4):
            assert by_t[t] == by_t[1]

    def test_empty_graph(self, spark):
        from giranking_spark.operators.hyperball import hyperball

        e = _edges(spark, []).filter(F.lit(False))
        assert hyperball(e, 3).count() == 0


class TestRobotsParse:
    def test_group_attribution_and_fields(self, spark):
        """The parse must attribute rules to the nearest preceding
        User-agent (the badbot decoy group never leaks into `*` counts),
        strip comments, accept case variation, and zero out 404 hosts."""
        from giranking_spark.queries.warcq import (
            LINK_HOSTS,
            q_crawl_robots_parse,
        )

        rows = {
            r.link_host: r
            for r in q_crawl_robots_parse(spark, SF_SMALL).collect()
        }
        assert len(rows) == LINK_HOSTS
        for k in range(LINK_HOSTS):
            r = rows[f"www.h{k}.example"]
            if k % 17 == 0:  # 404 -> no rules at all
                assert (
                    r.n_groups, r.n_disallow_star, r.n_allow_star,
                    r.crawl_delay_s, r.has_sitemap,
                ) == (0, 0, 0, -1, False)
                continue
            assert r.n_groups == 2
            assert r.n_disallow_star == (k % 3 == 0) + (k % 5 == 1)
            assert r.n_allow_star == int(k % 3 == 0 and k % 2 == 0)
            assert r.crawl_delay_s == 1 + k % 7
            assert r.has_sitemap == (k % 4 == 0)

    def test_parsed_rules_match_broadcast_rule_table(self, spark):
        """parse(build(rules)) == rules: the star-group disallow/allow
        counts parsed from bytes equal the per-host counts of the formula
        rule table url_robots_filter broadcasts."""
        from giranking_spark.queries.warcq import (
            _robots_rules,
            q_crawl_robots_parse,
        )

        want = {
            (r.host_k, r.allow): r.n
            for r in _robots_rules(spark)
            .groupBy("host_k", "allow")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        for r in q_crawl_robots_parse(spark, SF_SMALL).collect():
            k = int(r.link_host.split(".")[1][1:])
            if k % 17 == 0:
                continue  # robots 404: rules exist in the table, not bytes
            assert r.n_disallow_star == want.get((k, False), 0)
            assert r.n_allow_star == want.get((k, True), 0)


class TestWebpMeta:
    def test_header_fields_without_decode(self, spark):
        from giranking_spark.queries.mmq import q_mm_webp_meta

        for r in q_mm_webp_meta(spark, SF_SMALL).collect():
            a = r.asset_id
            assert r.header_ok
            assert r.width == 3 + a % 6
            assert r.height == 2 + a % 5
            assert not r.has_alpha
            assert r.version == 0

    def test_wide_dims_cross_byte_boundaries(self, spark):
        """w-1 / h-1 wider than 8 bits exercise the multi-byte unpack."""
        import numpy as np

        from giranking_spark.operators.multimodal import pack_assets
        from giranking_spark.operators.webp import encode_webp_lossless

        img = np.zeros((3, 300, 3), dtype=np.uint8)
        payload = encode_webp_lossless(img)
        df = pack_assets(
            spark.createDataFrame([(1, bytearray(payload))],
                                  "asset_id long, p binary"),
            "asset_id", F.col("p"), mime="image/webp",
        )

        # the same header unpack expressions q_mm_webp_meta uses
        def b(i):
            return F.conv(
                F.hex(F.expr(f"substring(payload, {i + 1}, 1)")), 16, 10
            ).cast("int")

        row = df.select(
            (F.lit(1) + b(21) + (b(22) % 64) * 256).alias("w"),
            (F.lit(1) + (b(22) / 64).cast("int") + b(23) * 4
             + (b(24) % 16) * 1024).alias("h"),
        ).first()
        assert (row.w, row.h) == (300, 3)


class TestPrefixDecodeTable:
    def test_long_codes_fall_back_to_walk(self):
        """A maximally skewed histogram forces code lengths past the root
        table; decode must still resolve every symbol via the fallback."""
        from giranking_spark.operators.webp import (
            _BitReader,
            _BitWriter,
            _PrefixCode,
            _canonical_codes,
        )

        # 14 symbols with fibonacci-ish frequencies -> package-merge gives
        # a deep code; round-trip every symbol through writer + decoder
        lengths = {}
        depth = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 13]
        for s, l in enumerate(depth):
            lengths[s] = l
        codes = _canonical_codes(lengths)
        vec = [0] * 14
        for s, l in lengths.items():
            vec[s] = l
        pc = _PrefixCode(vec)
        bw = _BitWriter()
        syms = list(range(14)) * 3
        for s in syms:
            n, c = codes[s]
            bw.write_code(n, c)
        br = _BitReader(bw.bytes())
        assert [pc.decode(br) for _ in syms] == syms

    def test_truncated_stream_raises(self):
        from giranking_spark.operators.webp import _BitReader

        br = _BitReader(b"\xff")
        br.read(6)
        with pytest.raises(ValueError):
            br.read(3)


class TestPoliteness:
    def test_drain_formula(self, spark):
        from giranking_spark.queries.warcq import q_crawl_host_politeness

        for r in q_crawl_host_politeness(spark, SF_SMALL).collect():
            k = int(r.link_host.split(".")[1][1:])
            delay = 1 if k % 17 == 0 else 1 + k % 7
            assert r.effective_delay_s == delay
            assert r.drain_sec == r.n_urls * delay
