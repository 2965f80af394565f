"""Round-8 operator tests: formula pins for the new analytics/sketch
queries. Cross-engine parity is certified by the oracle sweeps; these
tests pin the FORMULAS themselves against independent recomputations
(the TestCoreness lesson: a shared contract both engines agree on can
still be the wrong contract — verify it against ground truth)."""

from __future__ import annotations

import hashlib

import duckdb
import pytest


class TestMannWhitneyFormula:
    """The doubled-rank construction (2R = Σ n_a(v)·(2·cum_lt(v) + n(v) + 1))
    must equal the DEFINITION of the rank sum with tie-averaged ranks,
    and U_a must equal the pair-count definition #(a>b) + ½#(a=b)."""

    def _doubled_rank(self, a: list[int], b: list[int]) -> tuple[int, int]:
        allv = sorted(set(a + b))
        r2 = 0
        for v in allv:
            n_a = a.count(v)
            n_all = a.count(v) + b.count(v)
            cum_lt = sum(1 for x in a + b if x < v)
            r2 += n_a * (2 * cum_lt + n_all + 1)
        u2 = r2 - len(a) * (len(a) + 1)
        return r2, u2

    def test_matches_pair_count_definition(self):
        a = [3, 5, 5, 8, 12, 12, 12]
        b = [1, 5, 7, 12, 13]
        _, u2 = self._doubled_rank(a, b)
        u_pairs = sum(
            1.0 if x > y else (0.5 if x == y else 0.0) for x in a for y in b
        )
        assert u2 == int(2 * u_pairs)

    def test_matches_tie_averaged_rank_sum(self):
        a = [2, 2, 9]
        b = [2, 4, 9, 9]
        both = sorted(a + b)
        # tie-averaged rank of value v = mean of its 1-based positions
        def rank(v):
            pos = [i + 1 for i, x in enumerate(both) if x == v]
            return sum(pos) / len(pos)

        r_a = sum(rank(v) for v in a)
        r2, _ = self._doubled_rank(a, b)
        assert r2 == int(2 * r_a)

    def test_all_greater(self):
        a, b = [10, 11], [1, 2, 3]
        _, u2 = self._doubled_rank(a, b)
        assert u2 == 2 * len(a) * len(b)  # U_a maxes at na*nb


class TestGapsIslandsFormula:
    """day − row_number() is constant exactly within a consecutive run."""

    def test_known_streaks(self):
        con = duckdb.connect()
        out = con.execute(
            "WITH ud AS (SELECT * FROM (VALUES (1, 1), (1, 2), (1, 3), "
            "(1, 7), (1, 8), (1, 10), (2, 5)) AS t(user_id, day)), "
            "isl AS (SELECT user_id, day - row_number() OVER "
            "(PARTITION BY user_id ORDER BY day) AS island FROM ud), "
            "per_island AS (SELECT user_id, island, count(*) AS len "
            "FROM isl GROUP BY 1, 2) "
            "SELECT user_id, count(*) AS n_streaks, max(len) AS longest, "
            "sum(len) AS total FROM per_island GROUP BY 1 ORDER BY 1"
        ).fetchall()
        assert out == [(1, 3, 3, 6), (2, 1, 1, 1)]


class TestBipartiteProjectionFormula:
    """Shared-customer pair counts on a hand-checked bipartite graph."""

    def test_known_projection(self):
        con = duckdb.connect()
        out = con.execute(
            "WITH e AS (SELECT * FROM (VALUES ('c1', 's1'), ('c1', 's2'), "
            "('c2', 's1'), ('c2', 's2'), ('c2', 's3'), ('c3', 's2'), "
            "('c3', 's3')) AS t(src, dst)) "
            "SELECT a.dst, b.dst, count(*) FROM e a JOIN e b "
            "ON a.src = b.src AND a.dst < b.dst GROUP BY 1, 2 ORDER BY 1, 2"
        ).fetchall()
        assert out == [
            ("s1", "s2", 2),
            ("s1", "s3", 1),
            ("s2", "s3", 2),
        ]


class TestBloomSemantics:
    """Members ALWAYS hit (no false negatives) under the md5-slice position
    scheme; the measured FPP construction counts only non-member hits."""

    M, K = 16384, 4

    def _pos(self, key: str) -> set[int]:
        h = hashlib.md5(key.encode()).hexdigest()
        return {int(h[8 * j : 8 * j + 8], 16) % self.M for j in range(self.K)}

    def test_no_false_negatives(self):
        build = [f"doc-{i}" for i in range(200)]
        bits = set().union(*(self._pos(k) for k in build))
        assert all(self._pos(k) <= bits for k in build)

    def test_nonmember_hit_is_false_positive(self):
        build = [f"doc-{i}" for i in range(2000)]
        bits = set().union(*(self._pos(k) for k in build))
        probes = [f"other-{i}" for i in range(2000)]
        hits = [p for p in probes if self._pos(p) <= bits]
        # with n=2000, m=16384, k<=4: theoretical fpp ≈ (1-e^{-kn/m})^k is
        # small but nonzero; assert the measured rate is in a sane band
        # rather than an exact value (it is exact-deterministic given md5,
        # but the band keeps the test meaningful if constants change)
        fpp = len(hits) / len(probes)
        assert 0.0 <= fpp < 0.5

    def test_duckdb_position_parity(self):
        """DuckDB's ('0x'||substr(md5(x),1+8j,8))::BIGINT % M must equal
        Python's int(md5[8j:8j+8], 16) % M — the cross-engine hash contract
        the oracle relies on."""
        con = duckdb.connect()
        for key in ("alpha", "beta", "doc-42"):
            got = con.execute(
                "SELECT " + ", ".join(
                    f"('0x' || substr(md5('{key}'), {1 + 8 * j}, 8))::BIGINT "
                    f"% {self.M}"
                    for j in range(self.K)
                )
            ).fetchone()
            h = hashlib.md5(key.encode()).hexdigest()
            want = tuple(
                int(h[8 * j : 8 * j + 8], 16) % self.M for j in range(self.K)
            )
            assert got == want


class TestKnnMutualityFormula:
    """Mutual flag = both directions present in the top-k edge list."""

    def test_known_mutual_pairs(self):
        con = duckdb.connect()
        # 1-D "embeddings": cosine degenerates, so use explicit distances —
        # the construction under test is the rank/mutual logic, not cosine
        out = con.execute(
            "WITH pairs AS (SELECT * FROM (VALUES "
            "(1, 2, 0.9), (1, 3, 0.5), (2, 1, 0.9), (2, 3, 0.8), "
            "(3, 2, 0.8), (3, 1, 0.5)) AS t(vec_id, nbr_id, cos)), "
            "knn AS (SELECT vec_id, nbr_id FROM (SELECT *, row_number() "
            "OVER (PARTITION BY vec_id ORDER BY cos DESC, nbr_id ASC) rn "
            "FROM pairs) WHERE rn <= 1) "
            "SELECT k.vec_id, k.nbr_id, r.vec_id IS NOT NULL FROM knn k "
            "LEFT JOIN knn r ON r.vec_id = k.nbr_id AND r.nbr_id = k.vec_id "
            "ORDER BY 1"
        ).fetchall()
        # 1<->2 mutual at k=1; 3's best is 2 but 2's best is 1 -> not mutual
        assert out == [(1, 2, True), (2, 1, True), (3, 2, False)]


class TestAutocorrFormula:
    """Integer Pearson identity r = (nΣxy−ΣxΣy)/√(nΣx²−(Σx)²)√(nΣy²−(Σy)²)
    equals the mean-centered definition."""

    def test_matches_centered_definition(self):
        xs = [3, 7, 4, 9, 12, 5, 8]
        ys = [4, 6, 5, 11, 10, 7, 9]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in ys)
        r_int = (n * sxy - sx * sy) / (
            (n * sxx - sx * sx) ** 0.5 * (n * syy - sy * sy) ** 0.5
        )
        mx, my = sx / n, sy / n
        num = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
        den = (
            sum((a - mx) ** 2 for a in xs) ** 0.5
            * sum((b - my) ** 2 for b in ys) ** 0.5
        )
        assert abs(r_int - num / den) < 1e-12


class TestLatenessFormula:
    """Running-max lateness flags exactly the rows a watermark drops."""

    def test_known_late_rows(self):
        con = duckdb.connect()
        # arrival order 1..6; event-times with one big regression at row 4
        out = con.execute(
            "WITH ev AS (SELECT * FROM (VALUES (1, 100), (2, 500), (3, 450), "
            "(4, 90), (5, 600), (6, 550)) AS t(arrival, et)), "
            "f AS (SELECT arrival, coalesce(max(et) OVER (ORDER BY arrival "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - et, 0) "
            "AS late FROM ev) SELECT arrival, late FROM f ORDER BY arrival"
        ).fetchall()
        # negative = the event ADVANCED the watermark (ahead of the running
        # max); only positive values past the threshold count as late
        assert out == [(1, 0), (2, -400), (3, 50), (4, 410), (5, -100), (6, 50)]
        assert [a for a, late in out if late > 300] == [4]
