"""Round-6 operator tests: content-defined chunking and IVFADC."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


class TestCdcChunking:
    def _chunks(self, spark, texts: list[str]):
        from giranking_spark.operators.chunking import cdc_chunk_documents

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        return cdc_chunk_documents(df)

    def test_covers_all_tokens_once(self, spark):
        text = " ".join(f"w{i % 13}x{i % 7}" for i in range(120))
        rows = self._chunks(spark, [text]).collect()
        assert sum(r.n_tokens for r in rows) == 120
        idxs = sorted(r.chunk_idx for r in rows)
        assert idxs == list(range(len(rows)))  # contiguous chunk ids

    def test_edit_robustness(self, spark):
        """Insert one token mid-document: content-defined boundaries
        resynchronize, so most chunk hashes survive the edit — the property
        fixed-window chunking does NOT have."""
        base = [f"tok{(i * 7) % 31}a{i % 5}" for i in range(200)]
        edited = base[:100] + ["INSERTED"] + base[100:]
        rows = (
            self._chunks(spark, [" ".join(base), " ".join(edited)])
            .select("doc_id", "chunk_hash")
            .collect()
        )
        h0 = {r.chunk_hash for r in rows if r.doc_id == 0}
        h1 = {r.chunk_hash for r in rows if r.doc_id == 1}
        shared = len(h0 & h1)
        # every chunk strictly before/after the edit region is unchanged;
        # demand a clear majority survive
        assert shared / len(h0) > 0.6, (shared, len(h0))

    def test_empty_and_blank_docs_drop(self, spark):
        rows = self._chunks(spark, ["", "   ", "one two"]).collect()
        assert {r.doc_id for r in rows} == {2}

    def test_deterministic_boundaries(self, spark):
        text = " ".join(f"q{i % 17}" for i in range(80))
        a = self._chunks(spark, [text]).orderBy("chunk_idx").collect()
        b = self._chunks(spark, [text]).orderBy("chunk_idx").collect()
        assert [r.chunk_hash for r in a] == [r.chunk_hash for r in b]


class TestIvfPq:
    def test_topk_shape_and_probe_bound(self, spark):
        """Every returned neighbor must live in one of the query's nprobe
        probed cells — the defining IVFADC constraint."""
        from giranking_spark.operators.similarity import (
            deterministic_centroids,
            ivf_assign,
            ivf_pq_topk,
        )
        from giranking_spark.sources.tables import load_table

        emb = load_table(spark, SF_SMALL, "embeddings")
        queries = emb.filter(F.col("vec_id") % 50 == 0)
        out = ivf_pq_topk(emb, queries, c=4, nprobe=2, m=4, ksub=8, dim=64, k=3)
        rows = out.collect()
        assert rows, "no neighbors returned"
        per_q = {}
        for r in rows:
            per_q.setdefault(r.query_id, []).append(r)
        for q, rs in per_q.items():
            assert len(rs) <= 3
            assert all(r.neighbor_id != q for r in rs)
            dists = [r.adist for r in rs]
            assert dists == sorted(dists)
        # neighbor cells ⊆ probed cells
        cents = deterministic_centroids(emb, 4).select(
            "cell", F.col("cv").cast("array<double>").alias("cv")
        )
        cell_of = {
            r.vec_id: r.cell
            for r in ivf_assign(emb, cents).select("vec_id", "cell").collect()
        }
        from giranking_spark.operators.similarity import cosine

        qc = (
            queries.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").cast("array<double>").alias("qv"),
            )
            .crossJoin(F.broadcast(cents))
            .select(
                "query_id", "cell", cosine(F.col("qv"), F.col("cv")).alias("sim")
            )
            .collect()
        )
        probed = {}
        for r in sorted(qc, key=lambda r: (r.query_id, -r.sim, r.cell)):
            probed.setdefault(r.query_id, [])
            if len(probed[r.query_id]) < 2:
                probed[r.query_id].append(r.cell)
        for r in rows:
            assert cell_of[r.neighbor_id] in probed[r.query_id], r

    def test_recall_query_bounds(self, spark):
        from giranking_spark.queries.simq import TOPK, q_simsearch_ivfpq_recall

        rows = q_simsearch_ivfpq_recall(spark, SF_SMALL).collect()
        assert rows
        for r in rows:
            assert 0 <= r.n_hit <= TOPK
            assert abs(r.recall - round(r.n_hit / TOPK, 6)) < 1e-12
