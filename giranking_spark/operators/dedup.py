"""Deduplication operators for large-scale training-data pipelines.

Generalizes the reference's only dedup (edge-set DISTINCT, SURVEY.md §2.3) to
document-level exact and near-duplicate detection:

  * exact_dedup          — hash-groupBy on canonical bytes
  * ngram_jaccard_pairs  — exact word-n-gram Jaccard via shared-shingle join
  * minhash_signatures / minhash_lsh_pairs — MinHash sketch + banded LSH
  * simhash_signatures   — bitwise majority fingerprint

All hashing goes through the md5-based portable family
(functions/hashing.py) so the DuckDB oracle reproduces identical values.

Scale posture (100 TB): every operator is explode → shuffle-on-key →
aggregate; the classic near-dup blowup (a shingle shared by millions of docs)
is capped with ``max_df`` document-frequency pruning before the self-join —
the standard trick to keep LSH bucket joins skew-free. No driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from giranking_spark.functions.hashing import affine, md5_u32
from giranking_spark.functions.text import word_ngrams, words


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (content_hash, n_docs, keep_id).

    keep_id = smallest doc id (deterministic survivor pick)."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def doc_shingles(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle)."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("shingle"),
    ).distinct()


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact Jaccard similarity over word n-gram sets for every candidate
    pair sharing ≥1 shingle: (id_a, id_b, jaccard), id_a < id_b.

    ``max_df`` prunes shingles present in more than that many documents
    before the self-join (skew guard; None disables)."""
    sh = doc_shingles(docs, n, id_col, text_col)
    if max_df is not None:
        keep = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).filter(
            F.col("df") <= max_df
        )
        sh = sh.join(keep.select("shingle"), "shingle")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame, k: int = 16, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """MinHash sketch: (id, s0..s{k-1}) where s_i = min over shingles of the
    i-th portable affine hash. One explode + one groupBy — fully distributed,
    sketch size k·8 bytes per doc.

    The shingle is hashed BEFORE the per-doc distinct, so the dedup shuffle
    moves 4-byte ints instead of n-gram strings (~10× less shuffle IO);
    min(affine(·)) over the distinct hash set equals min over hashes of the
    distinct shingle set, so results are identical to the string-side dedup
    (and to the DuckDB oracle)."""
    sh = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(word_ngrams(F.col(text_col), n)).alias("shingle"),
        )
        .select("id", md5_u32(F.col("shingle")).alias("h"))
        .distinct()
    )
    aggs = [F.min(affine(F.col("h"), i)).alias(f"s{i}") for i in range(k)]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Banded-LSH candidate pairs: docs agreeing on ALL rows of ≥1 band.
    k/bands rows per band; returns (id_a, id_b, n_bands) sorted pairs.

    Scale: the pair join happens per-band on the band-hash key (a shuffle on
    a short string), never all-pairs."""
    rows = k // bands
    sig = minhash_signatures(docs, k, n, id_col, text_col)
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"s{b * rows + r}") for r in range(rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("_", *cols)).alias("bh"))
        )
    exploded = sig.select(
        F.col("id"), F.explode(F.array(*band_cols)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))
    a = exploded.select(F.col("id").alias("id_a"), "band", "bh")
    b = exploded.select(F.col("id").alias("id_b"), "band", "bh")
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def simhash_signatures(
    docs: DataFrame, bits: int = 32, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """SimHash: per document, the ``bits``-wide majority fingerprint of its
    word hashes (with multiplicity): (id, simhash BIGINT).

    bit b of the signature = 1 iff sum over words of (bit b of hash ? +1 : -1)
    is positive. Single explode + single groupBy with ``bits`` conditional
    sums — no UDFs."""
    w = docs.select(
        F.col(id_col).alias("id"), F.explode(words(F.col(text_col))).alias("word")
    )
    h = md5_u32(F.col("word"))
    aggs = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    per_bit = w.groupBy("id").agg(*aggs)
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"b{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return per_bit.select("id", sig.cast("bigint").alias("simhash"))
