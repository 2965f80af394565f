"""Document chunking for training-data prep: split long documents into
fixed-width token windows with stride overlap.

Not present in the reference (batch graph ranking only) — this is part of the
mandated LLM-pipeline surface. The whole operator is a narrow JVM-side map
(split → sequence → explode → slice): no shuffle, no Python, so it streams
through whole-stage codegen at any scale. On a 100 TB corpus the output is
written partitioned by a hash of doc_id so downstream shuffles (packing,
dedup) start from a balanced layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48

CDC_WINDOW = 4   # rolling-hash window, in tokens
CDC_DIVISOR = 8  # boundary when H(window) % divisor == 0 → ~8-token chunks


def chunk_documents(
    docs: DataFrame,
    width: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk_text): whitespace-token windows of
    ``width`` tokens every ``stride`` tokens (the trailing window may be
    short). Documents with zero tokens yield no chunks.

    Token discipline matches operators/textops.text_stats: split on ``\\s+``
    after trim, drop empty strings.
    """
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    d = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks")).filter(
        F.size("toks") >= 1
    )
    starts = F.sequence(F.lit(0), F.size("toks") - 1, F.lit(stride))
    d = d.select("doc_id", "toks", F.explode(starts).alias("s"))
    chunk = F.slice(F.col("toks"), F.col("s") + 1, width)
    return d.select(
        "doc_id",
        (F.col("s") / stride).cast("bigint").alias("chunk_idx"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def cdc_chunk_documents(
    docs: DataFrame,
    window: int = CDC_WINDOW,
    divisor: int = CDC_DIVISOR,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking (LBFS/rsync/FastCDC family): a chunk
    boundary falls AFTER token i whenever the portable hash of the
    ``window``-token run ending at i satisfies ``H % divisor == 0`` (plus a
    forced boundary at document end).  Unlike the fixed windows of
    :func:`chunk_documents`, boundaries are a function of local CONTENT, so
    inserting or deleting a token resynchronizes within one window — edited
    documents still share most chunk hashes, which is what makes chunk-level
    dedup robust to near-duplicate edits.

    Returns (doc_id, chunk_idx, n_tokens, chunk_hash) with chunk_hash =
    md5 of the space-joined chunk text.

    Scale shape: boundary flags are a pure map over (doc, token-index) rows
    (slice + md5, whole-stage codegen); the chunk index is one running-sum
    window keyed on doc_id — documents are independent, so the single
    shuffle partitions cleanly at any corpus size; chunks reassemble in the
    same doc-keyed aggregation.
    """
    from giranking_spark.functions.hashing import md5_u32

    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    d = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks")).filter(
        F.size("toks") >= 1
    )
    t = d.select("doc_id", "toks", F.posexplode("toks").alias("i", "tok"))
    run = F.array_join(
        F.slice(F.col("toks"), F.col("i") - window + 2, window), " "
    )
    flag = (
        F.when(
            (F.col("i") >= window - 1) & (md5_u32(run) % divisor == 0),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("flag")
    )
    t = t.select("doc_id", "i", "tok", flag)
    w = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.select(
        "doc_id",
        "i",
        "tok",
        F.coalesce(F.sum("flag").over(w), F.lit(0)).alias("chunk_idx"),
    )
    return c.groupBy("doc_id", "chunk_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            )
        ).alias("chunk_hash"),
    )
