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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


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
