"""Multimodal-column queries: the mapInPandas decode/feature plumbing run
end-to-end over oracle-checkable payloads.

The payload is the document text reduced to printable ASCII, so byte values
equal character codes and DuckDB can reproduce the byte-level arithmetic
(``ascii(substr(...))``) that the Arrow-batched Python stage performs on raw
bytes. A real image/audio decoder drops into the same operator signature
(operators/multimodal.py) — the schema, batching and fan-out shapes tested
here are the Spark-side contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from giranking_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    pack_assets,
    sample_frames,
)
from giranking_spark.sources.tables import load_table

FRAME_BYTES = 64

# printable-ASCII payload: byte i == ascii(char i) on both engines
_ASCII_SQL = "regexp_replace(text, '[^ -~]', '', 'g')"


def _assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    ascii_text = F.regexp_replace(F.col("text"), "[^ -~]", "")
    return pack_assets(d, "doc_id", F.encode(ascii_text, "UTF-8"), mime="text/plain")


def q_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction (mapInPandas), exploded to scalar
    rows (asset_id, bucket, feat) for exact cross-engine comparison."""
    feats = extract_features(_assets(spark, sf_dir))
    return feats.select(
        "asset_id", F.posexplode("features").alias("bucket", "feat")
    ).select("asset_id", "bucket", F.round("feat", 6).alias("feat"))


def q_mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fan-out frame sampling (one input row → many frames)."""
    return sample_frames(_assets(spark, sf_dir), every_n_bytes=FRAME_BYTES)


QUERIES = {
    "mm_features": q_mm_features,
    "mm_frames": q_mm_frames,
}

ORACLES = {
    "mm_features": (
        f"WITH s AS (SELECT doc_id, {_ASCII_SQL} AS a FROM documents), "
        f"b AS (SELECT doc_id, (i - 1) % {FEATURE_DIM} AS bucket, "
        "ascii(substr(a, i, 1)) AS v "
        "FROM s, unnest(generate_series(1, length(a))) AS t(i)), "
        "agg AS (SELECT doc_id, bucket, sum(v) AS sv FROM b GROUP BY 1, 2), "
        "tot AS (SELECT doc_id, greatest(sum(sv), 1) AS total FROM agg GROUP BY 1), "
        f"grid AS (SELECT doc_id, gs.bucket FROM s, "
        f"unnest(generate_series(0, {FEATURE_DIM - 1})) AS gs(bucket)) "
        "SELECT g.doc_id AS asset_id, g.bucket, "
        "round(coalesce(sv, 0) / coalesce(total, 1), 6) AS feat "
        "FROM grid g LEFT JOIN agg ON g.doc_id = agg.doc_id AND g.bucket = agg.bucket "
        "LEFT JOIN tot ON g.doc_id = tot.doc_id"
    ),
    "mm_frames": (
        f"WITH s AS (SELECT doc_id, {_ASCII_SQL} AS a FROM documents), "
        "b AS (SELECT doc_id, "
        f"((i - 1) // {FRAME_BYTES}) * {FRAME_BYTES} AS frame_offset, "
        "ascii(substr(a, i, 1)) AS v "
        "FROM s, unnest(generate_series(1, length(a))) AS t(i)) "
        "SELECT doc_id AS asset_id, frame_offset, "
        "CAST(sum(v) % 997 AS BIGINT) AS frame_sig "
        "FROM b GROUP BY 1, 2 "
        "UNION ALL "
        "SELECT doc_id, 0, 0 FROM s WHERE length(a) = 0"
    ),
}
