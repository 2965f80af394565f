"""Positional-fingerprint queries (winnowing, exact substring runs) with
DuckDB oracles.

The md5-based portable hash family (functions/hashing.py) evaluates
identically in both engines, so fingerprint VALUES match bit-for-bit — the
oracles re-derive the same algorithm in SQL (1-based list indexing on the
DuckDB side vs 0-based posexplode on the Spark side; the window arithmetic
is offset accordingly and verified value-for-value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from giranking_spark.functions.hashing import (
    md5_u32_sql_duckdb,
    md5_u60_sql_duckdb,
)
from giranking_spark.operators.fingerprint import (
    substring_runs,
    winnow_fingerprints,
    winnow_pairs,
)
from giranking_spark.queries.textq import WORDS_SQL
from giranking_spark.sources.tables import load_table

WINNOW_K = 4       # words per k-gram
WINNOW_W = 5       # hashes per winnowing window
WINNOW_MIN_SHARED = 3
WINNOW_MAX_DF = 400
SUBSTR_K = 5       # words per anchor gram
SUBSTR_MIN_RUN = 12   # tokens — pairs below this are not reported
SUBSTR_MAX_DF = 200


def q_text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnow_fingerprints(
        load_table(spark, sf_dir, "documents"), k=WINNOW_K, w=WINNOW_W
    )


def q_dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnow_pairs(
        load_table(spark, sf_dir, "documents"),
        k=WINNOW_K,
        w=WINNOW_W,
        min_shared=WINNOW_MIN_SHARED,
        max_df=WINNOW_MAX_DF,
    )


def q_dedup_substring_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    return substring_runs(
        load_table(spark, sf_dir, "documents"),
        k=SUBSTR_K,
        min_run=SUBSTR_MIN_RUN,
        max_df=SUBSTR_MAX_DF,
    )


def _gram_cte(k: int) -> str:
    """1-based (doc_id, pos, gram) k-gram rows — mirror of
    operators/fingerprint._gram_rows (which is 0-based; consumers offset)."""
    return (
        f"w AS (SELECT doc_id, {WORDS_SQL} AS words FROM documents), "
        "g AS (SELECT doc_id, i AS pos, "
        f"array_to_string(words[i:i+{k - 1}], '_') AS gram "
        f"FROM w, unnest(generate_series(1, len(words) - {k - 1})) AS t(i) "
        f"WHERE len(words) >= {k})"
    )


_WINNOW_FP_CTE = (
    _gram_cte(WINNOW_K)
    + ", h AS (SELECT doc_id, pos, "
    + md5_u32_sql_duckdb("gram")
    + " AS h, count(*) OVER (PARTITION BY doc_id) AS gcnt FROM g), "
    "m AS (SELECT doc_id, pos, gcnt, min(h) OVER (PARTITION BY doc_id "
    f"ORDER BY pos ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) "
    "AS fp FROM h), "
    "fp AS (SELECT DISTINCT doc_id, fp FROM m "
    f"WHERE pos <= greatest(1, gcnt - {WINNOW_W - 1}))"
)

_WINNOW_FP_SQL = f"WITH {_WINNOW_FP_CTE} SELECT doc_id, fp FROM fp"

_WINNOW_PAIRS_SQL = (
    f"WITH {_WINNOW_FP_CTE}, "
    "keep AS (SELECT fp FROM fp GROUP BY fp "
    f"HAVING count(*) <= {WINNOW_MAX_DF}), "
    "fpk AS (SELECT f.doc_id, f.fp FROM fp f JOIN keep USING (fp)) "
    "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared "
    "FROM fpk a JOIN fpk b ON a.fp = b.fp AND a.doc_id < b.doc_id "
    "GROUP BY doc_a, doc_b "
    f"HAVING count(*) >= {WINNOW_MIN_SHARED}"
)

_SUBSTR_SQL = (
    "WITH "
    + _gram_cte(SUBSTR_K)
    + ", gh AS (SELECT doc_id, pos, "
    + md5_u60_sql_duckdb("gram")
    + " AS h FROM g), "
    "keep AS (SELECT h FROM gh GROUP BY h "
    f"HAVING count(DISTINCT doc_id) <= {SUBSTR_MAX_DF}), "
    "gk AS (SELECT gh.doc_id, gh.pos, gh.h FROM gh JOIN keep USING (h)), "
    "pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    "a.pos AS pa, b.pos AS pb FROM gk a JOIN gk b "
    "ON a.h = b.h AND a.doc_id < b.doc_id), "
    "isl AS (SELECT doc_a, doc_b, pa - pb AS d, pa, "
    "pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb "
    "ORDER BY pa) AS isl FROM pairs), "
    f"runs AS (SELECT doc_a, doc_b, count(*) + {SUBSTR_K - 1} AS run "
    "FROM isl GROUP BY doc_a, doc_b, d, isl) "
    "SELECT doc_a, doc_b, max(run) AS longest_run FROM runs "
    "GROUP BY doc_a, doc_b "
    f"HAVING max(run) >= {SUBSTR_MIN_RUN}"
)

QUERIES = {
    "text_winnow_fingerprints": q_text_winnow_fingerprints,
    "dedup_winnow_pairs": q_dedup_winnow_pairs,
    "dedup_substring_run": q_dedup_substring_run,
}

ORACLES = {
    "text_winnow_fingerprints": _WINNOW_FP_SQL,
    "dedup_winnow_pairs": _WINNOW_PAIRS_SQL,
    "dedup_substring_run": _SUBSTR_SQL,
}
