"""Document-level text analysis operators (extension surface).

Everything is built from the pure Column expressions in functions/text.py —
JVM-side, codegen-friendly, no Python in the hot path. Each operator has an
exact DuckDB mirror in queries/textq.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from giranking_spark.functions import text as T


def text_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_chars, n_tokens, n_words, punct_ratio, mean_word_len)."""
    t = F.col(text_col)
    w = T.words(t)
    return docs.select(
        F.col(id_col),
        T.char_count(t).alias("n_chars"),
        T.token_count(t).alias("n_tokens"),
        F.size(w).alias("n_words"),
        F.round(T.punct_count(t) / F.greatest(T.char_count(t), F.lit(1)), 6).alias(
            "punct_ratio"
        ),
        F.round(
            F.aggregate(w, F.lit(0.0), lambda acc, x: acc + F.length(x))
            / F.greatest(F.size(w), F.lit(1)),
            6,
        ).alias("mean_word_len"),
    )


def quality_expr(t) -> "F.Column":
    """Quality ∈ [0,1] as a pure Column over the text column: length signal
    + low punctuation + stopword density (fluency proxy). Exposed separately
    so fused pipelines (queries/corpusq.py) evaluate it in the same scan as
    other per-doc signals. Rounded to 6 decimals (oracle contract)."""
    n_tok = T.token_count(t)
    stop = T.stopword_count(t, "en")
    punct = T.punct_count(t) / F.greatest(T.char_count(t), F.lit(1))
    score = (
        F.lit(0.4) * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct * 4, F.lit(1.0)))
        + F.lit(0.3) * F.least(stop / F.greatest(n_tok, F.lit(1)) * 5, F.lit(1.0))
    )
    return F.round(score, 6)


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality ∈ [0,1] per document (see :func:`quality_expr`)."""
    return docs.select(F.col(id_col), quality_expr(F.col(text_col)).alias("quality"))


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, lang_pred) — n-gram/stopword heuristic language ID."""
    return docs.select(F.col(id_col), T.lang_id(F.col(text_col)).alias("lang_pred"))


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, fp) — canonical content fingerprint (md5 of normalized words)."""
    return docs.select(F.col(id_col), T.fingerprint(F.col(text_col)).alias("fp"))


def repetition_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document:
    (doc_id, top_word_frac, top_bigram_frac) — the fraction of all word
    (resp. bigram) occurrences taken by the single most frequent one; 0.0
    when the document has no words (resp. bigrams). High values flag
    boilerplate/spam for training-data filtering.

    Distributed shape: shingle_rows fan-out → count per (id, gram) → max/sum
    per id — two narrow aggregations on the same key, no self-joins."""
    from giranking_spark.operators.dedup import shingle_rows

    def top_frac(n: int, out: str) -> DataFrame:
        g = (
            shingle_rows(docs, n, id_col, text_col)
            .groupBy("id", "shingle")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        return g.groupBy("id").agg((F.max("c") / F.sum("c")).alias(out))

    ids = docs.select(F.col(id_col).alias("id"))
    return (
        ids.join(top_frac(1, "twf"), "id", "left")
        .join(top_frac(2, "tbf"), "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.round(F.coalesce("twf", F.lit(0.0)), 6).alias("top_word_frac"),
            F.round(F.coalesce("tbf", F.lit(0.0)), 6).alias("top_bigram_frac"),
        )
    )


# PII redaction patterns — restricted to regex constructs Java regex and
# DuckDB's RE2 treat identically (character classes, bounded repetition,
# \b word boundaries; no lookaround). Applied IN ORDER — order matters when
# patterns could overlap, and the oracle mirrors the same order.
PII_PATTERNS: list[tuple[str, str]] = [
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b", "<PHONE>"),
]


def redact_pii(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, clean_text, n_redacted) — masks emails, IPv4 addresses and
    phone numbers with typed placeholder tokens.

    Pure Column expressions (sequential regexp_replace, JVM-side regex) —
    a narrow per-row map, no shuffle, safe at any scale. ``n_redacted``
    counts placeholders in the REDACTED text, so overlapping source
    patterns are counted exactly once, by whichever pattern fired first.
    Patterns go through F.lit (F.expr would re-parse and eat the \\d / \\b
    escapes)."""
    clean = F.col(text_col)
    for pat, token in PII_PATTERNS:
        clean = F.regexp_replace(clean, F.lit(pat), F.lit(token))
    placeholder = "|".join(tok for _, tok in PII_PATTERNS)
    return docs.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.regexp_count(clean, F.lit(placeholder)).cast("long").alias("n_redacted"),
    )


def contamination_stats(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination detection: per corpus document, the fraction
    of its DISTINCT word ``n``-grams that also occur anywhere in the
    benchmark set — the standard train/eval-overlap screen for training-data
    pipelines (production uses n=8..13; the fixture vocabulary forces a
    smaller n for a non-vacuous signal).

    Output: (id_col, n_grams, n_hit, contam_frac), one row per corpus doc,
    zeros for docs too short to have an ``n``-gram.

    Scale shape: the benchmark side reduces to a DISTINCT shingle set —
    orders of magnitude smaller than the corpus — and is broadcast, so the
    membership probe is a map-side hash join against every corpus shingle;
    the only shuffles are the per-doc count aggregations on the doc id. If
    the benchmark set ever outgrows broadcast range, the same plan works as
    a shuffle join on the shingle key (drop the hint)."""
    from giranking_spark.operators.dedup import shingle_rows

    # shingles are hashed to int64 BEFORE the distinct and the join: only
    # counts leave this operator, so the (collision-negligible) hash halves
    # the shuffle/broadcast bytes — same trick as the MinHash pipeline
    def hashed(d: DataFrame) -> DataFrame:
        return (
            shingle_rows(d, n, id_col, text_col)
            .select("id", F.xxhash64("shingle").alias("sh"))
            .distinct()
        )

    bench_sh = hashed(bench).select("sh").distinct()
    corp = hashed(docs)
    totals = corp.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        corp.join(F.broadcast(bench_sh), "sh")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    ids = docs.select(F.col(id_col).alias("id"))
    return (
        ids.join(totals, "id", "left")
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit") / F.col("n_grams"), F.lit(0.0)), 6
            ).alias("contam_frac"),
        )
    )


def build_vocab(
    docs: DataFrame,
    size: int,
    n: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(word, cnt, vocab_id) — frequency-ranked top-``size`` vocabulary of
    word ``n``-grams (n=1: words; n=2: '_'-joined bigrams, the phrase-table
    precursor).

    The corpus-wide word counts run as explode → groupBy(word) (map-side
    partial agg; the shuffle carries one row per distinct word). The final
    ranking is a top-``size`` TakeOrderedAndProject (per-partition top-k +
    k-row merge) and the id assignment a row_number over those ``size``
    rows — a single-task window by design, on a relation whose size is
    BOUNDED BY THE PARAMETER, not by the data. Ties break on the word so
    ids are deterministic."""
    from giranking_spark.operators.dedup import shingle_rows

    counts = (
        shingle_rows(docs, n, id_col, text_col)
        .groupBy(F.col("shingle").alias("word"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(int(size))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("word").asc())
    return counts.select(
        "word", "cnt", F.row_number().over(w).cast("long").alias("vocab_id")
    )
